package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{CosineSimilarity, DotProduct, VectorFunctions}

/** The codegen'd vector expressions: known values, codegen vs interpreted
  * parity (property-based), and the loud dimension-mismatch contract.
  */
class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def lit64(xs: Seq[Float]): Literal = {
    val conv = CatalystTypeConverters
      .createToCatalystConverter(ArrayType(FloatType))
    Literal(conv(xs), ArrayType(FloatType))
  }

  /** Interpreted path (Expression.eval, no codegen). */
  private def cosInterp(a: Seq[Float], b: Seq[Float]): Double =
    CosineSimilarity(lit64(a), lit64(b)).eval(null).asInstanceOf[Double]

  private def dotInterp(a: Seq[Float], b: Seq[Float]): Double =
    DotProduct(lit64(a), lit64(b)).eval(null).asInstanceOf[Double]

  /** Codegen path (through a DataFrame projection). */
  private def cosCodegen(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b")))
      .head().getDouble(0)

  test("cosine of identical vectors is 1, orthogonal is 0") {
    assert(math.abs(cosCodegen(Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)) - 1.0) < 1e-12)
    assert(cosCodegen(Seq(1f, 0f), Seq(0f, 1f)) === 0.0)
  }

  test("known cosine value") {
    // cos([1,2,3],[4,5,6]) = 32 / (sqrt(14) * sqrt(77))
    val expect = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert(math.abs(cosCodegen(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) - expect) < 1e-12)
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val g = for {
      n <- Gen.choose(1, 16)
      a <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
      b <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
    } yield (a, b)
    // Codegen round-trips through a Spark job, so keep the sample count
    // modest; parity must be exact (same double bits), not approximate.
    val prop = Prop.forAll(g) { case (a, b) =>
      val i = cosInterp(a, b)
      val c = cosCodegen(a, b)
      val d = dotInterp(a, b)
      val dRef = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      (java.lang.Double.compare(i, c) == 0 || (i.isNaN && c.isNaN)) &&
        math.abs(d - dRef) < 1e-9
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("dimension mismatch fails loudly on both paths") {
    val ex1 = intercept[Exception](cosInterp(Seq(1f, 2f), Seq(1f)))
    assert(ex1.getMessage.contains("dimension mismatch"))
    val ex2 = intercept[Exception](cosCodegen(Seq(1f, 2f), Seq(1f)))
    assert(Iterator.iterate[Throwable](ex2)(_.getCause)
      .takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("dimension mismatch"))))
  }
}
