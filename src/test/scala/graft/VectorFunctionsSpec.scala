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

  test("two vector expressions in one generated projection compile (no Janino local collision)") {
    // Regression: loopCode used to emit fixed Java locals (n, dot, i, ...),
    // so any generated function holding two vector expressions failed
    // Janino with "Redefinition of local variable" and silently fell back
    // to interpreted mode. GenerateUnsafeProjection.generate throws on a
    // compile failure instead of falling back, so this asserts the fix.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val at = ArrayType(FloatType)
    val a = BoundReference(0, at, nullable = false)
    val b = BoundReference(1, at, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      CosineSimilarity(a, b), CosineSimilarity(b, a), DotProduct(a, b)))
    val conv = CatalystTypeConverters.createToCatalystConverter(at)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      conv(Seq(1f, 2f, 3f)), conv(Seq(4f, 5f, 6f)))
    val out = proj(row)
    val expect = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert(math.abs(out.getDouble(0) - expect) < 1e-12)
    assert(math.abs(out.getDouble(1) - expect) < 1e-12)
    assert(math.abs(out.getDouble(2) - 32.0) < 1e-12)
  }

  test("composed-cosine DataFrame projection survives CODEGEN_ONLY (no interpreter fallback)") {
    // The mmr_rerank shape: one projection computing both a relevance
    // cosine and a diversity cosine. CODEGEN_ONLY turns the silent
    // interpreted fallback into a hard failure, so green here means the
    // hot path really is codegen'd.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), Seq(7f, 8f, 9f)))
        .toDF("q", "d", "p")
        .select(
          VectorFunctions.cosineSim(col("q"), col("d")).as("rel"),
          VectorFunctions.cosineSim(col("d"), col("p")).as("div"),
          VectorFunctions.dot(col("q"), col("p")).as("qp"))
      val r = df.head()
      val expect = 32.0 / (math.sqrt(14) * math.sqrt(77))
      assert(math.abs(r.getDouble(0) - expect) < 1e-12)
      assert(r.getDouble(1) > 0.99) // near-parallel vectors
      assert(math.abs(r.getDouble(2) - 50.0) < 1e-12)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("dimension mismatch fails loudly on both paths") {
    val ex1 = intercept[Exception](cosInterp(Seq(1f, 2f), Seq(1f)))
    assert(ex1.getMessage.contains("dimension mismatch"))
    val ex2 = intercept[Exception](cosCodegen(Seq(1f, 2f), Seq(1f)))
    assert(Iterator.iterate[Throwable](ex2)(_.getCause)
      .takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("dotLong: exact integer dot, codegen path, two-in-one-projection") {
    import graft.functions.VectorFunctions.dotLong
    import org.apache.spark.sql.functions.typedLit
    val df = spark.range(1).select(
      typedLit(Seq(3L, -5L, 65535L)).as("a"),
      typedLit(Seq(2L, 7L, 65535L)).as("b"))
    val expect = 3L * 2 - 5L * 7 + 65535L * 65535L
    // two dotLong columns in one projection: the freshName rule
    val r = df.select(dotLong(col("a"), col("b")).as("d1"),
      dotLong(col("a"), col("a")).as("d2")).head
    assert(r.getLong(0) === expect)
    assert(r.getLong(1) === 3L * 3 + 25L + 65535L * 65535L)
    // interpreted parity
    val e = graft.functions.DotProductLong(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3L, -5L, 65535L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 7L, 65535L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) === expect)
  }
}
