package graft

/** The SparkSessionExtensions injection: the native vector expressions
  * must be callable from plain SQL text (the shared test session is built
  * with `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("cosine_similarity is callable from SQL") {
    val r = spark.sql(
      """SELECT cosine_similarity(
        |  cast(array(1.0, 0.0) AS array<float>),
        |  cast(array(1.0, 0.0) AS array<float>)) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("dot_product is callable from SQL and matches the arithmetic") {
    val r = spark.sql(
      """SELECT dot_product(
        |  cast(array(1.0, 2.0, 3.0) AS array<float>),
        |  cast(array(4.0, 5.0, 6.0) AS array<float>)) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("wrong arity is rejected at analysis time") {
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(cast(array(1.0) AS array<float>))")
        .collect()
    }
  }
}
