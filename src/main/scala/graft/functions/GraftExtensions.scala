package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector making the native vector expressions usable
  * from SQL (`SELECT cosine_similarity(a, b)`), so `spark.sql(...)` users
  * get the same codegen'd expressions as the DataFrame API.
  *
  * Wire-up: `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity], "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float arrays"),
      (children: Seq[Expression]) => children match {
        case Seq(l, r) => CosineSimilarity(l, r)
        case _ => throw new IllegalArgumentException(
          "cosine_similarity expects exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info(classOf[DotProduct], "dot_product",
        "dot_product(a, b) - dot product of two float arrays"),
      (children: Seq[Expression]) => children match {
        case Seq(l, r) => DotProduct(l, r)
        case _ => throw new IllegalArgumentException(
          "dot_product expects exactly 2 arguments")
      }))
  }
}
