package graft

import org.apache.spark.sql.SparkSession

/** Runtime query parameters — the engine's analogue of the reference's
  * per-call arguments (/root/reference/database.py:344
  * `get_high_quality_interactions(topic_filter, min_effectiveness,
  * limit)`, :422 `find_similar_documents(embedding, limit)`,
  * database.py:68 `get_conversation_history(limit)`).
  *
  * The driver contract fixes every query's signature at
  * `(SparkSession, sfDir)`, so runtime knobs ride on the session's
  * RuntimeConfig under the `spark.graft.param.*` namespace — the
  * idiomatic Spark channel for per-session settings (survives into every
  * executor-side plan, needs no API change, and `conf.unset` restores
  * the default). Every default is the constant the oracle gate pins, so
  * an UNSET session is bit-identical to the pre-params engine — the
  * registry spec proves exactly that.
  *
  * Usage: `spark.conf.set("spark.graft.param.high_quality.limit", 20)`
  * before invoking the query; unset to return to gated defaults.
  */
object Params {

  val Namespace = "spark.graft.param."

  private def get(spark: SparkSession, key: String): Option[String] =
    spark.conf.getOption(Namespace + key)

  /** Int param with loud failure on a malformed value: a typo'd knob
    * must not silently fall back to the default.
    */
  def int(spark: SparkSession, key: String, default: Int): Int =
    get(spark, key).map { v =>
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$Namespace$key must be an int, got '$v'") }
    }.getOrElse(default)

  def long(spark: SparkSession, key: String, default: Long): Long =
    get(spark, key).map { v =>
      try v.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$Namespace$key must be a long, got '$v'") }
    }.getOrElse(default)

  def double(spark: SparkSession, key: String, default: Double): Double =
    get(spark, key).map { v =>
      try v.trim.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$Namespace$key must be a double, got '$v'") }
    }.getOrElse(default)

  /** Optional string param: absent AND empty both mean "no filter" (the
    * reference's `topic_filter=None`).
    */
  def strOpt(spark: SparkSession, key: String,
      default: Option[String]): Option[String] =
    get(spark, key).map(_.trim).filter(_.nonEmpty).orElse(default)

  /** Overridable-default string param: unset → `default`; set EMPTY →
    * None (explicitly disable — the escape hatch [[strOpt]] cannot
    * express once a non-None default exists); set non-empty → that
    * value. Used where the gated default is a real filter the caller
    * must be able to turn OFF (ann.filter.lang).
    */
  def strDisableable(spark: SparkSession, key: String,
      default: String): Option[String] =
    get(spark, key).map(_.trim) match {
      case Some("") => None
      case Some(v)  => Some(v)
      case None     => Some(default)
    }
}
