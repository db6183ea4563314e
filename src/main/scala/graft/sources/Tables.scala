package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog for the graft engine.
  *
  * The reference keeps its corpus in Supabase tables
  * (`knowledge_base`, `interactions` — see /root/reference/database.py:340,68);
  * here every table is a parquet directory under a scale-factor dir, read
  * lazily so Catalyst can push filters/prune columns into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.ts` normalized to the engine contract: a LONG of nanos
    * since epoch. The driver's testdata has shipped it two ways —
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects;
    * the legacy flag reads it as exactly the ns-long we want) and plain
    * timestamp[us] (read natively as TIMESTAMP_NTZ). This accessor
    * handles all three column types: longs pass through; NTZ converts
    * via a timestampdiff against the NTZ epoch literal — wall-clock
    * micros, INDEPENDENT of the session timezone (an NTZ→LTZ cast would
    * silently shift every event by the caller's zone offset; the DuckDB
    * oracle's epoch() makes the same wall-clock-as-UTC reading); an
    * instant (LTZ) column uses unix_micros directly, which is likewise
    * zone-free. All event-time logic downstream derives
    * floor-epoch-seconds (`ts div 1e9`), so sub-second representation
    * never decides a window or session boundary.
    *
    * The graft entrypoints (Verify/Bench/Explain and the test session)
    * set the legacy flag once at session build — see [[NanosFlag]]. This
    * accessor only bootstraps it when the session has no explicit value,
    * and never overrides a caller's own setting.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // synchronized: reachable from Par.build worker threads, and a
    // check-then-act on shared session conf is a race even when both
    // racers write the same value
    synchronized {
      if (s.conf.getOption(NanosFlag).isEmpty) s.conf.set(NanosFlag, "true")
    }
    val df = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          * 1000L)
      case _ => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
    }
  }

  /** SQL-conf key for the TIMESTAMP(NANOS)-as-long legacy read; session
    * builders should pass `.config(Tables.NanosFlag, "true")`.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Repartition by key with an EXPLICIT partition count (the session's
    * shuffle parallelism). `repartition(col)` alone emits
    * REPARTITION_BY_COL, which AQE may coalesce by output BYTES — right
    * for IO-bound stages, wrong immediately before CPU-heavy per-row
    * work (regex pipelines, shingling, hashing), where a small corpus
    * coalesces to 1-2 partitions and the compute runs on 1-2 cores.
    * The explicit count pins the parallelism.
    */
  def cpuPartition(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
