package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.sources.Tables

/** Micro-probe for plan-shape timing experiments: times named queries
  * (min of 2 runs, noop sink — count() would column-prune map queries
  * to the bare scan) against any sf/probe dir, without the full Bench
  * session cost per experiment.
  *
  * Usage: runMain graft.tools.Probe <dir> [query,query,...]
  *
  * This harness found the r3 execution-shape defects (single-task regex
  * stages, per-element Generate re-evaluation, count() pruning) — see
  * BASELINE.md "Execution-shape rules". Extend it inline when hunting a
  * new shape problem; keep throwaway variants out of version control.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only = if (args.length > 1) args(1).split(",").toSet
               else SparkEntry.queries.keySet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(Tables.NanosFlag, "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("PROBE_LOG", "WARN"))

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      // same hygiene as Bench: drop checkpoint blocks and let the
      // ContextCleaner reclaim broadcasts, or probe numbers inflate
      // 3-10x from earlier queries' backlog (measured: hist_quantiles
      // 21.9 s after an index build vs 2.1 s clean)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      t
    }
    // PROBE_RUNS (default 2): more runs tighten the min on a host whose
    // ambient noise can double a single steady-state run (measured r14)
    val runs = sys.env.getOrElse("PROBE_RUNS", "2").toInt.max(2)
    SparkEntry.queries.keys.filter(only).toSeq.sorted.foreach { name =>
      // all runs timed: run 1 carries the per-JVM IndexStore builds
      // (the Bench queries_max convention), min is the consumer cost
      val ts = Seq.fill(runs)(once(name))
      println(f"PROBE $name%-24s min=${ts.min}%8.3f s  " +
        f"max=${ts.max}%8.3f s")
    }
    spark.stop()
  }
}
