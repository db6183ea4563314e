package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The write-side layouts: sorted-zstd files must carry disjoint key
  * ranges (the property min/max pruning relies on), and bucketed tables
  * must join without a shuffle exchange.
  */
class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  test("writeSortedParquet: zstd files with disjoint sort-key ranges") {
    val path = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 3 % 7)
    Sinks.writeSortedParquet(df, path, Seq("id"), numPartitions = 4)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.nonEmpty)
    assert(files.forall(_.contains("zstd")))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // each file's range ends before the next begins -> min/max pruning works
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(path).count() === 1000)
  }

  test("writePartitioned: hive layout, pruned reads see only their partition") {
    val path = Files.createTempDirectory("graft-part").toString + "/out"
    val df = spark.range(0, 100).toDF("id")
      .withColumn("day", col("id") % 3)
    Sinks.writePartitioned(df, path, Seq("day"))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("day=0", "day=1", "day=2"))
    val pruned = spark.read.parquet(path).filter(col("day") === 1)
    assert(pruned.count() === 33)
    // partition filter must reach the scan, not the rows
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
  }

  test("interaction_ingest: dedup-on-insert, bucketed reads aggregate shuffle-free") {
    // ev 3 re-submits ev 1's content (same user/type/value/props); the
    // same content under ANOTHER user (ev 4) is a distinct interaction
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, 1, "click", 1.0, k = 5),
      ev(2, 20, 1, "view", 2.0, k = 6),
      ev(3, 30, 1, "click", 1.0, k = 5),
      ev(4, 40, 2, "click", 1.0, k = 5)))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = graft.operators.Interactions
        .interactionIngest(spark, dir, "graft_ingest_t")
      // dedup-on-insert keeps the earliest submission only
      assert(out.select("event_id").collect().map(_.getLong(0)).toSet
        === Set(1L, 2L, 4L))
      // read-back equality: accepted rows survive the write bit-for-bit
      val src = spark.read.parquet(s"$dir/events.parquet")
        .filter(col("event_id").isin(1L, 2L, 4L))
      assert(rows(out.select("event_id", "ts", "user_id", "event_type",
        "value", "props")) === rows(src.select("event_id", "ts", "user_id",
        "event_type", "value", "props")))
      // the per-session consumers' shape: groupBy on the bucket key runs
      // with NO shuffle exchange (the write pre-paid it)
      val agg = spark.table("graft_ingest_t")
        .groupBy(col("user_id")).agg(count(lit(1)))
      assert(agg.count() === 2)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS graft_ingest_t")
    }
  }

  test("writeBucketedTable: bucketed join plans without a shuffle exchange") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 500).toDF("k").withColumn("va", col("k") * 2)
      val b = spark.range(0, 500).toDF("k").withColumn("vb", col("k") + 1)
      Sinks.writeBucketedTable(a, "graft_bkt_a", "k", 4, Seq("k"))
      Sinks.writeBucketedTable(b, "graft_bkt_b", "k", 4, Seq("k"))
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
