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
