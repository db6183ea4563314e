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

  test("writeZOrdered: per-file spans shrink on BOTH dims vs a 1-dim sort") {
    import org.apache.spark.sql.functions.{input_file_name, max => smax, min => smin}
    // a 64x64 grid: under sort-by-a each file spans b's whole range;
    // under the z-curve both dims span a fraction per file
    val grid = spark.range(0, 64).toDF("a")
      .crossJoin(spark.range(0, 64).toDF("b"))
    val base = java.nio.file.Files.createTempDirectory("graft-z").toString
    Sinks.writeSortedParquet(grid, s"$base/bya", Seq("a"), 16)
    Sinks.writeZOrdered(grid, s"$base/z", "a", "b", 16)
    def meanSpan(path: String, dim: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((smax(dim) - smin(dim)).as("span"))
        .collect().map(_.getAs[Long]("span"))
      spans.sum.toDouble / spans.length
    }
    // same rows round-trip
    assert(spark.read.parquet(s"$base/z").count() === 64L * 64)
    val (sortB, zA, zB) =
      (meanSpan(s"$base/bya", "b"), meanSpan(s"$base/z", "a"),
        meanSpan(s"$base/z", "b"))
    assert(sortB > 60, s"1-dim sort should span b fully, got $sortB")
    assert(zA < 32 && zB < 32,
      s"z-order must bound both dims per file: a=$zA b=$zB")
  }

  test("jsonl interchange: schema-pinned round trip, escapes survive") {
    import spark.implicits._
    val docs = Seq(
      Doc(1, "line one\nline \"two\" é中", "en", "s0", 20),
      Doc(2, "tabs\tand\\backslashes", "de", "s1", 20),
      Doc(3, null, "fr", "s2", 0)) // null text must survive
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    graft.sources.Interchange.writeJsonlDocs(docs.toDF(), s"$dir/docs")
    val back = graft.sources.Interchange.readJsonlDocs(spark, s"$dir/docs")
    assert(back.schema === graft.sources.Interchange.DocumentsSchema)
    assert(rows(back.select("doc_id", "text", "lang", "source", "n_chars"))
      === docs.map(d => Seq[Any](d.doc_id, d.text, d.lang, d.source,
        d.n_chars)).toSet)
  }
}
