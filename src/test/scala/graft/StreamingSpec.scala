package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Structured Streaming twins driven end-to-end: a file-backed stream
  * (public API, deterministic with Trigger.AvailableNow) through the
  * windowed and session plans into a memory sink.
  */
class StreamingSpec extends SparkSpecBase {

  private def streamEvents(dir: String) =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(s"$dir/events.parquet")

  test("streaming window_agg matches the batch shape") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 60, 1, "click", 1.5),
      ev(1, 120, 2, "click", 2.5),
      ev(2, 3660, 1, "view", 4.0)))
    val q = EventStream.windowAgg(streamEvents(dir))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = rows(spark.table("win_out")
      .select("window_start", "event_type", "n", "sum_value"))
    assert(out === Set(
      Seq("1970-01-01 00:00:00", "click", 2, 4.0),
      Seq("1970-01-01 01:00:00", "view", 1, 4.0)))
  }

  test("streaming dedup drops repeats within the watermark horizon") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 0, 1, "click", 1.0),
      ev(1, 60, 1, "click", 2.0),    // duplicate (user 1, click) within 1h
      ev(2, 120, 1, "view", 3.0),    // different type -> kept
      ev(3, 30, 2, "click", 4.0)))   // different user -> kept
    val q = EventStream.dedupEvents(streamEvents(dir))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSet
    // exactly one of the two (user 1, click) events survives (which one is
    // processing-order dependent); the distinct-keyed events always pass
    assert(out.intersect(Set(0L, 1L)).size === 1)
    assert(out.contains(2L) && out.contains(3L))
    assert(out.size === 3)
  }

  test("streaming sessionize emits a closed session once the watermark passes") {
    // user 1's session spans t=0..600s; the t=40h event pushes the
    // watermark (max event time - 8h) far past session end + 4h gap.
    val dir = fixtureDir(evs = Seq(
      ev(0, 0, 1, "click", 1.0),
      ev(1, 600, 1, "click", 2.0),
      ev(2, 144000, 9, "click", 9.0)))
    val q = EventStream.sessionize(streamEvents(dir))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = rows(spark.table("sess_out")
      .select("user_id", "session_start", "n_events", "first_event",
        "last_event", "total_value"))
    assert(out === Set(
      Seq(1L, "1970-01-01 00:00:00", 2, 0L, 1L, 3.0)))
  }

  test("streaming asof enrichment carries dimension state across batches") {
    // batch 1: user 1 purchase@10 then click@15; batch 2 (a separate
    // file, maxFilesPerTrigger=1): click@20 must still see the
    // purchase from batch 1 via the carried group state, and the
    // purchase@25 then click@30 roll the state forward.
    val b1 = Seq(
      ev(1, 5, 1, "click", 1.0),
      ev(2, 10, 1, "purchase", 100.0),
      ev(3, 15, 1, "click", 2.0))
    val b2 = Seq(
      ev(4, 20, 1, "click", 3.0),
      ev(5, 25, 1, "purchase", 200.0),
      ev(6, 30, 1, "click", 4.0),
      ev(7, 30, 2, "click", 5.0)) // user without purchases: nulls
    val stage = java.nio.file.Files
      .createTempDirectory("graft-asof-stream").toString
    import spark.implicits._
    Seq(b1, b2).zipWithIndex.foreach { case (evs, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-asof-tmp").toString
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$stage/b$i.parquet"))
    }
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = EventStream.asofEnrich(src)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = spark.table("asof_out").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((None, None)))
    assert(out(2L) === ((Some(2L), Some(100.0)))) // purchase sees itself
    assert(out(3L) === ((Some(2L), Some(100.0))))
    assert(out(4L) === ((Some(2L), Some(100.0)))) // carried across batches
    assert(out(5L) === ((Some(5L), Some(200.0)))) // state rolls forward
    assert(out(6L) === ((Some(5L), Some(200.0))))
    assert(out(7L) === ((None, None)))
    // in-order replay agrees with the batch operator exactly
    val dir = fixtureDir(evs = b1 ++ b2)
    val batch = graft.operators.Sessions.asofJoin(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(batch === out)
  }

  test("streaming attribution buffers clicks across batches, matches batch") {
    // w = 600 s. Boundary cases on purpose:
    //  - purchase@700 vs click@100: 100 > 700-600 is FALSE -> excluded
    //    (strict lower bound), though the click is still buffered;
    //  - click@900 / purchase@900 and click@1300 / purchase@1300: same-ts
    //    matches at gap 0 regardless of event-id order (click id 8 >
    //    purchase id 5);
    //  - click@650 lands in batch 1, attributes to purchases @700 and
    //    @900 in batch 2 via carried state.
    val b1 = Seq(
      ev(1, 100, 1, "click", 1.0),
      ev(3, 600, 1, "purchase", 10.0),
      ev(2, 650, 1, "click", 2.0),
      ev(9, 50, 2, "click", 9.0)) // user without purchases: no rows
    val b2 = Seq(
      ev(4, 700, 1, "purchase", 20.0),
      ev(6, 900, 1, "click", 3.0),
      ev(7, 900, 1, "purchase", 30.0),
      ev(5, 1300, 1, "purchase", 40.0),
      ev(8, 1300, 1, "click", 4.0))
    val stage = java.nio.file.Files
      .createTempDirectory("graft-attr-stream").toString
    import spark.implicits._
    Seq(b1, b2).zipWithIndex.foreach { case (evs, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-attr-tmp").toString
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$stage/b$i.parquet"))
    }
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = EventStream.attributeClicks(src)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = rows(spark.table("attr_out")
      .select("purchase_id", "click_id", "user_id", "gap_sec"))
    assert(out === Set(
      Seq(3L, 1L, 1L, 500L),
      Seq(4L, 2L, 1L, 50L),
      Seq(7L, 2L, 1L, 250L),
      Seq(7L, 6L, 1L, 0L),
      Seq(5L, 6L, 1L, 400L),
      Seq(5L, 8L, 1L, 0L)))
    // in-order replay agrees with the batch operator exactly
    val dir = fixtureDir(evs = b1 ++ b2)
    val batch = rows(graft.operators.Sessions.intervalJoin(spark, dir)
      .select("purchase_id", "click_id", "user_id", "gap_sec"))
    assert(batch === out)
  }

  test("sessionize runs on the RocksDB state store (production backend)") {
    // At 100 TB-scale streaming the session/window state outgrows the
    // default HDFS-backed in-memory store; RocksDB spills to local disk
    // with bounded heap. Same plan, same results — only the state
    // backend changes (set at query start from session conf).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = fixtureDir(evs = Seq(
        ev(0, 0, 1, "click", 1.0),
        ev(1, 100, 1, "click", 2.0),
        ev(2, 900000, 9, "click", 9.0))) // watermark pusher
      val q = EventStream.sessionize(streamEvents(dir))
        .writeStream.format("memory").queryName("rocks_sess_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      val out = rows(spark.table("rocks_sess_out")
        .where("user_id = 1")
        .select("user_id", "n_events", "first_event", "last_event",
          "total_value"))
      assert(out === Set(Seq(1L, 2, 0L, 1L, 3.0)))
    } finally {
      old.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }

  test("streaming sessionize boundary matches batch: exact-gap event merges") {
    // Spark merges session windows when the new event's start is <= the
    // open session's end (last + gap) — INCLUSIVE at exactly last+gap.
    // That matches batch Sessions.sessionize's strict `gap > GapSec`
    // (exact-gap stays in-session); see the SessionsSpec boundary twin.
    val gap = graft.operators.Sessions.GapSec
    val dir = fixtureDir(evs = Seq(
      ev(0, 50, 2, "click", 5.0),
      ev(1, 50 + gap, 2, "click", 6.0),     // exactly at end -> merged
      ev(2, 50 + 2 * gap, 2, "click", 7.0), // exactly at new end -> merged
      ev(3, 900000, 9, "click", 9.0)))      // watermark pusher
    val q = EventStream.sessionize(streamEvents(dir))
      .writeStream.format("memory").queryName("sess_boundary_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = rows(spark.table("sess_boundary_out")
      .where("user_id = 2")
      .select("user_id", "n_events", "first_event", "last_event",
        "total_value"))
    assert(out === Set(Seq(2L, 3, 0L, 2L, 18.0)))
  }

  test("streaming control chart flags closed days against frozen stats") {
    import graft.operators.Sessions
    // history: click days 0/1/2 with counts 1,1,4; view day 0 count 1.
    // the day-40 probe event advances the watermark past every window;
    // "probe" is absent from the frozen stats -> unchartable, dropped.
    val history = Seq(
      ev(0, 3600, 1, "click", 1.0),
      ev(1, 86400 + 3600, 1, "click", 1.0),
      ev(2, 2 * 86400 + 100, 1, "click", 1.0),
      ev(3, 2 * 86400 + 200, 2, "click", 1.0),
      ev(4, 2 * 86400 + 300, 3, "click", 1.0),
      ev(5, 2 * 86400 + 400, 4, "click", 1.0),
      ev(6, 7200, 5, "view", 2.0))
    val dir = fixtureDir(evs = history :+ ev(99, 40 * 86400, 9, "probe", 0.0))
    val historyDf = spark.read.parquet(s"$dir/events.parquet")
      .filter(org.apache.spark.sql.functions.col("event_type") =!= "probe")
    val stats = Sessions.dayStatsOf(Sessions.dailyCounts(historyDf))
      .localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory("graft-chart-store").toString + "/flags"
    val q = EventStream.watchEvents(streamEvents(dir), stats, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val got = rows(spark.read.parquet(store))
    val want = rows(Sessions.flagDaily(
      Sessions.dailyCounts(historyDf), stats))
    assert(got === want)
    assert(got.nonEmpty && got.size === 4)
    // replay is a no-op (store anti-join on (event_type, day))
    val q2 = EventStream.watchEvents(streamEvents(dir), stats, store)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(300000)
    assert(rows(spark.read.parquet(store)) === want)
  }

  test("streaming HLL registers max-merge to batch parity across batches") {
    import graft.streaming.SketchStream
    import graft.operators.Sessions
    val all = (0L until 40L).map(u => ev(u, u, u % 25, "click", 1.0)) ++
      (0L until 10L).map(u => ev(100 + u, u, u % 7, "view", 1.0))
    val dir = fixtureDir(evs = all)
    val store = java.nio.file.Files
      .createTempDirectory("graft-hll-store").toString + "/regs"
    val q = SketchStream.maintainHll(
      streamEvents(dir), store).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // replay the same events: max-merge absorbs duplicates, no change
    val q2 = SketchStream.maintainHll(
      streamEvents(dir), store).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(300000)
    val batchRegs = rows(Sessions.hllRegisters(
      spark.read.parquet(s"$dir/events.parquet")
        .select("event_type", "user_id")))
    assert(rows(spark.read.parquet(store)) === batchRegs)
    // and the standing estimate equals the batch query's hll_est
    val streamEst = SketchStream.estimate(spark, store).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_est")).toMap
    val batchEst = Sessions.approxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_est")).toMap
    assert(streamEst === batchEst)
  }

  test("streaming decay state drains to the batch temporal_decay rows") {
    import graft.operators.Sessions
    import spark.implicits._
    def atDay(id: Long, day: Long, user: Long, v: Double) =
      ev(id, day * 86400, user, "click", v)
    // same corpus as the batch spec, split mid-user across two batches
    val b1 = Seq(atDay(1, 14, 1, 4.0), atDay(2, 7, 1, 8.0))
    val b2 = Seq(atDay(3, 0, 1, 16.0), atDay(4, 13, 2, 5.0))
    val stage = java.nio.file.Files
      .createTempDirectory("graft-decay-stream").toString
    Seq(b1, b2).zipWithIndex.foreach { case (evs, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-decay-tmp").toString
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$stage/b$i.parquet"))
    }
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = EventStream.decayScores(src, refDay = 14L)
      .writeStream.format("memory").queryName("decay_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // latest emitted row per user (max n_events) == the batch operator
    val drained = spark.table("decay_out").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) =>
        val last = rs.maxBy(_.getAs[Long]("n_events"))
        Seq[Any](u, last.getAs[Long]("n_events"),
          last.getAs[Long]("last_day"),
          last.getAs[Double]("decayed_value"))
      }.toSet
    val dir = fixtureDir(evs = b1 ++ b2)
    assert(drained === rows(Sessions.temporalDecay(spark, dir)))
    // user 1's mid-stream row reflects only batch-1 events: 4 + 8/2 = 8
    val mid = spark.table("decay_out").collect()
      .filter(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L)
    assert(mid.length === 1 && mid.head.getAs[Double]("decayed_value") === 8.0)
  }

  test("streaming drift bins drain to batch quality_psi parity; replay " +
      "is a no-op") {
    import graft.streaming.DriftStream
    val hi = "the and for that with this from they have " * 8
    val b1 = Seq(doc(1, hi, source = "hi"), doc(3, "x", source = "lo"))
    val b2 = Seq(doc(2, hi, source = "hi"), doc(4, "y!", source = "lo"))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-drift-store").toString + "/bins"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = DriftStream.maintainBins(src, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // replay: the doc-keyed anti-join absorbs the duplicates
    val q2 = DriftStream.maintainBins(src, store)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(300000)
    val batchDir = fixtureDir(docs = b1 ++ b2)
    assert(rows(DriftStream.psi(spark, store)) ===
      rows(graft.operators.CorpusStats.qualityPsi(spark, batchDir)))
    assert(spark.read.parquet(store).count() === 4L)
  }

  test("streaming CUSUM store drains to batch cusum_shift parity; " +
      "replay is a no-op") {
    import graft.streaming.CusumStream
    import graft.operators.Sessions
    // two days of "click" split across micro-batches, plus a "view" day
    val b1 = Seq(ev(1, 10, 1), ev(2, 86410, 1), ev(5, 20, 9, "view"))
    val b2 = Seq(ev(3, 86420, 2), ev(4, 86430, 3))
    import spark.implicits._
    val stage = stageBatchFrames(Seq(b1.toDF(), b2.toDF()))
    val store = java.nio.file.Files
      .createTempDirectory("graft-cusum-store").toString + "/days"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = CusumStream.maintainDays(src, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // replay: the event-keyed anti-join absorbs the duplicates
    val q2 = CusumStream.maintainDays(src, store)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(300000)
    val batchDir = fixtureDir(evs = b1 ++ b2)
    assert(rows(CusumStream.chart(spark, store)) ===
      rows(Sessions.cusumShift(spark, batchDir)))
    assert(spark.read.parquet(store).count() === 5L)
  }
}
