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
    q.awaitTermination(60000)
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
    q.awaitTermination(60000)
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
    q.awaitTermination(60000)
    val out = rows(spark.table("sess_out")
      .select("user_id", "session_start", "n_events", "first_event",
        "last_event", "total_value"))
    assert(out === Set(
      Seq(1L, "1970-01-01 00:00:00", 2, 0L, 1L, 3.0)))
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
      q.awaitTermination(60000)
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
    q.awaitTermination(60000)
    val out = rows(spark.table("sess_boundary_out")
      .where("user_id = 2")
      .select("user_id", "n_events", "first_event", "last_event",
        "total_value"))
    assert(out === Set(Seq(2L, 3, 0L, 2L, 18.0)))
  }
}
