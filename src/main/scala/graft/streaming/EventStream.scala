package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of graft.operators.Sessions: the same column
  * logic over an unbounded source with event-time watermarking. The
  * reference app appends interactions one request at a time
  * (/root/reference/database.py:97-158 add_interaction); at pipeline scale
  * that is a stream, and these plans run it with bounded state:
  *
  *  - watermark bounds how late an event may arrive before its window is
  *    finalized and its state evicted;
  *  - `window` is the tumbling-hour aggregation (Sessions.windowAgg);
  *  - `session_window` is the gap-session aggregation (Sessions.sessionize)
  *    — Spark merges/extends session state per key as events arrive.
  *
  * Input contract: an `events`-shaped frame (streaming or batch) with
  * `ts` as nanos-since-epoch long. Covered by StreamingSpec (MemoryStream).
  */
object EventStream {

  /** Attach an event-time timestamp derived the same way as the batch
    * operators (floor-epoch-seconds of the nanos long).
    */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time",
      timestamp_seconds(expr("ts div 1000000000")))

  /** Tumbling 1-hour windowed counts/sums per event type. */
  def windowAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast("int").as("n"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2)
          .as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact-dedup: drop events repeating the same key within the
    * watermark horizon — the streaming face of Dedup.dedupExact. State is
    * bounded by the watermark (a duplicate arriving later than the horizon
    * is not caught: the standard streaming trade, which the batch dedup
    * sweep mops up).
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour",
      keys: Seq[String] = Seq("user_id", "event_type")): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Gap-based sessions per user (4h gap, matching Sessions.GapSec). */
  def sessionize(events: DataFrame, watermark: String = "8 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2)
          .as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("first_event"), col("last_event"),
        col("total_value"))
}
