package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed rows for the as-of enrichment state operator (top-level: Spark
  * encoders cannot reach inner classes).
  */
case class AsofEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double)
case class AsofState(ts: Long, event_id: Long, value: Double)
case class AsofOut(event_id: Long, user_id: Long, event_type: String,
    asof_event: Option[Long], asof_value: Option[Double])
case class AttrClick(click_id: Long, sec: Long)
case class AttrState(clicks: Seq[AttrClick])
case class DecayEvent(event_id: Long, ts: Long, user_id: Long,
    value: Double)
case class DecayState(nEvents: Long, lastDay: Long, buckets: Array[Long])
case class DecayOut(user_id: Long, n_events: Long, last_day: Long,
    decayed_value: Double)
case class AttrOut(purchase_id: Long, click_id: Long, user_id: Long,
    gap_sec: Long)

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

  /** Streaming as-of enrichment — the stateful twin of
    * Sessions.asofJoin: every event is enriched with the most recent
    * at-or-before 'purchase' of its user. Custom per-key state via
    * `flatMapGroupsWithState` (the KeyValueGroupedDataset state API):
    * the state is ONE row per user (the latest dimension version), so
    * state size is bounded by key cardinality, not stream length.
    *
    * Within a batch, each group's events process in event-time order
    * with the batch operator's exact tie semantics (same-ts purchases
    * collapse to max event_id; a purchase matches itself). Across
    * batches the state carries forward; an event arriving AFTER a
    * later-ts dimension already updated the state enriches against
    * that newer version — the standard streaming trade for
    * out-of-order arrivals (same class as dedupEvents' horizon), which
    * the batch asof_join mops up. On an in-order replay (the landing
    * pattern) streaming and batch agree exactly (spec-verified).
    */
  def asofEnrich(events: DataFrame): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(enrichGroup)
  }

  private def enrichGroup(user: Long, it: Iterator[AsofEvent],
      state: GroupState[AsofState]): Iterator[AsofOut] = {
    var st = state.getOption
    val sorted = it.toArray.sortBy(e => (e.ts, e.event_id))
    val out = Array.newBuilder[AsofOut]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j).ts == sorted(i).ts) j += 1
      // dimension rows first at equal ts (the batch ordering): all
      // same-ts purchases update state before anything emits, so ties
      // collapse to the max event_id version
      var k = i
      while (k < j) {
        val e = sorted(k)
        if (e.event_type == "purchase" &&
          st.forall(s => s.ts < e.ts ||
            (s.ts == e.ts && s.event_id < e.event_id)))
          st = Some(AsofState(e.ts, e.event_id, e.value))
        k += 1
      }
      k = i
      while (k < j) {
        val e = sorted(k)
        out += AsofOut(e.event_id, e.user_id, e.event_type,
          st.map(_.event_id), st.map(_.value))
        k += 1
      }
      i = j
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Streaming interval_join twin — state-buffered trailing-window
    * attribution: every 'purchase' emits one row per same-user 'click'
    * within the [[graft.operators.Sessions.AttributionSec]] trailing
    * window, matching the batch operator's boundary semantics exactly
    * (c_sec > p_sec - w strict, c_sec <= p_sec inclusive).
    *
    * State is the per-user buffer of clicks still inside the window of
    * ANY future purchase — clicks older than maxSeen - w evict every
    * batch, so state is bounded by per-user click rate × window, not
    * stream length. Within a batch, events process in event-time order
    * with same-ts clicks buffered before same-ts purchases (the batch
    * join matches c_sec == p_sec regardless of event id). A click
    * arriving out of order across batches — after a purchase it should
    * have attributed — is missed: the standard streaming trade (cf.
    * dedupEvents' horizon), which batch interval_join mops up.
    */
  def attributeClicks(events: DataFrame): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(attributeGroup)
  }

  private def attributeGroup(user: Long, it: Iterator[AsofEvent],
      state: GroupState[AttrState]): Iterator[AttrOut] = {
    val w = graft.operators.Sessions.AttributionSec
    var clicks = state.getOption.map(_.clicks.toList).getOrElse(Nil)
    val sorted = it.toArray.sortBy(e => (e.ts, e.event_id))
    val out = Array.newBuilder[AttrOut]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j).ts == sorted(i).ts) j += 1
      var k = i
      while (k < j) {
        val e = sorted(k)
        if (e.event_type == "click")
          clicks = AttrClick(e.event_id, e.ts / 1000000000L) :: clicks
        k += 1
      }
      k = i
      while (k < j) {
        val e = sorted(k)
        if (e.event_type == "purchase") {
          val p = e.ts / 1000000000L
          clicks.foreach { c =>
            if (c.sec > p - w && c.sec <= p)
              out += AttrOut(e.event_id, c.click_id, user, p - c.sec)
          }
        }
        k += 1
      }
      i = j
    }
    if (sorted.nonEmpty) {
      val maxSec = sorted.last.ts / 1000000000L
      val kept = clicks.filter(_.sec > maxSec - w)
      if (kept.isEmpty) state.remove() else state.update(AttrState(kept))
    }
    out.result().iterator
  }

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

  /** Streaming Shewhart control chart — the streaming face of
    * Sessions.eventAnomalies under the freeze-then-probe contract:
    * per-type (mean, sigma) day statistics are FROZEN from a history
    * corpus (Sessions.dayStatsOf — recalibrated on a policy cadence,
    * like the LM/DSIR/tercile artifacts), and arriving events are
    * charted against them, never against the batch they arrive in.
    *
    * Shape: watermarked 1-day tumbling counts per type (bounded state —
    * the windowAgg posture on the day grid); each CLOSED window emits
    * once into foreachBatch, is flagged by the SHARED Sessions.flagDaily
    * primitive (6dp mean / 4dp z / 3σ bit — the batch-parity anchor),
    * and appends to the store keyed (event_type, day); replays no-op
    * via the store anti-join. Types absent from the frozen stats are
    * unchartable and drop (the ScoreStream unknown-language rule).
    */
  def watchEvents(events: DataFrame,
      stats: DataFrame, store: String,
      watermark: String = "1 day")
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_seconds(window.start) div 86400").as("day"), col("n"))
      .writeStream.foreachBatch {
        (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
          StreamStore.appendNew(b.toDF(), store,
            Seq("event_type", "day"))(
            graft.operators.Sessions.flagDaily(_, stats))
      }

  /** Streaming engagement decay — the stateful twin of
    * Sessions.temporalDecay against a FROZEN reference day (the
    * freeze-then-probe contract: batch derives ref_day from the corpus
    * max; a stream applies the day frozen at calibration time). Each
    * batch emits the updated per-user row, so the LAST row per user is
    * the live score.
    *
    * Exactness without wide decimals in state: the weighted sum
    * su = Σ cents·2^(40-halves) never materializes in state — instead
    * state keeps ONE exact cent-sum per halves bucket (≤41 longs per
    * user, bounded regardless of stream length), and each emit
    * reconstructs su in BigDecimal and applies the batch operator's
    * exact float steps. An event older than the [[
    * graft.operators.Sessions.DecayMaxHalves]] horizon clamps to the
    * floor weight (the batch least() rule); an event NEWER than the
    * frozen ref day clamps to weight 1 — the streaming-only case a
    * self-calibrated batch run can never see.
    */
  def decayScores(events: DataFrame, refDay: Long): Dataset[DecayOut] = {
    import events.sparkSession.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[DecayEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateDecay(refDay))
  }

  private def updateDecay(refDay: Long)(user: Long,
      it: Iterator[DecayEvent],
      state: GroupState[DecayState]): Iterator[DecayOut] = {
    val mh = graft.operators.Sessions.DecayMaxHalves
    val hl = graft.operators.Sessions.DecayHalfLifeDays
    val st = state.getOption
      .getOrElse(DecayState(0L, Long.MinValue, new Array[Long](mh + 1)))
    var n = st.nEvents
    var last = st.lastDay
    val b = st.buckets.clone()
    it.foreach { e =>
      val day = e.ts / 1000000000L / 86400L
      val cents = math.floor(e.value * 100 + 0.5).toLong
      val h = math.max(0L, math.min(mh.toLong, (refDay - day) / hl)).toInt
      b(h) += cents
      n += 1
      if (day > last) last = day
    }
    state.update(DecayState(n, last, b))
    var su = BigDecimal(0)
    var h = 0
    while (h <= mh) {
      if (b(h) != 0L) su += BigDecimal(b(h)) * BigDecimal(2).pow(mh - h)
      h += 1
    }
    val d = math.floor(su.toDouble / (1L << mh) / 100 * 10000 + 0.5) / 10000
    Iterator.single(DecayOut(user, n, last, d))
  }
}
