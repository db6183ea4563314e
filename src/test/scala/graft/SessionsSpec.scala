package graft

import graft.operators.{Interactions, Sessions}

/** Session boundaries, window rollups, and the interaction-log operators
  * on crafted event streams.
  */
class SessionsSpec extends SparkSpecBase {

  test("sessionize: gap >4h opens a new session; exact-gap stays (session_window parity)") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 0, user = 1, value = 1.0),
      ev(1, 100, user = 1, value = 2.0),     // same session (gap 100s)
      ev(2, 20000, user = 1, value = 3.0),   // gap 19900s > 14400 -> new
      ev(3, 20100, user = 1, value = 4.0),
      ev(4, 50, user = 2, value = 5.0),      // other user
      // exactly GapSec later: session_window merges inclusively at
      // last+gap (verified in StreamingSpec), so batch's strict `>`
      // keeps this in the SAME session — identical classification.
      ev(5, 50 + Sessions.GapSec, user = 2, value = 6.0),
      // one second past the horizon of event 5 -> still same session
      ev(6, 50 + 2 * Sessions.GapSec, user = 2, value = 7.0)))
    val out = Sessions.sessionize(spark, dir)
      .select("user_id", "session_idx", "n_events", "first_event",
        "last_event", "duration_sec", "total_value")
    assert(rows(out) === Set(
      Seq(1L, 1, 2, 0L, 1L, 100L, 3.0),
      Seq(1L, 2, 2, 2L, 3L, 100L, 7.0),
      Seq(2L, 1, 3, 4L, 6L, 2 * Sessions.GapSec, 18.0)))
  }

  test("window_agg: tumbling hour buckets per event type") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 60, 1, "click", 1.5),
      ev(1, 120, 2, "click", 2.5),
      ev(2, 60, 3, "view", 4.0),
      ev(3, 3660, 1, "click", 8.0))) // next hour
    val out = Sessions.windowAgg(spark, dir)
      .select("window_start", "event_type", "n", "sum_value", "avg_value")
    assert(rows(out) === Set(
      Seq("1970-01-01 00:00:00", "click", 2, 4.0, 2.0),
      Seq("1970-01-01 00:00:00", "view", 1, 4.0, 4.0),
      Seq("1970-01-01 01:00:00", "click", 1, 8.0, 8.0)))
  }

  test("asof_join: at-or-before match, same-ts ties, pre-first-dim nulls") {
    val dir = fixtureDir(evs = Seq(
      ev(1, 5, user = 1, "click", 1.0),            // before any purchase
      ev(2, 10, user = 1, "purchase", 100.0),      // dim v1
      ev(3, 10, user = 1, "click", 2.0),           // same ts as dim -> v1
      ev(4, 15, user = 1, "click", 3.0),           // between -> v1
      ev(5, 20, user = 1, "purchase", 200.0),      // dim v2
      ev(6, 20, user = 1, "purchase", 300.0),      // same-ts dim tie: max id wins
      ev(7, 25, user = 1, "click", 4.0),           // after both -> v2' (ev 6)
      ev(8, 30, user = 2, "click", 5.0)))          // user without purchases
    val out = Sessions.asofJoin(spark, dir)
      .select("event_id", "asof_event", "asof_value")
    assert(rows(out) === Set(
      Seq(1L, null, null),
      Seq(2L, 2L, 100.0),   // a purchase matches itself
      Seq(3L, 2L, 100.0),   // at-or-before is inclusive
      Seq(4L, 2L, 100.0),
      Seq(5L, 6L, 300.0),   // same-ts purchases collapse to max event_id
      Seq(6L, 6L, 300.0),
      Seq(7L, 6L, 300.0),
      Seq(8L, null, null)))
  }

  test("scd2_build: tie-collapsed versions, lead-closed intervals, open tail") {
    val dir = fixtureDir(evs = Seq(
      ev(1, 100, user = 1, "purchase", 10.0),
      ev(2, 100, user = 1, "purchase", 20.0),  // same-ts tie: max id wins
      ev(3, 200, user = 1, "click", 1.0),      // not a version
      ev(5, 500, user = 1, "purchase", 30.0),
      ev(7, 50, user = 2, "purchase", 40.0)))
    val out = Sessions.scd2Build(spark, dir)
    assert(rows(out) === Set(
      Seq(1L, 1, 2L, 20.0, 100L, 500L),  // closed by v2
      Seq(1L, 2, 5L, 30.0, 500L, null),  // current version stays open
      Seq(2L, 1, 7L, 40.0, 50L, null)))
  }

  test("event_anomalies: 3σ spike flagged; zero-σ type scores z=0") {
    // "view": 29 one-event days + a 12-event spike on day 29;
    // "click": identical daily counts -> σ=0 -> z=0, never anomalous
    val quiet = (0 until 29).map(d => ev(d, d * 86400L, user = 1, "view"))
    val spike = (0 until 12).map(i =>
      ev(100 + i, 29 * 86400L + i, user = 1, "view"))
    val flat = (0 until 3).map(d => ev(200 + d, d * 86400L, user = 1))
    val dir = fixtureDir(evs = quiet ++ spike ++ flat)
    // formula replicated with the operator's exact operand order
    val (d, s1, s2) = (30.0, 29 + 12.0, 29 + 144.0)
    val mean = s1 / d
    val sigma = math.sqrt(s2 / d - (s1 / d) * (s1 / d))
    assert(12 > mean + 3 * sigma) // the fixture must actually spike
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected =
      (0 until 29).map(dd => Seq[Any]("view", dd.toLong, 1L, r6(mean),
        r4((1 - mean) / sigma), false)).toSet +
      Seq[Any]("view", 29L, 12L, r6(mean), r4((12 - mean) / sigma), true) ++
      (0 until 3).map(dd =>
        Seq[Any]("click", dd.toLong, 1L, 1.0, 0.0, false))
    assert(rows(Sessions.eventAnomalies(spark, dir)) === expected)
  }

  test("event_pivot: dow crosstab, missing combos coalesce to 0") {
    // day 0 = 1970-01-01 = Thursday -> dow 4; day 3 = Sunday -> dow 0
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, user = 1, "click"), ev(2, 20, user = 1, "click"),
      ev(3, 30, user = 1, "view"),
      ev(4, 3 * 86400L, user = 2, "purchase")))
    assert(rows(Sessions.eventPivot(spark, dir)) === Set(
      Seq(4L, 2L, 0L, 0L, 0L, 1L),   // Thu: click=2, view=1
      Seq(0L, 0L, 0L, 1L, 0L, 0L)))  // Sun: purchase=1
  }

  test("conversation_history: last 5 per session, newest first") {
    val dir = fixtureDir(evs = (0 until 7).map(i =>
      ev(i, i * 1000L, user = 1, value = i.toDouble, k = i)))
    val out = Interactions.conversationHistory(spark, dir)
      .select("rn", "event_id")
    // events 6..2 survive as rn 1..5
    assert(rows(out) === Set(
      Seq(1, 6L), Seq(2, 5L), Seq(3, 4L), Seq(4, 3L), Seq(5, 2L)))
  }

  test("interaction_history: full per-session log with sequence numbers") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 0, 1), ev(1, 10, 1), ev(2, 20, 2)))
    val out = Interactions.interactionHistory(spark, dir)
      .select("user_id", "seq", "event_id")
    assert(rows(out) === Set(
      Seq(1L, 1, 0L), Seq(1L, 2, 1L), Seq(2L, 1, 2L)))
  }

  test("conversation_context: previous <=3 turns, frame-ordered") {
    val dir = fixtureDir(evs = (0 until 5).map(i =>
      ev(i, i * 10L, user = 1, typ = s"t$i", value = i.toDouble)))
    val out = Interactions.conversationContext(spark, dir)
      .select("event_id", "context")
    assert(rows(out) === Set(
      Seq(0L, ""),
      Seq(1L, "Q: t0 A: 0.0"),
      Seq(2L, "Q: t0 A: 0.0 Q: t1 A: 1.0"),
      Seq(3L, "Q: t0 A: 0.0 Q: t1 A: 1.0 Q: t2 A: 2.0"),
      Seq(4L, "Q: t1 A: 1.0 Q: t2 A: 2.0 Q: t3 A: 3.0")))
  }

  test("high_quality: threshold OR adherence, most recent first") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 0, 1, "click", 1.0, k = 90),    // overlap 0.9 -> in
      ev(1, 1, 1, "click", 1.0, k = 10),    // overlap 0.1, low -> out
      ev(2, 2, 1, "purchase", 1.0, k = 0),  // adherence high -> in
      ev(3, 3, 1, "signup", 1.0, k = 70)))  // overlap 0.7 -> in (boundary)
    val out = Interactions.highQuality(spark, dir)
      .select("event_id", "term_overlap", "template_adherence")
    assert(rows(out) === Set(
      Seq(0L, 0.9, "low"), Seq(2L, 0.0, "high"), Seq(3L, 0.7, "medium")))
  }

  test("funnel: ordered first-touch steps, out-of-order users drop out") {
    val dir = fixtureDir(evs = Seq(
      // user 1 completes the funnel in order
      ev(0, 100, 1, "signup"), ev(1, 200, 1, "click"),
      ev(2, 300, 1, "purchase"),
      // user 2: click BEFORE signup -> counts only step 1
      ev(3, 100, 2, "click"), ev(4, 200, 2, "signup"),
      // user 3: signup + later click, purchase before click -> step 2
      ev(5, 100, 3, "signup"), ev(6, 300, 3, "click"),
      ev(7, 200, 3, "purchase"),
      // user 4 never signs up -> no step
      ev(8, 100, 4, "click"), ev(9, 200, 4, "purchase")))
    val out = rows(Sessions.funnel(spark, dir))
    assert(out === Set(
      Seq(1, "signup", 3L),
      Seq(2, "click", 2L),
      Seq(3, "purchase", 1L)))
  }

  test("session_stats: histogram-cumulative duration percentiles") {
    // sessions: (1 event, 0 s), (2 events, 120 s), (3 events, 600 s)
    val dir = fixtureDir(evs = Seq(
      ev(1, 100, 1),
      ev(2, 1000, 2), ev(3, 1120, 2),
      ev(4, 5000, 3), ev(5, 5300, 3), ev(6, 5600, 3)))
    // N=3: p50 -> first bin with cum*100 >= 150 (bin 2 = 120 s),
    // p90 -> cum*100 >= 270 (bin 10 = 600 s)
    assert(rows(graft.operators.Sessions.sessionStats(spark, dir)) === Set(
      Seq(3L, 2.0, 240.0, 120L, 600L)))
  }

  test("active_users: per-day dedup, per-period MAU, stickiness ratio") {
    val dir = fixtureDir(evs = Seq(
      ev(1, 100, 1), ev(2, 200, 2),          // day 0: users {1,2}
      ev(3, 86410, 1), ev(4, 86420, 1),      // day 1: user 1 (deduped)
      ev(5, 28 * 86400 + 5, 3)))             // period 1, day 28: user 3
    // period 0: dau_sum 3 over 2 days, mau 2 -> avg 1.5, stickiness .75
    assert(rows(graft.operators.Sessions.activeUsers(spark, dir)) === Set(
      Seq(0L, 2L, 2L, 1.5, 0.75),
      Seq(1L, 1L, 1L, 1.0, 1.0)))
  }

  test("cohort_retention: first-event week cohorts, distinct weekly users") {
    val wk = 604800L
    val dir = fixtureDir(evs = Seq(
      // user 1: first event week 0, active weeks 0 and 2 (twice in wk 2)
      ev(0, 100, 1), ev(1, 2 * wk + 50, 1), ev(2, 2 * wk + 60, 1),
      // user 2: also cohort week 0, active week 0 only
      ev(3, 200, 2),
      // user 3: cohort week 1, active weeks 1 and 2
      ev(4, wk + 10, 3), ev(5, 2 * wk + 10, 3)))
    val out = rows(Sessions.cohortRetention(spark, dir))
    assert(out === Set(
      Seq(0L, 0, 2L),
      Seq(0L, 2, 1L),
      Seq(1L, 0, 1L),
      Seq(1L, 1, 1L)))
  }

  test("cohort_ltv: cumulative purchase value per cohort user") {
    val wk = 604800L
    val dir = fixtureDir(evs = Seq(
      // cohort week 0: users 1 and 2 (2 cohort users)
      // user 1 buys 10.50 in week 0 and 2.25 in week 2
      ev(0, 100, 1, "purchase", 10.50),
      ev(1, 2 * wk + 50, 1, "purchase", 2.25),
      // user 2 signs up week 0 (click only — counted in size, buys 0)
      ev(2, 200, 2),
      // cohort week 1: user 3 buys 4.00 in its week 1 (week_no 0)
      ev(3, wk + 10, 3, "purchase", 4.00)))
    val out = rows(Sessions.cohortLtv(spark, dir))
    assert(out === Set(
      // cohort 0: week 0 value 10.50, ltv 10.50/2 users = 5.25
      Seq(0L, 0, 2L, 10.50, 5.25),
      // cohort 0: week 2 value 2.25, cumulative 12.75/2 = 6.375
      Seq(0L, 2, 2L, 2.25, 6.375),
      // cohort 1: one user, 4.00
      Seq(1L, 0, 1L, 4.00, 4.0)))
  }

  test("event_transitions: lead pairs, event-id tie order, row-normalized") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 10, 1, "click"),
      // tie at sec 20: event_id 1 (view) before 2 (click)
      ev(1, 20, 1, "view"),
      ev(2, 20, 1, "click"),
      ev(3, 30, 1, "purchase"),
      ev(4, 5, 2, "click"),
      ev(5, 10, 2, "click")))
    // user 1: click->view->click->purchase; user 2: click->click
    val out = rows(Sessions.eventTransitions(spark, dir))
    assert(out === Set(
      Seq("click", "view", 1L, 0.333333),
      Seq("click", "click", 1L, 0.333333),
      Seq("click", "purchase", 1L, 0.333333),
      Seq("view", "click", 1L, 1.0)))
  }

  test("event_paths: 3-step journeys, per-user windows never cross") {
    val dir = fixtureDir(evs = Seq(
      ev(0, 10, 1, "click"), ev(1, 20, 1, "view"),
      ev(2, 30, 1, "click"), ev(3, 40, 1, "purchase"),
      ev(4, 5, 2, "click"), ev(5, 10, 2, "view"), ev(6, 15, 2, "click")))
    // user 1: click>view>click, view>click>purchase; user 2: click>view>click
    val out = rows(Sessions.eventPaths(spark, dir))
    assert(out === Set(
      Seq("click>view>click", 2L, 1),
      Seq("view>click>purchase", 1L, 2)))
  }

  test("interval_join: trailing-window attribution, cross-bucket, BNL-free") {
    val dir = fixtureDir(evs = Seq(
      ev(10, 1000, 1, "purchase", 9.0),
      // gap 600 = outside the half-open (p-600, p] window
      ev(0, 400, 1, "click"),
      // gap 599: inside, and in the PREVIOUS 600s bucket (crosses the
      // bucket boundary at 600 -> proves the 2-bucket explode)
      ev(1, 401, 1, "click"),
      ev(2, 1000, 1, "click"),  // gap 0: at-the-instant, inside
      ev(3, 1100, 1, "click"),  // after the purchase
      ev(4, 500, 2, "click"),   // other user
      ev(5, 999, 1, "view")))   // wrong type
    val df = Sessions.intervalJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    val out = rows(df.select("purchase_id", "click_id", "user_id", "gap_sec"))
    assert(out === Set(
      Seq(10L, 1L, 1L, 599L),
      Seq(10L, 2L, 1L, 0L)))
  }

  test("effectiveness_trend: weekly rollup matches hand computation") {
    // week 0: k=80 (purchase, high, ov .8 pass), k=30 (click, low, fail)
    // week 1: k=90 (click, low, ov .9 pass) by two users
    val W = 604800L
    val dir = fixtureDir(evs = Seq(
      ev(0, 100, 1, "purchase", 1.0, k = 80),
      ev(1, 200, 1, "click", 1.0, k = 30),
      ev(2, W + 100, 1, "click", 1.0, k = 90),
      ev(3, W + 200, 2, "click", 1.0, k = 90)))
    val out = rows(graft.operators.Interactions.effectivenessTrend(spark, dir))
    assert(out === Set(
      Seq(0L, 2L, 1L, 0.55, 0.5, 0.5),
      Seq(1L, 2L, 2L, 0.9, 0.0, 1.0)))
  }

  test("approx_distinct: the md5-derived HLL matches a hand-run sketch") {
    // 40 distinct users on one type; 2 on another (small-range branch)
    val evs = (0L until 40L).map(u => ev(u, u, u, "click", 1.0)) ++
      Seq(ev(100, 1, 1, "view", 1.0), ev(101, 2, 2, "view", 1.0),
        ev(102, 3, 1, "view", 1.0)) // duplicate (view, 1) pair
    val dir = fixtureDir(evs = evs)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def expected(users: Seq[Long]): Double = {
      val regs = scala.collection.mutable.Map[Long, Int]()
      users.distinct.foreach { u =>
        val h = java.lang.Long.parseLong(md5hex(u.toString).take(15), 16)
        val b = h % 64
        val w = h >> 6
        val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        regs(b) = math.max(regs.getOrElse(b, 0), rho)
      }
      val nb = regs.size
      val sp = regs.values.map(r => 1L << (55 - r)).sum
      val sTot = sp + (64L - nb) * 36028797018963968L
      val eRaw = 0.709 * 4096.0 / (sTot.toDouble / 36028797018963968L.toDouble)
      val v = 64 - nb
      rnd6(if (v > 0 && eRaw <= 160.0) 64.0 * math.log(64.0 / v) else eRaw)
    }
    val out = graft.operators.Sessions.approxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(out("click")(1) === 40L)
    assert(out("click")(3) === expected(0L until 40L))
    assert(out("view")(1) === 2L) // the duplicate pair counted once
    assert(out("view")(3) === expected(Seq(1L, 2L)))
  }

  test("heavy_hitters: CMS estimates are one-sided and exact when clean") {
    // user 1 dominates with 30 events; users 2..11 get 2 each
    val evs = (0L until 30L).map(i => ev(i, i, 1, "click", 1.0)) ++
      (2L to 11L).flatMap(u => Seq(
        ev(100 + u * 2, u, u, "view", 1.0),
        ev(101 + u * 2, u + 50, u, "view", 1.0)))
    val dir = fixtureDir(evs = evs)
    val out = graft.operators.Sessions.heavyHitters(spark, dir).collect()
    assert(out.head.getAs[Long]("user_id") === 1L)
    assert(out.head.getAs[Long]("n_events") === 30L)
    assert(out.head.getAs[Int]("rank") === 1)
    // one-sided error: every estimate >= the true count
    assert(out.forall(r => r.getAs[Long]("overest") >= 0L))
    assert(out.forall(r =>
      r.getAs[Long]("cms_est") ===
        r.getAs[Long]("n_events") + r.getAs[Long]("overest")))
    // 11 users over 4x256 cells: collisions are unlikely but legal;
    // the dominant user's min-row estimate is bounded by total volume
    assert(out.head.getAs[Long]("cms_est") <= 50L)
  }

  test("session_gaps: known gaps land in their power-of-two bins") {
    import graft.operators.Sessions
    val G = Sessions.GapSec // 4h = 14400
    // user 1: sessions at [0..100], then +5h gap, then +16400s gap is..
    // gaps: (18100-100)=18000 -> bin 16384; (second) 32768-boundary hit:
    // next session starts exactly 32768s after the previous end
    val evs = Seq(
      ev(0, 0, 1, "click", 1.0),
      ev(1, 100, 1, "click", 1.0),
      ev(2, 18100, 1, "click", 1.0),            // gap 18000
      ev(3, 18100 + 32768, 1, "click", 1.0),    // gap 32768 exactly
      ev(4, 0, 2, "click", 1.0),
      ev(5, 0 + G + 1 + 0, 2, "click", 1.0))    // gap G+1=14401 -> bin 8192
    val dir = fixtureDir(evs = evs)
    val out = rows(Sessions.sessionGaps(spark, dir))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(out === Set(
      Seq(8192L, 1L, r4(1.0 / 3)),
      Seq(16384L, 1L, r4(1.0 / 3)),
      Seq(32768L, 1L, r4(1.0 / 3))))
  }

  test("temporal_decay: power-of-two half-life weights against the max day") {
    import graft.operators.Sessions
    def atDay(id: Long, day: Long, user: Long, v: Double) =
      ev(id, day * 86400, user, "click", v)
    // ref day = 14 (the corpus max). user 1: ages 0 / 7 / 14 days ->
    // 0 / 1 / 2 half-lives -> 4.0 + 8.0/2 + 16.0/4 = 12.0
    // user 2: age 1 day -> 1 div 7 = 0 halves -> full 5.0
    val dir = fixtureDir(evs = Seq(
      atDay(1, 14, 1, 4.0), atDay(2, 7, 1, 8.0), atDay(3, 0, 1, 16.0),
      atDay(4, 13, 2, 5.0)))
    assert(rows(Sessions.temporalDecay(spark, dir)) === Set(
      Seq(1L, 3L, 14L, 12.0),
      Seq(2L, 1L, 13L, 5.0)))
  }

  test("user_overlap: pair counts, jaccard, lift; disjoint audiences emit no row") {
    import graft.operators.Sessions
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // click={1,2,3} view={1,2} purchase={3}; duplicate click events for
    // user 1 must not inflate the distinct audience
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, 1, "click"), ev(2, 20, 1, "click"), ev(3, 30, 2, "click"),
      ev(4, 40, 3, "click"), ev(5, 50, 1, "view"), ev(6, 60, 2, "view"),
      ev(7, 70, 3, "purchase")))
    // view∩purchase is empty -> that pair is absent, not zero
    assert(rows(Sessions.userOverlap(spark, dir)) === Set(
      Seq("click", "purchase", 3L, 1L, 1L, r4(1.0 / 3), 1.0),
      Seq("click", "view", 3L, 2L, 2L, r4(2.0 / 3), 1.0)))
  }

  test("robust_stats: the fat-finger outlier moves the mean, not the winsorized") {
    import graft.operators.Sessions
    // nine 1.00-value events and one 100.00 outlier: p95 position is 9
    // of 10 -> the clamp band collapses to [1.00, 1.00] and the
    // winsorized mean ignores the outlier entirely
    val evs = (1 to 9).map(i => ev(i, i * 10, 1, "click", 1.0)) :+
      ev(10, 100, 1, "click", 100.0)
    val dir = fixtureDir(evs = evs)
    assert(rows(Sessions.robustStats(spark, dir)) === Set(
      Seq("click", 10L, 10.9, 1.0, 1.0)))
  }

  test("dow_anomalies: spike flags against its OWN day-of-week population") {
    import graft.operators.Sessions
    // Thursdays (dow 3): 11 days of 1 event + one day of 12 -> the
    // spike clears mean+3sigma (needs d>=11: with the spike inside the
    // stats, z is bounded by sqrt(d-1)); Fridays: two flat days
    // (sigma=0 -> z defined as 0.0, never anomalous)
    var id = 0L
    def day(d: Long, cnt: Int, user: Long = 1) = (0 until cnt).map { k =>
      id += 1; ev(id, d * 86400 + k, user, "click")
    }
    val evs = (0 to 10).flatMap(w => day(w * 7L, 1)) ++ day(77L, 12) ++
      day(1L, 2) ++ day(8L, 2)
    val dir = fixtureDir(evs = evs)
    val out = graft.operators.Sessions.dowAnomalies(spark, dir).collect()
    val spike = out.filter(r => r.getAs[Long]("day") == 77L)
    assert(spike.length === 1 && spike.head.getAs[Boolean]("is_anomaly"))
    assert(spike.head.getAs[Int]("dow") === 3)
    assert(spike.head.getAs[Double]("z") > 3.0)
    // flat Fridays: sigma 0 -> z 0.0, not anomalous
    val fri = out.filter(_.getAs[Int]("dow") === 4)
    assert(fri.length === 2)
    assert(fri.forall(r => r.getAs[Double]("z") === 0.0 &&
      !r.getAs[Boolean]("is_anomaly")))
    // ordinary Thursdays stay unflagged
    assert(out.count(_.getAs[Boolean]("is_anomaly")) === 1)
  }

  test("weekly_profile: epoch-day dow grid, tie-to-earliest peak") {
    import graft.operators.Sessions
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // day 0 (1970-01-01) = Thursday = dow 3; day 1 = Friday = dow 4
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, 1, "click"), ev(2, 20, 2, "click"),          // Thu x2
      ev(3, 86400 + 10, 1, "click"),                         // Fri x1
      ev(4, 30, 1, "view"), ev(5, 86400 + 30, 2, "view")))   // tie 1-1
    assert(rows(Sessions.weeklyProfile(spark, dir)) === Set(
      Seq("click", 3, 2L, r4(2.0 / 3), true),
      Seq("click", 4, 1L, r4(1.0 / 3), false),
      Seq("view", 3, 1L, 0.5, true),   // tie breaks to the earlier day
      Seq("view", 4, 1L, 0.5, false)))
  }

  test("cusum_shift: hand-computed chart; a sustained 1-sigma drift " +
      "crosses h where no single day breaches 3-sigma") {
    import graft.operators.Sessions
    // type "a": counts 1,1,1,5 over days 0..3 -> mean 2, sigma sqrt(3)
    val a = Seq(0, 1, 2).map(d => ev(d, d * 86400L, 1, "a")) ++
      (0 until 5).map(i => ev(10 + i, 3 * 86400L + i, 1, "a"))
    // type "b": 11 days at 1, then 11 days at 3 -> mean 2, sigma 1,
    // z = -1/+1 exactly; neither regime has a 3-sigma day, but the
    // CUSUM accumulates (|z| - k) = 0.5 per day and crosses h = 5 on
    // the 11th day of each regime
    val b = (0 to 10).map(d => ev(100 + d, d * 86400L, 1, "b")) ++
      (11 to 21).flatMap(d => (0 until 3).map(i =>
        ev(200 + d * 3 + i, d * 86400L + i, 1, "b")))
    val dir = fixtureDir(evs = a ++ b)
    val out = rows(Sessions.cusumShift(spark, dir))
    val expA = Set[Seq[Any]](
      Seq("a", 0L, 1L, -0.5774, 0.0, 0.0774, false),
      Seq("a", 1L, 1L, -0.5774, 0.0, 0.1548, false),
      Seq("a", 2L, 1L, -0.5774, 0.0, 0.2322, false),
      Seq("a", 3L, 5L, 1.7321, 1.2321, 0.0, false))
    val dnHigh = Seq(4.0, 2.5, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val expB: Set[Seq[Any]] =
      (0 to 10).map(d => Seq[Any]("b", d.toLong, 1L, -1.0, 0.0,
        (d + 1) * 0.5, d == 10)).toSet ++
      (11 to 21).map(d => Seq[Any]("b", d.toLong, 3L, 1.0,
        (d - 10) * 0.5, dnHigh(d - 11), d == 21)).toSet
    assert(out === expA ++ expB)
  }

  test("conversion_lift: arms match a driver-side md5 split; pooled-z " +
      "row recomputed exactly") {
    import graft.operators.Sessions
    def armOf(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 2).toInt
    }
    // users 1..8; purchases for users 1,2,3 -> converted
    val evs = (1L to 8L).map(u => ev(u, u, u, "click")) ++
      Seq(1L, 2L, 3L).map(u => ev(100 + u, 100 + u, u, "purchase"))
    val dir = fixtureDir(evs = evs)
    val arms = (1L to 8L).map(u => u -> armOf(u)).toMap
    val na = arms.count(_._2 == 0).toLong
    val nb = 8L - na
    val ca = Seq(1L, 2L, 3L).count(u => arms(u) == 0).toLong
    val cb = 3L - ca
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pool = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    val z = (pa - pb) / se
    assert(rows(Sessions.conversionLift(spark, dir)) === Set(
      Seq(na, ca, r6(pa), nb, cb, r6(pb), r6(pa - pb),
        math.floor(z * 1e4 + 0.5) / 1e4,
        se > 0 && math.abs(z) > Sessions.LiftZCrit)))
  }

  test("km_retention: censoring at the last observed week; survival " +
      "steps only on churn weeks") {
    import graft.operators.Sessions
    val wk = 604800L
    val dir = fixtureDir(evs = Seq(
      // u1: weeks 0..3 -> lifetime 3, censored (l = maxwk)
      ev(1, 0, 1), ev(2, wk, 1), ev(3, 2 * wk, 1), ev(4, 3 * wk, 1),
      // u2: weeks 0,1 -> lifetime 1, churned
      ev(5, 0, 2), ev(6, wk, 2),
      // u3: week 2 only -> lifetime 0, churned
      ev(7, 2 * wk, 3),
      // u4: weeks 1,3 -> lifetime 2, censored
      ev(8, wk, 4), ev(9, 3 * wk, 4),
      // u5: week 0 only -> lifetime 0, churned
      ev(10, 0, 5)))
    // S(0) = 1 - 2/5 = 0.6; S(1) = 0.6 * (1 - 1/3) = 0.4; censor-only
    // weeks 2 and 3 hold S at 0.4
    assert(rows(Sessions.kmRetention(spark, dir)) === Set(
      Seq(0, 5L, 2L, 0L, 0.6),
      Seq(1, 3L, 1L, 0L, 0.4),
      Seq(2, 2L, 0L, 1L, 0.4),
      Seq(3, 1L, 0L, 1L, 0.4)))
  }

  test("forecast_baseline: t-7 persistence errors by hand; unpaired " +
      "days and gap days stay out") {
    import graft.operators.Sessions
    val day = 86400L
    def clicks(d: Long, k: Int, base: Long): Seq[Ev] =
      (1 to k).map(i => ev(base + i, d * day + i, 1, "click"))
    val dir = fixtureDir(evs =
      clicks(0, 4, 100) ++ clicks(1, 2, 200) ++  // week-1 anchors
        clicks(7, 6, 300) ++ clicks(8, 2, 400) ++ // paired: |6-4|, |2-2|
        clicks(9, 5, 500) ++                      // day 2 missing: no pair
        Seq(ev(900, 3 * day, 7, "view")))         // lone type: no pair
    // pairs: (d7: n=6, np=4 -> ae 2, t6 = floor(2/6*1e6+.5)=333333),
    //        (d8: n=2, np=2 -> ae 0)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(Sessions.forecastBaseline(spark, dir)) === Set(
      Seq("click", 2L, r4(2.0 / 2), r4(333333.0 / 1e6 / 2), r4(2.0 / 2))))
  }

  test("scd2_lookup: facts resolve to the version valid at their " +
      "second; pre-history facts drop; boundaries are [from, to)") {
    import graft.operators.Sessions
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, 1, "purchase", 5.0),  // v1 valid [10, 30)
      ev(2, 30, 1, "purchase", 7.0),  // v2 valid [30, null)
      ev(3, 5, 1, "click"),           // before v1: drops
      ev(4, 15, 1, "click"),          // inside v1
      ev(5, 30, 1, "click"),          // exactly at v2's from -> v2
      ev(6, 40, 1, "click"),          // open tail -> v2
      ev(7, 99, 2, "click")))         // user with no dimension: drops
    assert(rows(Sessions.scd2Lookup(spark, dir)) === Set(
      Seq(4L, 1L, 15L, 1, 1L, 5.0),
      Seq(5L, 1L, 30L, 2, 2L, 7.0),
      Seq(6L, 1L, 40L, 2, 2L, 7.0)))
  }

  test("nelson_aalen: hand cumulative hazard on the km fixture; " +
      "Fleming-Harrington survival upper-bounds the KM curve") {
    import graft.operators.Sessions
    val wk = 604800L
    val dir = fixtureDir(evs = Seq(
      ev(1, 0, 1), ev(2, wk, 1), ev(3, 2 * wk, 1), ev(4, 3 * wk, 1),
      ev(5, 0, 2), ev(6, wk, 2),
      ev(7, 2 * wk, 3),
      ev(8, wk, 4), ev(9, 3 * wk, 4),
      ev(10, 0, 5)))
    // hazard increments (6dp units): 2/5 -> 400000, 1/3 -> 333333, 0, 0
    def s(hs: Long) = math.floor(math.exp(-hs / 1e6) * 1e6 + 0.5) / 1e6
    assert(rows(Sessions.nelsonAalen(spark, dir)) === Set(
      Seq(0, 5L, 2L, 0L, 0.4, s(400000)),
      Seq(1, 3L, 1L, 0L, 0.733333, s(733333)),
      Seq(2, 2L, 0L, 1L, 0.733333, s(733333)),
      Seq(3, 1L, 0L, 1L, 0.733333, s(733333))))
    // the standing cross-check: S_FH >= S_KM on every grid row
    val km = Sessions.kmRetention(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(4)).toMap
    Sessions.nelsonAalen(spark, dir).collect().foreach { r =>
      assert(r.getDouble(5) >= km(r.getInt(0)) - 1e-9)
    }
  }

  test("km_retention: the curve hits exact zero when every at-risk " +
      "user churns") {
    import graft.operators.Sessions
    val wk = 604800L
    val dir = fixtureDir(evs = Seq(
      // u1: weeks 0..2 -> lifetime 2, churned (maxwk is 3)
      ev(1, 0, 1), ev(2, wk, 1), ev(3, 2 * wk, 1),
      // u2: week 3 only -> lifetime 0, censored (defines maxwk)
      ev(4, 3 * wk, 2)))
    assert(rows(Sessions.kmRetention(spark, dir)) === Set(
      Seq(0, 2L, 0L, 1L, 1.0),
      Seq(2, 1L, 1L, 0L, 0.0)))
  }

  test("session_entropy: one-type users score 0, uniform types score " +
      "ln k (hand values)") {
    import graft.operators.Sessions
    val dir = fixtureDir(evs = Seq(
      ev(1, 1, 1, "click"), ev(2, 2, 1, "click"),
      ev(3, 3, 1, "click"), ev(4, 4, 1, "click"),
      ev(5, 1, 2, "click"), ev(6, 2, 2, "click"),
      ev(7, 3, 2, "view"), ev(8, 4, 2, "view"),
      ev(9, 1, 3, "click"), ev(10, 2, 3, "view"),
      ev(11, 3, 3, "purchase"), ev(12, 4, 3, "purchase")))
    assert(rows(Sessions.sessionEntropy(spark, dir)) === Set(
      Seq(1L, 4L, 1, 0.0),
      Seq(2L, 4L, 2, 0.693147),   // ln 2 through the 6dp term path
      Seq(3L, 4L, 3, 1.039721)))  // ln 4 - (2 ln 2)/4
  }

  test("conversion_latency: strict-order conversion, minute-bin " +
      "quantiles, exact mean") {
    import graft.operators.Sessions
    val dir = fixtureDir(evs = Seq(
      ev(1, 100, 1, "signup"), ev(2, 250, 1, "purchase"),    // lat 150
      ev(3, 0, 2, "signup"), ev(4, 7300, 2, "purchase"),     // lat 7300
      ev(5, 500, 3, "purchase"), ev(6, 600, 3, "signup"),    // wrong order
      ev(7, 10, 4, "signup")))                               // no purchase
    // bins: 150 -> 2, 7300 -> 121; n=2: p50 at cum>=1 -> 120 s,
    // p90 at cum>=1.8 -> 7260 s; mean (150+7300)/2
    assert(rows(Sessions.conversionLatency(spark, dir)) === Set(
      Seq(2L, 120L, 7260L, 3725.0)))
  }

  test("ks_drift: hand CDF gap, asymptotic p, one-sided type is NULL") {
    import graft.operators.Sessions
    // global range [0,100] -> midpoint 50; click early {1,2,3,4} vs
    // late {3,4,5,6}: max |F_a-F_b| = 1/2 at v=2,3,4 (dint = 8 over
    // n_a·n_b = 16). view only ever fires early -> no late arm.
    val dir = fixtureDir(evs = Seq(
      ev(1, 0, 1, "click", 1.0), ev(2, 10, 1, "click", 2.0),
      ev(3, 20, 1, "click", 3.0), ev(4, 30, 1, "click", 4.0),
      ev(5, 60, 2, "click", 3.0), ev(6, 70, 2, "click", 4.0),
      ev(7, 80, 2, "click", 5.0), ev(8, 100, 2, "click", 6.0),
      ev(9, 5, 3, "view", 1.0), ev(10, 25, 3, "view", 2.0)))
    // lam = 0.5·sqrt(16/8); p = 2·exp(-2·lam²) = 2/e -> 0.735759 at 6dp
    val p = math.floor(2.0 * math.exp(-2.0 *
      (0.5 * math.sqrt(2.0)) * (0.5 * math.sqrt(2.0))) * 1e6 + 0.5) / 1e6
    assert(rows(Sessions.ksDrift(spark, dir)) === Set(
      Seq("click", 4L, 4L, 0.5, p),
      Seq("view", 2L, 0L, null, null)))
  }

  test("drift_gate: every audit row lands once, reduced to its " +
      "(stat, threshold, rule, triggered) decision shape") {
    import graft.operators.{CorpusStats, Sessions, Similarity}
    val dir = fixtureDir(
      docs = Seq(
        doc(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        doc(1, "one two three four five six seven eight nine ten"),
        doc(2, "red green blue yellow purple orange pink black white", "s1"),
        doc(3, "alpha beta gamma delta epsilon zeta eta theta", "s1")),
      embs = Seq(Emb(0, vec(1.0), 0), Emb(1, vec(0.9, 0.1), 0),
        Emb(2, vec(0.0, 1.0), 1), Emb(3, vec(0.1, 0.9), 1)),
      evs = Seq(
        ev(1, 0, 1, "click", 1.0), ev(2, 10, 1, "click", 2.0),
        ev(3, 20, 1, "click", 3.0), ev(4, 30, 1, "click", 4.0),
        ev(5, 60, 2, "click", 3.0), ev(6, 70, 2, "click", 4.0),
        ev(7, 80, 2, "click", 5.0), ev(8, 100, 2, "click", 6.0),
        ev(9, 5, 3, "view", 1.0), ev(10, 25, 3, "view", 2.0)))
    val ks = Sessions.ksDrift(spark, dir).collect().map { x =>
      Seq[Any]("ks_value", x.getString(0), x.get(4), 0.05, "lt",
        Option(x.get(4)).exists(_.asInstanceOf[Double] < 0.05))
    }
    val cs = Sessions.cusumShift(spark, dir).collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        Seq[Any]("cusum_count", t,
          rs.map(x => math.max(x.getDouble(4), x.getDouble(5))).max,
          5.0, "gt", rs.exists(_.getBoolean(6)))
      }
    val psi = CorpusStats.qualityPsi(spark, dir).collect().map { x =>
      Seq[Any]("psi_quality", x.getString(0), x.getDouble(2), 0.25,
        "gt", x.getDouble(2) > 0.25)
    }
    val em = Similarity.embeddingDrift(spark, dir).collect().map { x =>
      Seq[Any]("embedding_centroid", x.getString(0), x.getDouble(3),
        0.9, "lt", x.getDouble(3) < 0.9)
    }
    val expected = (ks ++ cs ++ psi ++ em).toSet
    assert(expected.exists(_.head == "ks_value"))
    assert(expected.exists(_.head == "cusum_count"))
    assert(expected.exists(_.head == "psi_quality"))
    assert(expected.exists(_.head == "embedding_centroid"))
    assert(rows(Sessions.driftGate(spark, dir)) === expected)
  }

  test("attribution: first/last/linear credit, lookback cutoff, " +
      "same-second ordering by event_id") {
    import graft.operators.Sessions
    val dir = fixtureDir(evs = Seq(
      // u1: view -> click -> $10 purchase (linear splits 5/5)
      ev(1, 10, 1, "view"), ev(2, 20, 1, "click"),
      ev(3, 30, 1, "purchase", 10.0),
      // u2: the only touch is outside the 7-day lookback -> drops
      ev(4, 0, 2, "click"),
      ev(5, 700000, 2, "purchase", 7.0),
      // u3: same-second touch with smaller event_id counts
      ev(6, 50, 3, "view"), ev(7, 50, 3, "purchase", 3.0)))
    assert(rows(Sessions.attribution(spark, dir)) === Set(
      Seq("click", 0L, 0.0, 10.0, 5.0),
      Seq("view", 2L, 13.0, 3.0, 8.0)))
  }

  test("bradley_terry: tie-abstaining wins, hand-run MM rounds, " +
      "mean-1 normalization") {
    import graft.operators.Sessions
    // A beats B twice, B beats C once, A-C tie abstains
    val dir = fixtureDir(evs = Seq(
      ev(1, 1, 1, "A", 3.0), ev(2, 2, 1, "B", 1.0),
      ev(3, 3, 2, "A", 3.0), ev(4, 4, 2, "B", 1.0),
      ev(5, 5, 3, "B", 2.0), ev(6, 6, 3, "C", 1.0),
      ev(7, 7, 4, "A", 2.0), ev(8, 8, 4, "C", 2.0)))
    // hand-run the engine's integer MM update (pagerank posture):
    // comparisons: (A,B,n=2,wa=2), (B,C,n=1,wa=1)
    val sym = Seq(("A", "B", 2L, 2L), ("B", "A", 2L, 0L),
      ("B", "C", 1L, 1L), ("C", "B", 1L, 0L))
    val wins = sym.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._4).sum, rs.map(_._3).sum)).toMap
    var p = Map("A" -> 1000000L, "B" -> 1000000L, "C" -> 1000000L)
    for (_ <- 1 to Sessions.BtIters) {
      val su = sym.groupBy(_._1).view.mapValues(_.map { case (t, o, n, _) =>
        math.floor(n.toDouble /
          ((p(t) + p(o)).toDouble / 1000000) * 1000000 + 0.5).toLong
      }.sum).toMap
      val raw = wins.map { case (t, (w, _)) =>
        t -> math.floor(w.toDouble / (su(t).toDouble / 1000000) * 1000000
          + 0.5).toLong
      }
      val sp = raw.values.sum
      p = raw.map { case (t, pr) =>
        t -> math.floor(pr.toDouble * 3 / sp * 1000000 + 0.5).toLong
      }
    }
    val exp = Set(
      Seq[Any]("A", 2L, 2L, p("A").toDouble / 1000000),
      Seq[Any]("B", 3L, 1L, p("B").toDouble / 1000000),
      Seq[Any]("C", 1L, 0L, p("C").toDouble / 1000000))
    assert(p("A") > p("B") && p("B") > p("C")) // the order is the point
    assert(rows(Sessions.bradleyTerry(spark, dir)) === exp)
  }

  test("ab_power: pooled rate and the two-proportion MDE on the hand " +
      "arm split") {
    import graft.operators.Sessions
    val users = (1L to 9L)
    val dir = fixtureDir(evs =
      users.map(u => ev(u, u, u, "click")).toSeq ++
        Seq(ev(100, 50, 1, "purchase"), ev(101, 51, 2, "purchase")))
    def arm(u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 15), 16) % 2).toInt
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val na = users.count(arm(_) == 0).toLong
    val nb = users.size - na
    val p = 2.0 / 9
    val mde = (Sessions.ZAlpha + Sessions.ZBeta) *
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(rows(Sessions.abPower(spark, dir)) === Set(
      Seq[Any](na, nb, r6(p), r6(mde), r6(mde / p))))
  }

  test("markov_stationary: hand-run integer power rounds settle on " +
      "the 2/3-1/3 chain") {
    import graft.operators.Sessions
    // transitions: A->A, A->B, B->A  =>  P(A->.) = (.5, .5), P(B->A)=1
    val dir = fixtureDir(evs = Seq(
      ev(1, 1, 1, "A"), ev(2, 2, 1, "A"), ev(3, 3, 1, "B"),
      ev(4, 4, 1, "A")))
    val pu = Map(("A", "A") -> 500000L, ("A", "B") -> 500000L,
      ("B", "A") -> 1000000L)
    var pi = Map("A" -> 500000L, "B" -> 500000L)
    for (_ <- 1 to Sessions.MkIters) {
      val raw = Seq("A", "B").map(to =>
        to -> pu.collect { case ((f, t), p) if t == to => p * pi(f) }.sum)
        .toMap
      val s = raw.values.sum
      pi = raw.map { case (t, r) =>
        t -> math.floor(r.toDouble / s * 1e6 + 0.5).toLong
      }
    }
    // converged to 2/3 up to the (−1/2)^16 mixing residual
    assert(math.abs(pi("A") - 666667L) <= 20)
    assert(rows(Sessions.markovStationary(spark, dir)) === Set(
      Seq[Any]("A", pi("A").toDouble / 1e6, 0.75),
      Seq[Any]("B", pi("B").toDouble / 1e6, 0.25)))
  }

  test("srm_check: md5-arm counts and the 1-dof chi-square on a hand " +
      "user set") {
    import graft.operators.Sessions
    val users = (1L to 9L)
    val dir = fixtureDir(evs =
      users.map(u => ev(u, u, u, "click")).toSeq)
    def arm(u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 15), 16) % 2).toInt
    }
    val na = users.count(arm(_) == 0).toLong
    val nb = users.size - na
    val chi2 = math.floor((na - nb) * (na - nb).toDouble / (na + nb)
      * 1e4 + 0.5) / 1e4
    assert(rows(Sessions.srmCheck(spark, dir)) === Set(
      Seq[Any](na, nb, chi2, chi2 > Sessions.SrmChi2Crit)))
  }

  test("ewma_chart: constant series never flags (null ratio); a " +
      "4-day level shift crosses the steady-state limit") {
    import graft.operators.Sessions
    // 'click': 2 events/day for 4 days -> sigma 0 -> limit 0, z = mean
    val clicks = (0 until 4).flatMap(d => Seq(
      ev(1000 + 2 * d, d * 86400L, 10, "click"),
      ev(1001 + 2 * d, d * 86400L + 1, 10, "click")))
    // 'view': 36 days at 1, then 4 days at 21 -> mean 3, sigma 6,
    // limit 18*sqrt(0.2/1.8); the tail days' EWMA crosses it
    val views = (0 until 36).map(d =>
      ev(2000 + d, d * 86400L, 20, "view")) ++
      (36 until 40).flatMap(d => (0 until 21).map(j =>
        ev(3000 + 21 * d + j, d * 86400L + j, 20, "view")))
    val dir = fixtureDir(evs = clicks ++ views)
    // hand-run the engine's unrolled recursion with the same exact
    // weight table (the pagerank-spec posture)
    val xs = Array.fill(36)(1L) ++ Array.fill(4)(21L)
    val mu = math.floor(3.0 * 1e6 + 0.5).toLong
    val sigma = 6.0
    val lim = 3 * sigma * math.sqrt(0.2 / 1.8)
    val zs = (1 to 40).map { t =>
      val k = math.min(t, Sessions.EwmaLags)
      val head = (0 until k).map(i =>
        Sessions.EwmaWeights(i)._2 * xs(t - 1 - i)).sum
      val tail = Sessions.EwmaWeights(k)._3 * mu / 1000000L
      math.floor((head + tail).toDouble / 1e6 * 1e4 + 0.5) / 1e4
    }
    val flags = zs.count(z => math.abs(z - 3.0) > lim)
    val ratio = zs.map(z =>
      math.floor(math.abs(z - 3.0) / lim * 1e4 + 0.5) / 1e4).max
    assert(flags > 0) // the shift must actually trip the chart
    assert(rows(Sessions.ewmaChart(spark, dir)) === Set(
      Seq[Any]("click", 4L, 0L, null),
      Seq[Any]("view", 40L, flags.toLong, ratio)))
  }

  test("mann_whitney: complete separation flags, tied half-ranks stay " +
      "exact, tie-corrected sigma") {
    import graft.operators.Sessions
    // mid = (0+63)/2 = 31; click early {1,2,3} late {4,5,6}: U = 0,
    // z = -9/(2*sqrt(5.25)); view early {1,1} late {1,2}: ties -> U=1,
    // sigma = 1 exactly, z = -1
    val dir = fixtureDir(evs = Seq(
      ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "click", 2.0),
      ev(3, 2, 1, "click", 3.0),
      ev(4, 60, 2, "click", 4.0), ev(5, 61, 2, "click", 5.0),
      ev(6, 63, 2, "click", 6.0),
      ev(7, 0, 3, "view", 1.0), ev(8, 1, 3, "view", 1.0),
      ev(9, 60, 4, "view", 1.0), ev(10, 61, 4, "view", 2.0)))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val zc = r4(-9.0 / (2 * math.sqrt(3.0 * 3 / 12 * 7.0)))
    assert(rows(Sessions.mannWhitney(spark, dir)) === Set(
      Seq[Any]("click", 3L, 3L, 0.0, zc, math.abs(zc) > Sessions.MwZCrit),
      Seq[Any]("view", 2L, 2L, 1.0, -1.0, false)))
  }

  test("seasonal_strength: zero-filled grid; a perfect weekly shape " +
      "reads 1, a flat type reads null, sparse types see their zeros") {
    import graft.operators.Sessions
    val day = 86400L
    var id = 0L
    def evs(t: String, d: Long, k: Int): Seq[Ev] =
      (1 to k).map { i => id += 1; ev(id, d * day + i, d + 1, t) }
    // days 0..13: "w" counts 3 on d%7==0 else 1 (SSW = 0 -> strength 1);
    // "f" counts 2 every day (SST = 0 -> null); "h" 4 events on day 0
    // only (the 13 zero days are real variance)
    val es = (0L to 13L).flatMap(d =>
        evs("w", d, if (d % 7 == 0) 3 else 1)) ++
      (0L to 13L).flatMap(d => evs("f", d, 2)) ++ evs("h", 0, 4)
    val dir = fixtureDir(evs = es)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // h: swu = floor(16/2*1e6+.5) = 8e6; ssb = 8 - 16/14; sst = 16 - 16/14
    val hs = r4((8.0 - 16.0 / 14) / (16.0 - 16.0 / 14))
    assert(rows(Sessions.seasonalStrength(spark, dir)) === Set(
      Seq[Any]("f", 14L, 28L, 2.0, null),
      Seq[Any]("w", 14L, 18L, r4(18.0 / 14), 1.0),
      Seq[Any]("h", 14L, 4L, r4(4.0 / 14), hs)))
  }

  /** The md5 arm split shared by conversion_lift/logrank/cuped. */
  private def armOf(u: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % 2).toInt
  }

  test("logrank_test: hand χ² on a mixed-arm lifetime grid; censor-only " +
      "weeks subtract at-risk but add no term") {
    import graft.operators.Sessions
    val wk = 604800L
    // (user, first wk, last wk): maxwk = 3 -> l = 3 is censored.
    // arms (md5): 1,2,5,6 -> 0; 3,4 -> 1.
    val spans = Seq((1L, 0L, 3L), (2L, 0L, 1L), (3L, 2L, 3L),
      (4L, 1L, 3L), (5L, 0L, 0L), (6L, 1L, 2L))
    val dir = fixtureDir(evs = spans.zipWithIndex.flatMap {
      case ((u, f, l), i) =>
        Seq(ev(10 * i + 1, f * wk, u), ev(10 * i + 2, l * wk, u))
    })
    // in-spec estimator over the same grid
    val maxl = spans.map(_._3).max
    val rs = spans.map { case (u, f, l) =>
      (armOf(u), (l - f).toInt, if (l == maxl) 0 else 1)
    }
    var (na, nb) = (rs.count(_._1 == 0).toLong, rs.count(_._1 == 1).toLong)
    val (nuA, nuB) = (na, nb)
    var (eu, vu, churnA, churnB, nTimes) = (0L, 0L, 0L, 0L, 0L)
    for (t <- rs.map(_._2).distinct.sorted) {
      val dA = rs.count(r => r._1 == 0 && r._2 == t && r._3 == 1)
      val dB = rs.count(r => r._1 == 1 && r._2 == t && r._3 == 1)
      val (d, n) = (dA + dB, na + nb)
      if (d > 0) {
        nTimes += 1; churnA += dA; churnB += dB
        eu += math.floor(d.toDouble * na / n * 1e6 + 0.5).toLong
        if (n > 1) vu += math.floor(d.toDouble * na / n * nb / n *
          (n - d).toDouble / (n - 1).toDouble * 1e6 + 0.5).toLong
      }
      na -= rs.count(r => r._1 == 0 && r._2 == t)
      nb -= rs.count(r => r._1 == 1 && r._2 == t)
    }
    val u = churnA.toDouble - eu.toDouble / 1e6
    val chi2 = u * u / (vu.toDouble / 1e6)
    assert(churnA + churnB === 3L) // the fixture has real churn
    assert(rows(Sessions.logrankTest(spark, dir)) === Set(
      Seq[Any](nuA, nuB, nTimes, churnA, churnB, eu.toDouble / 1e6,
        math.floor(chi2 * 1e4 + 0.5) / 1e4,
        vu > 0 && chi2 > Sessions.LogrankChi2Crit)))
  }

  test("cuped_lift: hand moments on a pre/post split; θ and ρ² from " +
      "exact centered products") {
    import graft.operators.Sessions
    val wk = 604800L
    // weeks 0..3 -> mid = 2; (user, weeks): arms 1,2 -> 0; 3,4 -> 1
    val weeks = Seq(1L -> Seq(0L, 0L, 1L, 2L, 3L), 2L -> Seq(0L, 2L),
      3L -> Seq(1L, 1L, 3L), 4L -> Seq(0L))
    val dir = fixtureDir(evs = weeks.flatMap { case (u, ws) =>
      ws.zipWithIndex.map { case (w, i) => ev(100 * u + i, w * wk, u) }
    })
    // x=(3,1,2,1), y=(2,1,1,0); n=4 sx=7 sy=4 sxx=15 syy=6 sxy=9
    // covN=8 varxN=11 varyN=8; arm0: n=2 sxa=4 sya=3; arm1: n=2 sxb=3 syb=1
    assert(Seq(1L, 2L).forall(armOf(_) == 0) &&
      Seq(3L, 4L).forall(armOf(_) == 1))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val theta = 8.0 / 11
    assert(rows(Sessions.cupedLift(spark, dir)) === Set(
      Seq[Any](2L, 2L, r6(theta), 1.0,
        r6(3.0 / 2 - 1.0 / 2 - theta * (4.0 / 2 - 3.0 / 2)),
        r6(8.0 * 8 / (11.0 * 8)))))
  }

  test("fdr_bh: step-up cutoff reproduces an in-spec BH over the " +
      "ks_drift p-values; a clean separation is a discovery") {
    import graft.operators.Sessions
    // type a: complete early/late separation (D=1, p tiny -> discovery);
    // type b: identical halves (p = 1.0); type c: half shift (mild)
    val evs =
      (1 to 8).map(i => ev(i.toLong, i.toLong, 1, "a", i.toDouble)) ++
      (1 to 8).map(i => ev(10 + i.toLong, 900 + i, 2, "a", 100.0 + i)) ++
      (1 to 4).map(i => ev(20 + i.toLong, i.toLong, 3, "b", i.toDouble)) ++
      (1 to 4).map(i => ev(30 + i.toLong, 900 + i, 4, "b", i.toDouble)) ++
      (1 to 4).map(i => ev(40 + i.toLong, i.toLong, 5, "c", i.toDouble)) ++
      (1 to 4).map(i => ev(50 + i.toLong, 900 + i, 6, "c", 2.0 + i))
    val dir = fixtureDir(evs = evs)
    val p = Sessions.ksDrift(spark, dir).collect()
      .filter(r => !r.isNullAt(4))
      .map(r => (r.getString(0), r.getDouble(4)))
      .sortBy(t => (t._2, t._1)) // (p, type) tie-broken rank order
    val m = p.length
    val lines = p.zipWithIndex.map { case ((ty, pv), i) =>
      (ty, pv, i + 1, (i + 1).toDouble * Sessions.FdrAlpha / m)
    }
    val kmax = lines.collect { case (_, pv, r, l) if pv <= l => r }
      .foldLeft(0)(math.max)
    assert(kmax >= 1) // type a separates cleanly
    assert(rows(Sessions.fdrBh(spark, dir)) === lines.map {
      case (ty, pv, r, l) => Seq[Any](ty, pv, r, m.toLong,
        math.floor(l * 1e6 + 0.5) / 1e6, r <= kmax)
    }.toSet)
  }

  test("ses_backtest: in-spec unrolled SES on a periodic and an " +
      "alternating series; a perfect naive arm nulls the skill") {
    import graft.operators.Sessions
    val day = 86400L
    var id = 0L
    def evs(t: String, d: Long, k: Int): Seq[Ev] =
      (1 to k).map { i => id += 1; ev(id, d * day + i, d + 1, t) }
    // "w": period-7 series (5 on d%7==0 else 1) -> naive7 is PERFECT
    // (nv6 = 0, skill null); "r": period-2 alternation 1/3 -> naive7
    // (odd lag) always lands on the opposite phase
    val counts: Map[String, Long => Int] = Map(
      "w" -> (d => if (d % 7 == 0) 5 else 1),
      "r" -> (d => if (d % 2 == 0) 1 else 3))
    val es = (0L to 35L).flatMap(d =>
      counts.toSeq.flatMap { case (t, f) => evs(t, d, f(d)) })
    val dir = fixtureDir(evs = es)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // in-spec replica of the unrolled estimator over the same grid
    val expected = counts.map { case (t, f) =>
      val scored = (28L to 35L).map { d =>
        val yhat6 = Sessions.SesWeights.zipWithIndex.map { case (w, i) =>
          math.floor(w * f(d - i - 1) * 1e6 + 0.5).toLong }.sum
        val y = f(d).toLong
        (math.abs(yhat6 - y * 1000000), math.abs(f(d - 7) - y) * 1000000)
      }
      val n = scored.size.toLong
      val ses6 = scored.map(_._1).sum
      val nv6 = scored.map(_._2).sum
      Seq[Any](t, n, r4(ses6.toDouble / 1e6 / n), r4(nv6.toDouble / 1e6 / n),
        if (nv6 > 0) r4(1.0 - ses6.toDouble / nv6) else null)
    }.toSet
    assert(rows(Sessions.sesBacktest(spark, dir)) === expected)
    // the periodic arm really exercised the null-skill edge
    assert(expected.exists(r => r(4) == null))
  }

  test("session_length_hist: depths 5, 1, 2 land in bins 4, 1, 2 with " +
      "equal session shares") {
    import graft.operators.Sessions
    // user 1: a 5-event session then (gap > 4h) a 1-event session;
    // user 2: one 2-event session
    val es = (1L to 5L).map(i => ev(i, i, 1)) ++
      Seq(ev(6, 100000, 1)) ++ Seq(ev(7, 1, 2), ev(8, 2, 2))
    val dir = fixtureDir(evs = es)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(Sessions.sessionLengthHist(spark, dir)) === Set(
      Seq[Any](1L, 1L, 1L, r4(1.0 / 3)),
      Seq[Any](2L, 1L, 2L, r4(1.0 / 3)),
      Seq[Any](4L, 1L, 5L, r4(1.0 / 3))))
  }

  test("overdispersion: a whale user blows the dispersion index past 1 " +
      "and the NB size reads the hand moments") {
    import graft.operators.Sessions
    // counts 1,1,1,9: mean 3, var (84-36)/3 = 16, D = 16/3, r = 9/13
    val xs = Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 9)
    var id = 0L
    val dir = fixtureDir(evs = xs.toSeq.flatMap { case (u, k) =>
      (1 to k).map { _ => id += 1; ev(id, id, u) }
    })
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(Sessions.overdispersion(spark, dir)) === Set(
      Seq[Any](4L, 3.0, 16.0, r6(16.0 / 3), r6(9.0 / 13))))
  }

  test("markov_order: a deterministic alternation reads G2 = 0; a " +
      "history-dependent stream reads the in-spec LR exactly") {
    import graft.operators.Sessions
    // u1 alternates a/b (order-1 is the whole story: every cell ratio
    // is 1); u2's continuation of b depends on what PRECEDED it
    val seqs = Seq(
      1L -> Seq("a", "b", "a", "b", "a", "b", "a"),
      2L -> Seq("a", "a", "b", "b", "a", "b", "b", "a"))
    var id = 0L
    val es = seqs.flatMap { case (u, ts) =>
      ts.map { t => id += 1; ev(id, id, u, t) }
    }
    val dir = fixtureDir(evs = es)
    // in-spec replica: trigram counts + nested margins from them
    val tris = seqs.flatMap(_._2.sliding(3).filter(_.size == 3)
      .map(s => (s(0), s(1), s(2))))
    val n3 = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def mrg[K](f: ((String, String, String)) => K): Map[K, Long] =
      n3.groupBy { case (k, _) => f(k) }.view.mapValues(_.values.sum).toMap
    val n2f = mrg { case (a, b, _) => (a, b) }
    val n2s = mrg { case (_, b, c) => (b, c) }
    val n1 = mrg { case (_, b, _) => b }
    val st6 = n3.map { case ((a, b, c), n) =>
      math.floor(n.toDouble * math.log(
        n.toDouble * n1(b) / (n2f((a, b)).toDouble * n2s((b, c))))
        * 1e6 + 0.5).toLong }.sum
    val k = n3.keys.map(_._2).toSet.size.toLong
    val dfn = k * (k - 1) * (k - 1)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(Sessions.markovOrder(spark, dir)) === Set(
      Seq[Any](tris.size.toLong, n3.size.toLong, k, dfn,
        r4(2.0 * st6 / 1e6), r4(2.0 * st6 / 1e6 / dfn))))
    assert(st6 > 0) // u2 made order-2 genuinely informative
  }

  test("bootstrap_ci: the in-spec Poisson-draw estimator reproduces the " +
      "replica percentiles and se exactly") {
    import graft.operators.Sessions
    // users 1..4 with 1..4 events each: mean 2.5; empty replicas
    // (P = e^-4 per replica) are dropped, not zero-filled
    val xs = Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)
    var id = 0L
    val dir = fixtureDir(evs = xs.toSeq.flatMap { case (u, k) =>
      (1 to k).map { _ => id += 1; ev(id, id, u) }
    })
    def u01(user: Long, b: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$user:$b:${Sessions.BootSeed}".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    def w(user: Long, b: Int): Long =
      Sessions.PoisCdf.count(u01(user, b) >= _).toLong
    val mus = (0 until Sessions.BootB).flatMap { b =>
      val sw = xs.keys.toSeq.map(w(_, b)).sum
      val swx = xs.map { case (u, x) => w(u, b) * x }.sum
      if (sw > 0) Some(math.floor(swx.toDouble / sw * 1e6 + 0.5).toLong)
      else None
    }.sorted
    val beff = mus.size
    val lo6 = mus((beff * 25 + 999) / 1000 - 1)
    val hi6 = mus((beff * 975 + 999) / 1000 - 1)
    val smu = mus.sum
    val smu2 = mus.map(m => m * m).sum
    val se = math.floor(math.sqrt(
      (smu2.toDouble - smu.toDouble * smu / beff) / (beff - 1))
      / 1e6 * 1e6 + 0.5) / 1e6
    assert(rows(Sessions.bootstrapCi(spark, dir)) === Set(
      Seq[Any](4L, beff, 2.5, lo6.toDouble / 1e6, hi6.toDouble / 1e6, se)))
  }

  test("bootstrap_ci: replica moments survive mean events/user > 214 " +
      "(the r12-advised BIGINT overflow envelope)") {
    import graft.operators.Sessions
    // mean 250 events/user: mu6 ~ 2.5e8, so sum(mu6^2) over 200 replicas
    // ~ 1.25e19 > 2^63 — the old long accumulator wrapped silently here
    // (negative variance -> NaN boot_se); the DECIMAL(38,0) moments and
    // a BigInt in-spec replica must agree exactly.
    val xs = Map(1L -> 240, 2L -> 250, 3L -> 260)
    var id = 0L
    val dir = fixtureDir(evs = xs.toSeq.flatMap { case (u, k) =>
      (1 to k).map { _ => id += 1; ev(id, id, u) }
    })
    def u01(user: Long, b: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$user:$b:${Sessions.BootSeed}".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    def w(user: Long, b: Int): Long =
      Sessions.PoisCdf.count(u01(user, b) >= _).toLong
    val mus = (0 until Sessions.BootB).flatMap { b =>
      val sw = xs.keys.toSeq.map(w(_, b)).sum
      val swx = xs.map { case (u, x) => w(u, b) * x }.sum
      if (sw > 0) Some(math.floor(swx.toDouble / sw * 1e6 + 0.5).toLong)
      else None
    }.sorted
    val beff = mus.size
    val lo6 = mus((beff * 25 + 999) / 1000 - 1)
    val hi6 = mus((beff * 975 + 999) / 1000 - 1)
    val smu = mus.map(BigInt(_)).sum
    val smu2 = mus.map(m => BigInt(m) * BigInt(m)).sum
    assert(smu2 > BigInt(Long.MaxValue),
      "fixture must actually cross the long envelope")
    val se = math.floor(math.sqrt(
      (smu2.toDouble - smu.toDouble * smu.toDouble / beff) / (beff - 1))
      / 1e6 * 1e6 + 0.5) / 1e6
    val mean = math.floor(750.0 / 3 * 1e6 + 0.5) / 1e6
    assert(se > 0 && !se.isNaN)
    assert(rows(Sessions.bootstrapCi(spark, dir)) === Set(
      Seq[Any](3L, beff, mean, lo6.toDouble / 1e6, hi6.toDouble / 1e6, se)))
  }
}
