package graft

import java.nio.file.Files
import java.sql.Date

import graft.operators.Analytics

case class Cust(c_custkey: Long, c_nationkey: Long, c_mktsegment: String,
    c_acctbal: Double)
case class Ord(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
    o_orderdate: Date)
case class Line(l_orderkey: Long, l_suppkey: Long, l_returnflag: String,
    l_linestatus: String, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_shipdate: Date)
case class Pt(p_partkey: Long, p_size: Int, p_retailprice: Double)

/** Hand-computed results for the analytics core on crafted star-schema
  * fragments (the DuckDB oracle covers the full TPC-H-ish shapes; these
  * pin the aggregation/window arithmetic itself).
  */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def starDir(custs: Seq[Cust] = Nil, lines: Seq[Line] = Nil,
      ords: Seq[Ord] = Nil): String = {
    val dir = Files.createTempDirectory("graft-star").toString
    if (custs.nonEmpty)
      custs.toDF().write.mode("overwrite").parquet(s"$dir/customer.parquet")
    if (lines.nonEmpty)
      lines.toDF().write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    if (ords.nonEmpty)
      ords.toDF().write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q1_pricing: decimal-exact sums, averages, date filter") {
    val d = Date.valueOf("1998-01-01")
    val late = Date.valueOf("1999-01-01") // beyond the shipdate cutoff
    val dir = starDir(lines = Seq(
      Line(1, 1, "A", "F", 10.0, 100.0, 0.1, d),
      Line(2, 1, "A", "F", 5.0, 50.0, 0.0, d),
      Line(3, 1, "A", "F", 99.0, 999.0, 0.5, late)))
    val out = Analytics.q1Pricing(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "avg_disc", "count_order")
    assert(rows(out) === Set(
      Seq("A", "F", 15.0, 150.0, 140.0, 7.5, 0.05, 2L)))
  }

  test("rfm_segments: quartile thresholds and segment labels") {
    def d(day: Int) = Date.valueOf(f"2020-01-$day%02d")
    // 4 customers, one per quartile on every dimension: recency days
    // {0,2,5,9}, frequency {4,3,2,1}, monetary bins {4,3,2,1}
    val dir = starDir(ords = Seq(
      Ord(1, 1, 100.0, d(1)), Ord(2, 1, 100.0, d(5)),
      Ord(3, 1, 100.0, d(7)), Ord(4, 1, 100.0, d(10)),
      Ord(5, 2, 100.0, d(2)), Ord(6, 2, 100.0, d(4)),
      Ord(7, 2, 100.0, d(8)),
      Ord(8, 3, 100.0, d(3)), Ord(9, 3, 100.0, d(5)),
      Ord(10, 4, 100.0, d(1))))
    val out = rows(Analytics.rfmSegments(spark, dir))
    assert(out === Set(
      Seq(1L, 0, 4L, 400.0, 4, 4, 4, 444, "champion"),
      Seq(2L, 2, 3L, 300.0, 3, 3, 3, 333, "loyal"),
      Seq(3L, 5, 2L, 200.0, 2, 2, 2, 222, "hibernating"),
      Seq(4L, 9, 1L, 100.0, 1, 1, 1, 111, "hibernating")))
  }

  test("q18_large_orders: HAVING-inclusive threshold drives the joins") {
    import java.sql.Date
    val d = Date.valueOf("1997-06-01")
    val dir = starDir(lines = Seq(
      Line(1, 1, "A", "F", 200.0, 1.0, 0.0, d),
      Line(1, 1, "A", "F", 60.0, 1.0, 0.0, d),   // order 1: 260 >= 250
      Line(2, 1, "A", "F", 100.0, 1.0, 0.0, d),  // order 2: 100 dropped
      Line(3, 1, "A", "F", 250.0, 1.0, 0.0, d)), // order 3: boundary kept
      ords = Seq(Ord(1, 10, 1000.5, d), Ord(2, 10, 5000.0, d),
        Ord(3, 11, 2000.0, d)))
    Seq((10L, "Customer#10"), (11L, "Customer#11"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = Analytics.q18LargeOrders(spark, dir)
    assert(rows(out) === Set(
      Seq("Customer#11", 11L, 3L, "1997-06-01", 2000.0, 250.0),
      Seq("Customer#10", 10L, 1L, "1997-06-01", 1000.5, 260.0)))
  }

  test("q4_priority: semi join counts an order once despite multiple R lines") {
    import java.sql.Date
    val in = Date.valueOf("1997-08-01")
    val out = Date.valueOf("1997-11-01")
    val dir = starDir(lines = Seq(
      Line(1, 1, "R", "F", 1.0, 1.0, 0.0, in),
      Line(1, 1, "R", "F", 1.0, 1.0, 0.0, in),  // 2nd R line: still 1 order
      Line(2, 1, "A", "F", 1.0, 1.0, 0.0, in),  // no R line: not counted
      Line(3, 1, "R", "F", 1.0, 1.0, 0.0, in),
      Line(4, 1, "R", "F", 1.0, 1.0, 0.0, out)))
    Seq((1L, "1-URGENT", in), (2L, "1-URGENT", in), (3L, "2-HIGH", in),
      (4L, "2-HIGH", out))  // order 4: R line but outside the quarter
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(rows(Analytics.q4Priority(spark, dir)) === Set(
      Seq("1-URGENT", 1L), Seq("2-HIGH", 1L)))
  }

  test("q22_idle_rich: exact-average threshold, strict >, anti-join cutoff") {
    import java.sql.Date
    // positive balances 100/300/287.5/350/400 -> threshold exactly
    // 287.5: cust 3 is a tie and must be excluded (strict >); -50 stays
    // out of the average; cust 5 is rich but ordered after the cutoff
    // and cust 6 ordered exactly ON the cutoff (>= boundary) -> dropped
    val dir = starDir(
      custs = Seq(Cust(1, 0, "A", 100.0), Cust(2, 0, "A", 300.0),
        Cust(3, 1, "A", 287.5), Cust(4, 2, "A", -50.0),
        Cust(5, 0, "A", 350.0), Cust(6, 3, "A", 400.0)),
      ords = Seq(Ord(1, 2, 10.0, Date.valueOf("1999-05-01")),
        Ord(2, 5, 10.0, Date.valueOf("2000-03-01")),
        Ord(3, 6, 10.0, Date.valueOf("2000-01-01"))))
    assert(rows(Analytics.q22IdleRich(spark, dir)) === Set(Seq(0L, 1L, 300.0)))
  }

  test("revenue_rollup: one-pass region/nation/grand subtotals with levels") {
    import java.sql.Date
    val in = Date.valueOf("1997-05-01")
    val dir = starDir(
      custs = Seq(Cust(1, 0, "A", 0), Cust(2, 1, "A", 0), Cust(3, 2, "A", 0)),
      ords = Seq(Ord(1, 1, 100.0, in), Ord(2, 1, 200.0, in),
        Ord(3, 2, 50.0, in), Ord(4, 3, 1000.0, in),
        Ord(5, 1, 999.0, Date.valueOf("1998-01-01"))))  // outside the year
    Seq((0L, "N1", 0L), (1L, "N2", 0L), (2L, "N3", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((0L, "R1"), (1L, "R2")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    assert(rows(Analytics.revenueRollup(spark, dir)) === Set(
      Seq("R1", "N1", 300.0, 2L, 0), Seq("R1", "N2", 50.0, 1L, 0),
      Seq("R2", "N3", 1000.0, 1L, 0),
      Seq("R1", null, 350.0, 3L, 1), Seq("R2", null, 1000.0, 1L, 1),
      Seq(null, null, 1350.0, 4L, 3)))
  }

  test("revenue_trend: range frame shrinks over calendar gaps") {
    import java.sql.Date
    val dir = starDir()
    Seq(("1970-01-01", 100.0, 0.0), ("1970-01-02", 150.0, 0.0),
      ("1970-01-02", 100.0, 0.5),   // same-day rows aggregate: 150+50
      ("1970-01-04", 400.0, 0.0),   // gap at day 2
      ("1970-01-11", 50.0, 0.0))    // day 10: no prior day within 6
      .map { case (d, p, disc) => (Date.valueOf(d), p, disc) }
      .toDF("l_shipdate", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(rows(Analytics.revenueTrend(spark, dir)) === Set(
      Seq(0L, 100.0, 100.0),
      Seq(1L, 200.0, 150.0),        // (100+200)/2
      Seq(3L, 400.0, 233.33),       // (100+200+400)/3 floored at 2dp
      Seq(10L, 50.0, 50.0)))        // frame holds only itself
  }

  test("copurchase: pair support and lift; duplicate lines collapse") {
    val dir = starDir()
    // order 1 {10,20,30} (part 10 twice: distinct collapses), order 2
    // {10,20} -> support(10,20)=2, order 3 {10} still counts in N=3
    Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(rows(Analytics.copurchase(spark, dir)) === Set(
      Seq(10L, 20L, 2L, 3L, 2L, 1.0),   // 2*3/(3*2)
      Seq(10L, 30L, 1L, 3L, 1L, 1.0),   // 1*3/(3*1)
      Seq(20L, 30L, 1L, 2L, 1L, 1.5)))  // 1*3/(2*1)
  }

  test("copurchase: basket cap keeps only the 32 lowest part keys") {
    val dir = starDir()
    (100L to 133L).map(p => (1L, p)).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Analytics.copurchase(spark, dir).collect()
    assert(out.length === 100)  // C(32,2)=496 pairs, top-k truncates
    // uncapped, (100,132)/(100,133) would sort INSIDE this top-100
    assert(out.flatMap(r => Seq(r.getLong(0), r.getLong(1))).max === 131L)
  }

  test("top_customers: top-3 per segment with acctbal/custkey tie-break") {
    val dir = starDir(custs = Seq(
      Cust(1, 0, "BUILDING", 900.0), Cust(2, 0, "BUILDING", 800.0),
      Cust(3, 0, "BUILDING", 700.0), Cust(4, 0, "BUILDING", 600.0),
      Cust(5, 0, "AUTOMOBILE", 100.0), Cust(6, 0, "AUTOMOBILE", 100.0)))
    val out = Analytics.topCustomers(spark, dir)
      .select("c_mktsegment", "rank", "c_custkey")
    assert(rows(out) === Set(
      Seq("BUILDING", 1, 1L), Seq("BUILDING", 2, 2L), Seq("BUILDING", 3, 3L),
      Seq("AUTOMOBILE", 1, 5L), Seq("AUTOMOBILE", 2, 6L)))
  }

  test("cheapest_supplier: argmin join-back, witness tie by min supplier") {
    // part 1: supp 11 undercuts supp 10; part 2: price tie -> supp 10
    val li = Seq(
      (1L, 10L, 6.00), (1L, 10L, 5.00), (1L, 11L, 4.00),
      (2L, 10L, 3.00), (2L, 12L, 3.00))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val dir = Files.createTempDirectory("graft-star").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    assert(rows(Analytics.cheapestSupplier(spark, dir)) === Set(
      Seq(1L, 11L, 4.00, 2L), Seq(2L, 10L, 3.00, 2L)))
  }

  test("q6_forecast: all three band predicates filter; 4dp-exact revenue") {
    val in = Date.valueOf("1996-06-01")
    val out = Date.valueOf("1997-06-01") // outside the ship year
    val dir = starDir(lines = Seq(
      Line(1, 1, "N", "O", 10.0, 100.0, 0.06, in),  // kept: 6.00
      Line(2, 1, "N", "O", 23.0, 200.0, 0.05, in),  // kept: 10.00
      Line(3, 1, "N", "O", 24.0, 100.0, 0.06, in),  // quantity at cap: out
      Line(4, 1, "N", "O", 10.0, 100.0, 0.04, in),  // discount below band
      Line(5, 1, "N", "O", 10.0, 100.0, 0.06, out)))
    assert(rows(Analytics.q6Forecast(spark, dir)) === Set(
      Seq(16.00, 2L)))
  }

  test("q13_custdist: zero-order customers survive the outer join") {
    val d = Date.valueOf("1997-01-01")
    val dir = starDir(custs = Seq(
      Cust(1, 0, "BUILDING", 0.0), Cust(2, 0, "BUILDING", 0.0),
      Cust(3, 0, "BUILDING", 0.0)))
    // cust 1: one urgent (excluded) + one kept -> 1; cust 2: two kept;
    // cust 3: no orders at all -> the c_count=0 bucket
    Seq((1L, 1L, "1-URGENT", d), (2L, 1L, "2-HIGH", d),
      (3L, 2L, "3-MEDIUM", d), (4L, 2L, "5-LOW", d))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(rows(Analytics.q13Custdist(spark, dir)) === Set(
      Seq(2L, 1L), Seq(1L, 1L), Seq(0L, 1L)))
  }

  test("q15_top_supplier: global max join-back keeps all tied witnesses") {
    val in = Date.valueOf("1996-02-01")
    val out = Date.valueOf("1996-06-01") // outside the quarter
    val dir = starDir(lines = Seq(
      Line(1, 1, "N", "O", 1.0, 100.0, 0.0, in),
      Line(2, 2, "N", "O", 1.0, 60.0, 0.0, in),   // supp 2 ties via 2 lines
      Line(3, 2, "N", "O", 1.0, 40.0, 0.0, in),
      Line(4, 3, "N", "O", 1.0, 50.0, 0.0, in),   // below the max
      Line(5, 3, "N", "O", 1.0, 500.0, 0.0, out)))
    Seq((1L, "Supplier#1"), (2L, "Supplier#2"), (3L, "Supplier#3"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    assert(rows(Analytics.q15TopSupplier(spark, dir)) === Set(
      Seq(1L, "Supplier#1", 100.0), Seq(2L, "Supplier#2", 100.0)))
  }

  test("q11_important_stock: exact-integer fraction-of-total threshold") {
    val dir = starDir()
    // nation 19 suppliers 1,2; values 1000/100/100 over 3 parts ->
    // mean 400, 2x-mean threshold keeps only part 100 (1000·3 > 2·1200);
    // supplier 9's foreign shipment is excluded before grouping
    Seq((19L, "NATION_19"), (0L, "NATION_0")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 19L), (2L, 19L), (9L, 0L))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((100L, 1L, 1000.0, 0.0), (200L, 2L, 100.0, 0.0),
      (300L, 1L, 100.0, 0.0), (400L, 9L, 9999.0, 0.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(rows(Analytics.q11ImportantStock(spark, dir)) === Set(
      Seq(100L, 1000.0)))
  }

  test("q20_excess_stock: dominance threshold feeds the nation semi-join") {
    val dir = starDir()
    Seq((19L, "NATION_19"), (0L, "NATION_0")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 19L, "Supplier#1"), (2L, 19L, "Supplier#2"),
      (3L, 0L, "Supplier#3"))
      .toDF("s_suppkey", "s_nationkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // part 100 (3 suppliers, total 40): supp1 ships 30 — 30·3 > 2·40,
    // dominant; part 200: even 3-way split, 10·3 > 2·30 false for all;
    // part 300: supp3 sole source (5·1 > 2·5 false — a monopolist of
    // one part is AT fair share, not above it)
    Seq((100L, 1L, 30.0), (100L, 2L, 5.0), (100L, 3L, 5.0),
      (200L, 1L, 10.0), (200L, 2L, 10.0), (200L, 3L, 10.0),
      (300L, 3L, 5.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(rows(Analytics.q20ExcessStock(spark, dir)) === Set(
      Seq(1L, "Supplier#1")))
  }

  test("key_skew: shares, skew factor vs mean, count-then-key rank") {
    // key 1: 3 rows, keys 2/3: 1 row; mean 5/3 -> skew 1.8 for key 1
    val li = Seq((1L, 0L, 1.0), (1L, 0L, 1.0), (1L, 0L, 1.0),
      (2L, 0L, 1.0), (3L, 0L, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val dir = Files.createTempDirectory("graft-star").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(Analytics.keySkew(spark, dir)) === Set(
      Seq(1L, 3L, r6(3.0 / 5), r4(3.0 * 3 / 5), 1),
      Seq(2L, 1L, r6(1.0 / 5), r4(1.0 * 3 / 5), 2),
      Seq(3L, 1L, r6(1.0 / 5), r4(1.0 * 3 / 5), 3)))
  }

  test("ship_latency: histogram-rank percentiles and exact mean per priority") {
    val base = Date.valueOf("1997-01-01")
    def plus(d: Int) = Date.valueOf(base.toLocalDate.plusDays(d))
    // URGENT: one line per delay 1..10; HIGH: delays 0 and 10
    val ords = (1 to 10).map(k => (k.toLong, "1-URGENT", base)) ++
      Seq((11L, "2-HIGH", base), (12L, "2-HIGH", base))
    val lines = (1 to 10).map(k =>
      Line(k, 1, "N", "O", 1.0, 1.0, 0.0, plus(k))) ++
      Seq(Line(11, 1, "N", "O", 1.0, 1.0, 0.0, plus(0)),
        Line(12, 1, "N", "O", 1.0, 1.0, 0.0, plus(10)))
    val dir = starDir(lines = lines)
    ords.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // rank rule: position (n-1)*p div 100 + 1 in the cumulative counts
    // URGENT n=10: p50 -> pos 5 -> 5; p90 -> pos 9 -> 9; p99 -> pos 9
    // HIGH n=2: every percentile position is 1 -> the smaller delay, 0
    assert(rows(Analytics.shipLatency(spark, dir)) === Set(
      Seq("1-URGENT", 10L, 5, 9, 9, 5.5),
      Seq("2-HIGH", 2L, 0, 0, 0, 5.0)))
  }

  test("revenue_concentration: power-of-two bins, top-down cumulative share") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val d = Date.valueOf("1997-01-01")
    // cust 1: 128.00 total (two orders) -> 12800c -> bin 8192
    // cust 2: 40.96 -> 4096c -> bin 4096; cust 3: 30.00 -> 3000c -> 2048
    val dir = starDir(ords = Seq(
      Ord(1, 1, 100.0, d), Ord(2, 1, 28.0, d),
      Ord(3, 2, 40.96, d), Ord(4, 3, 30.0, d)))
    val tc = 19896.0
    assert(rows(Analytics.revenueConcentration(spark, dir)) === Set(
      Seq(8192L, 1L, 128.0, r4(1.0 / 3), r4(12800 / tc), r4(12800 / tc)),
      Seq(4096L, 1L, 40.96, r4(1.0 / 3), r4(4096 / tc), r4(16896 / tc)),
      Seq(2048L, 1L, 30.0, r4(1.0 / 3), r4(3000 / tc), 1.0)))
  }

  test("discount_elasticity: a perfect 3-point line recovers slope, " +
      "intercept, and r2 = 1") {
    val d0 = Date.valueOf("1997-01-01")
    // mean qty 15 @ 0.00, 25 @ 0.05, 35 @ 0.10 — exactly linear:
    // +2 qty per discount cent -> slope 200 per full discount unit
    val lines = Seq(
      Line(1, 1, "N", "O", 10.0, 1.0, 0.00, d0),
      Line(2, 1, "N", "O", 20.0, 1.0, 0.00, d0),
      Line(3, 1, "N", "O", 20.0, 1.0, 0.05, d0),
      Line(4, 1, "N", "O", 30.0, 1.0, 0.05, d0),
      Line(5, 1, "N", "O", 35.0, 1.0, 0.10, d0))
    assert(rows(Analytics.discountElasticity(spark, starDir(lines = lines)))
      === Set(Seq(3L, 200.0, 15.0, 1.0)))
  }

  test("gini_revenue: tied values share exact group rank-sums; the " +
      "hand Lorenz value comes out") {
    def d(day: Int) = Date.valueOf(f"2020-01-$day%02d")
    // per-customer revenue 100/100/200/600 -> G = 0.4 exactly
    val dir = starDir(ords = Seq(
      Ord(1, 1, 100.0, d(1)), Ord(2, 2, 100.0, d(2)),
      Ord(3, 3, 120.0, d(3)), Ord(4, 3, 80.0, d(4)),
      Ord(5, 4, 600.0, d(5))))
    assert(rows(Analytics.giniRevenue(spark, dir)) ===
      Set(Seq(4L, 1000.0, 0.4)))
  }

  test("lorenz_curve: exact decile boundaries split tied groups; " +
      "zero-boundary deciles drop on a tiny corpus") {
    def d(day: Int) = Date.valueOf(f"2020-01-$day%02d")
    // the gini fixture: revenues 100/100/200/600 -> n=4
    val dir = starDir(ords = Seq(
      Ord(1, 1, 100.0, d(1)), Ord(2, 2, 100.0, d(2)),
      Ord(3, 3, 200.0, d(3)), Ord(4, 4, 600.0, d(4))))
    // m_k = (k*4) div 10: deciles 1-2 have m=0 (absent); boundaries
    // land inside the tied 100-group for m=1,2
    assert(rows(Analytics.lorenzCurve(spark, dir)) === Set(
      Seq(3, 1L, 0.1), Seq(4, 1L, 0.1),
      Seq(5, 2L, 0.2), Seq(6, 2L, 0.2), Seq(7, 2L, 0.2),
      Seq(8, 3L, 0.4), Seq(9, 3L, 0.4), Seq(10, 4L, 1.0)))
  }

  test("acf_revenue: an alternating series reads the hand lag " +
      "correlations; empty lags drop") {
    def d(day: Int) = Date.valueOf(f"1995-01-$day%02d")
    // daily dollars 10/20/10/20: c = (-5,5,-5,5), den = 100
    val dir = starDir(ords = Seq(
      Ord(1, 1, 10.0, d(1)), Ord(2, 1, 20.0, d(2)),
      Ord(3, 1, 10.0, d(3)), Ord(4, 1, 20.0, d(4))))
    assert(rows(Analytics.acfRevenue(spark, dir)) === Set(
      Seq(1, 3L, -0.75), Seq(2, 2L, 0.5), Seq(3, 1L, -0.25)))
  }

  test("benford_check: string first digits, ln-ratio expectations, " +
      "sub-dollar orders filtered, exact-unit chi2") {
    def d0 = Date.valueOf("2020-01-01")
    // digits 1,1,1,2,2,9 (0.50 filtered: integer dollars < 1)
    val totals = Seq(1.0, 10.0, 150.0, 2.0, 25.0, 9.0, 0.5)
    val dir = starDir(ords = totals.zipWithIndex.map { case (t, i) =>
      Ord(i + 1L, 1, t, d0)
    })
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val n = 6L
    // the full 1..9 grid: zero-observation digits keep their rows AND
    // their chi-square terms (observed 0 vs expected n*p — dropping
    // them understated the statistic exactly on non-Benford data)
    val obs = (1 to 9).map(dd =>
      dd -> Map(1 -> 3L, 2 -> 2L, 9 -> 1L).getOrElse(dd, 0L)).toMap
    val expSh = obs.keys.map(dd =>
      dd -> r6(math.log(1.0 + 1.0 / dd) / math.log(10.0))).toMap
    val t6 = obs.map { case (dd, o) =>
      val e = expSh(dd) * n
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }.sum
    val chi2 = math.floor(t6.toDouble / 1e6 * 1e4 + 0.5) / 1e4
    assert(rows(Analytics.benfordCheck(spark, dir)) === obs.map {
      case (dd, o) =>
        Seq[Any](dd, o, r6(o.toDouble / n), expSh(dd), chi2)
    }.toSet)
  }

  test("theil_sen: the median slope shrugs off an outlier grid point " +
      "that swings OLS") {
    val d0 = Date.valueOf("1997-01-01")
    // grid means 15/25/35/45 at discounts 0/5/10/15 (slope 200 exactly)
    // plus a corrupted 10000 at discount 20: 6 of 10 pairwise slopes
    // stay 200, so both medians sit on the clean line
    val lines = Seq(
      Line(1, 1, "N", "O", 15.0, 1.0, 0.00, d0),
      Line(2, 1, "N", "O", 25.0, 1.0, 0.05, d0),
      Line(3, 1, "N", "O", 35.0, 1.0, 0.10, d0),
      Line(4, 1, "N", "O", 45.0, 1.0, 0.15, d0),
      Line(5, 1, "N", "O", 10000.0, 1.0, 0.20, d0))
    assert(rows(Analytics.theilSen(spark, starDir(lines = lines)))
      === Set(Seq(10L, 200.0, 15.0)))
  }

  test("pareto_front: strict dominance in either axis kills, equal " +
      "(price,size) twins both survive") {
    val dir = Files.createTempDirectory("graft-sky").toString
    Seq(
      Pt(1, 5, 10.0),  // dominated by 4 (cheaper, same size)
      Pt(2, 4, 12.0),  // dominated by 3 (same price, bigger)
      Pt(3, 7, 12.0),  // survives: biggest size
      Pt(4, 5, 9.0),   // survives
      Pt(5, 5, 9.0),   // exact twin of 4: mutually non-dominating
      Pt(6, 7, 15.0),  // dominated by 3 (cheaper, same size)
      Pt(7, 2, 8.0),   // survives: cheapest
      Pt(8, 1, 8.0))   // dominated by 7 (same price, bigger)
      .toDF().write.mode("overwrite").parquet(s"$dir/part.parquet")
    assert(rows(Analytics.paretoFront(spark, dir)) === Set(
      Seq(7L, 8.0, 2), Seq(4L, 9.0, 5), Seq(5L, 9.0, 5),
      Seq(3L, 12.0, 7)))
  }

  test("changepoint: a clean two-level step splits at the step and " +
      "explains all unit-rounded variance") {
    def d(day: Int) = Date.valueOf(f"1995-01-$day%02d")
    // daily dollars 10k,10k,10k,40k,40k,40k — hand gains (1e6-$² units):
    // t=1: 100+3920-3750=270; t=2: 200+4225-3750=675;
    // t=3: 300+4800-3750=1350 (max); t=4: 675; t=5: 270.
    // SST = (3·100 + 3·1600) - 3750 = 1350 -> gain_share = 1.0
    val dir = starDir(ords = (1 to 6).map(i =>
      Ord(i.toLong, 1, if (i <= 3) 10000.0 else 40000.0, d(i))))
    assert(rows(Analytics.changepoint(spark, dir)) === Set(
      Seq[Any](d(3), 3, 3, 10000.0, 40000.0, 1.0)))
  }
}
