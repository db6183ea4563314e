package graft

import graft.operators.Graph

/** Hand-graph checks for the co-purchase PageRank. */
class GraphSpec extends SparkSpecBase {

  test("pagerank: support pruning, hand-iterated ranks, tie order") {
    import spark.implicits._
    // support-2 edges form the path 1–2–3; (4,5) is a support-1 noise
    // pair and must be pruned; (100,1) duplicated to exercise distinct
    val li = Seq(
      (100L, 1L), (100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L),
      (102L, 2L), (102L, 3L), (103L, 2L), (103L, 3L), (104L, 4L),
      (104L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")

    // hand-run the engine's own update rule: 6dp-rounded contributions,
    // exact decimal sum, damped teleport re-rounded to 6dp
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var p = Map(1 -> r6(1.0 / 3), 2 -> r6(1.0 / 3), 3 -> r6(1.0 / 3))
    for (_ <- 1 to Graph.PrIters) {
      val s1 = BigDecimal(r6(p(2) / 2.0))
      val s2 = BigDecimal(r6(p(1) / 1.0)) + BigDecimal(r6(p(3) / 1.0))
      val s3 = BigDecimal(r6(p(2) / 2.0))
      p = Map(
        1 -> r6(0.15 / 3 + 0.85 * s1.toDouble),
        2 -> r6(0.15 / 3 + 0.85 * s2.toDouble),
        3 -> r6(0.15 / 3 + 0.85 * s3.toDouble))
    }
    // node 2 (the hub) ranks first; 1 and 3 are symmetric, so their tie
    // breaks by part id — and the noise pair's nodes never appear
    assert(rows(Graph.pagerank(spark, dir)) === Set(
      Seq(2L, p(2), 1), Seq(1L, p(1), 2), Seq(3L, p(3), 3)))
    assert(p(2) > p(1) && p(1) === p(3))
  }

  test("graph_stats: degrees, one triangle, transitivity on a hand graph") {
    import spark.implicits._
    // support-2 edges: triangle (1,2),(2,3),(1,3) + pendant (3,4);
    // support-1 noise (5,6) pruned. wedges2 = 2+2+6+0 = 10
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    val li = (basket(100, 1, 2) ++ basket(101, 1, 2) ++
      basket(102, 2, 3) ++ basket(103, 2, 3) ++
      basket(104, 1, 3) ++ basket(105, 1, 3) ++
      basket(106, 3, 4) ++ basket(107, 3, 4) ++
      basket(108, 5, 6))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    assert(rows(Graph.graphStats(spark, dir)) === Set(
      Seq(4L, 4L, 3L, 2.0, 1L, 0.6))) // 6·1/10
  }

  test("copurchase_clusters: components over the pruned graph + singletons") {
    import spark.implicits._
    // support-2 edges: 1-2, 2-3 (one component, label 1); 4-5 support-1
    // pruned -> 4 and 5 are singletons; part 9 never ordered
    val li = Seq(
      (100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L),
      (102L, 2L), (102L, 3L), (103L, 2L), (103L, 3L),
      (104L, 4L), (104L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("p_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    part.write.parquet(s"$dir/part.parquet")
    assert(rows(Graph.copurchaseClusters(spark, dir)) === Set(
      Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L),
      Seq(4L, 4L), Seq(5L, 5L), Seq(9L, 9L)))
  }

  test("label_prop: a bridge edge joins components but not communities") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4 (all edges
    // support-2). CC would merge everything into one component; label
    // propagation (hand-simulated 4 synchronous min-tie rounds) settles
    // on {1,2,3}->1 and {4,5,6}->3. Part 9 is off-graph -> singleton.
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      basket(100 + 2 * i, a, b) ++ basket(101 + 2 * i, a, b)
    }.toDF("l_orderkey", "l_partkey")
    val part = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("p_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    part.write.parquet(s"$dir/part.parquet")
    assert(rows(Graph.labelProp(spark, dir)) === Set(
      Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L),
      Seq(4L, 3L), Seq(5L, 3L), Seq(6L, 3L), Seq(9L, 9L)))
  }

  test("k_core: cascading peel leaves the K4 clique, multi-round removal") {
    import spark.implicits._
    // K4 clique {1,2,3,4}; node 5 hangs off 1, 2, and 6 (degree 3 ->
    // survives round 1); node 6 hangs off 5 alone (degree 1 -> peeled
    // round 1, dropping 5 to degree 2 -> peeled round 2 — the cascade).
    // All edges support-2 (two baskets each) so pruning keeps them.
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L), (5L, 6L))
    val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      basket(100 + 2 * i, a, b) ++ basket(101 + 2 * i, a, b)
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    assert(rows(Graph.kCore(spark, dir)) === Set(
      Seq(1L, 3L), Seq(2L, 3L), Seq(3L, 3L), Seq(4L, 3L)))
  }

  test("local_clustering: per-node triangle fan-out and lcc on a " +
      "pendant triangle and a K4") {
    import spark.implicits._
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    def dirOf(pairs: Seq[(Long, Long)]): String = {
      val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        basket(100 + 2 * i, a, b) ++ basket(101 + 2 * i, a, b)
      }.toDF("l_orderkey", "l_partkey")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-graph").toString
      li.write.parquet(s"$dir/lineitem.parquet")
      dir
    }
    // triangle {1,2,3} + pendant (3,4): nodes 1,2 have deg 2 and a
    // closed neighborhood (lcc 1); node 3 has deg 3, one of three
    // possible neighbor pairs closed (lcc 1/3); pendant 4 never appears
    assert(rows(Graph.localClustering(spark,
      dirOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))))) === Set(
      Seq(1L, 1L, 2L, 1.0), Seq(2L, 1L, 2L, 1.0),
      Seq(3L, 1L, 3L, math.floor(1.0 / 3 * 1e4 + 0.5) / 1e4)))
    // K4: 4 triangles total, each node in C(3,2)=3 of them, lcc 1
    assert(rows(Graph.localClustering(spark,
      dirOf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L))))) ===
      (1L to 4L).map(v => Seq(v, 3L, 3L, 1.0)).toSet)
  }

  test("jaccard_links: common-neighbor pairs rank by neighborhood " +
      "Jaccard, existing edges are excluded") {
    import spark.implicits._
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    // K2,2 {1,2}x{3,4} plus pendant 5 on 1: candidates (3,4) share
    // {1,2} with union 2 -> 1.0; (1,2) share {3,4} but deg(1)=3 ->
    // 2/3; (3,5) and (4,5) share {1} -> 0.5; adjacent pairs never rank
    val pairs = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (1L, 5L))
    val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      basket(100 + 2 * i, a, b) ++ basket(101 + 2 * i, a, b)
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-graph").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    assert(rows(Graph.jaccardLinks(spark, dir)) === Set(
      Seq(3L, 4L, 2L, 2L, 2L, 1.0),
      Seq(1L, 2L, 2L, 3L, 2L, math.floor(2.0 / 3 * 1e4 + 0.5) / 1e4),
      Seq(3L, 5L, 1L, 2L, 1L, 0.5),
      Seq(4L, 5L, 1L, 2L, 1L, 0.5)))
  }

  test("assortativity: a perfect star is -1; a pendant triangle lands " +
      "on the hand value") {
    import spark.implicits._
    def basket(o: Long, parts: Long*) = parts.map(p => (o, p))
    def dirOf(pairs: Seq[(Long, Long)]): String = {
      val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        basket(100 + 2 * i, a, b) ++ basket(101 + 2 * i, a, b)
      }.toDF("l_orderkey", "l_partkey")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-graph").toString
      li.write.parquet(s"$dir/lineitem.parquet")
      dir
    }
    // star S3: hub degree 3, leaves degree 1 -> r = -1 exactly
    assert(rows(Graph.assortativity(spark,
      dirOf(Seq((1L, 2L), (1L, 3L), (1L, 4L))))) ===
      Set(Seq(3L, -1.0)))
    // triangle {1,2,3} + pendant 4 on 1: M=8, Sjk=38, Sj=18, Sjj=44
    // -> r = (8*38-324)/(8*44-324) = -20/28 = -0.714286 (6dp floor)
    assert(rows(Graph.assortativity(spark,
      dirOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))))) ===
      Set(Seq(4L, math.floor(-20.0 / 28 * 1e6 + 0.5) / 1e6)))
    // 2-regular triangle: zero denominator -> NULL
    assert(rows(Graph.assortativity(spark,
      dirOf(Seq((1L, 2L), (1L, 3L), (2L, 3L))))) ===
      Set(Seq(3L, null)))
  }
}
