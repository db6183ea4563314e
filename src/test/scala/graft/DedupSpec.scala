package graft

import graft.operators.Dedup

/** Crafted duplicate scenarios for the dedup family: an exact duplicate, a
  * normalization-only duplicate, and a one-word-changed near-duplicate.
  */
class DedupSpec extends SparkSpecBase {

  private val base = "alpha beta gamma delta epsilon zeta eta theta"
  // one shared corpus for the whole (read-only) dedup family: the
  // persisted pair set and shingle frames build once per suite
  private lazy val dir0: String = fixtureDir(docs = Seq(
    doc(0, base),
    doc(1, base), // exact duplicate
    doc(2, "  Alpha   beta GAMMA delta epsilon zeta eta theta "), // normalization dup
    doc(3, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup (last word)
    doc(4, "one two three four five six seven eight"))) // unrelated

  test("dedup_exact: canonical min-id per normalized hash") {
    val out = Dedup.dedupExact(spark, dir0)
      .select("doc_id", "canonical", "is_dup")
    assert(rows(out) === Set(
      Seq(0L, 0L, false), Seq(1L, 0L, true), Seq(2L, 0L, true),
      Seq(3L, 3L, false), Seq(4L, 4L, false)))
  }

  test("dedup_minhash: identical shingle sets always collide, jaccard = 1") {
    val out = Dedup.dedupMinhash(spark, dir0)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 0,1,2 share one shingle set: all three pairs must be found at 1.0
    assert(out((0L, 1L)) === 1.0)
    assert(out((0L, 2L)) === 1.0)
    assert(out((1L, 2L)) === 1.0)
    // the unrelated doc shares no band with anything
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard_hist: the identical triple fills bin 0.9, the near-dup " +
      "lands in its 5/7 bin iff banding caught it, zero bins keep rows") {
    val out = Dedup.jaccardHist(spark, dir0).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out.size === 10) // the full zero-filled grid
    // pairs among 0,1,2 are jaccard 1.0 -> bin 0.9, always caught
    assert(out(0.9)._1 === 3L)
    // doc3 vs each of 0,1,2 is exactly 5/7 (~0.714) -> bin 0.7; caught
    // only when a band collides — reconcile against the deployed
    // thresholded pipeline (jaccard >= 0.5 keeps the same pairs)
    val caught = Dedup.dedupMinhash(spark, dir0).count() - 3
    assert(out(0.7)._1 === caught)
    (Seq(0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.8)).foreach { b =>
      assert(out(b)._1 === 0L, s"bin $b must be empty")
    }
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val tot = 3L + caught
    assert(out(0.9)._2 === Some(r4(3.0 / tot)))
    assert(out(0.0)._3 === Some(1.0)) // the survival curve closes at 0
  }

  test("cluster_size_hist: the in-spec union-find over the operator's " +
      "own pairs reproduces the binned size distribution") {
    val pairs = Dedup.dedupMinhash(spark, dir0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = (0L to 4L).groupBy(find).values.map(_.size.toLong).toSeq
    def binLo(n: Long) = java.lang.Long.highestOneBit(n)
    val byBin = sizes.groupBy(binLo).view
      .mapValues(s => (s.size.toLong, s.sum)).toMap
    val t = sizes.size.toLong
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected = byBin.map { case (b, (nc, nd)) =>
      Seq[Any](b, nc, nd, r4(nc.toDouble / t))
    }.toSet
    assert(rows(Dedup.clusterSizeHist(spark, dir0)) === expected)
  }

  test("dedup_simhash: identical docs at hamming 0, unrelated not paired") {
    val out = Dedup.dedupSimhash(spark, dir0)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((0L, 1L)) === 0)
    assert(out((0L, 2L)) === 0)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("dedup_ngram: exact jaccard values within the source block") {
    val out = Dedup.dedupNgram(spark, dir0)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 1L)) === 1.0)
    // 8 words -> 6 shingles; only the final shingle contains the changed
    // last word: inter = 5, union = 7 -> 5/7 = 0.7143
    assert(out((0L, 3L)) === 0.7143)
    // unrelated docs share no shingle -> pair absent entirely
    assert(!out.contains((0L, 4L)))
  }

  test("dedup_clusters: components of the minhash pairs, min-id labels") {
    val d = dir0
    // expected components: union-find over the operator's own pair list
    val pairs = Dedup.dedupMinhash(spark, d)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val out = Dedup.dedupClusters(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L)) // one row per doc
    out.foreach { case (id, c) => assert(c === find(id), s"doc $id") }
    // 0,1,2 are identical docs: guaranteed one component labeled 0
    assert(out(0L) === 0L && out(1L) === 0L && out(2L) === 0L)
    // the unrelated doc is a singleton labeling itself
    assert(out(4L) === 4L)
  }

  test("dedup_clusters: a transitive chain collapses to one component") {
    // 0-1 and 1-2 are high-jaccard near-dups (one word changed in a
    // 40-word doc, j ≈ 0.92); 0-2 (two words changed) may or may not
    // pair directly — components must contain all three either way
    // (transitivity).
    val base = (0 until 40).map(i => s"w$i").toVector
    val d = fixtureDir(docs = Seq(
      doc(0, base.mkString(" ")),
      doc(1, base.updated(10, "x").mkString(" ")),
      doc(2, base.updated(10, "x").updated(30, "y").mkString(" ")),
      doc(3, "one two three four five six seven eight")))
    val pairs = Dedup.dedupMinhash(spark, d)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(pairs((0L, 1L)) && pairs((1L, 2L))) // the chain exists
    val out = Dedup.dedupClusters(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === 0L && out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 3L)
  }

  test("dedup_keep_best: highest-quality member kept, not the min id") {
    val d = fixtureDir(docs = Seq(
      doc(10, "alpha beta gamma delta epsilon zeta eta theta"),
      // near-dup twin with MORE words incl. stopwords — strictly higher
      // quality score than doc 10, but the LARGER id
      doc(11, "alpha beta gamma delta epsilon zeta eta theta the a"),
      doc(12, "one two three four five six seven eight")))
    val out = Dedup.dedupKeepBest(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val m = out.map(t => t._1 -> t).toMap
    assert(m.keySet === Set(10L, 11L, 12L))
    // 10+11 one cluster (labeled by min id), 12 a singleton
    assert(m(10L)._2 === 10L && m(11L)._2 === 10L && m(12L)._2 === 12L)
    // the keep decision follows QUALITY, not id: 11 beats 10
    assert(m(11L)._3 > m(10L)._3)
    assert(m(11L)._4 && !m(10L)._4)
    assert(m(12L)._4) // singleton keeps trivially
    out.groupBy(_._2).foreach { case (_, ds) =>
      assert(ds.count(_._4) === 1, "exactly one keep per cluster")
    }
  }

  test("dup_tokens: token-weighted duplication per cluster-size bucket") {
    // one near-dup pair (8 + 10 tokens) and one singleton (8 tokens)
    val d = fixtureDir(docs = Seq(
      doc(10, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(11, "alpha beta gamma delta epsilon zeta eta theta the a"),
      doc(12, "one two three four five six seven eight")))
    val out = Dedup.dupTokens(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    // corpus = 26 tokens; the pair holds 18 (excess 18 − 18 div 2 = 9)
    assert(out === Set(
      (1L, 1L, 8L, 0.307692, 0L),
      (2L, 1L, 18L, 0.692308, 9L)))
  }

  test("banding_curve: the (4,3) arm's candidates equal the deployed " +
      "banding's candidate set") {
    val d = "/root/testdata/sf0.001"
    val out = graft.operators.Dedup.bandingCurve(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === graft.operators.Dedup.BandingSweep.toSet)
    // one exact truth for all arms
    assert(out.values.map(_._2).toSet.size === 1)
    // the (4,3) geometry IS dedup_minhash's deployed banding: its
    // candidate count must equal the live candidate generator's
    val deployed = graft.operators.Dedup
      .minhashCandidates(spark, d).count()
    assert(out((4, 3))._1 === deployed)
    // caught never exceeds candidates or exact
    out.values.foreach { case (c, e, g) =>
      assert(g <= c && g <= e)
    }
  }

  test("lsh_curve: bin invariants and the closed-form theoretical column") {
    val out = Dedup.lshCurve(spark, dir0).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    out.foreach { case (bin, n, caught, measured, theo) =>
      assert(bin >= 2 && bin <= 9) // floor 0.2, clamp 9
      assert(caught >= 0 && caught <= n)
      assert(measured === r4(caught.toDouble / n))
      val s = (bin + 0.5) / 10.0
      assert(theo === r4(1.0 - math.pow(1.0 -
        math.pow(s, Dedup.LshCurveRows), Dedup.LshCurveBands)))
    }
    // dir0's identical docs land in the top bin and MUST be caught
    // (identical signatures collide in every band)
    val top = out.find(_._1 == 9)
    assert(top.exists(t => t._3 === t._2))
  }

  test("BitPack lane cap: a >65535-shingle document fails LOUDLY") {
    // 65 540 distinct tokens -> 65 538 distinct 3-gram shingles, past the
    // 16-bit lane width. The aggregate must raise, never emit a
    // plausible-but-corrupt signature.
    val big = (0 until 65540).map(i => s"t$i").mkString(" ")
    val dir = fixtureDir(docs = Seq(doc(0, big), doc(1, "a b c d e")))
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    val e = intercept[Exception] {
      Dedup.dedupSimhash(spark, dir).collect()
    }
    // either tripwire is a correct loud failure: the ANSI long-overflow
    // of the packed sum (fires during aggregation when the top lane is
    // heavy) or the explicit lane-cap guard (any surviving n > 65535)
    val m = messages(e)
    assert(m.contains("BitPack lane overflow") ||
      m.contains("ARITHMETIC_OVERFLOW"), m)
  }

  test("dedup_substring: a shared 10-token run yields maximal spans") {
    val shared = "one two three four five six seven eight nine ten"
    val d = fixtureDir(docs = Seq(
      doc(1, s"alpha beta $shared gamma delta"),
      doc(2, s"$shared omega"),
      doc(3, "totally different words only here nothing shared at all now")))
    // 8-gram windows fully inside the run are cross-doc duplicated:
    // doc 1 positions 2..4, doc 2 positions 0..2 — islands of 3 grams
    // = spans of 10 tokens; boundary-crossing windows don't collide
    val out = rows(Dedup.dedupSubstring(spark, d))
    assert(out === Set(
      Seq(1L, 2, 10, 3),
      Seq(2L, 0, 10, 3)))
  }

  test("cluster_stats: size histogram over exact-duplicate clusters") {
    val d = fixtureDir(docs = Seq(
      doc(0, base), doc(1, base), doc(2, base), // cluster of 3
      doc(3, "one two three four five six"),
      doc(4, "one two three four five six"), // cluster of 2
      doc(5, "entirely different unique words here"))) // singleton
    val out = rows(Dedup.clusterStats(spark, d))
    assert(out === Set(
      Seq(1, 1L, 1L),
      Seq(2, 1L, 2L),
      Seq(3, 1L, 3L)))
  }

  test("source_overlap: unordered source pairs with exact mean jaccard") {
    val d = fixtureDir(docs = Seq(
      doc(0, base, "cc"), doc(1, base, "wiki"), // cross-source, j = 1
      doc(2, "one two three four five six", "cc"),
      doc(3, "one two three four five six", "cc"), // within-cc, j = 1
      doc(4, "entirely different unique words here", "wiki")))
    val out = rows(Dedup.sourceOverlap(spark, d))
    assert(out === Set(
      Seq("cc", "cc", 1L, 1.0),
      Seq("cc", "wiki", 1L, 1.0)))
  }

  test("dedup_recall: exact truth set vs verified LSH pairs, one row") {
    // docs 0/1 identical (jaccard 1.0 — every band collides, so LSH
    // must catch it); 2/3 share nothing above threshold with anyone
    val d = fixtureDir(docs = Seq(
      doc(0, "alpha beta gamma delta epsilon zeta"),
      doc(1, "alpha beta gamma delta epsilon zeta"),
      doc(2, "one two three four five six seven"),
      doc(3, "totally unrelated words in this line")))
    assert(rows(Dedup.dedupRecall(spark, d)) ===
      Set(Seq(1L, 1L, 1L, 1.0, 1.0)))
  }

  test("capture_recapture: an identical pair caught by both methods " +
      "reads Chapman N=1 with full coverage") {
    val d = fixtureDir(docs = Seq(
      doc(0, "alpha beta gamma delta epsilon zeta"),
      doc(1, "alpha beta gamma delta epsilon zeta"),
      doc(2, "one two three four five six seven")))
    // n1 = n2 = m = 1 -> chapman = 2*2/2 - 1 = 1, est_missed 0
    assert(rows(Dedup.captureRecapture(spark, d)) ===
      Set(Seq(1L, 1L, 1L, 1L, 1.0, 0.0, 1.0, 1.0)))
  }

  test("capture_recapture: Chapman recomputed driver-side from the two " +
      "catch sets at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val mh = Dedup.dedupPairs(spark, d).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.dedupSimhash(spark, d).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (n1, n2, m) = (mh.size, sh.size, (mh & sh).size)
    val chap = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val got = Dedup.captureRecapture(spark, d).collect().head
    assert(got.getLong(0) === n1.toLong && got.getLong(1) === n2.toLong)
    assert(got.getLong(2) === m.toLong)
    assert(got.getLong(3) === (n1 + n2 - m).toLong)
    assert(got.getDouble(4) === r2(chap))
    assert(got.getDouble(5) === r2(chap - (n1 + n2 - m)))
    if (chap > 0) {
      assert(got.getDouble(6) === r4(n1 / chap))
      assert(got.getDouble(7) === r4(n2 / chap))
    }
  }

  test("span_hotspots: a shared 8-token run ranks as the hot window") {
    val run = "a b c d e f g h"                   // exactly one 8-window
    val dir = fixtureDir(docs = Seq(
      doc(1, run), doc(2, run), doc(3, "x y z q w e r t")))
    val out = graft.operators.Dedup.spanHotspots(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_occ") === 2L)
    assert(r.getAs[Int]("rank") === 1)
    // the hash is the same md5 dedup_substring's windows use
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(run.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("h") === md)
  }

  test("containment_dup: small-in-big inclusion passes, symmetric dup is excluded") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // doc 1 (4 toks, 2 shingles) is a strict prefix of doc 2 (14 toks,
    // 12 shingles): containment 2/2 = 1.0, jaccard 2/12 < 0.5 -> kept.
    // docs 4=5 are identical: containment 1.0 BUT jaccard 1.0 -> the
    // jaccard-< band excludes them (they belong to the minhash pass).
    // doc 3 shares nothing.
    val d = fixtureDir(docs = Seq(
      doc(1, "w1 w2 w3 w4"),
      doc(2, "w1 w2 w3 w4 a b c d e f g h i j"),
      doc(3, "p q r s t"),
      doc(4, "m1 m2 m3 m4 m5"),
      doc(5, "m1 m2 m3 m4 m5")))
    assert(rows(graft.operators.Dedup.containmentDup(spark, d)) === Set(
      Seq(1L, 2L, 2L, 2L, 1.0, r4(2.0 / 12))))
  }

  test("minhash_error: identical docs estimate 1.0 with zero error") {
    // two identical docs: every signature component matches AND the
    // verified jaccard is 1.0 -> est = truth, abs err = bias = 0
    val d = fixtureDir(docs = Seq(
      doc(1, "w1 w2 w3 w4 w5 w6"), doc(2, "w1 w2 w3 w4 w5 w6"),
      doc(3, "p q r s t u v")))
    val out = graft.operators.Dedup.minhashError(spark, d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Double]("mean_est") === 1.0)
    assert(r.getAs[Double]("mean_jaccard") === 1.0)
    assert(r.getAs[Double]("mean_abs_err") === 0.0)
    assert(r.getAs[Double]("bias") === 0.0)
  }

  test("fuzzy_match: noun-blocked vocabulary pairs under the edit budget") {
    import spark.implicits._
    // 'small ring' (2 entries) vs 'smell ring' is one substitution;
    // 'red ring' shares the block but is 4 edits away; 'red bolt'
    // blocks alone
    val parts = Seq(
      (1L, "small ring"), (2L, "small ring"), (3L, "smell ring"),
      (4L, "red ring"), (5L, "red bolt"))
      .toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("graft-fz").toString
    parts.write.parquet(s"$dir/part.parquet")
    assert(rows(graft.operators.Dedup.fuzzyMatch(spark, dir)) === Set(
      Seq("small ring", "smell ring", 1, 2L, 1L)))
  }

  test("fuzzy_clusters: transitive chain merges into one entity with " +
      "the lexicographic canonical; singletons label themselves") {
    import spark.implicits._
    // chain: 'small ring' ~1~ 'smell ring' ~2~ 'shelf ring'; the ends
    // are 3 edits apart (> budget), so only TRANSITIVITY merges all
    // three; 'red ring' shares the block but stays >2 edits from each
    val parts = Seq(
      (1L, "small ring"), (2L, "small ring"), (3L, "smell ring"),
      (4L, "shelf ring"), (5L, "red ring"), (6L, "red bolt"))
      .toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("graft-fc").toString
    parts.write.parquet(s"$dir/part.parquet")
    assert(rows(graft.operators.Dedup.fuzzyClusters(spark, dir)) === Set(
      Seq("small ring", "shelf ring", 2L, 3L, 4L),
      Seq("smell ring", "shelf ring", 1L, 3L, 4L),
      Seq("shelf ring", "shelf ring", 1L, 3L, 4L),
      Seq("red ring", "red ring", 1L, 1L, 1L),
      Seq("red bolt", "red bolt", 1L, 1L, 1L)))
  }

  /** The engine's deterministic arrival split, recomputed driver-side
    * (first 8 md5 hex of "id:graft-delta" over 2^32).
    */
  private def isDeltaId(id: Long): Boolean = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:${Dedup.DeltaSeed}".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h, 16) / 4294967296.0 < Dedup.DeltaRate
  }

  test("dedup_delta: arrival pairs are exactly the batch pairs with a " +
      "delta member; pair_kind splits shard-internal from shard-vs-store") {
    // the shared corpus must exercise both kinds: 1,2,4 fall in the
    // arriving shard under the split hash, 0,3 stay behind the store
    assert(Seq(1L, 2L, 4L).forall(isDeltaId))
    assert(!isDeltaId(0L) && !isDeltaId(3L))
    val batch = Dedup.dedupMinhash(spark, dir0)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = batch
      .filter(p => isDeltaId(p._1) || isDeltaId(p._2))
      .map(p => Seq[Any](p._1, p._2, p._3,
        if (isDeltaId(p._1) && isDeltaId(p._2)) "delta_delta"
        else "delta_base"))
      .toSet
    // both kinds present, and the base-base (0,3) pair excluded
    assert(expected.exists(_.last == "delta_delta"))
    assert(expected.exists(_.last == "delta_base"))
    assert(batch.exists(p => p._1 == 0L && p._2 == 3L))
    assert(rows(Dedup.dedupDelta(spark, dir0)) === expected)
  }

  test("store absorption: an absorbed shard is visible to the NEXT " +
      "arrival via the stores alone; appends are idempotent and " +
      "store_coverage reconciles post-append") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // every id is NON-delta: the stores build from whatever the corpus
    // table holds at first use, and absorption (not the split hash)
    // decides store membership
    assert(Seq(0L, 3L, 5L, 7L).forall(!isDeltaId(_)))
    val tShard = "quick brown fox jumps over lazy dog tonight"
    val dir = fixtureDir(
      docs = Seq(doc(0, "alpha beta gamma delta epsilon zeta"),
        doc(3, "one two three four five six seven")),
      embs = Seq(Emb(0, vec(1.0), 0), Emb(1, vec(0.5, 0.5), 0),
        Emb(2, vec(0.0, 1.0), 1)))
    // stores build over the base corpus only
    Dedup.bandStore(spark, dir); Dedup.hashStore(spark, dir)
    // ingest order: the shard's doc rows land in the corpus table first
    Seq(doc(5, tShard), doc(7, tShard)).toDF()
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val docsT = graft.sources.Tables.documents(spark, dir)
    val shard1 = docsT.filter(col("doc_id") === 5)
    val shard2 = docsT.filter(col("doc_id") === 7)
    // control: without absorption, arrival 2 cannot see shard 1
    assert(Dedup.dedupArrival(spark, dir, shard2).collect().isEmpty)
    // absorb shard 1; arrival 2 now finds the pair VIA THE STORE ALONE
    Dedup.appendToBandStore(spark, dir, shard1)
    Dedup.appendToHashStore(spark, dir, shard1)
    assert(rows(Dedup.dedupArrival(spark, dir, shard2)) === Set(
      Seq[Any](5L, 7L, 1.0, "delta_base")))
    // first-come-first-kept: shard 2's identical text does NOT retarget
    // the existing hash row's canonical
    Dedup.appendToHashStore(spark, dir, shard2)
    val hs = spark.read.parquet(Dedup.hashStorePath(dir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hs.size === 3) // two base hashes + the shard text's one
    assert(hs.values.toSet === Set(0L, 3L, 5L))
    // absorb shard 2's bands too: every corpus doc is now behind the
    // stores and the reconciliation audit reads clean
    Dedup.appendToBandStore(spark, dir, shard2)
    val cov = rows(graft.operators.Curation.storeCoverage(spark, dir))
      .map(r => r.head -> (r(3), r(4))).toMap
    assert(cov("band_store") === ((0L, 0L)))
    assert(cov("hash_store") === ((0L, 0L)))
    // repeated appends are no-ops (batch-bounded anti-join dedupe)
    val nb = spark.read.parquet(Dedup.bandStorePath(dir)).count()
    val nh = spark.read.parquet(Dedup.hashStorePath(dir)).count()
    Dedup.appendToBandStore(spark, dir, shard1)
    Dedup.appendToHashStore(spark, dir, shard1)
    assert(spark.read.parquet(Dedup.bandStorePath(dir)).count() === nb)
    assert(spark.read.parquet(Dedup.hashStorePath(dir)).count() === nh)
  }

  test("band_store_stats: per-band bucket aggregates match a driver-side " +
      "rollup of the base-corpus band rows") {
    import org.apache.spark.sql.functions.col
    val bandRows = Dedup.minhashBandedFrom(Dedup.shingleRowsOf(
        graft.sources.Tables.documents(spark, dir0)
          .filter(!Dedup.isDelta(col("doc_id")))))
      .collect().map(r => (r.getInt(1), r.getString(2)))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected = bandRows.groupBy(_._1).map { case (b, rs) =>
      val sizes = rs.groupBy(_._2).values.map(_.size.toLong).toSeq
      Seq[Any](b, sizes.size.toLong, sizes.sum, sizes.max,
        r4(sizes.sum.toDouble / sizes.size), 0L, 0.0)
    }.toSet
    assert(expected.nonEmpty)
    assert(rows(Dedup.bandStoreStats(spark, dir0)) === expected)
  }

  test("banding_pick: the cheapest arm meeting the recall target wins; " +
      "fallback is the highest-recall arm") {
    val arms = Dedup.bandingCurve(spark, dir0).collect().map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2),
        Option(r.get(5)).map(_.asInstanceOf[Double]).getOrElse(0.0),
        Option(r.get(5)), Option(r.get(6)))
    }
    val meeting = arms.filter(_._4 >= Dedup.BandingRecallTarget)
    val want =
      if (meeting.nonEmpty) meeting.minBy(a => (a._3, a._1))
      else arms.minBy(a => (-a._4, a._3, a._1))
    val out = Dedup.bandingPick(spark, dir0).collect()
    assert(out.length === 1)
    val p = out.head
    assert((p.getInt(0), p.getInt(1)) === ((want._1, want._2)))
    assert(p.getBoolean(2) === meeting.nonEmpty)
    assert(p.getDouble(3) === Dedup.BandingRecallTarget)
    assert(Option(p.get(4)) === want._5)
    assert(Option(p.get(5)) === want._6)
    assert(p.getLong(6) === want._3)
  }
}
