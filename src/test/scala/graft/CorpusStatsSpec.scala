package graft

import graft.operators.{CorpusStats, TextAnalysis}

/** Known-corpus checks for the corpus-statistics operators. */
class CorpusStatsSpec extends SparkSpecBase {

  test("ngram_stats: occurrence + doc counts, count-then-gram rank order") {
    val dir = fixtureDir(docs = Seq(doc(1, "a b a b"), doc(2, "a b c")))
    // doc 1 bigrams: "a b","b a","a b"; doc 2: "a b","b c"
    val out = rows(CorpusStats.ngramStats(spark, dir))
    assert(out === Set(
      Seq("a b", 3L, 2L, 1),
      Seq("b a", 1L, 1L, 2), // count tie broken by gram asc
      Seq("b c", 1L, 1L, 3)))
  }

  test("quality_by_length: pow2 token bins, exact 4dp means and shares") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "a b c"), doc(1, "d e f"), // 3 tokens -> bin_lo 2
      doc(2, "p q r s t")))             // 5 tokens -> bin_lo 4
    val scores = TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    def m4(xs: Seq[Double]) = {
      val s = xs.map(x => BigDecimal(x).setScale(4)).sum
      // the engine divides the exact decimal sum once in double
      math.floor(s.toDouble / xs.length * 1e4 + 0.5) / 1e4
    }
    def ls(xs: Seq[Double]) =
      math.floor(xs.count(_ < 0.5).toDouble / xs.length * 1e4 + 0.5) / 1e4
    val out = CorpusStats.qualityByLength(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val b2 = Seq(scores(0L), scores(1L))
    val b4 = Seq(scores(2L))
    assert(out === Map(
      2L -> ((2L, m4(b2), ls(b2))),
      4L -> ((1L, m4(b4), ls(b4)))))
  }

  test("mix_sensitivity: tau=1 is the identity arm; tau=0.7 matches " +
      "mix_temperature") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "a", "s0"), doc(1, "b", "s0"), doc(2, "c", "s0"),
      doc(3, "d", "s1")))
    val out = CorpusStats.mixSensitivity(spark, dir).collect()
    assert(out.length === 3 * 2) // 3 taus x 2 sources
    val byTau = out.groupBy(_.getDouble(0))
    assert(byTau.keySet === Set(0.5, 0.7, 1.0))
    // tau=1.0: weights = natural shares up to the 6dp exp/ln round-trip
    byTau(1.0).foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) <= 2e-6)
      assert(math.abs(r.getDouble(4) - 1.0) <= 1e-4 * 2)
    }
    // the 0.7 arm IS mix_temperature
    val mt = CorpusStats.mixTemperature(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    byTau(0.7).foreach { r =>
      assert(mt(r.getString(1)) ===
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    }
    // flattening: the tail source's weight rises as tau falls
    def w(t: Double) = byTau(t).find(_.getString(1) == "s1").get.getDouble(3)
    assert(w(0.5) > w(0.7) && w(0.7) > w(1.0))
  }

  test("zipf_fit: closed-form log-log regression over the ranked head") {
    // term counts a:4, b:2, c:1 -> ranks 1..3
    val dir = fixtureDir(docs = Seq(doc(1, "a a a a b b c")))
    val out = CorpusStats.zipfFit(spark, dir).collect().head
    // expected via the same exact-integer moment definition
    def lu(v: Double): BigInt = BigInt(
      math.floor(math.log(v) * 1e6 + 0.5).toLong)
    val pts = Seq((1, 4), (2, 2), (3, 1))
      .map { case (r, c) => (lu(r), lu(c)) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum;      val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val num = (n * sxy - sx * sy).toDouble
    val dx = (n * sxx - sx * sx).toDouble
    val dy = (n * syy - sy * sy).toDouble
    assert(out.getLong(0) === 3L)
    assert(out.getDouble(1) === r6(num / dx))
    assert(out.getDouble(2) ===
      r6((sy * sxx - sx * sxy).toDouble / dx / 1000000))
    assert(out.getDouble(3) === r6(num * num / (dx * dy)))
    // and the fit itself behaves: a 4/2/1 head is a falling power law
    assert(out.getDouble(1) < 0 && out.getDouble(3) > 0.9)
  }

  test("zipf_fit: a single-term head has no fit — NULL stats") {
    val dir = fixtureDir(docs = Seq(doc(1, "a a a")))
    val out = CorpusStats.zipfFit(spark, dir).collect().head
    assert(out.getLong(0) === 1L)
    assert(out.isNullAt(1) && out.isNullAt(2) && out.isNullAt(3))
  }

  test("zipf_fit: an all-tied head fits a flat line with NULL r2") {
    // every token distinct -> counts all 1 -> dy = 0 exactly
    val dir = fixtureDir(docs = Seq(doc(1, "a b c")))
    val out = CorpusStats.zipfFit(spark, dir).collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getDouble(1) === 0.0) // slope of the flat line
    assert(out.isNullAt(3))          // r2 is 0/0 -> guarded NULL
  }

  test("vocab_growth: nested hash deciles accumulate tokens and types") {
    val dir = fixtureDir(docs = Seq(doc(1, "a a b"), doc(2, "a c")))
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${graft.operators.Curation.SampleSeed}".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
      math.floor(u * 10).toInt
    }
    // rebuild the expected curve from the definition: cumulative token
    // count and first-seen type count over the present deciles
    val toks = Seq((bucket(1), "a"), (bucket(1), "a"), (bucket(1), "b"),
      (bucket(2), "a"), (bucket(2), "c"))
    val expected = toks.map(_._1).distinct.sorted.map { b =>
      Seq((b + 1) / 10.0,
        toks.count(_._1 <= b).toLong,
        toks.groupBy(_._2).values.map(_.map(_._1).min).count(_ <= b).toLong)
    }.toSet
    assert(rows(CorpusStats.vocabGrowth(spark, dir)) === expected)
  }

  test("token_entropy: ln N − (1/N)Σ c·ln c per language, vocab=1 guard") {
    val dir = fixtureDir(docs = Seq(
      doc(1, "a a b"),                      // en: N=3, c={2,1}
      Doc(2, "x x x", "de", "s0", 5)))      // de: vocab=1 -> norm 0
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // per-type terms are 6dp-rounded BEFORE the exact multiply
    val clogc = 2 * r6(math.log(2.0)) + 1 * r6(math.log(1.0))
    val entEn = math.log(3.0) - clogc / 3
    val out = rows(CorpusStats.tokenEntropy(spark, dir))
    assert(out === Set(
      Seq("de", 3L, 1L, r6(math.log(3.0) - 3 * r6(math.log(3.0)) / 3), 0.0),
      Seq("en", 3L, 2L, r6(entEn), r6(entEn / math.log(2.0)))))
  }

  test("domain_mix: shares and resampling factors against the recipe") {
    val dir = fixtureDir(docs = Seq(
      Doc(1, "a b c d", "en", "s0", 7),
      Doc(2, "e f", "en", "s0", 3),
      Doc(3, "w x y z", "de", "s0", 7)))
    // total 10 tokens; en 6 (target 0.50), de 4 (target 0.15)
    val out = rows(CorpusStats.domainMix(spark, dir))
    assert(out === Set(
      Seq("de", 1L, 4L, 0.4, 0.15, 0.375, 1L),    // 0.15*10/4
      Seq("en", 2L, 6L, 0.6, 0.5, 0.833333, 5L))) // 0.5*10/6 floored 6dp
  }

  test("apply_mix: integer repeats plus hash-realized fractional part") {
    val dir = fixtureDir(docs = Seq(
      Doc(1, "a b c d", "en", "s0", 7),
      Doc(2, "e f", "en", "s0", 3),
      Doc(3, "w x y z", "de", "s0", 7)))
    // domain_mix factors on this corpus: en 0.833333, de 0.375 (see the
    // domain_mix test); both < 1, so n_copies = [hash(doc_id) < frac]
    def hashU(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${graft.operators.Curation.SampleSeed}".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    val expected = Set(
      Seq(1L, "en", 0.833333, if (hashU(1) < 0.833333) 1L else 0L),
      Seq(2L, "en", 0.833333, if (hashU(2) < 0.833333) 1L else 0L),
      Seq(3L, "de", 0.375, if (hashU(3) < 0.375) 1L else 0L))
    assert(rows(CorpusStats.applyMix(spark, dir)) === expected)
    // the fixture must exercise both outcomes or the test proves nothing
    val copies = expected.map(_.last)
    assert(copies.contains(0L) && copies.contains(1L))
  }

  test("quality_thresholds: discrete quantile positions of quality_score") {
    // 11 docs, varying length => varying scores; positions for n=11 are
    // rn 2 / 6 / 10 (0-indexed 1 / 5 / 9 of the score-sorted order)
    val docs = (1 to 11).map(i =>
      Doc(i.toLong, ("word " * i).trim + " the end.", "en", "s0", 1L))
    val dir = fixtureDir(docs = docs)
    val scores = TextAnalysis.qualityScore(spark, dir)
      .select("score").collect().map(_.getDouble(0)).sorted
    val out = CorpusStats.qualityThresholds(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "en")
    assert(r.getInt(1) === 11)
    assert(r.getDouble(2) === scores(1))
    assert(r.getDouble(3) === scores(5))
    assert(r.getDouble(4) === scores(9))
  }

  test("hist_quantiles: histogram cumulative picks the rank-sort scores") {
    // duplicate scores on purpose (pairs of equal-length docs): the
    // histogram collapses them into one bin and the cumulative lookup
    // must still select the same positional score as a full rank sort
    val docs = (1 to 10).map(i =>
      Doc(i.toLong, ("word " * ((i + 1) / 2)).trim + " the end.", "en",
        "s0", 1L)) :+ Doc(11L, "short one.", "en", "s0", 1L)
    val dir = fixtureDir(docs = docs)
    val scores = TextAnalysis.qualityScore(spark, dir)
      .select("score").collect().map(_.getDouble(0)).sorted
    // n=11: 1-based positions (n-1)*p div den + 1 -> idx 2/5/7/9/9 (0-based)
    val out = CorpusStats.histQuantiles(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "en")
    assert(r.getInt(1) === 11)
    assert(r.getDouble(2) === scores(2))  // p25: (10*1) div 4 = 2
    assert(r.getDouble(3) === scores(5))  // p50
    assert(r.getDouble(4) === scores(7))  // p75: 30 div 4 = 7
    assert(r.getDouble(5) === scores(9))  // p90
    assert(r.getDouble(6) === scores(9))  // p99: 990 div 100 = 9
  }

  test("perplexity_score: hand-built add-one bigram LM, per-lang pooling") {
    val dir = fixtureDir(docs = Seq(doc(1, "a b a b"), doc(2, "a b c")))
    // LM (en): bigram counts ab=3 ba=1 bc=1; context counts a=3 b=2;
    // V = 2 distinct contexts {a, b}
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val ab = r6(math.log(5.0 / 4))  // ln((3+2)/(3+1))
    val bx = r6(math.log(4.0 / 2))  // ba and bc: ln((2+2)/(1+1))
    // engine accumulates 6dp terms exactly in DECIMAL, then one double div
    def avg(sum: BigDecimal, n: Long) = r6(sum.toDouble / n)
    val avg1 = avg(BigDecimal(2) * BigDecimal(ab) + BigDecimal(bx), 3)
    val avg2 = avg(BigDecimal(ab) + BigDecimal(bx), 2)
    val out = rows(CorpusStats.perplexityScoreOf(
      spark.read.parquet(s"$dir/documents.parquet")))
    assert(out === Set(
      Seq(1L, "en", 3L, avg1, r4(math.exp(avg1))),
      Seq(2L, "en", 2L, avg2, r4(math.exp(avg2)))))
    // the driver-gated query (build + probe through the IndexStore path)
    // must agree with the unpersisted twin on the same corpus
    assert(rows(CorpusStats.perplexityScore(spark, dir)) === out)
  }

  test("perplexity_ood: LM trains on src0 only, scores the complement") {
    // training slice (src0) is the perplexity_score spec corpus; scored
    // slice exercises a seen bigram, the unseen-bigram floor, and an
    // unscorable language (de never appears in src0 -> dropped)
    val dir = fixtureDir(docs = Seq(
      Doc(1, "a b a b", "en", "src0", 7), Doc(2, "a b c", "en", "src0", 5),
      Doc(3, "a b z", "en", "src1", 5), Doc(4, "x y", "de", "src1", 3)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val ab = r6(math.log(5.0 / 4))  // ln((3+2)/(3+1)): seen, c2=3 c1=3
    val bz = r6(math.log(4.0 / 1))  // ln((2+2)/(0+1)): smoothed floor
    val avg = r6((BigDecimal(ab) + BigDecimal(bz)).toDouble / 2)
    assert(rows(CorpusStats.perplexityOod(spark, dir)) ===
      Set(Seq(3L, "en", 2L, avg, r4(math.exp(avg)))))
    // and the persisted artifact must equal the unpersisted training run
    assert(rows(CorpusStats.oodBigramLm(spark, dir)) === rows(
      CorpusStats.bigramLmOf(spark.read.parquet(s"$dir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("source") === "src0"))))
  }

  test("perplexity_backoff: all three stupid-backoff branches score") {
    // train (src0): c3 abc=2 bca=1 cab=1 abd=1; c2 ab=3 bc=2 ca=1 bd=1;
    // c1 a=3 b=3 c=1; N=7 V=3
    val dir = fixtureDir(docs = Seq(
      Doc(1, "a b c a b d", "en", "src0", 11), Doc(2, "a b c", "en", "src0", 5),
      Doc(3, "a b c", "en", "src1", 5),    // branch 1: ln(c2(ab)/c3(abc))
      Doc(4, "b c a x", "en", "src1", 7),  // bca branch 1; cax branch 3
      Doc(5, "d a b", "en", "src1", 5)))   // dab unseen, ab seen: branch 2
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val abc = r6(math.log(3.0 / 2))           // ln(ctx 3 / c3 2)
    val bca = r6(math.log(2.0 / 1))           // ln(ctx 2 / c3 1)
    val cax = r6(math.log(10.0 / (0.16 * 1))) // ln((N+V)/(α²·(0+1)))
    val dab = r6(math.log(3.0 / (0.4 * 3)))   // ln(c1(a)/(α·c2(ab)))
    val avg4 = r6((BigDecimal(bca) + BigDecimal(cax)).toDouble / 2)
    assert(rows(CorpusStats.perplexityBackoff(spark, dir)) === Set(
      Seq(3L, "en", 1L, abc, r4(math.exp(abc))),
      Seq(4L, "en", 2L, avg4, r4(math.exp(avg4))),
      Seq(5L, "en", 1L, dab, r4(math.exp(dab)))))
  }

  test("perplexity_score: frozen LM floors unseen bigrams, drops unknown langs") {
    import spark.implicits._
    val lm = CorpusStats.bigramLmOf(
      Seq(doc(1, "a b a b"), doc(2, "a b c")).toDF()).localCheckpoint()
    // doc 3: (a b) seen [c2=3,c1=3], (b z) unseen bigram of a seen
    // context [c2=0,c1=2]; doc 4: lang the LM never saw -> dropped
    val out = rows(CorpusStats.scoreAgainstLm(
      Seq(Doc(3, "a b z", "en", "s0", 5), Doc(4, "x y", "de", "s0", 3))
        .toDF(), lm))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val ab = r6(math.log(5.0 / 4))  // ln((3+2)/(3+1))
    val bz = r6(math.log(4.0 / 1))  // ln((2+2)/(0+1)): smoothed floor
    val avg = r6((BigDecimal(ab) + BigDecimal(bz)).toDouble / 2)
    assert(out === Set(Seq(3L, "en", 2L, avg, r4(math.exp(avg)))))
  }

  test("corpus_card: sizes, diversity, and the gate's own quality mean") {
    val docs = Seq(
      Doc(1, "the cat sat on the mat.", "en", "s0", 23),   // 6 toks: short
      Doc(2, ("word " * 60).trim + " the end.", "de", "s1", 300)) // 62 toks
    val dir = fixtureDir(docs = docs)
    // the card's quality term must be the IDENTICAL composite the
    // quality_score gate emits — derive the expectation from the gate
    val scores = TextAnalysis.qualityScore(spark, dir)
      .select("score").collect().map(r => BigDecimal(r.getDouble(0)))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val avgQ = r4(scores.sum.toDouble / scores.length)
    assert(rows(CorpusStats.corpusCard(spark, dir)) === Set(
      Seq(2L, 6L + 62L, 323L, 2L, 2L, avgQ, 0.5)))
  }

  test("dsir_weights: target-like docs score high, off-domain low") {
    // target (src0): "a b"; pool: doc 10 identical to the target, doc 11
    // disjoint. Expected weights recomputed with the engine's own
    // formula (same md5 bucketing, 6dp term rounds, decimal sum).
    val dir = fixtureDir(docs = Seq(
      Doc(1, "a b", "en", "src0", 3),
      Doc(10, "a b", "en", "s1", 3),
      Doc(11, "z z", "en", "s1", 3)))
    val B = CorpusStats.DsirBuckets
    def bucket(g: String): Long =
      java.lang.Long.parseLong(
        graft.operators.IndexStore.md5hex(g).substring(0, 15), 16) % B
    // bucket -> (target count, raw count); features = unigrams + bigrams
    def feats(t: String): Seq[String] = {
      val ws = t.split(" ").toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (x, y) => s"$x $y" }
    }
    val tgt = feats("a b").groupBy(bucket).view.mapValues(_.size).toMap
    val raw = (feats("a b") ++ feats("z z"))
      .groupBy(bucket).view.mapValues(_.size).toMap
    val (tt, rt) = (tgt.values.sum, raw.values.sum)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def lw(t: String): Double = {
      val terms = feats(t).groupBy(bucket).view.mapValues(_.size).map {
        case (b, n) =>
          BigDecimal(n) * BigDecimal(r6(
            math.log((tgt.getOrElse(b, 0) + 1).toDouble / (tt + B)) -
            math.log((raw.getOrElse(b, 0) + 1).toDouble / (rt + B))))
      }
      r6(terms.sum.toDouble)
    }
    val out = rows(CorpusStats.dsirWeights(spark, dir))
    assert(out === Set(
      Seq(10L, 3L, lw("a b")), Seq(11L, 3L, lw("z z"))))
    // the fixture must separate the domains or the test proves nothing
    assert(lw("a b") > 0 && lw("z z") < 0)
  }

  test("dsir_select: deterministic Gumbel top-k favors target-like docs") {
    val out = CorpusStats.dsirSelect(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3)))
    // exactly min(K, pool) rows, ranks 1..n, gkey non-increasing in rank
    assert(out.nonEmpty && out.length <= CorpusStats.DsirSelectK)
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._4).toSeq === (1 to out.length))
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a._3 >= b._3
      case _ => true
    })
    // reproducible: the sample is a pure function of (doc_id, seed)
    val again = CorpusStats.dsirSelect(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3)))
    assert(again.toSeq === out.toSeq)
    // importance bias: the selected mean log-weight beats the pool mean
    // (Gumbel noise is weight-independent, so selection must tilt up)
    val pool = CorpusStats.dsirWeights(spark, "/root/testdata/sf0.001")
      .collect().map(_.getDouble(2))
    if (out.length < pool.length) {
      val selMean = out.map(_._2).sum / out.length
      val poolMean = pool.sum / pool.length
      assert(selMean > poolMean,
        s"selected mean $selMean must beat pool mean $poolMean")
    } else assert(out.length === pool.length) // K covers the whole pool
  }

  test("signal_corr: matches a Pearson recompute from the signal frames") {
    val dir = "/root/testdata/sf0.001"
    val scores = graft.operators.TextAnalysis.qualityScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val langNll = CorpusStats.perplexityScore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // recompute per-lang r with the operator's own unit/moment rules
    def u4(x: Double) = math.floor(x * 10000 + 0.5).toLong
    val expected = langNll.filter(t => scores.contains(t._1))
      .groupBy(_._2).map { case (lang, ds) =>
        val xs = ds.map(d => u4(scores(d._1)))
        val ys = ds.map(d => u4(d._3))
        val n = BigInt(ds.length)
        def s(v: Seq[Long]) = v.map(BigInt(_)).sum
        def sp(a: Seq[Long], b: Seq[Long]) =
          a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
        val num = (n * sp(xs, ys) - s(xs) * s(ys)).toDouble
        val dx = (n * sp(xs, xs) - s(xs) * s(xs)).toDouble
        val dy = (n * sp(ys, ys) - s(ys) * s(ys)).toDouble
        val corr =
          if (ds.length > 1 && dx != 0.0 && dy != 0.0)
            Some(math.floor(num / math.sqrt(dx * dy) * 10000 + 0.5) / 10000)
          else None
        lang -> (ds.length.toLong, corr)
      }
    val out = CorpusStats.signalCorr(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out === expected)
    // the audit must be non-degenerate on the real corpus
    assert(out.values.exists(_._2.isDefined))
  }

  test("bpe_pairs: frequency-weighted char pairs, distinct-type counts") {
    val dir = fixtureDir(docs = Seq(
      doc(1, "ab ab cab"), doc(2, "ab b"), doc(3, "aaa")))
    // vocab: ab:3, cab:1, b:1 (len<2 skipped), aaa:1
    // "ab" pairs: ab; "cab": ca, ab; "aaa": aa at i=1 AND i=2 (k=2)
    val out = rows(CorpusStats.bpePairs(spark, dir))
    assert(out === Set(
      Seq("ab", 4L, 2L, 1), // 3 (from 'ab') + 1 (from 'cab'), 2 types
      Seq("aa", 2L, 1L, 2), // k=2 within one type
      Seq("ca", 1L, 1L, 3)))
  }

  test("bpe_vocab: greedy leftmost merges, re-counted per round") {
    val dir = fixtureDir(docs = Seq(doc(1, "abab abab abc"), doc(2, "aaa")))
    // vocab: abab:2, abc:1, aaa:1
    // r1 pairs: (a,b):2·2+1=5, (b,a):2, (b,c):1, (a,a):2 (overlapping in
    // 'aaa') -> merge (a,b,5); abab -> [ab,ab], abc -> [ab,c]
    // r2: (ab,ab):2, (ab,c):1, (a,a):2 -> tie 2 broken lexicographically:
    // 'a' < 'ab' -> merge (a,a,2); aaa -> [aa,a] (GREEDY leftmost)
    // r3: (ab,ab):2 -> merge; r4: (aa,a):1 < (ab,c):1? tie: 'aa'<'ab'
    // -> merge (aa,a,1); r5: (ab,c):1; r6..: no pairs left -> no rows
    val out = graft.operators.CorpusStats.bpeVocab(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.take(5).toSeq === Seq(
      (1, "a", "b", 5L), (2, "a", "a", 2L), (3, "ab", "ab", 2L),
      (4, "aa", "a", 1L), (5, "ab", "c", 1L)))
    assert(out.length === 5) // merged-out corpus: later rounds emit none
  }

  test("bpe_encode: every word of the merged-out corpus collapses to " +
      "one subword (fertility 1.0)") {
    // same corpus as the bpe_vocab spec: the 5 learned merges fully
    // re-segment every word type (abab/abc/aaa each end as ONE symbol),
    // so the per-lang rollup must read exactly fertility 1.0 — an
    // end-to-end pin that merge APPLICATION follows merge learning
    val dir = fixtureDir(docs = Seq(doc(1, "abab abab abc"), doc(2, "aaa")))
    val out = graft.operators.CorpusStats.bpeEncode(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      === ((2L, 4L, 4L, 1.0)))
  }

  test("source_card: per-source datasheet rows reconcile with the corpus card") {
    val docs = Seq(
      Doc(1, "the cat sat on the mat.", "en", "s0", 23),
      Doc(2, ("word " * 60).trim + " the end.", "de", "s1", 300),
      Doc(3, "tiny doc.", "en", "s1", 9))
    val dir = fixtureDir(docs = docs)
    // quality terms must be the IDENTICAL composite the gate emits
    val q = TextAnalysis.qualityScore(spark, dir)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))).toMap
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(CorpusStats.sourceCard(spark, dir)) === Set(
      Seq("s0", 1L, 6L, 23L, 1L, r4(q(1L).toDouble), 1.0),
      Seq("s1", 2L, 62L + 2L, 309L, 2L,
        r4((q(2L) + q(3L)).toDouble / 2), 0.5)))
    // and the per-source rows sum to the corpus card's totals
    val card = CorpusStats.corpusCard(spark, dir).collect().head
    val src = CorpusStats.sourceCard(spark, dir).collect()
    assert(src.map(_.getLong(1)).sum === card.getLong(0))
    assert(src.map(_.getLong(2)).sum === card.getLong(1))
  }

  test("tokenizer_fertility: three counters and the two ratios, per lang") {
    val dir = fixtureDir(docs = Seq(
      Doc(1, "ab cd, x9", "en", "s0", 9), // ws 3; re ab|cd|,|x|9 = 5; ch 9
      Doc(2, "zz", "de", "s0", 2)))       // ws 1; re 1; ch 2
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows(CorpusStats.tokenizerFertility(spark, dir)) === Set(
      Seq("en", 1L, 3L, 5L, 9L, r4(5.0 / 3), r4(9.0 / 5)),
      Seq("de", 1L, 1L, 1L, 2L, 1.0, 2.0)))
  }

  test("length_hist: power-of-two bins, exact at the boundaries") {
    // 1 tok -> bin 1; 2 toks -> bin 2; 3 -> bin 2; 4 -> bin 4; 8 -> bin 8
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      Doc(1, words(1), "en", "s0", 2),
      Doc(2, words(2), "en", "s0", 5),
      Doc(3, words(3), "en", "s0", 8),
      Doc(4, words(4), "en", "s0", 11),
      Doc(5, words(8), "de", "s0", 23)))
    val out = rows(CorpusStats.lengthHist(spark, dir))
    assert(out === Set(
      Seq("en", 1L, 1L, 1L, 0.25),
      Seq("en", 2L, 2L, 5L, 0.5),
      Seq("en", 4L, 1L, 4L, 0.25),
      Seq("de", 8L, 1L, 8L, 1.0)))
  }

  test("source_divergence: identical distributions read KL 0; skew reads > 0") {
    // s0 and s1 have identical score distributions (same texts); s2 is
    // all long docs -> a different bin -> strictly positive KL
    val long_ = ("word " * 120).trim + " the end."
    val dir = fixtureDir(docs = Seq(
      Doc(1, "the cat sat.", "en", "s0", 12),
      Doc(2, long_, "en", "s0", 600),
      Doc(3, "the cat sat.", "en", "s1", 12),
      Doc(4, long_, "en", "s1", 600),
      Doc(5, long_, "en", "s2", 600),
      Doc(6, long_, "en", "s2", 600)))
    val out = CorpusStats.sourceDivergence(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set("s0", "s1", "s2"))
    assert(out("s0") === out("s1"))
    assert(out("s0")._2 > 0.0) // mixed source vs skewed corpus: positive
    assert(out("s2")._2 > 0.0)
    // KL is non-negative everywhere (Gibbs)
    assert(out.values.forall(_._2 >= 0.0))
  }

  test("corpus_cube: all four grouping levels with the bitmask convention") {
    val d = fixtureDir(docs = Seq(
      Doc(1, "x", "en", "sA", 10), Doc(2, "y", "en", "sB", 20),
      Doc(3, "z", "de", "sA", 30)))
    val out = rows(graft.operators.CorpusStats.corpusCube(spark, d))
    assert(out.contains(Seq("en", "sA", 1L, 10L, 10.0, 0)))    // cell
    assert(out.contains(Seq("en", null, 2L, 30L, 15.0, 1)))    // lang margin
    assert(out.contains(Seq(null, "sA", 2L, 40L, 20.0, 2)))    // source margin
    assert(out.contains(Seq(null, null, 3L, 60L, 20.0, 3)))    // grand total
    assert(out.size === 3 + 2 + 2 + 1)
  }

  test("signal_auc: a perfectly separating LM signal scores exactly 1.0") {
    // kept docs: 21 words, all-distinct bigrams seen TWICE corpus-wide
    // (two identical copies) -> low nll; dropped docs: 5 words
    // (too_short) of once-seen bigrams -> strictly higher nll. The LM
    // ranking then reproduces the gate perfectly -> AUC 1.0 with
    // n_pos = n_neg = 2.
    val good = "the " + (1 to 20).map(i => s"w$i").mkString(" ")
    val d = fixtureDir(docs = Seq(
      doc(1, good), doc(2, good),
      doc(3, "u1 u2 u3 u4 u5"), doc(4, "v1 v2 v3 v4 v5")))
    assert(rows(graft.operators.CorpusStats.signalAuc(spark, d)) === Set(
      Seq("en", 2L, 2L, 1.0)))
  }

  test("ngram_diversity: per-source TTRs; a bigram-less source NULLs its ratio") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val d = fixtureDir(docs = Seq(
      doc(1, "a b a b", source = "sA"),   // uni 4/2, bi: [a b, b a, a b] 3/2
      doc(2, "x", source = "sB")))        // uni 1/1, zero bigrams
    assert(rows(graft.operators.CorpusStats.ngramDiversity(spark, d)) === Set(
      Seq("sA", 1L, 4L, 2L, 0.5, 3L, 2L, r4(2.0 / 3)),
      Seq("sB", 1L, 1L, 1L, 1.0, 0L, 0L, null)))
  }

  test("mix_temperature: hand-computed p^T weights on a 9:1 split") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val T = graft.operators.CorpusStats.MixTemperature
    val d = fixtureDir(docs =
      (1 to 9).map(i => doc(i.toLong, s"t$i", source = "a")) :+
        doc(10, "t10", source = "b"))
    val (sa, sb) = (0.9, 0.1)
    val (ua, ub) = (r6(math.exp(T * math.log(sa))),
      r6(math.exp(T * math.log(sb))))
    val du = ua + ub // both are exact 1e-6 multiples
    val (ta, tb) = (r6(ua / du), r6(ub / du))
    assert(rows(graft.operators.CorpusStats.mixTemperature(spark, d)) ===
      Set(Seq("a", 9L, sa, ta, r4(ta / sa)),
        Seq("b", 1L, sb, tb, r4(tb / sb))))
  }

  test("quality_psi: a single source IS the corpus -> psi exactly 0; " +
      "a shifted source reads positive") {
    val one = fixtureDir(docs = Seq(
      doc(1, "alpha beta gamma"), doc(2, "delta epsilon zeta"),
      doc(3, "one two three four five")))
    val out1 = graft.operators.CorpusStats.qualityPsi(spark, one).collect()
    assert(out1.length === 1)
    assert(out1.head.getAs[Long]("n_docs") === 3L)
    // p and q share every count and denominator -> every term ln(1)=0
    assert(out1.head.getAs[Double]("psi") === 0.0)

    // source "hi" = long stopword-rich docs, "lo" = terse fragments:
    // different score bins, so both sources diverge from the pooled mix
    val hi = "the and for that with this from they have " * 8
    val two = fixtureDir(docs = Seq(
      doc(1, hi, source = "hi"), doc(2, hi, source = "hi"),
      doc(3, "x", source = "lo"), doc(4, "y!", source = "lo")))
    val out2 = graft.operators.CorpusStats.qualityPsi(spark, two).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi")).toMap
    assert(out2.keySet === Set("hi", "lo"))
    assert(out2.values.forall(_ > 0.0))
  }

  test("cooccur_pmi: windowed pairs, min-support cut, hand-computed " +
      "ln ratio") {
    // two copies of "alpha beta alpha beta": within the +-5 window each
    // doc yields 4 (alpha,beta) pairs + 1 (alpha,alpha) + 1 (beta,beta);
    // "gamma delta gamma delta" contributes 4 (gamma,delta) — every
    // pair but (alpha,beta)=8 dies at min support 5
    val dir = fixtureDir(docs = Seq(
      doc(1, "alpha beta alpha beta"),
      doc(2, "alpha beta alpha beta"),
      doc(3, "gamma delta gamma delta")))
    // T = 12 tokens, P = 8 surviving pairs, c_alpha = c_beta = 4:
    // pmi = ln(8/8 * (12/4) * (12/4)) = ln 9
    val exp = math.floor(math.log(8.0 / 8 * (12.0 / 4) * (12.0 / 4))
      * 1e6 + 0.5) / 1e6
    assert(rows(graft.operators.CorpusStats.cooccurPmi(spark, dir)) ===
      Set(Seq("alpha", "beta", 8L, exp)))
  }

  test("signal_mi: matches a driver-side recomputation from the raw " +
      "signal/gate frames; all-same-label corpus scores 0 everywhere") {
    import graft.operators.{CorpusStats, Curation}
    // long docs: unique content words interleaved with stopwords ->
    // non-repetitive, stopword-rich, >= 20 words -> KEPT; short docs
    // fail too_short -> DROPPED (both labels present)
    def long(id: Long) =
      (0 until 15 + id.toInt).map(k => s"the u${id}x$k").mkString(" ")
    val dir = fixtureDir(docs =
      (0L until 6L).map(i => doc(i, long(i))) ++
      (6L until 10L).map(i => doc(i, s"short doc number $i")))
    val sig = TextAnalysis.qualitySignalsOf(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Double]("avg_word_len"),
          r.getAs[Double]("stopword_ratio"), r.getAs[Double]("punct_ratio")))
      .toMap
    val keep = Curation.qualityFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(keep.values.toSet.size === 2) // both labels present
    def b9(x: Double) = math.min(math.floor(x), 9.0).toInt
    val binned: Seq[(String, Int, Boolean)] = sig.toSeq.flatMap {
      case (id, (nw, awl, sr, pr)) => Seq(
        ("n_words", b9(math.log((nw + 1).toDouble)), keep(id)),
        ("avg_word_len", b9(awl), keep(id)),
        ("stopword_ratio", b9(sr * 10), keep(id)),
        ("punct_ratio", b9(pr * 10), keep(id)))
    }
    val expected = binned.groupBy(_._1).map { case (signal, rs) =>
      val nt = rs.size.toLong
      val c = rs.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong)
      val cb = rs.groupBy(_._2).view.mapValues(_.size.toLong)
      val cy = rs.groupBy(_._3).view.mapValues(_.size.toLong)
      val stu = c.map { case ((b, y), n) =>
        math.floor(n.toDouble / nt * math.log(
          n.toDouble / cb(b) * (nt.toDouble / cy(y))) * 1e6 + 0.5).toLong
      }.sum
      Seq[Any](signal, nt, stu.toDouble / 1e6)
    }.toSet
    assert(rows(CorpusStats.signalMi(spark, dir)) === expected)
    // degenerate corpus: every doc keeps -> one label -> MI exactly 0
    val uni = fixtureDir(docs = (0L until 4L).map(i => doc(i, long(i))))
    assert(rows(CorpusStats.signalMi(spark, uni))
      .forall(_.last === 0.0))
  }

  test("burstiness: a clumped term reads VMR > 1, a one-per-doc term " +
      "reads exactly 0, df floor binds") {
    import graft.operators.CorpusStats
    // 'the' in all 6 docs once (s1=6, s2=6, N=6 -> vmr 6/6-6/6 = 0);
    // 'hot' tf {4,1,1,1,1} over 5 docs (s1=8, s2=20 -> 20/8-8/6 =
    // 1.1667); 'rare' df 1 < floor -> dropped
    val dir = fixtureDir(docs = Seq(
      doc(1, "the hot hot hot hot rare"),
      doc(2, "the hot"), doc(3, "the hot"), doc(4, "the hot"),
      doc(5, "the hot"), doc(6, "the")))
    assert(rows(CorpusStats.burstiness(spark, dir)) === Set(
      Seq[Any]("hot", 8L, 5L,
        math.floor((20.0 / 8 - 8.0 / 6) * 1e4 + 0.5) / 1e4),
      Seq[Any]("the", 6L, 6L, 0.0)))
  }

  test("chi2_terms: a source-exclusive term scores the hand chi-square, " +
      "an everywhere term is gated out, negative association drops") {
    import graft.operators.CorpusStats
    // 5 docs per source; 'foo' only in s0 (chi2 = 10), 'baz' 5+3
    // (s0 chi2 = 2.5; s1 side is below expectation -> dropped),
    // 'common' in all 10 (a*N = dft*ns -> gated), 'qux' only in s1
    val docs =
      (1L to 5L).map(i => doc(i, "foo common baz", "s0")) ++
      (6L to 8L).map(i => doc(i, "common qux baz", "s1")) ++
      (9L to 10L).map(i => doc(i, "common qux", "s1"))
    val dir = fixtureDir(docs = docs)
    assert(rows(CorpusStats.chi2Terms(spark, dir)) === Set(
      Seq[Any]("s0", "foo", 5L, 0L, 10.0, 1),
      Seq[Any]("s0", "baz", 5L, 3L, 2.5, 2),
      Seq[Any]("s1", "qux", 5L, 0L, 10.0, 1)))
  }

  test("hapax_ratio: per-source vocab, hapax and token shares") {
    import graft.operators.CorpusStats
    val dir = fixtureDir(docs = Seq(
      doc(1, "a a b", "s0"), doc(2, "x y", "s1")))
    assert(rows(CorpusStats.hapaxRatio(spark, dir)) === Set(
      Seq[Any]("s0", 2L, 1L, 3L, 0.5,
        math.floor(1.0 / 3 * 1e4 + 0.5) / 1e4),
      Seq[Any]("s1", 2L, 2L, 2L, 1.0, 1.0)))
  }

  test("good_turing: hand bigram frequency classes; a missing r+1 class " +
      "zeroes r*, unseen mass is n1/N") {
    import graft.operators.CorpusStats
    // bigrams: "a b"=3, "a c"=3, "b a"=2, "c a"=1, "c x"=1, "x y"=1
    // fof: r=1 -> 3, r=2 -> 1, r=3 -> 2; N = 11, n1 = 3
    val dir = fixtureDir(docs = Seq(
      doc(1, "a b a b"), doc(2, "a c a c"), doc(3, "a b a c x y")))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val p0 = r6(3.0 / 11)
    assert(rows(CorpusStats.goodTuring(spark, dir)) === Set(
      Seq[Any](1L, 3L, 1L, r6(2.0 * 1 / 3), r6(2.0 * 1 / 11), p0),
      Seq[Any](2L, 1L, 2L, 6.0, r6(3.0 * 2 / 11), p0),
      Seq[Any](3L, 2L, 0L, 0.0, 0.0, p0)))
  }

  test("heaps_law: globally-unique tokens make V = N exactly — the fit " +
      "reads beta 1, k 1, r2 1 on however many deciles are hit") {
    // every doc contributes 3 tokens never seen elsewhere, so every
    // nested prefix has vocab == tokens regardless of which hash
    // deciles the docs land in
    val dir = fixtureDir(docs = (1L to 12L).map(i =>
      doc(i, s"w${i}a w${i}b w${i}c")))
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${graft.operators.Curation.SampleSeed}".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
      math.floor(u * 10).toInt
    }
    val nb = (1L to 12L).map(bucket).distinct.size.toLong
    assert(nb >= 2) // the fixture must actually produce a fit
    assert(rows(CorpusStats.heapsLaw(spark, dir)) === Set(
      Seq[Any](nb, 1.0, 0.0, 1.0, 1.0)))
  }

  test("oov_rate: the 1001st type falls out of the closed vocabulary — " +
      "frequency outranks lexicographic order, mass and types split") {
    // 1030 singleton types t0001..t1030 + "zzz"×50: vocab(1000) =
    // zzz + t0001..t0999; OOV = t1000..t1030 (31 singletons, all in B)
    def toks(lo: Int, hi: Int) =
      (lo to hi).map(i => f"t$i%04d").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      doc(1, toks(1, 515), "A"),
      doc(2, toks(516, 1030) + " " + Seq.fill(50)("zzz").mkString(" "),
        "B")))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(CorpusStats.oovRate(spark, dir)) === Set(
      Seq[Any]("A", 515L, 0L, 0.0, 515L, 0L, 0.0),
      Seq[Any]("B", 565L, 31L, r6(31.0 / 565), 516L, 31L,
        r6(31.0 / 516))))
  }

  test("vocab_coverage: frequency outranks the alphabet at the K=100 " +
      "cut; exhausted cuts saturate at full coverage") {
    // "zzz"×10 + 150 singletons: vocab 151, mass 160. K=100 takes zzz
    // + t001..t099 -> mass 109; K>=151 saturates both shares at 1.0
    val toks = (1 to 150).map(i => f"t$i%03d").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      doc(1, Seq.fill(10)("zzz").mkString(" ")), doc(2, toks)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(CorpusStats.vocabCoverage(spark, dir)) === Set(
      Seq[Any](100, 100L, r6(109.0 / 160), r6(100.0 / 151)),
      Seq[Any](1000, 151L, 1.0, 1.0),
      Seq[Any](10000, 151L, 1.0, 1.0)))
  }

  test("coverage_pick: the smallest arm past the 0.95 mass target wins " +
      "over the saturated larger ones") {
    val toks = (1 to 150).map(i => f"t$i%03d").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      doc(1, Seq.fill(10)("zzz").mkString(" ")), doc(2, toks)))
    // arms: k=100 covers 109/160 (< .95), k=1000 and 10000 saturate at
    // 1.0 — met picks the smallest met k
    assert(rows(CorpusStats.coveragePick(spark, dir)) === Set(
      Seq[Any](1000, 151L, 1.0, 1.0, true)))
  }

  test("source_lang_assoc: a symmetric 2x2 tilt reads the hand chi2 " +
      "and V = 0.5") {
    // A: 3 en + 1 fr; B: 1 en + 3 fr -> every e = 2, chi2 = 4*(1/2)
    val dir = fixtureDir(docs =
      (1 to 3).map(i => Doc(i, s"a$i", "en", "A", 2)) ++
        Seq(Doc(4, "a4", "fr", "A", 2), Doc(5, "a5", "en", "B", 2)) ++
        (6 to 8).map(i => Doc(i, s"a$i", "fr", "B", 2)))
    assert(rows(CorpusStats.sourceLangAssoc(spark, dir)) === Set(
      Seq[Any](8L, 2L, 2L, 2.0, 0.5)))
  }

  test("token_gini: the grouped-rank identity reads the hand Lorenz " +
      "sum on a 3-type corpus") {
    // counts 4,1,1: s = 6, classes (1,c=2,k=0),(4,c=1,k=2) ->
    // t2 = 1*(0+6) + 4*(4+2) = 30; gini = (30 - 4*6)/(3*6) = 1/3
    val dir = fixtureDir(docs = Seq(doc(1, "a a a a b c")))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(CorpusStats.tokenGini(spark, dir)) === Set(
      Seq[Any](3L, 6L, r6(1.0 / 3))))
  }

  test("hill_tail: a six-type corpus uses all head terms above the " +
      "min; alpha matches the hand ln-ratio sum") {
    // counts 16,8,4,2,2,1 -> xmin = 1, k = 5 terms
    val text = Seq.fill(16)("a") ++ Seq.fill(8)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(2)("d") ++ Seq.fill(2)("e") ++ Seq("f")
    val dir = fixtureDir(docs = Seq(doc(1, text.mkString(" "))))
    val st6 = Seq(16.0, 8.0, 4.0, 2.0, 2.0)
      .map(c => math.floor(math.log(c / 1.0) * 1e6 + 0.5).toLong).sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val a = 5.0 / (st6.toDouble / 1e6)
    assert(rows(CorpusStats.hillTail(spark, dir)) === Set(
      Seq[Any](5L, 1L, r6(a), r6(a / math.sqrt(5.0)))))
  }
}
