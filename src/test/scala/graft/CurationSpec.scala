package graft

import graft.operators.Curation

/** quality_filter rule scenarios: one doc per failure mode, one that
  * passes everything, one multi-failure doc (reasons must list every
  * failed rule in fixed order).
  */
class CurationSpec extends SparkSpecBase {

  private val good = "the quick brown fox jumps over a lazy dog and then " +
    "it runs to the old mill near a river bank today" // 22 varied words
  private val toxic = "the kill hate crash broken day was fine and it " +
    "kept on going to the end of this long test" // 20 words, 4 toxic hits

  private def dir() = fixtureDir(docs = Seq(
    doc(0, good),
    doc(1, "the cat sat"), // 3 words -> too_short
    doc(2, Seq.fill(20)("the cat").mkString(" ")), // 40 words, 2 distinct bigrams
    doc(3, (1 to 25).map(i => s"w$i").mkString(" ")), // no stopwords
    doc(4, toxic),
    doc(5, "kill hate kill hate"))) // short + repetitive + no stopwords

  test("quality_filter: each rule fires alone; reasons in fixed order") {
    val out = Curation.qualityFilter(spark, dir()).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(5), r.getString(6))).toMap
    assert(out(0L) === ((true, "")))
    assert(out(1L) === ((false, "too_short")))
    assert(out(2L) === ((false, "repetitive")))
    assert(out(3L) === ((false, "low_stopword")))
    assert(out(4L) === ((false, "toxic")))
    // n=4 < toxicMinWords: the toxic rule cannot fire, the others all do
    assert(out(5L) === ((false, "too_short;repetitive;low_stopword")))
  }

  test("quality_filter: zero-word docs get ratio 0, not NaN") {
    val out = Curation.qualityFilter(spark,
      fixtureDir(docs = Seq(doc(9, "   ")))).collect().head
    assert(out.getInt(1) === 0)
    assert(out.getDouble(2) === 0.0) // stopword_ratio: guarded 0/0
    assert(!out.getBoolean(5) &&
      out.getString(6) === "too_short;low_stopword")
  }

  test("quality_filter: signals are the shared 4dp-rounded values") {
    val out = Curation.qualityFilter(spark, dir()).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n2, _, dup2, _) = out(2L)
    assert(n2 === 40)
    // 39 bigrams, 2 distinct -> floor((1 - 2/39)*1e4 + .5)/1e4
    assert(dup2 === math.floor((1.0 - 2.0 / 39) * 10000 + 0.5) / 10000)
    val (n4, _, _, tox4) = out(4L)
    assert(n4 === 20)
    assert(tox4 === 1.0) // min(1, 4*10/20) capped
  }

  test("curate_corpus: first failing stage recorded; survivors carry copies") {
    val base = "the alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey" // 24 words, 1 stopword
    val alt = "and nebula quartz marble cobalt amber fjord garnet harbor " +
      "island jungle kelp lantern meadow nectar orchid prairie quarry " +
      "raven saddle timber urchin velvet zulu yankee xray" // 26, no overlap
    val dirc = fixtureDir(docs = Seq(
      doc(1, base),
      doc(2, base),                                     // exact twin of 1
      doc(3, "tiny text"),                              // fails quality
      doc(4, base.split(' ').init.mkString(" ") + " xylophone"), // near 1
      doc(7, "zulu yankee xray walrus vulture"),        // the bench slice
      doc(8, alt)))                     // clean but shares a 3-gram with 7
    def hashU(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${Curation.SampleSeed}".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    // all-en corpus -> sample_factor 0.5: doc 1's survival is the hash coin
    val (s1, c1) = if (hashU(1) < 0.5) ("kept", 1L) else ("sampled_out", 0L)
    assert(rows(Curation.curateCorpus(spark, dirc)) === Set(
      Seq(1L, s1, c1),
      Seq(2L, "exact_dup", 0L),
      Seq(3L, "quality", 0L),
      Seq(4L, "near_dup", 0L),
      Seq(7L, "quality", 0L),   // 5 words; the eval slice flows through
      Seq(8L, "contaminated", 0L)))
  }

  test("curation_funnel: the waterfall reconciles with the manifest and " +
      "the token scan; absent stages keep zero rows") {
    import org.apache.spark.sql.functions._
    val base = "the alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey"
    val dirc = fixtureDir(docs = Seq(
      doc(1, base), doc(2, base), doc(3, "tiny text"),
      doc(4, base.split(' ').init.mkString(" ") + " xylophone")))
    val manifest = Curation.curateCorpus(spark, dirc).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toksPerDoc = graft.operators.TextAnalysis.tokenCount(spark, dirc)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byStage = manifest.groupBy(_._2)
    val totalDocs = manifest.length.toLong
    val out = Curation.curationFunnel(spark, dirc).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.map(_._2).toSeq ===
      Curation.FunnelStages.map(_._2)) // full grid, funnel order
    var remaining = totalDocs
    out.foreach { case (_, stage, nDocs, nToks, dRem, _, share) =>
      val expDocs = byStage.get(stage).map(_.length.toLong).getOrElse(0L)
      val expToks = byStage.get(stage)
        .map(_.map(p => toksPerDoc(p._1)).sum).getOrElse(0L)
      assert(nDocs === expDocs, s"stage $stage docs")
      assert(nToks === expToks, s"stage $stage tokens")
      if (stage != "kept") remaining -= nDocs
      assert(dRem === remaining, s"stage $stage remaining")
      assert(share ===
        math.floor(remaining.toDouble / totalDocs * 1e4 + 0.5) / 1e4)
    }
  }

  test("epoch_plan: allocation, epochs and effective tokens match the " +
      "mirrored formulas") {
    import graft.operators.CorpusStats
    val dirc = fixtureDir(docs = Seq(
      doc(1, "a b c d e f g h", "s0"), doc(2, "i j k l", "s0"),
      doc(3, "m n o p q r", "s1")))
    // tokens: s0 = 12, s1 = 6, total 18
    val w = CorpusStats.mixTemperature(spark, dirc).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val out = CorpusStats.epochPlan(spark, dirc).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6))))
      .toMap
    val budget = 18L * CorpusStats.EpochBudgetFactor
    for ((src, u) <- Seq("s0" -> 12L, "s1" -> 6L)) {
      val (nTok, tw, alloc, epochs, eff, util) = out(src)
      assert(nTok === u)
      assert(tw === w(src))
      assert(alloc === math.floor(tw * budget.toDouble + 0.5).toLong)
      assert(epochs ===
        math.floor(alloc.toDouble / u * 1e4 + 0.5) / 1e4)
      val r = CorpusStats.EpochRStar
      assert(eff === math.floor(
        u.toDouble * r * (1.0 - math.exp(-epochs / r)) + 0.5).toLong)
      assert(util ===
        math.floor(eff.toDouble / alloc * 1e4 + 0.5) / 1e4)
      // repeats past ~R* epochs buy less than they cost
      if (epochs > r) assert(util < 1.0)
    }
  }

  test("shuffle_assign: seeded md5 permutation, dense positions per shard") {
    val docs = (0 until 40).map(i => doc(i.toLong, s"text number $i"))
    val d = fixtureDir(docs = docs)
    // independent expectation: the same md5 arithmetic in plain Java
    def hkey(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${Curation.ShuffleSeed}".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val expected = docs.map(_.doc_id).map(id => (id, hkey(id)))
      .groupBy { case (_, h) => h % Curation.ShuffleShards }
      .flatMap { case (shard, members) =>
        members.sortBy { case (id, h) => (h, id) }.zipWithIndex.map {
          case ((id, h), i) => Seq[Any](id, shard.toInt, i + 1, h)
        }
      }.toSet
    val out = rows(Curation.shuffleAssign(spark, d))
    assert(out === expected)
    // deterministic replay
    assert(rows(Curation.shuffleAssign(spark, d)) === out)
  }

  test("export_manifest: mixed copies, per-copy keys, shuffled offsets") {
    // the applyMix fixture: en factor 0.833333, de 0.375 — every doc
    // gets 0 or 1 copies by the sample hash, so the manifest is the
    // kept subset with per-copy shuffle placement and running offsets
    val docs = Seq(
      Doc(1, "a b c d", "en", "s0", 7),
      Doc(2, "e f", "en", "s0", 3),
      Doc(3, "w x y z", "de", "s0", 7))
    val d = fixtureDir(docs = docs)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hashU(id: Long): Double = java.lang.Long.parseLong(
      md5hex(s"$id:${Curation.SampleSeed}").substring(0, 8), 16) / 4294967296.0
    def hkey(id: Long, ci: Int): Long = java.lang.Long.parseLong(
      md5hex(s"$id:$ci:${Curation.ShuffleSeed}").substring(0, 15), 16)
    val factor = Map(1L -> 0.833333, 2L -> 0.833333, 3L -> 0.375)
    val toks = Map(1L -> 4L, 2L -> 2L, 3L -> 4L)
    val kept = docs.map(_.doc_id).filter(id => hashU(id) < factor(id))
    assert(kept.nonEmpty && kept.size < 3) // both outcomes exercised
    val expected = kept.map(id => (id, 0, hkey(id, 0)))
      .groupBy { case (_, _, h) => (h % Curation.ShuffleShards).toInt }
      .flatMap { case (shard, members) =>
        val ord = members.sortBy { case (id, ci, h) => (h, id, ci) }
        val offs = ord.scanLeft(0L) { case (acc, (id, _, _)) =>
          acc + toks(id) }
        ord.zipWithIndex.map { case ((id, ci, _), i) =>
          Seq[Any](id, ci, shard, i + 1, toks(id), offs(i),
            offs(i) / Curation.PackBudget)
        }
      }.toSet
    assert(rows(Curation.exportManifest(spark, d)) === expected)
  }

  test("pack_stats: bins, fill, and boundary straddles from known tokens") {
    // one shard (ids ≡ 0 mod 8): 3 docs of 400/200/100 tokens under
    // budget 512 → offsets 0/400/600; the 200-token doc straddles the
    // 512 boundary (bins 0→1), the others do not; total 700 → 2 bins.
    assert(Curation.PackBudget === 512)
    val d = fixtureDir(docs = Seq(
      doc(0, Seq.fill(400)("w").mkString(" ")),
      doc(8, Seq.fill(200)("x").mkString(" ")),
      doc(16, Seq.fill(100)("y").mkString(" "))))
    val out = Curation.packStats(spark, d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(0) === 0) // shard
    assert(r.getLong(1) === 3L) // n_docs
    assert(r.getLong(2) === 700L) // total_tokens
    assert(r.getLong(3) === 2L) // n_bins
    assert(r.getLong(4) === 1L) // straddle_docs (the 400..599 doc)
    assert(r.getDouble(5) === 0.3333) // 1/3 at 4dp
    assert(r.getDouble(6) === 0.6836) // 700/1024 at 4dp
  }

  test("data_split: deterministic full-coverage three-way assignment") {
    val dir = "/root/testdata/sf0.001"
    val out = Curation.dataSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    // one row per doc, every doc assigned exactly one split
    assert(out.length.toLong === nDocs)
    assert(out.map(_._1).distinct.length.toLong === nDocs)
    assert(out.map(_._2).toSet.subsetOf(Set("train", "valid", "test")))
    // the 90/5/5 thresholds hold within binomial noise at n=500
    val n = out.length.toDouble
    val trainFrac = out.count(_._2 == "train") / n
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    assert(out.exists(_._2 == "valid") && out.exists(_._2 == "test"))
    // reproducible: a second run assigns identically
    val again = Curation.dataSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(again.toSeq === out.toSeq)
  }

  test("gate_eval: heuristic arm's confusion matrix recomputed by hand " +
      "over the held-out labeled set") {
    val dir = "/root/testdata/sf0.001"
    val keep = Curation.qualityFilter(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val held = Curation.dataSplit(spark, dir).collect()
      .filter(_.getAs[String]("split") != "train")
      .map(_.getAs[Long]("doc_id")).toSet
    val lbl = graft.operators.CorpusStats.ccnetBuckets(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      .filter(_._2 != "middle")
    val joint = lbl.keys.filter(id => keep.contains(id) && held(id)).toSeq
    val tp = joint.count(id => keep(id) && lbl(id) == "head").toLong
    val fp = joint.count(id => keep(id) && lbl(id) != "head").toLong
    val fn = joint.count(id => !keep(id) && lbl(id) == "head").toLong
    val tn = joint.count(id => !keep(id) && lbl(id) != "head").toLong
    val out = Curation.gateEval(spark, dir).collect()
      .find(_.getAs[String]("gate") == "heuristic").get
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
      === ((tp, fp, fn, tn)))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    if (tp + fp > 0) assert(out.getDouble(5) === r4(tp.toDouble / (tp + fp)))
    if (tp + fn > 0) assert(out.getDouble(6) === r4(tp.toDouble / (tp + fn)))
    if (2 * tp + fp + fn > 0)
      assert(out.getDouble(7) === r4(2.0 * tp / (2 * tp + fp + fn)))
    assert(tp + fp + fn + tn > 0) // the audit must be non-degenerate
  }

  test("classifier_examples: head/tail labels over the quality features") {
    val dir = "/root/testdata/sf0.001"
    val buckets = graft.operators.CorpusStats.ccnetBuckets(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val out = Curation.classifierExamples(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(6)))
    assert(out.nonEmpty)
    // exactly the non-middle docs, labeled head=1 / tail=0
    assert(out.map(_._1).toSet ===
      buckets.filter(_._2 != "middle").keySet)
    out.foreach { case (id, l) =>
      assert(l === (if (buckets(id) == "head") 1 else 0))
    }
    // both classes must be present or the export trains nothing
    assert(out.exists(_._2 == 1) && out.exists(_._2 == 0))
  }

  test("ccnet_buckets: buckets are contiguous perplexity terciles") {
    val out = graft.operators.CorpusStats
      .ccnetBuckets(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, ds) =>
      def maxP(b: String) = ds.filter(_._3 == b).map(_._2)
      def minP(b: String) = ds.filter(_._3 == b).map(_._2)
      // contiguity: every head ppl <= every middle ppl <= every tail ppl
      for {
        (lo, hi) <- Seq("head" -> "middle", "middle" -> "tail")
        if maxP(lo).nonEmpty && minP(hi).nonEmpty
      } assert(maxP(lo).max <= minP(hi).min,
        s"$lo must not exceed $hi")
      // tercile balance: t1 is the smallest ppl whose cumulative count
      // reaches position (n-1) div 3 + 1, so head (ppl <= t1) must hold
      // at least that many docs
      val n = ds.length
      val heads = ds.count(_._3 == "head")
      assert(heads >= (n - 1) / 3 + 1,
        s"head tercile too small: $heads of $n")
    }
  }

  test("contamination_report: per-bench-doc collision rollup with zeros") {
    // ids 7 and 57 are bench (mod 50 == 7); 1,2,3 are training
    val dir = fixtureDir(docs = Seq(
      doc(7, "a b c d"),    // shingles: "a b c", "b c d"
      doc(57, "m n o p"),   // shingles: "m n o", "n o p" — untouched
      doc(1, "a b c x"),    // hits "a b c"
      doc(2, "b c d y z"),  // hits "b c d"
      doc(3, "q w e r")))   // no collision
    val out = rows(Curation.contaminationReport(spark, dir))
    assert(out === Set(
      Seq(7L, 2L, 2L, 2L, 2L, 1.0),
      Seq(57L, 2L, 0L, 0L, 0L, 0.0)))
  }

  test("sft_export: the manifest agrees with its standalone stages") {
    val dir = fixtureDir(docs = (0L until 12L).map(i =>
      doc(i, s"i feel anxious about topic $i today")))
    val out = Curation.sftExport(spark, dir).collect()
    assert(out.length === 12)
    val split = Curation.dataSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val shuf = Curation.shuffleAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("split") === split(id))
      assert((r.getAs[Int]("shard"), r.getAs[Int]("pos")) === shuf(id))
      assert(r.getAs[String]("instruction")
        .startsWith("You are a therapeutic AI assistant"))
    }
  }

  test("split_leakage: the grid reconciles with the pair set and split map") {
    // 10 near-dup pairs (identical texts within a pair, distinct across)
    val docs = (0L until 20L).map { i =>
      val fam = i / 2
      doc(i, s"the quick brown fox $fam jumps over the lazy dog $fam " +
        s"and keeps running forever $fam")
    }
    val dir = fixtureDir(docs = docs)
    val out = Curation.splitLeakage(spark, dir).collect()
    val split = Curation.dataSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = graft.operators.Dedup.dedupPairs(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val links = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val want = links.groupBy { case (u, v) => (split(u), split(v)) }
      .map { case ((su, sv), ls) =>
        (su, sv, ls.map(_._1).distinct.length.toLong, ls.length.toLong) }
      .toSet
    assert(out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSet === want)
  }

  test("decontam_sweep: collisions collapse as n grows; n=3 reconciles " +
      "with decontaminate") {
    // bench doc 7 = 14 tokens; train doc 1 = verbatim copy (collides at
    // every n); train doc 2 shares only the 3-gram "a b c"; doc 3 clean
    val t14 = "a b c d e f g h i j k l m n"
    val dir = fixtureDir(docs = Seq(
      doc(7, t14), doc(1, t14),
      doc(2, "a b c z9 z8 z7 z6 z5"), doc(3, "q w e r t y u i")))
    val out = Curation.decontamSweep(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // n=3: 12 eval grams; doc1 hits all 12, doc2 hits 1 -> 13 collisions
    assert(out(3) === ((2L, 1L, 13L, 12L)))
    // n=8: 7 eval grams; only the verbatim copy collides
    assert(out(8) === ((1L, 1L, 7L, 7L)))
    // n=13: 2 eval grams; only the verbatim copy collides
    assert(out(13) === ((1L, 1L, 2L, 2L)))
    // the n=3 arm IS decontaminate: per-doc hits sum to its collisions
    val d = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 12L, 2L -> 1L))
  }

  test("bloom_decontaminate: hand-built filter, one-sided positives") {
    // bench doc 7: shingles "a b c","b c d"; train doc 1 shares "a b c"
    val dir = fixtureDir(docs = Seq(
      doc(7, "a b c d"), doc(1, "a b c x"), doc(2, "q w e r")))
    val r = Curation.bloomDecontaminate(spark, dir).collect().head
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bit(i: Int, g: String): Long =
      java.lang.Long.parseLong(md5hex(s"$i:$g").take(15), 16) %
        Curation.BloomBits
    val expectBits = (for {
      g <- Seq("a b c", "b c d"); i <- 0 until Curation.BloomHashes
    } yield bit(i, g)).distinct.size.toLong
    assert(r.getAs[Long]("n_bench_shingles") === 2L)
    assert(r.getAs[Long]("bits_set") === expectBits)
    assert(r.getAs[Long]("n_true") === 1L)
    assert(r.getAs[Long]("n_bloom_pos") >= r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("n_false_pos") ===
      r.getAs[Long]("n_bloom_pos") - r.getAs[Long]("n_true"))
  }

  test("label_queue: the median-score doc queues first with margin 0") {
    // three docs with clearly distinct quality scores; the p50 doc has
    // margin 0 and must head its language's queue
    val dir = fixtureDir(docs = Seq(
      doc(1, "the a and of to in is you that it for on"),
      doc(2, "word another thing entirely no stops here at all"),
      doc(3, "the cat sat on a mat with it")))
    val p50 = graft.operators.CorpusStats.qualityThresholds(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Double]("p50")).toMap
    val out = graft.operators.Curation.labelQueue(spark, dir).collect()
    assert(out.length === 3) // all docs fit under the per-lang K
    val first = out.filter(_.getAs[Int]("rank") == 1)
    assert(first.length === 1)
    assert(first.head.getAs[Double]("score") === p50("en"))
    assert(first.head.getAs[Double]("margin") === 0.0)
    // queue order is by ascending margin
    val sorted = out.sortBy(_.getAs[Int]("rank"))
    val margins = sorted.map(_.getAs[Double]("margin"))
    assert(margins === margins.sorted)
  }

  test("curriculum_order: kept docs phase by ppl bucket, hash-ordered within") {
    // two identical clean 21-word docs (pass the gate, lowest ppl ->
    // head) and two 5-word once-seen-bigram docs (too_short -> dropped
    // AND high ppl). Only the kept pair survives, both in phase 0, at
    // positions 1/2 ordered by the (doc_id, seed) md5 hash.
    val good = "the " + (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      doc(1, good), doc(2, good),
      doc(3, "u1 u2 u3 u4 u5"), doc(4, "v1 v2 v3 v4 v5")))
    val out = graft.operators.Curation.curriculumOrder(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    assert(out.forall(_.getAs[String]("bucket") === "head"))
    assert(out.forall(_.getAs[Int]("phase") === 0))
    // within-phase order follows the stratified_sample hash, not doc_id
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${graft.operators.Curation.SampleSeed}"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val expected = Seq(1L, 2L).sortBy(id => (h(id), id))
    assert(out.sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("doc_id")).toSeq === expected)
  }

  test("classifier_train: round-1 step matches the closed-form zero-start " +
      "gradient; trajectory is rounds x features") {
    val d = "/root/testdata/sf0.001"
    val rows = Curation.classifierTrain(spark, d).collect()
    assert(rows.length ===
      Curation.ClfRounds * Curation.ClfFeatureNames.length)
    // From w=0, p = sigmoid(0) = 0.5 exactly for every example, so the
    // first step is closed-form over the train-split examples — an
    // end-to-end pin of the unit arithmetic (features, yu, gradient,
    // floor-rounded step) without trusting the loop itself.
    import org.apache.spark.sql.functions._
    val trainIds = Curation.dataSplit(spark, d)
      .filter(col("split") === "train").select(col("doc_id"))
    val ex = Curation.classifierExamples(spark, d)
      .join(trainIds, Seq("doc_id"), "left_semi")
      .select(col("n_words"), col("avg_word_len"), col("stopword_ratio"),
        col("punct_ratio"), col("label")).collect()
    def units(r: org.apache.spark.sql.Row): Seq[Long] = {
      val nw = r.getInt(0)
      def r6u(x: Double) = math.floor(x * 1000000 + 0.5).toLong
      if (nw <= 0) Seq(1000000L, 0L, 0L, 0L, 0L)
      else Seq(1000000L, math.min(nw, 1000).toLong * 1000,
        r6u(math.min(r.getDouble(1), 10.0) / 10.0),
        r6u(r.getDouble(2)), r6u(r.getDouble(3)))
    }
    val n = ex.length
    val w1 = (0 to 4).map { i =>
      val g = ex.map(r => BigInt(units(r)(i)) *
        (r.getInt(4).toLong * 1000000L - 500000L)).sum
      math.floor(Curation.ClfLr * g.toDouble / n / 1e6 + 0.5) / 1e6
    }
    val got = rows.filter(_.getAs[Int]("round") == 1)
      .map(r => r.getAs[String]("feature") -> r.getAs[Double]("weight"))
      .toMap
    Curation.ClfFeatureNames.zipWithIndex.foreach { case (f, i) =>
      assert(got(f) === w1(i), s"round-1 weight of $f")
    }
  }

  test("classifier_apply: score is the frozen-weight sigmoid; pred is " +
      "the 0.5 threshold") {
    val d = "/root/testdata/sf0.001"
    val out = Curation.classifierApply(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Boolean]("pred") === (s >= 0.5))
    }
  }

  test("gate_eval: two arms over the identical held-out labeled set") {
    val d = "/root/testdata/sf0.001"
    val out = Curation.gateEval(spark, d).collect()
    assert(out.map(_.getAs[String]("gate")).toSeq ===
      Seq("classifier", "heuristic"))
    val totals = out.map(r => (1 to 4).map(r.getLong).sum)
    assert(totals.distinct.length === 1,
      "both gates must be graded on the same eval set")
  }

  test("gate_overlap: arms recomputed driver-side from the three " +
      "decision frames") {
    val d = "/root/testdata/sf0.001"
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val kh = Curation.qualityFilter(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val kc = Curation.classifierApply(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pred")).toMap
    val kd = graft.operators.CorpusStats.dsirSelect(spark, d).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val ids = kh.keySet
    def expect(a: Long => Boolean, b: Long => Boolean) = {
      val na = ids.count(a); val nb = ids.count(b)
      val both = ids.count(i => a(i) && b(i))
      val agree = ids.count(i => a(i) == b(i))
      (na.toLong, nb.toLong, both.toLong,
        r4(both.toDouble / (na + nb - both)),
        r4(agree.toDouble / ids.size))
    }
    val got = Curation.gateOverlap(spark, d).collect()
      .map(r => r.getAs[String]("pair") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_both"), r.getAs[Double]("jaccard"),
          r.getAs[Double]("agree_rate")))).toMap
    assert(got("heuristic~classifier") === expect(kh, kc))
    assert(got("heuristic~dsir") === expect(kh, kd))
    assert(got("classifier~dsir") === expect(kc, kd))
  }

  test("clf_calibration: bins recomputed driver-side from apply + " +
      "examples + split") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val out = Curation.clfCalibration(spark, d).collect()
    assert(out.nonEmpty)
    val ho = Curation.dataSplit(spark, d)
      .filter(col("split") =!= "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lbl = Curation.classifierExamples(spark, d)
      .select("doc_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sc = Curation.classifierApply(spark, d)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(p => ho(p._1) && lbl.contains(p._1))
    assert(sc.nonEmpty)
    val exp = sc.groupBy(p => math.min(math.floor(p._2 * 10).toInt, 9))
      .map { case (b, xs) =>
        val n = xs.length
        val susum = xs.map(p => math.floor(p._2 * 1e6 + 0.5).toLong).sum
        val npos = xs.map(p => lbl(p._1).toLong).sum
        val ms = math.floor(susum.toDouble / n + 0.5) / 1e6
        val pr = math.floor(npos.toDouble / n * 1e4 + 0.5) / 1e4
        b -> ((n.toLong, ms, pr,
          math.floor(math.abs(ms - pr) * 1e4 + 0.5) / 1e4))
      }
    val got = out.map(r => r.getAs[Int]("bin") ->
      ((r.getAs[Long]("n"), r.getAs[Double]("mean_score"),
        r.getAs[Double]("pos_rate"), r.getAs[Double]("gap")))).toMap
    assert(got === exp)
  }

  test("brier_score and pr_curve recomputed driver-side from apply + " +
      "examples + split") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val ho = Curation.dataSplit(spark, d)
      .filter(col("split") =!= "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lbl = Curation.classifierExamples(spark, d)
      .select("doc_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val su = Curation.classifierApply(spark, d)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 1e6 + 0.5).toLong))
      .filter(p => ho(p._1) && lbl.contains(p._1))
    assert(su.nonEmpty)
    // Brier: exact 1e-12-unit squared errors, one division chain
    val sq = su.map { case (id, s) =>
      val e = s - lbl(id).toLong * 1000000L; e * e
    }.sum
    val expBrier =
      math.floor(sq.toDouble / 1e12 / su.length * 1e6 + 0.5) / 1e6
    val b = Curation.brierScore(spark, d).collect().head
    assert(b.getLong(0) === su.length.toLong)
    assert(b.getDouble(1) === expBrier)
    // PR curve: exact integer threshold compare per grid row
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val got = Curation.prCurve(spark, d).collect().map(r =>
      r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got.size === Curation.PrThresholds.size)
    for (tu <- Curation.PrThresholds) {
      val tp = su.count(p => p._2 >= tu && lbl(p._1) == 1).toLong
      val fp = su.count(p => p._2 >= tu && lbl(p._1) == 0).toLong
      val fn = su.count(p => p._2 < tu && lbl(p._1) == 1).toLong
      val prec = if (tp + fp > 0) Some(r4(tp.toDouble / (tp + fp))) else None
      val rec = if (tp + fn > 0) Some(r4(tp.toDouble / (tp + fn))) else None
      val f1 = if (2 * tp + fp + fn > 0)
        Some(r4(2.0 * tp / (2 * tp + fp + fn))) else None
      assert(got(tu / 1e6) === ((tp, fp, fn, prec, rec, f1)), s"t=$tu")
    }
  }

  test("threshold_pick: reproduces the in-spec pick over the pr_curve " +
      "rows (smallest threshold meeting the precision floor)") {
    val d = "/root/testdata/sf0.001"
    val curve = Curation.prCurve(spark, d).collect().map(r =>
      (r.getDouble(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(curve.nonEmpty)
    val meets = curve.filter(_._3.exists(_ >= Curation.GatePrecTarget))
    val pick = if (meets.nonEmpty) meets.minBy(_._1)
      else curve.minBy(c => (2.0 - c._3.getOrElse(-1.0), c._1))
    val got = Curation.thresholdPick(spark, d).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(0) === pick._1)
    assert(got.head.getBoolean(1) === meets.nonEmpty)
    assert(got.head.getDouble(2) === Curation.GatePrecTarget)
    assert(Option(got.head.get(3)).map(_.asInstanceOf[Double]) === pick._3)
    assert(got.head.getLong(6) === pick._2) // tp of the picked row
  }

  test("bottomk_sample / sample_audit: below-k corpus keeps every doc, " +
      "the empty-rest audit is NULL") {
    import graft.operators.Curation
    val docs = (1L to 6L).map(i => doc(i, s"text number $i",
      if (i <= 3) "s0" else "s1"))
    val dir = fixtureDir(docs = docs)
    // 6 docs < SampleK: the hash bound is the corpus max -> all sampled
    assert(Curation.bottomkSample(spark, dir).count() === 6L)
    assert(rows(Curation.sampleAudit(spark, dir)) === Set(
      Seq[Any](6L, 0L, null, null)))
  }

  test("store_coverage: every contract store reconciles; duplicate base " +
      "texts collapse in the hash store, short docs stay out of the band " +
      "store") {
    // base ids 0, 3, 5 (1 is the delta split): 0 and 3 share text (one
    // hash), 5 is too short to shingle (2 words)
    val dir = fixtureDir(
      docs = Seq(doc(0, "alpha beta gamma delta"),
        doc(3, "alpha beta gamma delta"), doc(5, "just two"),
        doc(1, "epsilon zeta eta theta iota")),
      embs = Seq(Emb(0, vec(1.0), 0), Emb(1, vec(0.5, 0.5), 0),
        Emb(2, vec(0.0, 1.0), 1)))
    assert(rows(Curation.storeCoverage(spark, dir)) === Set(
      Seq[Any]("band_store", 2L, 2L, 0L, 0L), // docs 0, 3 (5 too short)
      Seq[Any]("hash_store", 2L, 2L, 0L, 0L), // {0,3} collapse + {5}
      Seq[Any]("bq_codes", 3L, 3L, 0L, 0L),
      Seq[Any]("ivf_lists", 3L, 3L, 0L, 0L)))
  }

  test("arrival_report: every admission stage fires once on the crafted " +
      "shard, and the manifest equals the rules over the stage signals") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // delta split under the md5 hash: ids 1, 2, 4, 17, 42 arrive; the
    // rest (0, 3, 5, 7) are behind the stores; id 7 is the benchmark
    // slot (7 mod 50)
    val s0 = "the quick brown fox jumps over a lazy dog while red sun " +
      "sets behind green hills and birds sing softly tonight"
    val s3 = "a silver river winds slowly through the quiet valley " +
      "where old stone bridges carry weary travelers toward distant " +
      "mountain villages tonight"
    val s5 = "every morning the baker pulls warm crusty loaves from his " +
      "ancient oven filling narrow streets with wonderful smells"
    val s7 = "researchers measured the annual rainfall across coastal " +
      "plains using calibrated gauges mounted on tall weather towers"
    val s17 = "several farmers in the region studied rainfall across " +
      "coastal plains before planting drought resistant grains each " +
      "spring with careful attention daily"
    val s42 = "children gathered near the old harbor watching small " +
      "fishing boats return at dusk with heavy nets full of " +
      "shimmering silver fish"
    val dir = fixtureDir(docs = Seq(
      doc(0, s0), doc(3, s3), doc(5, s5), doc(7, s7), // base + bench
      doc(1, s0), // delta: exact copy of the stored doc 0
      doc(2, s3 + " again"), // delta: near-dup of stored doc 3
      doc(4, "short text here"), // delta: fails the Gopher gate
      doc(17, s17), // delta: shares 'rainfall across coastal plains'
      doc(42, s42))) // delta: clean
    // expected from the stage signals, under the arrival precedence
    val keep = Curation.qualityFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val hashes = Dedup.dedupExact(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val delta = Set(1L, 2L, 4L, 17L, 42L)
    def exactDup(s: Long) = hashes.exists { case (id, h) =>
      h == hashes(s) && (!delta(id) || id < s) }
    val dropIds = Dedup.dedupDelta(spark, dir).collect().map { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      if (r.getString(3) == "delta_base") (if (delta(a)) a else b) else b
    }.toSet
    val cont = Curation.decontaminate(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val expected = delta.map { s =>
      Seq[Any](s,
        if (!keep(s)) "quality"
        else if (exactDup(s)) "exact_dup"
        else if (dropIds(s)) "near_dup"
        else if (cont(s)) "contaminated"
        else "kept")
    }
    assert(rows(Curation.arrivalReport(spark, dir)) === expected)
    // and on this fixture the signals resolve to one doc per stage
    assert(expected === Set[Seq[Any]](
      Seq(1L, "exact_dup"), Seq(2L, "near_dup"), Seq(4L, "quality"),
      Seq(17L, "contaminated"), Seq(42L, "kept")))
    // the funnel over the same shard: one doc per stage, token mass =
    // whitespace counts, remaining walks down to the single kept doc
    val toks = Map(1L -> s0, 2L -> (s3 + " again"), 4L -> "short text here",
      17L -> s17, 42L -> s42)
      .map { case (k, v) =>
        k -> v.split(" ").count(_.nonEmpty).toLong }
    val fun = Curation.arrivalFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6)))
    assert(fun.map(_._2).toSeq === Curation.ArrivalStages.map(_._2))
    val byStage = expected.map(e =>
      e(1).asInstanceOf[String] -> e(0).asInstanceOf[Long]).toMap
    var remaining = 5L
    fun.foreach { case (_, stage, nd, nt, dRem, share) =>
      assert(nd === 1L, s"stage $stage docs")
      assert(nt === toks(byStage(stage)), s"stage $stage tokens")
      if (stage != "kept") remaining -= 1
      assert(dRem === remaining)
      assert(share === math.floor(remaining.toDouble / 5 * 1e4 + 0.5) / 1e4)
    }
  }
}
