package graft

import graft.operators.TextAnalysis

/** Discriminative coverage for the text-analysis family: crafted
  * multilingual sentences for lang_id, hand-computed quality metrics,
  * token budgets, and winnowing edge cases.
  */
class TextAnalysisSpec extends SparkSpecBase {

  test("lang_id: stopword evidence picks the language, no evidence -> und") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "the cat and the dog is on a mat"),
      doc(1, "der hund und die katze ist nicht da"),
      doc(2, "el perro y la casa es en un lugar"),
      doc(3, "le chat est dans une maison pour toi"),
      doc(4, "zzz qqq xxx")))
    val out = TextAnalysis.langId(spark, dir).select("doc_id", "lang_pred")
    assert(rows(out) === Set(
      Seq(0L, "en"), Seq(1L, "de"), Seq(2L, "es"), Seq(3L, "fr"),
      Seq(4L, "und")))
  }

  test("quality_score: hand-computed metrics") {
    val dir = fixtureDir(docs = Seq(doc(0, "the cat sat")))
    val r = TextAnalysis.qualityScore(spark, dir).head()
    assert(r.getAs[Int]("n_words") === 3)
    assert(r.getAs[Double]("avg_word_len") === 3.0)
    assert(r.getAs[Double]("stopword_ratio") === 0.3333)
    assert(r.getAs[Double]("punct_ratio") === 0.0)
    // 0.4*min(1, 3/100) + 0.3*(1/3) + 0.3*1 = 0.412
    assert(r.getAs[Double]("score") === 0.412)
  }

  test("token_count: whitespace vs regex vs chars/4 budgets") {
    val dir = fixtureDir(docs = Seq(doc(0, "hello, world 42")))
    val r = TextAnalysis.tokenCount(spark, dir).head()
    assert(r.getAs[Int]("ws_tokens") === 3)
    assert(r.getAs[Int]("re_tokens") === 4) // hello , world 42
    assert(r.getAs[Int]("est_bpe") === 4)   // ceil(15/4)
  }

  test("pii_scrub: emails, IPs, phones redacted in order, counted") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "mail a.b+c@example.org or call 555-123-4567 from 10.0.0.1"),
      doc(1, "no pii here at all")))
    val out = TextAnalysis.piiScrub(spark, dir)
      .select("doc_id", "scrubbed", "n_emails", "n_ips", "n_phones")
    assert(rows(out) === Set(
      Seq(0L, "mail <EMAIL> or call <PHONE> from <IP>", 1, 1, 1),
      Seq(1L, "no pii here at all", 0, 0, 0)))
  }

  test("repetition_score: duplicate line and 2-gram fractions") {
    val dir = fixtureDir(docs = Seq(
      // 3 non-empty lines, one duplicated -> dup_line_frac = 1 - 2/3;
      // tokens split on spaces only, so the newlines glue 4 tokens ->
      // 3 distinct 2-grams
      doc(0, "same line\nsame line\nother line"),
      // "a b a b a" -> 2-grams [a b, b a, a b, b a] -> 1 - 2/4 = 0.5
      doc(1, "a b a b a"),
      doc(2, "one")))  // single token: no 2-grams, one line
    val out = TextAnalysis.repetitionScore(spark, dir)
      .select("doc_id", "n_lines", "dup_line_frac", "n_2grams",
        "dup_2gram_frac")
    assert(rows(out) === Set(
      Seq(0L, 3, 0.3333, 3, 0.0),
      Seq(1L, 1, 0.0, 4, 0.5),
      Seq(2L, 1, 0.0, 0, 0.0)))
  }

  test("doc_fingerprint: winnowing minimum count and determinism") {
    val six = "w1 w2 w3 w4 w5 w6"
    val dir = fixtureDir(docs = Seq(
      doc(0, six),              // 4 shingles -> exactly 1 winnowed window
      doc(1, six),              // identical -> identical fingerprint
      doc(2, "a b c d e")))     // 3 shingles -> no full window, no rows
    val out = TextAnalysis.docFingerprint(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length === 2)
    val byDoc = out.toMap
    assert(byDoc.keySet === Set(0L, 1L))
    assert(byDoc(0L) === byDoc(1L))
  }

  test("winnow_overlap: pair counts match brute force over the fp set") {
    val common = (1 to 12).map(i => s"c$i").mkString(" ")
    val dir = fixtureDir(docs = Seq(
      doc(0, common),
      doc(1, common + " x1 x2 x3"),          // shares doc 0's windows
      doc(2, (1 to 12).map(i => s"z$i").mkString(" ")), // disjoint
      doc(3, "a b c d e")))                  // too short: no fingerprints
    val fps = TextAnalysis.docFingerprint(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // brute-force expectation: drop fps outside [2, cap] docs, count
    // pairs, keep >= WinnowMinShared, containment vs the smaller set
    val byFp: Map[String, Seq[Long]] =
      fps.toSeq.groupBy(_._2).map { case (fp, xs) => fp -> xs.map(_._1).sorted }
    val sizes: Map[Long, Int] =
      fps.toSeq.groupBy(_._1).map { case (d, xs) => d -> xs.length }
    val expected = byFp.toSeq
      .filter { case (_, ds) =>
        ds.length >= 2 && ds.length <= TextAnalysis.WinnowHotCap }
      .flatMap { case (_, ds) => for (a <- ds; b <- ds if a < b) yield (a, b) }
      .groupBy(identity).map { case (p, xs) => p -> xs.length }
      .filter(_._2 >= TextAnalysis.WinnowMinShared)
      .map { case ((a, b), n) =>
        val cont = math.floor(
          n.toDouble / math.min(sizes(a), sizes(b)) * 10000 + 0.5) / 10000
        Seq[Any](a, b, n, sizes(a), sizes(b), cont)
      }.toSet
    val out = TextAnalysis.winnowOverlap(spark, dir)
    assert(rows(out) === expected)
    // the overlapping pair is exactly (0, 1); doc 2 pairs with no one
    assert(expected.map(r => (r(0), r(1))) === Set((0L, 1L)))
  }

  test("toxicity_screen: short-circuit, threshold, lexicon density") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "hate kill crash"),                  // 3 words: short-circuit
      doc(1, "hate kill crash broken slow"),      // 5 hits / 5 words -> 1.0
      doc(2, "the cat sat on the mat calmly"),    // 0 hits
      doc(3, "hate kill it and more words here"), // 2*10/7 capped at 1.0
      // 1 hit / 20 words -> 10/20 = 0.5: scored but under the threshold
      doc(4, "hate " + (1 to 19).map(i => s"w$i").mkString(" "))))
    val out = TextAnalysis.toxicityScreen(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_words"), r.getAs[Int]("toxic_hits"),
          r.getAs[Double]("toxic_score"), r.getAs[Boolean]("is_toxic"))))
      .toMap
    // reference short-circuit (text_generator.py:274): <5 words is never
    // toxic and is not scored
    assert(out(0L) === ((3, 3, 0.0, false)))
    assert(out(1L) === ((5, 5, 1.0, true)))
    assert(out(2L) === ((7, 0, 0.0, false)))
    assert(out(3L) === ((7, 2, 1.0, true)))
    assert(out(4L) === ((20, 1, 0.5, false)))
  }

  test("lang_confusion: off-diagonal mass surfaces, rates per declared lang") {
    // two declared-en docs: one english, one german text (mislabel);
    // one declared-de doc with no evidence -> und
    val dir = fixtureDir(docs = Seq(
      Doc(0, "the cat and the dog is on a mat", "en", "s0", 10),
      Doc(1, "der hund und die katze ist nicht da", "en", "s0", 10),
      Doc(2, "zzz qqq xxx", "de", "s0", 5)))
    assert(rows(TextAnalysis.langConfusion(spark, dir)) === Set(
      Seq("en", "en", 1L, 0.5),
      Seq("en", "de", 1L, 0.5),
      Seq("de", "und", 1L, 1.0)))
  }

  test("readability: FK grade with sentence and zero-vowel-word clamps") {
    val dir = fixtureDir(docs = Seq(
      doc(1, "The cat sat. It ran fast!"), // 6 words, 2 sentences, 6 syl
      doc(2, "tv hmm.")))                  // both words clamp to 1 syllable
    def fk(w: Int, s: Int, sy: Int): Double =
      math.floor((0.39 * (w.toDouble / s) + 11.8 * (sy.toDouble / w)
        - 15.59) * 10000 + 0.5) / 10000
    assert(rows(TextAnalysis.readability(spark, dir)) === Set(
      Seq(1L, 6, 2, 6L, fk(6, 2, 6)),
      Seq(2L, 2, 1, 2L, fk(2, 1, 2))))
  }

  test("langid_f1: per-label harmonic F1 and the exact macro row") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // en: two stopworded docs predict en, one opaque doc -> 'und'
    // (recall 2/3); de: one stopworded doc predicts de (perfect)
    val dir = fixtureDir(docs = Seq(
      doc(1, "the a cat"), doc(2, "a the dog"), doc(3, "zzz qqq"),
      Doc(4, "der und hund", "de", "s0", 12)))
    val out = rows(TextAnalysis.langidF1(spark, dir))
    assert(out === Set(
      Seq("de", 1L, 1L, 1L, 1.0, 1.0, 1.0),
      Seq("en", 2L, 3L, 2L, 1.0, r4(2.0 / 3), r4(4.0 / 5)),
      // macro: means of the 4dp metrics; (6667+10000)/2 rounds to 8334
      Seq("__macro__", 3L, 4L, 3L, 1.0, 0.8334, 0.9)))
  }

  test("char_entropy: uniform and single-symbol docs land in the hand " +
      "bins; histogram groups per source") {
    import graft.operators.TextAnalysis
    // 'abcd': n=4 uniform -> H = ln 4; 'aaaa': one symbol -> H = 0;
    // 'aab': H = ln 3 - (2 ln 2)/3 via the 6dp term path
    val dir = fixtureDir(docs = Seq(
      doc(1, "abcd", "s0"), doc(2, "aaaa", "s0"), doc(3, "aab", "s1")))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def bin(h: Double): Long =
      math.floor(r6(h) / TextAnalysis.CharEntBin).toLong
    val h1 = math.log(4.0) // terms c=1: r6(1*ln 1) = 0 each
    // engine: stl = r6u(2 ln 2) + r6u(1 ln 1); H = ln3 - stl/1e6/3
    val stl3 = math.floor(2.0 * math.log(2.0) * 1e6 + 0.5).toLong
    val h3e = math.log(3.0) - (stl3.toDouble / 1e6) / 3
    val expected = Set(
      Seq[Any]("s0", bin(h1), bin(h1) * 0.25, 1L),
      Seq[Any]("s0", 0L, 0.0, 1L),
      Seq[Any]("s1", bin(h3e), bin(h3e) * 0.25, 1L))
    assert(rows(TextAnalysis.charEntropy(spark, dir)) === expected)
  }
}
