package graft

import graft.operators.{Dedup, Similarity}

/** Property-style fuzz of the dedup/ANN stack against INDEPENDENT in-JVM
  * reference computations — breaking the oracle-co-evolution blind spot
  * (the DuckDB mirrors share the builders' constants; this suite shares
  * nothing but the published definitions). Each property runs over three
  * logged seeds with planted near-duplicates and planted nearest
  * neighbors; generation is deterministic per seed, so failures
  * reproduce exactly.
  */
class FuzzDedupAnnSpec extends SparkSpecBase {

  private val seeds = Seq(42L, 1337L, 20260815L)

  // ---- reference shingle Jaccard (transcribed from the definition:
  // distinct lowercase word-3-grams) --------------------------------
  private def shingles(text: String): Set[String] =
    text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      .filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4

  test("fuzz dedup_minhash: planted near-dups found, every reported " +
      "pair verified against reference Jaccard (3 seeds)") {
    for (seed <- seeds) {
      info(s"seed=$seed")
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 300).map(i => s"w$i")
      def randDoc(): String =
        Seq.fill(30 + rnd.nextInt(31))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val base = (1L to 40L).map(i => i -> randDoc()).toMap
      // planted NEAR-duplicates: 1-2 token substitutions in a 30-60
      // token doc; one substitution kills <= 3 of >= 28 shingles, so
      // those pairs stay J >= ~0.8 (the "strong" recall floor below)
      val near = (1L to 10L).map { i =>
        val toks = base(i).split(" ").toArray
        for (_ <- 1L to (1L + i % 2))
          toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.size))
        (100L + i) -> toks.mkString(" ")
      }.toMap
      // planted EXACT duplicates (Jaccard 1.0 - banding catches them
      // with probability 1, so these are the deterministic floor)
      val exact = (1L to 3L).map(i => (200L + i) -> base(i)).toMap
      val corpus = base ++ near ++ exact
      val dir = fixtureDir(docs =
        corpus.toSeq.sortBy(_._1).map { case (id, t) => doc(id, t) })

      val sh = corpus.map { case (id, t) => id -> shingles(t) }
      val truePairs = (for {
        a <- corpus.keys; b <- corpus.keys if a < b
        j = jaccard(sh(a), sh(b)) if j >= Dedup.JaccardThreshold
      } yield (a, b) -> j).toMap

      val got = Dedup.dedupMinhash(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // soundness: every reported pair is a true >= threshold pair with
      // the exactly-rounded reference Jaccard (the verify stage is
      // exact, so NO false positive may survive, whatever the bands do)
      got.foreach { case (p, j) =>
        assert(truePairs.contains(p), s"seed=$seed false positive $p")
        assert(j === r4(truePairs(p)), s"seed=$seed wrong jaccard for $p")
      }
      // recall: exact duplicates are guaranteed; strong near-dups
      // (J >= 0.8: per-band collision >= 0.512, miss < 0.06) must all
      // surface on these pinned seeds
      exact.keys.foreach { dup =>
        assert(got.contains((dup - 200L, dup)),
          s"seed=$seed exact duplicate $dup missed")
      }
      val strong = truePairs.filter(_._2 >= 0.8).keySet
      assert(strong.subsetOf(got.keySet),
        s"seed=$seed strong pairs missed: ${strong.diff(got.keySet)}")
      // the planted set actually exercised the property (3 exact pairs
      // + the 1-substitution plants are >= ~0.8 by construction)
      assert(strong.size >= 6, s"seed=$seed degenerate fixture")
    }
  }

  test("fuzz ann_ivf: planted twin is rank 1; probed top-3 equals " +
      "brute force on separated clusters (3 seeds)") {
    for (seed <- seeds) {
      info(s"seed=$seed")
      val rnd = new scala.util.Random(seed)
      val dim = 64
      // 4 axis-aligned-ish unit centers with small random rotation:
      // cross-cluster cosine ~0, intra ~0.99
      val centers = (0 until 4).map { c =>
        val v = Array.fill(dim)(rnd.nextGaussian() * 0.05f.toDouble)
        v(c * 16) = 1.0
        v
      }
      def noisy(c: Int, eps: Double): Seq[Float] = {
        val b = centers(c)
        b.indices.map(i => (b(i) + rnd.nextGaussian() * eps).toFloat)
      }
      var nextId = 0L
      def freshId(): Long = { // corpus ids must never be query ids
        nextId += 1
        if (nextId % 100 == 0) nextId += 1
        nextId
      }
      val members = for {
        c <- 0 until 4; _ <- 1 to 25
      } yield Emb(freshId(), noisy(c, 0.1), c)
      // one query per cluster (vec_id % 100 == 0) with a planted twin
      val queries = (0 until 4).map { c =>
        val q = Emb((c + 1) * 100L, noisy(c, 0.1), c)
        val twin = Emb(freshId(),
          q.embedding.map(v => (v + rnd.nextGaussian() * 0.001).toFloat), c)
        (q, twin)
      }
      val all = members ++ queries.flatMap { case (q, t) => Seq(q, t) }
      val dir = fixtureDir(embs = all)

      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i)
        }
        d / math.sqrt(na * nb)
      }
      val byId = all.map(e => e.vec_id -> e.embedding).toMap
      def bruteTop3(qid: Long): Seq[Long] =
        byId.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, cos(byId(qid), v)) }
          .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)

      val got = Similarity.annIvf(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      queries.foreach { case (q, twin) =>
        assert(got((q.vec_id, 1)) === twin.vec_id,
          s"seed=$seed planted twin not rank 1 for query ${q.vec_id}")
        val ivf3 = (1 to 3).map(r => got((q.vec_id, r)))
        assert(ivf3 === bruteTop3(q.vec_id),
          s"seed=$seed IVF top-3 != brute force for query ${q.vec_id}")
      }
    }
  }
}
