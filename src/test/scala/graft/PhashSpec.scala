package graft

import graft.operators.Multimodal

/** phash_dedup against an independent in-JVM aHash reference, plus the
  * motivating invariance case: a global monotone "brightness" shift
  * changes every byte (mediaDedup's md5 misses it) but not one bit of
  * the average hash.
  */
class PhashSpec extends SparkSpecBase {

  /** Reference aHash halves over ASCII text — direct transcription of
    * the definition, no shared code with either engine.
    */
  private def refSig(s: String): (Long, Long) = {
    val n = s.length.toLong
    val px = (0 until 64).map(k => s.charAt(((k * n) / 64).toInt).toLong)
    val sum = px.sum
    var h1 = 0L; var h2 = 0L
    for (k <- 0 until 64; if px(k) * 64 > sum) {
      if (k < 32) h1 |= 1L << (31 - k) else h2 |= 1L << (63 - k)
    }
    (h1, h2)
  }

  private def bands(h: (Long, Long)): Seq[Long] =
    Seq(h._1 >> 16 & 0xFFFF, h._1 & 0xFFFF, h._2 >> 16 & 0xFFFF,
      h._2 & 0xFFFF)

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  private def noise(seed: Long, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("brightness shift: md5 dedup misses it, phash pairs it at " +
      "Hamming 0") {
    val t = noise(11, 300)
    val shifted = t.map(c => (c + 1).toChar) // +1 every "pixel"
    val dir = fixtureDir(docs = Seq(
      doc(1, t), doc(2, shifted), doc(3, noise(99, 280))))
    // byte-identity dedup sees three distinct assets
    assert(!rows(Multimodal.mediaDedup(spark, dir))
      .exists(_(5) == true)) // no is_dup anywhere
    val out = Multimodal.phashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.get((1L, 2L)) === Some(0),
      "the shifted copy must pair at Hamming 0")
  }

  test("phash_dedup equals the in-JVM reference (signature, banding, " +
      "verify) on a mixed corpus") {
    val corpus = (1L to 12L).map(i => i -> noise(i * 7, 200 + i.toInt * 9))
    val dir = fixtureDir(docs = corpus.map { case (id, s) => doc(id, s) })
    val sig = corpus.map { case (id, s) => id -> refSig(s) }.toMap
    val expect = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      if bands(sig(a)).zip(bands(sig(b))).exists { case (x, y) => x == y }
      h = hamming(sig(a), sig(b)) if h <= Multimodal.PhashMaxHamming
    } yield Seq[Any](a, b, h)).toSet
    assert(rows(Multimodal.phashDedup(spark, dir)) === expect)
  }
}
