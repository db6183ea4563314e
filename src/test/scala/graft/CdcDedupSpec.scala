package graft

import graft.operators.Multimodal

/** cdc_dedup against an INDEPENDENT in-JVM reference implementation of
  * the boundary rule, plus the motivating adversarial case: a planted
  * byte-shifted duplicate that the fixed-width baseline (frame_dedup)
  * provably misses and content-defined chunking catches.
  */
class CdcDedupSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference CDC: chunk md5 list of one ASCII payload — a direct
    * transcription of the boundary definition, sharing NO code with
    * the Spark plan.
    */
  private def refChunks(s: String): Seq[String] = {
    val w = Multimodal.CdcWindowBytes
    val n = s.length
    val bnd = (w to n).filter { i =>
      java.lang.Long.parseLong(
        md5hex(s.substring(i - w, i)).substring(0, 8), 16) %
        Multimodal.CdcModulus == 0
    }
    val ends = (bnd :+ n).distinct
    ends.foldLeft((0, Vector.empty[String])) { case ((pe, acc), e) =>
      (e, acc :+ md5hex(s.substring(pe, e)))
    }._2
  }

  /** Expected gated output for a doc corpus: rollup of refChunks. */
  private def refRollup(docs: Seq[(Long, String)]): Set[Seq[Any]] = {
    val perDoc = for {
      (id, text) <- docs if text.nonEmpty
      (md5, c) <- refChunks(text).groupBy(identity).view.mapValues(_.size)
    } yield (md5, id, c.toLong)
    perDoc.groupBy(_._1).collect {
      case (md5, rs) if rs.map(_._2).distinct.size >= 2 =>
        Seq[Any](md5, rs.map(_._2).distinct.size.toLong,
          rs.map(_._3).sum, rs.map(_._2).min)
    }.toSet
  }

  /** Deterministic pseudo-random ASCII (no shared code with either
    * engine's hash: a linear congruence over a 26-letter alphabet).
    */
  private def asciiNoise(seed: Long, len: Int): String = {
    var x = seed
    val sb = new StringBuilder
    for (_ <- 1 to len) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb += ('a' + math.floorMod(x >>> 33, 26).toInt).toChar
    }
    sb.toString
  }

  test("cdc_dedup matches the reference rollup on a mixed corpus") {
    val t = asciiNoise(7, 400)
    val corpus = Seq(
      1L -> t,
      2L -> ("Z" + t), // byte-shifted duplicate
      3L -> asciiNoise(99, 300), // unrelated
      4L -> t, // byte-identical duplicate
      5L -> "tiny") // shorter than the window: one whole-payload chunk
    val dir = fixtureDir(docs = corpus.map { case (id, s) => doc(id, s) })
    assert(rows(Multimodal.cdcDedup(spark, dir)) === refRollup(corpus))
  }

  test("byte-shifted duplicate: frame_dedup finds nothing, cdc_dedup " +
      "recovers the interior chunks") {
    val t = asciiNoise(7, 400)
    val corpus = Seq(1L -> t, 2L -> ("Z" + t))
    val dir = fixtureDir(docs = corpus.map { case (id, s) => doc(id, s) })
    // fixed-width chunking: the 1-byte shift slides every 64-byte
    // window, so NO chunk of doc 2 matches doc 1
    assert(rows(Multimodal.frameDedup(spark, dir)) === Set.empty)
    // content-defined boundaries realign within one window width:
    // every chunk of doc 1 past the first boundary is shared
    val shared = Multimodal.cdcDedup(spark, dir).collect()
    assert(shared.nonEmpty, "CDC must recover interior chunks")
    assert(shared.forall(_.getLong(1) == 2L)) // n_assets
    assert(shared.forall(_.getLong(3) == 1L)) // canonical
    // realignment is near-total: all but the boundary-spanning head
    // chunk of the original recur in the shifted copy
    val c1 = refChunks(t).toSet
    val sharedSet = shared.map(_.getString(0)).toSet
    assert(sharedSet.subsetOf(c1 union refChunks("Z" + t).toSet))
    assert(sharedSet.size >= c1.size - 2,
      s"expected near-total chunk recovery (${sharedSet.size} of ${c1.size})")
  }

  test("sub-window payloads chunk whole and dedup exactly") {
    val corpus = Seq(1L -> "abc", 2L -> "abc", 3L -> "abcd")
    val dir = fixtureDir(docs = corpus.map { case (id, s) => doc(id, s) })
    assert(rows(Multimodal.cdcDedup(spark, dir)) ===
      Set(Seq(md5hex("abc"), 2L, 2L, 1L)))
  }
}
