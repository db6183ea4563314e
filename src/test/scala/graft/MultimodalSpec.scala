package graft

import graft.operators.Multimodal

/** The multimodal plumbing: the typed per-partition decode path must agree
  * exactly with the declarative column plan (same payloads, same stub
  * arithmetic, same hashes).
  */
class MultimodalSpec extends SparkSpecBase {

  test("decodeFeatures (mapPartitions) equals multimodalMeta (columns)") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "tiny"),
      doc(1, "a somewhat longer payload body"),
      doc(2, "")))
    val typed = Multimodal
      .decodeFeatures(spark, Multimodal.withPayload(spark, dir))
      .collect()
      .map(m => m.doc_id -> ((m.byte_len, m.width, m.height, m.channels,
        m.content_md5))).toMap
    val cols = Multimodal.multimodalMeta(spark, dir)
      .select("doc_id", "byte_len", "width", "height", "channels",
        "content_md5")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(typed === cols)
    assert(typed(0)._1 === 4) // "tiny" is 4 bytes
    // known md5 of "tiny"
    assert(typed(0)._5 === "d60cadf1a41c651e1f0ade50136bad43")
  }

  test("media_frames fans out one row per sampled frame") {
    val dir = fixtureDir(docs = Seq(doc(0, "abcdefgh"))) // 8 bytes -> 8%7+1 = 2 frames
    val out = Multimodal.mediaFrames(spark, dir)
      .select("doc_id", "n_frames", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out === Set((0L, 2, 0), (0L, 2, 1)))
  }

  test("fitWithin preserves aspect ratio and never upscales") {
    assert(Multimodal.fitWithin(1920, 1080, 640, 480) === ((640, 360)))
    assert(Multimodal.fitWithin(100, 200, 640, 480) === ((100, 200))) // no upscale
    assert(Multimodal.fitWithin(1, 10000, 640, 480) === ((1, 480)))
  }

  test("stub decoder is deterministic and bounded") {
    val (w, h, c) = Multimodal.StubDecoder.decode("abc".getBytes("UTF-8"))
    assert(w === (3 * 7 + 13) % 640 + 1)
    assert(h === (3 * 3 + 'a'.toInt) % 480 + 1)
    assert(c === 3)
  }

  test("media_dedup: byte-identical payloads group; canonical is min doc") {
    val dir = fixtureDir(docs = Seq(
      doc(1, "same bytes"), doc(2, "same bytes"), doc(3, "other")))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(graft.operators.Multimodal.mediaDedup(spark, dir)) === Set(
      Seq(1L, h("same bytes"), 10L, 1L, 2L, false),
      Seq(2L, h("same bytes"), 10L, 1L, 2L, true),
      Seq(3L, h("other"), 5L, 3L, 1L, false)))
  }

  test("media_shard: per-shard byte offsets are gapless running sums in " +
      "hash order; volume = offset div budget") {
    import graft.operators.Multimodal
    val dir = fixtureDir(docs = (1L to 20L).map(i =>
      doc(i, "x" * (i.toInt * 7))))
    val out = Multimodal.mediaShard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(out.length === 20)
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${Multimodal.MediaShardSeed}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    out.groupBy(_._3).foreach { case (shard, rs) =>
      // rows ordered by (hkey, doc_id) must tile the byte range exactly
      val ordered = rs.sortBy(r => (h(r._1), r._1))
      var cum = 0L
      ordered.foreach { case (id, len, s, vol, off) =>
        assert(s === (h(id) % Multimodal.MediaShards).toInt)
        assert(off === cum, s"doc $id in shard $shard")
        assert(vol === (off / Multimodal.MediaVolBytes).toInt)
        cum += len
      }
    }
  }

  test("frame_dedup: cross-asset chunk recurrence with in-asset " +
      "multiplicity; singleton chunks drop") {
    val w = Multimodal.FrameChunkBytes
    def block(ch: Char) = ch.toString * w
    // chunk A recurs in docs 1, 2 and TWICE in doc 4; B/C/D are
    // singletons and must not surface
    val dir = fixtureDir(docs = Seq(
      doc(1, block('a') + block('b')),
      doc(2, block('a') + block('c')),
      doc(3, block('d')),
      doc(4, block('a') + block('a'))))
    val md = java.security.MessageDigest.getInstance("MD5")
    val aMd5 = md.digest(block('a').getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(Multimodal.frameDedup(spark, dir)) ===
      Set(Seq(aMd5, 3L, 4L, 1L)))
  }
}
