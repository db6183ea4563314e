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

  test("stub decoder is deterministic and bounded") {
    val (w, h, c) = Multimodal.StubDecoder.decode("abc".getBytes("UTF-8"))
    assert(w === (3 * 7 + 13) % 640 + 1)
    assert(h === (3 * 3 + 'a'.toInt) % 480 + 1)
    assert(c === 3)
  }
}
