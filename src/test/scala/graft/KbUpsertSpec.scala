package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The two-sided KB write path: dedup-on-insert for documents and
  * embeddings, orphan rejection, bucketed layout — and the contract the
  * verdict asked for: kb_consistency reads EXPLICIT ZEROS after an
  * ingest batch full of duplicate and orphan attempts.
  */
class KbUpsertSpec extends SparkSpecBase {

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_kb_docs")
    spark.sql("DROP TABLE IF EXISTS graft_kb_vecs")
  }

  test("kb_upsert: duplicates collapse, orphans reject, audit reads clean") {
    import spark.implicits._
    val docs = Seq(
      Doc(1, "alpha text", "en", "s0", 10),
      Doc(2, "beta text", "en", "s0", 9),
      Doc(5, "alpha text", "en", "s0", 10), // duplicate CONTENT: loses to 1
      Doc(2, "beta text", "en", "s0", 9),   // exact replay of doc 2
      Doc(3, "gamma text", "en", "s0", 10)).toDF()
    val embs = Seq(
      Emb(1, vec(1.0), 0),
      Emb(1, vec(1.0), 0),      // exact replay
      Emb(2, vec(0.0, 1.0), 0),
      Emb(3, vec(0.5, 0.5), 0),
      Emb(9, vec(0.9), 0))      // ORPHAN: no document 9 anywhere
      .toDF()
    try {
      val (d, e) = Similarity.kbUpsert(spark, docs, embs,
        "graft_kb_docs", "graft_kb_vecs")
      // content dedup kept the earliest doc_id; replays collapsed
      assert(d.select("doc_id").collect().map(_.getLong(0)).toSet
        === Set(1L, 2L, 3L))
      // orphan vec 9 rejected at the door; replays collapsed
      assert(e.select("vec_id").collect().map(_.getLong(0)).toSet
        === Set(1L, 2L, 3L))
      // the audit over the WRITTEN store: both sides explicit zeros
      val audit = Similarity.kbConsistencyOf(d, e).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(audit === Map("unembedded" -> 0L, "orphan_vectors" -> 0L))
    } finally cleanup()
  }

  test("kb_upsert: conflicting doc_id re-submission resolves by content " +
      "hash, not submission order") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = "first version"; val b = "second version"
    val winner = if (md5hex(a) < md5hex(b)) a else b
    // both submission orders land on the SAME accepted row (replay-safe)
    for (batch <- Seq(Seq(a, b), Seq(b, a))) {
      val docs = batch.map(t => Doc(7, t, "en", "s0", t.length.toLong)).toDF()
      val embs = Seq(Emb(7, vec(1.0), 0)).toDF()
      try {
        val (d, _) = Similarity.kbUpsert(spark, docs, embs,
          "graft_kb_docs", "graft_kb_vecs")
        assert(d.select("text").collect().map(_.getString(0)).toSeq
          === Seq(winner))
      } finally cleanup()
    }
  }

  test("kb_upsert: the written layout joins doc to vec with no shuffle " +
      "exchange") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => Doc(i, s"text $i", "en", "s0", 7)).toDF()
    val embs = (1L to 40L).map(i => Emb(i, vec(i.toDouble), 0)).toDF()
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (d, e) = Similarity.kbUpsert(spark, docs, embs,
        "graft_kb_docs", "graft_kb_vecs")
      val j = d.join(e, col("doc_id") === col("vec_id"))
      assert(j.count() === 40)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-aligned KB join must not shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      cleanup()
    }
  }
}
