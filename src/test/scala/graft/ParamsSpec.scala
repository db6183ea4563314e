package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Interactions, Retrieval, Similarity}
import graft.sources.Tables

/** Runtime-parameter surface: the reference's per-call arguments
  * (topic_filter / min_effectiveness / limit, database.py:344; query id
  * + limit, database.py:422) ride on `spark.graft.param.*`. The
  * invariants that keep the oracle gate honest:
  *
  *  1. an UNSET session serves bit-identical results to the pre-params
  *     engine (defaults are the gated constants),
  *  2. a set param visibly changes the served result,
  *  3. unset restores the default exactly,
  *  4. malformed values fail loud, never silently default.
  */
class ParamsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def withParam[T](key: String, value: String)(f: => T): T = {
    spark.conf.set(Params.Namespace + key, value)
    try f finally spark.conf.unset(Params.Namespace + key)
  }

  test("conversation_history.limit changes depth; unset restores default") {
    val before = sortedRows(Interactions.conversationHistory(spark, dir))
    val maxRnDefault = Interactions.conversationHistory(spark, dir)
      .agg(max("rn")).head.getInt(0)
    assert(maxRnDefault === 5)
    withParam("conversation_history.limit", "2") {
      val shrunk = Interactions.conversationHistory(spark, dir)
      assert(shrunk.agg(max("rn")).head.getInt(0) === 2)
    }
    assert(sortedRows(Interactions.conversationHistory(spark, dir)) === before)
  }

  test("high_quality limit/threshold/topic are the reference's args") {
    val dflt = Interactions.highQuality(spark, dir)
    assert(dflt.count() === 100) // gated default limit
    withParam("high_quality.limit", "17") {
      assert(Interactions.highQuality(spark, dir).count() === 17)
    }
    // a stricter threshold can only shrink the OR-gate's pass set;
    // threshold 1.01 leaves only the adherence arm
    val dfltIds = sortedRows(dflt.select("event_id"))
    withParam("high_quality.min_effectiveness", "1.01") {
      val strict = Interactions.highQuality(spark, dir)
      assert(sortedRows(strict.filter(col("template_adherence") =!= "high")
        .select("event_id")).isEmpty)
    }
    // topic filter on the UNfiltered gate behaves like high_quality_topic
    withParam("high_quality.topic", "Anxiety") {
      val topical = sortedRows(Interactions.highQuality(spark, dir))
      val fixture = sortedRows(Interactions.highQualityTopic(spark, dir))
      assert(topical === fixture)
    }
    // all knobs unset again: the served result is the gated default
    assert(sortedRows(Interactions.highQuality(spark, dir).select("event_id"))
      === dfltIds)
  }

  test("sim_topk query_id/k: a different query serves different neighbors") {
    val dflt = sortedRows(Similarity.simTopk(spark, dir))
    withParam("sim_topk.k", "3") {
      assert(Similarity.simTopk(spark, dir).count() === 3)
    }
    withParam("sim_topk.query_id", "7") {
      val other = Similarity.simTopk(spark, dir)
      // the query vector itself must be excluded from its own result
      assert(other.filter(col("vec_id") === 7).count() === 0)
      assert(sortedRows(other) !== dflt)
    }
    assert(sortedRows(Similarity.simTopk(spark, dir)) === dflt)
  }

  test("sim_topk.vector: a literal query vector serves the reference's " +
      "RPC shape, bit-identical to the vec_id path for the same floats") {
    val dflt = sortedRows(Similarity.simTopk(spark, dir))
    // the stored floats of vec_id 7, round-tripped through toString
    // (Float.toString is shortest-repr: the CSV parse is bit-exact)
    val stored = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 7).select("embedding")
      .head.getSeq[Float](0)
    val csv = stored.map(_.toString).mkString(",")
    val viaId = withParam("sim_topk.query_id", "7") {
      Similarity.simTopk(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    withParam("sim_topk.vector", csv) {
      withParam("sim_topk.k", "6") {
        val viaVec = Similarity.simTopk(spark, dir)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        // a literal vector has no self row to exclude: the stored
        // vector's own id leads at sim 1.0, then the vec_id path's
        // ranking follows bit-identically
        assert(viaVec.head === ((7L, 1.0)), viaVec.head)
        assert(viaVec.tail === viaId, s"$viaVec vs $viaId")
      }
    }
    // dim-checked loud, component-checked loud
    withParam("sim_topk.vector", "1.5,2.5") {
      intercept[IllegalArgumentException] { Similarity.simTopk(spark, dir) }
    }
    withParam("sim_topk.vector", Seq.fill(64)("x").mkString(",")) {
      intercept[IllegalArgumentException] { Similarity.simTopk(spark, dir) }
    }
    // unset: the gated default is served again
    assert(sortedRows(Similarity.simTopk(spark, dir)) === dflt)
  }

  test("bm25_topk.k caps the per-query depth") {
    withParam("bm25_topk.k", "2") {
      val capped = Retrieval.bm25Topk(spark, dir)
      assert(capped.agg(max("rank")).head.getInt(0) <= 2)
    }
  }

  test("ann.nprobe widens the IVF probe; unset restores the gated pool") {
    val dir08 = "/root/testdata/sf0.001"
    val dflt = sortedRows(Similarity.mmrPoolIvf(spark, dir08))
    val dfltPairs = Similarity.mmrPoolIvf(spark, dir08)
      .select(col("q_id"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfltMin = Similarity.mmrPoolIvf(spark, dir08)
      .agg(min(col("simq"))).head.getDouble(0)
    withParam("ann.nprobe", "8") {
      val wide = Similarity.mmrPoolIvf(spark, dir08)
        .select(col("q_id"), col("doc_id"), col("simq")).collect()
      assert(wide.nonEmpty)
      // nprobe=8 probes every cell of the 8-seed index: the pool
      // becomes exactly the brute-force pool's candidate set, and a
      // wider probe can only improve the per-query top-k (min sim
      // must not decrease)
      val exact = Similarity.mmrPoolExact(spark, dir08)
        .select(col("q_id"), col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(wide.map(r => (r.getLong(0), r.getLong(1))).toSet === exact)
      assert(wide.map(_.getDouble(2)).min >= dfltMin - 1e-9)
    }
    assert(sortedRows(Similarity.mmrPoolIvf(spark, dir08)) === dflt)
    assert(Similarity.mmrPoolIvf(spark, dir08)
      .select(col("q_id"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === dfltPairs)
  }

  test("malformed param values fail loud") {
    withParam("sim_topk.k", "five") {
      intercept[IllegalArgumentException] {
        Similarity.simTopk(spark, dir)
      }
    }
    withParam("high_quality.min_effectiveness", "0.7.0") {
      intercept[IllegalArgumentException] {
        Interactions.highQuality(spark, dir)
      }
    }
  }

  test("mmr.k / mmr.lambda: serving knobs; unset restores gated parity") {
    val dflt = sortedRows(Similarity.mmrRerank(spark, dir))
    withParam("mmr.k", "2") {
      val picks = Similarity.mmrRerank(spark, dir)
        .groupBy("q_id").agg(max("pick").as("mx")).collect()
      assert(picks.nonEmpty && picks.forall(_.getAs[Int]("mx") === 2))
    }
    withParam("mmr.lambda", "1.0") {
      // pure-relevance MMR = the pool's top-k by simq (diversity off)
      val out = Similarity.mmrRerank(spark, dir).collect()
      assert(out.nonEmpty)
    }
    assert(sortedRows(Similarity.mmrRerank(spark, dir)) === dflt)
  }

  test("chunk.width/stride reshape the chunk grid; malformed fails loud") {
    val docs = Seq(Doc(1, "t1 t2 t3 t4 t5 t6", "en", "s0", 17))
    val d2 = fixtureDir(docs = docs)
    withParam("chunk.width", "4") {
      withParam("chunk.stride", "2") {
        val out = Retrieval.chunkDocs(spark, d2).collect()
          .sortBy(_.getAs[Int]("chunk_id"))
        assert(out.length === 2)
        assert(out(0).getAs[String]("chunk_text") === "t1 t2 t3 t4")
        assert(out(1).getAs[String]("chunk_text") === "t3 t4 t5 t6")
      }
    }
    withParam("chunk.width", "banana") {
      intercept[IllegalArgumentException](Retrieval.chunkDocs(spark, d2))
    }
  }

  test("span_hotspots.topk cuts the worklist") {
    val run1 = "a b c d e f g h"
    val run2 = "p q r s t u v w"
    val d2 = fixtureDir(docs = Seq(
      doc(1, run1), doc(2, run1), doc(3, run2), doc(4, run2)))
    assert(graft.operators.Dedup.spanHotspots(spark, d2).count() === 2)
    withParam("span_hotspots.topk", "1") {
      assert(graft.operators.Dedup.spanHotspots(spark, d2).count() === 1)
    }
  }

  test("ann.vector: an arbitrary embedding serves through the INDEX " +
      "chain (r14 — the reference RPC's p_embedding, database.py:443), " +
      "bit-identical to the vec_id arm for the same floats; unset " +
      "keeps gated parity") {
    val stored = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 100).select("embedding")
      .head.getSeq[Float](0)
    val csv = stored.map(_.toString).mkString(",")
    def fams: Seq[(String, () => DataFrame)] = Seq(
      "ann_ivf_kmeans" -> (() => Similarity.annIvfKmeans(spark, dir)),
      "ann_filtered" -> (() => Similarity.annFiltered(spark, dir)),
      "ann_sq" -> (() => Similarity.annSq(spark, dir)),
      "ann_graph" -> (() => Similarity.annGraph(spark, dir)),
      "mmr_rerank" -> (() => Similarity.mmrRerank(spark, dir)))
    for ((name, f) <- fams) {
      val dfltAll = sortedRows(f())
      // qid = 100 reproduces the stored vector's own gated ranking:
      // same floats, same self-exclusion — the slice identity
      val slice = sortedRows(f().filter(col("q_id") === 100))
      withParam("ann.vector", csv) {
        withParam("ann.vector.qid", "100") {
          assert(sortedRows(f()) === slice,
            s"$name: literal arm must rank bit-identical to vec_id arm")
        }
        // the default qid (-1) matches no corpus row: nothing excluded,
        // the stored twin itself leads the ranking
        val open = f().collect()
        assert(open.nonEmpty, s"$name: literal arm must serve")
      }
      assert(sortedRows(f()) === dfltAll, s"$name: unset parity")
    }
  }

  test("ann.filter.lang: empty string disables the predicate entirely") {
    val embs = (0L until 10L).map(i =>
      Emb(i, Seq.tabulate(64)(d => ((i * 7 + d) % 13).toFloat / 13f),
        (i % 4).toInt))
    val docs = (0L until 10L).map(i =>
      Doc(i, s"w$i", if (i % 2 == 0) "de" else "en", "s0", 2))
    val d2 = fixtureDir(docs = docs, embs = embs)
    withParam("ann.nprobe", "8") {
      val filtered = Similarity.annFiltered(spark, d2).collect()
      assert(filtered.forall(_.getAs[Long]("neighbor_id") % 2 == 0))
      withParam("ann.filter.lang", "") {
        val open = Similarity.annFiltered(spark, d2).collect()
        // with the predicate off, odd (en) neighbors can now win slots
        assert(open.exists(_.getAs[Long]("neighbor_id") % 2 == 1))
      }
    }
  }
}
