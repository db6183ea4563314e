package graft

import graft.operators.Similarity

/** Known-geometry checks for the similarity operators: an identical twin
  * must rank first everywhere, orthogonal vectors at zero.
  */
class SimilaritySpec extends SparkSpecBase {

  // vec 0 = query (id % 50 == 0 and % 100 == 0); vec 1 = identical twin;
  // vec 2 = orthogonal; vec 3 = close neighbor.
  private def dir() = fixtureDir(
    docs = Seq(doc(0, "a b c"), doc(1, "d e f"), doc(2, "g h i"),
      doc(3, "j k l")),
    embs = Seq(
      Emb(0, vec(1.0, 0.0), 0),
      Emb(1, vec(1.0, 0.0), 0),
      Emb(2, vec(0.0, 1.0), 0),
      Emb(3, vec(0.9, 0.1), 0)))

  test("kb_ingest reports dimension and 4dp-rounded L2 norm") {
    val d = fixtureDir(
      docs = Seq(doc(0, "a b c")),
      embs = Seq(Emb(0, vec(3.0, 4.0), 0)))
    val r = Similarity.kbIngest(spark, d)
      .select("doc_id", "dim", "norm").head()
    assert((r.getLong(0), r.getInt(1), r.getDouble(2)) === ((0L, 64, 5.0)))
  }

  test("sim_topk ranks the identical twin first, orthogonal last") {
    val out = Similarity.simTopk(spark, dir())
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head === ((1L, 1.0)))
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(out.last._2 === 0.0)
  }

  test("knn_join top-3 for the single sampled query") {
    val out = Similarity.knnJoin(spark, dir())
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out === Seq((0L, 1L, 1), (0L, 3L, 2), (0L, 2L, 3)))
  }

  test("ann_ivf routes through the centroid and ranks by true cosine") {
    val out = Similarity.annIvf(spark, dir())
      .select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out === Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("ann_ivf_kmeans trains centroids and still ranks the twin first") {
    val out = Similarity.annIvfKmeans(spark, dir())
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.contains((0L, 1L, 1)))
  }

  test("lsh_ann finds the identical twin (all bands collide)") {
    val out = Similarity.lshAnn(spark, dir())
      .select("neighbor_id", "sim", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.contains((1L, 1.0, 1)))
  }

  test("neardup_embedding pairs the twin within its label block") {
    // (0,1) identical -> sim 1.0; orthogonal pairs filtered by >= 0.40
    val m = Similarity.nearDupEmbedding(spark, dir())
      .select("id_a", "id_b", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(m((0L, 1L)) === 1.0)
    assert(!m.contains((0L, 2L)))
  }
}
