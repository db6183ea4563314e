package graft

import graft.operators.Embedder

/** The stub featurizer: unit norm, determinism, multiplicity sensitivity. */
class EmbedderSpec extends SparkSpecBase {

  private def embed(texts: String*): Map[Long, Seq[Double]] = {
    val dir = fixtureDir(docs =
      texts.zipWithIndex.map { case (t, i) => doc(i.toLong, t) })
    Embedder.embedText(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
  }

  test("embeddings are 64-dim, unit-norm, deterministic") {
    val m = embed("alpha beta gamma", "alpha beta gamma", "delta epsilon")
    assert(m(0).size === Embedder.DIM)
    assert(m(0) === m(1))            // same text, same vector
    assert(m(0) !== m(2))            // different text, different vector
    val norm = math.sqrt(m(0).map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4) // rounded components, ~unit norm
  }

  test("token multiplicity changes the vector (mean-pooling-like)") {
    val m = embed("alpha beta", "alpha alpha beta")
    assert(m(0) !== m(1))
  }

  test("token-less text never yields a garbage vector") {
    // a doc whose tokens vanish after normalization either drops out of
    // the aggregate entirely (no rows to pool — matches the oracle's
    // unnest) or, if degenerate cancellation hits, is the zero vector
    val m = embed("alpha", "   ")
    assert(!m.contains(1L) || m(1L).forall(_ == 0.0))
    assert(m.contains(0L))
  }
}
