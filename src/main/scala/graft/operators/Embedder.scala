package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic text featurizer — the engine-side stand-in for the
  * reference's embedding generation (/root/reference/text_generator.py:300-320
  * mean-pools transformer hidden states; no model runs inside the engine,
  * so the STUB derives 64 hash features instead and the plumbing — schema,
  * normalization, distribution — is the real part).
  *
  * Feature i = Σ_tokens (bit_i(md5(token)) ? +1 : -1), L2-normalized, so
  * token multiplicity matters (mean-pooling-like) and every engine with
  * md5 reproduces the vector bit-for-bit. Unit norm makes downstream
  * cosine equal dot product.
  *
  * Shape: explode tokens → one codegen'd hash-aggregate with 64 sums →
  * normalize in a final projection. One shuffle by doc_id.
  */
object Embedder {

  val DIM = 64

  private def normToks(c: Column): Column =
    filter(split(lower(trim(regexp_replace(c, "\\s+", " "))), " "),
      x => x =!= "")

  /** (doc_id, s0..s63 raw ±1 sums, nrm): the shared aggregate both output
    * shapes derive from — explode tokens → one codegen'd hash-aggregate
    * with 16 packed-lane sums (Dedup.BitPack; token multiplicity counts,
    * bounded at 65 535 tokens/doc by the lane width) → unpack the ±1 sums
    * as `2*ones - n` and norm in following projections.
    */
  private def bitSums(spark: SparkSession, dir: String): DataFrame = {
    import Dedup.BitPack
    val ex = Tables.cpuPartition(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      col("doc_id"))
      .select(col("doc_id"), explode(normToks(col("text"))).as("w"))
      .select(col("doc_id") +: BitPack.packedDigits(md5(col("w"))): _*)
    val aggs = BitPack.sumAggs
    val sums = (0 until DIM).map { i =>
      (BitPack.ones(i) * 2 - BitPack.guardedN).as(s"s$i")
    }
    val norm = sqrt((0 until DIM).map(i =>
      col(s"s$i").cast("double") * col(s"s$i").cast("double")).reduce(_ + _))
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id") +: sums: _*)
      .withColumn("nrm", norm)
  }

  /** Exact-integer hash-feature sums for arbitrary keyed token rows —
    * the rounding-free twin of [[bitSums]] the late-interaction scorer
    * builds on. Input: (keys..., w) token rows; output: keys + s0..s63
    * (±1-bit sums as longs) + n2 (Σ s², long — the squared L2 norm).
    * Cosines computed as `Σ sa·sb / sqrt(na2) / sqrt(nb2)` from these
    * are bit-identical on any engine with md5: every term before the
    * final division is an exact integer.
    */
  private[graft] def hashSumRows(rows: DataFrame,
      keys: Seq[String]): DataFrame = {
    import Dedup.BitPack
    import graft.functions.VectorFunctions.dotLong
    val ex = rows.select(
      (keys.map(col) ++ BitPack.packedDigits(md5(col("w")))): _*)
    val aggs = BitPack.sumAggs
    val sv = array((0 until DIM).map { i =>
      (BitPack.ones(i) * 2 - BitPack.guardedN).cast("long")
    }: _*)
    // ONE array column, not 64 scalar columns: every downstream use
    // (dot, norm, renamed join sides) then references a single
    // attribute — a 64-wide schema inlines the packed-lane derivation
    // per expression term and blows the optimizer + the 64 KB codegen
    // budget (measured as a planning OOM). n2 rides the codegen'd
    // integer dot against itself.
    ex.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) :+ sv.as("sv")): _*)
      .withColumn("n2", dotLong(col("sv"), col("sv")))
  }

  /** (doc_id, embedding array<double> unit-norm rounded to 6dp). */
  def embedText(spark: SparkSession, dir: String): DataFrame = {
    val emb = array((0 until DIM).map(i =>
      round(col(s"s$i").cast("double") / col("nrm"), 6)): _*)
    bitSums(spark, dir)
      .select(col("doc_id"),
        when(col("nrm") > 0, emb)
          .otherwise(array_repeat(lit(0.0), DIM)).as("embedding"))
  }

  /** Gate-comparable view of [[embedText]]: one (doc_id, i, component) row
    * per vector component — the driver's oracle compare hashes scalar
    * columns (an array<double> column is unhashable on its side); library
    * users keep the array-valued [[embedText]].
    *
    * Shape matters: a codegen'd Generate re-evaluates its generator
    * expression and any deferred passed-through column once per EMITTED
    * element (see TextOps.categoryInfo's shape notes). Here that is
    * survivable — the generator re-computes 64 shift/mask unpacks and
    * the deferred norm re-computes its integer terms, all cheap ALU work
    * over aggregate-output attributes — but the one shape that is NOT is
    * exploding a finished array whose elements each embed the norm and
    * the whole upstream chain: measured 0.5s → 30s on sf0.1. Keep the
    * raw sums as the generator and divide after the Generate.
    */
  def embedTextComponents(spark: SparkSession, dir: String): DataFrame = {
    val rawSums = array((0 until DIM).map(i =>
      col(s"s$i").cast("double")): _*)
    bitSums(spark, dir)
      .select(col("doc_id"), col("nrm"),
        posexplode(rawSums).as(Seq("i", "s")))
      .select(col("doc_id"), col("i"),
        when(col("nrm") > 0, round(col("s") / col("nrm"), 6))
          .otherwise(0.0).as("component"))
  }
}
