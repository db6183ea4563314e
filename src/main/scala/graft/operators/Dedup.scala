package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus deduplication family for the training-data pipeline.
  *
  * The scale posture is the whole point (SURVEY.md §5): none of these
  * operators ever forms an all-pairs product —
  *
  *  - exact:   hash → window-min per hash group (one shuffle on the hash);
  *  - minhash: signature → LSH band keys → *equi-join on (band, key)*,
  *    candidate pairs verified by true Jaccard; buckets are capped so one
  *    degenerate key cannot quadratically explode a partition;
  *  - simhash: 64-bit sign-hash → 4×16-bit band equi-join → Hamming verify;
  *  - ngram:   blocked all-pairs *within a small blocking key* (source),
  *    the correctness baseline the LSH paths approximate.
  *
  * All hashes are md5-derived, so the DuckDB oracle reproduces every
  * signature bit-for-bit (no RNG state, no engine-specific hashing).
  */
object Dedup {

  private val MINHASHES = 12
  private val MH_BANDS = 4 // 3 minhashes per band
  private val SIM_BITS = 64
  private val SIM_BANDS = 4 // 16 bits per band
  private val BUCKET_CAP = 1000
  private val HEX = "0123456789abcdef"

  /** Normalized whitespace tokens (lowercase, collapsed). */
  private def normToks(c: Column): Column =
    filter(split(lower(trim(regexp_replace(c, "\\s+", " "))), " "),
      x => x =!= "")

  /** (doc_id, source, s = distinct word-3-gram shingles); docs with <3
    * words carry no shingles and drop out of the near-dup operators.
    */
  def shingleSets(spark: SparkSession, dir: String): DataFrame = {
    val ws = normToks(col("text"))
    val sh = transform(sequence(lit(1), size(col("ws")) - 2),
      j => concat_ws(" ", element_at(col("ws"), j),
        element_at(col("ws"), j + 1), element_at(col("ws"), j + 2)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), ws.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("source"), array_distinct(sh).as("s"))
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** dedup_exact: md5 of normalized text; canonical = min doc_id per hash
    * group (the survivor); is_dup marks rows a dedup pass would drop.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val norm = concat_ws(" ", normToks(col("text")))
    val w = Window.partitionBy(col("text_hash"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(norm).as("text_hash"))
      .withColumn("canonical", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("text_hash"), col("canonical"),
        (col("doc_id") =!= col("canonical")).as("is_dup"))
  }

  /** MinHash signature column: element j is the md5-min over shingles with
    * salt j — a classic permutation-free MinHash (min over a salted hash
    * family), reproducible by any engine with md5.
    */
  private def minhashSig(s: Column): Column =
    array((0 until MINHASHES).map { j =>
      array_min(transform(s, x => md5(concat(lit(s"${j}_"), x))))
    }: _*)

  /** (doc_id, band, key) rows, giant buckets capped. */
  private def mhBanded(sh: DataFrame): DataFrame = {
    val keys = array((0 until MH_BANDS).map { b =>
      substring(md5(concat(element_at(col("m"), 3 * b + 1),
        element_at(col("m"), 3 * b + 2),
        element_at(col("m"), 3 * b + 3))), 1, 16)
    }: _*)
    val w = Window.partitionBy(col("band"), col("key"))
    sh.select(col("doc_id"), minhashSig(col("s")).as("m"))
      .select(col("doc_id"), posexplode(keys).as(Seq("band", "key")))
      .withColumn("bc", count(lit(1)).over(w))
      .filter(col("bc") <= BUCKET_CAP)
      .drop("bc")
  }

  /** dedup_minhash: LSH candidate pairs (≥1 shared band) verified by true
    * Jaccard ≥ 0.5. Candidates are id pairs only — shingle sets re-attach
    * by key join, so the band-join shuffle never carries array payloads.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(spark, dir)
    val banded = mhBanded(sh)
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sa = sh.select(col("doc_id").as("id_a"), col("s").as("sa"))
    val sb = sh.select(col("doc_id").as("id_b"), col("s").as("sb"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sa"), col("sb")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** 64-char '0'/'1' SimHash signature over the shingle set: bit i is the
    * sign of the summed ±1 contributions of bit i of each shingle's md5.
    */
  private def simhashSig(s: Column): Column = {
    val hs = transform(s, x => md5(x))
    concat((0 until SIM_BITS).map { i =>
      val pos = i / 4 + 1
      val shift = 3 - i % 4
      val contrib = aggregate(hs, lit(0), (acc, h) =>
        acc + (shiftright(conv(substring(h, pos, 1), 16, 10).cast("int"),
          shift).bitwiseAND(lit(1)) * 2 - 1))
      when(contrib >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
  }

  /** dedup_simhash: 16-bit-band candidate generation + Hamming ≤ 8 verify. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = shingleSets(spark, dir)
      .select(col("doc_id"), simhashSig(col("s")).as("sig"))
    val bandKeys = array((0 until SIM_BANDS).map { b =>
      substring(col("sig"), 1 + 16 * b, 16)
    }: _*)
    val w = Window.partitionBy(col("band"), col("key"))
    val banded = sigs
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "key")))
      .withColumn("bc", count(lit(1)).over(w))
      .filter(col("bc") <= BUCKET_CAP)
      .drop("bc")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val ga = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val gb = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val hamming = aggregate(
      transform(sequence(lit(1), lit(SIM_BITS)), i =>
        when(col("sig_a").substr(i, lit(1)) =!= col("sig_b").substr(i, lit(1)),
          1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    cand.join(ga, "id_a").join(gb, "id_b")
      .select(col("id_a"), col("id_b"), hamming.cast("int").as("hamming"))
      .filter(col("hamming") <= 8)
  }

  /** dedup_ngram: exact word-3-gram Jaccard join inside a blocking key
    * (source). The honest quadratic baseline — but quadratic only in the
    * block size, and the block is a metadata key, never the whole corpus.
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(spark, dir)
    val a = sh.select(col("source"), col("doc_id").as("id_a"), col("s").as("sa"))
    val b = sh.select(col("source").as("src_b"), col("doc_id").as("id_b"),
      col("s").as("sb"))
    a.join(b, col("source") === col("src_b") && col("id_a") < col("id_b"))
      .select(col("source"), col("id_a"), col("id_b"),
        round(jaccard(col("sa"), col("sb")), 4).as("jaccard"))
      .filter(col("jaccard") > 0)
  }
}
