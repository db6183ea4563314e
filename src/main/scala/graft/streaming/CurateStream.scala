package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Curation, Dedup}

/** Streaming ingest gate — the arriving-document face of the batch
  * curation manifest (Curation.curateCorpus): each micro-batch of new
  * documents is gated against FROZEN corpus artifacts (the same
  * freeze-then-probe contract as ScoreStream's LM and the ANN indexes):
  *
  *  - quality: stateless per-doc signals (the shared
  *    Curation.qualityFilterOf — identical thresholds and rounding);
  *  - exact duplication: the arriving doc's content hash against the
  *    frozen corpus hash set (Dedup.exactHashOf on both sides);
  *  - contamination: the arriving doc's word-3-gram shingles against
  *    the frozen benchmark shingle set.
  *
  * Stage precedence mirrors the batch manifest: quality → exact_dup →
  * contaminated → kept. Near-dup maintenance is deliberately NOT here —
  * incremental minhash pair upkeep is DedupStream's stateful job; this
  * gate is the stateless stream-static part, so it needs no watermark
  * and no state store. Mixture sampling is a corpus-level decision
  * (apply_mix re-plans over the whole inventory), not a per-arrival one.
  *
  * foreachBatch + parquet-append store with doc_id anti-join: source
  * re-deliveries are no-ops, the drained store holds exactly one verdict
  * per distinct document (the ScoreStream skeleton).
  */
object CurateStream {

  /** Gate arriving docs against the frozen artifacts; append verdicts
    * (doc_id, stage, keep) to `store`.
    *
    * @param corpusHashes  frozen (text_hash) set of the existing corpus
    *                      (e.g. `Dedup.dedupExact(...).select("text_hash")`)
    * @param benchShingles frozen (g) distinct shingles of the eval suite
    */
  def gateDocs(docs: DataFrame, corpusHashes: DataFrame,
      benchShingles: DataFrame, store: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), corpusHashes, benchShingles, store)
    }

  private[graft] def processBatch(batch: DataFrame, corpusHashes: DataFrame,
      benchShingles: DataFrame, store: String): Unit =
    StreamStore.appendNew(batch, store)(
      gateOf(_, corpusHashes, benchShingles))

  /** The gate itself over any (doc_id, text, …) frame — also the batch
    * definition the parity spec compares against. A `source` column is
    * carried into the shingle provenance when present; absent one, the
    * gate supplies a placeholder (the shingle frame requires it).
    */
  private[graft] def gateOf(in: DataFrame, corpusHashes: DataFrame,
      benchShingles: DataFrame): DataFrame = {
    val docs =
      if (in.columns.contains("source")) in
      else in.withColumn("source", lit(""))
    val qf = Curation.qualityFilterOf(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("keep"))
    val dup = Dedup.exactHashOf(docs)
      .join(corpusHashes.select(col("text_hash")).distinct(),
        Seq("text_hash"), "left_semi")
      .select(col("doc_id"), lit(true).as("known_dup"))
    val contaminated = Dedup.shingleRowsOf(docs)
      .join(benchShingles.select(col("g")).distinct(), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
      .select(col("doc_id"), lit(true).as("contaminated"))
    qf.join(dup, Seq("doc_id"), "left_outer")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(!col("keep"), "quality")
          .when(col("known_dup").isNotNull, "exact_dup")
          .when(col("contaminated").isNotNull, "contaminated")
          .otherwise("kept").as("stage"),
        (col("keep") && col("known_dup").isNull &&
          col("contaminated").isNull).as("keep"))
  }
}
