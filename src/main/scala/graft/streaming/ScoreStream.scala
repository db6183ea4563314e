package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.CorpusStats

/** Streaming perplexity scoring — the streaming face of the frozen
  * bigram LM (CorpusStats.buildBigramLm): documents arriving on a stream
  * are scored against the TRAINED model, never against the batch they
  * happen to arrive in (the same freeze-then-probe contract as the
  * reference's build-once vector index, /root/reference/database.py:459,
  * and this engine's ANN/dedup artifacts).
  *
  * Shape: stateless per-batch work — tokenize the arriving docs, join
  * the static LM frame (a stream-static equi-join; no streaming state,
  * no watermark), append one score row per doc to `store`. Bigrams the
  * LM never saw take the smoothed Laplace floor; languages the LM never
  * saw are unscorable by a per-language model and are dropped (both
  * semantics live in CorpusStats.scoreAgainstLm, shared verbatim with
  * the batch query — which is what makes the batch-parity spec exact).
  *
  * foreachBatch rather than a streaming-native aggregation: the score is
  * a per-document terminal aggregate, and re-deliveries must be no-ops
  * (dropDuplicates against the store), which the plain parquet-append
  * store handles the same way DedupStream.maintainPairs does.
  */
object ScoreStream {

  /** Score arriving docs against the frozen LM; append to `store`.
    * Re-delivered doc_ids (source replays) are skipped, so the drained
    * store holds exactly one row per distinct scoreable document.
    */
  def scoreDocs(docs: DataFrame, lm: DataFrame, store: String)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) => processBatch(batch.toDF(), lm, store)
    }

  private[graft] def processBatch(batch: DataFrame, lm: DataFrame,
      store: String): Unit =
    appendScored(batch, store)(CorpusStats.scoreAgainstLm(_, lm))

  /** Streaming DSIR weighting — arriving docs score against the frozen
    * (bucket, target, raw) count table (CorpusStats.buildDsirBuckets);
    * same freeze-then-probe contract and store semantics as
    * [[scoreDocs]]. Feature buckets the frozen table never saw take the
    * smoothed (0+1) floors via the scorer's left join — the streaming-
    * only path a self-corpus batch run can never exercise.
    */
  def scoreDsir(docs: DataFrame, bkt: DataFrame, store: String)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        appendScored(batch.toDF(), store)(CorpusStats.dsirScore(_, bkt))
    }

  /** Streaming CCNet bucketing — arriving docs score against the frozen
    * LM and land in head/middle/tail against FROZEN per-language
    * tercile thresholds (CorpusStats.ccnetThresholdsOf over the
    * calibration corpus). This is the production posture the batch
    * query only simulates: ccnet_buckets derives thresholds from the
    * corpus it scores, a stream applies thresholds frozen at
    * calibration time. Languages absent from the frozen thresholds are
    * unbucketable and drop (the scoreDocs unknown-language rule, one
    * level up). Same stream-static-join/append-store shape as
    * [[scoreDocs]].
    */
  def bucketDocs(docs: DataFrame, lm: DataFrame, thresholds: DataFrame,
      store: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        appendScored(batch.toDF(), store) { b =>
          import org.apache.spark.sql.functions.col
          CorpusStats.bucketAgainst(
            CorpusStats.scoreAgainstLm(b, lm)
              .select(col("doc_id"), col("lang"), col("ppl")),
            thresholds)
        }
    }

  /** Streaming trained-gate scoring — arriving docs score against the
    * FROZEN distilled-classifier weights
    * (graft.operators.Curation.buildClfWeights): the production serving
    * face of classifier_apply, where the gate filters an ingest stream
    * instead of re-scanning a corpus. Same freeze-then-probe contract
    * and append-store semantics as [[scoreDocs]]; the weight vector is
    * one broadcast row, so the per-batch work is a stateless map — the
    * cheapest gate in the streaming stack (CurateStream's heuristic
    * rules beside it need no training; this one carries the distilled
    * LM signal).
    */
  def scoreTrainedGate(docs: DataFrame, finalWeights: DataFrame,
      store: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        appendScored(batch.toDF(), store) { b =>
          graft.operators.Curation.classifierScoreOf(
            graft.operators.TextAnalysis.qualitySignalsOf(b), finalWeights)
        }
    }

  /** Micro-batch skeleton shared across the foreachBatch sinks —
    * see [[StreamStore.appendNew]].
    */
  private def appendScored(batch: DataFrame, store: String)(
      score: DataFrame => DataFrame): Unit =
    StreamStore.appendNew(batch, store)(score)
}
