package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.CorpusStats
import graft.streaming.ScoreStream

/** Streaming perplexity against a frozen LM: a file-backed doc stream
  * (micro-batches via maxFilesPerTrigger=1) must reproduce the batch
  * scorer exactly — re-deliveries as no-ops, unseen bigrams at the
  * smoothed floor, unknown languages dropped.
  */
class ScoreStreamSpec extends SparkSpecBase {

  test("drained score store equals the batch scorer against the same LM") {
    import spark.implicits._
    // LM frozen BEFORE the stream starts: docs arriving later (5) score
    // against it, not against their own batch
    val train = Seq(doc(1, "a b a b"), doc(2, "a b c"),
      doc(3, "c a c a b"))
    val lm = CorpusStats.bigramLmOf(train.toDF()).localCheckpoint()
    val b1 = Seq(doc(1, "a b a b"), doc(2, "a b c"))
    // batch 2: re-delivery of doc 1 (no-op), doc 5 with an unseen token,
    // doc 6 in a language the LM never saw (dropped)
    val b2 = Seq(doc(1, "a b a b"), doc(5, "a b z"),
      Doc(6, "x y", "de", "s0", 3))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-score-store").toString + "/scores"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = ScoreStream.scoreDocs(src, lm, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(CorpusStats.scoreAgainstLm(
      (b1 ++ b2.filterNot(_.doc_id == 1)).toDF(), lm))
    assert(streamed === batch)
    // exactly one row per scoreable doc (1, 2, 5; 6 dropped)
    assert(streamed.map(_.head) === Set(1L, 2L, 5L))
  }

  test("drained DSIR store equals the batch scorer; unseen buckets floor") {
    import spark.implicits._
    // buckets frozen from a corpus with src0 as the target domain
    val corpus = Seq(
      Doc(1, "a b", "en", "src0", 3),
      Doc(10, "a b", "en", "s1", 3),
      Doc(11, "z z", "en", "s1", 3))
    val bkt = CorpusStats.dsirBucketsOf(corpus.toDF()).localCheckpoint()
    val b1 = Seq(doc(10, "a b", "s1"))
    // batch 2: re-delivery of 10 (no-op) + doc 12 whose grams the
    // frozen table never saw (the left-join floor path)
    val b2 = Seq(doc(10, "a b", "s1"), doc(12, "qq rr", "s1"))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-dsir-store").toString + "/weights"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = ScoreStream.scoreDsir(src, bkt, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(CorpusStats.dsirScore(
      Seq(doc(10, "a b", "s1"), doc(12, "qq rr", "s1")).toDF(), bkt))
    assert(streamed === batch)
    assert(streamed.map(_.head) === Set(10L, 12L))
    // the unseen-bucket doc scored through the floor, not dropped
    assert(streamed.count(_.head == 12L) === 1)
  }

  test("drained bucket store equals batch ccnet assignment, frozen thresholds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // calibration corpus: LM + tercile thresholds frozen BEFORE the
    // stream; the replayed docs must land in the batch query's buckets
    val cal = Seq(doc(1, "a b a b"), doc(2, "a b c"), doc(3, "c a c a b"),
      doc(4, "b c b a"), doc(5, "a a a a"), doc(6, "c c b"))
    val lm = CorpusStats.bigramLmOf(cal.toDF()).localCheckpoint()
    val scoredCal = CorpusStats.scoreAgainstLm(cal.toDF(), lm)
      .select(col("doc_id"), col("lang"), col("ppl"))
      .localCheckpoint()
    val thr = CorpusStats.ccnetThresholdsOf(scoredCal).localCheckpoint()
    // replay the calibration corpus in two micro-batches, with a
    // re-delivery (1) and an unknown-language doc (9, dropped)
    val b1 = Seq(doc(1, "a b a b"), doc(2, "a b c"), doc(3, "c a c a b"))
    val b2 = Seq(doc(1, "a b a b"), doc(4, "b c b a"), doc(5, "a a a a"),
      doc(6, "c c b"), Doc(9, "x y", "de", "s0", 3))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-bucket-store").toString + "/buckets"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = ScoreStream.bucketDocs(src, lm, thr, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    // batch twin: assign the SAME frozen thresholds over the full corpus
    val batch = rows(CorpusStats.bucketAgainst(scoredCal, thr))
    assert(streamed === batch)
    assert(streamed.map(_.head) === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("drained trained-gate store equals batch classifier_apply with " +
      "the same frozen weights") {
    import org.apache.spark.sql.functions.lit
    // weights frozen from the sf0.001 corpus artifact BEFORE the stream
    val d = "/root/testdata/sf0.001"
    graft.operators.Curation.classifierTrain(spark, d).count() // build
    val fin = spark.read.parquet(
      s"${graft.operators.Curation.clfWeightsPath(d)}/final")
      .localCheckpoint()
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
    val (h1, h2) = docs.splitAt(docs.length / 2)
    import spark.implicits._
    def frame(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getString(1))).toSeq
        .toDF("doc_id", "text")
    // batch 2 re-delivers batch 1's first doc: must be a no-op
    val stage = stageBatchFrames(Seq(frame(h1),
      frame(h2 ++ h1.take(1))))
    val store = java.nio.file.Files
      .createTempDirectory("graft-gate-store").toString + "/preds"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = ScoreStream.scoreTrainedGate(src, fin, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(graft.operators.Curation.classifierApply(spark, d))
    assert(streamed === batch)
  }
}
