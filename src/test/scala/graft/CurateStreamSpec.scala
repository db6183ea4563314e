package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.{CurateStream, DedupStream}

/** Streaming ingest gate against frozen corpus artifacts: the drained
  * verdict store must reproduce the batch gate exactly — re-deliveries
  * as no-ops, exact dups caught against the FROZEN hash set (not the
  * arriving batch), near-dups against the frozen band+shingle stores,
  * contamination against the frozen bench shingles.
  */
class CurateStreamSpec extends SparkSpecBase {

  private val corpusText = "the alpha bravo charlie delta echo foxtrot " +
    "golf hotel india juliet kilo lima mike november oscar papa quebec " +
    "romeo sierra tango uniform victor whiskey" // 24 words, passes quality
  private val freshText = "a harbor beacon drifts over quiet water while " +
    "gulls wheel above the long pier and fishermen mend their worn nets " +
    "before first light arrives" // 24 words, passes quality
  private val contamText = "and nebula quartz marble cobalt amber fjord " +
    "garnet harbor2 island jungle kelp lantern meadow nectar orchid " +
    "prairie quarry raven saddle timber urchin velvet zulu yankee xray"
  // appends one word to the frozen corpus doc: not an exact dup, but
  // shingle Jaccard 22/23 — the near-dup shape an ingest gate must stop
  private val nearText = corpusText + " omega"

  private def frozenOf(corpusDocs: Seq[Doc], benchDocs: Seq[Doc]) = {
    import spark.implicits._
    val corpus = corpusDocs.toDF()
    val sh = Dedup.shingleRowsOf(corpus)
      .withColumn("n", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(
          org.apache.spark.sql.functions.col("doc_id"))))
    CurateStream.freeze(
      Dedup.exactHashOf(corpus).select("text_hash"),
      Dedup.minhashBandedFrom(sh),
      sh,
      Dedup.shingleRowsOf(benchDocs.toDF()).select("g"))
  }

  test("drained gate store equals the batch gate; frozen-artifact dups") {
    import spark.implicits._
    val frozen = frozenOf(Seq(doc(100, corpusText)),
      Seq(doc(101, "zulu yankee xray walrus vulture")))
    val b1 = Seq(doc(1, freshText), doc(2, "tiny text"))
    // batch 2: re-delivery of 1 (no-op), 3 = exact twin of the FROZEN
    // corpus doc, 4 = clean text sharing a 3-gram with the bench suite,
    // 5 = near-dup (one appended word) of the frozen corpus doc
    val b2 = Seq(doc(1, freshText), doc(3, corpusText), doc(4, contamText),
      doc(5, nearText))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-gate-store").toString + "/verdicts"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = CurateStream.gateDocs(src, frozen, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(CurateStream.gateOf(
      (b1 ++ b2.filterNot(_.doc_id == 1)).toDF(), frozen))
    assert(streamed === batch)
    assert(streamed === Set(
      Seq(1L, "kept", true),
      Seq(2L, "quality", false),
      Seq(3L, "exact_dup", false),
      Seq(4L, "contaminated", false),
      Seq(5L, "near_dup", false)))
  }

  test("gate near_dup agrees with the batch minhash pipeline on a replay") {
    import spark.implicits._
    // Replay posture: the corpus is frozen, the arriving docs are new
    // ids whose only near-dup partners sit in the frozen corpus (the
    // gate's contract — cross-arrival pairs are DedupStream's job).
    // The gate's near_dup verdict must equal "the union-corpus batch
    // pipeline emits a verified pair linking the arrival to a frozen
    // doc" — i.e. the corpus-rebuild answer the gate pre-empts.
    val corpusDocs = Seq(doc(100, corpusText), doc(101, freshText))
    val arrivals = Seq(
      doc(200, nearText),                       // near-dup of 100
      doc(201, freshText + " extra trailing"),  // near-dup of 101
      doc(202, contamText))                     // clean
    val frozen = frozenOf(corpusDocs, Seq(doc(999, "no bench overlap here")))
    val gated = CurateStream.gateOf(arrivals.toDF(), frozen)
      .select("doc_id", "stage")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch authority: full minhash dedup over the union corpus
    val union = (corpusDocs ++ arrivals).toDF()
    val unionSh = Dedup.shingleRowsOf(union)
      .withColumn("n", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(
          org.apache.spark.sql.functions.col("doc_id"))))
      .localCheckpoint()
    val pairs = Dedup.verifyJaccard(
        Dedup.bandCandidates(Dedup.minhashBandedFrom(unionSh)), unionSh)
      .filter(org.apache.spark.sql.functions.col("jaccard")
        >= Dedup.JaccardThreshold)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val frozenIds = corpusDocs.map(_.doc_id).toSet
    for (a <- arrivals.map(_.doc_id)) {
      val batchNear = pairs.exists { case (x, y) =>
        (x == a && frozenIds(y)) || (y == a && frozenIds(x)) }
      assert((gated(a) == "near_dup") === batchNear,
        s"doc $a: gate=${gated(a)} batchNear=$batchNear")
    }
  }
}
