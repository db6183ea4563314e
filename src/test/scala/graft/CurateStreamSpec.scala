package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.CurateStream

/** Streaming ingest gate against frozen corpus artifacts: the drained
  * verdict store must reproduce the batch gate exactly — re-deliveries
  * as no-ops, exact dups caught against the FROZEN hash set (not the
  * arriving batch), contamination against the frozen bench shingles.
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

  test("drained gate store equals the batch gate; frozen-artifact dups") {
    import spark.implicits._
    val hashes = Dedup.exactHashOf(Seq(doc(100, corpusText)).toDF())
      .select("text_hash").localCheckpoint()
    val bench = Dedup.shingleRowsOf(
      Seq(doc(101, "zulu yankee xray walrus vulture")).toDF())
      .select("g").localCheckpoint()
    val b1 = Seq(doc(1, freshText), doc(2, "tiny text"))
    // batch 2: re-delivery of 1 (no-op), 3 = exact twin of the FROZEN
    // corpus doc, 4 = clean text sharing a 3-gram with the bench suite
    val b2 = Seq(doc(1, freshText), doc(3, corpusText), doc(4, contamText))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-gate-store").toString + "/verdicts"
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = CurateStream.gateDocs(src, hashes, bench, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(CurateStream.gateOf(
      (b1 ++ b2.filterNot(_.doc_id == 1)).toDF(), hashes, bench))
    assert(streamed === batch)
    assert(streamed === Set(
      Seq(1L, "kept", true),
      Seq(2L, "quality", false),
      Seq(3L, "exact_dup", false),
      Seq(4L, "contaminated", false)))
  }
}
