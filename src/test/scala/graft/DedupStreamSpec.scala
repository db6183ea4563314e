package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.DedupStream

/** Incremental LSH pair maintenance, end-to-end: a file-backed document
  * stream (two micro-batches via maxFilesPerTrigger=1) must reproduce the
  * batch band-candidate set exactly, with re-deliveries as no-ops.
  */
class DedupStreamSpec extends SparkSpecBase {

  private val near1 = "the quick brown fox jumps over the lazy dog again and again"
  private val near2 = near1 + " extra"

  test("incremental candidates across micro-batches equal the batch set") {
    val b1 = Seq(doc(1, near1), doc(2, near2),
      doc(5, "unrelated totally different text with many various words here"))
    // batch 2 re-delivers doc 1 (must be a no-op) and lands doc 3, a
    // third near-dup that must pair against the STATE from batch 1
    val b2 = Seq(doc(1, near1), doc(3, near1),
      doc(4, "another completely distinct document about other topics entirely"))
    val stage = stageBatches(Seq(b1, b2))
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = DedupStream.candidatePairs(src)
      .writeStream.format("memory").queryName("cand_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = spark.table("cand_out").select("id_a", "id_b")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs collide in every band; the cross-batch pairs (1,3)
    // and (2,3) exist only because bucket state carried over
    assert(streamed.contains((1L, 3L)))
    // no self pairs from the re-delivery
    assert(streamed.forall { case (a, b) => a < b })
    // exact parity with the batch candidate generator on the same corpus
    val dir = fixtureDir(docs = b1 ++ b2.filterNot(_.doc_id == 1))
    val batch = Dedup.minhashCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("maintainPairs: drained pair store equals the batch verified set") {
    val b1 = Seq(doc(1, near1), doc(2, near2),
      doc(5, "unrelated totally different text with many various words here"))
    // re-delivery of doc 1 must be a full no-op (no duplicate shingles,
    // no duplicate pairs); doc 3 pairs against BOTH stored near-dups
    val b2 = Seq(doc(1, near1), doc(3, near1),
      doc(4, "another completely distinct document about other topics entirely"))
    val stage = stageBatches(Seq(b1, b2))
    val store = java.nio.file.Files
      .createTempDirectory("graft-pair-store").toString
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = DedupStream.maintainPairs(src, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = rows(spark.read.parquet(s"$store/pairs")
      .select("id_a", "id_b", "jaccard"))
    val dir = fixtureDir(docs = b1 ++ b2.filterNot(_.doc_id == 1))
    val batch = rows(Dedup.dedupMinhash(spark, dir)
      .select("id_a", "id_b", "jaccard"))
    assert(streamed === batch)
    // re-delivered doc 1 left exactly one copy of its shingle set
    val shCount = spark.read.parquet(s"$store/shingles")
      .where("doc_id = 1").select("g").distinct().count()
    val shRows = spark.read.parquet(s"$store/shingles")
      .where("doc_id = 1").count()
    assert(shCount === shRows)
  }
}
