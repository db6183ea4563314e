package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.EventStream

/** Streaming-path benchmark: drives the EventStream twins over the real
  * event corpus (file source, Trigger.AvailableNow, RocksDB state store,
  * noop sink) and reports wall time, input throughput, and state-store
  * rows/memory from the query's final progress — the streaming analogue
  * of Bench's numbers, so the path has measurements, not just green
  * specs.
  *
  * Usage: runMain graft.tools.StreamBench [sfDir]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(Tables.NanosFlag, "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    // the file stream source wants a DIRECTORY of files (at scale: the
    // landing dir events arrive into); the testdata table is one file,
    // so stage it behind a symlink
    val stage = Files.createTempDirectory("graft-stream-src")
    Files.createSymbolicLink(stage.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    def src: DataFrame = spark.readStream.schema(schema)
      .parquet(stage.toString)

    val plans: Seq[(String, DataFrame)] = Seq(
      "stream_window_agg" -> EventStream.windowAgg(src),
      "stream_sessionize" -> EventStream.sessionize(src),
      "stream_dedup" -> EventStream.dedupEvents(src))

    val results = plans.map { case (name, plan) =>
      val ckpt = Files.createTempDirectory(s"graft-ckpt-$name").toString
      val t0 = System.nanoTime()
      val q = plan.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val state = Option(q.lastProgress)
        .map(_.stateOperators.map(s =>
          (s.numRowsTotal, s.memoryUsedBytes)).toSeq)
        .getOrElse(Seq.empty)
      val (rows, mem) = state.headOption.getOrElse((0L, 0L))
      s""""$name":{"sec":$sec,"events_per_sec":${(nEvents / sec).toLong},""" +
        s""""state_rows":$rows,"state_bytes":$mem}"""
    }
    println(s"""{"metric":"stream","n_events":$nEvents,${results.mkString(",")},"sf":"$dir"}""")
    spark.stop()
  }
}
