package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write-side of the engine: layouts that make the NEXT read fast.
  *
  * The reference hands storage to Postgres (/root/reference/database.py);
  * a Spark-native engine owns its file layout instead, and at 100 TB the
  * layout IS the index:
  *
  *  - sorted+zstd parquet: range-partition then sort within partitions on
  *    the probe keys → parquet row-group min/max stats become a coarse
  *    index (scans with key predicates prune whole files/row groups), and
  *    sorted columns compress far better under zstd;
  *  - bucketed table: hash-bucket + sort by the join key → joins and
  *    aggregations on that key read co-located buckets with NO shuffle
  *    exchange on either side.
  */
object Sinks {

  /** Range-partitioned, partition-sorted, zstd-compressed parquet. */
  def writeSortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
      numPartitions: Int = 0): Unit = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = sortCols.map(col)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(path)
  }

  /** Hive-style partitioned parquet (e.g. by day/hour): a time or tenant
    * predicate becomes directory pruning — the scan never opens
    * non-matching partitions. Low-cardinality partition keys only; a
    * high-cardinality key here is the classic small-files bomb.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("compression", "zstd")
      .parquet(path)

  /** Hash-bucketed (optionally bucket-sorted) parquet table — the CTAS
    * that pre-pays the shuffle of every future join on `bucketCol`.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
