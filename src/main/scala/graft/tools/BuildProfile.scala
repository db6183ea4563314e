package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** THROWAWAY build-time decomposition probe (r14): times the pieces a
  * build-bound query's DataFrame construction is made of — artifact
  * parquet reads vs lazy-localCheckpoint plannings — so the fix lands
  * on the right one. Delete before commit.
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(Tables.NanosFlag, "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"BP $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the artifact stores (run-1 builds) outside the timings
    graft.SparkEntry.queries("append_churn")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // 1. bare artifact reads
      val g = t("read knn-graph")(
        spark.read.parquet(graft.operators.Similarity.knnGraphPath(dir)))
      t("read knn-graph again")(
        spark.read.parquet(graft.operators.Similarity.knnGraphPath(dir)))
      val e = t("read embeddings (Tables)")(Tables.embeddings(spark, dir))
      // 2. a representative checkpoint planning: one walk-round-shaped
      //    subplan over already-flat leaves
      val flatG = t("ckpt graph frame")(g.localCheckpoint(false))
      val j = flatG.alias("a").join(flatG.alias("b"),
          col("a.dst") === col("b.src"))
        .select(col("a.src").as("s2"), col("b.dst").as("d2"))
        .distinct()
        .groupBy(col("s2")).agg(count(lit(1)).as("c"))
      val jf = t("ckpt join+distinct+agg")(j.localCheckpoint(false))
      t("analyze-only 10 withColumns") {
        (1 to 10).foldLeft(jf)((d, i) => d.withColumn(s"x$i", lit(i)))
      }
      // 3. the full query build, end to end
      t("append_churn full build")(
        graft.SparkEntry.queries("append_churn")(spark, dir))
      t("dedup_delta full build")(
        graft.SparkEntry.queries("dedup_delta")(spark, dir))
      t("decontam_sweep full build")(
        graft.SparkEntry.queries("decontam_sweep")(spark, dir))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
