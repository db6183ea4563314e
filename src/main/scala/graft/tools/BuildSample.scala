package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.sources.Tables

/** Throwaway build-time sampler: rebuilds a query's DataFrame in a loop
  * while a sampler thread histograms every RUNNABLE thread's stack
  * frames (build work under AQE spans the main thread plus scheduler /
  * broadcast threads, so filtering to main would hide where waves go),
  * attributing driver-side build cost (plan/exec prep per
  * localCheckpoint, artifact reads, ...) to real frames.
  *
  * Usage: runMain graft.tools.BuildSample <dir> <query> [reps]
  * Core count from SPARK_GRAFT_CPUS (default 32) like the bench.
  */
object BuildSample {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Tables.NanosFlag, "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one warm run (artifact builds, codegen cache)
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      import scala.jdk.CollectionConverters._
      while (run) {
        val all = Thread.getAllStackTraces.asScala
        all.foreach { case (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !t.getName.contains("buildsampler")) {
            val interesting = st.iterator.map(_.toString)
              .filter(f => f.startsWith("org.apache.spark") ||
                f.startsWith("graft") || f.startsWith("org.codehaus") ||
                f.startsWith("org.apache.parquet"))
              .take(4).toList
            if (interesting.nonEmpty)
              hist.merge(interesting.mkString(" <- "), 1, (a, b) => a + b)
          }
        }
        Thread.sleep(7)
      }
    }, "buildsampler")
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.assertAnalyzed()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val tBuild = (System.nanoTime() - t0) / 1e9
    run = false
    Thread.sleep(50)
    println(f"BUILDSAMPLE $name reps=$reps total=${tBuild}%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, n) =>
      println(f"$n%5d  $k")
    }
    spark.stop()
  }
}
