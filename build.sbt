ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "psysupabasespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver tail-parses stdout for Bench's one-line JSON metric. Raw
// forked output (no [info] prefix) + no trailing "[success] Total time"
// line keeps that JSON as the LAST stdout line (BENCH_r1-r5 all recorded
// "parsed": null because sbt's epilogue followed the metric line).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (overridable): a combined driver+executor local JVM
  // running 32 task slots at 8g leaves ~150 MB execution memory per
  // slot and the driver's retained plan/broadcast state competes with
  // it — a full-sweep A/B measured 312.8 -> 301.5 s (sf0.1, CPUS=32)
  // from the heap bump alone (guide §5's "more memory per concurrent
  // task"). Not a local[32] constant: the env var stays the knob and
  // any production driver sizes its heap to its slot count the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
