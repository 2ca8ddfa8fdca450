ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gdalosspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession — run them sequentially
Test / parallelExecution := false
run / fork := true
// Forked run output goes straight to this process's stdout, WITHOUT
// sbt's "[info] " logger prefix — the bench driver parses the last
// stdout line as JSON and the prefix defeated that parse for 14
// rounds (BENCH_r*.json "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own trailing "[success] Total time: ..."
// line so the bench's compact JSON really is the last line emitted.
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 64 queries × warmup+3 runs generate a LOT of whole-stage-codegen
  // classes; the default 240m JIT code cache fills mid-bench, the
  // compiler shuts off, and late queries silently run interpreted
  // (observed 10-30× per-query slowdowns). spark-submit sets this
  // too — a plain JVM launch must do it itself.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
