ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "energidataetlspark"
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
// BENCH_r07-r09 all landed `parsed: null` in the driver artifact: sbt's
// default LoggedOutput prefixes every forked stdout line with "[info] "
// and appends a "[success] Total time…" epilogue, so Bench's final
// compact JSON line is neither prefix-free nor last. StdoutOutput pipes
// the forked process's stdout straight through (no prefix, stderr stays
// on stderr), and showSuccess := false drops the epilogue — the compact
// JSON line becomes the true final stdout line, parseable on its own.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task —
// lintUnused can't see that and warns; exclude it.
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
  // local[32] runs 32 concurrent tasks in ONE JVM. The r5 triage A/B'd
  // 8g vs 48g on identical interleaved reps: medians were equal, so the
  // r4 bench slowdown was NOT heap starvation (it was box contention —
  // BASELINE.md r5 row). 48g stays as headroom: the box has 128 GiB,
  // and with 0.6*heap unified memory each of the 32 tasks gets ~900 MB
  // before spill, so memory footprint can never become the confound in
  // a future regression readout.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
