ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mldatawranglerspark"
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
// Raw stdout for the forked run: the driver greps Bench's single JSON
// result line, and sbt's default logger would prefix it with "[info] "
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 126-query bench generates thousands of unique whole-stage-codegen
  // classes; the default 240 MB code cache fills mid-sequence and the
  // JVM's silent flush→re-JIT churn inflated EXECUTOR CPU 8x on identical
  // stages late in the run (q55 taskTime 25s -> 208s, gc ~0 — the diag
  // listener's signature). 1 GiB helped but the round-14 diag still saw
  // the signature on q70's in-sequence runs (taskTime 71s -> 232s, gc ~0,
  // same 33 stages) with ~157 queries x 2-5 runs compiled; 2 GiB of
  // reserved (virtual, committed on use) costs nothing on a 128 GiB host.
  "-XX:ReservedCodeCacheSize=2g",
  // 16g default: the 8g heap let old-gen pressure from earlier queries in
  // a long run distort later per-query timings (observed 2.5s -> 79s on a
  // percentile-buffer agg mid-bench); the host has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
