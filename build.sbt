ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airflowcmsinpatientetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Forked suites run sequentially (testForkedParallel's default) — pinned
// explicitly because Pipeline.run and the LayoutSpec skew/Bloom tests
// save/mutate/restore session-global conf (broadcast threshold) around
// their bodies, which would race under concurrent suites on the one
// shared SparkSession.
Test / testForkedParallel := false
run / fork := true
// Forked `run` output goes through sbt's logger by default, which
// prefixes every line with "[info] " — that decoration breaks any
// consumer that expects the program's bare stdout (the bench harness
// parses the one-line JSON the Bench main prints). StdoutOutput pipes
// the forked process's stdout straight through, undecorated.
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
  // 24g default: local[32] on the 128 GiB harness box. 8g was measured
  // GC-thrashing the tail of the full-surface bench (round 8: queries
  // late in the 90-query run degraded 3-8x — q83 16.9 s at 8g vs 3.5 s
  // at 24g, total 71 s -> 52 s) — the local-mode analog of sizing
  // executor memory to the workload instead of accepting spill/GC churn.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
