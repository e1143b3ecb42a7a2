ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kamuenginedatafusionspark"
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
// The driver parses Bench's ONE-line JSON from the tail of sbt's stdout;
// sbt's "[success] Total time: …" epilogue printed after it broke that
// parse in rounds 1-2 (BENCH_r0{1,2}.json: parsed=null). Suppress it so
// the JSON line is the last thing on stdout.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked `run` output normally passes through sbt's logger, which prefixes
// every line with "[info] " — also fatal to a json.loads of the line.
// StdoutOutput forwards the child's stdout verbatim.
run / outputStrategy := Some(StdoutOutput)
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
)

// r20 (VERDICT r19 item 2): the test suite outran the driver's verify
// window at ~48 min of strictly sequential suites in one forked JVM —
// VERIFY_r19 recorded tests_ok=false on a CUT-OFF run with zero failing
// tests. The suites are independent by construction (each builds its own
// SparkSession, binds servers on ephemeral ports, and works in unique
// temp dirs), so run each suite in its OWN forked JVM, four at a time:
// wall becomes ~max(longest suite, total/4) instead of the sum. Memory:
// 4 × Xmx8g JVMs fits the 128 GiB sandbox with wide margin; assertion
// count and per-suite behavior are unchanged.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  // Schedule the longest suites FIRST: with 4 concurrent groups the wall
  // is max(longest suite, total/4) only when the long ones are not queued
  // last — the first parallel run measured EngineContractProps (~20 min of
  // ingest-fuzz, the suite-time maximum) starting in the final slot and
  // the wall barely moved. Durations from tools/test_r20_durations.txt.
  val slowFirst = Seq(
    "EngineContractProps", "TextContractProps", "FuzzDifferentialSpec",
    "StructuredContractProps", "OperatorsSpec", "GrpcServerSpec")
  val ordered = (Test / definedTests).value.sortBy { t =>
    val i = slowFirst.indexOf(t.name.split('.').last)
    if (i >= 0) i else slowFirst.size
  }
  ordered.map { t =>
    Tests.Group(t.name, Seq(t), Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 4)
