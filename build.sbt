ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oroborodwdbtspark"
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
// Pass the forked JVM's stdout through UNPREFIXED: sbt's default
// LoggedOutput decorates every line with "[info] ", which turns the
// bench main's final bare-JSON summary line into non-JSON and defeated
// the driver's line-oriented artifact parser for four rounds
// (BENCH_r14..r17 all "parsed": null). StdoutOutput writes the child
// process's stdout straight to sbt's stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop sbt's trailing "[success] Total time: ..." line so the compact
// JSON printed after spark.stop() is the LAST line of stdout.
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
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
  // BigQuery SAFE.-parse parity (BASELINE.md): null on unparsable, don't throw.
  "-Dspark.sql.ansi.enabled=false",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// r19: `sbt test` ran all 24 suites sequentially in ONE forked JVM —
// 19.5 min wall with <2 of 32 cores busy, which outran the round
// driver's test budget (r18: killed mid-suite, tests_ok=false with
// zero failures). Suites now split across SPARK_GRAFT_TEST_GROUPS
// (default 4) forked JVMs that run CONCURRENTLY; the measured-heavy
// suites are pinned to distinct groups and the rest round-robin
// deterministically by name. Each group gets its OWN java.io.tmpdir
// and warehouse dir so fixed-path scratch tables (graft_cdc_compact
// et al.) cannot collide across concurrent JVMs.
val testGroupCount = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "4").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val n = math.max(1, testGroupCount)
  // measured r19 (sequential, seconds): QueriesSmoke 213, PlanAudit
  // 200, GraftFunctions 126, GraphSpec ~120, Ext 101, Streaming 87,
  // DbtProject 68, EvalStats 63, Property 58
  val heavy = Map(
    "graft.QueriesSmokeSpec" -> 0, "graft.PlanAuditSpec" -> 1,
    "graft.GraphSpec" -> 2, "graft.GraftFunctionsSpec" -> 3,
    "graft.StreamingSpec" -> 2, "graft.ExtSpec" -> 1,
    "graft.EvalStatsSpec" -> 0, "graft.DbtProjectSpec" -> 3,
    "graft.PropertySpec" -> 2)
  tests.groupBy(td =>
      heavy.getOrElse(td.name, math.abs(td.name.hashCode) % n) % n)
    .toSeq.sortBy(_._1).map { case (i, ts) =>
      val tmp = s"/tmp/graft-test-g$i"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      Tests.Group(s"g$i", ts, Tests.SubProcess(ForkOptions()
        .withRunJVMOptions(baseOpts ++ Vector(
          s"-Djava.io.tmpdir=$tmp",
          s"-Dspark.sql.warehouse.dir=$tmp/spark-warehouse"))))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, math.max(1, testGroupCount)),
  Tags.limitAll(math.max(4, testGroupCount)))
