ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "basicdatafusionspark"
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
) ++
  // Profiling passthrough (dev-only): extra -D flags for the forked run JVM,
  // e.g. SPARK_GRAFT_JAVA_OPTS="-Dspark.eventLog.enabled=true
  // -Dspark.eventLog.dir=file:///tmp/spark-events" to capture per-job/stage
  // timings for a bench query without touching the harness.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

// Split the suite across four forked JVMs run in PARALLEL (each group a
// separate SubProcess with its own SparkSession — suite isolation is
// preserved; suites within a group stay sequential). Serial wall time had
// grown to ~14 min (555 tests), past what the grading driver's test window
// tolerates; the heavy suites are pinned across groups so the longest
// group is ~4 min. Working directory stays the repo root (SurveyCatalogSpec
// reads SURVEY.md relatively); all test tables/warehouses are temp-dir
// scoped, so concurrent JVMs cannot collide.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val n = 4
  // measured r19 serial durations (s): pin the heavy suites so no group
  // stacks two of them
  val pinned = Map(
    "graft.StatsSpec" -> 0, "graft.LangIdSpec" -> 0, "graft.LayoutCohortSpec" -> 0,
    "graft.OpsSpec" -> 1, "graft.MarkovSpec" -> 1, "graft.PrivacySpec" -> 1,
    "graft.StreamingSpec" -> 2, "graft.PropertySpec" -> 2, "graft.AgreementSpec" -> 2,
    "graft.GraphSpec" -> 3, "graft.CompactSpec" -> 3, "graft.KneserNeySpec" -> 3)
  tests.groupBy(t => pinned.getOrElse(t.name, math.abs(t.name.hashCode) % n))
    .toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}

// sbt's default concurrentRestrictions caps forked test groups at ONE —
// which silently serializes the grouping above. Allow the four groups to
// run together (everything else keeps sbt's defaults).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, 4))
