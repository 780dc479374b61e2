package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for bench/gate queries to one file each —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [name1,name2,...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default min(32, cores)).
  *
  * Queries whose gate closure executes actions while BUILDING the frame
  * (iterative ops) still run those; the dumped plan is the returned tail.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [names]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.local(cpus.toInt, "graft-plandump",
      Map("spark.sql.adaptive.enabled" -> "true"))
    val queries = SparkEntry.queries
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.Bench.headline.filter(queries.contains)
    names.foreach { n =>
      require(queries.contains(n), s"unknown query: $n")
      try {
        val df = queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"$n.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
