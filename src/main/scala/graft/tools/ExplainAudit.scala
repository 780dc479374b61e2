package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the formatted physical plan of each (or one named) headline query —
  * the scale audit: check PushedFilters/ReadSchema on scans, broadcast vs
  * shuffle joins, WholeStageCodegen spans, exchange counts.
  *
  *   sbt "runMain graft.tools.ExplainAudit [queryName] [sfDir]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.filter(_.nonEmpty).map(Seq(_))
      .getOrElse(graft.Bench.headline)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(4, "graft-explain-audit", logLevel = "ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
