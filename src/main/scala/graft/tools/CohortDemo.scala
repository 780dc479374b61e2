package graft.tools

import org.apache.spark.sql.SparkSession

import graft.catalog.TableCatalog
import graft.core.{EngineConfig, Filter}
import graft.core.Filter._
import graft.query.CohortQuery

/** End-to-end demo of the cohort engine on a CSV data directory — the
  * reference's interactive workflow (SURVEY.md §3.1–3.2) as a CLI:
  *
  *   sbt "runMain graft.tools.CohortDemo <dataDir>"
  *
  * With no args, a longitudinal fixture directory is generated in /tmp.
  * Prints detected structure, live count, and the merged data preview.
  */
object CohortDemo {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse(writeFixture())
    val spark = graft.GraftSession.local(4, "graft-cohort-demo")

    val catalog = new TableCatalog(spark, EngineConfig(dataDir))
    println(s"tables: ${catalog.tableNames.mkString(", ")}")
    println(s"structure: ${catalog.mergeKeys}")
    println(s"sessions: ${catalog.sessionValues.mkString(", ")}")

    val query = CohortQuery(
      catalog,
      filters = Seq(
        AgeRange(18, 65),
        NumericRange("cognitive", "working_memory", 90, 120)),
      selections = Seq(("cognitive", "working_memory")))
    println(s"live participant count: ${query.count()}")
    println("merged data:")
    query.data.orderBy(catalog.mergeKeys.mergeColumn).show(50, truncate = false)
    spark.stop()
  }

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-demo")
    def w(name: String, s: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), s.stripMargin.trim + "\n")
    w("demographics.csv",
      """ursi,session_num,age,sex
        |S001,BAS1,25,1.0
        |S001,BAS2,26,1.0
        |S002,BAS1,31,2.0
        |S002,BAS2,32,2.0
        |S003,BAS1,71,1.0""")
    w("cognitive.csv",
      """ursi,session_num,working_memory,processing_speed
        |S001,BAS1,105,45
        |S001,BAS2,107,44
        |S002,BAS1,98,52
        |S002,BAS2,85,51
        |S003,BAS1,112,39""")
    dir.toString
  }
}
