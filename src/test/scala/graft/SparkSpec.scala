package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Shared across suites in one JVM; don't stop, just clear cache state.
    spark.catalog.clearCache()
    super.afterAll()
  }

  /** Write CSV fixture files into a temp dir; returns the dir path. */
  def fixtureDir(files: (String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture")
    files.foreach { case (name, content) =>
      java.nio.file.Files.writeString(dir.resolve(name), content.stripMargin.trim + "\n")
    }
    dir.toString
  }
}
