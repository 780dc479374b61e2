package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // INFO logging wrote ~18 MB per suite run through sbt's logger — real
    // wall time and a driver-capture window full of noise. WARN matches
    // every GraftSession main.
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    // Shared across suites in one JVM; don't stop, just clear cache state.
    spark.catalog.clearCache()
    super.afterAll()
  }

  /** Count Spark jobs launched while `f` runs. The listener bus is async, so
    * after `f` returns the count is polled until it stays stable for 100 ms
    * (bounded at 5 s). Use for coarse comparisons (fewer/more), not exact
    * job totals — Spark internals may split work differently per version. */
  def countJobs(f: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var prev = -1; var cur = counter.get(); var tries = 0
      while (cur != prev && tries < 50) {
        Thread.sleep(100); prev = cur; cur = counter.get(); tries += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
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
