package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.stats.ColumnStats

/** Dev-only micro-profiler for the t1 column-stats path: times each phase
  * (scan+agg, combined small-col histogram, per-column big-col sort) in
  * isolation so perf work targets the real cost, not a guess. Not part of
  * the driver contract; run with
  * `sbt "runMain graft.tools.Probe /root/testdata/sf0.1"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-probe")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val li = Tables.load(spark, sfDir, "lineitem")
    time("count (scan warm-up)")(li.count())

    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    // Pass 1 aggregate as describe() builds it
    time("pass1 agg (moments + HLL)") {
      val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"n__$c"), avg(col(c)).as(s"mean__$c"),
          stddev_samp(col(c)).as(s"std__$c"),
          min(col(c)).cast("double").as(s"min__$c"),
          max(col(c)).cast("double").as(s"max__$c"),
          skewness(col(c)).as(s"skew__$c"), kurtosis(col(c)).as(s"kurt__$c"),
          approx_count_distinct(col(c)).as(s"d__$c"))
      }
      li.agg(aggs.head, aggs.tail: _*).head()
    }

    // Combined histogram for the two low-cardinality columns
    time("small-col explode+groupBy histogram") {
      val small = Seq("l_quantity", "l_discount")
      val pairs = li.select(explode(array(small.map(c =>
          struct(lit(c).as("c"), col(c).cast("double").as("v"),
            col(c).cast("string").as("vs"))): _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"), col("p.vs").as("vs"))
        .filter(col("v").isNotNull && !isnan(col("v")))
      pairs.groupBy("c", "v", "vs").agg(count(lit(1)).as("n")).collect().length
    }

    // Big-column narrow histogram → RDD prefix-scan pieces
    val bigHist = li.select(col("l_extendedprice").cast("double").as("v"),
        col("l_extendedprice").cast("string").as("vs"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy("v", "vs").agg(count(lit(1)).as("n"))
      .select("v", "n")
    val entries = time("big-col groupBy(v) count")(bigHist.count())
    System.err.println(s"[probe] l_extendedprice histogram entries: $entries")
    val rdd = bigHist.rdd.map(r => (r.getDouble(0), r.getLong(1)))
    time("big-col rdd sortBy + count") {
      val s = rdd.sortBy(_._1); s.cache(); s.count()
    }
    time("full describe() (end-to-end)") {
      ColumnStats.describe(li, cols)
    }
    time("full describe() again (warm)") {
      ColumnStats.describe(li, cols)
    }
    spark.stop()
  }
}
