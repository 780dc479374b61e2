package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.stats.ColumnStats

/** One-off stage profiler for the T1 column-stats pipeline (dev tool). */
object StatsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-stats-profile")
    val li = graft.Tables.load(spark, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t1] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // full describe, cold then warm
    time("describe cold")(ColumnStats.describe(li, cols))
    time("describe warm")(ColumnStats.describe(li, cols))

    // base aggregate alone
    val aggs = cols.flatMap(c => Seq(count(col(c)), avg(col(c)), stddev_samp(col(c)),
      min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType),
      skewness(col(c)), kurtosis(col(c))))
    time("base agg")(li.agg(aggs.head, aggs.tail: _*).head())

    // histogram groupBy alone
    val pairs = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(DoubleType).as("v"))): _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val hist = pairs.groupBy("c", "v").agg(count(lit(1)).as("n"))
    time("histogram groupBy")(hist.write.format("noop").mode("overwrite").save())
    println("[t1] hist sizes: " + hist.groupBy("c").count().collect().mkString(", "))
    spark.stop()
  }
}
