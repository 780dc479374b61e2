package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.catalog.Layout

/** Bucketed-layout crossover experiment (round-7 verdict item 6).
  *
  * At sf0.1 the zero-exchange bucketed star join is SLOWER than its
  * shuffle+sort control: orders is ~2.7 MB / 150 k rows, so the shuffle the
  * layout eliminates costs less than the bucketed read's fixed overhead
  * (32 single-file bucket tasks, catalog-table scan path). The layout is a
  * 100 TB design — this main produces the evidence for WHERE the crossover
  * sits by scaling customer/orders K× (key-offset unions of the sf0.1
  * tables, written once to a scratch dir) and timing both regimes at each K.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.LayoutBench 1,20,100"
  * Prints one JSON line per scale:
  *   {"scale":K,"orders_rows":N,"merge_sec":med,"bucketed_sec":med,
  *    "layout_build_sec":s,"samples":{...}}
  * Results are recorded in README.md §perf (bucketed-layout crossover).
  */
object LayoutBench {

  /** Cheap content fingerprint of the tables this bench scales: every
    * parquet part's relative path, size, and mtime under customer/orders.
    * Hex-truncated MD5 — collision-irrelevant (cache key, not security). */
  private def sourceFingerprint(sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val sig = Seq("customer.parquet", "orders.parquet").flatMap { t =>
      val p = Paths.get(sfDir, t)
      if (!Files.exists(p)) Seq(s"$t:absent")
      else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => s"${p.relativize(f)}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .toSeq.sorted
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 20, 100))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-layout-bench",
      Map("spark.sql.adaptive.enabled" -> "true"))

    // Scratch copies and bucketed tables are keyed on a fingerprint of the
    // SOURCE parquet (paths + sizes + mtimes), so a testdata regeneration —
    // the exact hazard that corrupted the r8 bench snapshot — invalidates
    // them by construction instead of silently reusing stale data.
    val fp = sourceFingerprint(sfDir)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_layout_bench/$fp"
    val wh = s"$base/warehouse"

    for (k <- scales) {
      val dir = s"$base/x$k"
      val done = new java.io.File(s"$dir/_done")
      if (!done.exists()) {
        // K× the sf0.1 tables by key-offset union: every copy's custkeys are
        // shifted by i*stride, so join fan-out per key is UNCHANGED — the
        // data gets bigger, not more skewed.
        val c = Tables.load(spark, sfDir, "customer")
        val o = Tables.load(spark, sfDir, "orders")
        val stride = c.agg(max("c_custkey")).head.getLong(0) + 1
        def scaled(df: DataFrame, key: String): DataFrame =
          (0 until k).map(i => df.withColumn(key, col(key) + lit(i * stride)))
            .reduce(_ unionAll _)
        scaled(c, "c_custkey").write.mode("overwrite").parquet(s"$dir/customer")
        scaled(o, "o_custkey").write.mode("overwrite").parquet(s"$dir/orders")
        done.getParentFile.mkdirs()
        done.createNewFile()
      }

      def customers = spark.read.parquet(s"$dir/customer")
      def orders = spark.read.parquet(s"$dir/orders")
      val ordersRows = orders.count()

      // Same join shape as j1_star_left_join_merge/_bucketed minus the
      // broadcast nation dim (irrelevant to the layout question): filtered
      // hub ⟕ behavioral on custkey, MERGE-pinned so AQE can't broadcast
      // the filtered hub and bypass the regime under measurement.
      def mergePlan: DataFrame = {
        val c = customers.filter(col("c_acctbal") < 0)
        val o = orders.hint("merge")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
      }

      val tL0 = System.nanoTime()
      val bc = Layout.ensureBucketed(
        spark, customers, "c_custkey", 32, wh, s"lb_${fp}_customer_x$k")
      val bo = Layout.ensureBucketed(
        spark, orders, "o_custkey", 32, wh, s"lb_${fp}_orders_x$k")
      val layoutSec = (System.nanoTime() - tL0) / 1e9

      def bucketedPlan: DataFrame = {
        val c = bc.filter(col("c_acctbal") < 0)
        val o = bo.hint("merge")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
      }

      def timeMedian(plan: => DataFrame): (Double, Seq[Double]) = {
        plan.write.format("noop").mode("overwrite").save() // warm-up
        val samples = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          plan.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        (samples(samples.size / 2), samples)
      }

      val (mergeMed, mergeS) = timeMedian(mergePlan)
      val (bktMed, bktS) = timeMedian(bucketedPlan)
      val json =
        f"""{"scale":$k,"orders_rows":$ordersRows,"merge_sec":$mergeMed%.3f,""" +
        f""""bucketed_sec":$bktMed%.3f,"layout_build_sec":$layoutSec%.3f,""" +
        s""""merge_samples":${mergeS.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
        s""""bucketed_samples":${bktS.map(s => f"$s%.3f").mkString("[", ",", "]")}}"""
      println(json)
      System.err.println(s"[layout-bench] $json")
    }
    spark.stop()
  }
}
