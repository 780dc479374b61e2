package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Diagnosis probe for the j1 broadcast-regime inversion (round-8 verdict
  * item 3): times the customer ⟕ orders join under each physical regime and
  * prints one JSON line per variant.
  *
  * Background: the unhinted plan broadcasts ORDERS — its compressed parquet
  * (~2.7 MB at sf0.1) sits under the 10 MB autoBroadcastJoinThreshold, and
  * a LEFT OUTER join only admits BuildRight, so Catalyst cannot instead
  * broadcast the far smaller filtered hub. The build cost (scan + driver
  * collect + single-threaded HashedRelation of 150 k rows, re-paid every
  * execution) is deterministic — which is exactly why the bench samples sit
  * tightly at ~3× the merge control rather than bouncing like noise.
  *
  *   sbt "runMain graft.tools.J1Probe [iters]"   (SPARK_GRAFT_SF_DIR)
  */
object J1Probe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-j1-probe",
      Map("spark.sql.adaptive.enabled" -> "true"))

    // the j1 join minus the trailing global sort (isolate the join regime)
    def plan(ordersHint: Option[String]): DataFrame = {
      val c = Tables.load(spark, sfDir, "customer").filter(col("c_acctbal") < 0)
      val n = Tables.load(spark, sfDir, "nation")
      val o0 = Tables.load(spark, sfDir, "orders")
      val o = ordersHint.fold(o0)(o0.hint(_))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(c("c_custkey"), c("c_name"), n("n_name"),
          o("o_orderkey"), o("o_totalprice"))
    }

    def timeIt(label: String, threshold: String, hint: Option[String]): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        plan(hint).write.format("noop").mode("overwrite").save() // warm-up
        val samples = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          plan(hint).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val joinNodes = plan(hint).queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join")).map(_.trim.take(60)).mkString(" | ")
        println(f"""{"variant":"$label","median":${samples(samples.size / 2)}%.3f,""" +
          s""""samples":${samples.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
          s""""join_nodes":"$joinNodes"}""")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }

    timeIt("default_broadcasts_orders", "10485760", None)
    timeIt("merge_hint", "10485760", Some("merge"))
    timeIt("shuffle_hash_hint", "10485760", Some("shuffle_hash"))
    timeIt("threshold_1m_no_fact_broadcast", "1048576", None)
    spark.stop()
  }
}
