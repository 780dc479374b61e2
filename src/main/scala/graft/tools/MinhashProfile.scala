package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** One-off stage profiler for the MinHash-LSH pipeline (dev tool). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("signatures")(sigs.write.format("noop").mode("overwrite").save())
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.45)
    time("full pipeline")(println("[mh] pairs = " + pairs.count()))
    time("full again")(println("[mh] pairs = " + pairs.count()))
    spark.stop()
  }
}
