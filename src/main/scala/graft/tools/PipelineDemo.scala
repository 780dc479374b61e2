package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** End-to-end training-data pipeline demo over the documents table:
  *
  *   read → language ID → quality score → quality gate → exact dedup →
  *   MinHash near-dup removal → fingerprint + stats → write parquet
  *
  *   sbt "runMain graft.tools.PipelineDemo [sfDir] [outDir]"
  *
  * Every stage is a DataFrame transform (one job at the end), so Catalyst
  * fuses the scalar stages into the scan and the only shuffles are the two
  * dedup aggregations — the shape this pipeline keeps at 100 TB.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val t = col("text")

    // Scalar stages — all codegen'd expressions, fused into the scan.
    val annotated = docs.select(
      col("doc_id"), t,
      TextOps.langId(t).as("pred_lang"),
      TextOps.tokenCount(t).as("n_tokens"),
      round(TextOps.qualityScore(t), 6).as("quality"),
      TextOps.fingerprint(t).as("fp"))

    val gated = annotated.filter(col("quality") >= 0.3 && col("n_tokens") >= 8)

    // Exact dedup: keep min doc_id per fingerprint.
    val exactDeduped = Dedup.dropDuplicatesByFingerprint(gated, "doc_id", "text")

    // Near-dup removal: drop the higher id of each MinHash-confirmed pair.
    val nearPairs = Dedup.minhashLshPairs(exactDeduped, "doc_id", "text", threshold = 0.6)
    val losers = nearPairs.select(col("id2").as("doc_id")).distinct()
    val finalDocs = exactDeduped.join(losers, Seq("doc_id"), "left_anti")

    finalDocs.write.mode("overwrite").parquet(s"$outDir/clean_documents")

    val nIn = docs.count(); val nGated = gated.count()
    val nExact = exactDeduped.count(); val nOut = finalDocs.count()
    println(s"[pipeline] in=$nIn qualityGated=$nGated exactDeduped=$nExact " +
      s"nearDeduped=$nOut -> $outDir/clean_documents")
    val langs = finalDocs.groupBy("pred_lang").count().orderBy("pred_lang")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[pipeline] predicted languages: $langs")
    spark.stop()
  }
}
