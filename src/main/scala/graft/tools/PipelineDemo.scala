package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextOps}

/** End-to-end training-data pipeline demo over the documents table:
  *
  *   read → language ID → quality score → quality gate → exact dedup →
  *   near-dup CLUSTER dedup (keep best quality per cluster) →
  *   deterministic train/val/test split → write parquet + stats sketch
  *
  *   sbt "runMain graft.tools.PipelineDemo [sfDir] [outDir]"
  *
  * Every stage is a DataFrame transform, so Catalyst fuses the scalar
  * stages into the scan; the shuffles are the dedup aggregations and the
  * cluster propagation — the shape this pipeline keeps at 100 TB. Cluster
  * dedup (not pair-drop): dropping `id2` of each confirmed pair keeps two
  * documents whose only link was a third, already-dropped one — clusters
  * close that hole.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val spark = graft.GraftSession.local(8, "graft-pipeline-demo")

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

    // Near-dup cluster dedup: one keeper per connected component — the
    // HIGHEST-quality member, not just the lowest id. Cached: the write,
    // the stats append, and the three report aggregations below all
    // consume it, and without the cache each would re-run the scan ->
    // annotate -> gate -> dedup chain.
    val nearDeduped = Dedup.deduplicateCorpusBy(
        exactDeduped, "doc_id", "text", "quality", threshold = 0.6)
      .cache()

    // Deterministic split: the same doc lands in the same file on every
    // rerun, engine, and cluster size.
    val splitDocs = Sampling.hashSplit(nearDeduped, Seq("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    splitDocs.write.partitionBy("split")
      .mode("overwrite").parquet(s"$outDir/clean_documents")

    // Incremental stats: this run's sketch appends to the corpus log. The
    // demo REBUILDS clean_documents on rerun, so the old log must go too —
    // appending under the same partId would double-count the corpus.
    val statsDir = s"$outDir/stats"
    val fs = new org.apache.hadoop.fs.Path(statsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(statsDir), true)
    graft.catalog.StatsStore.append(statsDir,
      splitDocs, Seq("n_tokens", "quality"), partId = s"demo-$sfDir")

    val nIn = docs.count(); val nGated = gated.count()
    val nExact = exactDeduped.count(); val nOut = nearDeduped.count()
    println(s"[pipeline] in=$nIn qualityGated=$nGated exactDeduped=$nExact " +
      s"clusterDeduped=$nOut -> $outDir/clean_documents")
    val splits = splitDocs.groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[pipeline] splits: $splits")
    val langs = nearDeduped.groupBy("pred_lang").count().orderBy("pred_lang")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[pipeline] predicted languages: $langs")
    val stats = graft.catalog.StatsStore.read(spark, s"$outDir/stats")
      .select("col_name", "n_value", "mean_v", "distinct_est")
      .orderBy("col_name").collect()
      .map(r => s"${r.getString(0)}(n=${r.getLong(1)}, mean=${"%.3f".format(r.getDouble(2))}, ~distinct=${r.getLong(3)})")
      .mkString("; ")
    println(s"[pipeline] corpus stats: $stats")
    spark.stop()
  }
}
