package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.stats.{IncrementalStats, QuantileSketch}

/** Persistent incremental column statistics for a catalog table — the
  * storage half of [[graft.stats.IncrementalStats]] (SURVEY §7.4 #13).
  *
  * The store is an append-only parquet log of sketch rows. When a new data
  * partition lands (an ingest batch, a day of events), `append` scans ONLY
  * the new rows and adds their sketch; `read` folds the whole log into
  * current table stats. History is never rescanned — at 100 TB the stats
  * cost is proportional to the new data, and the log itself stays tiny
  * (one row per column per appended partition, ~KBs).
  *
  * `compact` folds the log down to one row per column when the append count
  * grows; because [[IncrementalStats.fold]] preserves the HLL binary, a
  * compacted store keeps accepting appends with no loss. The reference
  * recomputes its catalog metadata by rescanning every CSV on demand
  * (metadata.py chunked scans); this replaces that with an
  * incrementally-maintained equivalent.
  */
object StatsStore {

  /** The moments log lives under `moments/` and the quantile log under
    * `quantiles/` so each parquet read sees a single-schema directory and
    * compaction of one log can never touch the other. */
  private def momentsDir(statsDir: String): String =
    s"${statsDir.stripSuffix("/")}/moments"
  private def quantilesDir(statsDir: String): String =
    s"${statsDir.stripSuffix("/")}/quantiles"

  /** Sketch `newData` (one scan of the new rows only) and append to the
    * store at `statsDir`, tagged `partId` for provenance/debugging. */
  def append(statsDir: String, newData: DataFrame, cols: Seq[String],
      partId: String): Unit =
    IncrementalStats
      .sketch(newData, cols, org.apache.spark.sql.functions.lit(partId))
      .coalesce(1) // a handful of KB-sized rows; one file per append
      .write.mode(SaveMode.Append).parquet(momentsDir(statsDir))

  /** Current table stats: the whole log folded. Exact count/sum/min/max/
    * mean/var; HLL-estimated distinct. */
  def read(spark: SparkSession, statsDir: String): DataFrame =
    IncrementalStats.merge(spark.read.parquet(momentsDir(statsDir)))

  /** Raw sketch rows (for inspection / cross-store folding). */
  def sketches(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(momentsDir(statsDir))

  /** Rewrite the log as one folded row per column. The fold is computed
    * and materialized on the driver first (the log is per-column-per-append
    * tiny by construction), written to a sibling temp dir, and swapped in
    * with delete+rename — a direct Overwrite of `statsDir` would delete
    * the only copy of the (unrecoverable) HLL sketches before the new
    * files commit, so a crash mid-compaction would destroy the log. With
    * the swap, a crash leaves either the old log or the complete folded
    * copy under `<statsDir>.compacting` to recover from. */
  def compact(spark: SparkSession, statsDir: String): Unit = {
    val mDir = momentsDir(statsDir)
    val log = spark.read.parquet(mDir)
    val folded = IncrementalStats.fold(log)
    val rows = folded.collect().toSeq
    val schema = folded.schema
    val tmpDir = mDir + ".compacting"
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(mDir)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = path.getFileSystem(conf)
    fs.delete(path, true)
    require(fs.rename(tmp, path),
      s"compact: rename $tmpDir -> $mDir failed; folded log preserved at $tmpDir")
  }

  /** Partition ids currently in the log (compaction collapses them). */
  def partIds(spark: SparkSession, statsDir: String): Seq[String] =
    spark.read.parquet(momentsDir(statsDir)).select(col("part")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Quantile twin of [[append]]: sketch the new partition's log-bucket
    * histogram ([[QuantileSketch]]) into the `quantiles/` sub-log. Kept
    * separate from the moments log because the schemas differ; the same
    * append-per-batch / merge-at-read lifecycle applies. */
  def appendQuantiles(statsDir: String, newData: DataFrame, cols: Seq[String],
      partId: String, alpha: Double = QuantileSketch.DefaultAlpha): Unit =
    QuantileSketch
      .sketch(newData, cols, org.apache.spark.sql.functions.lit(partId), alpha)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(quantilesDir(statsDir))

  /** Current quantile estimates for one column from the quantile sub-log. */
  def readQuantiles(spark: SparkSession, statsDir: String, colName: String,
      qs: Seq[Double],
      alpha: Double = QuantileSketch.DefaultAlpha): Map[Double, Double] =
    QuantileSketch.quantiles(
      QuantileSketch.merge(spark.read.parquet(quantilesDir(statsDir))),
      colName, qs, alpha)

  /** `foreachBatch` function for streaming ingestion: every micro-batch's
    * sketch appends under its batch id, so table stats stay current AS the
    * stream lands — the streaming face of the incremental-stats contract
    * (each batch scanned once, history never rescanned).
    *
    *   stream.writeStream.foreachBatch(StatsStore.appendBatchSink(dir, cols))
    *
    * Batch-id part tags make replayed micro-batches (failure recovery
    * re-runs the last uncommitted batch) overwrite-equivalent ONLY if the
    * caller dedups; for exactly-once stats, compact+audit on recovery or
    * tolerate the one-batch double-count. */
  def appendBatchSink(statsDir: String, cols: Seq[String]):
      (DataFrame, Long) => Unit =
    (batch, batchId) => append(statsDir, batch, cols, s"batch-$batchId")
}
