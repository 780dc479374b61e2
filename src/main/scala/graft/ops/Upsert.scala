package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance over plain parquet: apply a batch of
  * upserts (new + changed rows, keyed) and deletes WITHOUT rewriting the
  * whole corpus — the maintain-daily economics a 100 TB training corpus
  * needs between full rebuilds.
  *
  * Layout: the corpus is partitioned by `bucket = pmod(xxhash64(key), n)`
  * (directory-level partitioning, so scans prune buckets for free). An
  * upsert batch touches only the buckets its keys hash into:
  *
  *  1. the affected bucket list is the batch's distinct bucket values
  *     (≤ nBuckets integers to the driver);
  *  2. ONLY those bucket directories are read back (partition pruning),
  *     anti-joined on the key against the batch (drop replaced/deleted
  *     rows), unioned with the batch;
  *  3. the result is written with DYNAMIC partition overwrite, which
  *     replaces exactly the partitions present in the write — untouched
  *     bucket directories are never opened, never rewritten.
  *
  * Cost ∝ data in affected buckets, not corpus size: a 1 % update batch
  * spread over k buckets rewrites ~k/n of the corpus. Size `nBuckets` so a
  * bucket is a few GB (rewrite unit) — more buckets = finer rewrite
  * granularity but more small files.
  *
  * Not a table format: dynamic overwrite swaps directories per-partition
  * via the file committer, so a reader racing the upsert can see a
  * partially-applied batch (old bucket A + new bucket B), and object
  * stores need a consistent committer for the rename step. Where
  * serializable snapshots matter, front this with a manifest (the same
  * mechanism [[graft.catalog.StatsStore]] uses for its log).
  */
object Upsert {

  /** Report of one [[upsert]] application. Row counts are scoped to the
    * AFFECTED buckets — the upsert never scans the rest of the corpus, not
    * even for bookkeeping. */
  final case class UpsertStats(
      bucketsTouched: Int, totalBuckets: Int,
      affectedRowsBefore: Long, upserts: Long, deletes: Long,
      affectedRowsAfter: Long)

  private def withBucket(df: DataFrame, keyCol: String, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int"))

  /** Materialize `df` in the keyed-bucket layout at `path`. */
  def writeKeyed(df: DataFrame, keyCol: String, path: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    withBucket(df, keyCol, nBuckets)
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(path)
  }

  /** Read the keyed corpus back (the `bucket` partition column is kept so
    * key-equality filters can prune: `filter(bucket === ...)`). */
  def readKeyed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Seq-of-keys convenience over the DataFrame-based [[upsert]]. */
  def upsertWithKeys(
      spark: SparkSession, path: String, updates: DataFrame, keyCol: String,
      nBuckets: Int, deleteKeys: Seq[Any]): UpsertStats = {
    val deletes =
      if (deleteKeys.isEmpty) None
      else Some(spark.createDataFrame(
        spark.sparkContext.parallelize(deleteKeys.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keyCol,
            updates.schema(keyCol).dataType)))))
    upsert(spark, path, updates, keyCol, nBuckets, deletes)
  }

  /** Apply `updates` (replace-by-key or insert) and `deletes` (a
    * single-column DataFrame of keys — scales past driver memory) to the
    * corpus at `path`. `updates` must carry the corpus schema minus
    * `bucket`; `nBuckets` must match the layout's. Returns rewrite stats.
    *
    * Rows in `updates` whose key already exists REPLACE the stored row
    * (last-writer-wins at batch granularity; duplicate keys WITHIN one
    * batch are rejected — resolve upstream, the engine cannot guess). */
  def upsert(
      spark: SparkSession, path: String, updates: DataFrame, keyCol: String,
      nBuckets: Int, deletes: Option[DataFrame] = None): UpsertStats = {
    val dupBatch = updates.groupBy(col(keyCol)).count().filter(col("count") > 1)
    require(dupBatch.isEmpty,
      s"upsert batch has duplicate keys: ${dupBatch.head(5).mkString(", ")}")

    val batch = withBucket(updates, keyCol, nBuckets)
    val delBuckets = deletes.toSeq.flatMap(d =>
      withBucket(d.select(col(d.columns.head).as(keyCol)), keyCol, nBuckets)
        .select("bucket").distinct().collect().map(_.getInt(0)))

    // the driver learns ONLY the touched bucket ids (bounded by nBuckets)
    val touched = (batch.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq ++ delBuckets).distinct.sorted
    val affectedOld = readKeyed(spark, path)
      .filter(col("bucket").isin(touched: _*))
    val rowsBefore = affectedOld.count()
    // count the batch inputs BEFORE the overwrite: both may be lazy plans
    // over the very path being rewritten
    val nUpserts = updates.count()
    val nDeletes = deletes.fold(0L)(_.count())

    val removedKeys = deletes
      .map(d => d.select(col(d.columns.head).as(keyCol)))
      .fold(batch.select(col(keyCol)))(d => batch.select(col(keyCol)).unionByName(d))
    val merged = affectedOld
      .join(broadcast(removedKeys.distinct()), Seq(keyCol), "left_anti")
      .unionByName(batch.select(affectedOld.columns.map(col): _*))
      .localCheckpoint() // pin content: the write below must not re-read
                         // the partitions it is overwriting

    // dynamic overwrite: replaces exactly the partitions present in `merged`
    merged
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(path)

    // a bucket emptied by deletion has no rows in `merged`, so dynamic
    // overwrite never replaces it — remove its directory explicitly
    val remaining = merged.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val emptied = touched.filterNot(remaining)
    if (emptied.nonEmpty) {
      // the filesystem OF THE CORPUS PATH, not fs.defaultFS — they differ
      // on clusters (corpus on s3a://, default hdfs://)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/bucket=$b"), true); ()
      }
    }

    val rowsAfter = merged.count() // checkpointed: no extra scan
    UpsertStats(touched.size, nBuckets, rowsBefore, nUpserts, nDeletes, rowsAfter)
  }

  /** Slowly-changing-dimension (type 2) history from a change log: each
    * key's change events become validity intervals [valid_from, valid_to)
    * — valid_to is the NEXT change's timestamp, null on the current row
    * (`is_current`). One `lead` window per key, one exchange; attribute
    * values are carried bit-for-bit (no arithmetic), so the history table
    * is engine-portable by construction. Ties within a timestamp break on
    * `ordCol` (a unique event id) to keep intervals deterministic. */
  def scd2History(
      changes: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      attrCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    changes
      .select(col(keyCol) +: col(tsCol).as("valid_from") +: col(ordCol) +:
        attrCols.map(col): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("valid_from"), col(ordCol))))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
