package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MergeKeys

/** Storage layout for the 100 TB path (SURVEY.md §7.4 #13): the CSV
  * directory model is the reference-parity format; this converts a catalog
  * to parquet bucketed by the merge key so that:
  *
  *  - hub ⟕ behavioral joins are co-located (no shuffle on either side when
  *    both sides are bucketed by the same key into the same bucket count —
  *    Catalyst plans a zero-exchange SortMergeJoin);
  *  - `COUNT(DISTINCT key)` partially aggregates within buckets;
  *  - scans prune columns and push filters (columnar + min/max row groups).
  *
  * Bucket count should be sized so a bucket of the largest table fits an
  * executor's memory comfortably (~128–512 MB of parquet per bucket).
  */
/** Opt-in layout spec for a [[TableCatalog]]: when present, the catalog
  * serves every merge-keyed table from a bucketed+sorted parquet copy
  * maintained under `warehouseDir` (written once per source version via
  * [[Layout.ensureBucketed]]), so the hub star join — the engine's core API
  * (reference query_secure.py:66–92) — plans with zero exchange and zero
  * sort on every big side. Size `buckets` so one bucket of the largest
  * table fits an executor comfortably (~128–512 MB parquet at 100 TB). */
final case class BucketedLayout(
    warehouseDir: String,
    buckets: Int,
    namePrefix: String = "graft")

object Layout {

  /** Write every catalog table as a bucketed, sorted parquet table
    * registered in the session catalog under `namePrefix`. Tables lacking
    * the merge column (rare: non-joinable lookup tables) are written
    * unbucketed. */
  def writeBucketed(
      catalog: TableCatalog,
      warehouseDir: String,
      buckets: Int,
      namePrefix: String = "graft"): Seq[String] = {
    val key = catalog.mergeKeys.mergeColumn
    catalog.tableNames.map { t =>
      val df = catalog.table(t)
      val tableName = s"${namePrefix}_$t"
      // external table at an explicit path (spark.sql.warehouse.dir is a
      // static conf — can't be set per-call)
      val writer = df.write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", s"$warehouseDir/$tableName")
      if (df.columns.contains(key))
        writer.bucketBy(buckets, key).sortBy(key).saveAsTable(tableName)
      else
        writer.saveAsTable(tableName)
      tableName
    }
  }

  /** Read back a bucketed table (bucket metadata comes from the session
    * catalog, so joins between tables written by [[writeBucketed]] with the
    * same bucket count need no exchange). */
  def bucketedTable(spark: SparkSession, namePrefix: String, table: String): DataFrame =
    spark.table(s"${namePrefix}_$table")

  /** Write one DataFrame as a bucketed+sorted parquet table and return the
    * catalog-backed read. Idempotent per (session, tableName): the write
    * happens only when the table is absent from the session catalog, so a
    * bench loop pays the layout cost once (its warm-up pass) and every
    * timed read after that exercises the zero-exchange join path — the
    * maintain-once/join-daily economics of the 100 TB layout. `df` is
    * by-name so the skip path never builds the source plan. */
  def ensureBucketed(
      spark: SparkSession, df: => DataFrame, key: String, buckets: Int,
      warehouseDir: String, tableName: String): DataFrame = {
    if (!spark.catalog.tableExists(tableName)) {
      // Pre-partition on the bucket key so every bucket lands in EXACTLY one
      // file. The zero-EXCHANGE join needs only the bucketing; eliminating
      // the per-bucket Sort as well additionally requires
      // spark.sql.legacy.bucketedTableScan.outputOrdering=true (off by
      // default since Spark 3.0 — reading the sortBy order lists files at
      // planning time) AND one file per bucket, which this guarantees.
      // Without the pre-partition, each writer input partition emits its own
      // file per bucket (up to tasks x buckets files) and the sorted
      // metadata is unusable on read. LayoutCohortSpec pins both regimes.
      df.repartition(buckets, col(key))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", s"$warehouseDir/$tableName")
        .bucketBy(buckets, key).sortBy(key).saveAsTable(tableName)
    }
    spark.table(tableName)
  }

  /** Multi-dimensional data clustering for scan pruning: writes `df` sorted
    * by a Z-ORDER curve over `zCols`, so parquet row-group (and file)
    * min/max statistics become tight sub-rectangles of the value space and
    * a multi-column box filter skips most of the data — single-column sort
    * layouts only prune the leading column.
    *
    * Mechanics: each dimension is bucketed into `2^bitsPerDim` approx-
    * quantile buckets (boundaries from ONE driver-side `approxQuantile`
    * pass, so buckets are equi-populated regardless of distribution — the
    * curve stays balanced under skew); bucket indices are bit-interleaved
    * into the z-value by a pure integer `Column` expression (codegen'd, no
    * UDF); rows are range-partitioned + sorted on z and written. Cost at
    * 100 TB: one stats pass + one range shuffle — write-once economics like
    * [[writeBucketed]], paid back on every subsequent selective scan.
    *
    * Nulls sort into bucket 0 (the curve's origin). The z column itself is
    * dropped before writing — pruning works through the parquet min/max of
    * the ORIGINAL columns, which clustering makes selective; no reader-side
    * cooperation is needed. */
  def writeZOrdered(
      df: DataFrame, zCols: Seq[String], path: String,
      files: Int, bitsPerDim: Int = 4): Unit = {
    require(zCols.nonEmpty, "need at least one z-order column")
    require(bitsPerDim >= 1 && bitsPerDim <= 8, s"bitsPerDim in [1,8]: $bitsPerDim")
    require(zCols.size * bitsPerDim <= 30,
      s"z-value must fit an int: ${zCols.size} cols x $bitsPerDim bits")
    val m = 1 << bitsPerDim
    val probs = (1 until m).map(_.toDouble / m).toArray
    // one pass over the table computes every dimension's bucket boundaries
    val bounds = df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    val z: Column = zCols.zip(bounds).zipWithIndex.map { case ((c, bs), d) =>
      // bucket index = #boundaries <= value (0..m-1); null predicates drop
      // out of `filter`, sending null values to bucket 0
      val bucket = size(filter(array(bs.toSeq.map(lit): _*),
        x => x <= col(c).cast("double")))
      (0 until bitsPerDim).map { i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1)), i * zCols.size + d)
      }.reduce[Column](_ bitwiseOR _)
    }.reduce[Column](_ bitwiseOR _)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Time-partitioned layout (Hive-style `event_date=.../` directories):
    * the first-order data-skipping tool for append-mostly event data at
    * 100 TB — a time-range predicate prunes whole partition DIRECTORIES
    * at planning time (`PartitionFilters` in the scan), before any file
    * footer is opened, so a one-week query over a decade of history
    * lists ~0.2% of the files. Complements [[writeZOrdered]] (min/max
    * skipping WITHIN files) and bucketing (join co-location): partition
    * coarsely by time, cluster/bucket within.
    *
    * `granularity` is any `date_trunc` unit (`day`, `month`, ...) —
    * choose it so partition count stays bounded (directories are
    * metadata; a decade of days is ~3.7k partitions, fine; a decade of
    * seconds is not). Readers filter on the derived `event_date` column
    * (or equality/range on it via [[readTimePartitioned]]); the original
    * timestamp column is preserved untouched. */
  def writeTimePartitioned(df: DataFrame, tsCol: String, path: String,
      granularity: String = "day"): Unit = {
    df.withColumn("event_date",
        to_date(date_trunc(granularity, col(tsCol))))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(path)
  }

  /** Read back a time-partitioned layout. Filters on `event_date` prune
    * partitions at planning time; `basePath` keeps the partition column
    * visible alongside the original schema. */
  def readTimePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Data files under `path` (recursive), skipping `_SUCCESS`/checksum/
    * hidden metadata — the operational file inventory compaction and
    * small-file monitoring both need. Uses the Hadoop FileSystem API, so
    * the same code lists local dirs, HDFS, or object stores. */
  def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath.toString, f.getLen))
    }
    out.result()
  }

  /** Small-file compaction — the maintenance pass every streaming or
    * incremental-upsert layout eventually needs: micro-batches and
    * per-task writers shatter a table into thousands of KB-scale files,
    * and at 100 TB the NameNode/object-store listing plus per-file footer
    * opens dominate scan setup long before any byte of data is read.
    * Rewrites `inPath` to `outPath` as ~`targetBytes` files:
    *  - unpartitioned: one `repartition(ceil(bytes/target))` round-robin
    *    shuffle → evenly sized outputs;
    *  - hive-partitioned (`partitionCols`): repartition ON the partition
    *    columns (each directory's rows land in one task → one file) with
    *    `maxRecordsPerFile` derived from the observed bytes/row, so an
    *    oversized partition still splits at ~targetBytes instead of
    *    producing one giant file.
    * Writes a NEW directory (atomic swap is the caller's rename — never
    * rewrite in place under concurrent readers). Returns a one-row stats
    * frame (files/bytes before and after, rows) for the maintenance log. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = dataFiles(spark, inPath)
    val bytesIn = before.map(_._2).sum
    val df =
      if (partitionCols.isEmpty) spark.read.parquet(inPath)
      else spark.read.option("basePath", inPath).parquet(inPath)
    val rows = df.count() // parquet footer counts — metadata-cheap
    if (partitionCols.isEmpty) {
      val nFiles = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes)
      df.repartition(nFiles.toInt).write.mode(SaveMode.Overwrite)
        .parquet(outPath)
    } else {
      val bytesPerRow = math.max(1L, bytesIn / math.max(1L, rows))
      val rowsPerFile = math.max(1L, targetBytes / bytesPerRow)
      df.repartition(partitionCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", rowsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(outPath)
    }
    val after = dataFiles(spark, outPath)
    import spark.implicits._
    Seq((before.size.toLong, after.size.toLong, bytesIn,
        after.map(_._2).sum, rows))
      .toDF("files_before", "files_after", "bytes_before", "bytes_after",
        "n_rows")
  }

  /** Clustering-effectiveness report for a parquet layout — the metric
    * behind "did the sort/Z-order actually buy data skipping": per
    * column, how many files a point lookup must open on average. For
    * each file, depth = the number of files (itself included) whose
    * [min, max] interval overlaps its own; a perfectly clustered column
    * has depth 1 (disjoint file ranges → one file per point), a random
    * layout has depth ≈ n_files (every file spans everything, min/max
    * pruning skips nothing).
    *
    * Mechanics: ONE scan computes per-file min/max for every requested
    * column (`input_file_name()` + groupBy — the stats parquet footers
    * hold, re-derived engine-side so the report needs no footer reader),
    * then the depth join runs on the FILE-COUNT-sized interval table.
    * That join is pairwise in file count — a layout-report tool, not a
    * row operator — so a loud cap guards it. Returns one row per column:
    * (column, n_files, avg_depth, max_depth), avg rounded to 4. */
  def clusteringReport(spark: SparkSession, path: String,
      cols: Seq[String], maxFiles: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "need at least one column to report on")
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val perFile = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .persist()
    val nFiles = perFile.count()
    require(nFiles <= maxFiles,
      s"$nFiles files exceeds the $maxFiles report cap — compact first")
    val perCol = cols.map { c =>
      val iv = perFile.select(col("__file"),
        col(s"__mn_$c").as("mn"), col(s"__mx_$c").as("mx"))
      val other = iv.select(col("mn").as("mn2"), col("mx").as("mx2"))
      iv.join(other, col("mn") <= col("mx2") && col("mn2") <= col("mx"))
        .groupBy("__file").agg(count(lit(1)).as("depth"))
        .agg(lit(c).as("column"), count(lit(1)).as("n_files"),
          round(avg(col("depth")), 4).as("avg_depth"),
          max(col("depth")).as("max_depth"))
    }
    val out = perCol.reduce(_ unionByName _)
    perFile.unpersist()
    out
  }
}
