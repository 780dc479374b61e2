package graft

import org.apache.spark.sql.functions._

import graft.catalog.Layout

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  /** Partition-dir path of each data file (strips the file name). */
  private def parentDirs(files: Seq[(String, Long)]): Seq[String] =
    files.map(_._1.replaceAll("/[^/]+$", ""))

  private def fingerprint(df: org.apache.spark.sql.DataFrame) = {
    // decimal sum: exact, order-invariant, and ANSI-safe (a long sum of
    // xxhash64 values overflows)
    val h = xxhash64(df.columns.sorted.map(col).toIndexedSeq: _*)
    df.agg(sum(h.cast("decimal(38,0)")).as("fp"), count(lit(1)).as("n")).head()
  }

  test("unpartitioned compaction: content preserved, files collapsed, sizes bounded") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-spec")
      .toString
    events.repartition(32).write.parquet(s"$base/in")
    assert(Layout.dataFiles(spark, s"$base/in").size == 32)
    val target = 128L * 1024
    val stats = Layout.compact(spark, s"$base/in", s"$base/out", target).head()
    assert(stats.getAs[Long]("files_before") == 32L)
    assert(stats.getAs[Long]("files_after") < 32L)
    assert(fingerprint(spark.read.parquet(s"$base/in")) ==
      fingerprint(spark.read.parquet(s"$base/out")))
    val sizes = Layout.dataFiles(spark, s"$base/out").map(_._2)
    assert(sizes.forall(_ <= 2 * target), s"oversized file: ${sizes.max}")
    // a target larger than the whole input collapses to a single file
    val one = Layout.compact(spark, s"$base/in", s"$base/one",
      targetBytes = 1L << 30).head()
    assert(one.getAs[Long]("files_after") == 1L, s"expected one file: $one")
    assert(fingerprint(spark.read.parquet(s"$base/one")) ==
      fingerprint(spark.read.parquet(s"$base/in")))
  }

  test("compaction heals a streaming parquet sink's per-batch small files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-compact-stream")
      .toString
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "payload")
      .writeStream.format("parquet")
      .option("path", s"$base/in")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      // each micro-batch lands its own files — the classic shatter
      for (b <- 0 until 5) {
        ms.addData((0L until 50L).map(i => (b * 50L + i, s"row-$b-$i")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val before = Layout.dataFiles(spark, s"$base/in").size
    assert(before >= 5, s"streaming sink produced only $before files — vacuous")
    val stats = Layout.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 20).head()
    assert(stats.getAs[Long]("files_after") < before)
    assert(stats.getAs[Long]("n_rows") == 250L)
    assert(fingerprint(spark.read.parquet(s"$base/in")) ==
      fingerprint(spark.read.parquet(s"$base/out")))
  }

  test("hive-partitioned compaction keeps directories and splits big partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-part")
      .toString
    // shatter: 8 writer tasks x partition dirs
    events.withColumn("event_date", to_date(date_trunc("day", col("ts"))))
      .repartition(8)
      .write.partitionBy("event_date").parquet(s"$base/in")
    val dirsBefore =
      parentDirs(Layout.dataFiles(spark, s"$base/in")).distinct.sorted
    assert(dirsBefore.size > 1, "fixture produced a single partition — vacuous")
    val perDirBefore = parentDirs(Layout.dataFiles(spark, s"$base/in"))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(perDirBefore.values.max > 1, "partitions not shattered — vacuous")

    val stats = Layout.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L * 1024 * 1024, partitionCols = Seq("event_date"))
      .head()
    // same partition directories survive
    val dirsAfter =
      parentDirs(Layout.dataFiles(spark, s"$base/out")).distinct.sorted
    assert(dirsAfter.map(_.split("/").last) == dirsBefore.map(_.split("/").last))
    // one file per partition at this target (no partition exceeds 1 MiB)
    val perDirAfter = parentDirs(Layout.dataFiles(spark, s"$base/out"))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(perDirAfter.values.forall(_ == 1),
      s"expected one file per partition dir, got $perDirAfter")
    assert(stats.getAs[Long]("files_after") < stats.getAs[Long]("files_before"))
    // content identical including the partition column
    val in = spark.read.option("basePath", s"$base/in").parquet(s"$base/in")
    val out = spark.read.option("basePath", s"$base/out").parquet(s"$base/out")
    assert(fingerprint(in) == fingerprint(out))
    // an artificially tiny target still splits an oversized partition
    val small = Layout.compact(spark, s"$base/in", s"$base/out2",
      targetBytes = 2048, partitionCols = Seq("event_date"))
    val perDirSmall = parentDirs(Layout.dataFiles(spark, s"$base/out2"))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(perDirSmall.values.exists(_ > 1),
      s"maxRecordsPerFile did not split an oversized partition: $perDirSmall")
    assert(fingerprint(out) == fingerprint(
      spark.read.option("basePath", s"$base/out2").parquet(s"$base/out2")))
    assert(small.head().getAs[Long]("n_rows") == events.count())
  }
}
