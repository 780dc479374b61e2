package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: token-id sequences laid out the way a trainer
  * mmaps them (Megatron-LM's .bin/.idx shape, public) — raw int32
  * little-endian tokens concatenated per shard, plus a parquet index
  * giving every document's (shard, file, offset, n_tokens). The last
  * mile of the pipeline: after BPE/unigram encode → dedup → mix → pack,
  * the trainer wants flat binary it can seek into, not parquet rows.
  *
  * Distributed-write shape (the 100 TB path): documents hash to
  * `nShards` shards, shards repartition to tasks, and EVERY TASK writes
  * its own `shard-<s>-part-<task>.bin` through the Hadoop FileSystem API
  * (HDFS/S3A/local alike) — tokens never pass through the driver. A
  * shard is the ordered concatenation of its part files (part ids
  * ascending), exactly like any Spark file sink; the index records the
  * file and byte offset per document, so a reader seeks directly.
  * Determinism: shard = xxhash64(id) mod nShards (content-addressed),
  * docs sort by id within each task's shard slice, and task boundaries
  * are recorded in the index rather than assumed — re-running with a
  * different partitioning changes part-file boundaries but never a
  * document's shard or its token bytes (spec-pinned round trip).
  */
object TokenExport {

  /** Write `df[idCol: long, idsCol: array<int>]` as binary token shards
    * under `dir`. Returns the per-document index as a DataFrame
    * (doc_id, shard, file, offset, n_tokens), which is also persisted at
    * `dir/index` as parquet. Null or empty id arrays export zero bytes
    * but keep their index row (a trainer skips them; losing them
    * silently would break provenance counts). */
  def writeShards(spark: SparkSession, df: DataFrame, idCol: String,
      idsCol: String, dir: String, nShards: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(idsCol), array().cast("array<int>")).as("ids"),
        pmod(xxhash64(col(idCol).cast("long")), lit(nShards.toLong))
          .cast("int").as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    val index = prepared.mapPartitions { it =>
      // Task-commit discipline: raw fs.create of the FINAL path would let
      // a speculative or zombie duplicate attempt interleave writes into
      // the same file. Each attempt writes attempt-suffixed temp files and
      // renames them into place only after its slice is fully written.
      // Part content is a pure function of the partition (deterministic
      // sort), so whichever attempt's rename lands, the bytes are
      // identical and any committed index row seeks correctly; a rename
      // that finds the final name already present just drops its temp.
      val tc = org.apache.spark.TaskContext.get()
      val task = tc.partitionId()
      val attempt = tc.taskAttemptId()
      val conf = new org.apache.hadoop.conf.Configuration()
      var out: java.io.DataOutputStream = null
      var currentShard = -1
      var currentFile = ""
      var offset = 0L
      val pending = scala.collection.mutable.ArrayBuffer
        .empty[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)]
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, String, Long, Int)]
      def open(shard: Int): Unit = {
        if (out != null) out.close()
        currentShard = shard
        currentFile = f"shard-$shard%04d-part-$task%05d.bin"
        val tmp = new org.apache.hadoop.fs.Path(
          s"$dir/.$currentFile.attempt-$attempt.tmp")
        pending += ((tmp, new org.apache.hadoop.fs.Path(s"$dir/$currentFile")))
        val fs = tmp.getFileSystem(conf)
        out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(fs.create(tmp, true)))
        offset = 0L
      }
      it.foreach { r =>
        val shard = r.getAs[Int]("shard")
        if (shard != currentShard) open(shard)
        val ids = r.getSeq[Int](r.fieldIndex("ids"))
        val buf = java.nio.ByteBuffer.allocate(ids.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        ids.foreach(buf.putInt)
        out.write(buf.array())
        rows += ((r.getAs[Long]("doc_id"), shard, currentFile, offset,
          ids.length))
        offset += ids.length * 4L
      }
      if (out != null) out.close()
      pending.foreach { case (tmp, fin) =>
        val fs = tmp.getFileSystem(conf)
        if (!fs.rename(tmp, fin)) {
          require(fs.exists(fin),
            s"shard commit failed: could not rename $tmp to absent $fin")
          if (fs.exists(tmp)) fs.delete(tmp, false)
        }
      }
      rows.iterator
    }.toDF("doc_id", "shard", "file", "offset", "n_tokens")
    index.write.mode("overwrite").parquet(s"$dir/index")
    spark.read.parquet(s"$dir/index")
  }

  /** Read one document's tokens back by seeking into its shard file —
    * the verification twin of [[writeShards]] (and what a sampling
    * dataloader does). */
  def readDoc(dir: String, file: String, offset: Long, n: Int): Array[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$file")
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try {
      in.seek(offset)
      val bytes = new Array[Byte](n * 4)
      in.readFully(bytes)
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(n)(buf.getInt())
    } finally in.close()
  }
}
