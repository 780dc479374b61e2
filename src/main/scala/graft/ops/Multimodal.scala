package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs batched per partition so a real decoder (JNI,
  * subprocess, native lib) amortizes setup per partition, not per row.
  *
  * ==STUB NOTICE==
  * This container has no image/audio codecs, so [[stubDecode]] is a
  * clearly-marked DETERMINISTIC FAKE: it derives pseudo-features from the
  * raw bytes (length, a rolling byte hash, fixed-dim pseudo-embedding).
  * The Spark-side plumbing — schema, partition-batched `mapPartitions`,
  * feature struct shape — is real and tested; swap `decodeBytes` for a
  * real codec to productionize.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  val EmbeddingDim = 16

  /** STUB decoder: deterministic pseudo-features from raw bytes. A real
    * implementation would decode the media and run a feature extractor —
    * same signature, same batching. */
  private[ops] def decodeBytes(bytes: Array[Byte]): (Long, Array[Float]) = {
    // ---- STUB: replace with real codec + model inference ----
    var h = 1125899906842597L // rolling polynomial hash (deterministic)
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val emb = new Array[Float](EmbeddingDim)
    var d = 0
    var s = h
    while (d < EmbeddingDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      emb(d) = (s >>> 40).toFloat / (1 << 24).toFloat // [0,1) deterministic
      d += 1
    }
    (h, emb)
  }

  /** Batched feature extraction: one decoder context per partition
    * (mapPartitions), rows stream through it. Null/empty content yields a
    * null embedding but keeps the row (auditability at scale). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      // Real decoders initialize here, once per partition.
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (bytes == null || bytes.isEmpty)
          Row(id, modality, 0L, 0L, null)
        else {
          val (h, emb) = decodeBytes(bytes)
          Row(id, modality, bytes.length.toLong, h, emb.toSeq)
        }
      }
    }
  }

  /** Synthetic media table for tests/demos (deterministic, seeded). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42): DataFrame = {
    val rnd = new java.util.Random(seed)
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val len = 64 + rnd.nextInt(192)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      Row(i.toLong, modality, bytes,
        Row(s"synthetic://$i", 640, 480, if (modality == "image") null else 1000L * (i + 1)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
