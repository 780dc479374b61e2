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
  * ==Decoders==
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK (PNG/JPEG/BMP/
  * GIF, no native codecs needed), so [[decodeImage]] reads actual pixels —
  * width/height come from the decoded raster and the embedding is a 4×4
  * grid of mean luminance (a classic thumbnail-pool feature).
  *
  * AUDIO decode is REAL: `javax.sound.sampled` also ships in the JDK
  * (WAV/AIFF/AU, PCM and a-law/µ-law via the built-in converters), so
  * [[decodeAudio]] reads actual samples — sample rate and duration come
  * from the decoded stream, RMS energy and zero-crossing rate from the
  * waveform, and the embedding is a 16-segment temporal energy profile.
  *
  * Bytes that fail to decode (corrupt, unsupported container) fall back to
  * the byte stub below, with null decoded fields — the pipeline keeps the
  * row either way (auditability at scale).
  *
  * ==STUB NOTICE (video only)==
  * The container has no video codecs, so that modality uses [[stubDecode]],
  * a clearly-marked DETERMINISTIC FAKE deriving pseudo-features from raw
  * bytes (length, rolling byte hash, fixed-dim pseudo-embedding). The
  * Spark-side plumbing — schema, partition-batched `mapPartitions`,
  * feature struct shape — is identical to the image/audio paths'; swap
  * `stubDecode` for a real codec to productionize.
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
    StructField("width", IntegerType, nullable = true),   // decoded, not metadata
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true), // audio, decoded
    StructField("duration_ms", LongType, nullable = true),    // audio, decoded
    StructField("rms", FloatType, nullable = true),           // audio [0,1]
    StructField("zcr", FloatType, nullable = true),           // audio [0,1]
    StructField("decoded", BooleanType, nullable = false), // real decode vs stub
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  val EmbeddingDim = 16

  /** Rolling polynomial hash over raw bytes — content identity for exact
    * dedup of media payloads, independent of the decode path. */
  private[ops] def contentHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** STUB decoder (audio/video + undecodable images): deterministic
    * pseudo-features from raw bytes. A real implementation would decode the
    * media and run a feature extractor — same signature, same batching. */
  private[ops] def stubDecode(bytes: Array[Byte]): Array[Float] = {
    // ---- STUB: replace with real codec + model inference ----
    val emb = new Array[Float](EmbeddingDim)
    var d = 0
    var s = contentHash(bytes)
    while (d < EmbeddingDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      emb(d) = (s >>> 40).toFloat / (1 << 24).toFloat // [0,1) deterministic
      d += 1
    }
    emb
  }

  /** REAL image decode (pure-JDK javax.imageio): returns decoded
    * (width, height, 4×4 mean-luminance grid as [[EmbeddingDim]] floats in
    * [0,1], row-major), or None when the bytes aren't a decodable image.
    * Per-pixel getRGB is fine for thumbnail-scale features; a production
    * extractor over large rasters would read the Raster in bulk — the
    * partition-batched call shape stays the same. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Double](EmbeddingDim)
      val counts = new Array[Long](EmbeddingDim)
      var y = 0
      while (y < h) {
        val gy = math.min(3, y * 4 / h)
        var x = 0
        while (x < w) {
          val gx = math.min(3, x * 4 / w)
          val rgb = img.getRGB(x, y)
          // ITU-R BT.601 integer luma weights
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0 / 255.0
          val g = gy * 4 + gx
          sums(g) += lum
          counts(g) += 1
          x += 1
        }
        y += 1
      }
      val emb = new Array[Float](EmbeddingDim)
      var g = 0
      while (g < EmbeddingDim) {
        emb(g) = if (counts(g) == 0) 0f else (sums(g) / counts(g)).toFloat
        g += 1
      }
      Some((w, h, emb))
    }
  }

  /** Decoded-audio feature bundle (all derived from real PCM samples). */
  private[graft] final case class AudioFeatures(
      sampleRate: Int, durationMs: Long, rms: Float, zcr: Float,
      embedding: Array[Float])

  /** REAL audio decode (pure-JDK `javax.sound.sampled`): WAV/AIFF/AU
    * containers, converted to signed 16-bit PCM by the JDK's built-in
    * codecs. Returns sample rate, duration, RMS energy and zero-crossing
    * rate (both over channel-averaged samples normalized to [-1,1]; zcr is
    * the fraction of consecutive sample pairs that change sign — a pure
    * sine at frequency f gives ≈ 2f/sampleRate), plus a 16-segment temporal
    * mean-|amplitude| profile as the [[EmbeddingDim]] embedding. `None`
    * when the bytes aren't decodable audio. */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[AudioFeatures] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val chans = math.max(1, src.getChannels)
        val pcmFmt = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate, 16, chans,
          chans * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
        val raw = pcm.readAllBytes()
        val n = raw.length / (2 * chans) // frames
        if (n == 0) None
        else {
          val sr = math.round(src.getSampleRate)
          var sumSq = 0.0
          var crossings = 0L
          var prevSign = 0
          val segSum = new Array[Double](EmbeddingDim)
          val segCnt = new Array[Long](EmbeddingDim)
          var i = 0
          while (i < n) {
            // channel-averaged frame, little-endian 16-bit
            var acc = 0.0
            var c = 0
            while (c < chans) {
              val off = (i * chans + c) * 2
              val s = ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort
              acc += s / 32768.0
              c += 1
            }
            val v = acc / chans
            sumSq += v * v
            val sign = if (v > 0) 1 else if (v < 0) -1 else 0
            if (i > 0 && sign != 0 && prevSign != 0 && sign != prevSign)
              crossings += 1
            if (sign != 0) prevSign = sign
            val seg = math.min(EmbeddingDim - 1, i * EmbeddingDim / n)
            segSum(seg) += math.abs(v)
            segCnt(seg) += 1
            i += 1
          }
          val emb = new Array[Float](EmbeddingDim)
          var g = 0
          while (g < EmbeddingDim) {
            emb(g) = if (segCnt(g) == 0) 0f else (segSum(g) / segCnt(g)).toFloat
            g += 1
          }
          Some(AudioFeatures(
            sampleRate = sr,
            durationMs = n.toLong * 1000L / sr,
            rms = math.sqrt(sumSq / n).toFloat,
            zcr = if (n > 1) crossings.toFloat / (n - 1) else 0f,
            embedding = emb))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic mono 16-bit PCM WAV of a pure sine tone, written through
    * the real `javax.sound.sampled` encoder — synthetic "audio" rows are
    * genuine decodable WAVs, so the audio decode path is exercised end to
    * end (the audio twin of [[syntheticPng]]). */
  private[graft] def syntheticWav(
      freqHz: Double, seconds: Double, sampleRate: Int = 8000,
      amplitude: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = math.max(1, math.round(seconds * sampleRate).toInt)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = math.round(
        amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat, 16, 1, 2,
      sampleRate.toFloat, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Batched feature extraction: one decoder context per partition
    * (mapPartitions), rows stream through it. Null/empty content yields a
    * null embedding but keeps the row (auditability at scale). Images get
    * the real pixel decode, audio the real PCM decode; video (and
    * undecodable image/audio bytes) get the stub with `decoded = false`. */
  def extractFeatures(media: DataFrame): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      // Per-partition decoder init: keep ImageIO off its tmp-file stream
      // cache — these are in-memory byte arrays.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (bytes == null || bytes.isEmpty)
          Row(id, modality, 0L, 0L, null, null, null, null, null, null, false, null)
        else {
          val h = contentHash(bytes)
          val n = bytes.length.toLong
          modality match {
            case "image" =>
              decodeImage(bytes) match {
                case Some((w, ht, emb)) =>
                  Row(id, modality, n, h, w, ht, null, null, null, null, true,
                    emb.toSeq)
                case None =>
                  Row(id, modality, n, h, null, null, null, null, null, null,
                    false, stubDecode(bytes).toSeq)
              }
            case "audio" =>
              decodeAudio(bytes) match {
                case Some(a) =>
                  Row(id, modality, n, h, null, null, a.sampleRate,
                    a.durationMs, a.rms, a.zcr, true, a.embedding.toSeq)
                case None =>
                  Row(id, modality, n, h, null, null, null, null, null, null,
                    false, stubDecode(bytes).toSeq)
              }
            case _ =>
              Row(id, modality, n, h, null, null, null, null, null, null,
                false, stubDecode(bytes).toSeq)
          }
        }
      }
    }
  }

  /** Schema of [[resizeImages]]: content holds the (possibly re-encoded)
    * bytes; width/height are the DECODED dimensions of `content` when it is
    * a decodable image, null otherwise; `resized` marks rows whose pixels
    * were actually rescaled. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("resized", BooleanType, nullable = false)))

  /** REAL image resize (pure-JDK `Graphics2D`, bilinear): images whose
    * longest side exceeds `maxDim` are scaled down preserving aspect ratio
    * (shortest side floors at 1 px) and re-encoded as PNG; images already
    * within bounds, non-image modalities, and undecodable bytes pass
    * through unchanged. Batched per partition like [[extractFeatures]] —
    * the decoder/encoder context amortizes across the partition's rows. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    implicit val enc = RowEncoder.encoderFor(resizedSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val img =
          if (modality != "image" || bytes == null || bytes.isEmpty) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
          Row(id, modality, bytes, null, null, false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          if (math.max(w, h) <= maxDim) Row(id, modality, bytes, w, h, false)
          else {
            val scale = maxDim.toDouble / math.max(w, h)
            val nw = math.max(1, math.round(w * scale).toInt)
            val nh = math.max(1, math.round(h * scale).toInt)
            val dst = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null); ()
            } finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            Row(id, modality, out.toByteArray, nw, nh, true)
          }
        }
      }
    }
  }

  /** Schema of [[sampleFrames]]: one row per sampled frame. `frame_ms` is
    * the deterministic timestamp the frame was sampled at; `real` is false
    * while frame extraction runs the stub (see the STUB NOTICE above). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("frame_ms", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("real", BooleanType, nullable = false)))

  /** Video frame sampling: emits `k` evenly-spaced frames per video row
    * (timestamps i·duration/k from `meta.duration_ms`, else a length-derived
    * pseudo-duration so sampling stays deterministic without metadata).
    * The PLUMBING is real — fan-out batched per partition, one row in →
    * k rows out, exactly how a production sampler feeds a frame decoder at
    * scale. The frame PAYLOAD is the documented deterministic STUB (no
    * video codecs in this container): pseudo-frame bytes derived from
    * (content hash, frame index). Swap the payload lambda for a real
    * demuxer to productionize; the schema and fan-out shape don't change. */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    implicit val enc = RowEncoder.encoderFor(frameSchema)
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("content"), col("meta.duration_ms"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            val duration =
              if (r.isNullAt(2)) 40L * bytes.length // pseudo 25 fps, 1 B/frame
              else r.getLong(2)
            val h = contentHash(bytes)
            (0 until k).iterator.map { i =>
              val ts = duration * i / k
              // ---- STUB frame payload: replace with a real demuxer ----
              val frame = new Array[Byte](32)
              var s = h ^ (0x9e3779b97f4a7c15L * (i + 1))
              var j = 0
              while (j < frame.length) {
                s = s * 6364136223846793005L + 1442695040888963407L
                frame(j) = (s >>> 56).toByte
                j += 1
              }
              Row(id, i, ts, frame, false)
            }
          }
        }
      }
  }

  /** Deterministic tiny PNG: seeded per-pixel RGB noise encoded through
    * the real ImageIO writer, so synthetic "image" rows are genuine
    * decodable PNGs (and the decode path is exercised end to end). */
  private[ops] def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rnd.nextInt(0x1000000))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthetic media table for tests/demos (deterministic, seeded): image
    * rows carry REAL PNG bytes (varied small dimensions), audio rows carry
    * REAL WAV sine tones (varied frequency/duration), video rows carry
    * opaque random bytes for the stub path. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42): DataFrame = {
    val rnd = new java.util.Random(seed)
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      modality match {
        case "image" =>
          val w = 8 + i % 17
          val h = 6 + i % 13
          val bytes = syntheticPng(w, h, seed ^ i)
          rnd.nextInt() // keep the rng stream aligned across modalities
          Row(i.toLong, modality, bytes, Row(s"synthetic://$i", w, h, null))
        case "audio" =>
          val secs = 0.05 + (i % 10) * 0.01
          val bytes = syntheticWav(200.0 + 10.0 * (i % 40), secs)
          rnd.nextInt() // keep the rng stream aligned across modalities
          Row(i.toLong, modality, bytes,
            Row(s"synthetic://$i", null, null, math.round(secs * 1000)))
        case _ =>
          val len = 64 + rnd.nextInt(192)
          val bytes = new Array[Byte](len)
          rnd.nextBytes(bytes)
          Row(i.toLong, modality, bytes,
            Row(s"synthetic://$i", null, null, 1000L * (i + 1)))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
