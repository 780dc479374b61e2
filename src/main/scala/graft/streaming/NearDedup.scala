package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming NEAR-duplicate detection — the MinHash-banded twin of
  * [[StreamingOps.dedupStream]] (which is exact-fingerprint only): an
  * incremental crawl ingest can near-dedup in flight instead of waiting
  * for the nightly batch pass.
  *
  * Shape: per-row MinHash signatures (the same native expression and band
  * hashing as [[Dedup.minhashLshPairs]], so stream and batch bucket
  * IDENTICALLY), then `flatMapGroupsWithState` keyed on (band, bucket)
  * with state = the signatures seen in that bucket within the watermark
  * horizon. An arriving document emits one [[NearDedup.DupEdge]] per
  * band where some EARLIER document's full signature estimates Jaccard ≥
  * threshold. "Earlier" = prior micro-batch, or (ts, id) order within a
  * batch — first arrival wins, the same contract as `dedupStream`; it
  * equals the batch min-id semantics whenever arrival follows id order.
  *
  * State economics at 100 TB/day: per (band, bucket) key the state is at
  * most `maxBucketSize` (id, k-long signature) entries, evicted when the
  * event-time watermark passes the bucket's last activity + the horizon —
  * exactly "one watermark span of signatures". Buckets that fill to
  * `maxBucketSize` stop ACCUMULATING (arrivals still check against the
  * retained members): a mega-bucket carries no near-dup signal, the same
  * lossy-cap contract as the batch path's bucket drop, erring toward
  * keeping documents.
  *
  * Consumers take `edges.dropDuplicates("doc_id")` per micro-batch (or
  * `foreachBatch` anti-join) for the dup-id set; the edge stream itself
  * keeps the evidence (which earlier doc matched, at what estimate).
  */
object NearDedup {

  /** One banded observation (public: Dataset encoders generate bytecode
    * outside this object and cannot see private types). `ts` keeps the
    * original event-time column — the watermark metadata must ride into
    * the stateful operator for event-time timeouts. */
  final case class BandObs(
      doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long,
      sig: Array[Long])

  /** `doc_id` matched `matched_id` (an earlier arrival) in `band` with
    * signature-estimated Jaccard `est_jaccard`. */
  final case class DupEdge(
      doc_id: Long, matched_id: Long, band: Int, est_jaccard: Double)

  /** Signatures retained for one bucket, in arrival order. */
  final case class BucketState(ids: Array[Long], sigs: Array[Array[Long]])

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  private[streaming] def horizonMs(watermark: String): Long = {
    val parts = watermark.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"watermark must be '<n> <unit>': '$watermark'")
    val n = parts(0).toLong
    parts(1).stripSuffix("s") match {
      case "second" => n * 1000L
      case "minute" => n * 60000L
      case "hour" => n * 3600000L
      case "day" => n * 86400000L
      case u => throw new IllegalArgumentException(s"unsupported unit '$u'")
    }
  }

  /** Dup-edge stream over a watermarked document feed. `watermark` empty →
    * state lives forever (bounded corpora / tests); set it in production.
    * Works identically over a batch DataFrame (state starts empty per
    * group), which is what the stream==batch spec pins. */
  def dupEdgesStream(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", n: Int = 2, k: Int = 144, bands: Int = 48,
      threshold: Double = 0.5, seed: Long = 42,
      maxBucketSize: Int = 100, watermark: String = ""): Dataset[DupEdge] = {
    require(k % bands == 0, "bands must divide k")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    val watermarked =
      if (watermark.isEmpty) docs else docs.withWatermark(tsCol, watermark)
    val horizon = if (watermark.isEmpty) 0L else horizonMs(watermark)
    // same signature expression and band hash as the batch path — a stream
    // and a batch over the same rows land in the same buckets
    val fname = s"graft_minhash64_${k}_$seed"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.MinHash64(exprs.head, k, seed), "built-in")
    val sigged = watermarked
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        graft.ops.TextOps.shingles(col(textCol), n).as("__sh"))
      .filter(size(col("__sh")) > 0) // blank docs: no signature, never a dup
      .select(col("doc_id"), col("ts"),
        call_function(fname, col("__sh")).as("sig"))
    val bandCols = (0 until bands).map(bnd =>
      xxhash64(concat_ws("_", slice(col("sig"), bnd * r + 1, r))))
    val banded = sigged
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array(bandCols: _*)))
      .select(col("doc_id"), col("ts"), col("pos").as("band"),
        col("col").as("bucket"), col("sig"))
      .as[BandObs]
    val timeout =
      if (watermark.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    banded
      .groupByKey(o => (o.band, o.bucket))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: (Int, Long), it: Iterator[BandObs],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(
              BucketState(Array.empty, Array.empty))
            val out = Seq.newBuilder[DupEdge]
            // group iterator order is not guaranteed — impose arrival order.
            // An id already in state is a RE-DELIVERY (at-least-once
            // source): skip it entirely — emitting a self-edge would make
            // the documented consumer recipe (dropDuplicates("doc_id") =
            // dup set) drop the only copy of that document.
            for (o <- it.toArray.sortBy(x => (x.ts.getTime, x.doc_id))
                 if !s.ids.contains(o.doc_id)) {
              var i = 0
              while (i < s.ids.length) {
                val est = estJaccard(o.sig, s.sigs(i))
                if (est >= threshold)
                  out += DupEdge(o.doc_id, s.ids(i), key._1, est)
                i += 1
              }
              if (s.ids.length < maxBucketSize)
                s = BucketState(s.ids :+ o.doc_id, s.sigs :+ o.sig)
            }
            state.update(s)
            if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + horizon)
            out.result().iterator
          }
      }
  }

  /** BATCH twin of the dup decision [[dupEdgesStream]] feeds: document ids
    * that near-match a SMALLER id ([[Dedup.minhashLshPairs]] pairs are
    * id1 < id2, so the id2 side is the later arrival when ids follow
    * arrival order). `df minus these` is the kept set. */
  def nearDupIds(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 2, k: Int = 144, bands: Int = 48, threshold: Double = 0.5,
      seed: Long = 42, maxBucketSize: Int = 100): DataFrame =
    Dedup.minhashLshPairs(df, idCol, textCol, n, k, bands, threshold, seed,
        maxBucketSize)
      .select(col("id2").as(idCol)).distinct()

  /** One banded 64-bit signature observation (see [[BandObs]]). */
  final case class SigObs(
      doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long,
      sig: Long)

  /** `doc_id` is within `hamming` bits of the earlier `matched_id`. */
  final case class HammingEdge(
      doc_id: Long, matched_id: Long, band: Int, hamming: Int)

  /** State per hamming-band bucket: 8-byte signatures, arrival order. */
  final case class SigBucketState(ids: Array[Long], sigs: Array[Long])

  /** One banded observation of an ALIGNED signature vector (video frame
    * hashes, audio fingerprint words). */
  final case class VecObs(
      doc_id: Long, ts: java.sql.Timestamp, bucket: Long, sigs: Array[Long])

  /** `doc_id` sits within `mean_hamming` mean bits of the earlier
    * `matched_id` over their aligned signature vectors. */
  final case class VecEdge(
      doc_id: Long, matched_id: Long, mean_hamming: Double)

  /** State per aligned-signature bucket: full vectors, arrival order. */
  final case class VecBucketState(ids: Array[Long], vecs: Array[Array[Long]])

  /** Streaming near-dedup over ALIGNED SIGNATURE VECTORS — the shared
    * engine for the video twin ([[videoPhashDupEdgesStream]]: one dHash
    * per sampled frame, `bandsPerWord = maxMeanHamming+1` pigeonhole
    * splits) and the audio twin ([[audioFpDupEdgesStream]]: one 16-bit
    * spectral word per frame, `bandsPerWord = 1` = exact-word
    * candidates). `rows` must carry (doc_id, ts, sigs array<long>);
    * candidates share a (word index, band) bucket, verification is mean
    * per-word bit-hamming ≤ `maxMeanHamming` over EQUAL-length vectors —
    * the same decision as the batch joins, so stream == batch on
    * in-order feeds (spec-pinned for both modalities). */
  def alignedVecDupEdgesStream(
      rows: DataFrame, maxMeanHamming: Double, bandsPerWord: Int,
      maxBucketSize: Int = 4096, watermark: String = ""): Dataset[VecEdge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val watermarked =
      if (watermark.isEmpty) rows else rows.withWatermark("ts", watermark)
    val horizon = if (watermark.isEmpty) 0L else horizonMs(watermark)
    val bandCols =
      if (bandsPerWord == 1) Seq(col("word"))
      else graft.ops.Dedup.hammingBandCols(col("word"), bandsPerWord - 1)
    val banded = watermarked
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"), col("sigs"),
        posexplode(col("sigs")).as(Seq("word_idx", "word")))
      .select(col("doc_id"), col("ts"), col("sigs"), col("word_idx"),
        posexplode(array(bandCols: _*)).as(Seq("band", "piece")))
      .select(col("doc_id"), col("ts"),
        xxhash64(col("word_idx"), col("band"), col("piece")).as("bucket"),
        col("sigs"))
      .as[VecObs]
    val timeout =
      if (watermark.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, it: Iterator[VecObs], state: GroupState[VecBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(
              VecBucketState(Array.empty, Array.empty))
            val out = Seq.newBuilder[VecEdge]
            // one bucket sees each (doc, word, band) once — but a doc can
            // appear in this bucket via several words; dedup doc entries.
            // An id already in STATE is a re-delivery (at-least-once
            // source): skip it — a self-edge would mark the only copy as
            // a dup (see dupEdgesStream).
            val seenHere = scala.collection.mutable.Set.empty[Long]
            for (o <- it.toArray.sortBy(x => (x.ts.getTime, x.doc_id))
                 if !seenHere.contains(o.doc_id) && !s.ids.contains(o.doc_id)) {
              seenHere += o.doc_id
              var i = 0
              while (i < s.ids.length) {
                val v = s.vecs(i)
                if (v.length == o.sigs.length) {
                  var bits = 0L
                  var w = 0
                  while (w < v.length) {
                    bits += java.lang.Long.bitCount(v(w) ^ o.sigs(w)); w += 1
                  }
                  val mean = bits.toDouble / v.length
                  if (mean <= maxMeanHamming)
                    out += VecEdge(o.doc_id, s.ids(i), mean)
                }
                i += 1
              }
              if (s.ids.length < maxBucketSize)
                s = VecBucketState(s.ids :+ o.doc_id, s.vecs :+ o.sigs)
            }
            state.update(s)
            if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + horizon)
            out.result().iterator
          }
      }
  }

  /** Streaming VIDEO near-dedup: per-row real-frame dHash vectors (the
    * whole clip's bytes are in the row, so the k-frame signature computes
    * MAP-SIDE — parseAvi + ImageIO per partition, no pre-aggregation
    * stateful step), then [[alignedVecDupEdgesStream]]. Emits one edge
    * per matching (frame, band) bucket; consumers dedup doc_ids per
    * micro-batch as with the text twin. */
  def videoPhashDupEdgesStream(
      media: DataFrame, k: Int = 6, maxMeanHamming: Double = 6.0,
      idCol: String = "media_id", contentCol: String = "content",
      tsCol: String = "ts", maxBucketSize: Int = 4096,
      watermark: String = ""): Dataset[VecEdge] = {
    val spark = media.sparkSession
    import spark.implicits._
    val prepared = media
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(contentCol).as("content"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, ts, bytes) =>
          val sigs = for {
            b <- Option(bytes).filter(_.nonEmpty).toSeq
            avi <- graft.ops.Multimodal.parseAvi(b).filter(_.frames.nonEmpty).toSeq
          } yield {
            val n = avi.frames.size
            (0 until k).flatMap { i =>
              val (off, len) = avi.frames(math.min(n - 1, i * n / k))
              graft.ops.Multimodal.dHash64(
                java.util.Arrays.copyOfRange(b, off, off + len))
            }.toArray
          }
          sigs.filter(_.length == k).map(s => (id, ts, s))
        }
      }
      .toDF("doc_id", "ts", "sigs")
    alignedVecDupEdgesStream(prepared, maxMeanHamming,
      bandsPerWord = maxMeanHamming.toInt + 1, maxBucketSize, watermark)
  }

  /** Streaming AUDIO near-dedup: per-row spectral fingerprints
    * ([[graft.ops.Multimodal.audioFingerprint]], computed map-side), then
    * [[alignedVecDupEdgesStream]] with exact-word candidates
    * (bandsPerWord = 1) — the streaming twin of
    * [[graft.ops.Multimodal.audioFingerprintPairs]]. */
  def audioFpDupEdgesStream(
      media: DataFrame, maxMeanBits: Double = 4.0,
      idCol: String = "media_id", contentCol: String = "content",
      tsCol: String = "ts", maxBucketSize: Int = 4096,
      watermark: String = ""): Dataset[VecEdge] = {
    val spark = media.sparkSession
    import spark.implicits._
    val prepared = media
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(contentCol).as("content"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, ts, bytes) =>
          Option(bytes).filter(_.nonEmpty)
            .flatMap(graft.ops.Multimodal.audioFingerprint(_))
            .map(words => (id, ts, words.map(_.toLong)))
        }
      }
      .toDF("doc_id", "ts", "sigs")
    alignedVecDupEdgesStream(prepared, maxMeanBits, bandsPerWord = 1,
      maxBucketSize, watermark)
  }

  /** Streaming IMAGE near-dedup — the perceptual twin of
    * [[dupEdgesStream]], completing the matrix (text exact/near ×
    * batch/stream; image batch [[graft.ops.Multimodal.phashPairs]] /
    * stream here): dHash via the native [[graft.functions.ImageDHash]]
    * expression (pure per-row, streaming-legal), banded with the SAME
    * splits as the batch hamming join ([[Dedup.hammingBandCols]]), then
    * band-bucket state exactly like the MinHash path — but signatures are
    * 8 bytes, so a bucket's watermark span of state is ~18× smaller than
    * the text path's k-long arrays. Emits one [[HammingEdge]] per band
    * where an EARLIER image sits within `maxHamming` bits. */
  def phashDupEdgesStream(
      media: DataFrame, idCol: String = "media_id",
      contentCol: String = "content", tsCol: String = "ts",
      maxHamming: Int = 6, maxBucketSize: Int = 4096,
      watermark: String = ""): Dataset[HammingEdge] = {
    val spark = media.sparkSession
    import spark.implicits._
    val watermarked =
      if (watermark.isEmpty) media else media.withWatermark(tsCol, watermark)
    val horizon = if (watermark.isEmpty) 0L else horizonMs(watermark)
    val fname = "graft_image_dhash"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.ImageDHash(exprs.head), "built-in")
    val sigged = watermarked
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        call_function(fname, col(contentCol)).as("sig"))
      .filter(col("sig").isNotNull) // undecodable content: never a dup
    val banded = sigged
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array(Dedup.hammingBandCols(col("sig"), maxHamming): _*)))
      .select(col("doc_id"), col("ts"), col("pos").as("band"),
        col("col").as("bucket"), col("sig"))
      .as[SigObs]
    val timeout =
      if (watermark.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    banded
      .groupByKey(o => (o.band, o.bucket))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: (Int, Long), it: Iterator[SigObs],
         state: GroupState[SigBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(
              SigBucketState(Array.empty, Array.empty))
            val out = Seq.newBuilder[HammingEdge]
            // skip re-delivered ids (at-least-once source): a self-edge
            // would mark the only copy as a dup (see dupEdgesStream)
            for (o <- it.toArray.sortBy(x => (x.ts.getTime, x.doc_id))
                 if !s.ids.contains(o.doc_id)) {
              var i = 0
              while (i < s.ids.length) {
                val d = java.lang.Long.bitCount(o.sig ^ s.sigs(i))
                if (d <= maxHamming)
                  out += HammingEdge(o.doc_id, s.ids(i), key._1, d)
                i += 1
              }
              if (s.ids.length < maxBucketSize)
                s = SigBucketState(s.ids :+ o.doc_id, s.sigs :+ o.sig)
            }
            state.update(s)
            if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + horizon)
            out.result().iterator
          }
      }
  }
}
