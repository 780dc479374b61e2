package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table + multimodal plumbing.
  *
  * The cosine arithmetic (indexed products, sequential left-fold sums,
  * dot/(sqrt·sqrt)) is mirrored op-for-op in the DuckDB oracle so the
  * doubles are bit-identical and top-k selection agrees.
  */
object SimQueries extends QueryModule {

  /** Exact brute-force cosine top-3 for the first 10 vectors. */
  val simTopK: Q = Q(
    "sim_topk_bruteforce",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      r AS (SELECT qid, nid, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM scored)
      SELECT qid, rank, nid, ROUND(cos, 6) AS cosine
      FROM r WHERE rank <= 3
      ORDER BY qid, rank"""),
    (s, dir) =>
      Similarity.bruteForceTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("qid", "rank"))

  /** The exact-top-k differential shared by the two ANN promotions:
    * per query, the EXACT top-1 neighbor (DuckDB rebuilds it from the
    * brute-force cosine SQL) plus the overall recall@k verdict vs the
    * full exact top-k set, pinned TRUE by the oracle at the named
    * floor. In-gate, every ANSWERED query must return exactly k ANN
    * rows AND the answered-query count must equal the exact side's —
    * without the second check a wholly-dropped query is simply absent
    * from the per-query groupBy and only dents recall (r17 advice). */
  private def annDifferential(
      s: org.apache.spark.sql.SparkSession,
      exact: org.apache.spark.sql.DataFrame,
      ann: org.apache.spark.sql.DataFrame,
      k: Int, floor: Double, what: String) = {
    val annPairs = ann.select(col("qid"), col("nid"))
    val perQ = ann.groupBy("qid").count().collect()
    require(perQ.forall(_.getLong(1) == k),
      s"$what: a query returned != $k rows")
    // a WHOLLY-dropped query is absent from the groupBy, so the
    // per-query k check alone can't see it (and recall floors of
    // 0.5-0.8 could absorb the miss): pin the answered-query set's
    // SIZE to the exact side's
    val exactQids = exact.select("qid").distinct().count()
    require(perQ.length.toLong == exactQids,
      s"$what: ANN answered ${perQ.length} queries but the exact " +
        s"side has $exactQids - a query was dropped entirely")
    val nExact = exact.count()
    val hit = exact.select("qid", "nid")
      .join(annPairs, Seq("qid", "nid"), "left_semi").count()
    val recall = hit.toDouble / nExact
    require(recall >= floor,
      s"$what recall $recall below the $floor floor")
    exact.filter(col("rank") === 1)
      .select(col("qid"), col("nid").as("exact_top1"),
        round(col("cosine"), 6).as("exact_top1_cos"),
        lit(recall >= floor).as("recall_floor_met"))
      .orderBy("qid")
  }

  /** Shared oracle SQL for the ANN differentials: the brute-force
    * cosine top-1 per query (the sim_topk_bruteforce arithmetic
    * verbatim) + the pinned recall verdict. */
  private val annOracleSql = """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      r AS (SELECT qid, nid, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM scored)
      SELECT qid, nid AS exact_top1, ROUND(cos, 6) AS exact_top1_cos,
        TRUE AS recall_floor_met
      FROM r WHERE rank = 1
      ORDER BY qid"""

  /** ANN via random-hyperplane LSH buckets — PROMOTED to oracle-checked
    * (r17, the differential template): the hyperplane hashes have no SQL
    * mirror, so the gate emits the EXACT side — per query the
    * brute-force top-1 neighbor (rebuilt by DuckDB from the
    * sim_topk_bruteforce arithmetic) — plus the COMPUTED recall@3
    * verdict vs the full exact top-3 set, pinned TRUE at the spec's 0.7
    * floor (4 hyperplanes + hamming-1 multiprobe). Bench/raw mode still
    * returns the production ANN rows. */
  val simAnn: Q = Q(
    "sim_ann_lsh",
    Some(annOracleSql),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val ann = Similarity.annTopK(embs, "vec_id", "embedding",
        col("vec_id") < 10, k = 3, bits = 4)
      if (!Tables.gateMode) ann.orderBy("qid", "rank")
      else annDifferential(s,
        Similarity.bruteForceTopK(embs, "vec_id", "embedding",
          col("vec_id") < 10, k = 3),
        ann, k = 3, floor = 0.7, what = "sim_ann_lsh")
    })

  /** ANN via IVF — PROMOTED to oracle-checked (r17): same differential
    * as sim_ann_lsh (k-means coarse quantizer has no SQL mirror; the
    * exact top-1 table + pinned recall@3 verdict carry the oracle). The
    * deterministic sampled fit stays the pinned configuration (the
    * 100 TB path): the quantizer trains on ~2048 hash-sampled rows,
    * then assigns everything. Floor 0.5 at nProbe/nLists = 6/16 of the
    * cells probed (the r17 measurement: 4/16 probes land recall 0.47 on
    * this fixture — the embeddings are near-isotropic, so coarse cells
    * carry weak locality and the probe budget is the recall dial,
    * exactly the IVF contract). */
  val simIvf: Q = Q(
    "sim_ann_ivf",
    Some(annOracleSql),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val index = graft.ops.Ivf.build(embs,
        "vec_id", "embedding", nLists = 16, fitSampleRows = 2048)
      val ann = graft.ops.Ivf.search(index, col("id") < 10, k = 3,
        nProbe = 6)
      if (!Tables.gateMode) ann.orderBy("qid", "rank")
      else annDifferential(s,
        Similarity.bruteForceTopK(embs, "vec_id", "embedding",
          col("vec_id") < 10, k = 3),
        ann, k = 3, floor = 0.5, what = "sim_ann_ivf")
    })

  /** PQ-compressed ANN with exact re-rank — PROMOTED to oracle-checked
    * (r17): the k-means codebooks have no SQL oracle, so the gate emits
    * the shared ANN differential (exact brute-force top-1 per query
    * rebuilt by DuckDB + the pinned recall@3 verdict). The 100-vector
    * ADC shortlist re-ranked with EXACT cosine holds a higher bar than
    * the bucket-probing paths — floor 0.8. Bench/raw mode still returns
    * the production PQ rows; the every-query-k-rows assert lives in the
    * differential. */
  val simTopkPq: Q = Q(
    "sim_topk_pq",
    Some(annOracleSql),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val cb = graft.ops.Pq.fit(embs, "vec_id", "embedding",
        m = 16, k = 16, maxIter = 10, fitSampleRows = 2048)
      val encoded = graft.ops.Pq.encode(embs, "vec_id", "embedding", cb)
      val k = 3
      val ann = graft.ops.Pq.searchAdcRerank(embs, "vec_id", "embedding",
        encoded, cb,
        embs.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = k, shortlist = 100)
      if (!Tables.gateMode)
        ann.select(col("qid"), col("rank"), col("nid"),
          round(col("cosine"), 6).as("cosine")).orderBy("qid", "rank")
      else annDifferential(s,
        Similarity.bruteForceTopK(embs, "vec_id", "embedding",
          col("vec_id") < 10, k = k),
        ann, k = k, floor = 0.8, what = "sim_topk_pq")
    })

  /** Embedding-cosine near-duplicate pairs (threshold tuned to the data's
    * cosine distribution: max pairwise cosine is ~0.51). */
  val simNearDups: Q = Q(
    "dd_embedding_cosine",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2,
          list_sum(list_transform(generate_series(1, len(a.e)), i -> a.e[i] * b.e[i]))
            / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
               * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id)
      SELECT id1, id2, ROUND(cos, 6) AS cosine
      FROM p WHERE cos >= 0.35
      ORDER BY id1, id2"""),
    (s, dir) =>
      // lsh = Some(false): the oracle documents the exact all-pairs
      // semantics, so the gate pins the brute path (the explicit hint the
      // operator prefers over a row-count probe)
      graft.ops.Dedup.embeddingNearDups(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.35, lsh = Some(false))
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2"))

  /** Multimodal feature extraction over synthetic binary media: image rows
    * are REAL PNGs decoded by javax.imageio (width/height/luminance grid
    * from actual pixels); audio rows are REAL WAVs decoded by
    * javax.sound.sampled (sample rate/duration/RMS/zero-crossing from
    * actual PCM); video rows are REAL MP4 containers decoded by the
    * pure-JDK ISO-BMFF box walk (duration/width/height — sample-level
    * decode stays the documented codec-blocked stub) — rows-only check.
    * The gate entry digests the embedding array to a scalar (the driver's
    * pandas harness can't sort raw arrays); the library API keeps the
    * array. */
  val mmFeatures: Q = Q(
    "mm_features",
    None,
    (s, _) => {
      // persisted so the self-assert count and the gate dump share ONE
      // decode pass (r8 ADVICE: the require used to re-decode all 200 rows)
      val out = Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 200))
        .persist()
      // self-assert the real decode paths: EVERY row (image pixels, audio
      // PCM, video container) must come back decoded=true
      val undecoded = out.filter(!col("decoded")).count()
      require(undecoded == 0, s"$undecoded media rows failed to decode")
      out
        .withColumn("embedding_digest",
          xxhash64(concat_ws(",", col("embedding").cast("array<string>"))))
        .drop("embedding")
        .orderBy("media_id")
    })

  /** Multimodal image resize (rows-only: pixel rescaling is not
    * SQL-expressible). Self-asserts the bound: every resized image decodes
    * to max(width, height) == maxDim with aspect preserved; non-images pass
    * through untouched. Content bytes ship as a digest (arrays don't sort
    * in the driver harness). */
  val mmResize: Q = Q(
    "mm_resize",
    None,
    (s, _) => {
      val out = Multimodal.resizeImages(Multimodal.syntheticMedia(s, 200), 12)
      val bad = out.filter(col("resized") &&
        greatest(col("width"), col("height")) =!= 12).count()
      require(bad == 0, s"$bad resized rows violate the maxDim=12 bound")
      out.withColumn("content_digest", xxhash64(col("content")))
        .drop("content")
        .orderBy("media_id")
    })

  /** Multimodal frame sampling (rows-only; STUB payload, real fan-out
    * plumbing — see Multimodal scaladoc). Self-asserts the fan-out: exactly
    * k frames per video row, indices 0..k-1. */
  val mmFrames: Q = Q(
    "mm_frames",
    None,
    (s, _) => {
      val media = Multimodal.syntheticMedia(s, 200)
      val out = Multimodal.sampleFrames(media, 3)
      val videos = media.filter(col("modality") === "video").count()
      val n = out.count()
      require(n == videos * 3, s"expected ${videos * 3} frames, got $n")
      out.withColumn("content_digest", xxhash64(col("content")))
        .drop("content")
        .orderBy("media_id", "frame_index")
    })

  /** SemDeDup-style semantic dedup — PROMOTED to oracle-checked (r17,
    * the differential template): the k-means cell assignment is not
    * SQL-expressible, so the gate emits the EXACT side (vector volume,
    * rebuilt by DuckDB) plus the two COMPUTED contract verdicts the
    * oracle pins TRUE — cluster sizes account for every vector exactly
    * once, and no two KEPT representatives sharing a rebuilt IVF cell
    * sit above the dedup threshold (the end-to-end property the
    * operator exists to provide, asserted distributed in-gate). */
  val ddSemantic: Q = Q(
    "dd_semantic",
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        TRUE AS partition_exact, TRUE AS no_kept_near_dups
      FROM embeddings"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val out = graft.ops.Dedup.semanticDedup(embs, "vec_id", "embedding",
          threshold = 0.35, nLists = 8, fitSampleRows = 2048)
        .select(col("vec_id"), col("cluster_id"), col("n_cluster"))
      val covered = out.agg(sum(col("n_cluster"))).head().getLong(0)
      val total = embs.count()
      require(covered == total,
        s"semantic clusters cover $covered of $total vectors")
      // the within-cell guarantee, asserted IN-GATE and distributed (not
      // just on OpsSpec's toy vectors): rebuild the same deterministic
      // IVF assignment and brute-force check that no two KEPT
      // representatives sharing a cell sit above the dedup threshold —
      // the end-to-end property the operator exists to provide
      val cells = graft.ops.Ivf.build(embs, "vec_id", "embedding",
          nLists = 8, seed = 42, maxIter = 8, initMode = "random",
          fitSampleRows = 2048).assigned
        .join(out.select(col("vec_id").as("id")), "id")
      val aSide = cells.select(col("cell"), col("id").as("id1"),
        col("v").as("v1"))
      val bSide = cells.select(col("cell"), col("id").as("id2"),
        col("v").as("v2"))
      val violations = aSide.join(bSide, Seq("cell"))
        .filter(col("id1") < col("id2"))
        .filter(graft.ops.Similarity.dot(col("v1"), col("v2")) >= 0.35)
        .count()
      require(violations == 0,
        s"$violations kept near-dup pairs survive within a cell")
      import s.implicits._
      Seq((total, covered == total, violations == 0L))
        .toDF("n_vectors", "partition_exact", "no_kept_near_dups")
    })

  /** Per-label centroids ([[graft.ops.Similarity.labelCentroids]]):
    * distributed vector mean per label (Summarizer, no n×d explode),
    * emitted long-form (label, dim, c). ROUND(…,6) absorbs float-sum
    * order differences between the engines. */
  val simCentroids: Q = Q(
    "sim_label_centroids",
    Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      x AS (
        SELECT label, unnest(generate_series(1, len(v))) AS d,
               unnest(v) AS val
        FROM e)
      SELECT label, CAST(d - 1 AS INT) AS dim, ROUND(avg(val), 6) AS c
      FROM x
      GROUP BY label, d
      ORDER BY label, dim"""),
    (s, dir) =>
      Similarity.labelCentroids(Tables.load(s, dir, "embeddings"),
          "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "cv")))
        .select(col("label"), col("dim").cast("int").as("dim"),
          round(col("cv"), 6).as("c"))
        .orderBy("label", "dim"))

  /** Label confusion ([[graft.ops.Similarity.labelConfusion]]): pairwise
    * cosine between ROUNDED centroids — identical inputs, identical
    * arithmetic, so the confusion matrix hash-matches. */
  val simConfusion: Q = Q(
    "sim_label_confusion",
    Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      x AS (
        SELECT label, unnest(generate_series(1, len(v))) AS d,
               unnest(v) AS val
        FROM e),
      c AS (
        SELECT label, d, ROUND(avg(val), 6) AS cv
        FROM x GROUP BY label, d),
      g AS (SELECT label, list(cv ORDER BY d) AS c FROM c GROUP BY label)
      SELECT a.label AS la, b.label AS lb,
        ROUND(
          list_sum(list_transform(generate_series(1, len(a.c)),
            i -> a.c[i] * b.c[i]))
          / (sqrt(list_sum(list_transform(a.c, x -> x * x)))
             * sqrt(list_sum(list_transform(b.c, x -> x * x)))), 6) AS cosine
      FROM g a JOIN g b ON a.label < b.label
      ORDER BY la, lb"""),
    (s, dir) =>
      Similarity.labelConfusion(Tables.load(s, dir, "embeddings"),
        "label", "embedding"))

  /** REAL video frame extraction for the MJPEG codec family
    * ([[Multimodal.parseAvi]] + `sampleFrames`): every frame payload of an
    * MJPEG-AVI row is that frame's own JPEG bytes, decodable by pure-JDK
    * ImageIO — video PIXELS now decode end to end for this family (MP4
    * rows keep the documented codec-blocked stub and stay real=false).
    * Self-asserts, all distributed: every MJPEG video yields k real
    * frames, every real payload opens with the JPEG SOI marker, and no
    * real frame timestamp falls off the container's timeline. */
  val mmMjpegFrames: Q = Q(
    "mm_mjpeg_frames",
    None,
    (s, _) => {
      val media = Multimodal.syntheticMedia(s, 120)
      val frames = Multimodal.sampleFrames(media, 4).persist()
      val real = frames.filter(col("real"))
      val nMjpeg = media.filter(col("modality") === "video" &&
        pmod(floor(col("media_id") / 3), lit(2)) === 1).count()
      require(nMjpeg > 0, "fixture carries no MJPEG videos")
      val nReal = real.count()
      require(nReal == nMjpeg * 4,
        s"expected ${nMjpeg * 4} real frames, got $nReal")
      val soi = Array(0xFF.toByte, 0xD8.toByte)
      val badMagic = real.filter(
        substring(col("content"), 1, 2) =!= lit(soi)).count()
      require(badMagic == 0, s"$badMagic real frames lack the JPEG SOI marker")
      frames
        .withColumn("content_digest", xxhash64(col("content")))
        .drop("content")
        .orderBy("media_id", "frame_index")
    })

  /** REAL multi-frame GIF decode ([[Multimodal.parseGifFrames]] +
    * `sampleFrames`, r15 verdict item 7): animated GIFs join MJPEG-AVI
    * as the second video family whose PIXELS decode end to end with
    * pure JDK — every stored raster reads via the GIF ImageReader and
    * re-encodes as a standalone PNG payload, timestamps from the
    * container's own cumulative GCE delays. Rows-only, self-asserting:
    * every GIF yields k real PNG-magic frames whose content hashes
    * EXACTLY match a driver-side decode replay of the same fixture
    * bytes, timestamps follow the authored delayCs grid, and the
    * resized twin pairs (and only it) through the UNCHANGED dHash
    * video near-dup path. */
  val mmGifFrames: Q = Q(
    "mm_gif_frames",
    None,
    (s, _) => {
      import s.implicits._
      val k = 6
      val clips: Seq[(Long, Array[Byte])] = Seq(
        0L -> Multimodal.syntheticAnimatedGif(48, 36, nFrames = 6,
          delayCs = 10, seed = 300, fx = 1.0, fy = 2.0),
        100L -> Multimodal.syntheticAnimatedGif(32, 24, nFrames = 6,
          delayCs = 10, seed = 300, fx = 1.0, fy = 2.0),
        1L -> Multimodal.syntheticAnimatedGif(48, 36, nFrames = 6,
          delayCs = 10, seed = 999, fx = 3.0, fy = 0.5))
      val media = clips.toDF("media_id", "content")
        .withColumn("modality", lit("video"))
        .withColumn("meta", struct(lit("fixture://gif").as("source"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("bigint").as("duration_ms")))
      val frames = Multimodal.sampleFrames(media, k).persist()
      val nReal = frames.filter(col("real")).count()
      require(nReal == clips.size.toLong * k,
        s"expected ${clips.size * k} real GIF frames, got $nReal")
      val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
      val badMagic = frames.filter(
        substring(col("content"), 1, 4) =!= lit(pngMagic)).count()
      require(badMagic == 0, s"$badMagic frames lack the PNG magic")
      // EXACT per-frame hashes vs a driver-side decode replay of the
      // same bytes (same decoder, different execution path — pins the
      // distributed plumbing byte-for-byte), and the authored timeline
      val got = frames
        .select(col("media_id"), col("frame_index"), col("frame_ms"),
          col("content"))
        .as[(Long, Int, Long, Array[Byte])].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      clips.foreach { case (id, bytes) =>
        val local = Multimodal.parseGifFrames(bytes)
          .getOrElse(sys.error(s"fixture $id must parse as GIF"))
        require(local.size == 6, s"fixture $id: ${local.size} frames")
        (0 until k).foreach { i =>
          val fi = math.min(local.size - 1, i * local.size / k)
          val (wantTs, png) = local(fi)
          require(wantTs == 100L * fi,
            s"clip $id frame $fi: ts $wantTs off the 10cs grid")
          val (gotTs, gotPng) = got((id, i))
          require(gotTs == wantTs &&
            java.util.Arrays.equals(gotPng, png),
            s"clip $id sampled frame $i diverges from the local replay")
        }
      }
      // the resized twin (and only it) survives the existing video
      // near-dup path, unchanged
      val pairs = Multimodal.videoPhashPairs(media, k = k, maxHamming = 8)
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
      require(pairs == Set((0L, 100L)),
        s"GIF near-dup pair drift: $pairs")
      frames
        .withColumn("content_digest", xxhash64(col("content")))
        .drop("content")
        .orderBy("media_id", "frame_index")
    })

  /** VIDEO near-duplicate pairs ([[Multimodal.videoPhashPairs]]): aligned
    * per-frame dHashes from REAL decoded MJPEG frames, banded candidates
    * with the frame index in the bucket key, mean-frame-hamming verify.
    * PROMOTED to oracle-checked (r18, the planted-twin template — see
    * mm_phash_pairs): 5 clip families (base + resized/re-encoded twin);
    * the planted pair table is index arithmetic both engines rebuild,
    * emitted with the COMPUTED per-pair found verdict + stray count the
    * oracle pins TRUE / 0. The exact-set require stays in-gate. */
  val mmVideoPhashPairs: Q = Q(
    "mm_video_phash_pairs",
    Some("""
      WITH f AS (SELECT unnest(range(0, 5)) AS k)
      SELECT k AS id1, 100 + k AS id2,
        TRUE AS found, CAST(0 AS BIGINT) AS stray_pairs
      FROM f
      ORDER BY id1, id2"""),
    (s, _) => {
      import s.implicits._
      val rows: Seq[(Long, String, Array[Byte])] = (0 until 5).flatMap { f =>
        val (fx, fy) = (1.0 + f, 0.5 + (f % 2) * 1.5)
        Seq(
          (f.toLong, "video",
            Multimodal.syntheticMjpegAvi(48, 36, 6, 10, seed = 100 + f,
              fx = fx, fy = fy)),
          (100L + f, "video",
            Multimodal.syntheticMjpegAvi(32, 24, 6, 10, seed = 100 + f,
              fx = fx, fy = fy)))
      }
      val media = rows.toDF("media_id", "modality", "content")
        .withColumn("meta", struct(lit("fixture://").as("uri"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("bigint").as("duration_ms")))
      val pairs = Multimodal.videoPhashPairs(media, k = 6, maxHamming = 8)
        .persist()
      if (!Tables.gateMode) pairs.orderBy("id1", "id2")
      else {
        val got = pairs.select(col("id1"), col("id2"))
          .as[(Long, Long)].collect().toSet
        val expected = (0 until 5).map(f => (f.toLong, 100L + f)).toSet
        require(got == expected,
          s"video pair set drift: unexpected=${(got -- expected).toSeq.sorted} " +
            s"missing=${(expected -- got).toSeq.sorted}")
        val stray = (got -- expected).size.toLong
        expected.toSeq.sorted
          .map { case (a, b) => (a, b, got.contains((a, b)), stray) }
          .toDF("id1", "id2", "found", "stray_pairs")
      }
    })

  /** AUDIO near-duplicate pairs ([[Multimodal.audioFingerprintPairs]]):
    * Haitsma–Kalker-shape spectral fingerprints from REAL decoded PCM
    * (pure-Scala FFT, absolute-Hz bands, time-based framing), exact-word
    * aligned-frame candidates, mean-bit-hamming verify. PROMOTED to
    * oracle-checked (r18, the planted-twin template — see
    * mm_phash_pairs): 4 chord families × (base, volume-scaled twin,
    * resampled-to-16k twin) plant exactly the 12 intra-family pairs as
    * an index-arithmetic table both engines rebuild, emitted with the
    * COMPUTED per-pair found verdict + stray count the oracle pins
    * TRUE / 0. The exact-set require stays in-gate (probed margins:
    * volume 0.0 bits, resample ≤ 2.9, strangers ≥ 5.7 —
    * tools/AudioFpProbe). */
  val mmAudioFpPairs: Q = Q(
    "mm_audio_fp_pairs",
    Some("""
      WITH f AS (SELECT unnest(range(0, 4)) AS k),
      p AS (
        SELECT k, k AS id1, 100 + k AS id2 FROM f
        UNION ALL SELECT k, k, 200 + k FROM f
        UNION ALL SELECT k, 100 + k, 200 + k FROM f)
      SELECT id1, id2, TRUE AS found, CAST(0 AS BIGINT) AS stray_pairs
      FROM p
      ORDER BY id1, id2"""),
    (s, _) => {
      import s.implicits._
      val chords = Seq(
        Seq(440.0 -> 1.0, 554.4 -> 0.7, 659.3 -> 0.5),
        Seq(523.3 -> 1.0, 659.3 -> 0.6, 784.0 -> 0.8),
        Seq(349.2 -> 0.9, 440.0 -> 0.4, 880.0 -> 0.7),
        Seq(392.0 -> 1.0, 493.9 -> 0.9, 587.3 -> 0.3))
      val rows: Seq[(Long, Array[Byte])] =
        chords.zipWithIndex.flatMap { case (c, i) =>
          Seq(
            (i.toLong, Multimodal.syntheticChordWav(c, 3.0, 8000)),
            (100L + i, Multimodal.syntheticChordWav(
              c.map { case (f, a) => (f, a * 0.55) }, 3.0, 8000)),
            (200L + i, Multimodal.syntheticChordWav(c, 3.0, 16000)))
        }
      val media = rows.toDF("media_id", "content")
      val pairs = Multimodal.audioFingerprintPairs(media, maxMeanBits = 4.0)
        .persist()
      if (!Tables.gateMode) pairs.orderBy("id1", "id2")
      else {
        val got = pairs.select(col("id1"), col("id2"))
          .as[(Long, Long)].collect().toSet
        val expected = chords.indices.flatMap(i => Seq(
          (i.toLong, 100L + i), (i.toLong, 200L + i),
          (100L + i, 200L + i))).toSet
        require(got == expected,
          s"audio pair set drift: unexpected=${(got -- expected).toSeq.sorted} " +
            s"missing=${(expected -- got).toSeq.sorted}")
        val stray = (got -- expected).size.toLong
        expected.toSeq.sorted
          .map { case (a, b) => (a, b, got.contains((a, b)), stray) }
          .toDF("id1", "id2", "found", "stray_pairs")
      }
    })

  /** Image perceptual-hash near-dup join ([[Multimodal.phashPairs]]):
    * real-pixel dHash through the banded hamming join. PROMOTED to
    * oracle-checked (r18, the dd_simhash planted-twin template): the
    * pixel pooling has no SQL mirror, but the PLANTED pair table is
    * pure index arithmetic both engines rebuild — over 8 smooth-field
    * families (base + resized twin + brightness-shifted twin) plus 8
    * unrelated noise images, the expected set is exactly the 24
    * intra-family pairs. The gate emits that table with the COMPUTED
    * per-pair `found` verdict and the stray-pair count, which the
    * oracle pins TRUE / 0 — full recall AND full precision hash-pinned.
    * The exact-set require stays in-gate (loud drift message);
    * bench/raw mode returns the production pair rows. Separations
    * measured by tools/PhashProbe: twins ≤ 8 bits, cross-family ≥ 28,
    * noise ≥ 26 — maxHamming 10 sits in the gap. */
  val mmPhashPairs: Q = Q(
    "mm_phash_pairs",
    Some("""
      WITH fams AS (SELECT unnest(range(0, 8)) AS k),
      p AS (
        SELECT k, k AS id1, 100 + k AS id2 FROM fams
        UNION ALL SELECT k, k, 110 + k FROM fams
        UNION ALL SELECT k, 100 + k, 110 + k FROM fams)
      SELECT id1, id2, TRUE AS found, CAST(0 AS BIGINT) AS stray_pairs
      FROM p
      ORDER BY id1, id2"""),
    (s, _) => {
      import s.implicits._
      val fams = (0 until 8).map { k =>
        (k.toLong, 1.0 + (k % 4), 0.5 + (k / 4) * 1.5, k * 0.9)
      }
      val rows: Seq[(Long, Array[Byte])] = fams.flatMap { case (k, fx, fy, ph) =>
        Seq(
          (k, Multimodal.sinusoidPng(64, 48, fx, fy, ph)),
          (100L + k, Multimodal.sinusoidPng(32, 24, fx, fy, ph)),
          (110L + k, Multimodal.sinusoidPng(64, 48, fx, fy, ph, brightness = 12)))
      } ++ (0 until 8).map(i =>
        (200L + i, Multimodal.syntheticPng(24, 18, 977L + i)))
      val media = rows.toDF("media_id", "content").repartition(4)
      val pairs = Multimodal.phashPairs(media, maxHamming = 10).persist()
      if (!Tables.gateMode) pairs.orderBy("id1", "id2")
      else {
        val got = pairs.select(col("id1"), col("id2"))
          .as[(Long, Long)].collect().toSet
        val expected = fams.map(_._1).flatMap(k =>
          Seq((k, 100 + k), (k, 110 + k), (100 + k, 110 + k))).toSet
        require(got == expected,
          s"phash pair set drift: unexpected=${(got -- expected).toSeq.sorted} " +
            s"missing=${(expected -- got).toSeq.sorted}")
        val stray = (got -- expected).size.toLong
        expected.toSeq.sorted
          .map { case (a, b) => (a, b, got.contains((a, b)), stray) }
          .toDF("id1", "id2", "found", "stray_pairs")
      }
    })

  /** Hard-negative mining: top-5 most-similar vectors with a DIFFERENT
    * label per query — the cosine arithmetic and tie-break mirror
    * sim_topk_bruteforce exactly, plus the cross-label filter. */
  val simHardNegatives: Q = Q(
    "sim_hard_negatives",
    Some("""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, label AS q_label, e AS qe
            FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, q_label, v.vec_id AS nid, v.label AS n_label,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v
        WHERE v.label IS NOT NULL AND q_label IS NOT NULL
          AND v.label != q_label),
      r AS (SELECT qid, q_label, nid, n_label, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM scored)
      SELECT qid, q_label, rank, nid, n_label, ROUND(cos, 6) AS cosine
      FROM r WHERE rank <= 5
      ORDER BY qid, rank"""),
    (s, dir) =>
      Similarity.hardNegatives(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", "label", col("vec_id") < 10, k = 5)
        .select(col("qid"), col("q_label"), col("rank"), col("nid"),
          col("n_label"), round(col("cosine"), 6).as("cosine"))
        .orderBy("qid", "rank"))

  // ---- distributed k-means (ops.KMeans) -------------------------------

  /** Unrolled Lloyd recurrence as DuckDB CTEs — the graph-family oracle
    * recipe applied to clustering: identical arithmetic form per step
    * (|x|² − 2·x·c + |c|² with sequential-fold sums, decimal-exact
    * component means rounded to 6 decimals before reuse), so per-row
    * cluster assignments track across engines. Probed margins between the
    * best and runner-up centroid are ≥ 2.3e-5 at every iteration on this
    * data — 8 orders above double noise, so argmin cannot flip. */
  private val KmK = 4; private val KmIters = 2; private val KmDim = 64
  private val KmSeed = "graft-km"

  private def kmDist(e: String, c: String): String =
    s"""list_sum(list_transform($e, x -> x * x))
        - 2 * list_sum(list_transform(generate_series(1, $KmDim), i -> $e[i] * $c[i]))
        + list_sum(list_transform($c, x -> x * x))"""

  /** CTE chain ending in `fin(vec_id, cid, dist)` — the final assignment
    * against the iteration-`KmIters` centroids. */
  private def kmOracleCtes: String = {
    val init = s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      c0 AS (
        SELECT cid, list_transform(e, x -> round(x, 6)) AS c FROM (
          SELECT e, row_number() OVER (ORDER BY
              md5(concat_ws('|', '$KmSeed', CAST(vec_id AS VARCHAR))), vec_id) - 1 AS cid
          FROM v) WHERE cid < $KmK)"""
    val steps = (1 to KmIters).map { t =>
      s"""sc$t AS (
        SELECT v.vec_id, v.e, c.cid, ${kmDist("v.e", "c.c")} AS dist FROM v, c${t - 1} c),
      a$t AS (
        SELECT vec_id, e, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM sc$t) WHERE rk = 1),
      m$t AS (
        SELECT cid, i, round(CAST(SUM(CAST(e[i] AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS m
        FROM a$t, generate_series(1, $KmDim) AS g(i)
        GROUP BY cid, i),
      c$t AS (
        SELECT p.cid, COALESCE(n.c, p.c) AS c
        FROM c${t - 1} p LEFT JOIN (SELECT cid, list(m ORDER BY i) AS c FROM m$t GROUP BY cid) n
        USING (cid))"""
    }
    val fin = s"""fin AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM (SELECT v.vec_id, c.cid, ${kmDist("v.e", "c.c")} AS dist
                FROM v, c$KmIters c)) WHERE rk = 1)"""
    (init +: steps :+ fin).mkString("WITH ", ",\n      ", "")
  }

  /** One fit per sf dir: four gates consume the identical deterministic
    * model — re-fitting per gate would redo initCentroids' collect plus
    * two Lloyd iterations four times for bit-identical results. */
  private val kmModels =
    scala.collection.concurrent.TrieMap[String, graft.ops.KMeans.Model]()

  private def kmAssigned(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.load(s, dir, "embeddings")
    val model = kmModels.getOrElseUpdate(dir,
      graft.ops.KMeans.fit(emb, "vec_id", "embedding",
        k = KmK, iters = KmIters, seed = KmSeed))
    graft.ops.KMeans.assign(emb, "embedding", model)
  }

  /** Distributed Lloyd k-means ([[graft.ops.KMeans]]): every row's final
    * cluster id and squared distance after 2 full iterations from the
    * deterministic hash seeding — a row-level match over the whole table
    * proves init, assignment, and the decimal-exact centroid update agree
    * across engines through the complete recurrence. */
  val kmAssign: Q = Q(
    "km_lloyd_assign",
    Some(s"""
      $kmOracleCtes
      SELECT vec_id, cid AS cluster_id, round(dist, 6) AS dist
      FROM fin ORDER BY vec_id"""),
    (s, dir) =>
      kmAssigned(s, dir)
        .select(col("vec_id"), col("cluster_id"),
          round(col("dist"), 6).as("dist"))
        .orderBy("vec_id"))

  /** Per-cluster census ([[graft.ops.KMeans.clusterSizes]]): size + mean
    * squared distance (decimal-exact sum before the ratio). */
  val kmSizes: Q = Q(
    "km_cluster_sizes",
    Some(s"""
      $kmOracleCtes
      SELECT cid AS cluster_id, count(*) AS size,
        round(CAST(SUM(CAST(dist AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS mean_sq_dist
      FROM fin GROUP BY cid ORDER BY cid"""),
    (s, dir) => graft.ops.KMeans.clusterSizes(kmAssigned(s, dir)))

  /** Prototype-based data pruning ([[graft.ops.KMeans.prunePrototypes]],
    * Sorscher et al. 2022 shape): keep the 30% of each cluster farthest
    * from its centroid. The oracle splices the per-cluster rank window
    * onto the same unrolled Lloyd CTEs — one hash match proves the
    * clustering AND the prune agree row-for-row across engines. Ranks are
    * over the 6-decimal-rounded distance (the value km_lloyd_assign
    * proves identical), never raw doubles. */
  val kmPrune: Q = Q(
    "km_prototype_prune",
    Some(s"""
      $kmOracleCtes,
      ranked AS (
        SELECT vec_id, cid, round(dist, 6) AS dist,
          row_number() OVER (PARTITION BY cid
            ORDER BY round(dist, 6) DESC, vec_id) AS proto_rank,
          count(*) OVER (PARTITION BY cid) AS n
        FROM fin)
      SELECT vec_id, cid AS cluster_id, dist, proto_rank
      FROM ranked
      WHERE proto_rank <= greatest(1, ceil(0.3 * n))
      ORDER BY vec_id"""),
    (s, dir) =>
      graft.ops.KMeans.prunePrototypes(kmAssigned(s, dir), "vec_id",
          keepFraction = 0.3)
        .select(col("vec_id"), col("cluster_id"),
          round(col("dist"), 6).as("dist"), col("proto_rank"))
        .orderBy("vec_id"))

  /** Topic-rebalance INTEGRATION gate: the fitted clusters become the
    * domains of [[graft.ops.Sampling.temperatureSample]] (α = 0.5) — the
    * cluster-balanced corpus mix. The oracle splices the temperature
    * CTEs onto the Lloyd CTEs, so one hash match proves k-means,
    * the n^α rate table, and the identity-hash keep decisions compose
    * identically across engines. */
  val kmRebalance: Q = Q(
    "km_topic_rebalance",
    Some(s"""
      $kmOracleCtes,
      cc AS (SELECT cid, CAST(count(*) AS DOUBLE) AS n FROM fin GROUP BY cid),
      qq AS (SELECT cid, n, pow(n, 0.5) / sum(pow(n, 0.5)) OVER () AS qi FROM cc),
      tt AS (SELECT cid, n, qi, min(n / qi) OVER () AS t FROM qq),
      rr AS (
        SELECT cid,
          CASE WHEN n / qi <= t THEN 1.0
               ELSE least(1.0, floor(qi * t / n * 1e6) / 1e6) END AS keep_rate
        FROM tt)
      SELECT f.vec_id, f.cid AS cluster_id
      FROM fin f JOIN rr USING (cid)
      WHERE CAST(concat('0x', substr(md5(concat_ws('|', 'graft',
          CAST(f.vec_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
        < rr.keep_rate
      ORDER BY f.vec_id"""),
    (s, dir) =>
      graft.ops.Sampling.temperatureSample(kmAssigned(s, dir),
          domainCol = "cluster_id", alpha = 0.5, keys = Seq("vec_id"))
        .select(col("vec_id"), col("cluster_id"))
        .orderBy("vec_id"))

  /** Farthest-point coreset, FULL greedy recurrence unrolled as oracle
    * CTEs (the k-means gate discipline): seed = min-identity-hash row,
    * then two argmax-of-min-distance picks whose raw doubles must match
    * bit-for-bit through the |x|²−2·x·s+|s|² sequential-fold mirror. */
  val simFpsCoreset: Q = Q(
    "sim_fps_coreset",
    Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE embedding IS NOT NULL),
      s0 AS (
        SELECT vec_id, e FROM v
        ORDER BY md5(concat_ws('|', 'graft-fps', CAST(vec_id AS VARCHAR))),
          vec_id
        LIMIT 1),
      d1 AS (
        SELECT v.vec_id, v.e,
          list_sum(list_transform(v.e, x -> x * x))
          - 2.0 * list_sum(list_transform(generate_series(1, 64),
              i -> v.e[i] * s0.e[i]))
          + list_sum(list_transform(s0.e, x -> x * x)) AS d
        FROM v, s0),
      s1 AS (SELECT vec_id, e, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
      d2 AS (
        SELECT d1.vec_id, d1.e,
          LEAST(d1.d,
            list_sum(list_transform(d1.e, x -> x * x))
            - 2.0 * list_sum(list_transform(generate_series(1, 64),
                i -> d1.e[i] * s1.e[i]))
            + list_sum(list_transform(s1.e, x -> x * x))) AS d
        FROM d1, s1),
      s2 AS (SELECT vec_id, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1)
      SELECT 0 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS dist FROM s0
      UNION ALL SELECT 1 AS sel_rank, vec_id, d AS dist FROM s1
      UNION ALL SELECT 2 AS sel_rank, vec_id, d AS dist FROM s2
      ORDER BY sel_rank"""),
    (s, dir) => {
      import s.implicits._
      Similarity.farthestPointSample(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 3)
        .map(p => (p.rank, p.id, p.dist))
        .toDF("sel_rank", "vec_id", "dist")
        .orderBy("sel_rank")
    })

  /** The k=8 FPS greedy recurrence unrolled MECHANICALLY (the
    * sim_fps_coreset discipline at depth): a Scala loop generates the
    * dᵢ = LEAST(dᵢ₋₁, ‖x−sᵢ₋₁‖²) / sᵢ = argmax CTE chain, so the oracle
    * replays every one of the 8 picks and raw min-distances
    * bit-for-bit. */
  private val fpsDeepSql: String = {
    val sb = new StringBuilder
    sb.append("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE embedding IS NOT NULL),
      s0 AS (
        SELECT vec_id, e FROM v
        ORDER BY md5(concat_ws('|', 'graft-fps', CAST(vec_id AS VARCHAR))),
          vec_id
        LIMIT 1),
      d1 AS (
        SELECT v.vec_id, v.e,
          list_sum(list_transform(v.e, x -> x * x))
          - 2.0 * list_sum(list_transform(generate_series(1, 64),
              i -> v.e[i] * s0.e[i]))
          + list_sum(list_transform(s0.e, x -> x * x)) AS d
        FROM v, s0),
      s1 AS (SELECT vec_id, e, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1)""")
    for (n <- 2 until 8) {
      sb.append(s""",
      d$n AS (
        SELECT d${n - 1}.vec_id, d${n - 1}.e,
          LEAST(d${n - 1}.d,
            list_sum(list_transform(d${n - 1}.e, x -> x * x))
            - 2.0 * list_sum(list_transform(generate_series(1, 64),
                i -> d${n - 1}.e[i] * s${n - 1}.e[i]))
            + list_sum(list_transform(s${n - 1}.e, x -> x * x))) AS d
        FROM d${n - 1}, s${n - 1}),
      s$n AS (SELECT vec_id, e, d FROM d$n ORDER BY d DESC, vec_id LIMIT 1)""")
    }
    sb.append("""
      SELECT 0 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS dist FROM s0""")
    for (n <- 1 until 8) sb.append(s"""
      UNION ALL SELECT $n AS sel_rank, vec_id, d AS dist FROM s$n""")
    sb.append("""
      ORDER BY sel_rank""")
    sb.toString
  }

  /** Deeper FPS run — PROMOTED to FULLY oracle-checked (r17): the
    * formerly "too deep to unroll" greedy is unrolled by GENERATING the
    * CTE chain (see [[fpsDeepSql]]), so all 8 picks and their raw
    * min-distances are exact-value matches, not pinned verdicts. The
    * k-center structural self-checks (non-increasing distances,
    * distinct picks) stay in-gate. */
  val simFpsDeep: Q = Q(
    "sim_fps_deep",
    Some(fpsDeepSql),
    (s, dir) => {
      import s.implicits._
      val picks = Similarity.farthestPointSample(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
      require(picks.map(_.id).distinct.size == picks.size,
        "FPS picked a duplicate id")
      val ds = picks.flatMap(_.dist)
      require(ds.zip(ds.tail).forall { case (a, b) => a >= b },
        s"selection distances must be non-increasing: $ds")
      picks.map(p => (p.rank, p.id, p.dist))
        .toDF("sel_rank", "vec_id", "dist")
        .orderBy("sel_rank")
    })

  /** MMR re-rank at k=2, λ=0.5 — the greedy unrolled as CTEs: first pick
    * = argmax λ·cos(q,d), second = argmax λ·cos(q,d) − (1−λ)·cos(d,s1),
    * ties to the smallest id, raw doubles through the same sequential
    * folds ([[graft.functions.MmrSelect]]). λ=0.5 keeps 1−λ exact in
    * binary so both engines weight identically. */
  val simMmrRerank: Q = Q(
    "sim_mmr_rerank",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid, v.e AS ne,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      short AS (
        SELECT qid, nid, ne, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cos DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 20),
      s1 AS (
        SELECT qid, nid, ne, 0.5 * cos AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY 0.5 * cos DESC, nid) AS r
          FROM short)
        WHERE r = 1),
      s2cand AS (
        SELECT sh.qid, sh.nid,
          0.5 * sh.cos - 0.5 *
            (list_sum(list_transform(generate_series(1, len(sh.ne)),
                i -> sh.ne[i] * s1.ne[i]))
              / (sqrt(list_sum(list_transform(sh.ne, x -> x * x)))
                 * sqrt(list_sum(list_transform(s1.ne, x -> x * x))))) AS score
        FROM short sh JOIN s1 ON sh.qid = s1.qid AND sh.nid != s1.nid),
      s2 AS (
        SELECT qid, nid, score FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY score DESC, nid) AS r
          FROM s2cand)
        WHERE r = 1)
      SELECT qid, 0 AS sel_rank, nid, score FROM s1
      UNION ALL SELECT qid, 1 AS sel_rank, nid, score FROM s2
      ORDER BY qid, sel_rank"""),
    (s, dir) =>
      Similarity.mmrRerank(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10,
          k = 2, lambda = 0.5, shortlist = 20)
        .orderBy("qid", "sel_rank"))

  /** The k=5 MMR greedy unrolled MECHANICALLY per query (λ = 0.7,
    * shortlist 25): a Scala loop generates the mᵢ (GREATEST-accumulated
    * max-similarity-to-picked, picked rows excluded) / sᵢ (argmax of
    * λ·cos − (1−λ)·penalty, ties to the smallest id) CTE chain, so the
    * oracle replays all five picks and raw scores bit-for-bit. Every λ
    * literal is CAST(… AS DOUBLE) in the SQL: DuckDB parses bare 0.7 as
    * DECIMAL, making (1.0 − 0.7) an exact 0.3 — one ulp away from the
    * JVM's 1.0 − 0.7 double (= 0.30000000000000004), which flipped 12
    * score cells before the cast (r17 measurement; λ = 0.5 in the k=2
    * twin dodged this because 0.5 is exact in both systems). */
  private val mmrDeepSql: String = {
    def cosSql(a: String, b: String) =
      s"""list_sum(list_transform(generate_series(1, len($a.ne)),
              i -> $a.ne[i] * $b.ne[i]))
            / (sqrt(list_sum(list_transform($a.ne, x -> x * x)))
               * sqrt(list_sum(list_transform($b.ne, x -> x * x))))"""
    val sb = new StringBuilder
    sb.append("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid, v.e AS ne,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      m0 AS (
        SELECT qid, nid, ne, cos, 0.0 AS msim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cos DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 25),
      s1 AS (
        SELECT qid, nid, ne, CAST(0.7 AS DOUBLE) * cos - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * CAST(0.0 AS DOUBLE) AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY CAST(0.7 AS DOUBLE) * cos - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * CAST(0.0 AS DOUBLE) DESC, nid) AS r
          FROM m0)
        WHERE r = 1)""")
    for (n <- 2 to 5) {
      val (mp, sp) = (s"m${n - 1}", s"s${n - 1}")
      val acc =
        if (n == 2) cosSql("m0", sp)
        else s"GREATEST($mp.msim, ${cosSql(mp, sp)})"
      val src = if (n == 2) "m0" else mp
      sb.append(s""",
      m$n AS (
        SELECT $src.qid, $src.nid, $src.ne, $src.cos,
          $acc AS msim
        FROM $src JOIN $sp USING (qid) WHERE $src.nid != $sp.nid),
      s$n AS (
        SELECT qid, nid, ne,
          CAST(0.7 AS DOUBLE) * cos - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY CAST(0.7 AS DOUBLE) * cos - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim DESC, nid) AS r
          FROM m$n)
        WHERE r = 1)""")
    }
    sb.append("""
      SELECT qid, 0 AS sel_rank, nid, score FROM s1""")
    for (n <- 2 to 5) sb.append(s"""
      UNION ALL SELECT qid, ${n - 1} AS sel_rank, nid, score FROM s$n""")
    sb.append("""
      ORDER BY qid, sel_rank""")
    sb.toString
  }

  /** Deeper MMR — PROMOTED to FULLY oracle-checked (r17): the generated
    * CTE chain ([[mmrDeepSql]]) replays the whole k=5 greedy, so picks
    * AND raw scores are exact-value matches. The structural self-checks
    * (first pick = cosine top-1, exactly 5 distinct picks per query)
    * stay in-gate. */
  val simMmrDeep: Q = Q(
    "sim_mmr_deep",
    Some(mmrDeepSql),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val out = Similarity.mmrRerank(embs, "vec_id", "embedding",
        col("vec_id") < 10, k = 5, lambda = 0.7, shortlist = 25)
      val top1 = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
          col("vec_id") < 10, k = 1)
        .select(col("qid"), col("nid").as("best"))
      val firsts = out.filter(col("sel_rank") === 0)
        .join(top1, "qid").filter(col("nid") =!= col("best")).count()
      require(firsts == 0, s"$firsts queries' first MMR pick != cosine top-1")
      val counts = out.groupBy("qid")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("nid")).as("d")).collect()
      require(counts.length == 10 &&
        counts.forall(r => r.getAs[Long]("n") == 5 &&
          r.getAs[Long]("d") == 5),
        "every query needs exactly 5 distinct picks")
      out.select(col("qid"), col("sel_rank"), col("nid"), col("score"))
        .orderBy("qid", "sel_rank")
    })

  /** Hybrid-retrieval fusion ([[graft.ops.Similarity.rrfFuse]]): fuse a
    * cosine top-20 list with a dot-product top-20 list (two genuinely
    * different rankings on unnormalized vectors — dot rewards long
    * vectors, cosine doesn't) into RRF top-10 per query. The oracle
    * rebuilds both ranked lists AND the fusion: reciprocal terms
    * rounded to 12 and decimal-folded identically. */
  val simRrfHybrid: Q = Q(
    "sim_rrf_hybrid",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)),
            i -> qe[i] * e[i])) AS dot,
          list_sum(list_transform(generate_series(1, len(qe)),
            i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      lc AS (SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY cos DESC, nid) AS r FROM scored),
      ld AS (SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY dot DESC, nid) AS r FROM scored),
      u AS (SELECT qid, nid, r FROM lc WHERE r <= 20
            UNION ALL SELECT qid, nid, r FROM ld WHERE r <= 20),
      fused AS (
        SELECT qid, nid,
          round(CAST(SUM(CAST(round(CAST(1.0 AS DOUBLE) / (r + 60), 12)
            AS DECIMAL(38,14))) AS DOUBLE), 9) AS rrf,
          CAST(count(*) AS BIGINT) AS n_lists
        FROM u GROUP BY qid, nid),
      rk AS (
        SELECT qid, nid, rrf, n_lists, row_number() OVER (
          PARTITION BY qid ORDER BY rrf DESC, nid) AS rank
        FROM fused)
      SELECT qid, CAST(rank AS INT) AS rank, nid, rrf, n_lists
      FROM rk WHERE rank <= 10
      ORDER BY qid, rank"""),
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cosList = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 20)
      val corpus = emb.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nv"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qv"))
      val wDot = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))
      val dotList = corpus.crossJoin(broadcast(queries))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          Similarity.dot(col("qv"), col("nv")).as("dot"))
        .withColumn("rank", row_number().over(wDot))
        .filter(col("rank") <= 20)
      Similarity.rrfFuse(Seq(cosList, dotList), "qid", "nid", "rank",
          kConst = 60, topK = 10)
        .orderBy("qid", "rank")
    })

  /** Borda-count fusion over the SAME two hybrid lists as
    * `sim_rrf_hybrid` (cosine ⊕ dot top-20): all-integer positional
    * scores, so the oracle is exact BIGINT arithmetic end to end — the
    * rank-fusion twin with no rounding contract at all. */
  val simBordaFusion: Q = Q(
    "sim_borda_fusion",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      scored AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)),
            i -> qe[i] * e[i])) AS dot,
          list_sum(list_transform(generate_series(1, len(qe)),
            i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      lc AS (SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY cos DESC, nid) AS r FROM scored),
      ld AS (SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY dot DESC, nid) AS r FROM scored),
      u AS (SELECT qid, nid, r FROM lc WHERE r <= 20
            UNION ALL SELECT qid, nid, r FROM ld WHERE r <= 20),
      fused AS (
        SELECT qid, nid, CAST(SUM(20 - r + 1) AS BIGINT) AS borda,
          CAST(count(*) AS BIGINT) AS n_lists
        FROM u GROUP BY qid, nid),
      rk AS (
        SELECT qid, nid, borda, n_lists, row_number() OVER (
          PARTITION BY qid ORDER BY borda DESC, nid) AS rank
        FROM fused)
      SELECT qid, CAST(rank AS INT) AS rank, nid, borda, n_lists
      FROM rk WHERE rank <= 10
      ORDER BY qid, rank"""),
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cosList = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 20)
      val corpus = emb.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nv"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qv"))
      val wDot = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))
      val dotList = corpus.crossJoin(broadcast(queries))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          Similarity.dot(col("qv"), col("nv")).as("dot"))
        .withColumn("rank", row_number().over(wDot))
        .filter(col("rank") <= 20)
      Similarity.bordaFuse(Seq(cosList, dotList), "qid", "nid", "rank",
          listK = 20, topK = 10)
        .orderBy("qid", "rank")
    })

  /** Semantic decontamination ([[graft.ops.Decontaminate.semanticOverlap]]):
    * the embedding-space leakage screen n-gram decontamination can't
    * provide (paraphrased eval items share no shingles but sit at high
    * cosine). Benchmark = every 25th embedding; per corpus vector the max
    * benchmark cosine and the ≥ 0.35 verdict — RAW doubles hash-compared
    * (both engines fold the dot in index order; max of identical doubles
    * is exact). The gate also cross-checks [[Decontaminate.semanticClean]]
    * against the flagged count. */
  val ddSemanticDecontaminate: Q = Q(
    "dd_semantic_decontaminate",
    Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings WHERE embedding IS NOT NULL),
      b AS (SELECT e AS be FROM v WHERE vec_id % 25 = 0),
      c AS (SELECT vec_id, e FROM v WHERE vec_id % 25 <> 0),
      s AS (
        SELECT c.vec_id,
          list_sum(list_transform(generate_series(1, len(c.e)),
            j -> c.e[j] * b.be[j]))
          / (sqrt(list_sum(list_transform(c.e, x -> x * x)))
             * sqrt(list_sum(list_transform(b.be, x -> x * x)))) AS cos
        FROM c, b)
      SELECT vec_id, max(cos) AS max_cos,
        max(cos) >= 0.35 AS contaminated
      FROM s GROUP BY vec_id
      ORDER BY vec_id"""),
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val bench = emb.filter(col("vec_id") % 25 === 0)
      val corpus = emb.filter(col("vec_id") % 25 =!= 0)
      val out = graft.ops.Decontaminate.semanticOverlap(
        corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.35)
      val nFlagged = out.filter(col("contaminated") === true).count()
      val nClean = graft.ops.Decontaminate.semanticClean(
        corpus, "vec_id", "embedding", bench, "embedding",
        threshold = 0.35).count()
      require(nClean == corpus.count() - nFlagged,
        s"clean count $nClean inconsistent with $nFlagged flagged")
      out.select(col("id").as("vec_id"), col("max_cos"), col("contaminated"))
        .orderBy("vec_id")
    })

  /** Shared margin-scoring SQL body ([[graft.ops.Bitext]]): even vec_ids
    * play corpus X, odd play corpus Y; ratio margins per Artetxe &
    * Schwenk with k=4 neighborhoods — cosines rounded-12 once on the
    * symmetric pair table, penalties decimal-folded, margins rounded-6,
    * every rank tie-breaking on the partner id. */
  private val bitextScoredSql: String = """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings WHERE vec_id < 500),
      xr AS (SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, t -> t * t))) AS nrm
             FROM v WHERE vec_id % 2 = 0),
      x AS (SELECT vec_id AS x_id,
              list_transform(e, t -> t / nrm) AS xv
            FROM xr WHERE nrm > 0),
      yr AS (SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, t -> t * t))) AS nrm
             FROM v WHERE vec_id % 2 = 1),
      y AS (SELECT vec_id AS y_id,
              list_transform(e, t -> t / nrm) AS yv
            FROM yr WHERE nrm > 0),
      p AS (
        SELECT x_id, y_id,
          round(list_sum(list_transform(generate_series(1, len(xv)),
              i -> xv[i] * yv[i])), 12) AS c
        FROM x, y),
      r AS (
        SELECT x_id, y_id, c,
          row_number() OVER (PARTITION BY x_id ORDER BY c DESC, y_id) AS rf,
          row_number() OVER (PARTITION BY y_id ORDER BY c DESC, x_id) AS rb
        FROM p),
      px AS (
        SELECT x_id, round(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE)
          / count(*), 12) AS px
        FROM r WHERE rf <= 4 GROUP BY x_id),
      py AS (
        SELECT y_id, round(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE)
          / count(*), 12) AS py
        FROM r WHERE rb <= 4 GROUP BY y_id),
      m AS (
        SELECT r.x_id, r.y_id, c, rf, rb,
          round(c / ((px.px + py.py) / 2), 6) AS margin
        FROM r JOIN px USING (x_id) JOIN py USING (y_id))"""

  /** BOUNDED-CORPUS anchor sides: the exact miner is |X|·|Y| by design
    * (the small-corpora correctness baseline), so its gates and headline
    * bench line run over a SIZE-PINNED slice (vec_id < 500 — the whole
    * table at the grading sf0.01, a fixed anchor at every larger sf).
    * Growing data must grow the IVF line (sim_bitext_corpus_ivf), never
    * this one: an unpinned exact line would go ~100× at sf1 and read as
    * a regression of a path that is documented as not the scale path. */
  private def bitextSides(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val embs = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
    (embs.filter(col("vec_id") % 2 === 0),
      embs.filter(col("vec_id") % 2 === 1))
  }

  /** Mutual-best mined pairs above margin 1.0 — the miner's output
    * table, hash-checked row for row. */
  val bitextMine: Q = Q(
    "sim_bitext_mine",
    Some(bitextScoredSql + """,
      mb AS (
        SELECT x_id, y_id, c, margin,
          row_number() OVER (PARTITION BY x_id
            ORDER BY margin DESC, y_id) AS bf,
          row_number() OVER (PARTITION BY y_id
            ORDER BY margin DESC, x_id) AS bb
        FROM m WHERE rf <= 4 OR rb <= 4)
      SELECT x_id, y_id, c AS cosine, margin
      FROM mb WHERE bf = 1 AND bb = 1 AND margin >= 1.0
      ORDER BY x_id"""),
    (s, dir) => {
      val (xs, ys) = bitextSides(s, dir)
      val mined = graft.ops.Bitext.marginMine(xs, ys, "vec_id", "embedding",
        k = 4, minMargin = 1.0).persist()
      try {
        // mutual-best is one-to-one by construction — a duplicated endpoint
        // means the best-rank windows broke. One aggregate over the
        // persisted result instead of three separate actions (count + two
        // distinct counts), each of which re-ran the full |X|·|Y| pipeline
        // (r18: the unpersisted form computed the miner 4× per bench
        // iteration — the noop sink being the 4th).
        val st = mined.agg(count(lit(1)).as("n"),
          countDistinct(col("x_id")).as("nx"),
          countDistinct(col("y_id")).as("ny")).head()
        val n = st.getAs[Long]("n")
        require(n > 0, "margin mining found no pairs on the fixture")
        require(st.getAs[Long]("nx") == n && st.getAs[Long]("ny") == n,
          "mined pairs must be one-to-one on both sides")
        if (Tables.gateMode) mined.orderBy("x_id")
        else mined.orderBy("x_id").localCheckpoint()
      } finally { mined.unpersist(blocking = false); () }
    })

  /** IVF-blocked margin mining ([[graft.ops.Bitext.marginMineIvf]]) —
    * the 100 TB path (candidates = probed cells, never |X|·|Y|) —
    * PROMOTED to oracle-checked (r17, the differential template): the
    * quantizer's k-means fit is not SQL-expressible, so the gate emits
    * the EXACT miner's pair count (DuckDB rebuilds the whole margin
    * pipeline — the sim_bitext_mine oracle's own CTEs) plus the three
    * COMPUTED verdicts pinned TRUE: recall ≥ 0.6 vs the exact miner,
    * cosine agreement on every co-mined pair (approximate retrieval,
    * EXACT scoring), and one-to-one mutual-best structure. */
  val bitextMineIvf: Q = Q(
    "sim_bitext_mine_ivf",
    Some(bitextScoredSql + """,
      mb AS (
        SELECT x_id, y_id, c, margin,
          row_number() OVER (PARTITION BY x_id
            ORDER BY margin DESC, y_id) AS bf,
          row_number() OVER (PARTITION BY y_id
            ORDER BY margin DESC, x_id) AS bb
        FROM m WHERE rf <= 4 OR rb <= 4)
      SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
        TRUE AS recall_floor_met, TRUE AS cosines_exact,
        TRUE AS one_to_one
      FROM mb WHERE bf = 1 AND bb = 1 AND margin >= 1.0"""),
    (s, dir) => {
      val (xs, ys) = bitextSides(s, dir)
      val approx = graft.ops.Bitext.marginMineIvf(xs, ys, "vec_id",
        "embedding", k = 4, minMargin = 1.0, nLists = 8, nProbe = 3)
      val exact = graft.ops.Bitext.marginMine(xs, ys, "vec_id", "embedding",
        k = 4, minMargin = 1.0)
      val a = approx.collect().map(r =>
        (r.getAs[Long]("x_id"), r.getAs[Long]("y_id")) ->
          (r.getAs[Double]("cosine"), r.getAs[Double]("margin"))).toMap
      val e = exact.collect().map(r =>
        (r.getAs[Long]("x_id"), r.getAs[Long]("y_id")) ->
          (r.getAs[Double]("cosine"), r.getAs[Double]("margin"))).toMap
      require(e.nonEmpty, "exact miner found no pairs on the fixture")
      val recall = e.keySet.count(a.contains).toDouble / e.size
      val recallOk = recall >= 0.6
      require(recallOk,
        s"IVF bitext recall $recall < 0.6 vs the exact miner (${e.size} pairs)")
      // retrieved-and-exact pairs must agree on the cosine (the scorer is
      // exact on whatever the blocking retrieves; margins may differ — the
      // candidate neighborhoods do)
      val cosOk = a.forall { case (k2, (c, _)) =>
        e.get(k2).forall { case (ce, _) => c == ce } }
      require(cosOk, "an IVF-mined pair's cosine diverged from the exact scorer")
      val n = approx.count()
      val oneToOne = approx.select("x_id").distinct().count() == n &&
        approx.select("y_id").distinct().count() == n
      require(oneToOne, "IVF-mined pairs must be one-to-one on both sides")
      import s.implicits._
      Seq((e.size.toLong, recallOk, cosOk, oneToOne))
        .toDF("n_exact_pairs", "recall_floor_met", "cosines_exact",
          "one_to_one")
    })

  /** The top-k-neighborhood candidate table with both ranks — the
    * threshold-tuning view, every margin hash-checked. */
  val bitextScores: Q = Q(
    "sim_bitext_scores",
    Some(bitextScoredSql + """
      SELECT x_id, y_id, c AS cosine, margin,
        CAST(rf AS INT) AS fwd_rank, CAST(rb AS INT) AS bwd_rank
      FROM m WHERE rf <= 4 OR rb <= 4
      ORDER BY x_id, y_id"""),
    (s, dir) => {
      val (xs, ys) = bitextSides(s, dir)
      graft.ops.Bitext.marginScores(xs, ys, "vec_id", "embedding", k = 4)
        .orderBy("x_id", "y_id")
    })

  /** Corpus-scale bitext mining — [[graft.ops.Bitext.marginMineIvf]]
    * over the FULL (unpinned) embeddings table, even ids vs odd. This is
    * the headline bench line for the family: its cost grows with
    * Σ probed-cell sizes, so it scales with data where the exact
    * anchor's |X|·|Y| cannot (ScaleBench measures the candidate growth
    * directly via ivfCandidatePairs). Rows-only: the quantizer fit is
    * not SQL-expressible, and the recall differential already lives in
    * sim_bitext_mine_ivf's gate — here the in-gate contract is the
    * structural one (nonempty, one-to-one, margins above the cut). */
  val bitextCorpusIvf: Q = Q(
    "sim_bitext_corpus_ivf",
    // PROMOTED to oracle-checked (r17): at the grading sf the full
    // corpus IS the exact anchor's vec_id < 500 slice, so the oracle
    // rebuilds the exact miner's pair count from the same CTEs and pins
    // the recall/one-to-one/margin verdicts TRUE; the differential runs
    // ONLY in gate mode — the bench headline still times the pure IVF
    // path at every sf (where the |X|·|Y| exact side would be the very
    // cost this operator exists to avoid).
    Some(bitextScoredSql + """,
      mb AS (
        SELECT x_id, y_id, c, margin,
          row_number() OVER (PARTITION BY x_id
            ORDER BY margin DESC, y_id) AS bf,
          row_number() OVER (PARTITION BY y_id
            ORDER BY margin DESC, x_id) AS bb
        FROM m WHERE rf <= 4 OR rb <= 4)
      SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
        TRUE AS recall_floor_met, TRUE AS one_to_one,
        TRUE AS margins_clear_cut
      FROM mb WHERE bf = 1 AND bb = 1 AND margin >= 1.0"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val xs = embs.filter(col("vec_id") % 2 === 0)
      val ys = embs.filter(col("vec_id") % 2 === 1)
      val mined = graft.ops.Bitext.marginMineIvf(xs, ys, "vec_id",
        "embedding", k = 4, minMargin = 1.0, nLists = 16, nProbe = 4)
        .persist()
      try {
        // one aggregate for all four structural checks (was four separate
        // actions: count, two distinct counts, a filter-isEmpty — each its
        // own job round-trip over the persisted result)
        val st = mined.agg(count(lit(1)).as("n"),
          countDistinct(col("x_id")).as("nx"),
          countDistinct(col("y_id")).as("ny"),
          min(col("margin")).as("mmin")).head()
        val n = st.getAs[Long]("n")
        require(n > 0, "corpus IVF mining found no pairs")
        val oneToOne = st.getAs[Long]("nx") == n && st.getAs[Long]("ny") == n
        require(oneToOne, "mined pairs must be one-to-one on both sides")
        val marginsOk = st.getAs[Double]("mmin") >= 1.0
        require(marginsOk, "every mined pair must clear the margin cut")
        if (!Tables.gateMode) mined.orderBy("x_id").localCheckpoint()
        else {
          val exact = graft.ops.Bitext.marginMine(xs, ys, "vec_id",
            "embedding", k = 4, minMargin = 1.0)
          val e = exact.select("x_id", "y_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val a = mined.select("x_id", "y_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          require(e.nonEmpty, "exact miner found no pairs on the fixture")
          val recall = e.count(a.contains).toDouble / e.size
          val recallOk = recall >= 0.5
          require(recallOk,
            s"corpus IVF recall $recall < 0.5 vs exact (${e.size} pairs)")
          import s.implicits._
          Seq((e.size.toLong, recallOk, oneToOne, marginsOk))
            .toDF("n_exact_pairs", "recall_floor_met", "one_to_one",
              "margins_clear_cut")
        }
      } finally { mined.unpersist(blocking = false); () }
    })

  /** Deterministic "retrained encoder" second snapshot: every 7th vector
    * dropped, every surviving vector offset by 0.01·(dim index + 1) —
    * both engines rebuild it exactly. */
  private val driftSnapshotsSql: String = """
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      nv AS (
        SELECT vec_id, label,
          list_transform(generate_series(1, len(e)), i -> e[i] + 0.01 * i)
            AS e
        FROM v WHERE vec_id % 7 <> 0)"""

  private def driftNewSnapshot(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.01) * (i + 1)).as("embedding"))

  /** Per-label centroid drift between embedding snapshots
    * ([[graft.ops.EmbeddingDrift.centroidDrift]]): 6-rounded centroids,
    * 12-rounded decimal drift folds — every term re-derived in DuckDB. */
  val embCentroidDrift: Q = Q(
    "emb_centroid_drift",
    Some(driftSnapshotsSql + """,
      ca AS (
        SELECT label, d - 1 AS dim, ROUND(avg(val), 6) AS c1
        FROM (SELECT label, unnest(generate_series(1, len(e))) AS d,
                unnest(e) AS val FROM v)
        GROUP BY label, d),
      cb AS (
        SELECT label, d - 1 AS dim, ROUND(avg(val), 6) AS c2
        FROM (SELECT label, unnest(generate_series(1, len(e))) AS d,
                unnest(e) AS val FROM nv)
        GROUP BY label, d),
      j AS (SELECT ca.label, c1, c2
            FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim),
      g AS (
        SELECT label,
          CAST(SUM(CAST(round(c1 * c2, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS dot,
          CAST(SUM(CAST(round(c1 * c1, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS n1,
          CAST(SUM(CAST(round(c2 * c2, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS n2,
          CAST(SUM(CAST(round((c1 - c2) * (c1 - c2), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS d2
        FROM j GROUP BY 1)
      SELECT label,
        CASE WHEN n1 > 0 AND n2 > 0
          THEN round(dot / (sqrt(n1) * sqrt(n2)), 6) END AS cosine,
        round(sqrt(d2), 6) AS l2_shift
      FROM g ORDER BY label"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      graft.ops.EmbeddingDrift.centroidDrift(embs, driftNewSnapshot(embs),
          "label", "embedding")
        .orderBy("label")
    })

  /** Per-id displacement between the same snapshots
    * ([[graft.ops.EmbeddingDrift.idDisplacement]]) — row-level
    * forensics; dropped ids never report. */
  val embIdDisplacement: Q = Q(
    "emb_id_displacement",
    Some(driftSnapshotsSql + """
      SELECT v.vec_id AS id,
        round(list_sum(list_transform(generate_series(1, len(v.e)),
            i -> v.e[i] * nv.e[i]))
          / (sqrt(list_sum(list_transform(v.e, x -> x * x)))
             * sqrt(list_sum(list_transform(nv.e, x -> x * x)))), 6)
          AS cosine,
        round(sqrt(list_sum(list_transform(generate_series(1, len(v.e)),
            i -> (v.e[i] - nv.e[i]) * (v.e[i] - nv.e[i])))), 6)
          AS l2_shift
      FROM v JOIN nv ON v.vec_id = nv.vec_id
      ORDER BY id"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      graft.ops.EmbeddingDrift.idDisplacement(embs, driftNewSnapshot(embs),
          "vec_id", "embedding")
        .orderBy("id")
    })

  /** Shared silhouette SQL ([[graft.ops.ClusterEval]]): every 8th vector
    * scored against the full corpus, clusters = the label column;
    * distances rounded-12, per-cluster means decimal-folded. */
  private val silhouetteSql: String = """
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings WHERE label IS NOT NULL),
      p AS (SELECT vec_id AS pid, label AS pc, e AS pe
            FROM v WHERE vec_id % 8 = 0),
      d AS (
        SELECT pid, pc, v.label AS nc,
          round(sqrt(list_sum(list_transform(
            generate_series(1, len(pe)),
            i -> (pe[i] - e[i]) * (pe[i] - e[i])))), 12) AS dist
        FROM p, v WHERE v.vec_id != pid),
      g AS (
        SELECT pid, pc, nc,
          round(CAST(SUM(CAST(dist AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 12) AS md
        FROM d GROUP BY pid, pc, nc),
      sil AS (
        SELECT pid, pc AS cluster,
          MAX(CASE WHEN nc = pc THEN md END) AS a_mean,
          MIN(CASE WHEN nc <> pc THEN md END) AS b_mean
        FROM g GROUP BY pid, pc),
      pt AS (
        SELECT pid, cluster, a_mean, b_mean,
          CASE WHEN a_mean IS NULL THEN 0.0
            ELSE round((b_mean - a_mean) / greatest(a_mean, b_mean), 6)
          END AS s
        FROM sil)"""

  private def silhouettePoints(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    graft.ops.ClusterEval.silhouetteSample(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label",
      col("vec_id") % 8 === 0)

  /** Per-point silhouette of the label clustering — a_mean/b_mean/s for
    * every sampled vector, hash-checked. */
  val kmSilhouette: Q = Q(
    "km_silhouette",
    Some(silhouetteSql + """
      SELECT pid, cluster, a_mean, b_mean, s FROM pt ORDER BY pid"""),
    (s, dir) => silhouettePoints(s, dir).orderBy("pid"))

  /** Macro silhouette summary: mean/min/negative fraction — the one-row
    * cluster-health screen. */
  val kmSilhouetteSummary: Q = Q(
    "km_silhouette_summary",
    Some(silhouetteSql + """
      SELECT CAST(count(*) AS BIGINT) AS n_points,
        round(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
          AS mean_s,
        MIN(s) AS min_s,
        round(CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
          / CAST(count(*) AS DOUBLE), 6) AS frac_negative
      FROM pt"""),
    (s, dir) =>
      graft.ops.ClusterEval.silhouetteSummary(silhouettePoints(s, dir)))

  /** Calinski–Harabasz + Davies–Bouldin validity indices
    * ([[graft.ops.ClusterEval.validityIndices]]) of the label
    * clustering: the O(n·d) health checks beside the silhouette pair.
    * Every arithmetic tree lives in the plan (no driver math), so the
    * oracle replays the per-dim centroid folds, both scatter folds, the
    * per-point distance folds, the k² centroid-pair distances, and the
    * max-ratio fold term for term. */
  val kmValidity: Q = Q(
    "km_validity_indices",
    Some("""
      WITH v AS (
        SELECT vec_id, CAST(label AS VARCHAR) AS label,
          CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
      dims0 AS (
        SELECT vec_id, label, e,
          unnest(generate_series(1, len(e))) AS i
        FROM v),
      dims AS (SELECT vec_id, label, i, e[i] AS x FROM dims0),
      cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n_k
        FROM v GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS k FROM cnt),
      cent AS (
        SELECT label, i,
          round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 12) AS m
        FROM dims GROUP BY 1, 2),
      gcent AS (
        SELECT i,
          round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 12) AS g
        FROM dims GROUP BY 1),
      j AS (
        SELECT d.vec_id, d.label, d.x, c.m
        FROM dims d JOIN cent c ON d.label = c.label AND d.i = c.i),
      w AS (
        SELECT CAST(SUM(CAST(round((x - m) * (x - m), 12)
          AS DECIMAL(38,14))) AS DOUBLE) AS wss
        FROM j),
      bx AS (
        SELECT CAST(SUM(CAST(round(cnt.n_k * (c.m - g.g) * (c.m - g.g),
          12) AS DECIMAL(38,14))) AS DOUBLE) AS bss
        FROM cent c JOIN gcent g ON c.i = g.i
          JOIN cnt ON c.label = cnt.label),
      pd AS (
        SELECT vec_id, label,
          round(sqrt(CAST(SUM(CAST(round((x - m) * (x - m), 12)
            AS DECIMAL(38,14))) AS DOUBLE)), 12) AS dist
        FROM j GROUP BY 1, 2),
      sI AS (
        SELECT label,
          round(CAST(SUM(CAST(dist AS DECIMAL(38,14))) AS DOUBLE)
            / count(*), 12) AS s
        FROM pd GROUP BY 1),
      cd AS (
        SELECT a.label AS la, b.label AS lb,
          round(sqrt(CAST(SUM(CAST(round((a.m - b.m) * (a.m - b.m), 12)
            AS DECIMAL(38,14))) AS DOUBLE)), 12) AS d
        FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
        GROUP BY 1, 2),
      ws AS (
        SELECT la, lb, (sa.s + sb.s) / cd.d AS r
        FROM cd JOIN sI sa ON sa.label = cd.la
          JOIN sI sb ON sb.label = cd.lb),
      rat AS (SELECT la AS l, r FROM ws UNION ALL SELECT lb, r FROM ws),
      dbv AS (
        SELECT CAST(SUM(CAST(round(mx, 12) AS DECIMAL(38,14))) AS DOUBLE)
          / count(*) AS db
        FROM (SELECT l, MAX(r) AS mx FROM rat GROUP BY l)),
      fin AS (
        SELECT tot.n, tot.k, w.wss, bx.bss,
          (bx.bss / (tot.k - 1)) / (w.wss / (tot.n - tot.k)) AS ch, dbv.db
        FROM tot, w, bx, dbv)
      SELECT n, k, round(wss, 6) + 0.0 AS wss, round(bss, 6) + 0.0 AS bss,
        round(ch, 6) + 0.0 AS ch_index, round(db, 6) + 0.0 AS db_index
      FROM fin"""),
    (s, dir) => {
      val out = graft.ops.ClusterEval.validityIndices(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label")
      val r = out.head()
      require(r.getAs[Double]("ch_index") > 0.0 &&
        r.getAs[Double]("db_index") > 0.0, s"degenerate clustering: $r")
      out
    })

  /** Anisotropy / embedding-collapse screen
    * ([[graft.ops.EmbeddingDrift.isotropy]]): ‖μ‖²/E‖x‖² over the full
    * embedding table — the one-number health check before trusting any
    * cosine threshold. The oracle replays the per-dim round-12 means,
    * the μ² fold, and the second-moment fold. */
  /** k-NN label purity ([[graft.ops.EmbeddingDrift.knnLabelPurity]]) of
    * the labeled embedding corpus at k=5 — the oracle replays the
    * round-9 distances, the per-point 5-NN rank, the exact purity
    * rationals, and the round-9 mean fold. */
  val embKnnPurity: Q = Q(
    "emb_knn_purity",
    Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
          AND label IS NOT NULL),
      p AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
          round(list_sum(list_transform(generate_series(1, len(a.e)),
            k -> (a.e[k] - b.e[k]) * (a.e[k] - b.e[k]))), 9) AS d2,
          (a.label = b.label) AS same
        FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      r AS (
        SELECT i, same,
          row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rn
        FROM p),
      pu AS (
        SELECT i,
          CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS DOUBLE) / 5 AS p
        FROM r WHERE rn <= 5 GROUP BY i),
      s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(CAST(round(p, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sp,
          CAST(SUM(CASE WHEN p < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
            AS low
        FROM pu)
      SELECT m AS n_vectors, CAST(5 AS BIGINT) AS k,
        round(sp / m, 6) + 0.0 AS mean_purity, low AS n_low_purity
      FROM s"""),
    (s, dir) => {
      val out = graft.ops.EmbeddingDrift.knnLabelPurity(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label")
      val r = out.head()
      val p = r.getAs[Double]("mean_purity")
      require(p >= 0.0 && p <= 1.0 &&
        r.getAs[Long]("n_low_purity") <= r.getAs[Long]("n_vectors"),
        s"purity is a bounded fraction: $r")
      out
    })

  /** TwoNN intrinsic dimension
    * ([[graft.ops.EmbeddingDrift.intrinsicDimension]]) of the embedding
    * corpus — the oracle replays the round-9 squared distances, the
    * (d², id)-ordered 2-NN window, and the ln-ratio decimal fold. */
  val embIntrinsicDim: Q = Q(
    "emb_intrinsic_dim",
    Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
      p AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
          round(list_sum(list_transform(generate_series(1, len(a.e)),
            k -> (a.e[k] - b.e[k]) * (a.e[k] - b.e[k]))), 9) AS d2
        FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      r AS (
        SELECT i, d2,
          row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rn
        FROM p),
      nn AS (
        SELECT i, MIN(CASE WHEN rn = 1 THEN d2 END) AS r1,
          MIN(CASE WHEN rn = 2 THEN d2 END) AS r2
        FROM r WHERE rn <= 2 GROUP BY i),
      s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
          CAST(SUM(CAST(round(ln(r2 / r1) * 0.5, 9) AS DECIMAL(38,12)))
            AS DOUBLE) AS slnmu
        FROM nn WHERE r1 > 0),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM v)
      SELECT n_vectors, n_used, round(slnmu, 6) + 0.0 AS sum_log_mu,
        round(n_used / slnmu, 6) + 0.0 AS intrinsic_dim
      FROM s, t"""),
    (s, dir) => {
      val out = graft.ops.EmbeddingDrift.intrinsicDimension(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
      val r = out.head()
      val d = r.getAs[Double]("intrinsic_dim")
      require(d > 1.0 && d < 200.0,
        s"TwoNN on a 64-dim synthetic cloud must land in (1, 200): $d")
      out
    })

  val embIsotropy: Q = Q(
    "emb_isotropy",
    Some("""
      WITH v AS (
        SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE embedding IS NOT NULL),
      d0 AS (SELECT e, unnest(generate_series(1, len(e))) AS i FROM v),
      dims AS (SELECT i, e[i] AS x FROM d0),
      m AS (
        SELECT i,
          round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 12) AS m,
          CAST(count(*) AS BIGINT) AS n
        FROM dims GROUP BY i),
      mu AS (
        SELECT CAST(SUM(CAST(round(m * m, 12) AS DECIMAL(38,14)))
          AS DOUBLE) AS mu2,
          CAST(count(*) AS BIGINT) AS dim, CAST(MAX(n) AS BIGINT) AS n
        FROM m),
      sq AS (
        SELECT CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,14)))
          AS DOUBLE) AS sq
        FROM dims)
      SELECT mu.n, mu.dim, round(mu.mu2, 6) + 0.0 AS mean_norm2,
        round(sq.sq / mu.n, 6) + 0.0 AS mean_sq_norm,
        round(mu.mu2 / (sq.sq / mu.n), 6) + 0.0 AS anisotropy
      FROM mu, sq"""),
    (s, dir) => {
      val out = graft.ops.EmbeddingDrift.isotropy(
        Tables.load(s, dir, "embeddings"), "embedding")
      val a = out.head().getAs[Double]("anisotropy")
      require(a >= 0.0 && a <= 1.0 + 1e-9,
        s"anisotropy is a ratio of norms in [0,1]: $a")
      out
    })

  override def queries: Seq[Q] =
    Seq(embIntrinsicDim, embKnnPurity, embIsotropy,
      simTopK, simAnn, simIvf, simTopkPq, simNearDups, mmFeatures, mmResize,
      mmFrames, ddSemantic, simCentroids, simConfusion, mmPhashPairs,
      mmMjpegFrames, mmGifFrames, mmVideoPhashPairs, mmAudioFpPairs,
      simHardNegatives,
      kmAssign, kmSizes, kmPrune, kmRebalance, simFpsCoreset, simFpsDeep,
      simMmrRerank, simMmrDeep, simRrfHybrid, simBordaFusion,
      ddSemanticDecontaminate, bitextMine, bitextMineIvf,
      bitextCorpusIvf, bitextScores, embCentroidDrift, embIdDisplacement,
      kmSilhouette, kmSilhouetteSummary, kmValidity)
}
