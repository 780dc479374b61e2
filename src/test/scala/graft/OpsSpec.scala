package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("tokens guard blank text; shingles are distinct n-grams") {
    val df = Seq(("a b c b c", 1), ("   ", 2), ("", 3), ("solo", 4)).toDF("text", "id")
    val r = df.select(col("id"), TextOps.tokenCount(col("text")).as("n"),
        TextOps.shingles(col("text"), 2).as("sh"))
      .orderBy("id").collect()
    assert(r(0).getInt(1) == 5)
    assert(r(0).getSeq[String](2).toSet == Set("a b", "b c", "c b"))
    assert(r(1).getInt(1) == 0 && r(2).getInt(1) == 0)
    assert(r(3).getInt(1) == 1 && r(3).getSeq[String](2).isEmpty)
  }

  test("native shingles match compositional/oracle semantics on tab/newline edges") {
    // Java trim/split semantics differ from Spark/DuckDB (String.trim strips
    // every char <= 0x20; limit-0 split drops trailing empties). The native
    // expression must match SPARK's: trim ' ' only, keep edge empty tokens.
    val texts = Seq("a b\n", "\ta b", "a\tb\nc", " a b ", "a  b", "\n", "x", "",
      "word\ttab", "trail \n", "a b\r\n")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    val w = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    val comp = array_distinct(
      when(size(w) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - 2), i =>
          concat_ws(" ", slice(w, i + 1, lit(2))))))
    val rows = df.select(col("id"), col("text"),
        TextOps.shingles(col("text"), 2).as("native"), comp.as("comp"),
        TextOps.shingles(col("text"), 1).as("native1"),
        array_distinct(TextOps.tokens(col("text"))).as("tok1"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"2-shingle mismatch on ${r.getString(1).replace("\n", "\\n").replace("\t", "\\t")}")
      assert(r.getSeq[String](4) == r.getSeq[String](5),
        s"1-shingle/tokens mismatch on ${r.getString(1).replace("\n", "\\n")}")
    }
    // the specific case from the review: 'a b\n' keeps the trailing empty token
    val ab = rows.find(_.getInt(0) == 0).get
    assert(ab.getSeq[String](2) == Seq("a b", "b "))
  }

  test("exact dedup keeps min id per identical normalized text") {
    val df = Seq((1L, "Hello  world"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
    assert(Dedup.dropDuplicatesByFingerprint(df, "doc_id", "text").count() == 2)
  }

  test("paragraph dedup: first occurrence wins, all-dup docs vanish, order kept") {
    val df = Seq(
      (1L, "alpha one\n\ncommon boilerplate\n\nalpha two"),
      (2L, "Common  Boilerplate\n\nbeta one"), // normalized dup of doc 1's middle
      (3L, "common boilerplate")) // nothing but the dup -> doc disappears
      .toDF("doc_id", "text")
    // prose-style paragraphs: blank-line split
    val paras = filter(
      transform(split(col("text"), "\n\n"), p => trim(p)), p => length(p) > 0)
    val out = Dedup.dedupParagraphs(df, "doc_id", "text", paras)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "doc 3 must vanish")
    assert(out(0).getString(1) == "alpha one\ncommon boilerplate\nalpha two")
    assert(out(0).getLong(2) == 3)
    assert(out(1).getString(1) == "beta one", "doc 2 keeps only its novel paragraph")
    assert(out(1).getLong(2) == 1)
  }

  test("novelty: bloom path drops every historical dup, keeps ~all novel") {
    // history = docs 0..399; incoming = docs 400..499 plus a re-crawl of
    // 0..49 (exact dups that MUST be dropped — bloom has no false negatives)
    val hist = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
      .unionByName(docs.filter(col("doc_id") < 50))
    val exact = Dedup.novelAgainstExact(inc, hist, "text")
    val exactIds = exact.select("doc_id").as[Long].collect().toSet
    // exact: the re-crawl is gone, fresh docs survive (none dup by fixture)
    assert(exactIds.forall(_ >= 400), "a re-crawled (historical) doc survived")
    val novel = Dedup.novelAgainstBloom(inc, hist, "text", fpp = 0.01)
    val novelIds = novel.select("doc_id").as[Long].collect().toSet
    assert(novelIds.subsetOf(exactIds),
      s"bloom kept non-novel ids: ${novelIds.diff(exactIds).take(5)}")
    val dropped = exactIds.size - novelIds.size
    assert(dropped <= math.max(5, exactIds.size / 20),
      s"bloom false-dropped $dropped of ${exactIds.size} novel docs at fpp=0.01")
    // presized path (no count job) produces the same verdicts
    val presized = Dedup.novelAgainstBloom(inc, hist, "text",
      expectedItems = 400L, fpp = 0.01)
    assert(presized.select("doc_id").as[Long].collect().toSet == novelIds)
  }

  test("minhash-LSH finds the high-Jaccard pairs exact Jaccard finds") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.6)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("jaccard postings cap: near-dups sharing rare shingles survive") {
    // every doc shares the stop-bigram "the end"; docs 1/2 are near-dups
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val df = (
      Seq((1L, s"$base one two the end"), (2L, s"$base one three the end")) ++
      (3L to 30L).map(i => (i, s"unique$i words$i only$i here$i the end"))
    ).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2,
        threshold = 0.5, maxPostings = 5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2,
        threshold = 0.5, maxPostings = Int.MaxValue)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)))
    assert(capped.contains((1L, 2L)), "cap must not drop pairs backed by rare shingles")
    // dropped postings only ever shrink intersections -> no false positives
    assert(capped.subsetOf(uncapped))
  }

  test("embedding near-dup auto path: forced-LSH matches forced-brute on high-cos pairs") {
    val brute = Dedup.embeddingNearDups(embs.limit(300), "vec_id", "embedding",
        threshold = 0.4, lsh = Some(false))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.embeddingNearDups(embs.limit(300), "vec_id", "embedding",
        threshold = 0.4, lsh = Some(true))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh.subsetOf(brute), "LSH candidates are a subset of all pairs")
    if (brute.nonEmpty) {
      val recall = brute.count(viaLsh.contains).toDouble / brute.size
      assert(recall >= 0.5, s"LSH near-dup recall $recall over ${brute.size}")
    }
  }

  test("simhash: identical texts collide, near-dups are close in hamming") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, "spark table join merge batch query value fast row scan"),
      (2L, "spark table join merge batch query value fast row scan"),
      (3L, "spark table join merge batch query value fast row hash"),
      (4L, "completely unrelated words entirely other vocabulary here now")
    ).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
        GraftFunctions.simhash64(spark, TextOps.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))

    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash skew: mega-buckets are capped, discriminative pairs survive") {
    GraftFunctions.register(spark)
    // 5k near-constant docs share every chunk bucket -> an uncapped banded
    // join is O(bucket²) = 12.5M pairs; the cap drops those buckets while the
    // planted distinct-vocabulary dup pair (its own tiny bucket) survives.
    val skew = (100L to 5099L).map(i => (i, "lorem ipsum dolor sit amet constant filler"))
    val planted = Seq(
      (1L, "zebra quartz vivid jump fox glyph band quick"),
      (2L, "zebra quartz vivid jump fox glyph band quick"))
    val df = (planted ++ skew).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text",
        maxHamming = 0, maxBucketSize = 100)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embedding LSH bits floor keeps the recallTarget contract (tables re-tuned)") {
    // threshold 0.4 tunes ~3 bits = 8 buckets/table; on 300 rows with
    // maxBucketSize=16 every bucket would exceed the cap and the operator
    // silently returned zero pairs. The corpus-size floor widens the tables
    // to 5 bits, and the table count re-tunes 8 -> ~22 so recall still
    // reaches recallTarget — before the r6 fix this shape silently delivered
    // p^5-per-table recall with the original 8 tables.
    val brute = Dedup.embeddingNearDups(embs.limit(300), "vec_id", "embedding",
        threshold = 0.4, lsh = Some(false))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.embeddingNearDups(embs.limit(300), "vec_id", "embedding",
        threshold = 0.4, lsh = Some(true), maxBucketSize = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh.subsetOf(brute))
    assert(brute.nonEmpty, "fixture must contain near-dup pairs at cos >= 0.4")
    val recall = brute.count(viaLsh.contains).toDouble / brute.size
    // recallTarget default 0.9 holds at cos == threshold; observed pairs sit
    // above it, so allow only a small ε for hyperplane-draw variance.
    assert(recall >= 0.8, s"floored-bits recall $recall over ${brute.size} pairs")
  }

  test("embedding LSH tuning: floor scales tables up; unreachable targets are flagged") {
    // No floor pressure: small corpus keeps the caller's table count.
    val base = Dedup.tuneEmbeddingLsh(nEst = 1000, threshold = 0.4,
      tables = 8, recallTarget = 0.9, maxBucketSize = 4096)
    assert(base.tables == 8 && !base.capped)
    assert(base.achievableRecall >= 0.9)
    // Floor wins (300/16 -> 5 bits > 3 tuned): tables scale up, contract holds.
    val floored = Dedup.tuneEmbeddingLsh(nEst = 300, threshold = 0.4,
      tables = 8, recallTarget = 0.9, maxBucketSize = 16)
    assert(floored.bits > base.bits)
    assert(floored.tables > 8, s"expected re-tuned tables, got ${floored.tables}")
    assert(!floored.capped)
    assert(floored.achievableRecall >= 0.9)
    // Monotone sanity: the re-tuned construction never under-delivers the
    // uncapped contract anywhere in the floor regime.
    for (mbs <- Seq(8, 32, 128)) {
      val tn = Dedup.tuneEmbeddingLsh(nEst = 100000, threshold = 0.3,
        tables = 4, recallTarget = 0.85, maxBucketSize = mbs)
      assert(tn.capped || tn.achievableRecall >= 0.85,
        s"maxBucketSize=$mbs gave uncapped recall ${tn.achievableRecall}")
    }
    // Genuinely unreachable: huge corpus + tiny buckets + loose threshold
    // needs more than 64 tables -> capped flag set (run-time warning path).
    val capped = Dedup.tuneEmbeddingLsh(nEst = 100000000L, threshold = 0.2,
      tables = 8, recallTarget = 0.95, maxBucketSize = 16)
    assert(capped.capped, s"expected capped, got $capped")
    assert(capped.tables == 64)
    assert(capped.achievableRecall < 0.95)
  }

  test("ANN recall vs brute force on real embeddings") {
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
        col("vec_id") < 20, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(embs, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, bits = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    // 4 hyperplanes + hamming-1 multiprobe: 5/16 of the bucket space per
    // query; a real quality regression (broken probe, bad bucketing) lands
    // well below this bar.
    assert(recall >= 0.7, s"ANN recall $recall")
    assert(ann.forall { case (q, n) => q != n })
  }

  test("IVF sampled fit: deterministic, assigns every row, search still works") {
    import graft.ops.Ivf
    val a = Ivf.build(embs, "vec_id", "embedding", nLists = 4, seed = 11,
      fitSampleRows = 40)
    val b = Ivf.build(embs, "vec_id", "embedding", nLists = 4, seed = 11,
      fitSampleRows = 40)
    val total = embs.count()
    assert(a.assigned.count() == total, "every row must get a cell")
    assert(a.assigned.select("cell").distinct().count() <= 4)
    // reproducible: identical hash-keyed sample + seed => identical cells
    val am = a.assigned.select("id", "cell").as[(Long, Int)].collect().toMap
    val bm = b.assigned.select("id", "cell").as[(Long, Int)].collect().toMap
    assert(am == bm, "sampled fit must be deterministic")
    val hits = Ivf.search(a, col("id") < 5, k = 3, nProbe = 2)
    assert(hits.groupBy("qid").count().filter(col("count") =!= 3).isEmpty,
      "each query must still get k neighbors")
  }

  test("multimodal: batched extraction is deterministic and shaped right") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 60)
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length == Multimodal.EmbeddingDim))
    // image rows decode for real (synthetic PNGs): width/height from pixels
    val images = rows.filter(_.getAs[String]("modality") == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      assert(r.getAs[Boolean]("decoded"), s"image $i should real-decode")
      assert(r.getAs[Int]("width") == 8 + i % 17)
      assert(r.getAs[Int]("height") == 6 + i % 13)
    }
    // audio rows real-decode (synthetic WAV sine tones): sample rate and
    // duration from the decoded stream, no image dimensions
    val audio = rows.filter(_.getAs[String]("modality") == "audio")
    assert(audio.nonEmpty)
    audio.foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      assert(r.getAs[Boolean]("decoded"), s"audio $i should real-decode")
      assert(r.getAs[Int]("sample_rate") == 8000)
      val expectMs = math.round((0.05 + (i % 10) * 0.01) * 1000)
      assert(math.abs(r.getAs[Long]("duration_ms") - expectMs) <= 1,
        s"audio $i duration ${r.getAs[Long]("duration_ms")} != ~$expectMs")
      assert(r.isNullAt(r.fieldIndex("width")))
    }
    // video rows real-decode: MP4s the CONTAINER (ISO-BMFF box walk —
    // dimensions and duration from moov boxes), MJPEG-AVIs container AND
    // pixels; sample_rate stays null (audio-only) on both
    val videos = rows.filter(_.getAs[String]("modality") == "video")
    assert(videos.nonEmpty)
    videos.foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      assert(r.getAs[Boolean]("decoded"), s"video $i should decode")
      if ((i / 3) % 2 == 0) { // MP4 rows
        assert(r.getAs[Int]("width") == 128 + (i % 5) * 32)
        assert(r.getAs[Int]("height") == 96 + (i % 4) * 24)
        assert(r.getAs[Long]("duration_ms") == 1000L * (i + 1))
      } else { // MJPEG rows
        assert(r.getAs[Int]("width") == 32 + (i % 3) * 16)
        assert(r.getAs[Int]("height") == 24 + (i % 2) * 12)
        assert(r.getAs[Long]("duration_ms") == (4 + i % 5) * 100L)
      }
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    // determinism: second run produces identical hashes
    val again = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(rows.map(_.getAs[Long]("content_hash")).toSeq ==
      again.map(_.getAs[Long]("content_hash")).toSeq)
  }

  test("multimodal: image decode reads actual pixels, not metadata") {
    // A known 4x4 image with one white grid cell: the 4x4 mean-luminance
    // embedding must put ~1.0 in exactly that cell and 0.0 elsewhere.
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xffffff) // grid cell (gy=1, gx=2) -> index 6
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((w, h, emb)) = Multimodal.decodeImage(out.toByteArray)
    assert(w == 4 && h == 4)
    assert(math.abs(emb(6) - 1.0f) < 1e-3, s"white cell: ${emb.toSeq}")
    assert(emb.zipWithIndex.filter(_._2 != 6).forall(_._1 == 0f))
    // corrupt bytes refuse to decode instead of throwing
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("multimodal: audio decode reads actual PCM from a checked-in WAV") {
    // 440 Hz sine, 0.25 s, 8 kHz mono 16-bit, amplitude 0.5 — committed at
    // src/test/resources/tone_440hz_8k.wav. Every assertion below is a
    // physical property of that waveform, so a stub decoder cannot pass.
    val bytes = getClass.getResourceAsStream("/tone_440hz_8k.wav").readAllBytes()
    val Some(a) = Multimodal.decodeAudio(bytes)
    assert(a.sampleRate == 8000)
    assert(a.durationMs == 250)
    // RMS of A·sin = A/√2 = 0.3536
    assert(math.abs(a.rms - 0.3536f) < 0.005, s"rms=${a.rms}")
    // zero-crossing fraction of a pure sine ≈ 2f/sr = 0.11
    assert(math.abs(a.zcr - 0.11f) < 0.005, s"zcr=${a.zcr}")
    // constant-amplitude tone → flat 16-segment energy profile at mean |sin|
    // = 2A/π = 0.3183
    assert(a.embedding.length == Multimodal.EmbeddingDim)
    a.embedding.foreach(e => assert(math.abs(e - 0.3183f) < 0.01, s"profile: $e"))
    // corrupt bytes refuse to decode instead of throwing
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3, 4)).isEmpty)
    // decode is deterministic
    assert(Multimodal.decodeAudio(bytes).get.embedding.toSeq == a.embedding.toSeq)
  }

  test("multimodal: MJPEG-AVI decodes REAL video pixels from the checked-in clip") {
    val bytes = {
      val in = getClass.getResourceAsStream("/clip_mjpeg_48x36_6f.avi")
      try in.readAllBytes() finally in.close()
    }
    // container header (RIFF walk): dimensions, timing, every frame chunk
    val Some(avi) = Multimodal.parseAvi(bytes)
    assert(avi.width == 48 && avi.height == 36)
    assert(avi.usPerFrame == 100000L && avi.nFrames == 6)
    assert(avi.frames.size == 6)
    assert(avi.durationMs == 600L)
    // every frame chunk is a genuine JPEG the pure-JDK decoder opens at
    // the container's declared dimensions
    for (((off, len), i) <- avi.frames.zipWithIndex) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOfRange(bytes, off, off + len)))
      assert(img != null, s"frame $i did not decode")
      assert(img.getWidth == 48 && img.getHeight == 36)
    }
    // pixels are the real signal, not noise: frame 0 is the same smooth
    // field syntheticMjpegAvi renders — its dHash must sit within JPEG
    // loss of a direct render, and far from an unrelated field
    val direct = Multimodal.sinusoidPng(48, 36, 2.0, 1.0, 3 * 0.01)
    val (o0, l0) = avi.frames.head
    val f0 = java.util.Arrays.copyOfRange(bytes, o0, o0 + l0)
    val hFrame = Multimodal.dHash64(f0).get
    val hDirect = Multimodal.dHash64(direct).get
    val hAlt = Multimodal.dHash64(
      Multimodal.sinusoidPng(48, 36, 3.0, 2.0, 2.1)).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hFrame, hDirect) <= 8,
      s"frame pixels drifted ${ham(hFrame, hDirect)} bits from the source field")
    assert(ham(hFrame, hAlt) >= 16, "frame pixels indistinct from an unrelated field")
    // corrupt bytes refuse to parse instead of throwing
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.parseAvi(bytes.take(20)).isEmpty)
    // crafted chunk size >= 2^31: the old Int advance went negative
    // (infinite loop or negative-index throw from fourcc); the Long
    // advance must terminate and keep what parsed before the bad chunk
    val crafted = java.nio.ByteBuffer.allocate(12 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    crafted.put("RIFF".getBytes("ISO-8859-1")).putInt(8 + 16 + 4)
      .put("AVI ".getBytes("ISO-8859-1"))
      .put("JUNK".getBytes("ISO-8859-1")).putInt(0xfffffff0) // 4294967280
      .put(new Array[Byte](16))
    assert(Multimodal.parseAvi(crafted.array()).isEmpty) // no hang, no throw
    // same crafted size on the fixture's first chunk: must terminate
    // (result value unspecified — corrupt input) without hanging/throwing
    val craftedFixture = bytes.clone()
    java.nio.ByteBuffer.wrap(craftedFixture)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(12 + 4, 0xfffffff0)
    Multimodal.parseAvi(craftedFixture)
    // zero-size unknown chunks: advance is +8 per iteration (the header),
    // must still walk to end and terminate
    val zeros = java.nio.ByteBuffer.allocate(12 + 8 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    zeros.put("RIFF".getBytes("ISO-8859-1")).putInt(8 * 4 + 4)
      .put("AVI ".getBytes("ISO-8859-1"))
    (0 until 4).foreach { _ =>
      zeros.put("JUNK".getBytes("ISO-8859-1")).putInt(0)
    }
    assert(Multimodal.parseAvi(zeros.array()).isEmpty)
  }

  test("multimodal: sampleFrames emits real decodable frames for MJPEG, stub otherwise") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val frames = Multimodal.sampleFrames(media, 3).collect()
    val (real, stub) = frames.partition(_.getBoolean(4))
    assert(real.nonEmpty && stub.nonEmpty,
      "fixture should carry both MJPEG (real) and MP4 (stub) videos")
    // every real frame payload is a decodable JPEG; timestamps ride the
    // container's own frame timing (multiples of 100 ms at fps=10)
    for (r <- real) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](3)))
      assert(img != null && img.getWidth > 0)
      assert(r.getLong(2) % 100 == 0)
    }
    // extractFeatures: MJPEG rows are decoded=true with the REAL
    // first-frame luminance embedding (matches a direct pixel decode)
    val feats = Multimodal.extractFeatures(media)
      .filter(col("modality") === "video").collect()
    assert(feats.forall(_.getAs[Boolean]("decoded")))
    val mjpegIds = media.filter(col("modality") === "video").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2))
      .filter { case (_, b) => Multimodal.parseAvi(b).exists(_.frames.nonEmpty) }
      .toMap
    assert(mjpegIds.nonEmpty)
    for (f <- feats if mjpegIds.contains(f.getLong(0))) {
      val bytes = mjpegIds(f.getLong(0))
      val Some(avi) = Multimodal.parseAvi(bytes)
      val (off, len) = avi.frames.head
      val Some((_, _, expected)) = Multimodal.decodeImage(
        java.util.Arrays.copyOfRange(bytes, off, off + len))
      assert(f.getAs[Seq[Float]]("embedding").toArray.sameElements(expected),
        s"video ${f.getLong(0)} embedding is not the real first-frame pooling")
    }
  }

  test("audio near-dup: spectral fingerprint pairs volume/resample twins, not strangers") {
    val chords = Seq(
      Seq(440.0 -> 1.0, 554.4 -> 0.7, 659.3 -> 0.5),
      Seq(523.3 -> 1.0, 659.3 -> 0.6, 784.0 -> 0.8),
      Seq(349.2 -> 0.9, 440.0 -> 0.4, 880.0 -> 0.7),
      Seq(392.0 -> 1.0, 493.9 -> 0.9, 587.3 -> 0.3))
    // fingerprint properties (probed margins: volume twins 0.0 bits,
    // resample twins <= 2.9, strangers >= 5.7 — tools/AudioFpProbe)
    def fp(b: Array[Byte]) = Multimodal.audioFingerprint(b).get
    def meanBits(a: Array[Int], b: Array[Int]): Double =
      a.zip(b).map { case (x, y) => java.lang.Integer.bitCount(x ^ y) }.sum
        .toDouble / a.length
    val f0 = fp(Multimodal.syntheticChordWav(chords.head, 3.0, 8000))
    val f0vol = fp(Multimodal.syntheticChordWav(
      chords.head.map { case (f, a) => (f, a * 0.55) }, 3.0, 8000))
    assert(meanBits(f0, f0vol) == 0.0, "band-delta signs must be amplitude-invariant")
    val f0rs = fp(Multimodal.syntheticChordWav(chords.head, 3.0, 16000))
    assert(f0rs.length == f0.length, "time-based framing must align across rates")
    assert(meanBits(f0, f0rs) <= 4.0, s"resampled twin drifted ${meanBits(f0, f0rs)}")
    // the distributed join: every intra-family pair, nothing else
    val rows: Seq[(Long, Array[Byte])] = chords.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        (i.toLong, Multimodal.syntheticChordWav(c, 3.0, 8000)),
        (100L + i, Multimodal.syntheticChordWav(
          c.map { case (f, a) => (f, a * 0.55) }, 3.0, 8000)),
        (200L + i, Multimodal.syntheticChordWav(c, 3.0, 16000)))
    }
    val media = rows.toDF("media_id", "content")
    val pairs = Multimodal.audioFingerprintPairs(media, maxMeanBits = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = chords.indices.flatMap(i => Seq(
      (i.toLong, 100L + i), (i.toLong, 200L + i), (100L + i, 200L + i))).toSet
    assert(pairs == expected,
      s"audio pair drift: extra=${pairs -- expected} missing=${expected -- pairs}")
    // undecodable and too-short clips fingerprint to None, never throw
    assert(Multimodal.audioFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.audioFingerprint(
      Multimodal.syntheticWav(440.0, 0.05)).isEmpty)
  }

  test("video near-dup: resized MJPEG twins pair on mean frame hamming, strangers do not") {
    val rows: Seq[(Long, String, Array[Byte], (String, Integer, Integer, java.lang.Long))] =
      (0 until 4).flatMap { f =>
        val (fx, fy) = (1.0 + f, 0.5 + (f % 2))
        Seq(
          (f.toLong, "video",
            Multimodal.syntheticMjpegAvi(48, 36, 6, 10, seed = 100 + f, fx = fx, fy = fy),
            ("fixture://", Integer.valueOf(48), Integer.valueOf(36), java.lang.Long.valueOf(600L))),
          (100L + f, "video",
            Multimodal.syntheticMjpegAvi(32, 24, 6, 10, seed = 100 + f, fx = fx, fy = fy),
            ("fixture://", Integer.valueOf(32), Integer.valueOf(24), java.lang.Long.valueOf(600L))))
      }
    val media = rows.toDF("media_id", "modality", "content", "meta")
      .withColumn("meta", col("meta").cast("struct<uri:string,width:int,height:int,duration_ms:bigint>"))
    val pairs = Multimodal.videoPhashPairs(media, k = 6, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 4).map(f => (f.toLong, 100L + f)).toSet
    assert(pairs == expected,
      s"video pair drift: extra=${pairs -- expected} missing=${expected -- pairs}")
  }

  test("dHash: checked-in resized twin pairs, distinct field does not") {
    def res(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream("/" + n)
      try in.readAllBytes() finally in.close()
    }
    val a = Multimodal.dHash64(res("sin_64x48.png")).get
    val b = Multimodal.dHash64(res("sin_32x24.png")).get
    val c = Multimodal.dHash64(res("sin_alt_64x48.png")).get
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) <= 6, s"resized twin drifted: ${ham(a, b)} bits")
    assert(ham(a, c) >= 16 && ham(b, c) >= 16,
      s"distinct fields too close: ${ham(a, c)}/${ham(b, c)}")
    // the banded join over the three fixtures finds exactly the twin pair
    val media = Seq(
      (1L, res("sin_64x48.png")), (2L, res("sin_32x24.png")),
      (3L, res("sin_alt_64x48.png"))).toDF("media_id", "content")
    val pairs = Multimodal.phashPairs(media, maxHamming = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("hamming") == ham(a, b))
    // undecodable content rows are skipped, not fatal
    val withJunk = media.union(
      Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "content"))
    assert(Multimodal.phashPairs(withJunk, maxHamming = 6).count() == 1)
    // the native expression (streaming path) computes the same bits as the
    // driver-side decoder, and stays inside whole-stage codegen
    val viaExpr = Multimodal.dhashImages(media).orderBy("id")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(viaExpr.toSeq == Seq(Some(a), Some(b), Some(c)))
    // codegen pin over a file-scan plan (LocalTableScan leaves execute
    // without a WholeStageCodegen wrapper regardless of the expression,
    // and a repartition wraps the plan in AQE — both mask the check)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dhash").toString
    media.write.mode("overwrite").parquet(tmp)
    val filePlan = Multimodal.dhashImages(spark.read.parquet(tmp))
    val wsc = filePlan.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"ImageDHash fell out of codegen:\n" +
      filePlan.queryExecution.executedPlan)
  }

  test("indexed BM25 equals the scan path (same query, same top-k)") {
    import graft.ops.TextSearch
    val q = "spark hash join"
    val scan = TextSearch.bm25TopK(docs, "doc_id", "text", q, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val postings = TextSearch.buildPostings(docs, "doc_id", "text")
    val (n, avgdl) = TextSearch.corpusStats(docs, "text")
    assert(n == 500)
    val idx = TextSearch.bm25TopKIndexed(postings, n, avgdl, q, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every scan hit is a matched doc here (fixture matches >> 50), so the
    // index must reproduce the scan's top-k EXACTLY — ids and doubles
    assert(scan.values.forall(_ > 0.0), "scan top-50 padded with 0 scores — weak fixture")
    assert(idx == scan,
      s"indexed != scan: onlyScan=${(scan.keySet -- idx.keySet).take(5)} " +
        s"onlyIdx=${(idx.keySet -- scan.keySet).take(5)} " +
        s"diff=${scan.collect { case (k2, v) if idx.get(k2).exists(_ != v) => k2 }.take(5)}")
    // a term absent from the corpus must not blow up the indexed path
    val none = TextSearch.bm25TopKIndexed(postings, n, avgdl, "zzzmissing", k = 5)
    assert(none.count() == 0)
  }

  test("degenerate inputs: scoring ops stay finite and graceful under ANSI") {
    import graft.ops.{LanguageModel, Sampling, TextSearch}
    // BM25/TF-IDF with a term in EVERY doc (df == N): idf must stay
    // positive (Lucene variant) and scores finite
    val everyDoc = Seq((1L, "common alpha"), (2L, "common beta"),
      (3L, "common")).toDF("doc_id", "text")
    val bm = TextSearch.bm25TopK(everyDoc, "doc_id", "text", "common", k = 5)
      .collect()
    assert(bm.length == 3 &&
      bm.forall(r => !r.getDouble(1).isNaN && r.getDouble(1) > 0))
    val tf = TextSearch.tfidfTopK(everyDoc, "doc_id", "text", "common", k = 5)
      .collect()
    assert(tf.forall(r => !r.getDouble(1).isNaN && r.getDouble(1) > 0))
    // all-blank corpus: avgdl = 0 must not NaN the scores (dl/avgdl guard)
    val blankCorpus = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val bmBlank = TextSearch.bm25TopK(blankCorpus, "doc_id", "text", "q", k = 5)
      .collect()
    assert(bmBlank.length == 2 && bmBlank.forall(_.getDouble(1) == 0.0))
    // empty corpus: empty top-k, not an NPE on the stats row
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextSearch.bm25TopK(empty, "doc_id", "text", "q").count() == 0)
    assert(TextSearch.tfidfTopK(empty, "doc_id", "text", "q").count() == 0)

    // LM scoring against an EMPTY reference model (T = V = 0): every
    // token scores ln(1) = 0, never ±Inf/NaN
    val lmEmpty = LanguageModel.train(blankCorpus, "text")
    assert(lmEmpty.totalTokens == 0 && lmEmpty.vocabSize == 0)
    val uni = LanguageModel.scoreBy(lmEmpty, everyDoc, "doc_id", "text").collect()
    assert(uni.forall(r =>
      !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val bg = LanguageModel.scoreBigram(
      LanguageModel.trainBigram(blankCorpus, "text"), everyDoc,
      "doc_id", "text").collect()
    assert(bg.forall(r =>
      !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))

    // temperature sampling: a single domain at alpha = 0 keeps everything
    // at rate exactly 1; an empty corpus passes through empty
    val single = Seq(("a", 1L), ("a", 2L)).toDF("source", "doc_id")
    val kept = Sampling.temperatureSample(single, "source", 0.0, Seq("doc_id"))
      .collect()
    assert(kept.length == 2 &&
      kept.forall(_.getAs[Double]("keep_rate") == 1.0))
    val emptyDom = Seq.empty[(String, Long)].toDF("source", "doc_id")
    assert(Sampling.temperatureSample(emptyDom, "source", 0.5, Seq("doc_id"))
      .count() == 0)

    // leave-one-out target encoding: single-row groups carry no LOO
    // evidence → null, never a divide-by-zero
    val te = graft.transform.Encode.targetEncodeLoo(
        Seq(("x", 1.0), ("y", 2.0), ("y", 4.0)).toDF("cat", "v"),
        "cat", "v", "te")
      .orderBy("v").collect()
    assert(te(0).isNullAt(2), "singleton group must encode null")
    assert(te(1).getDouble(2) == 4.0 && te(2).getDouble(2) == 2.0)
  }

  test("hammingPairs64: pigeonhole banding is exact for any maxHamming") {
    // signatures at controlled distances from a base: d <= maxHamming must
    // pair, d > maxHamming must not — across several band splits (64 % bands
    // != 0 exercises the uneven widths)
    val base = 0x0123456789abcdefL
    def flip(v: Long, bits: Seq[Int]): Long = bits.foldLeft(v)((x, b) => x ^ (1L << b))
    for (maxH <- Seq(1, 3, 6, 10)) {
      val sigs = Seq(
        (0L, base),
        (1L, flip(base, 0 until maxH)), // exactly maxH apart -> pair
        (2L, flip(base, (0 to maxH).map(63 - _)))) // maxH+1 apart (from BOTH) -> no pair
        .toDF("id", "sig")
      val got = Dedup.hammingPairs64(sigs, maxH)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((0L, 1L)), s"maxH=$maxH missed the in-bound pair")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
        s"maxH=$maxH paired beyond the bound: $got")
    }
  }

  test("multimodal: resize downscales oversized images and passes the rest through") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val out = Multimodal.resizeImages(media, maxDim = 10)
    assert(out.schema == Multimodal.resizedSchema)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 30)
    val byId = rows.map(r => r.getAs[Long]("media_id") -> r).toMap
    rows.filter(_.getAs[String]("modality") == "image").foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      val (w0, h0) = (8 + i % 17, 6 + i % 13)
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      if (math.max(w0, h0) <= 10) {
        assert(!r.getAs[Boolean]("resized") && w == w0 && h == h0)
      } else {
        assert(r.getAs[Boolean]("resized"))
        assert(math.max(w, h) == 10, s"image $i: ($w0,$h0) -> ($w,$h)")
        // aspect preserved to rounding; re-encoded bytes decode to (w, h)
        val Some((dw, dh, _)) =
          Multimodal.decodeImage(r.getAs[Array[Byte]]("content"))
        assert(dw == w && dh == h)
      }
    }
    // audio/video pass through byte-identical, never resized
    val original = media.collect().map(r =>
      r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content")).toMap
    rows.filter(_.getAs[String]("modality") != "image").foreach { r =>
      assert(!r.getAs[Boolean]("resized"))
      assert(r.isNullAt(r.fieldIndex("width")))
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("content"), original(r.getAs[Long]("media_id"))))
    }
    assert(byId.nonEmpty)
  }

  test("multimodal: frame sampling fans out k deterministic stub frames per video") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, k = 4)
    assert(frames.schema == Multimodal.frameSchema)
    val rows = frames.orderBy("media_id", "frame_index").collect()
    val videos = media.filter(col("modality") === "video").count()
    assert(rows.length == videos * 4)
    // MP4 videos ((i/3)%2==0, duration_ms = 1000*(i+1)): stub payloads at
    // timestamps i*dur/4, loudly marked. MJPEG videos carry REAL frames —
    // pinned by the dedicated MJPEG sampleFrames test.
    rows.groupBy(_.getAs[Long]("media_id"))
      .filter { case (id, _) => (id / 3) % 2 == 0 }
      .foreach { case (id, fs) =>
        assert(fs.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 1, 2, 3))
        val dur = 1000L * (id + 1)
        assert(fs.map(_.getAs[Long]("frame_ms")).toSeq ==
          Seq(0L, dur / 4, dur * 2 / 4, dur * 3 / 4))
        fs.foreach { f =>
          assert(!f.getAs[Boolean]("real")) // stub payload, loudly marked
          assert(f.getAs[Array[Byte]]("content").length == 32)
        }
      }
    // determinism across runs
    val again = Multimodal.sampleFrames(media, k = 4)
      .orderBy("media_id", "frame_index").collect()
    assert(rows.map(_.getAs[Array[Byte]]("content").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("content").toSeq).toSeq)
  }

  test("multimodal: MP4 box walk reads the checked-in container's real metadata") {
    // Fixture provenance: graft.tools.MakeFixtures writes
    // src/test/resources/clip_640x360_2500ms.mp4 (ftyp + moov/mvhd at
    // timescale 90000 + trak/tkhd 640x360 + mdat). An independent Python
    // struct walk confirmed the same values at generation time.
    val bytes = getClass.getResourceAsStream("/clip_640x360_2500ms.mp4").readAllBytes()
    val Some(v) = Multimodal.parseMp4(bytes)
    assert(v.durationMs == 2500L)
    assert(v.width == 640 && v.height == 360)
    assert(v.trackCount == 1)
    assert(v.majorBrand == "isom")
    // determinism + garbage rejection
    assert(Multimodal.parseMp4(bytes) == Some(v))
    assert(Multimodal.parseMp4(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.parseMp4(bytes.take(40)).isEmpty) // truncated moov
    // a WAV is not an MP4: the walk must not hallucinate boxes
    val wav = getClass.getResourceAsStream("/tone_440hz_8k.wav").readAllBytes()
    assert(Multimodal.parseMp4(wav).isEmpty)
  }

  test("multimodal: synthetic MP4 round-trips arbitrary dims/durations/timescales") {
    for {
      (w, h) <- Seq((16, 16), (1920, 1080), (320, 240))
      durMs <- Seq(40L, 1000L, 3600000L)
      ts <- Seq(600L, 1000L, 90000L)
    } {
      val bytes = Multimodal.syntheticMp4(w, h, durMs, timescale = ts)
      val Some(v) = Multimodal.parseMp4(bytes)
      // timescale-quantization error bounded by one tick
      assert(math.abs(v.durationMs - durMs) <= math.max(1L, 1000L / ts),
        s"dur $durMs @ ts $ts -> ${v.durationMs}")
      assert(v.width == w && v.height == h, s"dims ($w,$h) -> (${v.width},${v.height})")
      assert(v.trackCount == 1)
    }
  }

  test("simhash codegen matches an independent Scala majority-vote") {
    GraftFunctions.register(spark)
    val df = docs.limit(50)
    val rows = df.select(col("doc_id"),
        transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("hs"),
        GraftFunctions.simhash64(spark, TextOps.tokens(col("text"))).as("sig"))
      .collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](1)
      val counts = new Array[Int](64)
      hs.foreach { h =>
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
      }
      val expected = (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
      assert(r.getLong(2) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("IVF ANN recall vs brute force; extensions register SQL functions") {
    val index = graft.ops.Ivf.build(embs, "vec_id", "embedding", nLists = 8)
    val ivf = graft.ops.Ivf.search(index, col("id") < 20, k = 5, nProbe = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
        col("vec_id") < 20, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall") // 3/8 cells probed

    // extensions entry point registers without error
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("cluster resolution: chain, cliques, singletons; log-round convergence") {
    import graft.ops.Clusters
    // a 200-node chain (diameter 199 — hash-min without shortcuts would
    // need 199 rounds; path halving must finish inside maxRounds=25),
    // a 5-clique, a 2-cycle, and an isolated edge pair
    val chain = (0L until 199L).map(i => (i, i + 1))
    val clique = for (i <- 300L to 304L; j <- 300L to 304L if i < j) yield (i, j)
    val extra = Seq((400L, 401L), (401L, 400L), (500L, 501L))
    val pairs = (chain ++ clique ++ extra).toDF("a", "b")

    val resolved = Clusters.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 199L).foreach(i => assert(resolved(i) == 0L, s"chain node $i"))
    (300L to 304L).foreach(i => assert(resolved(i) == 300L))
    assert(resolved(400L) == 400L && resolved(401L) == 400L)
    assert(resolved(500L) == 500L && resolved(501L) == 500L)

    // assignClusters unions in ids that never appeared in an edge
    val ids = ((0L to 199L) ++ Seq(300L, 999L, 1000L)).toDF("doc_id")
    val assigned = Clusters.assignClusters(ids, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(999L) == 999L && assigned(1000L) == 1000L)
    assert(assigned(5L) == 0L && assigned(300L) == 300L)

    // id types are preserved: string/UUID-style ids resolve too (a silent
    // cast-to-long would null these out and return an empty result)
    val strPairs = Seq(("doc-b", "doc-c"), ("doc-a", "doc-b")).toDF("a", "b")
    val strIds = Seq("doc-a", "doc-b", "doc-c", "doc-z").toDF("doc_id")
    val strAssigned = Clusters.assignClusters(strIds, "doc_id", strPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strAssigned == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "doc-z" -> "doc-z"))
  }

  test("salted collect_set/count_distinct match direct aggs; salt spreads the hot key") {
    import graft.ops.Skew
    // one hot key (80% of rows) + two normal keys, values with repeats
    val rows = (0 until 4000).map(i => ("hot", s"v${i % 977}")) ++
      (0 until 500).map(i => ("a", s"v${i % 13}")) ++
      (0 until 500).map(i => ("b", s"v${i % 7}"))
    val df = rows.toDF("k", "v")

    val salted = Skew.saltedCollectSet(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val direct = df.groupBy("k").agg(
        array_sort(collect_set(col("v"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, vs) => assert(vs == direct(k), s"key $k") }

    val counts = Skew.saltedCountDistinct(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("hot" -> 977L, "a" -> 13L, "b" -> 7L))

    // phase 1 really splits the hot key: its values spread over >1 salt bucket
    val hotBuckets = df.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("v")), lit(8)).as("s")).distinct().count()
    assert(hotBuckets > 1, "hot key not spread across salt buckets")
  }

  test("deduplicateCorpus keeps exactly one canonical doc per near-dup cluster") {
    import graft.ops.Clusters
    val dedup = Dedup.deduplicateCorpus(docs, "doc_id", "text", threshold = 0.5)
      .cache()
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
    val assigned = Clusters.assignClusters(
      docs.select("doc_id"), "doc_id", pairs, "id1", "id2")

    // one keeper per cluster; keepers are their own cluster id; sizes
    // account for the whole corpus
    assert(dedup.count() == assigned.select("cluster_id").distinct().count())
    assert(dedup.filter(col("cluster_id") =!= col("doc_id")).count() == 0)
    assert(dedup.agg(sum("n_cluster")).head().getLong(0) == docs.count())
    assert(dedup.columns.contains("text"), "payload columns survive")

    // no confirmed near-dup pair survives intact
    val kept = dedup.select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = pairs.collect()
      .count(r => kept(r.getLong(0)) && kept(r.getLong(1)))
    assert(survivors == 0, s"$survivors confirmed pairs fully kept")

    // quality-aware variant keeps the best-scoring doc of each cluster;
    // same cluster partition, possibly different keepers
    val scored = docs.withColumn("q", col("n_chars").cast("double"))
    val byQuality = Dedup.deduplicateCorpusBy(scored, "doc_id", "text", "q",
      threshold = 0.5).cache()
    assert(byQuality.count() == dedup.count())
    assert(byQuality.agg(sum("n_cluster")).head().getLong(0) == docs.count())
    // every keeper's score is the max of its cluster
    val assignedAll = Clusters.assignClusters(
      docs.select("doc_id"), "doc_id", pairs, "id1", "id2")
    val best = assignedAll
      .join(scored.select(col("doc_id").as("id"), col("q")), "id")
      .groupBy("cluster_id").agg(max("q").as("best_q"))
    val mismatched = byQuality.join(best, "cluster_id")
      .filter(col("q") =!= col("best_q")).count()
    assert(mismatched == 0, "a keeper is not its cluster's best-quality doc")
  }

  test("hash split/stratified sample/mix are deterministic and well-proportioned") {
    import graft.ops.Sampling
    val keys = Seq("doc_id")

    // split: partition of the corpus, fractions within ~2% at n=500
    val split = Sampling.hashSplit(docs, keys,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong, "split must partition the corpus")
    assert(math.abs(counts("train") / n - 0.8) < 0.06, s"train ${counts("train")}")
    assert(counts.keySet == Set("train", "val", "test"))

    // determinism: same assignment after a repartition (rand() would fail)
    val again = Sampling.hashSplit(docs.repartition(13), keys,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    assert(split.select("doc_id", "split").exceptAll(again).count() == 0)

    // stratified: exactly k per stratum (or the whole stratum when smaller)
    val k = 40
    val strat = Sampling.stratifiedSample(docs, Seq("lang"), k, keys)
    val perStratum = strat.groupBy("lang").count().collect()
    val stratumSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { r =>
      val want = math.min(k.toLong, stratumSizes(r.getString(0)))
      assert(r.getLong(1) == want, s"${r.getString(0)}: ${r.getLong(1)} != $want")
    }

    // mix: weights thin each source independently; tags identify origin
    val mixed = Sampling.mixCorpora(
      Seq(("full", docs, 1.0), ("half", docs, 0.5)), keys).cache()
    val bySource = mixed.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("full") == n.toLong)
    assert(math.abs(bySource("half") / n - 0.5) < 0.07, s"half ${bySource("half")}")

    // packing: every row binned; bins respect budget + one-row overshoot;
    // assignment survives repartition
    val budget = 2000L
    val packed = Sampling.packByBudget(docs, "n_chars", budget, keys, groups = 4)
      .cache()
    assert(packed.count() == n.toLong)
    val maxChars = docs.agg(max("n_chars")).head().getLong(0)
    val overfull = packed.groupBy("pack_group", "pack_seq")
      .agg(sum("n_chars").as("w"))
      .filter(col("w") > budget + maxChars).count()
    assert(overfull == 0, "a bin exceeds budget + one row's weight")
    val packedAgain = Sampling.packByBudget(docs.repartition(7), "n_chars",
      budget, keys, groups = 4).select("doc_id", "pack_group", "pack_seq")
    assert(packed.select("doc_id", "pack_group", "pack_seq")
      .exceptAll(packedAgain).count() == 0)
  }

  test("deterministic shuffle: a stable permutation, independent per seed") {
    import graft.ops.Sampling
    val ids = docs.select("doc_id")
    val order = Sampling.shuffle(ids, Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // permutation of the corpus, not a sort by id
    assert(order.sorted == ids.collect().map(_.getLong(0)).toSeq.sorted)
    assert(order != order.sorted, "seeded order must not be the id order")
    // identical permutation regardless of input partitioning (rand() fails this)
    val again = Sampling.shuffle(ids.repartition(13), Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order == again, "shuffle must be a pure function of row identity")
    // a different seed is an independent epoch order
    val epoch2 = Sampling.shuffle(ids, Seq("doc_id"), seed = "epoch2")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(epoch2 != order && epoch2.sorted == order.sorted)
  }

  test("PQ: 32x-compressed codes; ADC recall@10 holds vs exact brute force") {
    import graft.ops.{Pq, Similarity}
    val cb = Pq.fit(embs, "vec_id", "embedding", m = 8, k = 16, maxIter = 10)
    assert(cb.centroids.length == 8 && cb.centroids.forall(_.length == 16))
    assert(cb.dSub == 8)
    val encoded = Pq.encode(embs, "vec_id", "embedding", cb).cache()
    val codes = encoded.select("code").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)),
      "every code must be m=8 indices in [0, k)")
    // encoding is a pure function of the vector: stable under repartition
    val again = Pq.encode(embs.repartition(7), "vec_id", "embedding", cb)
    assert(encoded.exceptAll(again).count() == 0)

    val k = 10
    val qf = col("vec_id") < 20
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qf, k)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ADC-only on these NEAR-RANDOM synthetic vectors (max pairwise cosine
    // ~0.5, no cluster structure — the adversarial case for quantization)
    // ranks weakly; it must still beat noise by a wide margin
    val adc = Pq.searchAdc(encoded, cb,
        embs.filter(qf).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = brute.count(adc.contains).toDouble / brute.size
    assert(adcRecall >= 0.2, s"ADC-only recall@$k $adcRecall (chance ~0.02)")

    // the deployment shape — ADC shortlist + exact re-rank — restores
    // recall even here (finer m=16 codebooks, 100-candidate shortlist)
    val cb16 = Pq.fit(embs, "vec_id", "embedding", m = 16, k = 16, maxIter = 10)
    val enc16 = Pq.encode(embs, "vec_id", "embedding", cb16)
    val rr = Pq.searchAdcRerank(embs, "vec_id", "embedding", enc16, cb16,
        embs.filter(qf).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k, shortlist = 100)
    val rrPairs = rr.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrRecall = brute.count(rrPairs.contains).toDouble / brute.size
    assert(rrRecall >= 0.85, s"reranked recall@$k $rrRecall over ${brute.size}")
    // re-ranked cosines are EXACT: spot-check against Similarity.cosine
    val one = rr.head()
    val qid = one.getAs[Long]("qid"); val nid = one.getAs[Long]("nid")
    val exact = embs.filter(col("vec_id") === qid).select(col("embedding"))
      .crossJoin(embs.filter(col("vec_id") === nid)
        .select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding").cast("array<double>"),
        col("e2").cast("array<double>"))).head().getDouble(0)
    assert(math.abs(one.getAs[Double]("cosine") - exact) < 1e-9)
  }

  test("frequent-span removal strips shared 5-grams, keeps unique text") {
    import graft.ops.Dedup
    val boiler = "all rights reserved contact us today" // 6 words, 2 gram starts
    val df = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon"),
      (3L, "entirely unique words with no repeats here"),
      (4L, "tiny doc"), // shorter than n: no grams, untouched
      (5L, boiler) // fully covered → empty string survives as a row
    ).toDF("doc_id", "text")
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Dedup.removeFrequentSpans(d, "doc_id", "text", n = 5, minDocFreq = 2)
    val out = run(df).collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text"), r.getAs[Long]("words_removed")))).toMap
    assert(out(1L) == (("alpha beta gamma", 6L)))
    assert(out(2L) == (("delta epsilon", 6L)))
    assert(out(3L) == (("entirely unique words with no repeats here", 0L)))
    assert(out(4L) == (("tiny doc", 0L)))
    assert(out(5L) == (("", 6L)))
    // pure function of content: identical output under repartitioning
    val again = run(df.repartition(7))
    assert(run(df).exceptAll(again).count() == 0)
  }

  test("IVF-PQ: probed-cell candidates only, exact rerank scores, recall floor") {
    import graft.ops.{Ivf, Pq, Similarity}
    val index = Ivf.build(embs, "vec_id", "embedding", nLists = 8,
      maxIter = 10, initMode = "random")
    val cb = Pq.fit(embs, "vec_id", "embedding", m = 16, k = 16, maxIter = 10)
    val encoded = Pq.encode(embs, "vec_id", "embedding", cb)
    val k = 10
    val qf = col("id") < 20
    val out = Pq.searchIvfPq(embs, "vec_id", "embedding", index, encoded, cb,
      qf, k = k, nProbe = 4, shortlist = 100).cache()
    // exactly k rows per query
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.length == 20 && perQ.forall(_.getLong(1) == k))
    // every neighbor lies in one of its query's probed cells — candidate
    // generation respected the IVF prune (4 of 8 cells)
    val cells = index.assigned.select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val centroidRank = (qv: Array[Double]) => index.centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qv).map { case (a, b) => a * b }.sum, i) }
      .sortBy(t => (-t._1, t._2)).take(4).map(_._2).toSet
    val qvecs = index.assigned.filter(qf)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    out.select("qid", "nid").collect().foreach { r =>
      val probed = centroidRank(qvecs(r.getLong(0)))
      assert(probed.contains(cells(r.getLong(1))),
        s"neighbor ${r.getLong(1)} of ${r.getLong(0)} outside probed cells")
    }
    // recall floor vs brute force — structureless vectors cap the cell
    // recall (neighbors spread uniformly over cells: probing 4/8 bounds
    // expected recall near 0.5), so the floor pins "no silent collapse",
    // not search quality; sim_ann_ivf/PQ rerank specs pin the quality legs
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
        col("vec_id") < 20, k)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF-PQ recall@$k $recall")
    // returned cosines are exact (not quantized): spot-check one row
    val one = out.head()
    val exact = embs.filter(col("vec_id") === one.getAs[Long]("qid"))
      .select(col("embedding")).crossJoin(
        embs.filter(col("vec_id") === one.getAs[Long]("nid"))
          .select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding").cast("array<double>"),
        col("e2").cast("array<double>"))).head().getDouble(0)
    assert(math.abs(one.getAs[Double]("cosine") - exact) < 1e-9)
  }

  test("minhash novelty: exact and near-dup copies of history are not novel") {
    import graft.ops.Dedup
    val hist = docs.select("doc_id", "text").filter(col("doc_id") < 40)
    val exactCopies = hist.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 5000L)
    // near-dups: one appended token on a ~50-word doc keeps bigram
    // jaccard ~0.94, far above the 0.5 threshold
    val nearDups = hist.filter(col("doc_id").between(3, 5))
      .withColumn("doc_id", col("doc_id") + 6000L)
      .withColumn("text", concat(col("text"), lit(" zzgarble")))
    val fresh = Seq(
      (9001L, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll"),
      (9002L, "")) // blank: no shingles, no signature -> reported novel
      .toDF("doc_id", "text")
    val inc = exactCopies.unionByName(nearDups).unionByName(fresh)
    val novel = Dedup.novelAgainstMinhash(inc, hist, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(9001L, 9002L),
      s"expected only the fresh docs novel, got $novel")
  }

  test("temperature sampling: argmin domain kept whole, head thinned toward n^alpha") {
    import graft.ops.Sampling
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.temperatureSample(docs, "lang", 0.5, Seq("doc_id")).cache()
    val rates = out.select("lang", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.size == byLang.size, "one rate per domain")
    // closed-form check: q_i ∝ sqrt(n_i), T = min n_i/q_i, rate = q_i·T/n_i
    val n = byLang.map { case (k, v) => k -> v.toDouble }
    val sumw = n.values.map(math.sqrt).sum
    val q = n.map { case (k, v) => k -> math.sqrt(v) / sumw }
    val t = n.map { case (k, v) => v / q(k) }.min
    n.keys.foreach { k =>
      val expect =
        if (n(k) / q(k) <= t * (1 + 1e-12)) 1.0
        else math.min(1.0, math.floor(q(k) * t / n(k) * 1e6) / 1e6)
      assert(math.abs(rates(k) - expect) < 2e-6, s"$k: ${rates(k)} vs $expect")
    }
    assert(rates.values.max == 1.0, "scarcest-relative-to-target domain keeps rate 1")
    // kept counts track their rates (loose binomial bound)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.keys.foreach { k =>
      assert(math.abs(kept.getOrElse(k, 0L) - rates(k) * n(k)) <=
        4 * math.sqrt(n(k)) + 1, s"$k kept ${kept.getOrElse(k, 0L)}")
    }
    // alpha = 1 is the identity: every rate 1, nothing dropped
    assert(Sampling.temperatureSample(docs, "lang", 1.0, Seq("doc_id")).count() ==
      docs.count())
  }

  test("mergeable MG summary: error bound holds for every token; hitters superset") {
    import graft.ops.HeavyHitters
    val cap = 64
    val s = HeavyHitters.summarize(docs, "text", cap)
    val exact = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(s.n == exact.values.sum, "stream length drift")
    // MG contract: estimates never exceed truth, and undershoot by at
    // most n/(capacity+1); any token above the bound is present
    for ((t, c) <- exact) {
      val est = s.estimate(t)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(c - est <= s.maxError, s"$t undershot past the bound")
      if (c > s.maxError) assert(est > 0, s"guaranteed hitter $t missing")
    }
    // hitters(f) is a superset of the true hitters at that fraction
    val f = 0.005
    val minCount = math.ceil(f * s.n).toLong
    val truth = exact.filter(_._2 >= minCount).keySet
    val got = s.hitters(f).map(_._1).toSet
    assert(truth.subsetOf(got),
      s"missing true hitters: ${truth -- got}")
    // splitting the corpus and merging matches the contract too
    val (h1, h2) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
    val m = HeavyHitters.merge(
      HeavyHitters.summarize(h1, "text", cap),
      HeavyHitters.summarize(h2, "text", cap))
    assert(m.n == s.n)
    for ((t, c) <- exact) {
      assert(m.estimate(t) <= c && c - m.estimate(t) <= m.maxError,
        s"merged summary broke the bound at $t")
    }
  }

  test("corpus diff: statuses partition ids; null content compares stably") {
    import graft.ops.CorpusDiff
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("doc_id", "text")
    val cur = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (5L, Some("e"))).toDF("doc_id", "text")
    val got = CorpusDiff.diff(prev, cur, "doc_id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
    val summary = CorpusDiff.diffSummary(prev, cur, "doc_id", Seq("text"))
      .as[(String, Long)].collect().toMap
    assert(summary == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("weightedSample: matches the driver reference; weight contract holds") {
    val df = (0L until 400L).map(i => (i, (i % 7) + 1L)).toDF("id", "w")
    val k = 40
    val got = graft.ops.Sampling.weightedSample(df, Seq("id"), "w", k, "ws-test")
      .select("id").as[Long].collect().toSet
    assert(got.size == k)
    // independent driver-side reference: same hash, same key formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"ws-test|$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    val expect = (0L until 400L)
      .map(i => i -> math.log(u(i)) / ((i % 7) + 1L)).sortBy(-_._2)
      .take(k).map(_._1).toSet
    assert(got == expect,
      s"selection drift: extra=${got -- expect} missing=${expect -- got}")
    // zero/negative/null weights are never drawn, even with k > population
    val mixed = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 3L))
      .toDF("id", "w")
      .withColumn("w",
        when(col("id") === 4L, lit(null).cast("long")).otherwise(col("w")))
    val kept = graft.ops.Sampling.weightedSample(mixed, Seq("id"), "w", 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L), s"weight contract violated: $kept")
    // k beyond the eligible population returns every eligible row once
    val all = graft.ops.Sampling.weightedSample(mixed, Seq("id"), "w", 100)
      .select("id").as[Long].collect().toSeq
    assert(all == Seq(1L), s"k > population drifted: $all")
    // an overwhelming weight is effectively always selected
    val skewed = (0L until 200L).map(i => (i, if (i == 77L) 1000000L else 1L))
      .toDF("id", "w")
    for (seed <- Seq("a", "b", "c", "d", "e")) {
      val s = graft.ops.Sampling.weightedSample(skewed, Seq("id"), "w", 5, seed)
        .select("id").as[Long].collect().toSet
      assert(s.contains(77L), s"heavy row missed under seed $seed: $s")
    }
  }

  test("semantic dedup: identical vectors collapse; kept set has no within-cell near-dups") {
    import graft.ops.{Dedup, Similarity}
    // three exact-duplicate groups + two unique vectors, in 2 cells
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.01f, 0.0f)), // near-dup of group {1,2}
      (4L, Seq(0.0f, 1.0f, 0.0f)), (5L, Seq(0.0f, 1.0f, 0.0f)),
      (6L, Seq(0.0f, 0.0f, 1.0f)), // unique
      (7L, Seq(-1.0f, 0.0f, 0.0f)) // unique (cosine -1 vs group 1)
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, nLists = 2, seed = 7)
    val kept = out.select("vec_id", "n_cluster").as[(Long, Long)].collect().toMap
    assert(out.agg(sum(col("n_cluster"))).head().getLong(0) == 7L,
      "cluster sizes must partition the corpus")
    // {1,2,3} collapse (if co-located — identical vectors ALWAYS share a
    // cell, so at minimum {1,2} and {4,5} collapse)
    assert(!kept.contains(2L) && !kept.contains(5L),
      s"identical duplicates must not both be kept: $kept")
    assert(kept.contains(6L) && kept.contains(7L), s"unique vectors kept: $kept")

    // real embeddings: within-cell guarantee, checked brute-force
    val out2 = Dedup.semanticDedup(embs, "vec_id", "embedding",
      threshold = 0.35, nLists = 4, seed = 42)
    val keptIds = out2.select(col("vec_id"))
    // same quantizer configuration semanticDedup uses internally, so the
    // independently-built index reproduces its cells
    val index = graft.ops.Ivf.build(embs, "vec_id", "embedding", nLists = 4,
      seed = 42, maxIter = 8, initMode = "random")
    val keptCells = index.assigned
      .join(keptIds, index.assigned("id") === keptIds("vec_id"))
      .select(col("cell"), col("id"), col("v"))
    val a = keptCells.select(col("cell"), col("id").as("i1"), col("v").as("u1"))
    val b = keptCells.select(col("cell"), col("id").as("i2"), col("v").as("u2"))
    val offenders = a.join(b, Seq("cell")).filter(col("i1") < col("i2"))
      .filter(Similarity.dot(col("u1"), col("u2")) >= 0.35)
    assert(offenders.isEmpty,
      "two kept vectors in one cell exceed the threshold — within-cell dedup failed")
  }

  test("bm25: matches an independent scalar implementation; ranking is total") {
    import graft.ops.TextSearch
    val fixture = Seq(
      (1, "spark join join filter"), (2, "spark"), (3, "filter scan scan"),
      (4, ""), (5, "join spark join spark join")).toDF("doc_id", "text")
    val out = TextSearch.bm25TopK(fixture, "doc_id", "text", "spark join", k = 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))

    // independent scalar BM25 (same Lucene idf variant)
    val toks = Map(1 -> Seq("spark", "join", "join", "filter"), 2 -> Seq("spark"),
      3 -> Seq("filter", "scan", "scan"), 4 -> Seq.empty[String],
      5 -> Seq("join", "spark", "join", "spark", "join"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def score(id: Int): Double = Seq("spark", "join").map { t =>
      val df = toks.values.count(_.contains(t)).toDouble
      val tf = toks(id).count(_ == t).toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks(id).size / avgdl))
    }.sum
    val expected = toks.keys.toSeq
      .map(id => (id, BigDecimal(score(id)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, s) => (-s, id) }
    assert(out.toSeq == expected, s"got ${out.toSeq}, want $expected")
    assert(out.head._1 == 5, "doc 5 (max tf both terms) must rank first")
  }

  test("tfidf: matches an independent scalar implementation; blank doc scores 0") {
    import graft.ops.TextSearch
    val fixture = Seq(
      (1, "spark join join filter"), (2, "spark"), (3, "filter scan scan"),
      (4, ""), (5, "join spark join spark join")).toDF("doc_id", "text")
    val out = TextSearch.tfidfTopK(fixture, "doc_id", "text", "spark join", k = 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))

    // independent scalar TF-IDF: (tf/dl) * (ln((1+N)/(1+df)) + 1)
    val toks = Map(1 -> Seq("spark", "join", "join", "filter"), 2 -> Seq("spark"),
      3 -> Seq("filter", "scan", "scan"), 4 -> Seq.empty[String],
      5 -> Seq("join", "spark", "join", "spark", "join"))
    val n = toks.size.toDouble
    def score(id: Int): Double = Seq("spark", "join").map { t =>
      val df = toks.values.count(_.contains(t)).toDouble
      val dl = toks(id).size.toDouble
      val tf = toks(id).count(_ == t).toDouble
      val idf = math.log((1.0 + n) / (1.0 + df)) + 1.0
      if (dl == 0.0) 0.0 else (tf / dl) * idf
    }.sum
    val expected = toks.keys.toSeq
      .map(id => (id, BigDecimal(score(id)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, s) => (-s, id) }
    assert(out.toSeq == expected, s"got ${out.toSeq}, want $expected")
    // doc 2 is 100% 'spark'; its normalized tf beats doc 1's mixed bag
    assert(out.head._1 == 5 || out.head._1 == 2,
      "a fully-on-topic doc must rank at the top under length-normalized tf")
  }

  test("resample ffill: hourly grid carries last prior obs; exact tick reads prior") {
    import graft.operators.Resample
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:30:00"), 5.0),
      (1L, ts("2024-01-01 11:45:00"), 7.0),
      (1L, ts("2024-01-01 12:00:00"), 9.0), // exactly on a grid tick
      (1L, ts("2024-01-01 14:10:00"), 1.0),
      (2L, ts("2024-01-01 23:59:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = Resample.ffillGrid(events, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, Option(r.get(2))))
      .sortBy(x => (x._1, x._2))
    val expected = Seq(
      (1L, "2024-01-01 10:00:00.0", None),      // before first obs
      (1L, "2024-01-01 11:00:00.0", Some(5.0)),
      (1L, "2024-01-01 12:00:00.0", Some(7.0)), // tick == obs reads PRIOR
      (1L, "2024-01-01 13:00:00.0", Some(9.0)),
      (1L, "2024-01-01 14:00:00.0", Some(9.0)),
      (2L, "2024-01-01 23:00:00.0", None))      // single-obs key: one leading tick
    assert(out.toSeq == expected, s"got ${out.toSeq}")
  }

  test("funnel: ordered conversion with window; retention: weekly cohorts") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000L)
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      (2L, ts(3), "click"), (2L, ts(5), "view"), // click precedes view: no step 2
      (3L, ts(0), "view"), (3L, ts(5), "purchase"), (3L, ts(10), "click"),
      (4L, ts(0), "click"), (4L, ts(1), "purchase"), // never viewed
      (5L, ts(0), "view"), (5L, ts(90), "click") // outside a 1-hour window
    ).toDF("user_id", "ts", "event_type")
    def counts(window: String): Seq[(String, Int, Long)] =
      EventAnalytics.funnel(events, Seq("view", "click", "purchase"),
          window = window)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    // unbounded: users 1,3,5 click after view; only user 1 purchases after
    assert(counts("") == Seq(("view", 1, 4L), ("click", 2, 3L),
      ("purchase", 3, 1L)))
    // 1-hour window drops user 5's late click
    assert(counts("1 hour") == Seq(("view", 1, 4L), ("click", 2, 2L),
      ("purchase", 3, 1L)))

    // retention: one user active on day 0 and day 8 (week 1), another day 0
    val ret = EventAnalytics.retention(Seq(
        (1L, ts(0)), (1L, ts(30)), (1L, ts(8 * 24 * 60)),
        (2L, ts(60))).toDF("user_id", "ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val day0 = 19723L // 2024-01-01 in epoch days
    assert(ret == Seq((day0, 0L, 2L), (day0, 1L, 1L)), s"got $ret")
  }

  test("label centroids: per-label vector mean; orthogonal labels score cosine 0") {
    import graft.ops.Similarity
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(3.0f, 0.0f), 0),
      (3L, Seq(0.0f, 2.0f), 1), (4L, Seq(0.0f, 4.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.labelCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(cents(0) == Seq(2.0, 0.0) && cents(1) == Seq(0.0, 3.0), s"$cents")
    val conf = Similarity.labelConfusion(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(conf == Seq((0, 1, 0.0)), s"got $conf")
  }

  test("range join: inclusive bounds, multi-chunk intervals, no nested loop") {
    import graft.operators.RangeJoin
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, 250L),
      (6L, 301L)).toDF("pid", "p")
    val iv = Seq((10L, 10L, 100L), (11L, 200L, 300L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", chunk = 30L)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // p=10 and p=100 land on inclusive bounds; p=5 and p=301 match nothing;
    // interval 10 spans 4 chunks yet each point matches exactly once
    assert(got == Set((2L, 10L), (3L, 10L), (4L, 10L), (5L, 11L)), s"$got")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"range join must stay equi-join shaped:\n$plan")
  }

  test("active users: DAU exact; trailing window counts distinct, not sum") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(d: Long): Timestamp = new Timestamp(1704067200000L + d * 86400000L)
    // user 1 active days 0,1; user 2 day 0; user 3 day 9
    val events = Seq((1L, ts(0)), (1L, ts(0)), (1L, ts(1)), (2L, ts(0)),
      (3L, ts(9))).toDF("user_id", "ts")
    val out = EventAnalytics.activeUsers(events, windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val d0 = 19723L
    // day0: dau 2, 7d 2; day1: dau 1, 7d 2 (user1 counted ONCE though
    // active both days); day9: dau 1, 7d 1 (day-1 activity aged out)
    assert(out == Seq((d0, 2L, 2L), (d0 + 1, 1L, 2L), (d0 + 9, 1L, 1L)),
      s"got $out")
  }

  test("top paths: ordered per-key n-grams; short histories contribute none") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)
    val events = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(10), 2L, "b"), (1L, ts(20), 3L, "c"),
      (1L, ts(30), 4L, "b"), (1L, ts(40), 5L, "c"),
      (2L, ts(5), 6L, "a"), (2L, ts(15), 7L, "b"), (2L, ts(25), 8L, "c"),
      (3L, ts(0), 9L, "a"), (3L, ts(1), 10L, "b") // too short for trigrams
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.topPaths(events, n = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // user1: a>b>c, b>c>b, c>b>c; user2: a>b>c → a>b>c twice, rest once
    assert(out == Seq(("a>b>c", 2L), ("b>c>b", 1L), ("c>b>c", 1L)),
      s"got $out")
  }

  test("kfold: folds partition rows, survive repartition, group keys cohere") {
    import graft.ops.Sampling
    val df = (1L to 500L).map(i => (i, i % 50)).toDF("row_id", "entity_id")
    val folded = Sampling.kfold(df, Seq("entity_id"), k = 5)
    val byEntity = folded.groupBy("entity_id")
      .agg(countDistinct(col("fold")).as("nf"))
    assert(byEntity.filter(col("nf") =!= 1).isEmpty,
      "all rows of an entity must share one fold")
    val folds = folded.select("fold").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(folds.forall(f => f >= 0 && f < 5), s"${folds.toSeq}")
    val again = Sampling.kfold(df.repartition(7), Seq("entity_id"), 5)
      .select("row_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val first = folded.select("row_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == first, "fold assignment must not depend on partitioning")
  }

  test("bigram LM: hand-computed conditional logprobs; short docs score 0") {
    import graft.ops.LanguageModel
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // unigrams a:3 b:3 x:1 → V=3; bigram counts "a b":3, "b a":1
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.selfScoreBigram(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // P(b|a) = (3+1)/(cu(a)+V) = 4/6; P(a|b) = (1+1)/(cu(b)+V) = 2/6
    val pab = math.log(4.0 / 6.0); val pba = math.log(2.0 / 6.0)
    assert(out(1L) == ((3L, r6((pab + pba + pab) / 3.0))), s"${out(1L)}")
    assert(out(2L) == ((1L, r6(pab))), s"${out(2L)}")
    assert(out(3L) == ((0L, 0.0)), "single-token doc has no bigram evidence")
  }

  test("entity resolution: blocking bounds pairs; mega-blocks excluded by cap") {
    import graft.ops.EntityResolution
    val recs = Seq(
      (1L, "A", "smith john"), (2L, "A", "smith jon"), // edit 1, same block
      (3L, "B", "smith john"),                         // same name, other block
      (4L, "A", "walker kate"), (5L, "A", "walker late") // edit 1
    ).toDF("id", "blk", "name")
    val pairs = EntityResolution
      .candidatePairs(recs, Seq("blk"), "id", "name", maxEdit = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // cross-block (1,3) must NOT pair despite identical names
    assert(pairs == Set((1L, 2L, 1), (4L, 5L, 1)), s"$pairs")
    // a cap below the block size removes that block's pairs entirely
    val capped = EntityResolution
      .candidatePairs(recs, Seq("blk"), "id", "name", maxEdit = 1,
        maxBlockSize = 3)
    assert(capped.count() == 0,
      "block A (4 records) must be excluded by maxBlockSize=3")
  }

  test("fellegi-sunter: hand-computed weights, null evidence, loud bad m/u") {
    import graft.ops.EntityResolution
    import graft.ops.EntityResolution.FieldSpec
    // m=0.8 u=0.2 -> agree +2 bits, disagree -2 bits (log2(4), log2(1/4))
    val f1 = FieldSpec("a", col("a1") === col("a2"), m = 0.8, u = 0.2)
    val f2 = FieldSpec("b", col("b1") === col("b2"), m = 0.8, u = 0.2)
    assert(math.abs(f1.agreeWeight - 2.0) < 1e-12 &&
      math.abs(f1.disagreeWeight + 2.0) < 1e-12)
    val pairs = Seq(
      (1L, "x", "y", "x", "y"),                      // both agree -> +4
      (2L, "x", "y", "x", "z"),                      // one each -> 0
      (3L, "x", "y", "w", "z"),                      // both disagree -> -4
      (4L, "x", null.asInstanceOf[String], "x", null.asInstanceOf[String])
    ).toDF("id", "a1", "b1", "a2", "b2")
    val out = EntityResolution
      .fellegiSunter(pairs, Seq(f1, f2), upper = 3.0, lower = -3.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("match_weight"),
          r.getAs[String]("classification")))).toMap
    assert(out(1L) == ((4.0, "match")))
    assert(out(2L) == ((0.0, "possible")))
    assert(out(3L) == ((-4.0, "non_match")))
    // null = null comparison is null -> that field contributes ZERO
    assert(out(4L) == ((2.0, "possible")),
      "a null comparison must be no evidence, not disagreement")
    // agreement that is NOT evidence of a match is a spec bug -> loud
    intercept[IllegalArgumentException] {
      FieldSpec("bad", col("a1") === col("a2"), m = 0.2, u = 0.8)
    }
  }

  test("link prediction: hand graph, adjacency excluded, hub cap") {
    import graft.ops.Graph
    // triangle 1-2-3 plus pendant 3-4: predictions are (1,4) and (2,4)
    // through middle 3 (deg 3); AA = 1/ln(3), jaccard = 1/(deg_u+1-1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.linkPrediction(edges).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        ((r.getAs[Long]("common_neighbors"), r.getAs[Double]("adamic_adar"),
          r.getAs[Double]("jaccard")))).toMap
    val aa = math.rint(math.rint(1.0 / math.log(3.0) * 1e9) / 1e9 * 1e6) / 1e6
    assert(out.keySet == Set((1L, 4L), (2L, 4L)),
      s"adjacent pairs must never be predicted: ${out.keySet}")
    assert(out((1L, 4L)) == ((1L, aa, 0.5)))
    assert(out((2L, 4L)) == ((1L, aa, 0.5)))
    // capping middles at degree 2 removes node 3 = the only middle with
    // two arms reaching a non-adjacent pair
    assert(Graph.linkPrediction(edges, maxMiddleDegree = 2).count() == 0)
  }

  test("acf daily: exact hand series, lag pairs, gap skipping") {
    import graft.ops.EventAnalytics
    // day d carries d+1 events, d = 0..5: series 1,2,3,4,5,6, mean 3.5,
    // denominator 17.5, lag-1 numerator 8.75 -> acf(1) = 0.5
    val rows = for { d <- 0 to 5; i <- 0 to d }
      yield (d.toLong * 86400L + i, 1)
    val ev = rows.toDF("s", "one")
      .select(timestamp_seconds(col("s")).as("ts"))
    val acf = EventAnalytics.acfDaily(ev, "ts", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("acf")))).toMap
    assert(acf(1L) == ((5L, 0.5)))
    // lag 2: (-2.5)(-0.5)+(-1.5)(0.5)+(-0.5)(1.5)+(0.5)(2.5) = 1.0
    assert(acf(2L) == ((4L, math.rint(1.0 / 17.5 * 1e6) / 1e6)))
    // a calendar gap drops only the pairs that straddle it
    val gapped = ev.filter(expr("unix_micros(ts) div 86400000000") =!= 3)
    val g = EventAnalytics.acfDaily(gapped, "ts", maxLag = 1)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(g(1L) == 3L, "pairs into and out of the missing day must drop")
  }

  test("mojibake count: classic fingerprints flagged, clean text zero") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "caffÃ© latte"),      // 'é' as Ã©
      (2L, "a�b"),                    // replacement char
      (3L, "â€œquoteâ€"), // â€œ ... â€
      (4L, "hello world"),                 // clean
      (5L, "badbreak")               // raw C1 control
    ).toDF("id", "t")
    val got = docs.select(col("id"),
        TextOps.mojibakeCount(col("t")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L),
      s"$got")
  }

  test("interval overlap: exact pair set vs brute force, each pair exactly once") {
    import graft.operators.RangeJoin
    val left = Seq((1L, 0L, 100L), (2L, 50L, 250L), (3L, 400L, 410L))
      .toDF("lid", "llo", "lhi")
    val right = Seq((10L, 90L, 160L), (11L, 100L, 100L), (12L, 260L, 399L),
      (13L, 240L, 500L)).toDF("rid", "rlo", "rhi")
    // brute force on the fixture
    val want = (for {
      (l, llo, lhi) <- Seq((1L, 0L, 100L), (2L, 50L, 250L), (3L, 400L, 410L))
      (r, rlo, rhi) <- Seq((10L, 90L, 160L), (11L, 100L, 100L),
        (12L, 260L, 399L), (13L, 240L, 500L))
      if llo <= rhi && rlo <= lhi
    } yield (l, r)).toSet
    val got = RangeJoin
      .intervalOverlap(left, right, "llo", "lhi", "rlo", "rhi", chunk = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got.toSet == want, s"got ${got.toSet}, want $want")
    assert(got.length == got.distinct.length,
      "a pair sharing many chunks must still appear exactly once")
  }

  test("scd2 history: intervals chain gaplessly; exactly one current row per key") {
    import graft.ops.Upsert
    val hist = Upsert.scd2History(
      Tables.load(spark, "/root/testdata/sf0.001", "events"),
      "user_id", "ts", "event_id", Seq("event_type", "value"))
    val perKey = hist.groupBy("user_id").agg(
      sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
      count(lit(1)).as("n"))
    assert(perKey.filter(col("n_current") =!= 1).isEmpty,
      "every key must have exactly one open interval")
    // chain: each non-current interval's valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    val broken = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(!col("is_current") && col("valid_to") =!= col("next_from"))
    assert(broken.isEmpty, "validity intervals must chain without gaps")
  }

  test("rolling stats: trailing range frame inclusive at the window edge") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)
    val events = Seq(
      (10L, 1L, ts(0), 1.0),
      (11L, 1L, ts(86400), 2.0),      // exactly 24 h later: includes event 10
      (12L, 1L, ts(86401), 4.0),      // 24 h + 1 s: event 10 aged out
      (13L, 2L, ts(50), 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventAnalytics.rollingStats(events, 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((10L, 1L, 100L), (11L, 2L, 300L),
      (12L, 2L, 600L), (13L, 1L, 800L)), s"got $out")
  }

  test("corpus card: dup census collapses whitespace variants; mean quality exact") {
    import graft.ops.CorpusReport
    val docs = Seq(
      (1L, "the cat  sat", "en", "a"),
      (2L, "THE CAT SAT",  "de", "a"), // fingerprint-equal to doc 1
      (3L, "dog",          "en", "a"),
      (4L, "bird",         "fr", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val out = CorpusReport.bySource(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(("a", 3L, 7L, 2L, 2L), ("b", 1L, 1L, 1L, 0L)),
      s"got $out")
  }

  test("trend by key: hand-computed slopes, degenerate keys null, one hash exchange") {
    import graft.stats.Regression
    import java.sql.Timestamp
    def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)
    val events = Seq(
      (1L, ts(0), 10.0), (1L, ts(60), 20.0), (1L, ts(120), 30.0),
      (2L, ts(0), 5.0), // single point: no slope
      (3L, ts(30), 4.0), (3L, ts(30), 8.0) // zero time variance: no slope
    ).toDF("user_id", "ts", "value")
    val out = Regression.trendByKey(events, "user_id", "ts", "value")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)), Option(r.get(3)))).toSeq
    // key 1: cents rise 1000 per 60 s → slope 16.666667, intercept 1000
    assert(rows == Seq(
      (1L, 3L, Some(16.666667), Some(1000.0)),
      (2L, 1L, None, None),
      (3L, 2L, None, None)), s"got $rows")
    // the window min and the groupBy share one hash partitioning
    // (AQE's toString appends an "== Initial Plan ==" section that would
    // double-count — look only at the final plan)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"want exactly 1 hash exchange, plan:\n$plan")
  }

  test("top-fraction by group: exact window cut and approx threshold cut agree") {
    import graft.ops.Sampling
    // Two domains of different sizes with distinct scores.
    val rows = (1 to 40).map(i => ("big", i.toLong, i.toDouble)) ++
      (1 to 7).map(i => ("small", (100 + i).toLong, i * 10.0))
    val df = rows.toDF("dom", "id", "score")

    val exact = Sampling.topFractionByGroup(df, "dom", "score", "id", 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // big: ceil(0.25·40)=10 → scores 31..40; small: ceil(0.25·7)=2 → 60,70
    assert(exact == ((31 to 40).map(i => ("big", i.toLong)) ++
      Seq(("small", 106L), ("small", 107L))).toSet, s"got $exact")

    val approx = Sampling.thresholdTopFraction(df, "dom", "score", 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // the approx cut must keep a per-domain count within ±2 of exact and
    // never keep a row while dropping a higher-scored one in that domain
    for (dom <- Seq("big", "small")) {
      val e = exact.count(_._1 == dom); val a = approx.count(_._1 == dom)
      assert(math.abs(e - a) <= 2, s"$dom: exact $e vs approx $a")
    }
    val keptScores = rows.filter(r => approx.contains((r._1, r._2)))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val dropScores = rows.filterNot(r => approx.contains((r._1, r._2)))
      .groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    for (dom <- keptScores.keys if dropScores.contains(dom))
      assert(keptScores(dom) > dropScores(dom),
        s"$dom: approx cut is not a clean score threshold")
  }

  test("heavy hitters: exact vs brute force; MG fallback when guarantee void") {
    import graft.ops.HeavyHitters
    // Skewed fixture: 'alpha' dominates, a long tail of unique tokens.
    val docs = (1 to 50).map { i =>
      val tail = (1 to 10).map(j => s"tail_${i}_$j").mkString(" ")
      (i, s"alpha alpha alpha beta $tail")
    } ++ Seq((51, ""), (52, "alpha beta gamma"))
    val df = docs.toDF("doc_id", "text")

    def brute(minFraction: Double): Seq[(String, Long)] = {
      val e = df.select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      val n = e.count()
      val minCount = math.ceil(minFraction * n).toLong
      e.groupBy("t").count().filter(col("count") >= minCount)
        .orderBy(col("count").desc, col("t"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    def run(minFraction: Double, capacity: Int): Seq[(String, Long)] =
      HeavyHitters.frequentTokens(df, "text", minFraction, capacity)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // Healthy capacity: the candidate path is live and exact.
    assert(run(0.05, capacity = 64) == brute(0.05))
    assert(run(0.001, capacity = 4096) == brute(0.001))
    // capacity=2 voids the guarantee at minFraction=0.001 (minCount ≤ N/3):
    // the exact-fallback path must still return the right answer.
    assert(run(0.001, capacity = 2) == brute(0.001))
    // The dominant token is found even when capacity is minimal but the
    // guarantee holds (alpha is > 1/2 of non-tail mass; use frac where
    // minCount > N/(cap+1)).
    val top = run(0.2, capacity = 8)
    assert(top.map(_._1) == Seq("alpha"), s"got $top")
  }

  test("bpe pre-tokenizer pieces: contractions, digit runs, punctuation split off") {
    val cases = Seq(
      (1, "it's 42 words-ish, okay?"),
      (2, "hello world"),
      (3, ""),
      (4, "a1b2"))
    val df = cases.toDF("id", "text")
    val r = df.select(col("id"), TextOps.bpePieces(col("text")).as("p"),
        TextOps.bpeTokenCount(col("text")).as("n"))
      .orderBy("id").collect()
    assert(r(0).getSeq[String](1) ==
      Seq("it", "'s", " 42", " words", "-", "ish", ",", " okay", "?"))
    assert(r(1).getSeq[String](1) == Seq("hello", " world"))
    assert(r(2).getInt(2) == 0)
    assert(r(3).getSeq[String](1) == Seq("a", "1", "b", "2"))
    // the piece count upper-bounds the word count on non-degenerate text
    val docsCheck = docs.select(
      (TextOps.bpeTokenCount(col("text")) >= TextOps.tokenCount(col("text"))).as("ok"))
      .filter(!col("ok")).count()
    assert(docsCheck == 0, "piece count must dominate whitespace word count")
  }

  test("unigram LM: hand-computed logprobs, OOV smoothing, empty docs") {
    import graft.ops.LanguageModel
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val corpus = Seq((1, "a a b"), (2, "b c"), (3, "")).toDF("doc_id", "text")
    val lm = LanguageModel.train(corpus, "text")
    assert(lm.totalTokens == 5L && lm.vocabSize == 3L) // a:2 b:2 c:1
    val scored = LanguageModel.scoreBy(lm, corpus, "doc_id", "text")
      .orderBy("id").collect()
    // denom = T + V = 8; a,b -> (2+1)/8, c -> (1+1)/8
    assert(scored(0).getLong(1) == 3L &&
      scored(0).getDouble(2) == r6(math.log(3.0 / 8)))
    assert(scored(1).getDouble(2) ==
      r6((math.log(3.0 / 8) + math.log(2.0 / 8)) / 2))
    assert(scored(2).getLong(1) == 0L && scored(2).getDouble(2) == 0.0,
      "empty doc scores 0.0 with n_tokens 0")
    // out-of-vocabulary tokens in a NEW doc get the smoothed floor, not -inf
    val novel = Seq((9, "zz zz")).toDF("doc_id", "text")
    val s = LanguageModel.scoreBy(lm, novel, "doc_id", "text").head()
    assert(s.getDouble(2) == r6(math.log(1.0 / 8)))
    // the quality-signal direction: common-vocab docs outscore rare-vocab
    assert(scored(0).getDouble(2) > scored(1).getDouble(2))
  }

  test("decontamination: exact overlap counts; bloom never under-counts") {
    import graft.ops.Decontaminate
    // bench doc: "the quick brown fox jumps" → 3-grams {the quick brown,
    // quick brown fox, brown fox jumps}
    val bench = Seq((100, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1, "the quick brown fox jumps"), // full copy: all 3 shingles hit
      (2, "a quick brown fox runs away"), // shares only "quick brown fox"
      (3, "completely unrelated words here now"), // 0 overlap
      (4, "xy zz") // < 3 words → no shingles
    ).toDF("doc_id", "text")
    val exact = Decontaminate.overlapExact(corpus, "doc_id", "text", bench, "text", n = 3)
      .orderBy("id").collect()
    assert(exact.map(r => (r.getInt(0), r.getLong(2))).toSeq ==
      Seq((1, 3L), (2, 1L), (3, 0L), (4, 0L)))
    assert(exact(0).getDouble(3) == 1.0) // doc 1: 3/3 shingles contaminated
    assert(exact(3).getInt(1) == 0) // short doc reported with n_shingles=0

    val bloomOv = Decontaminate
      .overlapBloom(corpus, "doc_id", "text", bench, "text", n = 3, fpp = 0.001)
      .orderBy("id").collect()
    // no false negatives: bloom overlap >= exact overlap, per doc
    // (and the bloom path's schema matches the exact path's — long counts)
    exact.zip(bloomOv).foreach { case (e, b) =>
      assert(b.getLong(2) >= e.getLong(2),
        s"bloom under-counted doc ${e.getInt(0)}: ${b.getLong(2)} < ${e.getLong(2)}")
    }

    val cleanE = Decontaminate
      .cleanExact(corpus, "doc_id", "text", bench, "text", n = 3, maxOverlap = 1L)
      .select("doc_id").as[Int].collect().toSet
    assert(cleanE == Set(3, 4)) // docs 1 and 2 flagged at maxOverlap=1
    val cleanB = Decontaminate
      .cleanBloom(corpus, "doc_id", "text", bench, "text", n = 3,
        maxOverlap = 1L, fpp = 0.001)
      .select("doc_id").as[Int].collect().toSet
    assert(cleanB.subsetOf(cleanE), "bloom clean set must be ⊆ exact clean set")
  }

  test("decontamination on the documents table: bloom clean ⊆ exact clean") {
    import graft.ops.Decontaminate
    val bench = docs.filter(col("doc_id") % 17 === 3)
    val corpus = docs.filter(col("doc_id") % 17 =!= 3)
    val exact = Decontaminate
      .cleanExact(corpus, "doc_id", "text", bench, "text", n = 3, maxOverlap = 3L)
      .select("doc_id")
    val bloom = Decontaminate
      .cleanBloom(corpus, "doc_id", "text", bench, "text", n = 3,
        maxOverlap = 3L, fpp = 0.001)
      .select("doc_id")
    assert(bloom.join(exact, Seq("doc_id"), "left_anti").isEmpty,
      "bloom kept a doc the exact path flags")
    val (nE, nB) = (exact.count(), bloom.count())
    assert(nB >= nE - math.max(5L, (nE * 0.05).toLong),
      s"bloom over-flagged: kept $nB of $nE")
    assert(nE > 0, "fixture degenerate: exact clean set empty")
  }

  test("keyed upsert rewrites only affected buckets; deletes can empty one") {
    import graft.ops.Upsert
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-spec")
    val dir = root.resolve("c").toString
    val corpus = (1L to 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    Upsert.writeKeyed(corpus, "doc_id", dir, nBuckets = 8)

    def bucketOf(k: Long): Int = Seq(Tuple1(k)).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8)).cast("int")).head().getInt(0)
    def files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val base = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(base)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => base.relativize(p).toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
      finally s.close()
    }

    val before = files()
    val upd = Seq((1L, "updated 1"), (401L, "new 401")).toDF("doc_id", "text")
    val st = Upsert.upsertWithKeys(spark, dir, upd, "doc_id", 8, Seq(2L))
    assert(st.bucketsTouched <= 3 && st.upserts == 2 && st.deletes == 1)

    val out = Upsert.readKeyed(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.size == 400) // 400 - 1 delete + 1 insert
    assert(out(1L) == "updated 1" && out(401L) == "new 401")
    assert(!out.contains(2L) && out(3L) == "text 3")

    // files under untouched bucket dirs are byte-for-byte the same objects
    val touchedDirs = Seq(1L, 2L, 401L).map(k => s"bucket=${bucketOf(k)}").toSet
    val after = files()
    before.foreach { case (f, mtime) =>
      if (!touchedDirs.contains(f.split("/").head))
        assert(after.get(f).contains(mtime), s"untouched-bucket file rewritten: $f")
    }

    // delete EVERY key of one bucket: its directory must disappear
    val b0 = bucketOf(3L)
    val doomed = Upsert.readKeyed(spark, dir)
      .filter(col("bucket") === b0).select("doc_id")
    val nDoomed = doomed.count()
    val st2 = Upsert.upsert(spark, dir, corpus.limit(0), "doc_id", 8,
      deletes = Some(doomed))
    assert(st2.affectedRowsAfter == 0 && st2.deletes == nDoomed)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/bucket=$b0")), "emptied bucket dir remains")
    assert(Upsert.readKeyed(spark, dir).count() == 400 - nDoomed)
  }

  test("PII redaction: emails, IPs, digit runs; idempotent; clean text untouched") {
    val df = Seq(
      (1L, "contact john.doe+spam@example.co.uk or 10.0.0.1 ref 12345678"),
      (2L, "short digits 123456 stay; v1.2.3.4 keeps its prefix guard"),
      (3L, "perfectly clean text with no identifiers at all"))
      .toDF("id", "text")
    val out = df.select(col("id"), TextOps.redactPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or <IP> ref <NUM>")
    // 6-digit run is below the 7+ threshold; "v1.2.3.4" survives because
    // \b requires the quad to start at a word boundary ("v1" has none)
    assert(out(2L) == "short digits 123456 stay; v1.2.3.4 keeps its prefix guard")
    assert(out(3L) == "perfectly clean text with no identifiers at all")
    // idempotence: placeholders survive a second pass unchanged
    val twice = df.select(TextOps.redactPii(TextOps.redactPii(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSet
    assert(twice == out.values.toSet)
  }

  test("chunking covers text exactly once; empty-safe") {
    val df = Seq(
      (1L, "a" * 500), (2L, "abc"), (3L, ""), (4L, null: String), (5L, "x" * 200))
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.chunks(col("text"), size = 200, overlap = 50).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).length == 3)                      // starts 0,150,300
    assert(out(1L).forall(_.length <= 200))
    assert(out(2L) == Seq("abc"))                    // shorter than one chunk
    assert(out(3L).isEmpty && out(4L).isEmpty)       // empty / null text
    assert(out(5L) == Seq("x" * 200))                // exactly one window
    // reconstruction: first chunk + overlap-stripped tails == original
    val rebuilt = out(1L).head + out(1L).tail.map(_.drop(50)).mkString
    assert(rebuilt == "a" * 500, "chunks must tile the text exactly")
  }

  test("empty and degenerate inputs do not throw across the ops surface") {
    import graft.ops.{Clusters, Sampling, Skew}
    import graft.stats.IncrementalStats
    val emptyPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val ids = Seq(10L, 11L).toDF("doc_id")

    // cluster resolution: no edges -> no resolved rows; all ids singleton
    assert(Clusters.resolveClusters(emptyPairs).count() == 0)
    val singletons = Clusters.assignClusters(ids, "doc_id", emptyPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(singletons == Map(10L -> 10L, 11L -> 11L))

    // incremental stats: empty input -> empty sketch -> empty merge
    val emptyDocs = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(IncrementalStats.merge(
      IncrementalStats.sketch(emptyDocs, Seq("v"), lit("p"))).count() == 0)

    // salted aggs keep a key whose values are ALL null (direct-agg parity)
    val withNullKey = Seq(("k1", "v1"), ("k2", null: String), ("k2", null: String))
      .toDF("k", "v")
    val sets = Skew.saltedCollectSet(withNullKey, Seq("k"), "v", buckets = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sets("k2").isEmpty && sets("k1") == Seq("v1"))
    val nd = Skew.saltedCountDistinct(withNullKey, Seq("k"), "v", buckets = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nd == Map("k1" -> 1L, "k2" -> 0L))

    // invalid split fractions refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, Seq("doc_id"), Seq("a" -> 0.8, "b" -> 0.4))
    }
    // packing an empty frame is a no-op
    assert(Sampling.packByBudget(emptyDocs.withColumnRenamed("v", "w"),
      "w", 100L, Seq("id")).count() == 0)
  }

  test("prefix-filtered Jaccard equals the naive exact join at every threshold") {
    // shared bigram "the end" is a stop-shingle across ALL docs; the pair
    // (1,2) is a true near-dup; 5 is an unrelated singleton; 6 is empty
    val docs = Seq(
      (1L, "alpha beta gamma delta the end"),
      (2L, "alpha beta gamma epsilon the end"),
      (3L, "one two three four the end"),
      (4L, "five six seven eight the end"),
      (5L, "lone wolf"),
      (6L, "")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getLong(4), math.rint(r.getDouble(5) * 1e9))).toSeq
    for (t <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val naive = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = t)
        .select(col("id1"), col("id2"), col("n1").cast("int"),
          col("n2").cast("int"), col("intersection"), col("jaccard")))
      val prefix = canon(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = t)
        .select(col("id1"), col("id2"), col("n1"), col("n2"),
          col("intersection").cast("long"), col("jaccard")))
      assert(prefix == naive, s"prefix join diverged at threshold $t")
    }
    // sanity at t=0.4: exactly the engineered near-dup pair survives (J=3/7)
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 2, 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("stripMarkup: blocks, tags, entity order, no word fusion") {
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextOps.stripMarkup(col("h")))
        .head().getString(0)
    // script CONTENT goes (even with a raw < inside); tags become spaces
    assert(strip("<p>a</p><script>if (1 < 2) x();</script><p>b</p>") == "a b")
    assert(strip("<style>p{color:red}</style>hello") == "hello")
    // a tag between words must not fuse them
    assert(strip("one<br>two") == "one two")
    // entity decode order: &amp; LAST, so &amp;lt; is the literal '&lt;'
    assert(strip("&amp;lt; &lt; &gt; &quot; &#39; &amp;") ==
      "&lt; < > \" ' &")
    assert(strip("a&nbsp;&nbsp;b") == "a b")
    // attributes with > inside quotes are the accepted regex failure mode;
    // plain attributes strip cleanly
    assert(strip("<a href=\"http://x\" rel=\"nofollow\">link</a>") == "link")
    assert(strip("") == "")
    assert(strip("plain text stays") == "plain text stays")
  }

  test("farthest-point sample: cluster coverage, invariants, repartition-stable") {
    // three tight, well-separated clusters in 4-d; k=3 must visit all three
    def mk(center: Array[Double], n: Int, base: Long) =
      (0 until n).map { i =>
        (base + i, center.zipWithIndex.map { case (c, j) =>
          c + ((base + i) * 7 + j) % 5 * 0.01
        }.toSeq)
      }
    val rows = mk(Array(0, 0, 0, 0), 30, 0L) ++
      mk(Array(10, 0, 0, 0), 30, 100L) ++
      mk(Array(0, 10, 10, 0), 30, 200L)
    val df = rows.toDF("id", "v")
    val picks = Similarity.farthestPointSample(df, "id", "v", k = 3)
    val clusters = picks.map(_.id / 100).toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"k=3 FPS must cover all three clusters, picked ${picks.map(_.id)}")
    val ds = picks.flatMap(_.dist)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    // deterministic under physical layout
    val again = Similarity.farthestPointSample(df.repartition(7), "id", "v", 3)
    assert(again.map(_.id) == picks.map(_.id))
    assert(again.flatMap(_.dist) == ds)
    // null vectors never seed or get picked
    val withNull = rows.map { case (id, v) => (id, Some(v)) } :+
      (999L, Option.empty[Seq[Double]])
    val p2 = Similarity.farthestPointSample(
      withNull.toDF("id", "v"), "id", "v", 3)
    assert(!p2.map(_.id).contains(999L))
  }

  test("readability: hand-computed FK, vowel-less min-1 rule, empty-doc nulls") {
    val rows = Seq(
      (1L, "The cat sat. The dog ran fast!"),
      (2L, "bcd 123."),
      (3L, ""),
      (4L, "No terminator here")).toDF("doc_id", "text")
    val out = TextOps.readability(rows, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 7)
    assert(r1.getAs[Long]("n_sentences") == 2,
      "one mid-text boundary plus the end-of-text bang")
    assert(r1.getAs[Long]("n_syllables") == 7)
    assert(r1.getAs[Double]("fk_grade") ==
      math.rint((0.39 * 3.5 + 11.8 * 1.0 - 15.59) * 1e4) / 1e4)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_syllables") == 2,
      "vowel-less words still carry one syllable each")
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_words") == 0 &&
      r3.isNullAt(r3.fieldIndex("fk_grade")),
      "empty document must not fake a grade")
    assert(out(4L).getAs[Long]("n_sentences") == 1,
      "unterminated text floors at one sentence")
  }

  test("procrustes: planted rotation recovered, orthogonality, rank-deficiency loud") {
    import graft.ops.Procrustes
    // planted 3-D rotation: angle in the (0,1) plane, axis 2 fixed
    val th = 0.7
    val r0 = Array(
      Array(math.cos(th), math.sin(th), 0.0),
      Array(-math.sin(th), math.cos(th), 0.0),
      Array(0.0, 0.0, 1.0))
    def rot(x: Array[Double]): Array[Double] =
      Array.tabulate(3)(j => x.indices.map(i => x(i) * r0(i)(j)).sum)
    val xs = (0 until 200).map { i =>
      Array(((i * 37) % 19 - 9).toDouble, ((i * 53) % 23 - 11).toDouble,
        ((i * 71) % 17 - 8).toDouble)
    }
    val pairs = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x.toSeq, rot(x).toSeq) }
      .toDF("id", "a", "b")
    val m = Procrustes.fit(pairs, "a", "b")
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(m.rotation(i)(j) - r0(i)(j)) < 1e-9,
        s"rotation off at ($i,$j)")
    // aligned vectors land exactly on the target
    val res = Procrustes.align(pairs, "a", m)
      .select(zip_with(col("aligned"), col("b"), (x, y) => abs(x - y)))
      .as[Seq[Double]].collect().flatten.max
    assert(res < 1e-9)
    // a constant coordinate cannot determine the rotation: loud failure
    val degenerate = (0 until 50)
      .map(i => (i.toLong, Seq(i.toDouble, 0.0), Seq(i.toDouble, 0.0)))
      .toDF("id", "a", "b")
    val e = intercept[IllegalArgumentException] {
      Procrustes.fit(degenerate, "a", "b")
    }
    assert(e.getMessage.contains("rank-deficient"))
  }

  test("zipf fit: planted exponent recovery, uniform corpus, hapax share, degenerate") {
    import graft.ops.TextOps
    // plant a perfect Zipf-1 corpus: token i appears floor(1000/i) times
    val zipfText = (1 to 50).flatMap(i =>
      Seq.fill(1000 / i)(s"tok$i")).mkString(" ")
    val fit = TextOps.zipfFit(Seq(zipfText).toDF("text"), "text")
      .collect().head
    assert(math.abs(fit.getAs[Double]("slope") + 1.0) < 0.05,
      s"planted Zipf-1 should recover slope ~ -1, got ${fit.getAs[Double]("slope")}")
    assert(fit.getAs[Double]("r2") > 0.99)
    assert(fit.getAs[Long]("vocab") == 50)
    // uniform corpus: constant counts -> zero y-variance -> null r2, slope 0
    val uni = Seq(((1 to 30).map(i => s"u$i u$i").mkString(" ")))
      .toDF("text")
    val uf = TextOps.zipfFit(uni, "text").collect().head
    assert(uf.getAs[Double]("slope") == 0.0 &&
      uf.isNullAt(uf.fieldIndex("r2")))
    assert(uf.getAs[Double]("hapax_share") == 0.0)
    // all-hapax corpus
    val hap = TextOps.zipfFit(
      Seq((1 to 20).map(i => s"h$i").mkString(" ")).toDF("text"), "text")
      .collect().head
    assert(hap.getAs[Double]("hapax_share") == 1.0)
    // single-token vocabulary: no x-variance -> null slope, never Inf
    val one = TextOps.zipfFit(Seq("same same same").toDF("text"), "text")
      .collect().head
    assert(one.isNullAt(one.fieldIndex("slope")))
  }

  test("importance resampling: pulls toward the target distribution, deterministic") {
    import graft.ops.Sampling
    // corpus: 100 docs of "common" words, 100 docs of "rare" words;
    // target speaks only "rare" -> resampling must prefer rare docs
    val corpus = ((0 until 100).map(i =>
      (i.toLong, "aaa bbb ccc ddd eee aaa bbb ccc")) ++
      (100 until 200).map(i =>
        (i.toLong, "xxx yyy zzz www vvv xxx yyy zzz")))
      .toDF("doc_id", "text")
    val target = (0 until 20).map(i => (i.toLong, "xxx yyy zzz www vvv"))
      .toDF("doc_id", "text")
    val picked = Sampling.importanceResample(corpus, "doc_id", "text",
      target, "text", k = 40)
      .select("id").as[Long].collect()
    val rareShare = picked.count(_ >= 100).toDouble / picked.length
    assert(rareShare > 0.9,
      s"target-domain docs must dominate the draw, got $rareShare")
    // deterministic: same inputs, same selection
    val again = Sampling.importanceResample(corpus, "doc_id", "text",
      target, "text", k = 40).select("id").as[Long].collect()
    assert(picked.toSeq == again.toSeq)
    // log-domain key: long documents with huge ratios cannot overflow
    val long = Seq((1L, ("xxx " * 5000).trim), (2L, ("aaa " * 5000).trim))
      .toDF("doc_id", "text")
    val lr = Sampling.importanceResample(long, "doc_id", "text",
      target, "text", k = 2).collect()
    assert(lr.forall(r => !r.getAs[Double]("gumbel_key").isInfinite &&
      !r.getAs[Double]("gumbel_key").isNaN))
    assert(lr.head.getAs[Long]("id") == 1L,
      "the target-language doc must out-rank under an extreme ratio")
  }

  test("eval contamination: hand case, short-eval zero row, full containment") {
    import graft.ops.Decontaminate
    val corpus = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma epsilon"), // trigrams: abg (hit), bge (miss)
      (2L, "zeta eta theta iota"),      // zet+eti: both hits
      (3L, "so short")).toDF("doc_id", "text") // < 3 words: 0/0
    val out = Decontaminate.evalContamination(corpus, "text", bench,
      "doc_id", "text", n = 3).collect()
      .map(r => r.getAs[Long]("eval_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("frac")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((0L, 0L, 0.0)),
      "a sub-n benchmark item reports 0/0, it does not vanish")
  }

  test("degenerate inputs across the session's new ops: no throws, loud where it matters") {
    import graft.ops.{CorpusOverlap, Hll, Mixture, SftPrep, Similarity, Winnow}
    val emptyText = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    // winnowing / divergence / sft on empty corpora: empty or null, never a crash
    assert(Winnow.fingerprints(emptyText, "doc_id", "text").count() == 0)
    val dv = CorpusOverlap.divergence(emptyText, "text", emptyText, "text")
      .collect().head
    assert(dv.isNullAt(dv.fieldIndex("kl_ab")),
      "empty-vs-empty divergence is undefined, not a number")
    assert(SftPrep.preferencePairs(
      spark.emptyDataset[(String, Long, Double)].toDF("g", "id", "s"),
      "g", "id", "s").count() == 0)
    // HLL of nothing estimates null, never throws
    val est = Hll.estimate(Hll.sketch(emptyText, "text")).collect().head
    assert(est.getAs[Long]("n_registers") == 0 &&
      est.isNullAt(est.fieldIndex("hll_est")))
    // water-fill with no positive supply: empty allocation table
    assert(Mixture.waterFill(
      Seq(("a", 0.0), ("b", -5.0)).toDF("d", "a"), "d", "a", 100.0)
      .count() == 0)
    // rrf over one empty list: empty fusion
    assert(Similarity.rrfFuse(
      Seq(spark.emptyDataset[(Long, Long, Int)].toDF("q", "d", "r")),
      "q", "d", "r").count() == 0)
    // cuped with a missing arm fails LOUDLY instead of returning empty
    val oneArm = Seq(("treatment", 1.0, 2.0), ("treatment", 2.0, 3.0))
      .toDF("arm", "x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.stats.Experiment.cuped(oneArm).collect()
    }
    assert(e.getMessage.contains("both arms"))
  }

  test("water-fill: hand case, surplus budget, tiny budget, exhaustion invariant") {
    import graft.ops.Mixture
    def fill(avail: Seq[(String, Double)], budget: Double) =
      Mixture.waterFill(avail.toDF("d", "a"), "d", "a", budget)
        .collect().map(r => r.getAs[String]("domain") ->
          ((r.getAs[Double]("allocated"), r.getAs[Boolean]("capped"))))
        .toMap
    val avail = Seq(("a", 10.0), ("b", 20.0), ("c", 100.0))
    // budget 60: a,b cap out, c takes the 30-token level
    val f1 = fill(avail, 60.0)
    assert(f1 == Map("a" -> ((10.0, true)), "b" -> ((20.0, true)),
      "c" -> ((30.0, false))))
    // surplus budget: everyone fully served
    val f2 = fill(avail, 500.0)
    assert(f2.values.forall(_._2) && f2("c")._1 == 100.0)
    // tiny budget: one common level below every supply
    val f3 = fill(avail, 15.0)
    assert(f3.values.forall(v => v._1 == 5.0 && !v._2))
    // zero budget allocates zero
    assert(fill(avail, 0.0).values.forall(_._1 == 0.0))
    // exhaustion: random-ish supplies, sum(allocated) == min(budget, total)
    val many = (0 until 17).map(i => (s"d$i", ((i * 37) % 11 + 1) * 10.0))
    val f4 = fill(many, 400.0)
    // allocations are rounded to 6 decimals; drift is bounded by n*5e-7
    assert(math.abs(f4.values.map(_._1).sum - 400.0) < many.size * 5e-7)
  }

  test("neyman allocation: variance-weighted shares, caps, fallback, loud budget") {
    import graft.ops.Mixture
    // A: 2 rows, sigma = sqrt(50); B: 4 constant rows, sigma = 0 ->
    // all weight on A, whose cap (2 rows) forces the remainder to B
    val panel = Seq(("A", 0.0), ("A", 10.0),
      ("B", 5.0), ("B", 5.0), ("B", 5.0), ("B", 5.0)).toDF("s", "x")
    val out = Mixture.neymanAllocation(panel, Seq("s"), col("x"), 3L)
      .collect().map(r => r.getAs[String]("s") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("alloc")))).toMap
    assert(out("A") == ((2L, 2L)), s"A capped at its rows: $out")
    assert(out("B") == ((4L, 1L)), s"B takes the residual: $out")
    // all-constant strata: Neyman degenerates -> proportional to N_h
    val const = Seq(("A", 1.0), ("A", 1.0),
      ("B", 2.0), ("B", 2.0), ("B", 2.0), ("B", 2.0)).toDF("s", "x")
    val prop = Mixture.neymanAllocation(const, Seq("s"), col("x"), 3L)
      .collect().map(r => r.getAs[String]("s") -> r.getAs[Long]("alloc"))
      .toMap
    assert(prop("A") == 1L && prop("B") == 2L, s"proportional fallback: $prop")
    // the budget always spends exactly
    val varied = (0 until 120).map(i => (s"s${i % 8}", (i * 13 % 29).toDouble))
      .toDF("s", "x")
    val spent = Mixture.neymanAllocation(varied, Seq("s"), col("x"), 50L)
      .agg(sum(col("alloc"))).head().getLong(0)
    assert(spent == 50L)
    // over-budget and thin strata fail loudly
    assert(intercept[IllegalArgumentException] {
      Mixture.neymanAllocation(panel, Seq("s"), col("x"), 100L)
    }.getMessage.contains("exceeds"))
    assert(intercept[Exception] {
      Mixture.neymanAllocation(Seq(("A", 1.0)).toDF("s", "x"),
        Seq("s"), col("x"), 1L).collect()
    }.toString.contains("fewer than 2 rows"))
  }

  test("sft prep: chat rendering byte-exact, preference pair selection and margin") {
    import graft.ops.SftPrep
    val turns = Seq(
      (1L, Some("sys"), Some("hi"), Some("hello")),
      (2L, None, Some("hi"), Some("hello")),
      (3L, Some("sys"), None, Some("hello")),
      (4L, Some("sys"), Some("hi"), None))
      .toDF("id", "sys", "usr", "asst")
    val r = SftPrep.renderChat(turns, col("sys"), col("usr"), col("asst"))
      .collect().map(x => x.getAs[Long]("id") ->
        Option(x.getAs[String]("rendered"))).toMap
    assert(r(1L).get ==
      "<|im_start|>system\nsys<|im_end|>\n" +
      "<|im_start|>user\nhi<|im_end|>\n" +
      "<|im_start|>assistant\nhello<|im_end|>\n")
    assert(r(2L).get.startsWith("<|im_start|>user"),
      "null system drops the system turn")
    assert(r(3L).isEmpty && r(4L).isEmpty,
      "a missing side is not a trainable example")

    val cands = Seq(
      ("p1", 1L, 0.9), ("p1", 2L, 0.5), ("p1", 3L, 0.1),
      ("p2", 4L, 0.6), ("p2", 5L, 0.55), // margin below threshold
      ("p3", 6L, 0.7)) // single candidate: no pair
      .toDF("g", "id", "s")
    val pairs = SftPrep.preferencePairs(cands, "g", "id", "s",
      minMargin = 0.2).collect()
      .map(x => x.getAs[String]("g") ->
        ((x.getAs[Long]("chosen_id"), x.getAs[Long]("rejected_id"),
          x.getAs[Double]("margin")))).toMap
    assert(pairs.keySet == Set("p1"))
    assert(pairs("p1") == ((1L, 3L, 0.8)))
    // all-tied group: NO pair at the default margin (orientation of a tie
    // would be a pure id-order artifact — the margin test is strict)
    val tied = Seq(("t", 7L, 1.0), ("t", 8L, 1.0)).toDF("g", "id", "s")
    assert(SftPrep.preferencePairs(tied, "g", "id", "s").isEmpty)
    // an explicitly negative margin opts ties back in, id-order tie-break
    val tp = SftPrep.preferencePairs(tied, "g", "id", "s",
      minMargin = -1.0).collect().head
    assert(tp.getAs[Long]("chosen_id") == 7L &&
      tp.getAs[Long]("rejected_id") == 8L &&
      tp.getAs[Double]("margin") == 0.0)
  }

  test("rrf fusion: hand-computed scores, single-list presence, consensus wins") {
    import graft.ops.Similarity
    val la = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q", "d", "r")
    val lb = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3)).toDF("q", "d", "r")
    val out = Similarity.rrfFuse(Seq(la, lb), "q", "d", "r", kConst = 60,
      topK = 10).collect()
      .map(r => r.getAs[Long]("nid") ->
        ((r.getAs[Int]("rank"), r.getAs[Double]("rrf"),
          r.getAs[Long]("n_lists")))).toMap
    def r12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    // doc 11: ranks 2 and 1 -> strongest consensus
    val s11 = r12(1.0 / 62) + r12(1.0 / 61)
    assert(math.abs(out(11L)._2 - s11) < 1e-9)
    assert(out(11L)._1 == 1 && out(11L)._3 == 2)
    // doc 10: ranks 1 and 3
    assert(out(10L)._1 == 2)
    // docs present in only one list still score
    assert(out(13L)._3 == 1 && out(12L)._3 == 1)
    // rank-2-in-one-list beats rank-3-in-one-list
    assert(out(13L)._2 > out(12L)._2)
  }

  test("borda fusion: positional points, truncation, id tie-break") {
    import graft.ops.Similarity
    val la = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 14L, 4))
      .toDF("q", "d", "r")
    val lb = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3)).toDF("q", "d", "r")
    // listK = 3 truncates doc 14 (rank 4) out entirely
    val out = Similarity.bordaFuse(Seq(la, lb), "q", "d", "r",
      listK = 3, topK = 10).collect()
      .map(r => r.getAs[Long]("nid") ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("borda"),
          r.getAs[Long]("n_lists")))).toMap
    assert(!out.contains(14L), "rank past listK must score nothing")
    // doc 10: (3-1+1) + (3-3+1) = 4; doc 11: (3-2+1) + (3-1+1) = 5
    assert(out(11L) == ((1, 5L, 2L)))
    assert(out(10L) == ((2, 4L, 2L)))
    // docs 12 and 13: 1 and 2 points respectively
    assert(out(13L) == ((3, 2L, 1L)))
    assert(out(12L) == ((4, 1L, 1L)))
  }

  test("itemset pairs: hand-computed support/confidence/lift, loud width") {
    import graft.ops.EventAnalytics
    // baskets: 1:{a,b}, 2:{a,b,c}, 3:{a}, 4:{b} -> nBaskets=4
    // n_a=3, n_b=3, n_c=1; n_ab=2 (baskets 1,2), n_ac=1, n_bc=1
    val df = Seq((1L, "a"), (1L, "b"), (1L, "b"), // duplicate collapses
      (2L, "a"), (2L, "b"), (2L, "c"), (3L, "a"), (4L, "b"))
      .toDF("bk", "it")
    val out = EventAnalytics.itemsetPairs(df, "bk", "it")
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) ->
        ((r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(out(("a", "b")) == ((2L, 0.5, math.rint(2.0 / 3 * 1e9) / 1e9,
      math.rint(2.0 * 4 / 9 * 1e9) / 1e9)))
    assert(out(("b", "a")) == out(("a", "b")),
      "pair metrics symmetric when n_a == n_b")
    assert(out(("c", "a"))._4 == math.rint(1.0 * 4 / 3 * 1e9) / 1e9)
    // minBaskets prunes
    val pruned = EventAnalytics.itemsetPairs(df, "bk", "it", minBaskets = 2)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b"))).toSet
    assert(pruned == Set(("a", "b"), ("b", "a")))
    // a basket wider than the cap fails loudly
    val wide = (1 to 20).map(i => (9L, s"i$i")).toDF("bk", "it")
    intercept[IllegalArgumentException] {
      EventAnalytics.itemsetPairs(wide, "bk", "it", maxBasketItems = 10)
    }
    // empty and all-null inputs return the empty pair table (max-width
    // over zero baskets is null — must not NPE out of the width guard)
    assert(EventAnalytics.itemsetPairs(
      df.filter(lit(false)), "bk", "it").count() == 0L)
    val allNull = Seq((null.asInstanceOf[java.lang.Long], "a"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[String]))
      .toDF("bk", "it")
    assert(EventAnalytics.itemsetPairs(allNull, "bk", "it").count() == 0L)
  }

  test("ivf persistence and incremental assignment") {
    import graft.ops.Ivf
    def fakeVec(id: Long, dim: Int): Seq[Double] =
      Seq.tabulate(dim) { j =>
        val h = (id * 2654435761L + j * 40503L) & 0xffffL
        h.toDouble / 0xffff.toDouble - 0.5
      }
    val dim = 16
    val df = (0L until 300L).map(id => (id, fakeVec(id, dim)))
      .toDF("id", "v")
    val index = Ivf.build(df, "id", "v", nLists = 4, seed = 7)
    // incremental assignment of the SAME vectors reproduces the index's
    // own cells (same centroids, same argmin)
    val re = Ivf.assign(index.centroids, df, "id", "v")
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = index.assigned.select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re == orig, "re-assignment must match the fitted index")
    // assignment plan is a narrow map
    val plan = Ivf.assign(index.centroids, df, "id", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    // save/load round-trip: identical centroids and identical search
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf")
    try {
      val path = tmp.resolve("ix").toString
      Ivf.save(index, path)
      val loaded = Ivf.load(spark, path)
      assert(loaded.centroids.map(_.toSeq).toSeq ==
        index.centroids.map(_.toSeq).toSeq)
      def run(ix: Ivf.Index) =
        Ivf.search(ix, col("id") < 5, k = 10, nProbe = 2)
          .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
            r.getAs[Long]("nid"))).sorted.toSeq
      assert(run(loaded) == run(index),
        "reloaded index must search identically")
    } finally graft.core.Fs.deleteRecursively(tmp)
  }

  test("pareto front 2-D: dominance, ties, co-optimal duplicates, nulls") {
    import graft.ops.Skyline
    val df = Seq(
      (1L, Some(10.0), 1.0), // front (highest x)
      (2L, Some(8.0), 5.0),  // front
      (3L, Some(8.0), 4.0),  // dominated by 2 (equal x, lower y)
      (4L, Some(6.0), 5.0),  // dominated by 2 (lower x, equal y)
      (5L, Some(5.0), 9.0),  // front
      (6L, Some(5.0), 9.0),  // co-optimal duplicate of 5 -> also front
      (7L, Some(4.0), 9.0),  // dominated by 5
      (8L, Some(1.0), 10.0), // front
      (9L, None, 99.0)       // null criterion: incomparable, excluded
    ).toDF("id", "x", "y")
    val got = Skyline.paretoFront2D(df, "x", "y")
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(got == Seq(1L, 2L, 5L, 6L, 8L))
    // partitioning invariance of the offset pass
    val rep = Skyline.paretoFront2D(df.repartition(7), "x", "y")
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(rep == got)
    // NaN criteria are incomparable like null — excluded, never allowed
    // to poison the running max (Spark max() puts NaN above every
    // double; unchecked, one NaN y drops every lower-x front row)
    val withNaN = df.unionByName(
      Seq((10L, Some(7.0), Double.NaN), (11L, Some(Double.NaN), 3.0))
        .toDF("id", "x", "y"))
    val nanGot = Skyline.paretoFront2D(withNaN, "x", "y")
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(nanGot == got, "NaN rows must not change the front")
  }

  test("equal-frequency bins: tie cohesion, null pass-through, invariance") {
    import graft.transform.Standardize
    // 8 values, k=4 -> 2 per bin; the four 5.0 ties must SHARE a bin
    // even though a row-rank split would put them in two
    val df = Seq(1.0, 2.0, 5.0, 5.0, 5.0, 5.0, 9.0, 10.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, Some(v)) }
      .toDF("id", "x")
      .unionByName(Seq((99L, None: Option[Double])).toDF("id", "x"))
    val out = Standardize.discretizeEqualFreq(df, "x", 4)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("bin")).map(_.asInstanceOf[Long])).toMap
    assert(out(99L).isEmpty, "null value -> null bin, row kept")
    // below counts: 1.0->0, 2.0->1, 5.0->2, 9.0->6, 10.0->7; k/n = 4/8
    assert(out(0L) == Some(0L) && out(1L) == Some(0L))
    assert((2L to 5L).forall(out(_) == Some(1L)), "ties share bin 1")
    assert(out(6L) == Some(3L) && out(7L) == Some(3L))
    // partitioning invariance of the offset pass
    val rep = Standardize.discretizeEqualFreq(df.repartition(5), "x", 4)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("bin")).map(_.asInstanceOf[Long])).toMap
    assert(rep == out)
    // all-null input: null bins, no division by zero
    val nn = Standardize.discretizeEqualFreq(
      df.filter(col("x").isNull), "x", 4).collect()
    assert(nn.length == 1 && nn.head.isNullAt(nn.head.fieldIndex("bin")))
    // NaN excluded like null (Spark's EqualTo has NaN = NaN true, so an
    // unfiltered NaN would join back to the TOP bin): null bin, and the
    // real values bin exactly as without it
    val withNaN = df.unionByName(
      Seq((98L, Some(Double.NaN))).toDF("id", "x"))
    val nanOut = Standardize.discretizeEqualFreq(withNaN, "x", 4)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("bin")).map(_.asInstanceOf[Long])).toMap
    assert(nanOut(98L).isEmpty, "NaN value -> null bin, row kept")
    assert(out.forall { case (id, b) => nanOut(id) == b },
      "a NaN row must not shift any real value's bin")
  }

  test("fingerprint: invariance, sensitivity, multiplicity, schema digest") {
    import graft.catalog.Fingerprint
    val df = Seq((1L, "a"), (2L, "b"), (3L, null)).toDF("id", "s")
    val cols = Seq("id", "s")
    def dig(d: org.apache.spark.sql.DataFrame) =
      Fingerprint.contentDigest(d, cols).head()
        .getAs[Long]("content_digest")
    // the emission is BIGINT (one physical encoding everywhere), equal
    // in value to the overflow-free decimal fold
    val out = Fingerprint.contentDigest(df, cols)
    assert(out.schema("content_digest").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(Fingerprint.contentDigestExact(df, cols).head()
      .getAs[java.math.BigDecimal]("content_digest").longValueExact() ==
      out.head().getAs[Long]("content_digest"))
    val base = dig(df)
    assert(dig(df.repartition(5)) == base, "partitioning-invariant")
    assert(dig(df.orderBy(col("id").desc)) == base, "order-invariant")
    assert(dig(df.filter(col("id") =!= 2)) != base, "row drop moves it")
    // duplicate multiplicity counts (a sum fold, not xor)
    assert(dig(df.unionAll(df.filter(col("id") === 1))) != base)
    // null cell is distinct from the literal sentinel string? No —
    // documented: null renders AS the sentinel, so a real "<NULL>"
    // string collides by design (declare digests on typed columns).
    val e = Seq((3L, "<NULL>")).toDF("id", "s")
    assert(dig(df.filter(col("id") === 3)) == dig(e))
    // changed(): digest pre-check in front of row-level diff
    val ch = Fingerprint.changed(df, df.filter(col("id") =!= 2), cols)
      .head()
    assert(ch.getAs[Boolean]("changed"))
    val same = Fingerprint.changed(df, df.repartition(3), cols).head()
    assert(!same.getAs[Boolean]("changed"))
    // schema digest moves on rename and type change, not on data
    val (n1, s1) = Fingerprint.schemaDigest(df)
    assert(n1 == 2)
    assert(Fingerprint.schemaDigest(df.filter(col("id") === 1)) == ((n1, s1)))
    assert(Fingerprint.schemaDigest(df.withColumnRenamed("s", "t"))._2 != s1)
    assert(Fingerprint.schemaDigest(
      df.withColumn("id", col("id").cast("int")))._2 != s1)
    // double measures digest through the fixed-scale decimal rendering:
    // sensitive AT the scale, invariant BELOW it (sub-scale noise is
    // representation, not content), loud on an undeclared scale key
    val dd = Seq((1L, 1.25), (2L, 3.5)).toDF("id", "m")
    val dcols = Seq("id", "m")
    def ddig(d: org.apache.spark.sql.DataFrame) =
      Fingerprint.contentDigest(d, dcols, Map("m" -> 2)).head()
        .getAs[Long]("content_digest")
    val dbase = ddig(dd)
    assert(ddig(dd.withColumn("m",
      when(col("id") === 1, 1.26).otherwise(col("m")))) != dbase,
      "a one-cent edit moves the scale-2 digest")
    assert(ddig(dd.withColumn("m",
      when(col("id") === 1, 1.250000001).otherwise(col("m")))) == dbase,
      "sub-scale noise does not move the scale-2 digest")
    intercept[IllegalArgumentException] {
      Fingerprint.contentDigest(dd, dcols, Map("nope" -> 2))
    }
  }

  test("expectations: tolerance boundary, empty table, loud dup ids") {
    import graft.stats.Expectations
    import graft.stats.Expectations._
    val df = Seq(("a", 1), ("b", 2), (null, 3), (null, 4), ("e", 5))
      .toDF("s", "x")
    // 2/5 nulls: maxFrac 0.4 passes AT the boundary (<=), 0.39 fails
    val out = Expectations.run(df, Seq(
      NotNull("at", "s", maxFrac = 0.4),
      NotNull("below", "s", maxFrac = 0.39),
      InRange("rng", "x", 1, 4, maxFrac = 0.2)))
      .collect().map(r => r.getAs[String]("check_id") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))).toMap
    assert(out("at") == ((2L, true)), "boundary is inclusive")
    assert(out("below") == ((2L, false)))
    assert(out("rng") == ((1L, true)))
    // empty table: zero violations, every fraction check passes
    val empty = df.filter(lit(false))
    val eo = Expectations.run(empty,
      Seq(NotNull("nn", "s"), Unique("uq", Seq("s"))))
      .collect().map(r => r.getAs[String]("check_id") ->
        r.getAs[Boolean]("passed")).toMap
    assert(eo("nn") && eo("uq"), "empty table validates clean")
    // duplicate check ids are a spec bug -> loud
    intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(NotNull("x", "s"), NotNull("x", "s")))
    }
    // a non-null value that doesn't cast to a number IS a range
    // violation — a garbage string column must not report passed=true
    // on a numeric contract (and must not abort the suite under ANSI)
    val garbage = Seq("1.5", "oops", null, "2.0", "NaN-ish")
      .toDF("v")
    val go = Expectations.run(garbage, Seq(InRange("rng", "v", 0, 10)))
      .collect().head
    assert(go.getAs[Long]("n_violations") == 2L,
      "non-castable non-null cells count as range violations")
    assert(!go.getAs[Boolean]("passed"))
  }

  test("ewma daily counts: adjusted weights renormalize over gaps") {
    import graft.ops.EventAnalytics
    // day 0: 10 events, day 1: 20, day 3: 40 (day 2 is a GAP)
    val rows =
      (1 to 10).map(i => (f"1970-01-01 00:00:${i % 60}%02d", i)) ++
        (1 to 20).map(i => (f"1970-01-02 03:00:${i % 60}%02d", i)) ++
        (1 to 40).map(i => (f"1970-01-04 05:00:${i % 60}%02d", i))
    val ev = rows.toDF("tss", "n")
      .select(col("tss").cast("timestamp").as("ts"))
    val out = EventAnalytics.ewmaDailyCounts(ev, alpha = 0.5, horizon = 4)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    // adjusted EWMA with w = [1, .5, .25, .125], renormalized over the
    // PRESENT lags only (day 2 contributes nothing, not a zero)
    assert(out.keySet == Set(0L, 1L, 3L), "gap day emits no row")
    assert(out(0L) == ((10L, 10.0)))
    assert(out(1L)._2 == math.rint((20.0 + 10 * 0.5) / 1.5 * 1e9) / 1e9)
    assert(out(3L)._2 ==
      math.rint((40.0 + 20 * 0.25 + 10 * 0.125) / 1.375 * 1e9) / 1e9)
  }

  test("sequence pairs: precedence counts, ties count neither, width cap") {
    import graft.ops.EventAnalytics
    // user 1: a@1, b@3, c@5 ; user 2: b@1, a@2 ; user 3: a@4, b@4 (TIE)
    val ev = Seq(
      (1L, "1970-01-01 00:00:01", "a"), (1L, "1970-01-01 00:00:03", "b"),
      (1L, "1970-01-01 00:00:05", "c"), (1L, "1970-01-01 00:00:09", "a"),
      (2L, "1970-01-01 00:00:01", "b"), (2L, "1970-01-01 00:00:02", "a"),
      (3L, "1970-01-01 00:00:04", "a"), (3L, "1970-01-01 00:00:04", "b"))
      .toDF("id", "tss", "t")
      .select(col("id"), col("tss").cast("timestamp").as("ts"), col("t"))
    val out = EventAnalytics.sequencePairs(ev, "id", "ts", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (a,b): users 1,2,3 have both; a first only for user 1 (user 3 tied)
    assert(out(("a", "b")) == ((3L, 1L)))
    assert(out(("b", "a")) == ((3L, 1L))) // b first for user 2 only
    assert(out(("a", "c")) == ((1L, 1L)))
    assert(out(("c", "a")) == ((1L, 0L)))
    // repeated a@9 for user 1 must not shift the FIRST occurrence
    intercept[IllegalArgumentException] {
      EventAnalytics.sequencePairs(ev, "id", "ts", "t", maxTypes = 2)
    }
  }

  test("brown linear: flat series has zero trend, planted ramp is tracked") {
    import graft.ops.EventAnalytics
    // flat: 10 events every day for 8 days -> s1 = s2 = 10, trend = 0
    val flat = (0 until 8).flatMap(d =>
      (1 to 10).map(i => f"1970-01-0${d + 1}%d 00:00:${i % 60}%02d"))
      .toDF("tss").select(col("tss").cast("timestamp").as("ts"))
    val rf = EventAnalytics.brownLinearDaily(flat, alpha = 0.5, horizon = 4)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(rf(7L).getAs[Double]("s1") == 10.0)
    assert(rf(7L).getAs[Double]("s2") == 10.0)
    assert(rf(7L).getAs[Double]("trend") == 0.0)
    assert(rf(7L).getAs[Double]("level") == 10.0)
    assert(rf(7L).getAs[Double]("forecast_1") == 10.0)
    // ramp: day d has 10*(d+1) events -> trend positive, forecast above
    // the current level, and level lags below the true current count
    // less than s1 does (Brown's double smoothing un-lags the level)
    val ramp = (0 until 8).flatMap(d =>
      (1 to 10 * (d + 1)).map(i =>
        f"1970-01-0${d + 1}%d 00:00:${i % 60}%02d"))
      .toDF("tss").select(col("tss").cast("timestamp").as("ts"))
    val rr = EventAnalytics.brownLinearDaily(ramp, alpha = 0.5, horizon = 4)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    val last = rr(7L)
    assert(last.getAs[Double]("trend") > 0.0, "ramp trend must be positive")
    assert(last.getAs[Double]("forecast_1") > last.getAs[Double]("level"))
    assert(last.getAs[Double]("level") > last.getAs[Double]("s1"),
      "double smoothing must un-lag the level on a ramp")
  }

  test("capture-recapture: hand Chapman estimate, clamped CI, guards") {
    import graft.ops.Dedup
    def ids(xs: Seq[Int]) = xs.toDF("id")
    // nA=10, nB=8, m=4: est = 11*9/5 - 1 = 18.8,
    // var = 11*9*6*4/(25*6) = 15.84
    val r = Dedup.captureRecapture(
      ids(1 to 10), ids((7 to 14)), "id").head()
    assert(r.getAs[Long]("n_a") == 10 && r.getAs[Long]("n_b") == 8 &&
      r.getAs[Long]("n_overlap") == 4)
    assert(r.getAs[Double]("est_total") == 18.8)
    val se = math.sqrt(15.84)
    val z = graft.stats.Experiment.zQuantile(0.975)
    assert(r.getAs[Double]("ci_hi") ==
      BigDecimal(18.8 + z * se).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the lower bound never dips below the larger capture (total >=
    // every capture by construction)
    assert(r.getAs[Double]("ci_lo") >= 10.0)
    // duplicate detector rows collapse (captures are SETS of ids)
    val dup = Dedup.captureRecapture(
      ids(Seq(1, 1, 2, 2, 3)), ids(Seq(2, 3, 3, 4)), "id").head()
    assert(dup.getAs[Long]("n_a") == 3 && dup.getAs[Long]("n_b") == 3 &&
      dup.getAs[Long]("n_overlap") == 2)
    intercept[IllegalArgumentException] { // disjoint detectors
      Dedup.captureRecapture(ids(1 to 5), ids(6 to 9), "id")
    }
    intercept[IllegalArgumentException] { // empty detector
      Dedup.captureRecapture(ids(Seq.empty[Int]), ids(1 to 3), "id")
    }
  }

  test("survivorship: rule semantics, ties, all-null attributes") {
    import graft.ops.Survivorship._
    val df = Seq(
      // cluster 1: names tie on length -> lexicographically larger wins;
      // majority ties 2-2 -> larger value; latest ts wins nation
      (1L, "anna", 10.0, "A", 3L, Some(7)),
      (1L, "annz", -5.0, "B", 1L, Some(9)),
      (1L, "al", 2.0, "A", 2L, Some(8)),
      (1L, "be", 99.0, "B", 4L, None), // null nation at the LATEST ts: skipped
      // cluster 2: all-null majority column
      (2L, "x", 1.0, null, 1L, Some(5))
    ).toDF("cl", "name", "bal", "seg", "ts", "nat")
    val out = goldenRecords(df, "cl", Map(
      "name" -> LongestString, "bal" -> MaxValue, "seg" -> Majority,
      "nat" -> Latest("ts"))).collect()
      .map(r => r.getAs[Long]("cluster") -> r).toMap
    val c1 = out(1L)
    assert(c1.getAs[Long]("n_records") == 4)
    assert(c1.getAs[String]("name") == "annz", "length tie -> larger value")
    assert(c1.getAs[Double]("bal") == 99.0)
    assert(c1.getAs[String]("seg") == "B", "majority tie -> larger value")
    assert(c1.getAs[Int]("nat") == 7,
      "latest NON-NULL value wins (ts=3); the null-at-ts-4 row never does")
    val c2 = out(2L)
    assert(c2.getAs[String]("seg") == null, "all-null majority stays null")
  }

  test("stride interleaving: exact virtual times, cadence, loud unknowns") {
    import graft.ops.Sampling
    val rows = (1L to 8L).map(i => (i, if (i <= 6) "a" else "b"))
    val df = rows.toDF("id", "d")
    val out = Sampling.interleaveByWeight(df, Seq("id"), "d",
      Map("a" -> 0.5, "b" -> 0.25)).collect()
    // vt for domain a: (r-0.5)/0.5 = 2r-1 = 1,3,5,7,9,11
    // vt for domain b: (r-0.5)/0.25 = 4r-2 = 2,6
    val vts = out.map(r => (r.getAs[String]("d"), r.getAs[Double]("vt")))
    assert(vts.take(4).toSeq ==
      Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("a", 5.0)))
    // cadence: domain a appears twice per b in the steady stream
    assert(vts.map(_._1).take(6).count(_ == "a") == 4)
    // a domain with no weight fails loudly, never defaults
    val bad = Seq((1L, "a"), (2L, "zzz")).toDF("id", "d")
    val e = intercept[Exception] {
      Sampling.interleaveByWeight(bad, Seq("id"), "d", Map("a" -> 0.5))
        .collect()
    }
    assert(e.getMessage.contains("no weight for domain"))
  }

  test("greedy max-cover: hand-computed picks, ties, early exhaustion") {
    import graft.ops.Coverage
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")), // 4 distinct -> first pick
      (2L, Seq("a", "b", "c")),      // subset of 1 -> gain 0 after pick 1
      (3L, Seq("e", "f")),           // 2 new -> second pick
      (4L, Seq("d", "e")),           // fully covered after picks 1+3
      (5L, Seq("g")),                // 1 new -> third pick
      (6L, Seq.empty[String])        // no features at all
    ).toDF("doc_id", "f")
    val picks = Coverage.greedyMaxCover(docs, "doc_id", "f", k = 10)
    // greedy: doc1 (4), doc3 (2), doc5 (1), then EVERYTHING is covered ->
    // early stop at 3 picks even though k=10
    assert(picks.map(p => (p.rank, p.id, p.gain, p.coveredTotal)) == Seq(
      (0, 1L, 4L, 4L), (1, 3L, 2L, 6L), (2, 5L, 1L, 7L)))
    // tie on gain breaks to the smaller id
    val tied = Seq((7L, Seq("x", "y")), (3L, Seq("p", "q"))).toDF("doc_id", "f")
    assert(Coverage.greedyMaxCover(tied, "doc_id", "f", 1).head.id == 3L)
  }

  test("semantic decontamination: threshold, null vectors, empty benchmark") {
    import graft.ops.Decontaminate
    val corpus = Seq(
      (1L, Some(Seq(1.0, 0.0))),   // cos 1.0 vs bench -> contaminated
      (2L, Some(Seq(0.0, 1.0))),   // cos 0.0 -> clean
      (3L, None),                  // unjudgeable -> null verdict, KEPT
      (4L, Some(Seq(0.9, 0.1)))    // high cos -> contaminated
    ).toDF("id", "v")
    val bench = Seq(Tuple1(Some(Seq(1.0, 0.0)))).toDF("bv")
    val out = Decontaminate.semanticOverlap(corpus, "id", "v", bench, "bv",
      threshold = 0.7).collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[Any]("max_cos")),
          Option(r.getAs[Any]("contaminated"))))).toMap
    assert(out(1L)._2 == Some(true))
    assert(out(2L)._2 == Some(false))
    assert(out(3L) == ((None, None)), "null vector must report null verdict")
    assert(out(4L)._2 == Some(true))
    val kept = Decontaminate.semanticClean(corpus, "id", "v", bench, "bv",
      threshold = 0.7).collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(kept == Seq(2L, 3L), "clean set keeps low-cos AND unjudgeable")
    // empty benchmark: nothing to leak, every judgeable doc is clean
    val emptyBench = bench.filter(lit(false))
    val out2 = Decontaminate.semanticOverlap(corpus, "id", "v",
      emptyBench, "bv", threshold = 0.7).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("contaminated")))
      .toMap
    assert(out2(1L) == Some(false) && out2(3L).isEmpty)
  }

  test("corpus divergence: driver reference, identity zero, JS symmetry and bound") {
    import graft.ops.CorpusOverlap
    val a = Seq("aaa bbb", "aaa").toDF("text")
    val b = Seq("aaa ccc ccc").toDF("text")
    val r = CorpusOverlap.divergence(a, "text", b, "text").collect().head
    // union vocab {aaa,bbb,ccc}: Na=3, Nb=3, V=3
    // pa = (2+1)/6, (1+1)/6, (0+1)/6 ; pb = (1+1)/6, (0+1)/6, (2+1)/6
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val pa = Seq(3.0 / 6, 2.0 / 6, 1.0 / 6)
    val pb = Seq(2.0 / 6, 1.0 / 6, 3.0 / 6)
    val klAb = pa.zip(pb).map { case (x, y) => r9(x * math.log(x / y)) }.sum
    assert(math.abs(r.getAs[Double]("kl_ab") - klAb) < 1e-7)
    assert(r.getAs[Long]("vocab") == 3 && r.getAs[Long]("tokens_a") == 3)
    val js = r.getAs[Double]("js")
    assert(js > 0 && js <= math.log(2.0))
    // JS is symmetric
    val r2 = CorpusOverlap.divergence(b, "text", a, "text").collect().head
    assert(math.abs(r2.getAs[Double]("js") - js) < 1e-9)
    assert(math.abs(r2.getAs[Double]("kl_ab") - r.getAs[Double]("kl_ba")) < 1e-9)
    // identical corpora: every term is exactly 0
    val same = CorpusOverlap.divergence(a, "text", a, "text").collect().head
    assert(same.getAs[Double]("kl_ab") == 0.0 &&
      same.getAs[Double]("js") == 0.0)
    // disjoint vocabularies stay finite thanks to smoothing
    val disj = CorpusOverlap.divergence(
      Seq("xxx yyy").toDF("text"), "text",
      Seq("zzz www").toDF("text"), "text").collect().head
    assert(!disj.getAs[Double]("kl_ab").isNaN &&
      !disj.getAs[Double]("kl_ab").isInfinite)
  }

  test("winnowing: driver reference, shared-substring guarantee, density, boundary docs") {
    import graft.ops.Winnow
    val common = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"AAAA $common BBBB padding text here to extend"),
      (2L, s"XXXX yyyy zzzz $common QQQQ totally different tail"),
      (3L, "completely unrelated content with nothing shared at all"),
      (4L, "short"), // < k: no grams
      (5L, "exactly12ch"), // 12 chars -> 5 grams < w: single window
      (6L, "emoji 😀 inside the text keeps gram offsets in code points"))
    val df = docs.toDF("doc_id", "text")
    val (k, w) = (8, 8)
    val fps = Winnow.fingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"),
        r.getAs[Int]("p")))
    // driver reference: independent winnowing over CODE POINTS (an astral
    // char is one gram position, not two UTF-16 units)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(g: String): Long = java.lang.Long.parseLong(
      md.digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    def winnowRef(t: String): Set[(Long, Int)] = {
      val cps = t.codePoints().toArray
      def gram(p: Int) = new String(cps, p, k)
      val grams = (0 to cps.length - k).map(p => (h(gram(p)), p))
      if (grams.isEmpty) Set.empty
      else (0 to math.max(grams.length - w, 0)).map { s =>
        grams.slice(s, s + w).minBy { case (hh, p) => (hh, -p) }
      }.toSet
    }
    docs.foreach { case (id, t) =>
      val got = fps.filter(_._1 == id).map(x => (x._2, x._3)).toSet
      assert(got == winnowRef(t), s"doc $id fingerprint mismatch")
    }
    assert(!fps.exists(_._1 == 4L), "sub-k doc must emit nothing")
    assert(fps.count(_._1 == 5L) == 1, "sub-w doc gets one window's min")
    // the winnowing guarantee: a shared run of >= k+w-1 chars shares a print
    val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val h3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((h1 & h2).nonEmpty, "docs sharing a 49-char run must share a print")
    assert((h1 & h3).isEmpty && (h2 & h3).isEmpty, "unrelated doc pairs clean")
    // density ~ 2/(w+1): selected prints well below the gram count
    val doc1Grams = docs.head._2.length - k + 1
    assert(fps.count(_._1 == 1L) < doc1Grams / 2)
    // pairs surface the overlapping pair only
    val pairs = Winnow.overlapPairs(
      Winnow.fingerprints(df, "doc_id", "text", k, w), "doc_id",
      minShared = 1, maxPostings = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("mmr rerank: diversifies duplicates, lambda=1 is cosine order, driver parity") {
    // q points at a; a2 is a's near-duplicate; b is a different direction
    val rows = Seq(
      (100L, Seq(1.0, 0.0, 0.1, 0.0)),      // query
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),        // a
      (2L, Seq(0.999, 0.001, 0.0, 0.0)),    // a' (near-dup of a)
      (3L, Seq(0.2, 1.0, 0.0, 0.0)),        // b
      (4L, Seq(0.1, 0.0, 1.0, 0.0)))        // c
    val df = rows.toDF("id", "v")
    def picks(lambda: Double) =
      Similarity.mmrRerank(df, "id", "v", col("id") === 100L,
          k = 3, lambda = lambda, shortlist = 4)
        .orderBy("sel_rank").select("nid").as[Long].collect().toSeq
    assert(picks(1.0).take(2) == Seq(1L, 2L),
      "lambda=1 must reduce to plain cosine order (dup right behind)")
    val diverse = picks(0.5)
    assert(diverse.head == 1L)
    assert(diverse(1) != 2L,
      s"lambda=0.5 must push the near-duplicate down, got $diverse")
    assert(diverse.toSet.size == 3)

    // independent driver greedy on pseudo-random vectors
    val rnd = (0L until 30L).map { id =>
      (id, Seq.tabulate(6)(j => ((id * 31 + j * 17) % 23).toDouble / 23.0))
    }
    val q = rnd.head._2.toArray
    val cands = rnd.tail.map { case (id, v) => (id, v.toArray) }
    def cosD(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val lambda = 0.7
    var sel = Vector.empty[Long]
    var rem = cands.sortBy(_._1)
    for (step <- 0 until 5) {
      val best = rem.map { case (id, v) =>
        val pen = if (step == 0) 0.0
          else sel.map(s => cosD(v, cands.find(_._1 == s).get._2)).max
        (id, lambda * cosD(q, v) - (1 - lambda) * pen)
      }.maxBy { case (id, s) => (s, -id) }
      sel :+= best._1
      rem = rem.filterNot(_._1 == best._1)
    }
    val got = Similarity.mmrRerank(rnd.toDF("id", "v"), "id", "v",
        col("id") === 0L, k = 5, lambda = lambda, shortlist = 29)
      .orderBy("sel_rank").select("nid").as[Long].collect().toSeq
    assert(got == sel, s"engine $got vs driver greedy $sel")
  }

  test("script profile: dominance order, none bucket, digit neutrality, nulls") {
    val rows = Seq(
      (1L, Some("hello world")),            // latin
      (2L, Some("привет hello")),           // tie 6 cyr vs 5 latin -> latin first? no: 6 > 5
      (3L, Some("абвгд abcde")),            // exact 5-5 tie -> latin (first in order)
      (4L, Some("12345 !!!")),              // digits only -> none (digit never dominates)
      (5L, Some("...")),                    // nothing -> none
      (6L, None))                           // null text -> null profile
    val out = TextOps.scriptProfile(rows.toDF("doc_id", "t"), "t")
      .select("doc_id", "sc_latin", "sc_cyrillic", "sc_digit",
        "dominant_script")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("dominant_script") == "latin")
    assert(out(2L).getAs[String]("dominant_script") == "cyrillic")
    assert(out(2L).getAs[Int]("sc_cyrillic") == 6 &&
      out(2L).getAs[Int]("sc_latin") == 5)
    assert(out(3L).getAs[String]("dominant_script") == "latin",
      "exact ties resolve to the first bucket in declaration order")
    assert(out(4L).getAs[String]("dominant_script") == "none",
      "digits are script-neutral and must not dominate")
    assert(out(4L).getAs[Int]("sc_digit") == 5)
    assert(out(5L).getAs[String]("dominant_script") == "none")
    assert(out(6L).isNullAt(out(6L).fieldIndex("dominant_script")))
    assert(out(6L).isNullAt(out(6L).fieldIndex("sc_latin")))
  }

  test("cross-doc dup-ngram fraction: shared boilerplate scores, originals don't") {
    import graft.ops.CrossDocNgrams
    val docs = Seq(
      (1L, "subscribe to our newsletter today and original one here"),
      (2L, "subscribe to our newsletter today plus unrelated words entirely"),
      (3L, "completely unique prose nothing shared anywhere at all"),
      (4L, "too short"), // < 3 words: no 3-grams
      (5L, "")).toDF("doc_id", "text")
    val out = CrossDocNgrams.dupNgramFraction(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 1 and 2 share exactly the 3 shingles of the 5-word prefix
    // "subscribe to our newsletter today"; doc 1 (9 words) has 7 3-grams
    assert(out(1L).getAs[Long]("n_ngrams") == 7L)
    assert(out(1L).getAs[Double]("dup_frac") == 0.428571)
    assert(out(3L).getAs[Double]("dup_frac") == 0.0)
    assert(out(4L).getAs[Long]("n_ngrams") == 0L &&
      out(4L).isNullAt(out(4L).fieldIndex("dup_frac")))
    assert(out(5L).getAs[Long]("n_ngrams") == 0L)
    // the df table itself: the shared shingles carry df = 2
    val dfs = CrossDocNgrams.documentFrequencies(docs, "doc_id", "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs("subscribe to our") == 2L)
    assert(dfs("completely unique prose") == 1L)
  }

  test("isotropy: centered cloud ~ 0, collapsed cloud ~ 1, hand ratio") {
    import graft.ops.EmbeddingDrift
    // symmetric pairs around the origin: mu = 0 exactly
    val centered = Seq(Array(1.0, 0.0), Array(-1.0, 0.0),
      Array(0.0, 2.0), Array(0.0, -2.0)).map(Tuple1(_)).toDF("e")
    val c = EmbeddingDrift.isotropy(centered, "e").head()
    assert(c.getAs[Double]("anisotropy") == 0.0 &&
      c.getAs[Long]("dim") == 2L, s"$c")
    // every vector identical: mu = x, ratio exactly 1
    val collapsed = (1 to 5).map(_ => Tuple1(Array(3.0, 4.0))).toDF("e")
    val k = EmbeddingDrift.isotropy(collapsed, "e").head()
    assert(k.getAs[Double]("anisotropy") == 1.0 &&
      k.getAs[Double]("mean_sq_norm") == 25.0)
    // hand ratio: {(2,0), (0,0)}: mu=(1,0) -> 1 / (4/2) = 0.5
    val hand = Seq(Array(2.0, 0.0), Array(0.0, 0.0)).map(Tuple1(_))
      .toDF("e")
    assert(EmbeddingDrift.isotropy(hand, "e").head()
      .getAs[Double]("anisotropy") == 0.5)
    intercept[IllegalArgumentException] {
      EmbeddingDrift.isotropy(
        Seq(Tuple1(Array(0.0, 0.0))).toDF("e"), "e")
    }
  }

  test("twoNN intrinsic dimension: hand geometric line, duplicates, caps") {
    import graft.ops.EmbeddingDrift
    // 1-d points at 1,2,4,8,16,32 (as 2-d vectors): hand (r1,r2) pairs
    // are (1,3),(1,2),(2,3),(4,6),(8,12),(16,24) -> squared ratios
    // 9, 4, 2.25, 2.25, 2.25, 2.25
    val line = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0).zipWithIndex
      .map { case (x, i) => (i.toLong, Array(x, 0.0)) }.toDF("id", "e")
    val r = EmbeddingDrift.intrinsicDimension(line, "id", "e").head()
    def t9(ratio: Double) = BigDecimal(math.log(ratio) * 0.5)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val slnmu = (t9(9.0) + t9(4.0) + t9(2.25) * 4).toDouble
    val dWant = BigDecimal(6.0 / slnmu)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_used") == 6L &&
      r.getAs[Double]("intrinsic_dim") == dWant, s"$r want $dWant")
    // exact duplicates have r1 = 0 and are excluded from the estimate
    val dup = Seq((1L, Array(0.0, 0.0)), (2L, Array(0.0, 0.0)),
      (3L, Array(5.0, 0.0)), (4L, Array(6.0, 0.0))).toDF("id", "e")
    val d = EmbeddingDrift.intrinsicDimension(dup, "id", "e").head()
    assert(d.getAs[Long]("n_vectors") == 4L && d.getAs[Long]("n_used") == 2L,
      s"$d")
    // over the brute-force cap -> loud with the IVF remedy
    val ex = intercept[IllegalArgumentException] {
      EmbeddingDrift.intrinsicDimension(line, "id", "e", maxVectors = 3L)
    }
    assert(ex.getMessage.contains("IVF"), ex.getMessage)
  }

  test("forecast backtest: perfect trend beats naive, metrics bounded") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    // a clean linear ramp: n(day d) = 10 + 2d events — Brown's trend
    // term locks on, so the model MAE beats the naive (always-2-off)
    // benchmark once warmed up
    val events = (0 until 60).flatMap { d =>
      (1 to (10 + 2 * d)).map(i =>
        Tuple1(new Timestamp((d * 86400L + i) * 1000L)))
    }.toDF("ts")
    val r = EventAnalytics.forecastBacktestDaily(events).head()
    assert(r.getAs[Long]("n_pairs") == 59L)
    val mase = r.getAs[Double]("mase")
    assert(mase > 0.0 && mase < 1.0,
      s"a trend-aware model must beat naive on a ramp: $r")
    val smape = r.getAs[Double]("smape")
    assert(smape >= 0.0 && smape <= 2.0)
  }

  test("embedding drift: identical snapshots are exact, known rotation lands") {
    import graft.ops.EmbeddingDrift
    val old = Seq((1L, "a", Array(1.0, 0.0)), (2L, "a", Array(1.0, 0.0)),
      (3L, "b", Array(0.0, 2.0))).toDF("id", "label", "v")
    val same = EmbeddingDrift.centroidDrift(old, old, "label", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(same("a").getAs[Double]("cosine") == 1.0 &&
      same("a").getAs[Double]("l2_shift") == 0.0)
    // rotate label a's centroid (1,0) -> (0,1): cosine 0, shift sqrt(2);
    // label b only in old -> inner join drops it
    val nw = Seq((1L, "a", Array(0.0, 1.0)), (2L, "a", Array(0.0, 1.0)))
      .toDF("id", "label", "v")
    val rot = EmbeddingDrift.centroidDrift(old, nw, "label", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rot.keySet == Set("a"))
    assert(rot("a").getAs[Double]("cosine") == 0.0)
    assert(math.abs(rot("a").getAs[Double]("l2_shift") - math.sqrt(2)) < 1e-6)
    // per-id displacement: id 3 dropped; id 1 rotated 90 degrees
    val disp = EmbeddingDrift.idDisplacement(old, nw, "id", "v")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(disp.keySet == Set(1L, 2L))
    assert(disp(1L).getAs[Double]("cosine") == 0.0)
    assert(math.abs(disp(1L).getAs[Double]("l2_shift") - math.sqrt(2)) < 1e-6)
  }

  test("curation funnel: every stage bites, canonicality is sequential") {
    import graft.ops.Curation
    val good = "the quick brown fox jumps over the lazy dog and runs far " * 3
    val junk = "x x x x x"  // tiny + repetitive: fails any quality floor
    val leaked = "this is the held out benchmark answer with many of " +
      "the original tokens for quality checks and it runs long enough " +
      "to pass every floor easily in practice"
    val docs = Seq(
      (1L, good + "alpha"),            // kept
      (2L, good + "alpha"),            // exact dup of 1 -> dropped
      (3L, junk),                      // quality-dropped
      (4L, good + "beta"),             // kept
      (5L, leaked),                    // contaminated -> dropped
      (6L, junk),                      // quality-dropped; dup family w/ 7
      (7L, junk)                       // both members fail: NO canonical
    ).toDF("doc_id", "text")
    val eval = Seq((100L, leaked)).toDF("doc_id", "text")
    val flags = Curation.stageFlags(docs, "doc_id", "text", eval, "text",
        minQuality = 0.3, maxContamination = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(flags(1L).getAs[Boolean]("kept"))
    assert(flags(2L).getAs[Boolean]("q_pass") &&
      !flags(2L).getAs[Boolean]("canonical"))
    assert(!flags(3L).getAs[Boolean]("q_pass"))
    assert(flags(4L).getAs[Boolean]("kept"))
    assert(flags(5L).getAs[Boolean]("q_pass") &&
      flags(5L).getAs[Boolean]("canonical") &&
      !flags(5L).getAs[Boolean]("clean"))
    // a duplicate family whose every member fails quality elects nobody
    assert(!flags(6L).getAs[Boolean]("canonical") &&
      !flags(7L).getAs[Boolean]("canonical"))
    val f = Curation.funnelReport(Curation.stageFlags(docs, "doc_id",
      "text", eval, "text", minQuality = 0.3, maxContamination = 0.2)).head()
    assert(f.getAs[Long]("n_input") == 7L)
    assert(f.getAs[Long]("n_quality") == 4L)  // 1,2,4,5
    assert(f.getAs[Long]("n_dedup") == 3L)    // 1,4,5
    assert(f.getAs[Long]("n_clean") == 2L)    // 1,4
    assert(f.getAs[Long]("tokens_kept") > 0L)
    // curate returns exactly the kept rows
    val kept = Curation.curate(docs, "doc_id", "text", eval, "text",
      minQuality = 0.3, maxContamination = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
    // sequential semantics: when the lowest-id family member fails
    // quality, the next PASSING member is canonical
    val docs2 = Seq((1L, junk + " padder"), (2L, good), (3L, good))
      .toDF("doc_id", "text")
    val fl2 = Curation.stageFlags(docs2, "doc_id", "text", eval, "text",
        minQuality = 0.3, maxContamination = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(fl2(2L).getAs[Boolean]("canonical") &&
      !fl2(3L).getAs[Boolean]("canonical"))
    // stage-1 rule verdicts (r16 item 6): a rule-failed doc is cut
    // FIRST (never canonical, never kept), a doc MISSING from the
    // verdict frame fails closed, and with no frame the stage passes
    // everything (rules_pass all true, funnel unchanged)
    val rules = Seq((1L, true), (2L, true), (3L, true), (4L, false),
      (5L, true), (6L, true)).toDF("id", "rules_pass") // 7 absent
    val fr = Curation.stageFlags(docs, "doc_id", "text", eval, "text",
        minQuality = 0.3, maxContamination = 0.2,
        ruleVerdicts = Some(rules))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!fr(4L).getAs[Boolean]("rules_pass") &&
      !fr(4L).getAs[Boolean]("canonical") && !fr(4L).getAs[Boolean]("kept"))
    assert(!fr(7L).getAs[Boolean]("rules_pass"), "absent id fails closed")
    assert(fr(1L).getAs[Boolean]("kept") && !fr(4L).getAs[Boolean]("kept"))
    val f2 = Curation.funnelReport(Curation.stageFlags(docs, "doc_id",
        "text", eval, "text", minQuality = 0.3, maxContamination = 0.2,
        ruleVerdicts = Some(rules))).head()
    assert(f2.getAs[Long]("n_rules") == 5L)   // 4 rule-cut, 7 absent
    assert(f2.getAs[Long]("n_quality") == 3L) // 1,2,5
    assert(f2.getAs[Long]("n_clean") == 1L)   // just 1
    assert(f.getAs[Long]("n_rules") == 7L)    // no frame: all pass
  }

  test("revenue attribution: last vs first touch, window expiry, direct") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600 * 1000L)
    // user 1: view@0, click@1, purchase@2 (10.00)
    //   last -> click; first (48h window) -> view
    // user 2: view@0, purchase@60h (5.00): touch outside 48h -> direct
    //   (both models — the last-touch exists but is stale)
    // user 3: purchase@1 (2.50) with no touches at all -> direct
    val events = Seq(
      (1L, ts(0), 10L, "view", 0.0), (1L, ts(1), 11L, "click", 0.0),
      (1L, ts(2), 12L, "purchase", 10.0),
      (2L, ts(0), 20L, "view", 0.0), (2L, ts(60), 21L, "purchase", 5.0),
      (3L, ts(1), 30L, "purchase", 2.5)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    def run(model: String) = EventAnalytics.attributeRevenue(events,
        Seq("view", "click"), "purchase", windowSeconds = 48 * 3600L,
        model = model)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_conversions"), r.getAs[Long]("revenue_cents")))
      .toMap
    val lastT = run("last")
    assert(lastT("click") == ((1L, 1000L)), s"last=$lastT")
    assert(lastT("direct") == ((2L, 750L)))
    assert(!lastT.contains("view"))
    val firstT = run("first")
    assert(firstT("view") == ((1L, 1000L)), s"first=$firstT")
    assert(firstT("direct") == ((2L, 750L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.attributeRevenue(events, Seq("view"), "purchase",
        48 * 3600L, model = "linear")
    }
  }

  test("ohlc bars: hand geometry, ts tie-break by id, single-event day") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(day: Int, h: Long) =
      new Timestamp((day * 24L + h) * 3600 * 1000L)
    val events = Seq(
      // day 0, key a: values 5, 9, 1, 3 in time order
      (10L, ts(0, 1), "a", 5.0), (11L, ts(0, 2), "a", 9.0),
      (12L, ts(0, 3), "a", 1.0), (13L, ts(0, 4), "a", 3.0),
      // day 0, key b: two events at the SAME ts — lower id wins open,
      // higher id wins close
      (21L, ts(0, 5), "b", 7.0), (20L, ts(0, 5), "b", 4.0),
      // day 1, key a: single event — open=high=low=close
      (30L, ts(1, 0), "a", 2.5)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventAnalytics.ohlcDaily(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    val a0 = out((0L, "a"))
    assert(a0.getAs[Double]("open") == 5.0 && a0.getAs[Double]("high") == 9.0
      && a0.getAs[Double]("low") == 1.0 && a0.getAs[Double]("close") == 3.0
      && a0.getAs[Long]("volume") == 4L
      && a0.getAs[Double]("total_value") == 18.0, s"$a0")
    val b0 = out((0L, "b"))
    assert(b0.getAs[Double]("open") == 4.0 &&
      b0.getAs[Double]("close") == 7.0, s"tie-break by id: $b0")
    val a1 = out((1L, "a"))
    assert(a1.getAs[Double]("open") == 2.5 && a1.getAs[Double]("high") == 2.5
      && a1.getAs[Double]("low") == 2.5 && a1.getAs[Double]("close") == 2.5
      && a1.getAs[Long]("volume") == 1L)
  }

  test("rfm scores: distinct quintiles land 1..5, recency reversed, nulls out") {
    import graft.ops.Segmentation
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400L * 1000L)
    // five customers with strictly distinct R, F, M so each owns a
    // quintile: recency 0/10/20/40/100 days, frequency 1..5, monetary
    // 10/50/300/400/5000
    val orders =
      Seq((1L, ts(100), 10.0)) ++
      Seq((2L, ts(90), 20.0), (2L, ts(85), 30.0)) ++
      (1 to 3).map(i => (3L, ts(80 - i), 100.0)) ++
      (1 to 4).map(i => (4L, ts(60 - i), 100.0)) ++
      (1 to 5).map(i => (5L, ts(0), 1000.0))
    val df = orders.toDF("cust", "odate", "amt")
      .unionAll(Seq((Option.empty[Long], Option(ts(1)), Option(9.0)),
        (Option(9L), Option.empty[Timestamp], Option(9.0)))
        .toDF("cust", "odate", "amt"))
    val out = Segmentation.rfmScores(df, "cust", "odate", "amt")
      .collect().map(r => r.getAs[Long]("cust") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "null rows excluded")
    def scores(c: Long) = {
      val r = out(c)
      (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
        r.getAs[Double]("monetary"), r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
    }
    assert(scores(1L) == ((0L, 1L, 10.0, 5, 1, 1)), s"${scores(1L)}")
    assert(scores(2L) == ((10L, 2L, 50.0, 4, 2, 2)))
    assert(scores(3L) == ((21L, 3L, 300.0, 3, 3, 3)))
    assert(scores(4L) == ((41L, 4L, 400.0, 2, 4, 4)))
    assert(scores(5L) == ((100L, 5L, 5000.0, 1, 5, 5)))
  }

  test("linear attribution: equal split, window expiry, direct fallback") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600 * 1000L)
    // user 1: view@0, click@1, purchase@2 (10.00) -> each touch gets
    //   half a conversion and 500 cents
    // user 2: view@0, purchase@60h (5.00): stale touch -> direct
    // user 3: purchase@1 (2.50), no touches -> direct
    val events = Seq(
      (1L, ts(0), 10L, "view", 0.0), (1L, ts(1), 11L, "click", 0.0),
      (1L, ts(2), 12L, "purchase", 10.0),
      (2L, ts(0), 20L, "view", 0.0), (2L, ts(60), 21L, "purchase", 5.0),
      (3L, ts(1), 30L, "purchase", 2.5)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = EventAnalytics.attributeRevenueLinear(events,
        Seq("view", "click"), "purchase", windowSeconds = 48 * 3600L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("conversions"), r.getAs[Double]("revenue_cents")))
      .toMap
    assert(out("view") == ((0.5, 500.0)), s"$out")
    assert(out("click") == ((0.5, 500.0)))
    assert(out("direct") == ((2.0, 750.0)))
    // three-way split keeps exact thirds at round-6
    val three = Seq(
      (9L, ts(0), 90L, "view", 0.0), (9L, ts(1), 91L, "click", 0.0),
      (9L, ts(2), 92L, "view", 0.0), (9L, ts(3), 93L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val t3 = EventAnalytics.attributeRevenueLinear(three,
        Seq("view", "click"), "purchase", windowSeconds = 48 * 3600L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("conversions"))
      .toMap
    assert(t3("view") == 0.666666 && t3("click") == 0.333333, s"$t3")
  }

  test("ltv curve: cohorts, ages, cumulative per-user revenue") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400L * 1000L)
    // cohort week 0: users 1,2 first-seen day 0/1; user 1 returns in
    // week 1. cohort week 2: user 3.
    val events = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 20.0), (1L, ts(8), 30.0),
      (3L, ts(15), 40.0)
    ).toDF("user_id", "ts", "value")
    val rows = EventAnalytics.ltvCurve(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val c00 = rows((0L, 0L))
    assert(c00.getAs[Long]("cohort_size") == 2L &&
      c00.getAs[Long]("n_active_users") == 2L &&
      c00.getAs[Double]("revenue") == 30.0 &&
      c00.getAs[Double]("ltv_per_user") == 15.0, s"$c00")
    val c01 = rows((0L, 1L))
    assert(c01.getAs[Double]("revenue") == 30.0 &&
      c01.getAs[Double]("ltv_per_user") == 30.0, "cumulative 60/2")
    val c20 = rows((2L, 0L))
    assert(c20.getAs[Long]("cohort_size") == 1L &&
      c20.getAs[Double]("ltv_per_user") == 40.0)
    assert(rows.size == 3)
  }

  test("dispersion: clumped counts overdisperse, constant underdisperses") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(day: Int, i: Int) = new Timestamp(day * 86400000L + i * 1000L)
    // key a: 1,1,1,9 events/day -> VMR = 16/3 (mean 3, var 16)
    // key b: 2,2,2,2 -> VMR = 0
    val events =
      ((0 to 2).map(d => Seq((ts(d, 0), "a"))) :+
        (1 to 9).map(i => (ts(3, i), "a"))).flatten ++
      (0 to 3).flatMap(d => (1 to 2).map(i => (ts(d, i), "b")))
    val out = EventAnalytics.dispersionByKey(
        events.toDF("ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_days") == 4L &&
      a.getAs[Double]("mean_count") == 3.0 &&
      a.getAs[Double]("vmr") == 5.333333, s"$a")
    assert(a.getAs[Double]("dispersion_chi2") == 16.0)
    val b = out("b")
    assert(b.getAs[Double]("vmr") == 0.0 &&
      b.getAs[Double]("dispersion_chi2") == 0.0)
  }

  test("inter-event gaps: hand moments, metronome -1, per-stream isolation") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1 type a: t = 0,10,20,60 -> gaps 10,10,40
    // user 2 type a: single event -> no gap (stream isolation)
    // type b: constant 5s gaps -> burstiness exactly -1
    val events = (Seq(0L, 10L, 20L, 60L).zipWithIndex.map {
        case (t, i) => (1L, ts(t), (i + 10).toLong, "a")
      } :+ ((2L, ts(7L), 99L, "a"))) ++
      (0 to 4).map(i => (3L, ts(i * 5L), (50 + i).toLong, "b"))
    val out = EventAnalytics.interEventGaps(
        events.toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_gaps") == 3L &&
      a.getAs[Double]("mean_gap") == 20.0 &&
      a.getAs[Double]("median_gap") == 10.0, s"$a")
    // sigma_pop = sqrt(200); B = (sqrt(200)-20)/(sqrt(200)+20)
    val expB = (math.sqrt(200.0) - 20.0) / (math.sqrt(200.0) + 20.0)
    assert(math.abs(a.getAs[Double]("burstiness") - expB) < 1e-6)
    val b = out("b")
    assert(b.getAs[Long]("n_gaps") == 4L &&
      b.getAs[Double]("burstiness") == -1.0, "metronome")
  }

  test("funnel step times: chained deltas, window expiry, converters only") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ts(h: Double) = new Timestamp((h * 3600 * 1000L).toLong)
    // u1: view@0, click@2, buy@5 -> deltas 2h, 3h
    // u2: view@0, click@10 -> delta 10h, no buy
    // u3: view@0, click@60 (outside 48h window) -> no step-2 conversion
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(2), "click"), (1L, ts(5), "purchase"),
      (2L, ts(0), "view"), (2L, ts(10), "click"),
      (3L, ts(0), "view"), (3L, ts(60), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnelStepTimes(events,
        Seq("view", "click", "purchase"), window = "48 hours")
      .collect().map(r => r.getInt(2) -> r).toMap
    val s2 = out(2)
    assert(s2.getAs[String]("from_step") == "view" &&
      s2.getAs[Long]("n") == 2L, s"$s2")
    // deltas 2h and 10h: mean 6h = 21600 s, median interpolates to 21600
    assert(s2.getAs[Double]("mean_s") == 21600.0 &&
      s2.getAs[Double]("median_s") == 21600.0)
    val s3 = out(3)
    assert(s3.getAs[Long]("n") == 1L &&
      s3.getAs[Double]("mean_s") == 10800.0, "3h click->purchase")
  }

  test("lexical richness: hand chao1, zero-doubleton correction, saturation") {
    import graft.ops.TextOps
    // vocab: a(x3), b(x2), c, d, e -> D=5, f1=3, f2=1, N=8
    // chao1 = 5 + 9/2 = 9.5; p_unseen = 3/8
    val corpus = Seq("a a b c", "a b d e").zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("id", "text")
    val r = TextOps.lexicalRichness(corpus, "text").head()
    assert(r.getAs[Long]("vocab") == 5L && r.getAs[Long]("f1") == 3L &&
      r.getAs[Long]("f2") == 1L, s"$r")
    assert(r.getAs[Double]("chao1") == 9.5 &&
      r.getAs[Double]("p_unseen") == 0.375)
    // no doubletons: the bias-corrected form f1(f1-1)/(2(f2+1))
    val nodup = Seq((0, "x y z")).toDF("id", "text")
    val n = TextOps.lexicalRichness(nodup, "text").head()
    assert(n.getAs[Double]("chao1") == 3.0 + 3.0 * 2 / 2.0, s"$n")
    // fully saturated corpus (no singletons): chao1 = vocab, unseen 0
    val sat = Seq((0, "p q p q")).toDF("id", "text")
    val s = TextOps.lexicalRichness(sat, "text").head()
    assert(s.getAs[Double]("chao1") == 2.0 &&
      s.getAs[Double]("p_unseen") == 0.0)
  }

  test("effective sample size: uniform = n, one-heavy ~ 1, hand value") {
    import graft.ops.Sampling
    val uni = (1 to 40).map(i => (i, 2.5)).toDF("id", "w")
    val u = Sampling.effectiveSampleSize(uni, col("w")).head()
    assert(u.getAs[Double]("ess") == 40.0 &&
      u.getAs[Double]("ess_frac") == 1.0, s"$u")
    // one dominant weight: ESS collapses toward 1
    val heavy = ((1 to 99).map(i => (i, 0.001)) :+ ((100, 1000.0)))
      .toDF("id", "w")
    val h = Sampling.effectiveSampleSize(heavy, col("w")).head()
    assert(h.getAs[Double]("ess") < 1.01, s"$h")
    // hand: w = {1, 3}: (4)^2 / 10 = 1.6
    val hand = Seq((1, 1.0), (2, 3.0)).toDF("id", "w")
    assert(Sampling.effectiveSampleSize(hand, col("w")).head()
      .getAs[Double]("ess") == 1.6)
    intercept[IllegalArgumentException] {
      Sampling.effectiveSampleSize(Seq((1, -0.5)).toDF("id", "w"),
        col("w"))
    }
  }

  test("gumbel maxima: hand moments, spread widens the return level, guards") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def series(blockMax: Seq[Int]) = blockMax.zipWithIndex.flatMap {
      case (mx, blk) =>
        // one spike day per 30-day block carrying the max, others 1
        (0 until 30).flatMap { d =>
          val n = if (d == 5) mx else 1
          (1 to n).map(i =>
            Tuple1(new Timestamp(((blk * 30 + d) * 86400L + i) * 1000L)))
        }
    }.toDF("ts")
    val tight = EventAnalytics.gumbelBlockMaxima(series(Seq(10, 12, 11,
      13, 10, 12))).head()
    assert(tight.getAs[Long]("k_blocks") == 6L)
    assert(tight.getAs[Double]("mean_max") == 11.333333, s"$tight")
    assert(tight.getAs[Double]("return_level") >
      tight.getAs[Double]("mean_max"))
    // a wider maxima distribution at the same mean → bigger tail number
    val wide = EventAnalytics.gumbelBlockMaxima(series(Seq(4, 18, 5,
      17, 6, 18))).head()
    assert(wide.getAs[Double]("return_level") >
      tight.getAs[Double]("return_level"), s"$wide vs $tight")
    intercept[IllegalArgumentException] {
      EventAnalytics.gumbelBlockMaxima(series(Seq(5, 5, 5)))
    }
  }

  test("mann-kendall: monotone fires, hand S with ties, constant null") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def series(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (n, d) => (1 to n).map(i =>
        Tuple1(new Timestamp((d * 86400L + i) * 1000L)))
    }.toDF("ts")
    // strictly increasing counts: S = n(n-1)/2, tau_a = 1
    val up = EventAnalytics.mannKendallDaily(series((1 to 12))).head()
    assert(up.getAs[Long]("s") == 66L &&
      up.getAs[Double]("tau_a") == 1.0 && up.getAs[Double]("z") > 4.0,
      s"$up")
    // hand ties: counts 1,2,2,3 -> pairs: +5, ties 1 -> S = 5
    val tied = EventAnalytics.mannKendallDaily(series(Seq(1, 2, 2, 3)))
      .head()
    assert(tied.getAs[Long]("s") == 5L, s"$tied")
    // constant series: zero variance, z undefined
    val const = EventAnalytics.mannKendallDaily(series(Seq.fill(6)(4)))
      .head()
    assert(const.getAs[Long]("s") == 0L &&
      const.isNullAt(const.fieldIndex("z")))
  }

  test("ljung-box, dickey-fuller, sample entropy, hurst: hand series") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def series(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (n, d) => (1 to n).map(i =>
        Tuple1(new Timestamp((d * 86400L + i) * 1000L)))
    }.toDF("ts")
    // Ljung-Box recomposes from acfDaily: Q_L = n(n+2) sum r_k^2/(n-k)
    val s12 = series((1 to 12).map(i => 3 + (i * 7) % 5))
    val lb = EventAnalytics.ljungBox(s12, "ts", maxLag = 3)
      .orderBy("lag").collect()
    val acf = EventAnalytics.acfDaily(s12, "ts", 3).orderBy("lag").collect()
    var cum = BigDecimal(0)
    acf.zip(lb).foreach { case (a, q) =>
      val r = a.getAs[Double]("acf")
      cum += BigDecimal(r * r / (12 - a.getAs[Long]("lag")))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val want = BigDecimal(12.0 * 14 * cum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(q.getAs[Double]("q_stat") == want, s"$q want $want")
    }
    // Dickey-Fuller: near-perfect mean reversion -> beta near -2,
    // overwhelmingly stationary
    val alt = EventAnalytics.dickeyFuller(
      series(Seq(10, 1, 10, 2, 9, 1, 10, 1, 9, 2))).head()
    assert(alt.getAs[Double]("beta") < -1.5 &&
      alt.getAs[Boolean]("stationary_5pct"), s"$alt")
    intercept[IllegalArgumentException] { // deterministic AR -> loud
      EventAnalytics.dickeyFuller(series(Seq(10, 1, 10, 1, 10, 1)))
    }
    // SampEn: a perfectly periodic series matches at 2 wherever it
    // matches at 3 -> A = B, SampEn = 0 exactly
    val per = EventAnalytics.sampleEntropy(
      series(Seq(1, 5, 1, 5, 1, 5))).head()
    assert(per.getAs[Long]("b_pairs") == 2L &&
      per.getAs[Long]("a_pairs") == 2L &&
      per.getAs[Double]("sampen") == 0.0, s"$per")
    // Hurst: a monotone ramp is persistent (H near 1), an alternating
    // series anti-persistent - the ordering is the invariant
    val ramp = EventAnalytics.hurstRS(series((1 to 40).map(10 + _)),
      "ts", Seq(4, 8)).head().getAs[Double]("h_exponent")
    val anti = EventAnalytics.hurstRS(
      series((1 to 40).map(i => if (i % 2 == 0) 20 else 2)),
      "ts", Seq(4, 8)).head().getAs[Double]("h_exponent")
    assert(ramp > 0.8 && anti < 0.3 && ramp > anti, s"ramp=$ramp anti=$anti")
    intercept[IllegalArgumentException] { // series shorter than blocks
      EventAnalytics.hurstRS(series(Seq(1, 2, 3)), "ts", Seq(8, 16))
    }
  }

  test("user turnover and peak concurrency: hand weeks and sweep ties") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def ev(u: Long, day: Long, sec: Long) =
      (u, new Timestamp((day * 86400L + sec) * 1000L))
    // u1 in weeks 0+1, u2 week 0 only, u3 week 1 only
    val t = Seq(ev(1, 0, 10), ev(1, 7, 10), ev(2, 0, 20), ev(3, 8, 30))
      .toDF("user_id", "ts")
    val rows = EventAnalytics.userTurnover(t).orderBy("period").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_active") == 2 &&
      rows(0).getAs[Long]("n_new") == 2 &&
      rows(0).getAs[Long]("n_churned") == 0)
    assert(rows(1).getAs[Long]("n_active") == 2 &&
      rows(1).getAs[Long]("n_new") == 1 &&
      rows(1).getAs[Long]("n_retained") == 1 &&
      rows(1).getAs[Long]("n_churned") == 1, rows.mkString(";"))
    // a week in which EVERY previous user churned still reports (its
    // churn is observed activity of the prior period): u5+u6 week 0,
    // u5 again week 2 -> week 1 is active-empty but carries 2 churns,
    // and the identity active_{t-1} = retained_t + churned_t holds
    // across the gap
    val gap = Seq(ev(5, 0, 10), ev(6, 0, 20), ev(5, 14, 30))
      .toDF("user_id", "ts")
    val g = EventAnalytics.userTurnover(gap).orderBy("period").collect()
    assert(g.map(_.getAs[Long]("period")).toSeq == Seq(0L, 1L, 2L),
      g.mkString(";"))
    assert(g(1).getAs[Long]("n_active") == 0 &&
      g(1).getAs[Long]("n_churned") == 2, g.mkString(";"))
    assert(g.sliding(2).forall { case Array(prev, cur) =>
      prev.getAs[Long]("n_active") ==
        cur.getAs[Long]("n_retained") + cur.getAs[Long]("n_churned")
    }, g.mkString(";"))
    // string user keys must not throw in the sweep (the endpoint
    // encoding hashes the key; it participates only in tie order)
    val sEv = Seq(("u-a", new java.sql.Timestamp(1000L)),
      ("u-b", new java.sql.Timestamp(2000L))).toDF("user_id", "ts")
    val sp = EventAnalytics.peakConcurrency(sEv).head()
    assert(sp.getAs[Long]("n_intervals") == 2L, s"$sp")
    // sweep with a closed-end tie: u4 starts exactly when u1 ends ->
    // +1 sorts before -1, peak 3 at that instant
    val c = Seq(ev(1, 0, 100), ev(1, 0, 500), ev(2, 0, 300),
      ev(2, 0, 800), ev(4, 0, 500), ev(4, 0, 550)).toDF("user_id", "ts")
    val p = EventAnalytics.peakConcurrency(c).head()
    assert(p.getAs[Long]("n_intervals") == 3L &&
      p.getAs[Long]("peak_concurrency") == 3L &&
      p.getAs[Long]("peak_at_us") == 500L * 1000000L, s"$p")
  }

  test("class balance: equal class sizes, deterministic, loud edges") {
    import graft.ops.Sampling
    val df = (Seq.fill(5)(0) ++ Seq.fill(2)(1) ++ Seq.fill(3)(2))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lab")
    val out = Sampling.classBalance(df, "id", "lab", "s1")
    val sizes = out.groupBy("label").count().collect()
      .map(_.getAs[Long]("count")).toSet
    assert(sizes == Set(2L), sizes.toString) // min class has 2 rows
    // deterministic: same seed, same subset
    val again = Sampling.classBalance(df, "id", "lab", "s1")
    assert(out.collect().toSeq == again.collect().toSeq)
    intercept[IllegalArgumentException] { // one class -> loud
      Sampling.classBalance(df.filter(col("lab") === 0), "id", "lab", "s")
    }
  }

  test("sprt, orphan keys, knn purity, char entropy: hand cases") {
    import graft.ops.{EmbeddingDrift, TextOps}
    import graft.stats.{DataQuality, Experiment}
    // SPRT: 8/10 at H0=0.5 vs H1=0.9 -> LLR = 8 ln1.8 + 2 ln0.2, continue;
    // 20/20 -> decide H1; 0/20 -> decide H0
    val mixed = (Seq.fill(8)(true) ++ Seq.fill(2)(false)).toDF("f")
    val c = Experiment.sprt(mixed, col("f"), 0.5, 0.9).head()
    val llrWant = BigDecimal(8 * math.log(0.9 / 0.5) +
      2 * math.log((1.0 - 0.9) / (1.0 - 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c.getAs[Double]("llr") == llrWant &&
      c.getAs[String]("decision") == "continue", s"$c")
    assert(Experiment.sprt(Seq.fill(20)(Tuple1(true)).toDF("f"),
      col("f"), 0.5, 0.9).head().getAs[String]("decision") == "accept_h1")
    assert(Experiment.sprt(Seq.fill(20)(Tuple1(false)).toDF("f"),
      col("f"), 0.5, 0.9).head().getAs[String]("decision") == "accept_h0")
    intercept[IllegalArgumentException] {
      Experiment.sprt(mixed, col("f"), 0.5, 0.5)
    }
    // orphan keys: [1,2,3,null] vs parent [1,2]: 1 orphan over 3 non-null
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("k")
    val parent = Seq(1L, 2L).toDF("pk")
    val o = DataQuality.orphanKeys(child, "k", parent, "pk", "rel").head()
    assert(o.getAs[Long]("n_child") == 4L &&
      o.getAs[Long]("n_null_key") == 1L &&
      o.getAs[Long]("n_orphan") == 1L &&
      o.getAs[Double]("orphan_rate") == 0.333333, s"$o")
    // knn purity: two clean clusters -> 1.0; one flipped label ->
    // mean (0 + 0.5 + 0.5 + 3)/6, exactly one low-purity point
    def cloud(flip: Boolean) = Seq(
      (1L, Array(0.0, 0.0), if (flip) "b" else "a"),
      (2L, Array(0.0, 1.0), "a"), (3L, Array(1.0, 0.0), "a"),
      (4L, Array(10.0, 10.0), "b"), (5L, Array(10.0, 11.0), "b"),
      (6L, Array(11.0, 10.0), "b")).toDF("id", "e", "lab")
    val clean = EmbeddingDrift.knnLabelPurity(cloud(false), "id", "e",
      "lab", k = 2).head()
    assert(clean.getAs[Double]("mean_purity") == 1.0 &&
      clean.getAs[Long]("n_low_purity") == 0L)
    val noisy = EmbeddingDrift.knnLabelPurity(cloud(true), "id", "e",
      "lab", k = 2).head()
    assert(noisy.getAs[Double]("mean_purity") == 0.666667 &&
      noisy.getAs[Long]("n_low_purity") == 1L, s"$noisy")
    // char entropy: constant run -> 0; "abab" -> ln3 - (2 ln2)/3;
    // 1-char docs excluded
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "x")).toDF("id", "t")
    val e = TextOps.charBigramEntropy(docs, "id", "t").collect()
    assert(e.length == 2 && e(0).getAs[Double]("entropy") == 0.0)
    val hWant = BigDecimal(math.log(3.0) -
      BigDecimal(2 * math.log(2.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(e(1).getAs[Double]("entropy") == hWant, s"${e(1)} want $hWant")
  }

  test("pacf recomposes durbin-levinson from acf; knn-degree star") {
    import graft.ops.{EventAnalytics, Graph}
    import java.sql.Timestamp
    def series(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (n, d) => (1 to n).map(i =>
        Tuple1(new Timestamp((d * 86400L + i) * 1000L)))
    }.toDF("ts")
    val s = series((1 to 12).map(i => 3 + (i * 5) % 7))
    val acf = EventAnalytics.acfDaily(s, "ts", 3).orderBy("lag")
      .collect().map(_.getAs[Double]("acf"))
    val p = EventAnalytics.pacfDaily(s, "ts").orderBy("lag").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    assert(p(0).getAs[Double]("pacf") == r6(acf(0)))
    val phi22 = (acf(1) - acf(0) * acf(0)) / (1.0 - acf(0) * acf(0))
    assert(p(1).getAs[Double]("pacf") == r6(phi22), s"${p(1)}")
    // star 0-1,0-2,0-3: leaves (deg 1) see the hub (knn 3), the hub
    // (deg 3) sees leaves (knn 1)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val knn = Graph.avgNeighborDegree(star).collect()
      .map(r => r.getAs[Long]("degree") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Double]("avg_neighbor_degree"))))
      .toMap
    assert(knn(1L) == ((3L, 3.0)) && knn(3L) == ((1L, 1.0)), s"$knn")
  }

  test("odds ratio CI and hourly profile: hand cells and buckets") {
    import graft.stats.Contingency
    import graft.ops.EventAnalytics
    // hand 2x2 [[10,20],[5,40]]: OR = 400/100 = 4, CI brackets it
    val t = (Seq.fill(10)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false)))
      .toDF("a", "b")
    val r = Contingency.oddsRatioCI(t, col("a"), col("b")).head()
    assert(r.getAs[Double]("odds_ratio") == 4.0 &&
      !r.getAs[Boolean]("haldane") &&
      r.getAs[Double]("ci_low") < 4.0 && r.getAs[Double]("ci_high") > 4.0,
      s"$r")
    // a zero cell flips the Haldane flag and still yields a finite CI
    val z = (Seq.fill(10)((true, true)) ++ Seq.fill(5)((false, false)) ++
      Seq.fill(3)((true, false))).toDF("a", "b")
    val h = Contingency.oddsRatioCI(z, col("a"), col("b")).head()
    assert(h.getAs[Boolean]("haldane") &&
      h.getAs[Double]("ci_high") > h.getAs[Double]("ci_low"))
    // hourly: 3 events in hour 0, 1 in hour 1 -> shares 0.75/0.25,
    // hour 0 is the peak
    import java.sql.Timestamp
    val ev = Seq(10L, 20L, 30L, 3700L).map(sec =>
      Tuple1(new Timestamp(sec * 1000L))).toDF("ts")
    val hp = EventAnalytics.hourlyProfile(ev).orderBy("hour").collect()
    assert(hp.length == 2 && hp(0).getAs[Double]("share") == 0.75 &&
      hp(0).getAs[Boolean]("is_peak") &&
      !hp(1).getAs[Boolean]("is_peak"), hp.mkString(";"))
  }

  test("mix fit: exact recipe zero, drifted mix fires, stray key loud") {
    import graft.ops.Sampling
    val w = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val exact = (Seq.fill(40)("a") ++ Seq.fill(20)("b") ++
      Seq.fill(20)("c")).zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("id", "key")
    val e = Sampling.mixFitTest(exact, col("key"), w).head()
    assert(e.getAs[Double]("chi2") == 0.0 &&
      e.getAs[Double]("p_value") == 1.0, s"$e")
    // hand drift: o = (60, 10, 10), e = (40, 20, 20):
    // chi2 = 400/40 + 100/20 + 100/20 = 20
    val drift = (Seq.fill(60)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(10)("c")).zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("id", "key")
    val d = Sampling.mixFitTest(drift, col("key"), w).head()
    assert(d.getAs[Double]("chi2") == 20.0 &&
      d.getAs[Double]("p_value") < 1e-4, s"$d")
    // a target key missing from the data still charges its expectation
    val partial = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).zipWithIndex
      .map { case (k, i) => (i, k) }.toDF("id", "key")
    assert(Sampling.mixFitTest(partial, col("key"), w).head()
      .getAs[Double]("chi2") > 0.0)
    intercept[IllegalArgumentException] {
      Sampling.mixFitTest(Seq((1, "zzz")).toDF("id", "key"),
        col("key"), w)
    }
  }

  test("weekday effect: planted rhythm fires, flat series reads ~ zero") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    def burst(day: Int, n: Int) = (1 to n).map(i =>
      Tuple1(new Timestamp((day * 86400L + i) * 1000L)))
    // 8 weeks where phase-0 days get 30 events, others 10
    val rhythmic = (0 until 56).flatMap(d =>
      burst(d, if (d % 7 == 0) 30 else 10)).toDF("ts")
    val r = EventAnalytics.weekdayEffect(rhythmic).head()
    assert(r.getAs[Long]("n_days") == 56L &&
      r.getAs[Long]("df_between") == 6L)
    assert(r.getAs[Double]("eta_squared") == 1.0 &&
      r.isNullAt(r.fieldIndex("f_stat")),
      s"a pure rhythm explains everything (ssw = 0, F infinite): $r")
    // rhythm-free series (within-week parity noise balances across the
    // 8 weeks, so every phase mean is exactly 10.5): zero between-group
    // variance, F and eta exactly 0
    val flat = (0 until 56).flatMap(d => burst(d, 10 + d % 2)).toDF("ts")
    val f = EventAnalytics.weekdayEffect(flat).head()
    assert(f.getAs[Double]("eta_squared") == 0.0 &&
      f.getAs[Double]("f_stat") == 0.0, s"$f")
  }

  test("daily peaks: strict maxima, gap neighbors are zero, plateaus skip") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    // counts/day: d1=2, d2=5, d3=1, d5=3 (d4 missing), d6=3 (plateau)
    def rows(day: Int, n: Int) = (1 to n).map(i =>
      Tuple1(new Timestamp((day * 86400L + i) * 1000L)))
    val events = (rows(1, 2) ++ rows(2, 5) ++ rows(3, 1) ++ rows(5, 3) ++
      rows(6, 3)).toDF("ts")
    val peaks = EventAnalytics.dailyPeaks(events)
      .collect().map(r => r.getLong(0) -> r).toMap
    // d2 beats 2 and 1; d5 beats the MISSING d4 (0) but ties d6 -> no;
    // d6 beats d5? equal -> no; strictness kills the plateau pair
    assert(peaks.keySet == Set(2L), s"$peaks")
    val p = peaks(2L)
    assert(p.getAs[Long]("n_events") == 5L &&
      p.getAs[Long]("prev_n") == 2L && p.getAs[Long]("next_n") == 1L)
    // minCount filters low spikes: an isolated day IS a peak over zeros
    val lone = EventAnalytics.dailyPeaks(rows(10, 2).toDF("ts"))
      .collect()
    assert(lone.length == 1 && lone.head.getLong(0) == 10L)
    assert(EventAnalytics.dailyPeaks(rows(10, 2).toDF("ts"), minCount = 3)
      .collect().isEmpty)
  }

  test("max drawdown: hand path, earliest-tie policy, never-falling zero") {
    import graft.ops.EventAnalytics
    def dd(ys: Seq[Double]) = EventAnalytics.maxDrawdown(
      ys.zipWithIndex.map { case (y, i) => (i.toLong + 1, y) }.toDF("t", "y"),
      "t", "y").head()
    // cum: 10, 15, 7, 12, 4, 9 -> peak 15@t2, trough 4@t5, dd 11
    val r = dd(Seq(10.0, 5.0, -8.0, 5.0, -8.0, 5.0))
    assert(r.getAs[Long]("peak_day") == 2L &&
      r.getAs[Long]("trough_day") == 5L &&
      r.getAs[Double]("max_drawdown") == 11.0, s"$r")
    // tie: cum 10, 2, 10, 2 -> dd 8 hit at t2 first; peak is t1 (earliest)
    val tie = dd(Seq(10.0, -8.0, 8.0, -8.0))
    assert(tie.getAs[Long]("trough_day") == 2L &&
      tie.getAs[Long]("peak_day") == 1L &&
      tie.getAs[Double]("max_drawdown") == 8.0, s"$tie")
    // never falls: zero drawdown at the first day
    val up = dd(Seq(1.0, 2.0, 3.0))
    assert(up.getAs[Double]("max_drawdown") == 0.0 &&
      up.getAs[Long]("peak_day") == 1L && up.getAs[Long]("trough_day") == 1L)
    // fractional cents accumulate exactly
    val frac = dd(Seq(0.1, 0.2, -0.3))
    assert(frac.getAs[Double]("max_drawdown") == 0.3, s"$frac")
    intercept[IllegalArgumentException] {
      EventAnalytics.maxDrawdown(
        Seq.empty[(Long, Double)].toDF("t", "y"), "t", "y")
    }
  }

  test("seasonal decomposition: identity holds, planted pattern recovered") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    // 14 days of hourly events: hour-of-day h gets (1 + (h % 4)) events
    // — a pure period-24 pattern with a flat trend
    val events = (0 until 14 * 24).flatMap { h =>
      (0 until 1 + (h % 24) % 4).map(i =>
        (1L, new Timestamp((h * 3600L + i) * 1000L), "e"))
    }.toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.seasonalDecompose(events, "event_type", "ts")
      .collect()
    // additive identity at every bucket (all parts rounded to 6)
    out.foreach { r =>
      val lhs = r.getAs[Long]("n").toDouble
      val rhs = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(lhs - rhs) < 5e-6, s"identity broke: $r")
    }
    // away from the edges the trend is near-flat: the ±12h RANGE frame
    // spans 25 buckets — one full period plus one phase-cycling extra
    // (the classic reason the textbook refines to a 2×m MA), so the
    // interior trend wobbles within (max slot − min slot)/25 ≈ 0.12
    val interior = out.filter { r =>
      val b = r.getAs[Long]("bucket_s")
      b >= 86400L && b < 13L * 86400L
    }
    val trends = interior.map(_.getAs[Double]("trend"))
    assert(trends.max - trends.min <= 0.2,
      s"trend should be ~flat, spread ${trends.max - trends.min}")
    // seasonal recovers the planted hour-of-day ordering: slot with
    // 4 events/h beats slot with 1 event/h
    val bySlot = interior.groupBy(r => (r.getAs[Long]("bucket_s") / 3600) % 24)
      .map { case (s2, rs) => s2 -> rs.map(_.getAs[Double]("seasonal")).head }
    assert(bySlot(3L) > bySlot(0L),
      s"seasonal ordering lost: ${bySlot.toSeq.sortBy(_._1)}")
  }

  test("page-hinkley: hand running-mean walk, alarm at the shift") {
    import graft.ops.EventAnalytics
    // 10,10,10 then 20,20 with delta=1, lambda=5: ph = 0,0,0,6.5,11.5
    val df = Seq(("k", 1, 10.0), ("k", 2, 10.0), ("k", 3, 10.0),
      ("k", 4, 20.0), ("k", 5, 20.0)).toDF("g", "d", "x")
    val out = EventAnalytics.pageHinkley(df, Seq("g"), "d", col("x"),
      delta = 1.0, lambda = 5.0).orderBy("d").collect()
    assert(out.map(_.getAs[Double]("ph")).toSeq ==
      Seq(0.0, 0.0, 0.0, 6.5, 11.5), out.mkString(";"))
    assert(out.map(_.getAs[Boolean]("alarm")).toSeq ==
      Seq(false, false, false, true, true))
    assert(out(3).getAs[Double]("running_mean") == 12.5)
  }

  test("seasonal strength: planted hourly pattern ~1, constant series null") {
    import graft.ops.EventAnalytics
    import java.sql.Timestamp
    // key "s": hour-of-day pattern 1..4 events repeating; key "f":
    // exactly 1 event every hour (constant -> variances degenerate)
    val rows = for {
      day <- 0 until 14
      h <- 0 until 24
      (key, reps) <- Seq(("s", h % 4 + 1), ("f", 1))
      r <- 0 until reps
    } yield (key, new Timestamp((day * 86400L + h * 3600L + r) * 1000L))
    val out = EventAnalytics.seasonalStrength(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
      .map(r => r.getString(0) -> r).toMap
    val fs = out("s").getAs[Double]("seasonal_strength")
    assert(fs > 0.8 && fs <= 1.0, s"planted pattern should dominate: $fs")
    assert(out("f").isNullAt(out("f").fieldIndex("seasonal_strength")),
      s"constant series has no defined strength: ${out("f")}")
  }

  test("gopher + c4 rules: hand docs exercise every rule branch") {
    import graft.ops.QualityRules
    val good = ("the of and " + ("wordsword " * 50)).trim
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "the of " * 5),                          // too few words
      (3L, ("# " * 30) + good),                     // symbol ratio > 0.1
      (4L, (1 to 60).map(_ => "zz...").mkString("\n")), // ellipsis lines + no stopwords
      (5L, ("- the bullet\n" * 10) + "- of and line"),  // >90% bullet lines
      (6L, ""),                                     // empty
      (7L, ("999 888 " * 30) + "the of")            // <80% alphabetic words
    ).toDF("doc_id", "text")
    val g = QualityRules.gopherFlags(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g(1L).getAs[Boolean]("keep"), g(1L).toString)
    assert(!g(2L).getAs[Boolean]("keep") &&
      g(2L).getAs[Long]("n_words") == 10L)
    assert(!g(3L).getAs[Boolean]("keep") &&
      g(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!g(4L).getAs[Boolean]("keep") &&
      g(4L).getAs[Double]("ellipsis_frac") == 1.0)
    assert(!g(5L).getAs[Boolean]("keep") &&
      g(5L).getAs[Double]("bullet_frac") > 0.9)
    assert(!g(6L).getAs[Boolean]("keep") &&
      g(6L).getAs[Long]("n_words") == 0L)
    assert(!g(7L).getAs[Boolean]("keep") &&
      g(7L).getAs[Double]("alpha_word_frac") < 0.8)
    // c4: line retention, sentence count, lorem/brace verdicts
    val c4docs = Seq(
      (1L, "a good long sentence sits right here.\nshort one.\n" +
        "another good long sentence sits here too!"),
      (2L, "this one mentions lorem ipsum proudly in its text here.\n" +
        "another good long sentence sits here too."),
      (3L, "a good long sentence sits right here.\nvar x = { y: 1 }")
    ).toDF("doc_id", "text")
    val c = QualityRules.c4Clean(c4docs, "doc_id", "text",
      minSentences = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: line 1 kept (ends '.', 7 words), 'short one.' dropped
    // (<5 words), line 3 kept (ends '!') -> 2 sentences, keep
    assert(c(1L).getAs[Boolean]("keep") &&
      c(1L).getAs[Long]("n_lines_kept") == 2L &&
      c(1L).getAs[Long]("n_sentences") == 2L, c(1L).toString)
    assert(!c(2L).getAs[Boolean]("keep") &&
      c(2L).getAs[Boolean]("has_lorem"))
    assert(!c(3L).getAs[Boolean]("keep") &&
      c(3L).getAs[Boolean]("has_brace") &&
      c(3L).getAs[Long]("n_lines_kept") == 1L)
    // cleaned_md5 pins the exact retained text
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(("a good long sentence sits right here.\n" +
        "another good long sentence sits here too!").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(c(1L).getAs[String]("cleaned_md5") == want)
  }
}
