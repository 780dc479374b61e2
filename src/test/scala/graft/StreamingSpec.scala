package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Structured Streaming twins of the batch event transforms: drive the
  * parquet events table through readStream and assert the streamed result
  * equals the batch plan's — Spark's batch/streaming unification, verified.
  */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchEvents = Tables.load(spark, dir, "events")

  /** The streaming file source requires a directory; stage the single
    * parquet into a temp dir once. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def streamFrom(d: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(d)
    // Same ts canonicalization as the batch loader — schema-conditional, so
    // it is correct for all three testdata ts encodings (see Tables.load).
    Tables.normalizeTs(raw)
  }

  private def streamEvents = streamFrom(streamDir)

  /** The events parquet staged TWICE: every event arrives as an exact
    * duplicate, the shape dedupStream exists for. */
  private lazy val dupStreamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    java.nio.file.Files.copy(src, d.resolve("events_a.parquet"))
    java.nio.file.Files.copy(src, d.resolve("events_b.parquet"))
    d.toString
  }

  test("streaming windowed agg (complete mode) matches batch") {
    val q = StreamingOps.windowedAggStream(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out")
      .orderBy("window_start", "event_type").collect()
    val batch = StreamingOps.windowedAgg(batchEvents)
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("streaming session_window aggregates sessions with eviction semantics") {
    val q = StreamingOps.sessionizeStream(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_out")
    // session_window merges on the same 30-min gap rule as the batch
    // lag/cumsum sessionizer -> same session count and event total.
    val batch = StreamingOps.sessionize(batchEvents, gapMinutes = 30)
    assert(streamed.count() == batch.count())
    val sEvents = streamed.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    val bEvents = batch.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(sEvents == bEvents)
  }

  test("streaming live count matches batch windows; HLL within 5% of exact") {
    val q = StreamingOps.liveCountStream(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("live_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("live_out").orderBy("window_start").collect()
    val batch = StreamingOps.liveCount(batchEvents).orderBy("window_start").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[java.sql.Timestamp]("window_start") == b.getAs[java.sql.Timestamp]("window_start"))
      assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
      val approx = s.getAs[Long]("live_users").toDouble
      val exact = b.getAs[Long]("live_users").toDouble
      assert(math.abs(approx - exact) <= math.max(1.0, 0.05 * exact),
        s"HLL live_users $approx vs exact $exact")
    }
  }

  test("streaming windowed profile matches batch (algebraic aggs, fp tolerance)") {
    val q = StreamingOps.windowedProfileStream(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("prof_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("prof_out").orderBy("window_start", "event_type").collect()
    val batch = StreamingOps.windowedProfile(batchEvents)
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    def close(a: Double, b: Double) =
      (a.isNaN && b.isNaN) || math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(s.getAs[Long]("n_value") == b.getAs[Long]("n_value"))
      // counts/min/max are exact; mean/std incremental merge order may
      // differ from the batch plan's -> fp tolerance
      assert(s.getAs[Double]("min_value") == b.getAs[Double]("min_value"))
      assert(s.getAs[Double]("max_value") == b.getAs[Double]("max_value"))
      assert(close(s.getAs[Double]("mean_value"), b.getAs[Double]("mean_value")))
      assert(close(s.getAs[Double]("std_value"), b.getAs[Double]("std_value")))
    }
  }

  test("streaming heavy hitters: running MG summary keeps the batch bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{functions => F}
    import graft.ops.HeavyHitters
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val cap = 64
    val (ref, sink) = HeavyHitters.runningSummarySink("text", cap)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch(sink).start()
    try {
      // three micro-batches: the summary accumulates across all of them
      for (part <- rows.grouped(math.max(1, rows.length / 3 + 1))) {
        ms.addData(part.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val s = ref.get()
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(F.explode(graft.ops.TextOps.tokens(F.col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(s.n == exact.values.sum,
      s"stream summary saw ${s.n} tokens, corpus has ${exact.values.sum}")
    for ((t, c) <- exact) {
      assert(s.estimate(t) <= c && c - s.estimate(t) <= s.maxError,
        s"stream summary broke the MG bound at $t")
      if (c > s.maxError) assert(s.estimate(t) > 0, s"hitter $t missing")
    }
  }

  test("streaming KMV sketch equals batch; redelivery cannot bias it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.CorpusOverlap
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val k = 256
    val (ref, sink) = CorpusOverlap.runningSketchSink("text", n = 2, k = k)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch(sink).start()
    val parts = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    try {
      for (part <- parts) { ms.addData(part.toSeq); q.processAllAvailable() }
      val afterAll = ref.get()
      val batchSketch = CorpusOverlap.kmvSketch(
        spark.read.parquet(s"$dir/documents.parquet"), "text", n = 2, k = k)
      assert(afterAll.sameElements(batchSketch),
        "stream-folded sketch differs from the one-shot batch sketch")
      // at-least-once redelivery of the first micro-batch: idempotent
      ms.addData(parts.head.toSeq); q.processAllAvailable()
      assert(ref.get().sameElements(afterAll),
        "redelivered micro-batch changed the sketch")
    } finally q.stop()
  }

  test("streaming ingestion keeps the stats store current per micro-batch") {
    import graft.catalog.StatsStore
    import graft.stats.IncrementalStats
    val statsDir = java.nio.file.Files.createTempDirectory("graft-stream-stats")
      .resolve("log").toString
    val q = streamEvents
      .writeStream
      .foreachBatch(StatsStore.appendBatchSink(statsDir, Seq("value")))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = StatsStore.read(spark, statsDir)
      .filter(org.apache.spark.sql.functions.col("col_name") === "value").head()
    val batch = IncrementalStats.merge(
      IncrementalStats.sketch(batchEvents, Seq("value"),
        org.apache.spark.sql.functions.lit("all"))).head()
    assert(streamed.getAs[Long]("n") == batch.getAs[Long]("n"))
    assert(streamed.getAs[Long]("n_value") == batch.getAs[Long]("n_value"))
    assert(streamed.getAs[java.math.BigDecimal]("sum_v")
      .compareTo(batch.getAs[java.math.BigDecimal]("sum_v")) == 0)
    assert(streamed.getAs[Double]("min_v") == batch.getAs[Double]("min_v"))
    assert(streamed.getAs[Double]("max_v") == batch.getAs[Double]("max_v"))
  }

  test("streaming decontamination: stateless bloom probe filters the feed like batch") {
    import org.apache.spark.sql.functions._
    val docsBatch = Tables.load(spark, dir, "documents")
    val bench = docsBatch.filter(col("doc_id") % 17 === 3)
    // the probe column is a pure map-side expression (built once from the
    // batch benchmark), so the SAME column decontaminates batch and stream
    val ov = graft.ops.Decontaminate.overlapBloomColumn(
      spark, bench, "text", "text", n = 3, fpp = 0.001)

    val d = java.nio.file.Files.createTempDirectory("graft-stream-docs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d.resolve("documents.parquet"))
    val docStream = spark.readStream
      .schema(docsBatch.schema)
      .parquet(d.toString)

    val q = docStream
      .filter(col("doc_id") % 17 =!= 3)
      .filter(ov < 3)
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("decon_out")
      .collect().map(_.getLong(0)).toSet
    val batch = docsBatch
      .filter(col("doc_id") % 17 =!= 3)
      .filter(ov < 3)
      .select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream kept ${streamed.size}, batch kept ${batch.size}")
  }

  test("streaming upsert: foreachBatch maintains the keyed corpus per micro-batch") {
    import org.apache.spark.sql.functions._
    import graft.ops.Upsert
    val docsBatch = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-stream-upsert")
      .resolve("corpus").toString
    // initial corpus: even doc ids
    Upsert.writeKeyed(docsBatch.filter(col("doc_id") % 2 === 0),
      "doc_id", corpusDir, nBuckets = 8)

    // odd ids arrive as a stream, staged as TWO files so AvailableNow +
    // maxFilesPerTrigger=1 forces two separate upsert applications
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-upd")
    docsBatch.filter(col("doc_id") % 4 === 1)
      .write.parquet(stage.resolve("f1").toString)
    docsBatch.filter(col("doc_id") % 4 === 3)
      .write.parquet(stage.resolve("f2").toString)
    val updStream = spark.readStream
      .schema(docsBatch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString + "/f*")

    var batches = 0
    val q = updStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Upsert.upsert(spark, corpusDir, batch, "doc_id", nBuckets = 8)
          batches += 1
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(batches >= 2, s"expected >=2 micro-batch applications, got $batches")
    val got = Upsert.readKeyed(spark, corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val want = docsBatch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, "streamed upserts must reconstruct the full corpus")
  }

  test("streaming dedup keeps one row per key from a fully-duplicated stream") {
    val q = StreamingOps.dedupStream(streamFrom(dupStreamDir), Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("dedup_out")
    val distinctIds = batchEvents.select("event_id").distinct().count()
    // every event arrived twice; exactly one survivor per key
    assert(streamed.count() == distinctIds)
    assert(streamed.select("event_id").distinct().count() == distinctIds)
  }

  test("stream-stream join: watermarked correlation matches the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = batchEvents
    def side(t: String, idName: String, tsName: String) = ev
      .filter(F.col("event_type") === t)
      .select(F.col("user_id"), F.col("event_id").as(idName),
        F.col("ts").as(tsName))
    val expected = StreamingOps.correlate(
        side("view", "view_id", "vts"), side("purchase", "purchase_id", "pts"),
        "user_id", "vts", "pts", 3600L)
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce correlated pairs")

    def rows(t: String) = ev.filter(F.col("event_type") === t)
      .select($"user_id", $"event_id", F.unix_micros($"ts"))
      .as[(Long, Long, Long)].collect().toSeq
    val mv = MemoryStream[(Long, Long, Long)]
    val mp = MemoryStream[(Long, Long, Long)]
    def feed(ms: MemoryStream[(Long, Long, Long)], id: String, ts: String) =
      ms.toDF().toDF("user_id", id, "tsu")
        .withColumn(ts, F.timestamp_micros(F.col("tsu"))).drop("tsu")
    val joined = StreamingOps.correlateStreams(
      feed(mv, "view_id", "vts"), feed(mp, "purchase_id", "pts"),
      "user_id", "vts", "pts", 3600L)
    val q = joined.select("view_id", "purchase_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("corr_out").start()
    try {
      mv.addData(rows("view")); mp.addData(rows("purchase"))
      q.processAllAvailable()
      val got = spark.table("corr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"${got.size} streamed vs ${expected.size} batch")
    } finally q.stop()
  }

  test("streaming drift: per-batch PSI flags a shifted feed, passes a stable one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stats.Drift
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ref = (1 to 1000).map(_.toDouble).toDF("value")
    val scores = scala.collection.mutable.Map[Long, Double]()
    val ms = MemoryStream[Double]
    val q = Drift.psiStream(ref, ms.toDF().toDF("value"), "value") {
      (id, psi) => scores.synchronized { scores(id) = psi }
    }
    try {
      ms.addData((1 to 1000).map(_.toDouble)) // batch 0: same distribution
      q.processAllAvailable()
      ms.addData((1501 to 2500).map(_.toDouble)) // batch 1: fully shifted
      q.processAllAvailable()
      val s = scores.synchronized(scores.toMap)
      assert(math.abs(s(0L)) < 1e-9, s"stable batch must score ~0: ${s(0L)}")
      assert(s(1L) > 0.25, s"shifted batch must flag: ${s(1L)}")
      // the streaming tail equals the batch PSI on the same data
      val batchPsi = Drift.psi(ref, (1501 to 2500).map(_.toDouble).toDF("value"),
        "value")
      assert(math.abs(s(1L) - batchPsi) < 1e-9,
        s"stream ${s(1L)} vs batch $batchPsi")
    } finally q.stop()
  }

  test("streaming anomaly flags: flatMapGroupsWithState state matches batch windows") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Anomaly
    import spark.implicits._

    val expected = Anomaly.flags(batchEvents).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet

    // Two micro-batches split at the global ts midpoint: per-key order is
    // preserved across the split, so the incremental state must reproduce
    // the batch windows exactly.
    val rows = batchEvents
      .select($"event_id", $"user_id", F.unix_micros($"ts"), $"value")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._1))
    val (first, second) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, Double)]
    val feed = ms.toDF().toDF("event_id", "user_id", "tsu", "value")
      .withColumn("ts", F.timestamp_micros(F.col("tsu")))
    val q = Anomaly.flagsStream(feed)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out")
      .start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("anom_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
      assert(got.size == expected.size, s"${got.size} vs ${expected.size} flags")
      assert(got == expected, "stream flags must equal batch flags")
      // the fixture must actually contain anomalies, or this test is vacuous
      assert(expected.exists(_._3), "fixture produced zero anomalies")
    } finally q.stop()
  }

  test("streaming near-dedup: MinHash band state matches batch over >=2 micro-batches") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.NearDedup
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    // arrival order = id order (the first-arrival-wins contract equals the
    // batch min-id semantics under this feed order)
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    val splitId = first.last._1

    val expectedDups = NearDedup.nearDupIds(docs, threshold = 0.4)
      .as[Long].collect().toSet
    assert(expectedDups.nonEmpty, "fixture has no near-dups — vacuous test")
    // state must matter: some duplicate's earlier partner arrives in batch 1
    val pairs = graft.ops.Dedup
      .minhashLshPairs(docs, "doc_id", "text", threshold = 0.4)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.exists(p => p._1 <= splitId && p._2 > splitId),
      "no dup pair straddles the micro-batch split — state not exercised")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val feed = ms.toDF().toDF("doc_id", "text")
      // event time follows id so in-batch ordering is deterministic. The
      // +10 offset keeps doc 0 off epoch 0: a stateful operator's late
      // filter treats an event time EQUAL to the initial watermark (0) as
      // late and silently drops the row (measured — doc 0's dup partner
      // vanished without it). Real feeds never carry epoch-0 event times.
      .withColumn("ts", F.timestamp_micros((F.col("doc_id") + 10) * 1000000L))
    val q = NearDedup.dupEdgesStream(feed, threshold = 0.4,
        watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      // at-least-once RE-DELIVERY: the whole second half arrives again; a
      // re-delivered id already in band state must be skipped — a
      // self-edge (doc_id == matched_id) would make dropDuplicates-style
      // consumers drop the only copy
      ms.addData(second.toSeq); q.processAllAvailable()
      val edges = spark.table("neardup_out")
        .select("doc_id", "matched_id").as[(Long, Long)].collect()
      assert(edges.forall(e => e._2 != e._1), "re-delivery emitted a self-edge")
      // every edge points BACKWARD (matched an earlier arrival)
      assert(edges.forall(e => e._2 < e._1), "an edge matched a later doc")
      val got = edges.map(_._1).toSet
      assert(got == expectedDups,
        s"stream dup set != batch: extra=${(got -- expectedDups).toSeq.sorted.take(5)} " +
          s"missing=${(expectedDups -- got).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("streaming video+audio near-dedup: aligned-vector state matches the batch joins") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Multimodal
    import graft.streaming.NearDedup
    import spark.implicits._

    // ---- video: 3 clip families (base + resized twin) + 2 strangers ----
    val vids: Seq[(Long, Array[Byte])] = (0 until 3).flatMap { f =>
      val (fx, fy) = (1.0 + f, 0.5 + (f % 2) * 1.5)
      Seq(
        (f.toLong, Multimodal.syntheticMjpegAvi(48, 36, 6, 10, 100 + f, fx, fy)),
        (100L + f, Multimodal.syntheticMjpegAvi(32, 24, 6, 10, 100 + f, fx, fy)))
    } ++ Seq(
      (200L, Multimodal.syntheticMjpegAvi(48, 36, 6, 10, 7, 3.5, 2.5)),
      (201L, Multimodal.syntheticMjpegAvi(48, 36, 6, 10, 9, 0.5, 3.0)))
    val vidMedia = vids.toDF("media_id", "content")
      .withColumn("meta", F.struct(F.lit("s://").as("uri"),
        F.lit(null).cast("int").as("width"), F.lit(null).cast("int").as("height"),
        F.lit(null).cast("bigint").as("duration_ms")))
      .withColumn("modality", F.lit("video"))
    val vidBatchDups = Multimodal.videoPhashPairs(vidMedia, k = 6, maxHamming = 8)
      .select("id2").as[Long].collect().toSet
    assert(vidBatchDups.nonEmpty)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vms = MemoryStream[(Long, Array[Byte])]
    val vfeed = vms.toDF().toDF("media_id", "content")
      .withColumn("ts", F.timestamp_micros((F.col("media_id") + 10) * 1000000L))
    val vq = NearDedup.videoPhashDupEdgesStream(vfeed, k = 6,
        maxMeanHamming = 8.0, watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("vid_neardup").start()
    try {
      val ordered = vids.sortBy(_._1)
      val (a, b) = ordered.splitAt(ordered.length / 2)
      vms.addData(a); vq.processAllAvailable()
      vms.addData(b); vq.processAllAvailable()
      val edges = spark.table("vid_neardup")
        .select("doc_id", "matched_id").as[(Long, Long)].collect()
      assert(edges.forall(e => e._2 < e._1))
      assert(edges.map(_._1).toSet == vidBatchDups,
        s"video stream dup set != batch")
    } finally vq.stop()

    // ---- audio: 3 chords × (base, resampled twin) + 1 stranger ----
    val chords = Seq(
      Seq(440.0 -> 1.0, 554.4 -> 0.7, 659.3 -> 0.5),
      Seq(523.3 -> 1.0, 659.3 -> 0.6, 784.0 -> 0.8),
      Seq(349.2 -> 0.9, 440.0 -> 0.4, 880.0 -> 0.7))
    val auds: Seq[(Long, Array[Byte])] = chords.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        (i.toLong, Multimodal.syntheticChordWav(c, 3.0, 8000)),
        (100L + i, Multimodal.syntheticChordWav(c, 3.0, 16000)))
    } :+ ((200L, Multimodal.syntheticChordWav(
      Seq(392.0 -> 1.0, 493.9 -> 0.9, 587.3 -> 0.3), 3.0, 8000)))
    val audBatchDups = Multimodal.audioFingerprintPairs(
        auds.toDF("media_id", "content"), maxMeanBits = 4.0)
      .select("id2").as[Long].collect().toSet
    assert(audBatchDups.nonEmpty)

    val ams = MemoryStream[(Long, Array[Byte])]
    val afeed = ams.toDF().toDF("media_id", "content")
      .withColumn("ts", F.timestamp_micros((F.col("media_id") + 10) * 1000000L))
    val aq = NearDedup.audioFpDupEdgesStream(afeed, maxMeanBits = 4.0,
        watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("aud_neardup").start()
    try {
      val ordered = auds.sortBy(_._1)
      val (a, b) = ordered.splitAt(ordered.length / 2)
      ams.addData(a); aq.processAllAvailable()
      ams.addData(b); aq.processAllAvailable()
      val edges = spark.table("aud_neardup")
        .select("doc_id", "matched_id").as[(Long, Long)].collect()
      assert(edges.forall(e => e._2 < e._1))
      assert(edges.map(_._1).toSet == audBatchDups,
        s"audio stream dup set != batch")
    } finally aq.stop()
  }

  test("streaming image near-dedup: hamming band state matches batch phashPairs") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Multimodal
    import graft.streaming.NearDedup
    import spark.implicits._

    // twin families (resized + brightness copies pair; noise does not) —
    // same construction as the mm_phash_pairs gate, smaller
    val fams = (0 until 4).map { k =>
      (k.toLong, 1.0 + k, 0.5 + (k % 2), k * 0.9)
    }
    val rows: Seq[(Long, Array[Byte])] = fams.flatMap { case (k, fx, fy, ph) =>
      Seq((k, Multimodal.sinusoidPng(64, 48, fx, fy, ph)),
        (100L + k, Multimodal.sinusoidPng(32, 24, fx, fy, ph)),
        (110L + k, Multimodal.sinusoidPng(64, 48, fx, fy, ph, brightness = 12)))
    } ++ (0 until 4).map(i => (200L + i, Multimodal.syntheticPng(24, 18, 55L + i)))

    // batch truth: later-id side of each pair is the duplicate
    val batchDups = Multimodal.phashPairs(
        rows.toDF("media_id", "content"), maxHamming = 10)
      .select("id2").as[Long].collect().toSet
    assert(batchDups.nonEmpty)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Byte])]
    val feed = ms.toDF().toDF("media_id", "content")
      .withColumn("ts", F.timestamp_micros((F.col("media_id") + 10) * 1000000L))
    val q = NearDedup.phashDupEdgesStream(feed, maxHamming = 10,
        watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("phash_out")
      .start()
    try {
      val ordered = rows.sortBy(_._1)
      val (first, second) = ordered.splitAt(ordered.length / 2)
      // a twin pair must straddle the split (state carries across batches)
      assert(first.exists(_._1 < 100) && second.exists(_._1 >= 100))
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()
      val edges = spark.table("phash_out")
        .select("doc_id", "matched_id").as[(Long, Long)].collect()
      assert(edges.forall(e => e._2 < e._1), "an edge matched a later image")
      assert(edges.map(_._1).toSet == batchDups,
        s"stream image dup set != batch phashPairs")
    } finally q.stop()
  }

  test("streaming k-means assignment matches batch (stateless scoring map)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = graft.ops.KMeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val batch = graft.ops.KMeans.assign(emb, "embedding", model)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = graft.ops.KMeans.assign(
        ms.toDF().toDF("vec_id", "embedding"), "embedding", model)
      .select("vec_id", "cluster_id")
      .writeStream.format("memory").queryName("km_out")
      .outputMode("append").start()
    try {
      val parts = rows.grouped(math.max(1, rows.length / 2 + 1)).toSeq
      for (p <- parts) { ms.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("km_out")
        .as[(Long, Int)].collect().toMap
      assert(streamed == batch,
        "streaming assignment drifted from the batch labels")
    } finally q.stop()
  }

  test("streaming k-means: one-batch fold IS one Lloyd step; redelivery-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val init = graft.ops.KMeans.initCentroids(emb, "vec_id", "embedding",
      k = 4, seed = "graft-km", decimals = 6)
    val oneStep = graft.ops.KMeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = 1).centroids
    val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    // single micro-batch: the sequential fold must equal one Lloyd step
    val (ref1, sink1) = graft.ops.KMeans.runningFitSink("embedding", init)
    val ms1 = MemoryStream[(Long, Seq[Double])]
    val q1 = ms1.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append").foreachBatch(sink1).start()
    try {
      ms1.addData(rows.toSeq); q1.processAllAvailable()
      assert(ref1.get().centroids.map(_.toSeq).toSeq ==
        oneStep.map(_.toSeq).toSeq,
        "single-batch sequential fold diverged from one Lloyd step")
      // redelivery of the same epoch must not move the centroids (a NEW
      // batchId would legitimately fold again — sequential k-means)
      val before = ref1.get().centroids.map(_.toSeq).toSeq
      sink1(rows.toSeq.toDF("vec_id", "embedding"), 0L)
      assert(ref1.get().centroids.map(_.toSeq).toSeq == before,
        "replayed batchId 0 moved the centroids")
    } finally q1.stop()
    // split feed: order-dependent by design, but mass must be conserved —
    // every centroid with assigned rows is finite and dimension-complete
    val (ref2, sink2) = graft.ops.KMeans.runningFitSink("embedding", init)
    sink2(rows.take(rows.length / 2).toSeq.toDF("vec_id", "embedding"), 0L)
    sink2(rows.drop(rows.length / 2).toSeq.toDF("vec_id", "embedding"), 1L)
    val m = ref2.get()
    assert(m.centroids.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    assert(m.centroids.length == 4 && m.centroids.forall(_.length == 64))
  }

  test("streaming HLL: accumulator over a real feed; max-fold eats redelivery with no batchId guard") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Hll
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(
        explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val whole = Hll.sketch(toks, "token", 256).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (ref, sink) = Hll.runningSketchSink("token", 256)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .writeStream.outputMode("append").foreachBatch(sink).start()
    try {
      val parts = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      for (p <- parts) { ms.addData(p.toSeq); q.processAllAvailable() }
      assert(ref.get() == whole,
        "stream-folded HLL differs from the one-shot batch sketch")
      // an at-least-once source re-delivers a whole slab of documents:
      // unlike the additive CMS fold, register max is idempotent — the
      // state cannot move, and no epoch bookkeeping was needed to get that
      ms.addData(parts.head.toSeq); q.processAllAvailable()
      assert(ref.get() == whole, "replayed feed slab moved HLL registers")
    } finally q.stop()
  }

  test("streaming CMS: foreachBatch accumulator over a real feed, redelivery-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.CountMin
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(
        explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val whole = CountMin.sketch(toks, "token", 4, 128).collect()
      .map(r => (r.getAs[Int]("depth"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (ref, sink) = CountMin.runningSketchSink("token", 4, 128)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .writeStream.outputMode("append").foreachBatch(sink).start()
    try {
      val parts = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      for (p <- parts) { ms.addData(p.toSeq); q.processAllAvailable() }
      assert(ref.get() == whole,
        "stream-folded CMS differs from the one-shot batch sketch")
    } finally q.stop()
  }

  test("streaming JL projection: stateless map, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Projection
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val rows = embs.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val batch = Projection.signProject(embs, "embedding", 64, 8)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    val got = scala.collection.mutable.Map.empty[Long, Seq[Double]]
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = Projection.signProject(
        ms.toDF().toDF("vec_id", "embedding"), "embedding", 64, 8)
      .select("vec_id", "proj")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[(Long, Seq[Double])].collect().foreach { case (k, v) =>
          got(k) = v
        }
        ()
      }.start()
    try {
      for (p <- rows.grouped(math.max(1, rows.length / 2 + 1)))
        { ms.addData(p.toSeq); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toMap == batch,
      "streamed JL projection differs from the batch map")
  }

  test("streaming covariance moments: fold over micro-batches, redelivery-safe") {
    import graft.ops.Projection
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val whole = Projection.momentsUpper(embs, "embedding", 64).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("si")),
          BigDecimal(r.getAs[java.math.BigDecimal]("sj")),
          BigDecimal(r.getAs[java.math.BigDecimal]("sij"))))).toMap
    val rows = embs.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val (ref, sink) = Projection.runningMomentsSink("embedding", 64)
    val half = rows.length / 2
    val b0 = rows.take(half).toSeq.toDF("vec_id", "embedding")
    val b1 = rows.drop(half).toSeq.toDF("vec_id", "embedding")
    sink(b0, 0L)
    sink(b0, 0L) // at-least-once redelivery of epoch 0 must be skipped
    sink(b1, 1L)
    assert(ref.get() == whole,
      "stream-folded moments differ from the one-shot batch table")
  }

  test("streaming CUSUM monitor: unscaled-long fold == batch decimal windows") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.EventAnalytics
    import graft.streaming.CusumMonitor
    import spark.implicits._

    // daily event counts per type with a planted +40 shift (the gate's
    // fixture, key stringly for the stream)
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_type".as("key"), F.dayofmonth($"ts").cast("long").as("period"))
      .groupBy("key", "period").agg(F.count(F.lit(1)).as("c"))
      .select($"key", $"period",
        ($"c" + F.when($"key" === "error" && $"period" >= 22, 40)
          .otherwise(0)).cast("double").as("value"))
    val stats = EventAnalytics.cusumBaseline(daily, Seq("key"), $"value",
      $"period" <= 14)
    val batch = EventAnalytics.cusumWithStats(daily, Seq("key"), "period",
      $"value", stats).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("period")) ->
        ((r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"),
          r.getAs[Boolean]("flag")))).toMap
    val statsMap = stats.collect().map(r => r.getAs[String]("key") ->
      ((r.getAs[Double]("cusum_mu"), r.getAs[Double]("cusum_sigma")))).toMap

    val rows = daily.as[(String, Long, Double)].collect().sortBy(r => (r._2, r._1))
    val (first, second) = rows.splitAt(rows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val feed = ms.toDF().toDF("key", "period", "value")
    val q = CusumMonitor.monitorStream(feed, statsMap)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("cusum_out").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("period")) ->
          ((r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"),
            r.getAs[Boolean]("flag")))).toMap
      assert(got.size == batch.size, s"${got.size} vs ${batch.size} rows")
      for ((k, want) <- batch)
        assert(got(k) == want, s"$k: stream ${got(k)} vs batch $want")
      assert(batch.exists(_._2._3), "fixture produced zero flags — vacuous")
    } finally q.stop()
  }

  test("streaming EWMA monitor: recursion matches a driver fold, shift flags") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EwmaMonitor
    import spark.implicits._

    val daily = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_type".as("key"),
        F.dayofmonth($"ts").cast("long").as("period"))
      .groupBy("key", "period").agg(F.count(F.lit(1)).as("c"))
      .select($"key", $"period",
        ($"c" + F.when($"key" === "error" && $"period" >= 22, 500)
          .otherwise(0)).cast("double").as("value"))
    val rows = daily.as[(String, Long, Double)].collect()
      .sortBy(r => (r._2, r._1))
    val sigmas = rows.map(_._1).distinct.map(_ -> 10.0).toMap
    // independent driver-side reference of the same micro-unit recursion
    val ref = scala.collection.mutable.Map.empty[String, Long]
    val want = rows.map { case (k, per, x) =>
      ref.get(k) match {
        case None =>
          val s0 = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValueExact()
          ref(k) = s0
          (k, per) -> ((s0 / 1e6, 0.0, false))
        case Some(s) =>
          val dev = x - s / 1e6
          val s2 = EwmaMonitor.fold(0.3, s, x)
          ref(k) = s2
          (k, per) -> ((s2 / 1e6, dev, math.abs(dev) > 40.0))
      }
    }.toMap

    val (first, second) = rows.splitAt(rows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val feed = ms.toDF().toDF("key", "period", "value")
    val q = EwmaMonitor.monitorStream(feed, sigmas, alpha = 0.3,
        hSigma = 4.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("ewma_out").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("period")) ->
          ((r.getAs[Double]("level"), r.getAs[Double]("deviation"),
            r.getAs[Boolean]("flag")))).toMap
      assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
      for ((k, w) <- want)
        assert(got(k) == w, s"$k: stream ${got(k)} vs reference $w")
      assert(want.exists(_._2._3), "planted +500 shift produced no flag")
      // the level ABSORBS the shift: post-shift deviations shrink, so
      // the flag fires on arrival, then the chart re-settles
      val errFlags = want.toSeq.collect {
        case ((k, per), (_, _, f)) if k == "error" && per >= 22 => (per, f)
      }.sortBy(_._1)
      assert(errFlags.head._2, "shift day itself must flag")
    } finally q.stop()
  }
}
