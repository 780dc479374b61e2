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

  private def streamEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(streamDir)
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
}
