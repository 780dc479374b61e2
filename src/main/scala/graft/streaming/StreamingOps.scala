package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming-ready event transforms. Each takes and returns a
  * DataFrame, so the SAME code runs over `spark.read` (batch, used by the
  * oracle-checked queries) and `spark.readStream` (incremental with
  * watermarks, exercised in StreamingSpec) — the batch/streaming unification
  * Spark is built around.
  */
object StreamingOps {

  /** Tumbling-window aggregate per event type: count + exact decimal sum of
    * value. `windowed(df).select("window_start", ...)` matches DuckDB's
    * epoch-aligned time_bucket. */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming variant: watermarked so state for closed windows is evicted. */
  def windowedAggStream(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization (batch): a session breaks after `gapMinutes`
    * of per-user inactivity. One shuffle+sort per user, then two windows —
    * the lag/cumsum classic.
    *
    * Boundary semantics match streaming `session_window`, whose merge is
    * INCLUSIVE at the boundary (measured, not assumed: SessionizePropertySpec
    * drives both paths with gaps straddling 30:00): an event EXACTLY `gap`
    * after its predecessor EXTENDS the session; only a strictly larger gap
    * breaks (`>`). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // unix_seconds on an explicit TimestampType cast works for both
    // TIMESTAMP and TIMESTAMP_NTZ inputs (a raw cast("long") fails analysis
    // on NTZ) — robust to the ts-encoding drift Tables.load normalizes away.
    def secs(c: Column): Column = unix_seconds(c.cast("timestamp"))
    val withBreak = events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          secs(col("ts")) - secs(col("__prev")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreak.groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        // exact decimal twin of sum_value — consumers needing bit-exact cents
        // (the driver gate) use this instead of re-deriving from the double
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_exact"))
  }

  /** Streaming sessionization with session_window (native state eviction
    * via watermark) — the streaming twin of [[sessionize]]. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Sliding-window live distinct-user count — the reference's live
    * participant counter (query_secure.py:313–318) over event time. Exact
    * `countDistinct` per window: correct in batch, where a window's rows are
    * all present when it is computed.
    *
    * `windowLength` must be a multiple of `slide` (Spark's sliding `window`
    * assigns each row to length/slide epoch-aligned windows). */
  def liveCount(events: DataFrame, windowLength: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength, slide).as("w"))
      .agg(countDistinct(col("user_id")).as("live_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("live_users"), col("n_events"))

  /** Streaming twin of [[liveCount]]: exact distinct over an unbounded
    * stream needs per-window state proportional to the number of distinct
    * users, so the streaming path counts with `approx_count_distinct` (HLL,
    * constant state per window, mergeable across micro-batches) — the same
    * exact-vs-approx trade [[graft.query.CohortQuery]] offers the batch live
    * counter (SURVEY §7.4 #13). Watermark bounds window state. */
  def liveCountStream(events: DataFrame, windowLength: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours",
      rsd: Double = 0.02): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide).as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("live_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("live_users"), col("n_events"))

  /** Windowed per-event-type profile of `value` — the reference's column
    * statistics (analysis/statistics.py) re-expressed over event-time
    * windows. Every statistic here is algebraic (count/sum/min/max and the
    * moments behind mean/stddev), so the SAME aggregate is incrementally
    * computable per micro-batch with partial-merge state — no sort, no
    * global pass, no holding raw rows. */
  def windowedProfile(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("value")).as("n_value"),
        avg(col("value")).as("mean_value"),
        stddev_pop(col("value")).as("std_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("n_value"), col("mean_value"), col("std_value"),
        col("min_value"), col("max_value"))

  /** Streaming twin of [[windowedProfile]] — watermarked so closed windows'
    * state is evicted; append-mode capable. */
  def windowedProfileStream(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("value")).as("n_value"),
        avg(col("value")).as("mean_value"),
        stddev_pop(col("value")).as("std_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("n_value"), col("mean_value"), col("std_value"),
        col("min_value"), col("max_value"))

  /** Streaming exact dedup — the streaming twin of
    * [[graft.ops.Dedup.exactGroups]]'s keep-one semantics for an ingestion
    * stream. `dropDuplicatesWithinWatermark` keeps first-arrival per key and
    * evicts key state once the watermark passes, so state is bounded by the
    * key cardinality of one watermark span (exact streaming dedup with
    * UNBOUNDED state otherwise — the same state-vs-exactness trade as
    * [[liveCountStream]]). Duplicates separated by more than `watermark` in
    * event time may both survive; at 100 TB/day that horizon is the dedup
    * window you provision state for. */
  /** Batch twin of [[correlateStreams]]: pairs of (a, b) events with the
    * same key where b happens within `withinSeconds` AFTER a (inclusive
    * ends). The equi key keeps this a sort-merge join with a residual
    * range filter — not a nested loop. Both inputs must carry disjoint
    * column names apart from `keyCol` (alias before calling). */
  def correlate(
      a: DataFrame, b: DataFrame, keyCol: String,
      aTsCol: String, bTsCol: String, withinSeconds: Long): DataFrame =
    a.join(b, Seq(keyCol))
      .filter(col(bTsCol) >= col(aTsCol) &&
        col(bTsCol) <= col(aTsCol) + expr(s"interval $withinSeconds seconds"))

  /** Stream-stream inner join — the two-feed correlation (view→purchase,
    * request→response) as a native Structured Streaming join: both sides
    * watermarked, and the event-time range condition (`b.ts` within
    * [a.ts, a.ts + within]) bounds join state so Spark evicts rows that
    * can no longer match. Same row semantics as [[correlate]] on in-order
    * feeds (spec-pinned). Append mode; matches emit as they form. */
  def correlateStreams(
      a: DataFrame, b: DataFrame, keyCol: String,
      aTsCol: String, bTsCol: String, withinSeconds: Long,
      watermark: String = "2 hours"): DataFrame = {
    val wa = a.withWatermark(aTsCol, watermark)
    val wb = b.withWatermark(bTsCol, watermark)
      .withColumnRenamed(keyCol, "__bkey")
    wa.join(wb,
      col(keyCol) === col("__bkey") &&
        col(bTsCol) >= col(aTsCol) &&
        col(bTsCol) <= col(aTsCol) + expr(s"interval $withinSeconds seconds"))
      .drop("__bkey")
  }

  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours", tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
