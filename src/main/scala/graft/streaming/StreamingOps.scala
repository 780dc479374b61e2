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
    * the lag/cumsum classic. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val withBreak = events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col("ts").cast("long") - col("__prev").cast("long") > gapMinutes * 60L, 1L)
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
}
