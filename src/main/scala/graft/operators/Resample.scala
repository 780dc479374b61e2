package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: align each key's irregular observations onto a
  * regular time grid, carrying the last observed value forward (ffill) —
  * the standard step before feeding event streams to models that expect
  * fixed-rate input.
  *
  * Shape: one small aggregate finds each key's [first, last] span; the
  * grid is generated distributively with `sequence` + `explode` (no
  * driver-side loop, no cross join against a global calendar — each key
  * only materializes its own span). Grid points and observations are then
  * union'd and a single running `last(value, ignoreNulls)` window carries
  * observations onto grid rows — the same union-sort-carry discipline as
  * [[AsOfJoin]], one shuffle on the key, no per-grid-point join.
  *
  * A grid point that coincides exactly with an observation sorts BEFORE it
  * (is_obs breaks the tie), so it reads the previous observation — grid
  * semantics are "value as of strictly before the tick". Leading grid
  * points before a key's first observation stay null.
  *
  * 100 TB: everything is keyed narrow transforms around one Exchange on
  * the key; grid size is data-proportional (span/step per key), and a
  * pathological span (one key spanning years at 1-minute steps) surfaces
  * as that key's own grid rows, not a global blow-up.
  */
object Resample {

  /** (key, grid ts, ffilled value) at `step` intervals (a Spark interval
    * literal, e.g. "1 hour") from floor(first obs, `truncUnit`) through the
    * last observation per key. */
  def ffillGrid(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      step: String = "1 hour", truncUnit: String = "hour"): DataFrame = {
    val spans = df.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__g0"),
        max(col(tsCol)).as("__g1"))
    val grid = spans.select(col(keyCol),
        explode(sequence(col("__g0"), col("__g1"), expr(s"interval $step")))
          .as(tsCol))
      .withColumn("__is_obs", lit(0))
      .withColumn("__v", lit(null).cast("double"))
    val obs = df.select(col(keyCol), col(tsCol), lit(1).as("__is_obs"),
      col(valCol).cast("double").as("__v"))
    val carry = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_obs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(obs)
      .withColumn("__ff", last(col("__v"), ignoreNulls = true).over(carry))
      .filter(col("__is_obs") === 0)
      .select(col(keyCol), col(tsCol), col("__ff").as(valCol))
  }
}
