package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile clipping (winsorization) — the standard tail-taming step
  * before moment-based statistics or model features: values below the
  * pLo percentile rise to it, values above pHi drop to it.
  *
  * One exact-percentile aggregate computes every column's clip bounds in
  * a single pass (Spark's `percentile`, the (n−1)·p linear interpolation
  * — engine-portable at a fixed rounding, proven by the
  * t17_group_percentiles gate entry), then one narrow map applies
  * least/greatest — no joins, no second shuffle. Bounds are rounded
  * before clipping so the SAME clip line is computed by any engine;
  * unclipped values pass through bit-for-bit.
  *
  * Exact percentiles sort per aggregate group — fine into the billions;
  * for unbounded scale swap the bounds pass to `percentile_approx` or the
  * mergeable quantile sketch (stats.QuantileSketch) and keep the same
  * clip map. */
object Winsorize {

  /** `df` with each named numeric column clipped to its own
    * [pLo, pHi] percentile bounds (cast to double). */
  def clip(
      df: DataFrame, cols: Seq[String], pLo: Double = 0.01,
      pHi: Double = 0.99, roundTo: Int = 6): DataFrame = {
    require(cols.nonEmpty, "no columns to clip")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo,$pHi]")
    val aggs = cols.flatMap { c =>
      Seq(round(percentile(col(c).cast("double"), lit(pLo)), roundTo)
            .as(s"__lo_$c"),
          round(percentile(col(c).cast("double"), lit(pHi)), roundTo)
            .as(s"__hi_$c"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val lo = bounds.getDouble(2 * i)
      val hi = bounds.getDouble(2 * i + 1)
      d.withColumn(c,
        least(greatest(col(c).cast("double"), lit(lo)), lit(hi)))
    }
  }

  /** Trimmed mean — [[clip]]'s EXCLUDING cousin (Tukey's classic robust
    * location): rows outside the round-6 [pLo, pHi] percentile bounds
    * are DROPPED (inclusive bounds — values exactly on a clip line
    * stay), then the survivors' mean folds as a round-9 decimal. Use
    * winsorize when every row must keep a value (features), trim when
    * estimating a location (metrics): clipping piles mass ON the fence
    * and still biases the mean under asymmetric tails.
    *
    * Two aggregates (bounds, then one conditional fold) — no join, no
    * window, no row explosion. Returns one row (n_total, n_used, lo,
    * hi, trimmed_mean), mean round-6; null when nothing survives (can
    * only happen on an all-null column). */
  /** Per-group [[trimmedMean]] — the robust-location TABLE (one row per
    * group) that a mean-by-group report should ship beside when tails
    * are heavy: per-group round-6 percentile fences from ONE grouped
    * aggregation, joined back for the inclusive-trim conditional fold.
    * Two grouped aggregations + one group-keyed join — no window, scales
    * with group count. Returns (key, n_total, n_used, lo, hi,
    * trimmed_mean) ordered by key; groups whose values are all null
    * report null fences and mean. */
  def trimmedMeanByGroup(
      df: DataFrame, keyCol: Column, colName: String, pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo,$pHi]")
    val v = col(colName).cast("double")
    val base = df.select(keyCol.cast("string").as("key"), v.as("__v"))
    val fences = base.groupBy("key").agg(
      round(percentile(col("__v"), lit(pLo)), 6).as("lo"),
      round(percentile(col("__v"), lit(pHi)), 6).as("hi"))
    val kept = col("__v").isNotNull &&
      col("__v") >= col("lo") && col("__v") <= col("hi")
    base.join(fences, Seq("key"))
      .groupBy("key").agg(
        count(when(col("__v").isNotNull, 1)).as("n_total"),
        count(when(kept, 1)).as("n_used"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        round(sum(when(kept, round(col("__v"), 9)).cast("decimal(38,12)"))
          .cast("double") / count(when(kept, 1)), 6).as("trimmed_mean"))
      .orderBy("key")
  }

  def trimmedMean(
      df: DataFrame, colName: String, pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo,$pHi]")
    val v = col(colName).cast("double")
    val b = df.agg(
        count(when(v.isNotNull, 1)).as("n_total"),
        round(percentile(v, lit(pLo)), 6).as("lo"),
        round(percentile(v, lit(pHi)), 6).as("hi"))
      .head()
    val nTotal = b.getAs[Long]("n_total")
    if (nTotal == 0) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq((0L, 0L, Option.empty[Double], Option.empty[Double],
          Option.empty[Double]))
        .toDF("n_total", "n_used", "lo", "hi", "trimmed_mean")
    }
    val lo = b.getAs[Double]("lo"); val hi = b.getAs[Double]("hi")
    val kept = v.isNotNull && v >= lit(lo) && v <= lit(hi)
    df.agg(
        lit(nTotal).as("n_total"),
        count(when(kept, 1)).as("n_used"),
        lit(lo).as("lo"), lit(hi).as("hi"),
        round(sum(when(kept, round(v, 9)).cast("decimal(38,12)"))
            .cast("double") / count(when(kept, 1)), 6)
          .as("trimmed_mean"))
  }
}
