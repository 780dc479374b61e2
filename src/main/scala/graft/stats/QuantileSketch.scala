package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the quantile leg of incremental stats
  * (SURVEY §7.4 #13), complementing [[IncrementalStats]]' exact
  * sums/min/max and HLL distinct.
  *
  * Scheme: log-bucket histogram with relative-error guarantee (the
  * DDSketch construction, Masson/Rim/Lee, VLDB 2019 — public algorithm).
  * A positive value v lands in bucket ceil(log_γ(v)) with
  * γ = (1+α)/(1−α); any value in a bucket differs from the bucket's
  * midpoint estimate 2γ^b/(γ+1) by at most relative α. Negatives mirror
  * into (sgn = −1) buckets, zeros get a dedicated (sgn = 0) bucket, so the
  * domain is ALL doubles, not just positives.
  *
  * Why this shape for 100 TB: bucket counts are ADDITIVE — a partition's
  * sketch is a few-KB (sgn, bucket, n) table, merging is a groupBy-sum,
  * and the quantile walk happens on the merged few-thousand-row table.
  * Unlike `approx_percentile`, the sketch is a plain DataFrame you can
  * append to a [[graft.catalog.StatsStore]]-style log and fold later:
  * quantiles stay maintainable without rescanning history. t1's exact
  * distributed quantiles remain the reference-parity path; this is the
  * incremental-scale path.
  */
object QuantileSketch {

  val DefaultAlpha = 0.01

  private def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** One scan: per (partition, column, sign, bucket) counts. Nulls and
    * NaNs are excluded (quantiles are over actual values). */
  def sketch(df: DataFrame, cols: Seq[String], partition: Column,
      alpha: Double = DefaultAlpha): DataFrame = {
    require(cols.nonEmpty, "sketch: no columns given")
    require(alpha > 0 && alpha < 0.5, "alpha must be in (0, 0.5)")
    val lnG = math.log(gamma(alpha))
    val perCol = cols.map { c =>
      val v = col(c).cast("double")
      struct(lit(c).as("col_name"),
        when(v > 0, lit(1)).when(v < 0, lit(-1)).otherwise(lit(0)).as("sgn"),
        when(v > 0, ceil(log(v) / lnG))
          .when(v < 0, ceil(log(-v) / lnG))
          .otherwise(lit(0L)).cast("long").as("bucket"),
        v.as("value"))
    }
    df.select(partition.as("part"), explode(array(perCol: _*)).as("s"))
      .select(col("part"), col("s.*"))
      .filter(col("value").isNotNull && !isnan(col("value")))
      .groupBy(col("part"), col("col_name"), col("sgn"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Fold sketch rows from any number of partitions/appends: counts add. */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("col_name"), col("sgn"), col("bucket"))
      .agg(sum(col("n")).as("n"))

  /** Quantile estimates for one column from a merged sketch. The bucket
    * table is a few thousand rows at most (log-spaced over the double
    * range), so the cumulative walk is a driver-side finish — same
    * finishing pattern as ColumnStats' small-histogram path. Returns
    * q → estimate; estimates carry relative error ≤ α (exact 0.0 for the
    * zero bucket). */
  def quantiles(merged: DataFrame, colName: String, qs: Seq[Double],
      alpha: Double = DefaultAlpha): Map[Double, Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0,1]")
    val g = gamma(alpha)
    val rows = merged.filter(col("col_name") === colName)
      // global value order: negatives (large magnitude first), zero,
      // positives (small magnitude first) == (sgn asc, sgn*bucket asc)
      .select(col("sgn").cast("int"), col("bucket").cast("long"),
        col("n").cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (sgn, b, _) => (sgn, sgn * b) }
    val total = rows.map(_._3).sum
    require(total > 0, s"no sketched values for column $colName")
    def estimate(sgn: Int, b: Long): Double =
      if (sgn == 0) 0.0 else sgn * 2.0 * math.pow(g, b.toDouble) / (g + 1)
    qs.map { q =>
      val rank = math.min((q * total).toLong, total - 1)
      var acc = 0L
      var ans = estimate(rows.last._1, rows.last._2)
      val it = rows.iterator
      var found = false
      while (it.hasNext && !found) {
        val (sgn, b, n) = it.next()
        acc += n
        if (acc > rank) { ans = estimate(sgn, b); found = true }
      }
      q -> ans
    }.toMap
  }
}
