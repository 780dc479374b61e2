package graft.stats

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** T9 simple OLS regression (reference: pages/plotting.py:1195–1247, i.e.
  * scipy.stats.linregress): slope, intercept, r, r², two-sided p, stderr,
  * n, x-range and trendline endpoints — all from ONE aggregate (moment
  * sums), with the p-value from commons-math3's TDistribution (already on
  * Spark's classpath). No MLlib iteration for a closed-form problem.
  */
object Regression {

  final case class OlsResult(
      slope: Double, intercept: Double, r: Double, r2: Double,
      pValue: Double, stderr: Double, n: Long,
      xMin: Double, xMax: Double) {
    /** Trendline endpoints over the observed x-range (plotting.py:1240–1244). */
    def trendline: ((Double, Double), (Double, Double)) =
      ((xMin, slope * xMin + intercept), (xMax, slope * xMax + intercept))
  }

  /** Pairwise-complete OLS of y on x. Returns None when n < 3 or x has no
    * variance (linregress would produce NaNs). */
  def ols(df: DataFrame, xCol: String, yCol: String): Option[OlsResult] = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val nn = df.filter(x.isNotNull && y.isNotNull)
    val row = nn.agg(
      count(lit(1)).as("n"),
      avg(x).as("mx"), avg(y).as("my"),
      covar_samp(x, y).as("sxy"),
      var_samp(x).as("sxx"), var_samp(y).as("syy"),
      min(x).as("xmin"), max(x).as("xmax")).head()
    val n = row.getAs[Long]("n")
    if (n < 3) return None
    val sxx = row.getAs[Double]("sxx")
    if (sxx == 0.0 || sxx.isNaN) return None
    val sxy = row.getAs[Double]("sxy")
    val syy = row.getAs[Double]("syy")
    val mx = row.getAs[Double]("mx")
    val my = row.getAs[Double]("my")

    val slope = sxy / sxx
    val intercept = my - slope * mx
    val r = if (syy == 0.0) 0.0 else sxy / math.sqrt(sxx * syy)
    val df2 = (n - 2).toDouble
    // Residual variance via the moment identity: SSE/(n-2) = (n-1)(syy - slope*sxy)/(n-2)
    val se2 = math.max(0.0, (n - 1) * (syy - slope * sxy) / df2)
    val stderr = math.sqrt(se2 / ((n - 1) * sxx))
    val t = if (stderr == 0.0) Double.PositiveInfinity else slope / stderr
    val p =
      if (t.isInfinite) 0.0
      else 2.0 * (1.0 - new TDistribution(df2).cumulativeProbability(math.abs(t)))
    Some(OlsResult(slope, intercept, r, r * r, p, stderr, n,
      row.getAs[Double]("xmin"), row.getAs[Double]("xmax")))
  }

  /** Per-key OLS trend of a value against time — the drift monitor run
    * over every entity at once (closed-form slope/intercept from moment
    * sums; one groupBy, NO per-key driver loop — this is [[ols]] made
    * group-wise and distributed).
    *
    * Engine-parity + exactness design: time is centered at each key's own
    * first observation (a window min over the SAME key partitioning the
    * groupBy reuses — Catalyst plans one Exchange total) and values are
    * quantized to integer cents, so every aggregated moment (Σx, Σx²,
    * Σy, Σxy) is an exact integer in doubles and summation order cannot
    * perturb the closed form. Exactness holds while Σx² stays under 2^53 —
    * seconds-granularity x over a ~month span and ~10³ events/key is
    * comfortably inside; re-unit x (days) for multi-year histories.
    *
    * Keys with fewer than 2 points or zero time variance get null slope/
    * intercept (guarded — no ANSI divide-by-zero). Slope is cents/second;
    * intercept is cents at the key's first-observation epoch. */
  def trendByKey(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol),
      unix_seconds(col(tsCol)).as("__t"),
      round(col(valCol).cast(DoubleType) * 100).as("__c"))
    val t0 = min(col("__t")).over(Window.partitionBy(col(keyCol)))
    val x = (col("__t") - t0).cast(DoubleType)
    val agg = base
      .select(col(keyCol), x.as("__x"), col("__c"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__c")).as("__sy"),
        sum(col("__x") * col("__c")).as("__sxy"))
    val denom = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = (col("n") * col("__sxy") - col("__sx") * col("__sy")) / denom
    agg.select(col(keyCol), col("n"),
        round(when(denom > 0, slope), roundTo).as("slope_cents_per_s"),
        round(when(denom > 0,
          (col("__sy") - slope * col("__sx")) / col("n")), roundTo)
          .as("intercept_cents"))
      .orderBy(col(keyCol))
  }

  /** Theil–Sen robust slope (Theil 1950; Sen 1968 — public): the MEDIAN
    * of all pairwise slopes (yⱼ−yᵢ)/(xⱼ−xᵢ), with intercept = median of
    * y − slope·x. Breakdown point ~29% — a third of the points can be
    * arbitrarily corrupted before the fit moves, where one bad point
    * drags OLS ([[ols]]/[[trendByKey]]) anywhere; the robust trend line
    * for metric series with logging glitches.
    *
    * Exact over all n(n−1)/2 pairs via a self-join on a ROW-NUMBERED
    * copy (i < j; x-ties excluded — vertical pairs define no slope), so
    * the input must be modest (trend series are: daily/hourly points).
    * Enforced loudly at `maxRows`; beyond that, Theil–Sen on a
    * deterministic hash sample is the standard scale path. Medians are
    * nearest-rank (never interpolated) with the value at a rank
    * deterministic under ties. Returns one row
    * (n, n_pairs, slope, intercept) rounded to `roundTo`; fewer than 2
    * distinct x values yield null slope/intercept. */
  def theilSen(df: DataFrame, xCol: String, yCol: String,
      maxRows: Int = 10000, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .limit(maxRows + 1)
      .withColumn("i", row_number().over(Window.orderBy(col("x"), col("y"))))
      .persist()
    val n = base.count()
    require(n <= maxRows,
      s"more than $maxRows points — Theil-Sen is all-pairs-exact; trend " +
        "series are small by nature, or pre-sample with hashFraction")
    val a = base.select(col("i").as("ia"), col("x").as("xa"),
      col("y").as("ya"))
    val b = base.select(col("i").as("ib"), col("x").as("xb"),
      col("y").as("yb"))
    val slopes = a.join(b, col("ia") < col("ib"))
      .filter(col("xb") =!= col("xa"))
      .select(round((col("yb") - col("ya")) / (col("xb") - col("xa")),
        9).as("s"))
      .withColumn("r", row_number().over(Window.orderBy(col("s"))))
    val np = slopes.count()
    val out =
      if (np == 0)
        base.sparkSession.sql(
          s"SELECT CAST($n AS BIGINT) AS n, CAST(0 AS BIGINT) AS n_pairs, " +
            "CAST(NULL AS DOUBLE) AS slope, CAST(NULL AS DOUBLE) AS intercept")
      else {
        // nearest-rank median: ceil(np/2)
        val mid = (np + 1) / 2
        val slope = slopes.filter(col("r") === mid).head.getAs[Double]("s")
        val resid = base
          .select(round(col("y") - lit(slope) * col("x"), 9).as("e"))
          .withColumn("r", row_number().over(Window.orderBy(col("e"))))
        val midN = (n + 1) / 2
        val intercept = resid.filter(col("r") === midN)
          .head.getAs[Double]("e")
        def r6(v: Double) = java.math.BigDecimal.valueOf(v)
          .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        base.sparkSession.sql(
          s"SELECT CAST($n AS BIGINT) AS n, CAST($np AS BIGINT) AS n_pairs, " +
            s"CAST(${r6(slope)} AS DOUBLE) AS slope, " +
            s"CAST(${r6(intercept)} AS DOUBLE) AS intercept")
      }
    val result = out.collect()
    base.unpersist()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(result: _*), out.schema)
  }
}
