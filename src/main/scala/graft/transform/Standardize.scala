package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-score standardization — (v − mean)/stddev per numeric column, the
  * feature-scaling step before distance-based models and regularized
  * fits.
  *
  * One aggregate computes every column's moments, one narrow map applies
  * them — no second shuffle. Engine-parity design: the moment sums run in
  * DECIMAL(18,2) (values) and its exact product (squares), so they are
  * exact in ANY engine regardless of partition summation order; the mean
  * and sample stddev then derive through an identical double sequence,
  * and the per-row z-score is rounded at `roundTo`. A zero-variance
  * column standardizes to null (no ANSI divide error).
  *
  * MAGNITUDE BOUND (shared by [[zscoreByGroup]],
  * [[graft.transform.Encode.targetEncodeLoo]], [[graft.transform.Impute]],
  * same pattern as `Regression.trendByKey`): the squared sum accumulates
  * in decimal(38,4), which holds Σv² exactly while it stays below 10^34 —
  * e.g. 10^12 rows of |v| ≤ 10^10, far beyond any money-typed column.
  * Past that, decimal overflow yields null (non-ANSI) or a runtime error
  * (ANSI), never a silently wrong moment; pre-scale or switch the column
  * to double-with-Welford before that regime.
  */
object Standardize {

  /** `df` with each named column replaced by its rounded z-score. */
  def zscore(
      df: DataFrame, cols: Seq[String], roundTo: Int = 6): DataFrame = {
    require(cols.nonEmpty, "no columns to standardize")
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("decimal(18,2)")
      Seq(count(col(c)).as(s"__n_$c"),
        sum(d).cast("double").as(s"__sm_$c"),
        sum(d * d).cast("double").as(s"__sq_$c"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (out, (c, i)) =>
      val n = m.getLong(3 * i).toDouble
      val sm = m.getDouble(3 * i + 1)
      val sq = m.getDouble(3 * i + 2)
      val mean = sm / n
      val varS = (sq - sm * sm / n) / (n - 1.0)
      if (!(varS > 0.0)) out.withColumn(c, lit(null).cast("double"))
      else {
        val sd = math.sqrt(varS)
        out.withColumn(c,
          round((col(c).cast("double") - lit(mean)) / lit(sd), roundTo))
      }
    }
  }

  /** Robust group-wise standardization — (v − median)/(1.4826·MAD), the
    * outlier-resistant twin of [[zscoreByGroup]]: one mislabeled 10^9 in
    * a money column shifts a mean/stddev z arbitrarily but moves the
    * median/MAD not at all, which is why quality-score normalization over
    * crawl domains prefers it. MAD = median(|v − median|); 1.4826 scales
    * MAD to σ under normality so thresholds transfer.
    *
    * Two exact-percentile passes (the group median must exist before the
    * deviations can be formed), each a single groupBy over the data; the
    * group-sized quantile tables broadcast back, so the data itself never
    * shuffles. Both quantiles are ROUNDED at `roundTo` before the ratio —
    * the z then derives from identical doubles in any engine (the same
    * determinism-over-last-ulp trade the t17 percentile gate relies on).
    * MAD = 0 (at least half the group identical) nulls out, as does a
    * NULL value — never an ANSI divide error. */
  def robustZByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol)).agg(
      round(percentile(v, lit(0.5)), roundTo).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol)).agg(
      round(percentile(abs(v - col("__med")), lit(0.5)), roundTo).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn(valueCol,
        when(col("__mad") > 0.0,
          round((v - col("__med")) / (lit(1.4826) * col("__mad")), roundTo)))
      .drop("__med", "__mad")
  }

  /** Group-wise z-score: each row standardized against ITS GROUP's
    * moments — the per-domain feature scaling that stops a high-variance
    * domain from dominating a mixed corpus. One groupBy computes the
    * (exact, decimal-summed) per-group moments; the moment table is
    * groups-sized and broadcast back, so the data never shuffles.
    * Degenerate groups (n=1 or zero variance) null out: their variance
    * term evaluates NaN/≤0 in doubles, never an ANSI division error. */
  def zscoreByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val d = col(valueCol).cast("decimal(18,2)")
    val m = df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("__n"),
      sum(d).cast("double").as("__sm"),
      sum(d * d).cast("double").as("__sq"))
    val mean = col("__sm") / col("__n")
    val varS = (col("__sq") - col("__sm") * col("__sm") / col("__n")) /
      (col("__n") - lit(1))
    df.join(broadcast(m), Seq(groupCol))
      .withColumn(valueCol,
        when(varS > 0.0,
          round((col(valueCol).cast("double") - mean) / sqrt(varS), roundTo)))
      .drop("__n", "__sm", "__sq")
  }

  /** Quantile normalization across groups (Bolstad et al. 2003's
    * microarray recipe, the standard fix when per-domain scorers live on
    * incomparable scales): replace each value with the POOLED
    * distribution's value at the same within-group quantile, so every
    * group's score distribution becomes the common reference and a
    * global top-fraction cut ([[graft.ops.Sampling]]) stops favoring
    * domains whose scorer runs hot.
    *
    * Semantics (engine-portable, tie-stable): within-group position is
    * `rank()` — equal values share the MIN rank, so identical inputs
    * always normalize identically — at midrank quantile
    * (2r−1)/(2n_g); the reference value is the pooled sort's
    * row_number position k = ⌈quantile·N⌉, computed by INTEGER
    * arithmetic ⌊((2r−1)·N + 2n_g − 1)/(2n_g)⌋ in decimal(38,0) (the
    * double form drifts a rank; the product overflows a long at
    * corpus scale). Adds `normalized`.
    *
    * Scale shape: one rank window per group (partitioned — safe), ONE
    * distributed range-partitioned sort for the pooled positions
    * (`sortBy` + `zipWithIndex`'s partition-size offset pass — the
    * classic parallel scan; NO unpartitioned window anywhere, so no
    * task ever sees more than its partition), one broadcast of the
    * 1-row total, one shuffle join on the target position — the exact
    * path at any scale. A sketch substitution (merged
    * [[graft.stats.QuantileSketch]] + interpolation) remains the cheap
    * approximation when exactness isn't required. */
  def quantileNormalizeByGroup(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull)
    val wg = Window.partitionBy(col(groupCol)).orderBy(v)
    // ceil(num/den) exactly: subtract the remainder BEFORE dividing, so
    // the decimal quotient is integral and immune to Spark's
    // scale-capped division rounding (which drifts the floor when the
    // fractional part sits within the capped scale of an integer)
    val num = (col("__r").cast("decimal(20,0)") * 2 - 1) *
      col("__nt").cast("decimal(20,0)")
    val den = col("__n").cast("decimal(20,0)") * 2
    val numAdj = num + den - 1
    val ranked = base
      .withColumn("__r", rank().over(wg))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__nt"))))
      .withColumn("__k",
        ((numAdj - pmod(numAdj, den)) / den).cast("long"))
    // pooled position table (k, value): distributed sort, then
    // zipWithIndex assigns global positions from broadcast partition
    // sizes (its extra counting job reuses the sort's shuffle output).
    // Tie order within equal values is partition-arbitrary but the
    // mapped VALUE is identical, so k -> value is well-defined — the
    // same argument the old global row_number relied on.
    val pooled = base
      .select(v.as("__pv")).as[Double].rdd
      .sortBy(identity)
      .zipWithIndex()
      .map { case (pv, i) => (pv, i + 1L) }
      .toDF("__pv", "__k")
    val normalized = ranked.join(pooled, Seq("__k"))
      .withColumn("normalized", col("__pv"))
      .drop("__r", "__n", "__nt", "__k", "__pv")
    // null values pass through with a null normalized score — dropping
    // their rows would silently shrink the table (the sibling ops'
    // convention: undefined maps to null, never to absence)
    normalized.unionByName(
      df.filter(v.isNull)
        .withColumn("normalized", lit(null).cast("double")))
  }

  /** Equal-frequency discretization (quantile binning, pandas `qcut`'s
    * value-tie semantics): bin(v) = ⌊below(v)·k / n⌋ where below(v) is
    * the EXACT count of rows with a smaller value — all ties share a
    * bin (a row-level rank would split equal values across a bin edge
    * by arbitrary order), counts per bin are near-equal up to tie mass,
    * and every number is an integer, so two engines cannot disagree.
    * Adds `outCol` (long); null values pass through with a null bin.
    *
    * Scale shape: one per-value count, one distributed range-
    * partitioned sort with the partition-offset prefix pass (the
    * [[graft.stats.Correlation]] rank recipe — NO unpartitioned
    * window), one shuffle join back on the value. The value-count
    * table is distinct-values-sized, not row-sized. NaN values are
    * filtered out with the nulls (Spark's EqualTo treats NaN = NaN as
    * true, so they would otherwise join to the top bin) and surface as
    * null bins, like nulls. */
  def discretizeEqualFreq(
      df: DataFrame, valueCol: String, k: Int,
      outCol: String = "bin"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    // NaN is excluded ALONGSIDE null, not merely left to miss the join:
    // Spark SQL's EqualTo treats NaN = NaN as TRUE, so a NaN row would
    // survive an isNotNull-only filter, sort last in the RDD pass, and
    // join back with the TOP bin — the documented null-bin contract
    // requires the explicit isnan filter here
    val counts = df.filter(v.isNotNull && !isnan(v))
      .groupBy(v.as("__v")).agg(count(lit(1)).as("__cnt"))
      .as[(Double, Long)].rdd
      .sortBy(_._1)
      .persist()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(_._2).sum))
      }.collect().sortBy(_._1).map(_._2)
      val n = partTotals.sum
      if (n == 0) return df.withColumn(outCol, lit(null).cast("long"))
      val offsets = partTotals.scanLeft(0L)(_ + _)
      val bOff = spark.sparkContext.broadcast(offsets)
      val bins = counts.mapPartitionsWithIndex { (i, it) =>
        var below = bOff.value(i)
        it.map { case (value, cnt) =>
          // BigInt: below·k overflows a long past ~9·10^18/k rows
          val bin = (BigInt(below) * k / BigInt(n)).toLong
          below += cnt
          (value, bin)
        }
      }.toDF("__v", outCol)
      df.join(bins, v === col("__v"), "left")
        .drop("__v")
    } finally counts.unpersist(blocking = false)
  }

  /** Box–Cox λ selection by profile log-likelihood (Box & Cox 1964,
    * public) over the CANONICAL grid λ ∈ {−2, −1, −½, 0, ½, 1, 2}:
    * LL(λ) = −n/2·ln σ̂²_mle(y(λ)) + (λ−1)·Σln x, picking the λ that
    * best Gaussianizes a positive skewed metric before z-scoring or
    * OLS. The grid is deliberately the seven closed-form powers —
    * 1/x², 1/x, 1/√x, ln x, √x, x, x² — expressible with *, sqrt and
    * ln only (sqrt is IEEE-exact, ln parity established), so the scan
    * is engine-replayable with NO pow() (whose last-ulp behavior
    * differs across libms); finer λ tuning composes downstream of the
    * winning bracket.
    *
    * ONE aggregation computes all fifteen moment folds (round-12
    * decimals, map-side combined); the seven LLs are driver arithmetic.
    * Requires strictly positive x (loud otherwise — Box–Cox is
    * undefined at 0). Returns 7 rows (lambda, loglik, is_best) ordered
    * by λ, LL round-6; best = max rounded LL, ties to the smaller λ. */
  def boxCoxScan(df: DataFrame, xCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val base = df.filter(x.isNotNull && !isnan(x)).select(x.as("x"))
    val nonPos = base.filter(col("x") <= 0.0).count()
    require(nonPos == 0L,
      s"Box-Cox needs strictly positive values; $nonPos rows are <= 0 " +
        "- shift the metric or drop zeros first")
    def fold12(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val lnx = log(col("x"))
    val sq = col("x") * col("x")
    val rt = sqrt(col("x"))
    val ys: Seq[(Double, org.apache.spark.sql.Column)] = Seq(
      -2.0 -> (lit(1.0) / sq), -1.0 -> (lit(1.0) / col("x")),
      -0.5 -> (lit(1.0) / rt), 0.0 -> lnx, 0.5 -> rt,
      1.0 -> col("x"), 2.0 -> sq)
    val aggs = ys.zipWithIndex.flatMap { case ((_, y), i) =>
      Seq(fold12(y).as(s"s1_$i"), fold12(y * y).as(s"s2_$i"))
    } ++ Seq(count(lit(1)).as("n"), fold12(lnx).as("slnx"))
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("n")
    require(n >= 3, s"Box-Cox scan needs >= 3 values, got $n")
    val slnx = r.getAs[Double]("slnx")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    // σ²((x^λ−1)/λ) = σ²(x^λ)/λ², so the profile LL carries the
    // n·ln|λ| scale term for λ ≠ 0 (dropping it mis-ranks every λ)
    val lls = ys.zipWithIndex.map { case ((lam, _), i) =>
      val s1 = r.getAs[Double](s"s1_$i")
      val s2 = r.getAs[Double](s"s2_$i")
      val v = s2 / n - (s1 / n) * (s1 / n)
      require(v > 0.0, s"constant transform at lambda=$lam - degenerate")
      val scale = if (lam == 0.0) 0.0 else n * math.log(math.abs(lam))
      (lam, r6(-n / 2.0 * math.log(v) + scale + (lam - 1.0) * slnx))
    }
    val best = lls.maxBy(_._2)._2
    val bestLam = lls.filter(_._2 == best).map(_._1).min
    val spark = df.sparkSession
    import spark.implicits._
    lls.map { case (lam, ll) => (lam, ll, lam == bestLam) }
      .toDF("lambda", "loglik", "is_best").orderBy("lambda")
  }
}
