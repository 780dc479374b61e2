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

  /** Interrupted time-series (segmented) regression with the Chow
    * break test (Chow 1960 — public): fit OLS separately BEFORE and
    * FROM `breakX`, plus pooled, and test whether the intervention
    * changed the line — the standard "did the launch move the trend"
    * readout over a metric series.
    *
    * Exactness (the t12 discipline): moments Σx, Σy, Σxy, Σx², Σy² fold
    * per segment as round(·,12) decimals — for integer-valued series
    * (day indexes, counts) every sum is EXACT — and each derived number
    * is the same short double formula in both engines: slope from one
    * division of exact cross-moments, RSS via the moment identity, Chow
    * F = ((RSS_p − RSS_a − RSS_b)/2) / ((RSS_a + RSS_b)/(n−4)). The F
    * p-value is library-only (no SQL F CDF), reported unrounded.
    *
    * Returns 3 rows (segment ∈ pre/post/pooled): (segment, n, slope,
    * intercept, rss) rounded to 6, plus chow_f (rounded 4) and chow_p
    * on the pooled row. One aggregation pass — segments are
    * conditional sums, never separate scans. Requires ≥ 3 points per
    * segment and non-degenerate x variance in each. */
  def segmented(df: DataFrame, xCol: String, yCol: String,
      breakX: Double): DataFrame = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(x.as("__x"), y.as("__y"), (x < breakX).as("__pre"))
    def fold(c: org.apache.spark.sql.Column, pred: org.apache.spark.sql.Column) =
      sum(when(pred, round(c, 12).cast("decimal(38,12)")))
    def moments(pred: org.apache.spark.sql.Column, sfx: String) = Seq(
      count(when(pred, 1L)).as(s"n$sfx"),
      fold(col("__x"), pred).as(s"sx$sfx"),
      fold(col("__y"), pred).as(s"sy$sfx"),
      fold(col("__x") * col("__y"), pred).as(s"sxy$sfx"),
      fold(col("__x") * col("__x"), pred).as(s"sxx$sfx"),
      fold(col("__y") * col("__y"), pred).as(s"syy$sfx"))
    val aggs = moments(col("__pre"), "_a") ++
      moments(!col("__pre"), "_b") ++ moments(lit(true), "_p")
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    case class Fit(n: Long, slope: Double, intercept: Double, rss: Double)
    def fit(sfx: String): Fit = {
      val n = r.getAs[Long](s"n$sfx")
      require(n >= 3, s"segment '$sfx' has $n points (< 3)")
      def d(c: String) = r.getAs[java.math.BigDecimal](s"$c$sfx").doubleValue
      val (sx, sy, sxy, sxx, syy) =
        (d("sx"), d("sy"), d("sxy"), d("sxx"), d("syy"))
      val den = n * sxx - sx * sx
      require(den != 0.0, s"segment '$sfx' has zero x variance")
      val slope = (n * sxy - sx * sy) / den
      val intercept = (sy - slope * sx) / n
      val rss = syy - intercept * sy - slope * sxy
      Fit(n, slope, intercept, rss)
    }
    val a = fit("_a"); val b = fit("_b"); val p = fit("_p")
    val dfDen = (p.n - 4).toDouble
    require(dfDen > 0, s"need > 4 points total, got ${p.n}")
    val chowF = ((p.rss - a.rss - b.rss) / 2.0) /
      ((a.rss + b.rss) / dfDen)
    val chowP =
      if (chowF.isInfinite || chowF.isNaN) null
      else java.lang.Double.valueOf(1.0 -
        new org.apache.commons.math3.distribution.FDistribution(2.0, dfDen)
          .cumulativeProbability(math.max(chowF, 0.0)))
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def r4(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = df.sparkSession
    import spark.implicits._
    Seq(
      ("pooled", p.n, r6(p.slope), r6(p.intercept), r6(p.rss),
        Option(r4(chowF)), Option(chowP).map(_.doubleValue)),
      ("post", b.n, r6(b.slope), r6(b.intercept), r6(b.rss), None, None),
      ("pre", a.n, r6(a.slope), r6(a.intercept), r6(a.rss), None, None))
      .toDF("segment", "n", "slope", "intercept", "rss", "chow_f", "chow_p")
      .orderBy("segment")
  }

  /** Durbin–Watson autocorrelation diagnostic (Durbin & Watson 1950,
    * public) for an OLS trend over an integer-granular series:
    * DW = Σ(e_t − e_{t−1})² / Σe_t², ≈ 2 for independent residuals,
    * → 0 under positive serial correlation (the classic "my daily KPI
    * trend's CI is a lie" smell), → 4 under negative.
    *
    * `tCol` must be an integer grain (day index, hour bucket) — the
    * caller aggregates raw events to a calendar-bounded series first,
    * which is what keeps this scale-safe: the OLS is ONE moment
    * aggregate, residuals are a broadcast-literal map, and the lag pair
    * (t−1, t) is a self-join on t+1 — no unpartitioned window anywhere.
    * Calendar gaps carry no consecutive pair and are skipped (reported
    * via n_pairs, the standard gap treatment).
    *
    * Cross-engine exactness: moment sums fold as round-6/round-9
    * decimals; slope and intercept are the same double combine of those
    * exact sums in both engines; residuals round to 6 BEFORE the
    * squared folds. Returns one row (n, n_pairs, slope, intercept, dw),
    * slope round-9, intercept/dw round-6; dw is null when the residual
    * sum of squares is zero (a perfectly linear series). */
  /** Breusch–Pagan heteroscedasticity test (Breusch & Pagan 1979;
    * Koenker's studentized LM form, public) for the simple OLS fit of y
    * on x: regress the squared residuals on x and report LM = n·R²_aux —
    * large LM means the error variance moves with x, i.e. the OLS
    * standard errors (t9, [[ols]]) are not trustworthy and the caller
    * should switch to robust SEs or model the variance.
    *
    * Two full-data moment aggregations (main fit, then the auxiliary
    * regression of e² on x) with driver-literal slope/intercept between
    * them — the [[durbinWatson]] shape: no window, no join, scales to
    * any row count. Cross-engine exactness: round-6/9 decimal folds,
    * identical double combines, residuals rounded to 6 before squaring.
    * Returns one row (n, slope, intercept, r2_aux, lm): r2_aux round-9,
    * lm round-6; both null when e² has no variance (exact
    * homoscedasticity). The χ²(1) p is library-only — callers needing it
    * use [[breuschPaganP]]. */
  def breuschPagan(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val nn = df.filter(x.isNotNull && y.isNotNull)
      .select(x.as("x"), y.as("y"))
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    val m = nn.agg(
        count(lit(1)).as("n"),
        fold(round(col("x"), 9)).as("sx"),
        fold(round(col("x") * col("x"), 6)).as("sxx"),
        fold(round(col("y"), 9)).as("sy"),
        fold(round(col("x") * col("y"), 6)).as("sxy"))
      .head()
    val n = m.getAs[Long]("n")
    require(n >= 3, s"Breusch-Pagan needs >= 3 points, got $n")
    val (sx, sxx, sy, sxy) = (m.getAs[Double]("sx"), m.getAs[Double]("sxx"),
      m.getAs[Double]("sy"), m.getAs[Double]("sxy"))
    val denx = n * sxx - sx * sx
    require(denx != 0.0, "x has no variance - no fit to diagnose")
    val slope = (n * sxy - sx * sy) / denx
    val intercept = (sy - slope * sx) / n
    val e = round(col("y") - (lit(intercept) + lit(slope) * col("x")), 6)
    val g = nn.select(col("x"), (e * e).as("g"))
    val a = g.agg(
        fold(round(col("g"), 6)).as("sg"),
        fold(round(col("g") * col("g"), 6)).as("sgg"),
        fold(round(col("x") * col("g"), 6)).as("sxg"))
      .head()
    val (sg, sgg, sxg) = (a.getAs[Double]("sg"), a.getAs[Double]("sgg"),
      a.getAs[Double]("sxg"))
    val deng = n * sgg - sg * sg
    def hu(v: Double, s: Int) = java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val r2: Option[Double] =
      if (deng <= 0.0) None
      else {
        val num = n * sxg - sx * sg
        Some(num * num / (denx * deng))
      }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, hu(slope, 9), hu(intercept, 6),
        r2.map(hu(_, 9)), r2.map(v => hu(n * v, 6))))
      .toDF("n", "slope", "intercept", "r2_aux", "lm")
  }

  /** Newey–West (HAC) standard error for the OLS trend slope over an
    * integer-grain series (Newey & West 1987, public) — the REMEDY for
    * what [[durbinWatson]] diagnoses: with serially-correlated
    * residuals the textbook OLS SE is too small, and the Bartlett-
    * weighted long-run variance S = γ₀ + 2·Σ_{l≤L} (1 − l/(L+1))·γ_l of
    * the score u_t = (t − t̄)·e_t fixes it:
    * Var(β̂) = S / (Σ(t−t̄)²)².
    *
    * Same scale shape as [[durbinWatson]]: one moment aggregate, driver
    * literals, round-6 residual scores, then one lag join per l (L
    * bounded, lag pairs skip calendar gaps — the acfDaily treatment).
    * γ terms fold as round-12 decimals. Returns one row (n, slope,
    * se_ols, se_nw, ratio): slope round-9, SEs round-9, ratio = se_nw /
    * se_ols round-6 (> 1 under positive serial correlation); se/ratio
    * null when the residual variance is zero. */
  def neweyWestSlope(
      series: DataFrame, tCol: String, yCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"maxLag in [1,366]: $maxLag")
    val t = col(tCol).cast("long")
    val y = col(yCol).cast(DoubleType)
    val nn = series.filter(t.isNotNull && y.isNotNull)
      .select(t.as("t"), y.as("y"))
    def fold12(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,14)")).cast("double")
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    val m = nn.agg(
        count(lit(1)).as("n"),
        sum(col("t")).as("st"),
        sum(col("t") * col("t")).as("stt"),
        fold(round(col("y"), 9)).as("sy"),
        fold(round(col("t") * col("y"), 6)).as("sty"))
      .head()
    val n = m.getAs[Long]("n")
    require(n >= maxLag + 3,
      s"Newey-West with L=$maxLag needs >= ${maxLag + 3} points, got $n")
    val st = m.getAs[Long]("st").toDouble
    val stt = m.getAs[Long]("stt").toDouble
    val sy = m.getAs[Double]("sy")
    val sty = m.getAs[Double]("sty")
    val den = n * stt - st * st
    require(den != 0.0, "t has no variance - no trend to fit")
    val slope = (n * sty - st * sy) / den
    val intercept = (sy - slope * st) / n
    val tBar = st / n
    // score u_t = (t − t̄)·e_t with the round-6 residual; sxx = Σ(t−t̄)²
    val scored = nn.select(col("t"),
      (round(col("y") - (lit(intercept) + lit(slope) * col("t")), 6)
        * (col("t") - lit(tBar))).as("u"),
      ((col("t") - lit(tBar)) * (col("t") - lit(tBar))).as("d2"),
      round(col("y") - (lit(intercept) + lit(slope) * col("t")), 6)
        .as("e"))
    val base = scored.agg(
        fold12(col("u") * col("u")).as("g0"),
        fold(col("d2")).as("sxx"),
        fold12(col("e") * col("e")).as("ess"))
      .head()
    val g0 = base.getAs[Double]("g0")
    val sxx = base.getAs[Double]("sxx")
    val ess = base.getAs[Double]("ess")
    val spark = series.sparkSession
    val lags = spark.range(1, maxLag + 1).select(col("id").as("l"))
    val a = scored.select(col("t"), col("u")).crossJoin(broadcast(lags))
    val bSide = scored.select((col("t")).as("__bt"), col("u").as("ub"))
    val gammas = a.join(bSide, col("__bt") === col("t") + col("l"))
      .groupBy("l").agg(fold12(col("u") * col("ub")).as("g"))
      .collect().map(r => r.getAs[Long]("l") -> r.getAs[Double]("g")).toMap
    def hu(v: Double, s: Int) = java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    import spark.implicits._
    if (ess <= 0.0) {
      Seq((n, hu(slope, 9), Option.empty[Double], Option.empty[Double],
          Option.empty[Double]))
        .toDF("n", "slope", "se_ols", "se_nw", "ratio")
    } else {
      // Σ in FIXED lag order 1..L — k terms of driver doubles, the same
      // left-to-right fold the oracle replays
      var s = g0
      var l = 1
      while (l <= maxLag) {
        val w = 1.0 - l.toDouble / (maxLag + 1.0)
        s += 2.0 * w * gammas.getOrElse(l.toLong, 0.0)
        l += 1
      }
      val seOls = math.sqrt((ess / (n - 2)) / sxx)
      val seNw = if (s <= 0.0) 0.0 else math.sqrt(s / (sxx * sxx))
      val ratio: Option[Double] =
        if (seOls > 0.0) Some(hu(seNw / seOls, 6)) else None
      Seq((n, hu(slope, 9), Some(hu(seOls, 9)), Some(hu(seNw, 9)), ratio))
        .toDF("n", "slope", "se_ols", "se_nw", "ratio")
    }
  }

  /** χ²(1) upper-tail p for a [[breuschPagan]] LM statistic. */
  def breuschPaganP(lm: Double): Double =
    1.0 - new org.apache.commons.math3.distribution.ChiSquaredDistribution(
      1.0).cumulativeProbability(lm)

  def durbinWatson(
      series: DataFrame, tCol: String, yCol: String): DataFrame = {
    val t = col(tCol).cast("long")
    val y = col(yCol).cast(DoubleType)
    val nn = series.filter(t.isNotNull && y.isNotNull)
      .select(t.as("t"), y.as("y"))
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    val m = nn.agg(
        count(lit(1)).as("n"),
        sum(col("t")).as("st"),
        sum(col("t") * col("t")).as("stt"),
        fold(round(col("y"), 9)).as("sy"),
        fold(round(col("t") * col("y"), 6)).as("sty"))
      .head()
    val n = m.getAs[Long]("n")
    require(n >= 3, s"Durbin-Watson needs >= 3 points, got $n")
    val st = m.getAs[Long]("st").toDouble
    val stt = m.getAs[Long]("stt").toDouble
    val sy = m.getAs[Double]("sy")
    val sty = m.getAs[Double]("sty")
    val den = n * stt - st * st
    require(den != 0.0, "t has no variance - no trend to fit")
    val slope = (n * sty - st * sy) / den
    val intercept = (sy - slope * st) / n
    val resid = nn.select(col("t"),
      round(col("y") - (lit(intercept) + lit(slope) * col("t")), 6).as("e"))
    val ess = resid.agg(fold(round(col("e") * col("e"), 12)).as("ess"))
    val prev = resid.select((col("t") + 1L).as("t"), col("e").as("e_prev"))
    val numDf = resid.join(prev, Seq("t"))
      .agg(
        count(lit(1)).as("n_pairs"),
        fold(round((col("e") - col("e_prev")) * (col("e") - col("e_prev")),
          12)).as("num"))
    numDf.crossJoin(broadcast(ess))
      .select(
        lit(n).as("n"), col("n_pairs"),
        lit(java.math.BigDecimal.valueOf(slope)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
          .as("slope"),
        lit(java.math.BigDecimal.valueOf(intercept)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
          .as("intercept"),
        when(col("ess") > 0.0, round(col("num") / col("ess"), 6))
          .as("dw"))
  }

  /** Variance inflation factors for a THREE-feature design (the
    * closed-form case; VIF itself is textbook regression diagnostics,
    * public): VIF_i = 1/(1 − R²_i) where R²_i is feature i regressed on
    * the other two — computed from the pairwise correlations via the
    * 3×3 inverse: VIF_i = (1 − r_jk²)/det, det = 1 + 2·r₁₂r₁₃r₂₃ −
    * r₁₂² − r₁₃² − r₂₃². VIF > 5–10 = the coefficient on that feature
    * is noise; run it BEFORE trusting any multi-feature fit's
    * per-feature story. For k > 3 invert the correlation matrix —
    * the input here is deliberately the replayable closed form.
    *
    * ONE aggregation builds all nine moment sums (round-12 decimal
    * folds, rows pairwise-complete across ALL three columns so every r
    * shares one n); correlations round to 9, the rest is driver
    * arithmetic. Returns one row per feature (feature, r_squared, vif)
    * ordered by feature, round-6. */
  def vif3(df: DataFrame, cols3: Seq[String]): DataFrame = {
    require(cols3.length == 3 && cols3.distinct.length == 3,
      s"vif3 takes exactly 3 distinct features, got $cols3")
    val Seq(c1, c2, c3) = cols3.map(c => col(c).cast(DoubleType))
    val base = df.filter(c1.isNotNull && c2.isNotNull && c3.isNotNull &&
      !isnan(c1) && !isnan(c2) && !isnan(c3))
      .select(c1.as("x1"), c2.as("x2"), c3.as("x3"))
    def fold12(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast(DoubleType)
    val r = base.agg(
      count(lit(1)).as("n"),
      fold12(col("x1")).as("s1"), fold12(col("x2")).as("s2"),
      fold12(col("x3")).as("s3"),
      fold12(col("x1") * col("x1")).as("s11"),
      fold12(col("x2") * col("x2")).as("s22"),
      fold12(col("x3") * col("x3")).as("s33"),
      fold12(col("x1") * col("x2")).as("s12"),
      fold12(col("x1") * col("x3")).as("s13"),
      fold12(col("x2") * col("x3")).as("s23")).head()
    val n = r.getAs[Long]("n")
    require(n >= 4, s"VIF needs >= 4 complete rows, got $n")
    def g(i: String) = r.getAs[Double](i)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def corr(si: Double, sj: Double, sij: Double, sii: Double,
        sjj: Double): Double = {
      val num = sij - si * sj / n
      val di = sii - si * si / n
      val dj = sjj - sj * sj / n
      require(di > 0.0 && dj > 0.0,
        "a constant feature has no VIF - drop it first")
      r9(num / math.sqrt(di * dj))
    }
    val r12 = corr(g("s1"), g("s2"), g("s12"), g("s11"), g("s22"))
    val r13 = corr(g("s1"), g("s3"), g("s13"), g("s11"), g("s33"))
    val r23 = corr(g("s2"), g("s3"), g("s23"), g("s22"), g("s33"))
    val det = 1.0 + 2.0 * r12 * r13 * r23 -
      r12 * r12 - r13 * r13 - r23 * r23
    require(det > 1e-12,
      s"singular correlation matrix (det=$det) - features are collinear")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    // VIF_i = (1 − r_jk²)/det; R²_i = 1 − 1/VIF_i
    Seq((cols3(0), r23), (cols3(1), r13), (cols3(2), r12)).map {
      case (name, rjk) =>
        val v = (1.0 - rjk * rjk) / det
        (name, r6(1.0 - 1.0 / v), r6(v))
    }.toDF("feature", "r_squared", "vif").orderBy("feature")
  }

  /** OLS influence diagnostics for the simple fit y ~ x (leverage +
    * Cook's distance — Cook 1977, public): h_i = 1/n + (x_i−x̄)²/Sxx,
    * D_i = e_i²/(p·s²) · h_i/(1−h_i)² with p = 2. The top-k most
    * influential rows are THE audit list after any [[ols]] fit: a
    * handful of rows with D ≫ 4/n means the slope is those rows'
    * opinion, not the data's.
    *
    * ONE moment aggregation (round-12 decimal folds) fixes the fit;
    * leverage/residual/D are then per-row expressions in the plan
    * (no second shuffle), D rounds to 9 and the top-k cut orders by
    * (D DESC, id) — deterministic. Returns ≤ k rows (id, x, y,
    * leverage, cooks_d), leverage and D round-6. */
  def influenceTopK(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val base = df.select(col(idCol).as("id"),
      col(xCol).cast(DoubleType).as("x"),
      col(yCol).cast(DoubleType).as("y"))
      .filter(col("id").isNotNull && col("x").isNotNull &&
        col("y").isNotNull && !isnan(col("x")) && !isnan(col("y")))
    def fold12(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast(DoubleType)
    val m = base.agg(count(lit(1)).as("n"),
      fold12(col("x")).as("sx"), fold12(col("y")).as("sy"),
      fold12(col("x") * col("x")).as("sxx"),
      fold12(col("y") * col("y")).as("syy"),
      fold12(col("x") * col("y")).as("sxy")).head()
    val n = m.getAs[Long]("n")
    require(n >= 4, s"influence needs >= 4 rows, got $n")
    def g(i: String) = m.getAs[Double](i)
    val mx = g("sx") / n
    val ssx = g("sxx") - g("sx") * g("sx") / n
    require(ssx > 0.0, "constant x - no fit to diagnose")
    val slope = (g("sxy") - g("sx") * g("sy") / n) / ssx
    val icept = g("sy") / n - slope * mx
    val sse = g("syy") - g("sy") * g("sy") / n -
      slope * (g("sxy") - g("sx") * g("sy") / n)
    val s2 = math.max(sse, 0.0) / (n - 2)
    require(s2 > 0.0, "perfect fit - influence undefined (D divides by s2)")
    val h = lit(1.0 / n) +
      (col("x") - mx) * (col("x") - mx) / ssx
    // leverage can be EXACTLY 1 (e.g. x = [0,0,0,1] clears n>=4 and
    // s2>0): D would divide by (1-h)^2 = 0 and an Infinity/NaN would
    // silently top the descending cut — fail as loudly as the
    // constant-x and perfect-fit degeneracies above
    val atLimit = base.filter(h >= 1.0 - 1e-12).count()
    require(atLimit == 0L,
      s"influence undefined: $atLimit row(s) carry leverage 1 (a lone " +
        "off-cluster x determines the fit by itself) - Cook's D divides " +
        "by (1-h)^2; drop or bin the isolated x values first")
    val e = col("y") - (lit(icept) + lit(slope) * col("x"))
    val dRaw = e * e / lit(2.0 * s2) * h / ((lit(1.0) - h) * (lit(1.0) - h))
    base
      .withColumn("cooks_d", round(dRaw, 9))
      .orderBy(col("cooks_d").desc, col("id").asc)
      .limit(topK)
      .select(col("id"), col("x"), col("y"),
        round(h, 6).as("leverage"), round(col("cooks_d"), 6).as("cooks_d"))
  }
}
