package graft.stats

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** T10 distribution analysis (reference: pages/plotting.py:1257–1346):
  * moments (bias-corrected, see [[Moments]]), quantiles/IQR, plus
  * Shapiro–Wilk (3 ≤ n ≤ 5000) and Anderson–Darling (n ≥ 8) normality
  * tests. The moments come from one Spark aggregate; the normality tests
  * run driver-side on the collected column — the reference itself caps
  * Shapiro at n=5000, so bounded collection is the *same* contract, and a
  * seeded sample keeps it bounded on big data.
  */
object Distribution {

  final case class NormalityTest(statistic: Double, pValue: Option[Double],
      criticalValue: Option[Double], isNormal: Boolean)

  /** `skew`/`kurt` here are POPULATION moments (g1, excess g2): the
    * reference's T10 path calls `scipy.stats.skew/kurtosis` with the default
    * bias=True (plotting.py:1282–1283), unlike T1's pandas bias-corrected
    * versions. */
  final case class Analysis(
      n: Long, mean: Double, median: Double, std: Double, variance: Double,
      skew: Option[Double], kurt: Option[Double],
      min: Double, max: Double, range: Double,
      q25: Double, q75: Double, iqr: Double,
      shapiroWilk: Option[NormalityTest], andersonDarling: Option[NormalityTest])

  val ShapiroMaxN = 5000
  val AndersonMinN = 8

  def analyze(df: DataFrame, column: String, seed: Long = 42): Option[Analysis] = {
    val stats = ColumnStats.describe(df, Seq(column)).head
    if (stats.n == 0) return None
    val n = stats.n
    // Population moments for T10 parity (see Analysis scaladoc).
    val popRow = df.agg(
      skewness(col(column)).as("g1"), kurtosis(col(column)).as("g2")).head()
    def opt(name: String): Option[Double] =
      Option(popRow.getAs[Any](name)).map(_.asInstanceOf[Double])

    // Bounded collection for the order-statistic tests (reference cap).
    val values: Array[Double] = {
      val base = df.select(col(column).cast(DoubleType).as("v")).na.drop()
      val capped =
        if (n > ShapiroMaxN)
          base.sample(withReplacement = false, ShapiroMaxN.toDouble / n * 1.1, seed)
            .limit(ShapiroMaxN)
        else base
      capped.collect().map(_.getDouble(0))
    }
    java.util.Arrays.sort(values)

    val sw =
      if (values.length >= 3 && values.length <= ShapiroMaxN)
        Some(Normality.shapiroWilk(values))
      else None
    val ad =
      if (values.length >= AndersonMinN) Some(Normality.andersonDarling(values))
      else None

    Some(Analysis(
      n = n, mean = stats.mean.get, median = stats.median.get,
      std = stats.std.getOrElse(0.0),
      variance = stats.std.map(s => s * s).getOrElse(0.0),
      skew = opt("g1"), kurt = opt("g2"),
      min = stats.min.get, max = stats.max.get,
      range = stats.max.get - stats.min.get,
      q25 = stats.q25.get, q75 = stats.q75.get,
      iqr = stats.q75.get - stats.q25.get,
      shapiroWilk = sw, andersonDarling = ad))
  }

  /** Grubbs' single-outlier test statistic (Grubbs 1950, public):
    * G = max|x − x̄| / s, with the offending value reported. The one
    * formal "is my most extreme point an outlier" test to run before
    * trusting a mean-based metric — the robust-z screen flags points,
    * Grubbs attaches a significance level to the WORST one.
    *
    * Two aggregations: decimal moment folds (mean/sd via the exact
    * recipe), then a struct-max of (round-6 deviation, value) — the
    * deterministic argmax both engines replay (ties on the deviation
    * break toward the larger value). No window, no join, no collect.
    * Returns one row (n, mean_v, sd, outlier_value, g_stat): mean/sd/G
    * round-6, the value raw; G is null when sd = 0 (a constant column
    * has no outliers). Compare G against [[grubbsCritical]] — the
    * t-quantile critical value is library-only. */
  def grubbs(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = df.select(valueCol.cast(DoubleType).as("y"))
      .filter(col("y").isNotNull)
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    val m = b.agg(
        count(lit(1)).as("n"),
        fold(round(col("y"), 9)).as("sy"),
        fold(round(col("y") * col("y"), 6)).as("syy"))
      .head()
    val n = m.getAs[Long]("n")
    require(n >= 3, s"Grubbs needs >= 3 values, got $n")
    val sy = m.getAs[Double]("sy")
    val syy = m.getAs[Double]("syy")
    val mean = sy / n
    val varS = (syy - sy * sy / n) / (n - 1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    if (varS <= 0.0) {
      Seq((n, r6(mean), 0.0, Option.empty[Double], Option.empty[Double]))
        .toDF("n", "mean_v", "sd", "outlier_value", "g_stat")
    } else {
      val sd = math.sqrt(varS)
      val top = b.agg(
          max(struct(round(abs(col("y") - lit(mean)), 6).as("dev"),
            col("y").as("v"))).as("__t"))
        .select(col("__t.dev").as("dev"), col("__t.v").as("v"))
        .head()
      val g = top.getAs[Double]("dev") / sd
      Seq((n, r6(mean), r6(sd), Some(top.getAs[Double]("v")), Some(r6(g))))
        .toDF("n", "mean_v", "sd", "outlier_value", "g_stat")
    }
  }

  /** Log₂-spaced histogram of a positive column — the heavy-tail
    * profiler beside [[hillTailIndex]]: linear bins hide a power law,
    * doubling bins draw it (a straight line of log-counts = Zipf/Pareto
    * territory). Buckets are EXACT-INTEGER: bucket = bitlength(⌊v⌋) − 1
    * for v ≥ 1 (never `floor(log2(v))` — IEEE log2 of 2^k − ε rounds
    * across the boundary in engine-specific ways), values in (0, 1)
    * pool into bucket −1, non-positive/null values are counted and
    * excluded. Bucket edges are exact powers of two.
    *
    * One map-side-combined groupBy; no window, no sort. Returns
    * (bucket, lo_edge, hi_edge, n) ordered by bucket. */
  def log2Histogram(df: DataFrame, valueCol: Column): DataFrame = {
    val v = valueCol.cast(DoubleType)
    val bucket = when(v >= 1.0,
        length(bin(floor(v).cast("long"))).cast("long") - 1L)
      .otherwise(lit(-1L))
    df.filter(v.isNotNull && v > 0.0)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        when(col("bucket") >= 0, pow(lit(2.0), col("bucket")))
          .otherwise(lit(0.0)).as("lo_edge"),
        pow(lit(2.0), col("bucket") + 1).as("hi_edge"),
        col("n"))
      .orderBy("bucket")
  }

  /** Value-at-Risk and Expected Shortfall of the LOWER tail
    * (Rockafellar & Uryasev 2000 formalized ES; both are
    * textbook-public): VaR_α = the α-quantile, ES_α = the mean of
    * everything at or below it — the "how bad is bad" pair for any
    * bounded-downside metric (margin, net credits, score floors). ES is
    * coherent where VaR alone is not: it sees how HEAVY the tail is,
    * not just where it starts.
    *
    * Two aggregates: a round-6 exact-percentile fence (the t17 parity
    * recipe), then one conditional round-9 decimal fold over the
    * INCLUSIVE tail (values exactly on the fence belong to it —
    * deterministic in both engines). Returns one row (n, tail_n, var_q,
    * es), es round-6; fails loudly on an empty column. */
  def expectedShortfall(df: DataFrame, valueCol: Column,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"tail alpha in (0, 0.5): $alpha")
    val v = valueCol.cast(DoubleType)
    val b = df.filter(v.isNotNull)
    val q = b.agg(round(percentile(v, lit(alpha)), 6).as("q")).head()
    require(!q.isNullAt(0), "expected shortfall needs values")
    val fence = q.getDouble(0)
    val inTail = v <= lit(fence)
    b.agg(
        count(lit(1)).as("n"),
        count(when(inTail, 1)).as("tail_n"),
        lit(fence).as("var_q"),
        round(sum(when(inTail, round(v, 9)).cast("decimal(38,12)"))
          .cast("double") / count(when(inTail, 1)), 6).as("es"))
  }

  /** Distribution-free confidence interval for the MEDIAN via order
    * statistics (the binomial/sign-test interval, textbook-public;
    * normal-approximation ranks — the large-sample form): ranks
    * lo = ⌊(n − z·√n)/2⌋ (clamped to ≥ 1), hi = n + 1 − lo, and the CI
    * endpoints are the lo-th and hi-th order statistics. No symmetry or
    * moment assumptions — the honest interval for skewed metrics where
    * a mean ± z·SE is fiction.
    *
    * The rank formula is the engine-portable contract (⌊⌋ of the same
    * double in both engines); the order statistics come from exact
    * `percentile` at p = (rank−1)/(n−1) — an integer index, so the
    * (n−1)·p interpolation is degenerate and the t17 round-6 parity
    * recipe applies. Two aggregates (count, then the three
    * percentiles). Returns one row (n, lo_rank, hi_rank, median, ci_lo,
    * ci_hi), values round-6; fails loudly when n < 8 (the normal
    * approximation and the clamp both stop meaning anything). */
  def medianCI(df: DataFrame, valueCol: Column,
      z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val v = valueCol.cast(DoubleType)
    val n = df.filter(v.isNotNull).count()
    require(n >= 8, s"median CI needs >= 8 values, got $n")
    val loRank = math.max(1L, math.floor((n - z * math.sqrt(n.toDouble))
      / 2.0).toLong)
    val hiRank = n + 1 - loRank
    def at(rank: Long) =
      round(percentile(v, lit((rank - 1).toDouble / (n - 1))), 6)
    df.filter(v.isNotNull).agg(
      lit(n).as("n"), lit(loRank).as("lo_rank"), lit(hiRank).as("hi_rank"),
      round(percentile(v, lit(0.5)), 6).as("median"),
      at(loRank).as("ci_lo"), at(hiRank).as("ci_hi"))
  }

  /** The three Pythagorean means per group — arithmetic, geometric,
    * harmonic — over the POSITIVE values of a column (geometric and
    * harmonic are undefined otherwise; non-positive rows are counted
    * and excluded). GM is the right average for ratios/growth rates,
    * HM for rates (docs/sec, tokens/byte); AM ≥ GM ≥ HM always — the
    * classical inequality, asserted by gates as a free invariant.
    *
    * ONE map-side-combined groupBy: ln and reciprocal terms round to
    * 9/12 and fold as decimals (the house recipe — ln parity at
    * round-9 is established by the KL gates), one double division or
    * exp at the finish, round-6. Returns (key, n_pos, n_nonpos, am,
    * gm, hm) ordered by key. */
  def pythagoreanMeans(
      df: DataFrame, grpCol: Column, valueCol: Column): DataFrame = {
    val v = valueCol.cast(DoubleType)
    val pos = v.isNotNull && v > 0.0
    df.groupBy(grpCol.as("key")).agg(
        count(when(pos, 1)).as("n_pos"),
        count(when(v.isNotNull && v <= 0.0, 1)).as("n_nonpos"),
        sum(when(pos, round(v, 9)).cast("decimal(38,12)")).as("__sv"),
        sum(when(pos, round(log(v), 9)).cast("decimal(38,12)")).as("__sl"),
        sum(when(pos, round(lit(1.0) / v, 12)).cast("decimal(38,14)"))
          .as("__si"))
      .select(col("key"), col("n_pos"), col("n_nonpos"),
        when(col("n_pos") > 0,
          round(col("__sv").cast("double") / col("n_pos"), 6)).as("am"),
        when(col("n_pos") > 0,
          round(exp(col("__sl").cast("double") / col("n_pos")), 6))
          .as("gm"),
        when(col("n_pos") > 0 && col("__si").cast("double") > 0.0,
          round(col("n_pos") / col("__si").cast("double"), 6)).as("hm"))
      .orderBy("key")
  }

  /** Hill estimator of the power-law tail index (Hill 1975, public):
    * α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1)) over the k largest positive
    * values — the heavy-tail QC number: α ≤ 2 means infinite variance
    * (means wander, bootstrap CIs lie), α ≤ 1 means even the mean
    * diverges. Run it on spend, token counts, degree — anything you
    * are about to average.
    *
    * Scale shape: ONE distributed top-(k+1) (TakeOrderedAndProject —
    * k-bounded state per partition, k ≤ 100 000 loud cap); the log fold
    * runs driver-side over those k+1 values. Tie-safe: the top-(k+1)
    * MULTISET is deterministic, and every value tied with the threshold
    * contributes ln(1) = 0, so which tied instance is "the threshold"
    * cannot matter. Exactness: per-term ln rounds to 9, the sum folds
    * exactly, α rounds to 6. Returns one row (k_used, threshold,
    * sum_log, alpha); alpha is null when all top values are equal (a
    * degenerate tail). */
  def hillTailIndex(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k in [2, 100000]: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val top = df.select(valueCol.cast(DoubleType).as("y"))
      .filter(col("y").isNotNull && col("y") > 0.0)
      .orderBy(col("y").desc)
      .limit(k + 1)
      .as[Double].collect()
    require(top.length == k + 1,
      s"Hill needs at least ${k + 1} positive values, got ${top.length}")
    val xk = top.last
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val sumLog = top.take(k).map(x => r9(math.log(x / xk)))
      .foldLeft(BigDecimal(0))(_ + _)
    val alpha: Option[Double] =
      if (sumLog <= 0) None
      else Some(BigDecimal(k.toDouble / sumLog.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    Seq((k.toLong, xk, sumLog.toDouble + 0.0, alpha))
      .toDF("k_used", "threshold", "sum_log", "alpha")
  }

  /** Two-sided Grubbs critical value at level `alpha`:
    * (n−1)/√n · √(t² / (n−2+t²)) with t = t_{α/(2n), n−2}. G above this
    * rejects "no outlier". */
  def grubbsCritical(n: Long, alpha: Double = 0.05): Double = {
    require(n >= 3, s"Grubbs needs >= 3 values, got $n")
    val t = new org.apache.commons.math3.distribution.TDistribution(
      (n - 2).toDouble).inverseCumulativeProbability(1.0 - alpha / (2.0 * n))
    (n - 1).toDouble / math.sqrt(n.toDouble) *
      math.sqrt(t * t / (n - 2 + t * t))
  }
}

/** Normality tests on sorted samples — public-algorithm implementations
  * (no Spark/commons-math builtin exists for either; SURVEY.md §2.5 T10).
  */
object Normality {
  private val stdNormal = new NormalDistribution(0.0, 1.0)

  /** Shapiro–Wilk W and approximate p-value via Royston's AS R94 algorithm
    * (Royston 1995, "Remark AS R94", Applied Statistics 44(4) — the same
    * algorithm scipy wraps). Valid for 3 ≤ n ≤ 5000. */
  def shapiroWilk(sorted: Array[Double]): Distribution.NormalityTest = {
    val n = sorted.length
    require(n >= 3, "Shapiro-Wilk needs n >= 3")

    // Expected values of normal order statistics (Blom approximation) and
    // the Royston-corrected weight vector.
    val m = Array.tabulate(n)(i => stdNormal.inverseCumulativeProbability((i + 1 - 0.375) / (n + 0.25)))
    val mSum2 = m.map(x => x * x).sum
    val c = m.map(_ / math.sqrt(mSum2))
    val u = 1.0 / math.sqrt(n.toDouble)

    val w = new Array[Double](n)
    if (n == 3) { w(0) = math.sqrt(0.5); w(2) = -w(0); w(1) = 0.0 }
    else {
      // Royston polynomial corrections for the two largest weights.
      val p1 = Array(-2.706056, 4.434685, -2.071190, -0.147981, 0.221157, c(n - 1))
      val p2 = Array(-3.582633, 5.682633, -1.752461, -0.293762, 0.042981, c(n - 2))
      val wn = poly(p1, u); val wn1 = poly(p2, u)
      w(n - 1) = wn; w(0) = -wn
      val (ct, phi) =
        if (n > 5) {
          w(n - 2) = wn1; w(1) = -wn1
          (3, (mSum2 - 2 * m(n - 1) * m(n - 1) - 2 * m(n - 2) * m(n - 2)) /
            (1.0 - 2 * wn * wn - 2 * wn1 * wn1))
        } else
          (2, (mSum2 - 2 * m(n - 1) * m(n - 1)) / (1.0 - 2 * wn * wn))
      var i = ct - 1
      while (i < n - ct + 1) { w(i) = m(i) / math.sqrt(phi); i += 1 }
    }

    val mean = sorted.sum / n
    var num = 0.0; var den = 0.0
    var i = 0
    while (i < n) {
      num += w(i) * sorted(i)
      den += (sorted(i) - mean) * (sorted(i) - mean)
      i += 1
    }
    val W = if (den == 0.0) 1.0 else num * num / den

    // Royston's normalizing transformation → p-value.
    val pValue: Double =
      if (n == 3) {
        val pi6 = 1.90985931710274 // 6/pi
        val stqr = 1.04719755119660 // asin(sqrt(3/4))... per AS R94
        math.max(0.0, math.min(1.0, pi6 * (math.asin(math.sqrt(W)) - stqr)))
      } else {
        val lnN = math.log(n.toDouble)
        if (n <= 11) {
          val g = poly(Array(-2.273, 0.459), n.toDouble)
          val mu = poly(Array(0.5440, -0.39978, 0.025054, -6.714e-4), n.toDouble)
          val sigma = math.exp(poly(Array(1.3822, -0.77857, 0.062767, -0.0020322), n.toDouble))
          val z = (-math.log(g - math.log1p(-W)) - mu) / sigma
          1.0 - stdNormal.cumulativeProbability(z)
        } else {
          val mu = poly(Array(-1.5861, -0.31082, -0.083751, 0.0038915), lnN)
          val sigma = math.exp(poly(Array(-0.4803, -0.082676, 0.0030302), lnN))
          val z = (math.log1p(-W) - mu) / sigma
          1.0 - stdNormal.cumulativeProbability(z)
        }
      }
    Distribution.NormalityTest(W, Some(pValue), None, isNormal = pValue > 0.05)
  }

  /** Anderson–Darling A² against the normal with estimated parameters,
    * compared to the 5% critical value with the small-sample adjustment
    * (Stephens 1974 — what scipy's `anderson` implements; the reference
    * uses the 5% significance level, plotting.py:1304–1317). */
  def andersonDarling(sorted: Array[Double]): Distribution.NormalityTest = {
    val n = sorted.length
    require(n >= 2, "Anderson-Darling needs n >= 2")
    val mean = sorted.sum / n
    val variance = sorted.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val sd = math.sqrt(variance)
    if (sd == 0.0)
      return Distribution.NormalityTest(0.0, None, Some(0.787), isNormal = true)

    val eps = 1e-300
    var s = 0.0
    var i = 0
    while (i < n) {
      val zi = stdNormal.cumulativeProbability((sorted(i) - mean) / sd)
      val zni = stdNormal.cumulativeProbability((sorted(n - 1 - i) - mean) / sd)
      s += (2 * i + 1) * (math.log(math.max(zi, eps)) + math.log(math.max(1 - zni, eps)))
      i += 1
    }
    val a2 = -n - s / n
    // scipy's `anderson(dist='norm')` convention (what the reference
    // compares against, plotting.py:1306–1308): the RAW A² vs the 5%
    // critical value 0.787 scaled for sample size.
    val critical5pct = 0.787 / (1.0 + 4.0 / n - 25.0 / (n.toDouble * n))
    Distribution.NormalityTest(a2, None, Some(critical5pct),
      isNormal = a2 < critical5pct)
  }

  /** D'Agostino's K² omnibus normality test (D'Agostino 1970 skewness
    * transform; Anscombe & Glynn 1983 kurtosis transform; D'Agostino,
    * Belanger & D'Agostino 1990 K² — all public, the `scipy.stats
    * .normaltest` recipe) PLUS Jarque–Bera (Jarque & Bera 1980) from the
    * same moments — the DISTRIBUTED, oracle-checkable normality pair
    * beside the driver-side Shapiro–Wilk/Anderson–Darling (whose order
    * statistics have no SQL mirror; K²'s inputs are four moment folds).
    *
    * Two map-side-combined aggregations: the mean (round-6 — the
    * centering CONSTANT both engines share; a fixed shift at the 6th
    * decimal moves g1/g2 below the emitted rounding), then central
    * moment folds Σd², Σd³, Σd⁴ as round-12 decimals — centered folds
    * keep the d⁴ sum ~10 digits smaller than raw x⁴ would be, inside
    * decimal(38,12) headroom at any realistic n. Every transform after
    * is elementary (sqrt/ln/cbrt — cross-engine parity per the Box–Cox
    * ln convention), so the ORACLE replays z_skew, z_kurt, K² and both
    * χ²(2) p-values (survival of χ²₂ is exactly exp(−x/2)) end to end.
    * Normal-z p-values for the individual transforms are library-only
    * and deliberately not emitted (the t52 convention). Requires
    * n ≥ 20 (the Anscombe–Glynn kurtosis approximation's floor — loud)
    * and non-degenerate variance. Returns one row (n, g1, g2, z_skew,
    * z_kurt, k2, k2_p, jb, jb_p), statistics round-6. */
  def dagostinoK2(df: DataFrame, xCol: Column): DataFrame = {
    val x = xCol.cast(DoubleType)
    val base = df.filter(x.isNotNull && !isnan(x)).select(x.as("x"))
    def fold12(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast(DoubleType)
    val m0 = base.agg(count(lit(1)).as("n"), fold12(col("x")).as("s1"))
      .head()
    val n = m0.getAs[Long]("n")
    require(n >= 20,
      s"D'Agostino K2 needs n >= 20 (Anscombe-Glynn kurtosis floor), " +
        s"got $n - use Shapiro-Wilk for small samples")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val mean = r6(m0.getAs[Double]("s1") / n)
    val d = col("x") - lit(mean)
    val m = base.agg(
      fold12(d * d).as("s2"), fold12(d * d * d).as("s3"),
      fold12(d * d * d * d).as("s4")).head()
    val m2 = m.getAs[Double]("s2") / n
    require(m2 > 0.0, "constant column - normality undefined")
    val m3 = m.getAs[Double]("s3") / n
    val m4 = m.getAs[Double]("s4") / n
    // m2·√m2, not pow(m2, 1.5): sqrt is IEEE-exact, pow's last ulp is
    // libm-specific (the Box–Cox no-pow convention)
    val g1 = m3 / (m2 * math.sqrt(m2))
    val b2 = m4 / (m2 * m2)
    val g2 = b2 - 3.0
    val nd = n.toDouble
    // skewness transform (D'Agostino 1970)
    val y = g1 * math.sqrt((nd + 1) * (nd + 3) / (6 * (nd - 2)))
    val beta2 = 3.0 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3) /
      ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9))
    val w2 = -1.0 + math.sqrt(2 * (beta2 - 1))
    val delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    val alpha = math.sqrt(2.0 / (w2 - 1))
    val zSkew = delta * math.log(y / alpha +
      math.sqrt((y / alpha) * (y / alpha) + 1))
    // kurtosis transform (Anscombe & Glynn 1983)
    val eB2 = 3.0 * (nd - 1) / (nd + 1)
    val varB2 = 24.0 * nd * (nd - 2) * (nd - 3) /
      ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5))
    val xStd = (b2 - eB2) / math.sqrt(varB2)
    val sqrtB1 = 6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9)) *
      math.sqrt(6.0 * (nd + 3) * (nd + 5) / (nd * (nd - 2) * (nd - 3)))
    val a = 6.0 + 8.0 / sqrtB1 *
      (2.0 / sqrtB1 + math.sqrt(1 + 4.0 / (sqrtB1 * sqrtB1)))
    val zKurt = ((1 - 2.0 / (9 * a)) -
      math.cbrt((1 - 2.0 / a) / (1 + xStd * math.sqrt(2.0 / (a - 4))))) /
      math.sqrt(2.0 / (9 * a))
    val k2 = zSkew * zSkew + zKurt * zKurt
    val jb = nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, r6(g1), r6(g2), r6(zSkew), r6(zKurt), r6(k2),
      r6(math.exp(-k2 / 2)), r6(jb), r6(math.exp(-jb / 2))))
      .toDF("n", "g1", "g2", "z_skew", "z_kurt", "k2", "k2_p", "jb",
        "jb_p")
  }

  /** Horner evaluation with coefficients ordered c0 + c1·x + c2·x² + …
    * except that `coefs.last` may carry an additive base term (Royston's
    * convention for the weight polynomials, where the base is c(n-1)). */
  private def poly(coefs: Array[Double], x: Double): Double = {
    // For the weight polynomials the last element is the base value and the
    // preceding are ascending powers applied to u; for the mu/sigma/g
    // polynomials all elements are ascending powers. Disambiguate by length-6
    // (weights) vs others.
    if (coefs.length == 6) {
      val base = coefs(5)
      base + coefs(4) * x + coefs(3) * x * x + coefs(2) * x * x * x +
        coefs(1) * x * x * x * x + coefs(0) * x * x * x * x * x
    } else {
      var acc = 0.0
      var i = coefs.length - 1
      while (i >= 0) { acc = acc * x + coefs(i); i -= 1 }
      acc
    }
  }
}
