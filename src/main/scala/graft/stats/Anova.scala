package graft.stats

import org.apache.commons.math3.distribution.{FDistribution, TDistribution}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** T12 one-way ANOVA + T13 pairwise t-tests
  * (reference: pages/plotting.py:1356–1466, i.e. scipy `f_oneway` + per-pair
  * independent t-tests with Bonferroni correction and Cohen's d).
  *
  * Everything derives from ONE `groupBy(cat)` aggregate (n, mean, variance
  * per group); F/p/η² and all pairwise statistics are closed-form driver
  * arithmetic over those group moments — no extra scans per pair.
  */
object Anova {

  final case class GroupStats(group: String, n: Long, mean: Double, std: Double,
      min: Double, max: Double)

  final case class AnovaResult(
      fStat: Double, pValue: Double,
      dfBetween: Long, dfWithin: Long, dfTotal: Long,
      ssBetween: Double, ssWithin: Double, ssTotal: Double,
      msBetween: Double, msWithin: Double, etaSquared: Double,
      groups: Seq[GroupStats])

  final case class TTestResult(
      group1: String, group2: String, n1: Long, n2: Long,
      meanDiff: Double, tStat: Double, pValue: Double, pBonferroni: Double,
      cohensD: Double)

  def groupStats(df: DataFrame, catCol: String, yCol: String): Seq[GroupStats] = {
    val y = col(yCol).cast(DoubleType)
    df.filter(col(catCol).isNotNull && y.isNotNull)
      .groupBy(col(catCol).cast(StringType).as("g"))
      .agg(
        count(lit(1)).as("n"), avg(y).as("mean"), stddev_samp(y).as("std"),
        min(y).as("min"), max(y).as("max"))
      .orderBy("g")
      .collect()
      .map(r => GroupStats(r.getAs[String]("g"), r.getAs[Long]("n"),
        r.getAs[Double]("mean"),
        Option(r.getAs[Any]("std")).fold(0.0)(_.asInstanceOf[Double]),
        r.getAs[Double]("min"), r.getAs[Double]("max")))
      .toSeq
  }

  def oneWay(df: DataFrame, catCol: String, yCol: String): Option[AnovaResult] = {
    val gs = groupStats(df, catCol, yCol)
    if (gs.size < 2 || gs.exists(_.n < 2)) return None
    val nTotal = gs.map(_.n).sum
    val grandMean = gs.map(g => g.mean * g.n).sum / nTotal
    val ssBetween = gs.map(g => g.n * math.pow(g.mean - grandMean, 2)).sum
    val ssWithin = gs.map(g => (g.n - 1) * g.std * g.std).sum
    val ssTotal = ssBetween + ssWithin
    val dfB = gs.size - 1L
    val dfW = nTotal - gs.size
    val msB = ssBetween / dfB
    val msW = ssWithin / dfW
    val f = if (msW == 0.0) Double.PositiveInfinity else msB / msW
    val p =
      if (f.isInfinite) 0.0
      else 1.0 - new FDistribution(dfB.toDouble, dfW.toDouble).cumulativeProbability(f)
    val eta2 = if (ssTotal == 0.0) 0.0 else ssBetween / ssTotal
    Some(AnovaResult(f, p, dfB, dfW, nTotal - 1, ssBetween, ssWithin, ssTotal,
      msB, msW, eta2, gs))
  }

  final case class WelchResult(
      group1: String, group2: String, n1: Long, n2: Long,
      meanDiff: Double, tStat: Double, dof: Double, pValue: Double)

  /** Welch's unequal-variance t-tests for every group pair — the scipy
    * default (`equal_var=False`), and the safe choice when group
    * spreads differ (pooled-variance t silently miscalibrates there).
    * Same one-groupBy moment source as [[pairwiseTTests]]; t and the
    * Welch–Satterthwaite dof are fixed double arithmetic over the group
    * moments (oracle-replayable); only the t-CDF p is library-side. */
  def welchTTests(df: DataFrame, catCol: String, yCol: String): Seq[WelchResult] = {
    val gs = groupStats(df, catCol, yCol).filter(_.n >= 2)
    val pairs = for { i <- gs.indices; j <- (i + 1) until gs.size } yield (gs(i), gs(j))
    pairs.map { case (a, b) =>
      val sa = a.std * a.std / a.n
      val sb = b.std * b.std / b.n
      val se2 = sa + sb
      val t = if (se2 == 0.0) 0.0 else (a.mean - b.mean) / math.sqrt(se2)
      val dof =
        if (se2 == 0.0) (a.n + b.n - 2).toDouble
        else se2 * se2 / (sa * sa / (a.n - 1) + sb * sb / (b.n - 1))
      val p = 2.0 * (1.0 - new TDistribution(dof).cumulativeProbability(math.abs(t)))
      WelchResult(a.group, b.group, a.n, b.n, a.mean - b.mean, t, dof, p)
    }
  }

  final case class WelchAnovaResult(
      fStat: Double, df1: Long, df2: Double, pValue: Double,
      k: Int, n: Long)

  /** Welch's heteroscedastic one-way ANOVA (Welch 1951, public) — the
    * k-group generalization of [[welchTTests]] and the test to reach
    * for when [[brownForsythe]] rejects equal variances: groups are
    * weighted by n/s², so a high-variance group cannot drown the
    * others the way it inflates [[oneWay]]'s pooled MSW.
    * F* = [Σw(x̄−x̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Σh],
    * h_j = (1−w_j/Σw)²/(n_j−1), df2 = (k²−1)/(3Σh).
    *
    * One groupBy-moments pass ([[groupStats]]); everything after is
    * fixed double arithmetic over the group-bounded table, so a SQL
    * oracle replays F and df2 (F-CDF p is library-only). Returns None
    * when fewer than 2 eligible groups remain or any group has zero
    * variance (w = n/s² undefined — that group IS its mean; compare
    * it directly). */
  def welchAnova(df: DataFrame, catCol: String, yCol: String): Option[WelchAnovaResult] = {
    val gs = groupStats(df, catCol, yCol).filter(_.n >= 2)
    if (gs.size < 2 || gs.exists(_.std == 0.0)) return None
    val k = gs.size
    val w = gs.map(g => g.n / (g.std * g.std))
    val sw = w.sum
    val xw = gs.zip(w).map { case (g, wj) => wj * g.mean }.sum / sw
    val num = gs.zip(w).map { case (g, wj) =>
      wj * (g.mean - xw) * (g.mean - xw)
    }.sum / (k - 1)
    val hsum = gs.zip(w).map { case (g, wj) =>
      val r = 1.0 - wj / sw
      r * r / (g.n - 1)
    }.sum
    val den = 1.0 + 2.0 * (k - 2) / (k.toDouble * k - 1) * hsum
    val f = num / den
    val df2 = (k.toDouble * k - 1) / (3.0 * hsum)
    val p = 1.0 - new FDistribution((k - 1).toDouble, df2)
      .cumulativeProbability(f)
    Some(WelchAnovaResult(f, (k - 1).toLong, df2, p, k, gs.map(_.n).sum))
  }

  /** Brown–Forsythe homogeneity-of-variance test (Levene's test with
    * median centers — the robust default): one-way ANOVA F on the
    * absolute deviations z = |y − median(group)|. The precondition
    * check for [[oneWay]] itself — a significant W says the equal-
    * variance assumption behind pooled F/t is broken and the Welch
    * family above is the right tool. Group medians come from one exact
    * percentile aggregate, rounded to 6 so both engines center on the
    * same line (the t17/t19 portability recipe); the rest reuses
    * [[oneWay]]'s moment fold verbatim. */
  def brownForsythe(df: DataFrame, catCol: String, yCol: String): Option[AnovaResult] = {
    val y = col(yCol).cast(DoubleType)
    val meds = df.filter(col(catCol).isNotNull && y.isNotNull)
      .groupBy(col(catCol).cast(StringType).as("__g"))
      .agg(round(percentile(y, lit(0.5)), 6).as("__med"))
    val z = df
      .join(meds, col(catCol).cast(StringType) === col("__g"), "inner")
      .withColumn("__z", abs(y - col("__med")))
    oneWay(z, catCol, "__z")
  }

  /** Levene's original test (Levene 1960, public): [[brownForsythe]]
    * with MEAN centers — |x − x̄_g| through the one-way F. More
    * powerful than the median variant under near-normal groups, less
    * robust under heavy tails; with [[bartlett]] the three-way
    * disagreement pattern diagnoses WHY variances look unequal
    * (outliers vs genuine heteroscedasticity). Mean centers round to 6
    * (the med-center convention) so the absolute deviations are
    * engine-identical. */
  def levene(df: DataFrame, catCol: String, yCol: String): Option[AnovaResult] = {
    val y = col(yCol).cast(DoubleType)
    // mean via the round-12 decimal fold (a bare avg() is summation-
    // order-dependent across engines), then the med-center round-6
    val means = df.filter(col(catCol).isNotNull && y.isNotNull)
      .groupBy(col(catCol).cast(StringType).as("__g"))
      .agg(round(
        sum(round(y, 12).cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast(DoubleType) / count(lit(1)), 6).as("__mu"))
    val z = df
      .join(means, col(catCol).cast(StringType) === col("__g"), "inner")
      .withColumn("__z", abs(y - col("__mu")))
    oneWay(z, catCol, "__z")
  }

  /** Independent two-sample t-tests for every group pair, Bonferroni-
    * corrected (×#comparisons, capped at 1.0), pooled-std Cohen's d. */
  def pairwiseTTests(df: DataFrame, catCol: String, yCol: String): Seq[TTestResult] = {
    val gs = groupStats(df, catCol, yCol).filter(_.n >= 2)
    val pairs = for { i <- gs.indices; j <- (i + 1) until gs.size } yield (gs(i), gs(j))
    val nComparisons = pairs.size
    pairs.map { case (a, b) =>
      val va = a.std * a.std; val vb = b.std * b.std
      val pooledVar = ((a.n - 1) * va + (b.n - 1) * vb) / (a.n + b.n - 2).toDouble
      val se = math.sqrt(pooledVar * (1.0 / a.n + 1.0 / b.n))
      val t = if (se == 0.0) 0.0 else (a.mean - b.mean) / se
      val dof = (a.n + b.n - 2).toDouble
      val p = 2.0 * (1.0 - new TDistribution(dof).cumulativeProbability(math.abs(t)))
      val d = if (pooledVar == 0.0) 0.0 else (a.mean - b.mean) / math.sqrt(pooledVar)
      TTestResult(a.group, b.group, a.n, b.n, a.mean - b.mean, t, p,
        math.min(1.0, p * nComparisons), d)
    }
  }

  /** Bartlett's test of equal variances (Bartlett 1937, public) — the
    * high-power homogeneity screen to run BEFORE trusting [[oneWay]]'s
    * pooled error term, complementing [[brownForsythe]]: Bartlett is
    * the likelihood-ratio test (most powerful under normality, fragile
    * under heavy tails), Brown–Forsythe the robust one; report both and
    * disagreement itself flags non-normal groups.
    *
    * T = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] / C with
    * C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)) ~ χ²(k−1).
    *
    * ONE map-side-combined groupBy builds per-group exact moments
    * (n, Σy, Σy² as round-12 decimal folds — the t37 recipe); the k-
    * bounded rollup is driver arithmetic, with the Σln sᵢ² and
    * Σ1/(nᵢ−1) folds rounded per-term to 12 and summed as decimals so
    * a SQL oracle's unordered SUM replays them exactly. Returns one row
    * (k_groups, n_total, t_stat, c_factor, p_value): T and C round-6;
    * the χ²(k−1) p is library-only. Groups need nᵢ ≥ 2 and positive
    * variance (loud otherwise — a zero-variance group makes ln s²
    * undefined and the test meaningless). */
  def bartlett(df: DataFrame, catCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val y = col(yCol).cast(DoubleType)
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val g = df.filter(col(catCol).isNotNull && y.isNotNull && !isnan(y))
      .groupBy(col(catCol).cast(StringType).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(round(y, 12).cast(dec)).cast("double").as("s1"),
        sum(round(y * y, 12).cast(dec)).cast("double").as("s2"))
      .orderBy("g")
      .collect()
    val k = g.length
    require(k >= 2, s"Bartlett needs >= 2 groups, got $k")
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var nTot = 0L
    var ssw = BigDecimal(0)
    var lnSum = BigDecimal(0)
    var recipSum = BigDecimal(0)
    g.foreach { r =>
      val n = r.getAs[Long]("n")
      val s1 = r.getAs[Double]("s1"); val s2 = r.getAs[Double]("s2")
      require(n >= 2, s"group '${r.getAs[String]("g")}' has n=$n < 2")
      val v = (s2 - s1 * s1 / n) / (n - 1)
      require(v > 0.0,
        s"group '${r.getAs[String]("g")}' has zero variance - ln s2 undefined")
      nTot += n
      ssw += r12((n - 1) * v)
      lnSum += r12((n - 1) * math.log(v))
      recipSum += r12(1.0 / (n - 1))
    }
    val dfw = nTot - k
    val sp2 = ssw.toDouble / dfw
    val t = (dfw * math.log(sp2) - lnSum.toDouble)
    val cf = 1.0 + (recipSum.toDouble - 1.0 / dfw) / (3.0 * (k - 1))
    val tStat = t / cf
    val p = 1.0 - new org.apache.commons.math3.distribution
      .ChiSquaredDistribution((k - 1).toDouble)
      .cumulativeProbability(math.max(tStat, 0.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((k.toLong, nTot, r6(tStat), r6(cf), r6(p)))
      .toDF("k_groups", "n_total", "t_stat", "c_factor", "p_value")
  }
}
