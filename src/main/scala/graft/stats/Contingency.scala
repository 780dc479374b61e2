package graft.stats

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-square test of independence between two categorical columns — the
  * standard "are these two labels related" screen (reference analog: the
  * categorical half of the profiling interactions report).
  *
  * One groupBy builds the observed counts; the cell table is the FULL
  * cross product of the observed level domains (margins groupBy +
  * broadcast crossJoin — |A|×|B| rows, bounded by the categorical
  * premise, no data-sized state). Including the unobserved cells is not
  * cosmetic: a structurally-empty cell contributes (0−e)²/e = e to χ²,
  * and dropping those terms understates the statistic exactly when the
  * association is strongest (a perfect copy would score V ≈ 0.72, not
  * 1). Expected counts and cell contributions derive from EXACT integer
  * counts, so the whole table is engine-portable; the χ² statistic is
  * their sum and the p-value comes from commons-math3's χ² CDF
  * driver-side (cells are already driver-small).
  *
  * Expected counts are positive on every grid cell — margins are taken
  * over observed levels, so rowTot and colTot are ≥ 1. Levels missing
  * entirely from one margin reduce the dof accordingly
  * (dof = (|A|−1)(|B|−1) over observed levels).
  */
object Contingency {

  final case class ChiSquareResult(
      chi2: Double, dof: Long, pValue: Double, n: Long)

  /** Contingency cells with expected counts and χ² contributions over the
    * FULL observed-levels grid — unobserved (a, b) pairs appear with
    * observed = 0 and contrib = expected: (a, b, observed, expected,
    * contrib), ordered by (a, b). */
  def cells(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("__cnt"))
    val ra = counts.groupBy("a").agg(sum(col("__cnt")).as("__ra"))
    val cb = counts.groupBy("b").agg(sum(col("__cnt")).as("__cb"))
    val n = counts.agg(sum(col("__cnt")).as("__n"))
    ra.crossJoin(broadcast(cb)).crossJoin(broadcast(n))
      .join(counts, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("__cnt"), lit(0L)))
      .withColumn("expected",
        col("__ra").cast("double") * col("__cb") / col("__n"))
      .withColumn("contrib",
        (col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected"))
      .select(col("a"), col("b"), col("observed"), col("expected"),
        col("contrib"))
      .orderBy("a", "b")
  }

  /** Per-cell mutual-information terms over the same contingency cells:
    * (a, b, observed, term) with term = round((o/n)·ln(o·n/(ra·cb)), 9).
    * Factors go through double BEFORE multiplying (long products of two
    * 10¹¹-row marginals overflow), and the per-cell round makes the
    * downstream decimal sum order-invariant and engine-exact. */
  def miTerms(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("observed"))
    val all = Window.partitionBy()
    val byA = Window.partitionBy(col("a"))
    val byB = Window.partitionBy(col("b"))
    counts
      .withColumn("__n", sum(col("observed")).over(all))
      .withColumn("__ra", sum(col("observed")).over(byA))
      .withColumn("__cb", sum(col("observed")).over(byB))
      .withColumn("term",
        round((col("observed").cast("double") / col("__n")) *
          log((col("observed").cast("double") * col("__n")) /
            (col("__ra").cast("double") * col("__cb"))), 9))
  }

  /** Mutual information I(A;B) in nats, with the marginal entropies and
    * the min-normalized NMI — the feature-selection / target-leakage
    * screen next to [[chiSquare]]: MI ≈ 0 says a feature carries nothing
    * about the label; NMI ≈ 1 says it IS the label (leakage). One cell
    * aggregation; every sum is a decimal fold of per-term rounded
    * doubles, so shard order cannot perturb the result. Returns one row
    * (mi, h_a, h_b, nmi, n); NMI is null when either side is constant
    * (min entropy 0 — normalization undefined). */
  def mutualInformation(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = miTerms(df, colA, colB)
    def entropyOf(margin: String, cnt: String) = cells
      .groupBy(col(margin)).agg(
        max(col(cnt)).as("c"), max(col("__n")).as("n"))
      .select(round(-(col("c").cast("double") / col("n")) *
        log(col("c").cast("double") / col("n")), 9).as("t"))
      .agg(coalesce(sum(col("t").cast("decimal(38,12)")), lit(0))
        .cast("double").as("h"))
    val mi = cells.agg(
      coalesce(sum(col("term").cast("decimal(38,12)")), lit(0))
        .cast("double").as("mi"),
      coalesce(max(col("__n")), lit(0L)).as("n"))
    val ha = entropyOf("a", "__ra").withColumnRenamed("h", "h_a")
    val hb = entropyOf("b", "__cb").withColumnRenamed("h", "h_b")
    mi.crossJoin(ha).crossJoin(hb)
      .select(col("mi"), col("h_a"), col("h_b"),
        when(least(col("h_a"), col("h_b")) > 0,
          col("mi") / least(col("h_a"), col("h_b"))).as("nmi"),
        col("n"))
  }

  /** Normalized categorical-association strengths — Cramér's V
    * (Cramér 1946) and both Theil's U directions (Theil 1970), all
    * public: where [[chiSquare]] answers "is there ANY association"
    * (p-value, sample-size-inflated at corpus scale), these answer "how
    * MUCH" on a fixed [0, 1] scale, which is what feature triage and
    * leakage screens actually rank by. U is asymmetric by design —
    * U(A|B) = I(A;B)/H(A) is the fraction of A's entropy B explains —
    * so a label-leaking feature shows U(label|feature) ≈ 1 even when
    * the feature has many more levels than the label (where symmetric V
    * dilutes).
    *
    * One contingency aggregation feeding both statistics (χ²
    * contributions fold over the full [[cells]] grid — zero cells
    * included — and MI terms over the observed cells, both as rounded
    * decimals); all intermediate state is level-bounded. Returns one
    * row: (n, levels_a, levels_b, chi2, cramers_v, u_a_given_b,
    * u_b_given_a), statistics rounded to 6, normalizations null when
    * undefined (single level / zero entropy). */
  def association(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = cells(df, colA, colB)
    val chi = base.agg(
      coalesce(sum(col("observed")), lit(0L)).as("n"),
      countDistinct(col("a")).as("levels_a"),
      countDistinct(col("b")).as("levels_b"),
      coalesce(sum(round(col("contrib"), 9).cast("decimal(38,12)")),
        lit(0)).cast("double").as("__chi2"))
    val mi = mutualInformation(df, colA, colB)
      .select(col("mi").as("__mi"), col("h_a").as("__ha"),
        col("h_b").as("__hb"))
    val minL = least(col("levels_a"), col("levels_b"))
    chi.crossJoin(mi).select(
      col("n"), col("levels_a"), col("levels_b"),
      round(col("__chi2"), 6).as("chi2"),
      when(col("n") > 0 && minL > 1,
        round(sqrt(col("__chi2") / (col("n") * (minL - 1))), 6))
        .as("cramers_v"),
      when(col("__ha") > 0, round(col("__mi") / col("__ha"), 6))
        .as("u_a_given_b"),
      when(col("__hb") > 0, round(col("__mi") / col("__hb"), 6))
        .as("u_b_given_a"))
  }

  /** Fisher's exact test on the 2×2 table of two boolean flags
    * (Fisher 1935, public) — the small-cell companion to [[chiSquare]],
    * whose χ² approximation breaks exactly where rare-event audits live
    * (expected cell < 5: a rare quality flag crossed with a rare
    * provenance flag). Two-sided p by the standard "sum every table as
    * extreme as observed" rule (pmf(k) ≤ pmf(obs)·(1+1e-7), the scipy
    * boundary convention).
    *
    * Scale shape: ONE aggregation over the data produces the four
    * cells; everything after is a driver loop over the hypergeometric
    * support (bounded by min(rowTotal, colTotal), loudly capped — at
    * that point χ² is the right test anyway). The pmf is
    * exp(Σ lgamma) — the identical formula a SQL oracle replays with
    * its own lgamma, so p is cross-engine comparable at 6 decimals.
    * Rows with a null flag on either side are excluded. Returns one
    * row: (n_tt, n_tf, n_ft, n_ff, odds_ratio, p_two_sided), odds
    * ratio null when a denominator cell is zero, both rounded to 6. */
  def fisherExact(df: DataFrame, flagA: Column, flagB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.select(flagA.as("fa"), flagB.as("fb"))
      .filter(col("fa").isNotNull && col("fb").isNotNull)
      .agg(
        sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("fa") && !col("fb"), 1L).otherwise(0L)).as("d"))
      .head()
    val (a, b, c, d) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3))
    val (r1, r2, c1) = (a + b, c + d, a + c)
    val n = r1 + r2
    require(n > 0, "Fisher's exact needs at least one non-null row")
    val kMin = math.max(0L, c1 - r2)
    val kMax = math.min(r1, c1)
    require(kMax - kMin <= 5000000L,
      s"hypergeometric support ${kMax - kMin} too large for an exact " +
        "test - cells this big want Contingency.chiSquare")
    import org.apache.commons.math3.special.Gamma.logGamma
    def lgC(m: Long, k: Long): Double =
      logGamma(m + 1.0) - logGamma(k + 1.0) - logGamma(m - k + 1.0)
    val denom = lgC(n, c1)
    def pmf(k: Long): Double = math.exp(lgC(r1, k) + lgC(r2, c1 - k) - denom)
    val pObs = pmf(a)
    var p = 0.0
    var k = kMin
    while (k <= kMax) {
      val pk = pmf(k)
      if (pk <= pObs * (1.0 + 1e-7)) p += pk
      k += 1
    }
    val odds: Option[Double] =
      if (b > 0 && c > 0) Some(rd6(a.toDouble * d / (b.toDouble * c)))
      else None
    Seq((a, b, c, d, odds, rd6(math.min(p, 1.0))))
      .toDF("n_tt", "n_tf", "n_ft", "n_ff", "odds_ratio", "p_two_sided")
  }

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0

  /** McNemar's test for PAIRED binary classifiers (McNemar 1947,
    * public): did model A and model B err on the same rows, or is one
    * systematically better? Only the discordant cells carry signal —
    * b = A right & B wrong, c = A wrong & B right — and the statistic
    * is the continuity-corrected χ²₁ = max(|b−c|−1, 0)²/(b+c): Edwards
    * 1948 WITH the correction clamped at zero, so b = c reports χ² = 0
    * exactly (the unclamped Edwards form would give 1/(b+c) there —
    * statsmodels' `mcnemar(exact=False, correction=True)` follows the
    * unclamped form; this implementation deliberately does not
    * overshoot past "no difference"). This is the test [[fisherExact]]
    * cannot do:
    * Fisher treats the two flags as independent samples; McNemar uses
    * the pairing, which is what you have when both classifiers scored
    * the SAME corpus.
    *
    * Scale shape: ONE aggregation over the data (four conditional longs,
    * map-side combined); everything after is driver arithmetic on the
    * 2×2. Rows with a null truth or prediction are excluded. Returns one
    * row (n, n_both_right, n_only_a, n_only_b, n_both_wrong, chi2_cc,
    * p_value): χ² is an exact integer ratio rounded to 9; the χ²(1) p is
    * library-only. χ² and p are null when b + c = 0 (the models never
    * disagree — nothing to test). */
  def mcnemar(
      df: DataFrame, truth: Column, predA: Column,
      predB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val okA = predA === truth
    val okB = predB === truth
    val row = df
      .filter(truth.isNotNull && predA.isNotNull && predB.isNotNull)
      .agg(
        sum(when(okA && okB, 1L).otherwise(0L)).as("rr"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("b"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("c"),
        sum(when(!okA && !okB, 1L).otherwise(0L)).as("ww"))
      .head()
    val (rr, b, c, ww) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3))
    val n = rr + b + c + ww
    require(n > 0, "McNemar needs at least one fully-classified row")
    val disc = b + c
    val result: (Option[Double], Option[Double]) =
      if (disc == 0L) (None, None)
      else {
        val dev = math.abs(b - c) - 1L
        val chi2 =
          if (dev <= 0L) 0.0
          else dev.toDouble * dev / disc
        (Some(BigDecimal(chi2).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble),
          Some(rd6(1.0 - new ChiSquaredDistribution(1.0)
            .cumulativeProbability(chi2))))
      }
    Seq((n, rr, b, c, ww, result._1, result._2))
      .toDF("n", "n_both_right", "n_only_a", "n_only_b", "n_both_wrong",
        "chi2_cc", "p_value")
  }

  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel pooled odds ratio
    * (Cochran 1954; Mantel & Haenszel 1959 — public): "are these two
    * flags associated AFTER controlling for a stratum" — the
    * Simpson's-paradox-proof version of [[chiSquare]] on 2×2 tables.
    * A flag pair that looks associated marginally but not within any
    * stratum (or vice versa — the classic confounding failure) is
    * exactly what a per-cohort quality audit must distinguish.
    * CMH χ²₁ = (Σ(a_s − r1·c1/n))² / Σ(r1·r2·c1·c2/(n²(n−1)));
    * OR_MH = Σ(a·d/n) / Σ(b·c/n). No continuity correction (the
    * scipy/statsmodels default).
    *
    * One stratum-keyed aggregation builds the per-stratum cells;
    * per-stratum terms are rounded to 12 and folded as decimals
    * (stratum-count-bounded state, order-invariant, oracle-exact);
    * the χ²(1) p is library-only. Strata with n < 2 carry no
    * information (both terms are 0/undefined) and are EXCLUDED,
    * reported via k_strata. Returns one row: (k_strata, n_total,
    * chi2_cmh, or_mh), statistics rounded to 6, or_mh null when every
    * stratum has an empty discordant diagonal. */
  def cmh(
      df: DataFrame, stratumCol: Column, flagA: Column,
      flagB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(stratumCol.cast("string").as("s"), flagA.as("fa"),
        flagB.as("fb"))
      .filter(col("s").isNotNull && col("fa").isNotNull &&
        col("fb").isNotNull)
      .groupBy("s").agg(
        sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("fa") && !col("fb"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .filter(col("n") >= 2)
    val folded = cells
      .withColumn("r1", (col("a") + col("b")).cast("double"))
      .withColumn("r2", (col("c") + col("d")).cast("double"))
      .withColumn("c1", (col("a") + col("c")).cast("double"))
      .withColumn("c2", (col("b") + col("d")).cast("double"))
      .agg(
        count(lit(1)).as("k"),
        coalesce(sum(col("n")), lit(0L)).as("n_total"),
        coalesce(sum(round(col("a") - col("r1") * col("c1") / col("n"), 12)
          .cast("decimal(38,14)")), lit(0)).cast("double").as("num"),
        coalesce(sum(round(col("r1") * col("r2") * col("c1") * col("c2")
          / (col("n").cast("double") * col("n") * (col("n") - 1)), 12)
          .cast("decimal(38,14)")), lit(0)).cast("double").as("den"),
        coalesce(sum(round(col("a").cast("double") * col("d") / col("n"),
          12).cast("decimal(38,14)")), lit(0)).cast("double").as("orn"),
        coalesce(sum(round(col("b").cast("double") * col("c") / col("n"),
          12).cast("decimal(38,14)")), lit(0)).cast("double").as("ord"))
      .head()
    val k = folded.getAs[Long]("k")
    require(k >= 1, "no stratum carries 2+ classified rows")
    val den = folded.getAs[Double]("den")
    require(den > 0.0,
      "every informative stratum is degenerate (a constant flag) — " +
        "nothing to test")
    val num = folded.getAs[Double]("num")
    val chi2 = num * num / den
    val ord = folded.getAs[Double]("ord")
    val orMh: Option[Double] =
      if (ord > 0.0) Some(rd6(folded.getAs[Double]("orn") / ord)) else None
    Seq((k, folded.getAs[Long]("n_total"), rd6(chi2), orMh,
        rd6(1.0 - new ChiSquaredDistribution(1.0)
          .cumulativeProbability(chi2))))
      .toDF("k_strata", "n_total", "chi2_cmh", "or_mh", "p_value")
  }

  /** χ² statistic, degrees of freedom, p-value. Returns None when the
    * table is degenerate (fewer than 2 observed levels on either side). */
  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955, public):
    * does a binary rate TREND across ordered, integer-scored levels
    * (dose, severity grade, version number)? [[chiSquare]] on the 2×k
    * table answers "differs anywhere" and wastes its k−1 degrees of
    * freedom doing it; CA spends ONE df on the ordered alternative —
    * the standard monotone-dose–response screen.
    *
    * Z = Σsᵢ(aᵢ − nᵢp̄) / √(p̄(1−p̄)(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N)) over the
    * level-bounded score table. ONE map-side-combined aggregation
    * produces the five exact sums (N, A, Σs·n, Σs·a, Σs²·n — folded in
    * decimal, the score products pass a long at corpus scale);
    * everything after is fixed double arithmetic a SQL oracle replays.
    * Returns one row (k_levels, n, n_pos, z, p_value): z round-6; the
    * two-sided normal p is library-only. `scoreCol` must cast to long
    * (the scores ARE the trend weights); null score or flag rows are
    * excluded. */
  def cochranArmitage(
      df: DataFrame, flagCol: Column, scoreCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val r = df
      .select(flagCol.as("f"), scoreCol.cast("long").as("s"))
      .filter(col("f").isNotNull && col("s").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("f"), 1L).otherwise(0L)).as("a"),
        count_distinct(col("s")).as("k"),
        sum(col("s").cast(dec)).as("sn"),
        sum(when(col("f"), col("s")).otherwise(0L).cast(dec)).as("sa"),
        sum((col("s").cast(dec) * col("s"))).as("s2n"))
      .head()
    val n = r.getAs[Long]("n"); val a = r.getAs[Long]("a")
    val k = r.getAs[Long]("k")
    require(n > 0, "Cochran-Armitage needs classified rows")
    require(k >= 2, s"trend needs >= 2 score levels, got $k")
    require(a > 0 && a < n,
      s"all-positive or all-negative outcome - no rate to trend (a=$a n=$n)")
    val sn = r.getAs[java.math.BigDecimal]("sn").doubleValue
    val sa = r.getAs[java.math.BigDecimal]("sa").doubleValue
    val s2n = r.getAs[java.math.BigDecimal]("s2n").doubleValue
    val pBar = a.toDouble / n
    val num = sa - pBar * sn
    val den2 = pBar * (1.0 - pBar) * (s2n - sn * sn / n)
    require(den2 > 0.0, "constant score - trend geometry degenerate")
    val z = num / math.sqrt(den2)
    val p = 2.0 * (1.0 - new org.apache.commons.math3.distribution
      .NormalDistribution(0.0, 1.0).cumulativeProbability(math.abs(z)))
    Seq((k, n, a, rd6(z), rd6(math.min(p, 1.0))))
      .toDF("k_levels", "n", "n_pos", "z", "p_value")
  }

  /** G-test of independence (likelihood-ratio χ², Woolf 1957 — public):
    * G = 2·Σ O·ln(O/E) over the observed contingency cells — the
    * information-theoretic twin of [[chiSquare]] (G = 2N·MI in nats),
    * preferred when any cell is far from its expectation because the
    * log-likelihood form doesn't explode the way (O−E)²/E does.
    * Reports the Williams-corrected G_adj = G/q alongside
    * (q = 1 + (N·Σ1/rᵢ − 1)(N·Σ1/cⱼ − 1)/(6N(R−1)(C−1)), Williams
    * 1976 — the small-expected-count fix).
    *
    * Rides the [[cells]] table (one groupBy + broadcast margins);
    * empty cells contribute 0 to G (lim x·ln x = 0 — unlike χ², no
    * empty-cell term). Per-cell terms round to 9 and fold as decimals
    * (the [[miTerms]] order-invariance recipe, ln parity established);
    * the margins for q are level-bounded driver arithmetic. Returns one
    * row (n, levels_a, levels_b, dof, g, g_williams, p_value): G round-
    * 6; the χ²(dof) p (on the corrected G) is library-only. */
  def gTest(df: DataFrame, colA: String, colB: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = cells(df, colA, colB)
    val termed = c.filter(col("observed") > 0)
      .select(col("a"), col("b"), col("observed"),
        round(col("observed").cast("double") *
          log(col("observed").cast("double") / col("expected")), 9)
          .as("term"))
    val gRow = termed.agg(
      sum(col("term").cast("decimal(38,12)")).cast("double").as("gHalf"),
      sum(col("observed")).as("n")).head()
    val g = 2.0 * gRow.getAs[Double]("gHalf")
    val n = gRow.getAs[Long]("n")
    require(n > 0, "G-test needs classified rows")
    val rows = c.groupBy("a").agg(sum(col("observed")).as("m"))
      .select(col("m")).as[Long].collect().sorted
    val cols = c.groupBy("b").agg(sum(col("observed")).as("m"))
      .select(col("m")).as[Long].collect().sorted
    val (nr, nc) = (rows.length, cols.length)
    require(nr >= 2 && nc >= 2,
      s"G-test needs >= 2 levels per margin, got $nr x $nc")
    val dof = (nr - 1).toLong * (nc - 1)
    // reciprocal-margin sums fold as round-12 decimals so the oracle's
    // SUM is order-invariant against this sorted driver fold
    def recipSum(ms: Array[Long]): Double =
      ms.map(m => BigDecimal(1.0 / m)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val q = 1.0 +
      (n.toDouble * recipSum(rows) - 1.0) *
        (n.toDouble * recipSum(cols) - 1.0) /
        (6.0 * n * (nr - 1) * (nc - 1))
    val gw = g / q
    val p = 1.0 - new ChiSquaredDistribution(dof.toDouble)
      .cumulativeProbability(math.max(gw, 0.0))
    Seq((n, nr.toLong, nc.toLong, dof, rd6(g), rd6(gw), rd6(p)))
      .toDF("n", "levels_a", "levels_b", "dof", "g", "g_williams",
        "p_value")
  }

  /** Odds ratio with the Woolf logit CI (Woolf 1955, public) for a 2×2
    * flag pair: OR = ad/bc, ln OR ± z·√(1/a+1/b+1/c+1/d) — the EFFECT
    * SIZE with uncertainty that [[fisherExact]]'s p alone doesn't give
    * (at corpus n everything is "significant"; the CI says whether the
    * association could still be trivially small). A zero cell applies
    * the Haldane–Anscombe +0.5 to ALL cells (flagged in the output) —
    * the standard finite correction, not a silent null.
    *
    * ONE aggregation (four exact longs); the z quantile is the shared
    * literal 1.959963984540054 (the zQuantile inline convention) and
    * ln/exp ride established parity. Returns one row (n_tt, n_tf,
    * n_ft, n_ff, haldane, odds_ratio, ci_low, ci_high), round-6. */
  def oddsRatioCI(
      df: DataFrame, flagA: Column, flagB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = df.filter(flagA.isNotNull && flagB.isNotNull)
      .agg(
        sum(when(flagA && flagB, 1L).otherwise(0L)).as("a"),
        sum(when(flagA && !flagB, 1L).otherwise(0L)).as("b"),
        sum(when(!flagA && flagB, 1L).otherwise(0L)).as("c"),
        sum(when(!flagA && !flagB, 1L).otherwise(0L)).as("d"))
      .head()
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    require(a + b + c + d > 0, "odds ratio needs classified rows")
    val haldane = a == 0L || b == 0L || c == 0L || d == 0L
    val h = if (haldane) 0.5 else 0.0
    val (ah, bh, ch, dh) = (a + h, b + h, c + h, d + h)
    val or = ah * dh / (bh * ch)
    val se = math.sqrt(1.0 / ah + 1.0 / bh + 1.0 / ch + 1.0 / dh)
    val z = 1.959963984540054
    val lo = math.exp(math.log(or) - z * se)
    val hi = math.exp(math.log(or) + z * se)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((a, b, c, d, haldane, r6(or), r6(lo), r6(hi)))
      .toDF("n_tt", "n_tf", "n_ft", "n_ff", "haldane", "odds_ratio",
        "ci_low", "ci_high")
  }

  def chiSquare(
      df: DataFrame, colA: String, colB: String): Option[ChiSquareResult] = {
    val c = cells(df, colA, colB).collect() // |A|×|B| rows — driver-small
    if (c.isEmpty) return None
    val aLevels = c.map(_.get(0)).distinct.length
    val bLevels = c.map(_.get(1)).distinct.length
    if (aLevels < 2 || bLevels < 2) return None
    val chi2 = c.map(_.getAs[Double]("contrib")).sum
    val n = c.map(_.getAs[Long]("observed")).sum
    val dof = (aLevels - 1).toLong * (bLevels - 1)
    val p = 1.0 - new ChiSquaredDistribution(dof.toDouble)
      .cumulativeProbability(chi2)
    Some(ChiSquareResult(chi2, dof, p, n))
  }
}
