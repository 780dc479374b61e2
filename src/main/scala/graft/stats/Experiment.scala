package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** A/B experiment analysis: deterministic unit assignment, Welch
  * difference-in-means, and CUPED variance reduction (Deng, Xu, Kohavi &
  * Walker, WSDM 2013 — public): adjust each unit's metric by its
  * PRE-experiment covariate, y′ = y − θ(x − x̄) with θ = cov(x,y)/var(x),
  * shrinking the standard error by the covariate's explanatory power
  * without biasing the treatment effect (assignment is independent of
  * pre-period behavior).
  *
  * Scale shape: one hash aggregation events→units (map-side combined,
  * decimal folds of rounded values so unit metrics are exact and
  * order-invariant), then one ≤-two-row aggregation units→arms carrying
  * ALL the moments CUPED needs (n, Σx, Σy, Σxy, Σx², Σy² per arm) — the
  * adjusted variance is var(y) + θ²var(x) − 2θcov(x,y) per arm, so no
  * second pass over units is ever taken. Driver traffic: two moment
  * rows. Assignment hashes the unit id ([[Sampling.hashFraction]]), so
  * arms are reproducible across engines and reruns, and the whole
  * analysis is DuckDB-oracle-checkable.
  */
object Experiment {

  /** Deterministic 50/50 arm from the unit id: 'treatment' when the
    * portable hash fraction < 0.5. */
  def arm(unitId: Column, seed: String): Column =
    when(Sampling.hashFraction(seed, Seq(unitId)) < 0.5, lit("treatment"))
      .otherwise(lit("control"))

  /** Per-unit (arm, x, y) table from an event log: x = the unit's summed
    * `valueCol` before `splitTs` (the pre-period covariate), y = the sum
    * from `splitTs` on (the experiment metric). Units with activity in
    * only one period keep 0 for the other (absence of events IS the
    * value 0 for an activity metric). Values fold as round(·,9) decimals
    * so both sums are exact. */
  def unitMetrics(events: DataFrame, unitCol: String, tsCol: String,
      valueCol: String, splitTs: String, seed: String): DataFrame = {
    val v = round(col(valueCol), 9).cast("decimal(38,12)")
    val pre = when(col(tsCol) < to_timestamp(lit(splitTs)), v)
      .otherwise(lit(0).cast("decimal(38,12)"))
    val post = when(col(tsCol) >= to_timestamp(lit(splitTs)), v)
      .otherwise(lit(0).cast("decimal(38,12)"))
    events.filter(col(unitCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(unitCol).as("unit"))
      .agg(sum(pre).cast("double").as("x"),
        sum(post).cast("double").as("y"))
      .withColumn("arm", arm(col("unit"), seed))
  }

  /** One-row CUPED analysis over a (arm, x, y) unit table: the raw Welch
    * difference-in-means next to the CUPED-adjusted one, with θ pooled
    * across arms (the standard estimator — assignment independence keeps
    * it unbiased) and the variance-reduction ratio. Outputs are rounded
    * to 8 decimals; moment products are rounded to 6 and folded in
    * decimal(38,12), so every number is engine-portable. */
  def cuped(units: DataFrame): DataFrame = {
    def mom(c: Column): Column =
      sum(round(c, 6).cast("decimal(38,12)")).cast("double")
    // the 2-row moment table is collected ONCE and re-enters the plan as
    // a local relation: no second pass over units, nothing persisted (a
    // persist here leaked cache for the session), and the arms check is
    // loud — a missing arm must not evaporate through the cross join
    // into an empty result the caller mistakes for "no effect"
    val byArmRows = units.groupBy("arm").agg(
      count(lit(1)).cast("double").as("n"),
      mom(col("x")).as("sx"), mom(col("y")).as("sy"),
      mom(col("x") * col("y")).as("sxy"),
      mom(col("x") * col("x")).as("sxx"),
      mom(col("y") * col("y")).as("syy"))
      .collect()
    val arms = byArmRows.map(_.getString(0)).toSet
    require(arms == Set("treatment", "control"),
      s"CUPED needs both arms; found ${arms.toSeq.sorted.mkString(", ")}" +
        " — check the arm column or the assignment seed")
    val spark = units.sparkSession
    val byArm = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(byArmRows: _*)),
      byArmRows.head.schema)
    val t = byArm.filter(col("arm") === "treatment").as("t")
    val c = byArm.filter(col("arm") === "control").as("c")
    val joined = t.crossJoin(c)
    // pooled moments for theta
    val n = col("t.n") + col("c.n")
    val sx = col("t.sx") + col("c.sx")
    val sy = col("t.sy") + col("c.sy")
    val sxy = col("t.sxy") + col("c.sxy")
    val sxx = col("t.sxx") + col("c.sxx")
    val covXy = (sxy - sx * sy / n) / (n - 1)
    val varX = (sxx - sx * sx / n) / (n - 1)
    // a constant pre-period covariate (varX = 0 — e.g. the log starts at
    // launch and every x is 0) determines no theta: fall back to 0 = NO
    // adjustment, rather than letting 0/0 NaN-poison every output
    val theta = when(varX > 0, covXy / varX).otherwise(lit(0.0))
    def armStats(p: String): (Column, Column, Column, Column, Column) = {
      val an = col(s"$p.n")
      val mean = col(s"$p.sy") / an
      val varY = (col(s"$p.syy") - col(s"$p.sy") * col(s"$p.sy") / an) /
        (an - 1)
      val varXa = (col(s"$p.sxx") - col(s"$p.sx") * col(s"$p.sx") / an) /
        (an - 1)
      val covA = (col(s"$p.sxy") - col(s"$p.sx") * col(s"$p.sy") / an) /
        (an - 1)
      val meanX = col(s"$p.sx") / an
      (an, mean, varY, varY + theta * theta * varXa -
        lit(2.0) * theta * covA, meanX)
    }
    val (nT, meanT, varT, varAdjT, meanXT) = armStats("t")
    val (nC, meanC, varC, varAdjC, meanXC) = armStats("c")
    val diffRaw = meanT - meanC
    // adjusted means subtract theta * (arm pre-period mean - pooled):
    // the pooled x-mean cancels in the difference, leaving
    // diff_adj = diff_raw - theta * (meanX_t - meanX_c)
    val diffAdj = diffRaw - theta * (meanXT - meanXC)
    val seRaw = sqrt(varT / nT + varC / nC)
    val seAdj = sqrt(varAdjT / nT + varAdjC / nC)
    joined.select(
      nT.cast("long").as("n_treatment"),
      nC.cast("long").as("n_control"),
      round(theta, 8).as("theta"),
      round(diffRaw, 8).as("diff_raw"),
      round(seRaw, 8).as("se_raw"),
      round(diffAdj, 8).as("diff_adj"),
      round(seAdj, 8).as("se_adj"),
      round(diffRaw / seRaw, 8).as("z_raw"),
      round(diffAdj / seAdj, 8).as("z_adj"),
      round(lit(1.0) - (varAdjT / nT + varAdjC / nC)
        / (varT / nT + varC / nC), 8).as("var_reduction"))
  }

  /** Difference-in-differences (Card & Krueger 1994 popularized the
    * design — public): the 2×2 natural-experiment estimator over
    * unit-period outcomes, effect = (ȳ_t,post − ȳ_t,pre) −
    * (ȳ_c,post − ȳ_c,pre), with the Welch-style SE from the four cell
    * variances — the observational sibling of [[cuped]]'s randomized
    * readout (treatment here is a COHORT, not an assignment, so the
    * parallel-trends assumption replaces randomization and the pre-period
    * cell means ship in the output for exactly that inspection).
    *
    * Input: one row per unit×period with `treatCol`/`postCol` booleans
    * and the outcome. One conditional-aggregation pass builds the four
    * cells (moments as rounded decimal folds — engine-portable); any
    * cell with fewer than 2 units fails loudly (no variance, no SE).
    * Returns one row: per-cell ns and means, effect, se, t_stat,
    * rounded to 8. */
  def differenceInDifferences(rows: DataFrame, treatCol: Column,
      postCol: Column, yCol: Column): DataFrame = {
    def mom(c: Column): Column =
      sum(c.cast("decimal(38,12)")).cast("double")
    def cell(t: Boolean, p: Boolean, c: Column): Column = {
      val in = treatCol === lit(t) && postCol === lit(p)
      when(in, c).otherwise(lit(null))
    }
    val y = round(yCol.cast("double"), 9)
    val aggs = (for {
      t <- Seq(false, true); p <- Seq(false, true)
      tag = (if (t) "t" else "c") + (if (p) "1" else "0")
      a <- Seq(
        count(cell(t, p, y)).as(s"n_$tag"),
        coalesce(mom(cell(t, p, y)), lit(0.0)).as(s"sy_$tag"),
        coalesce(mom(cell(t, p, round(y * y, 6))), lit(0.0)).as(s"syy_$tag"))
    } yield a)
    val m = rows.filter(yCol.isNotNull && treatCol.isNotNull &&
      postCol.isNotNull).agg(aggs.head, aggs.tail: _*)
    val row = m.head()
    Seq("c0", "c1", "t0", "t1").foreach { tag =>
      require(row.getAs[Long](s"n_$tag") >= 2,
        s"DiD cell $tag has ${row.getAs[Long](s"n_$tag")} units — every " +
          "2x2 cell needs >= 2 for a variance; check the cohort/period split")
    }
    val spark = rows.sparkSession
    val local = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(row)), row.schema)
    def mean(tag: String) = col(s"sy_$tag") / col(s"n_$tag")
    def v(tag: String) =
      (col(s"syy_$tag") - col(s"sy_$tag") * col(s"sy_$tag") / col(s"n_$tag")) /
        (col(s"n_$tag") - 1)
    val effect = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    val se = sqrt(v("t1") / col("n_t1") + v("t0") / col("n_t0") +
      v("c1") / col("n_c1") + v("c0") / col("n_c0"))
    local.select(
      col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
      round(mean("c0"), 8).as("mean_control_pre"),
      round(mean("c1"), 8).as("mean_control_post"),
      round(mean("t0"), 8).as("mean_treat_pre"),
      round(mean("t1"), 8).as("mean_treat_post"),
      round(effect, 8).as("did_effect"),
      round(se, 8).as("se"),
      round(effect / se, 8).as("t_stat"))
  }

  /** Two-proportion z-test — the conversion-rate readout beside
    * [[cuped]]'s continuous metric and
    * [[graft.stats.Bootstrap.upliftCi]]'s resampled interval: pooled-SE
    * z statistic (the standard test) plus the unpooled-SE Wald 95% CI
    * on the rate difference. Everything downstream of FOUR integer
    * counts (n, conversions per arm) through fixed double formulas, so
    * both engines derive identical numbers; the normal p-value is
    * library-only. One aggregation pass over unit rows
    * (unit, arm boolean, converted boolean); non-boolean-able
    * conversion values fail loudly via the cast. Returns one row:
    * (n_t, conv_t, rate_t, n_c, conv_c, rate_c, diff, z, ci_lo, ci_hi,
    * p_value) with rates/diff/z/CI rounded to 9. */
  def proportionTest(units: DataFrame, armCol: Column,
      convCol: Column): DataFrame = {
    val r = units.agg(
      sum(when(armCol, 1L).otherwise(0L)).as("nt"),
      sum(when(armCol && convCol, 1L).otherwise(0L)).as("ct"),
      sum(when(!armCol, 1L).otherwise(0L)).as("nc"),
      sum(when(!armCol && convCol, 1L).otherwise(0L)).as("cc")).head()
    val nt = r.getAs[Long]("nt"); val ct = r.getAs[Long]("ct")
    val nc = r.getAs[Long]("nc"); val cc = r.getAs[Long]("cc")
    require(nt > 0 && nc > 0, s"empty arm: treatment=$nt control=$nc")
    val pt = ct.toDouble / nt
    val pc = cc.toDouble / nc
    val diff = pt - pc
    val pPool = (ct + cc).toDouble / (nt + nc)
    val sePool = math.sqrt(pPool * (1.0 - pPool) * (1.0 / nt + 1.0 / nc))
    val z = if (sePool == 0.0) 0.0 else diff / sePool
    val seWald = math.sqrt(pt * (1.0 - pt) / nt + pc * (1.0 - pc) / nc)
    val zCrit = 1.959963984540054 // Φ⁻¹(0.975), shared literal
    val p =
      if (sePool == 0.0) 1.0
      else 2.0 * (1.0 -
        new org.apache.commons.math3.distribution.NormalDistribution(0, 1)
          .cumulativeProbability(math.abs(z)))
    def r9(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = units.sparkSession
    import spark.implicits._
    Seq((nt, ct, r9(pt), nc, cc, r9(pc), r9(diff), r9(z),
        r9(diff - zCrit * seWald), r9(diff + zCrit * seWald), p))
      .toDF("n_t", "conv_t", "rate_t", "n_c", "conv_c", "rate_c",
        "diff", "z", "ci_lo", "ci_hi", "p_value")
  }

  /** Standard-normal quantile Φ⁻¹(p) — public so gates can inline the
    * SAME double literal into both engines (the Bootstrap-thresholds
    * convention for library constants). */
  def zQuantile(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"quantile probability must be in (0,1): $p")
    new org.apache.commons.math3.distribution.NormalDistribution(0, 1)
      .inverseCumulativeProbability(p)
  }

  /** Minimum detectable effect of the experiment as RUN — the power
    * analysis a readout like [[proportionTest]] must ship beside: a
    * non-significant result is only evidence of absence down to the
    * MDE, and teams that skip this line read "p > 0.05 on an
    * underpowered test" as "no effect". Standard two-proportion
    * approximation at the pooled baseline:
    * MDE = (z₁₋α/2 + z_power) · √(p̄(1−p̄)(1/n_t + 1/n_c)).
    *
    * One aggregation pass (the proportionTest counts); everything after
    * is fixed double arithmetic over four integers plus two normal
    * quantiles ([[zQuantile]] literals — library-side, but CONSTANTS,
    * so the oracle inlines the same doubles). Returns one row:
    * (n_t, n_c, rate_pooled, z_alpha, z_power, mde_abs, mde_rel),
    * rates/MDE rounded to 9; mde_rel null at a zero baseline. */
  def minimumDetectableEffect(units: DataFrame, armCol: Column,
      convCol: Column, alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(alpha > 0 && alpha < 1 && power > 0 && power < 1,
      s"alpha=$alpha power=$power must sit in (0,1)")
    val r = units.agg(
      sum(when(armCol, 1L).otherwise(0L)).as("nt"),
      sum(when(!armCol, 1L).otherwise(0L)).as("nc"),
      sum(when(convCol, 1L).otherwise(0L)).as("c")).head()
    val nt = r.getAs[Long]("nt"); val nc = r.getAs[Long]("nc")
    val c = r.getAs[Long]("c")
    require(nt > 0 && nc > 0, s"empty arm: treatment=$nt control=$nc")
    val pBar = c.toDouble / (nt + nc)
    val za = zQuantile(1.0 - alpha / 2.0)
    val zb = zQuantile(power)
    val mde = (za + zb) *
      math.sqrt(pBar * (1.0 - pBar) * (1.0 / nt + 1.0 / nc))
    def r9(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = units.sparkSession
    import spark.implicits._
    Seq((nt, nc, r9(pBar), za, zb, r9(mde),
        if (pBar == 0.0) None else Some(r9(mde / pBar))))
      .toDF("n_t", "n_c", "rate_pooled", "z_alpha", "z_power",
        "mde_abs", "mde_rel")
  }

  /** Poisson rate-ratio comparison of two arms — the COUNT-metric
    * companion to [[proportionTest]]'s binary one: events per unit of
    * exposure (errors per machine-day, purchases per active-user-day),
    * where the binomial model is wrong because one unit can contribute
    * many events. Wald interval on the LOG scale (the standard
    * epidemiology/SRE form): ratio = (k_a/e_a)/(k_b/e_b),
    * CI = exp(ln ratio ± z·√(1/k_a + 1/k_b)), z from the same √ terms.
    *
    * One aggregation pass sums counts and exposures per arm; everything
    * after is fixed double arithmetic over four numbers plus the
    * [[zQuantile]] literal, so a SQL oracle replays every term; only
    * the normal p is library-only (the proportionTest convention).
    * Zero events in either arm fails loudly (the log-Wald SE is
    * undefined — exact Poisson methods are a different tool). Returns
    * one row: (k_a, e_a, k_b, e_b, rate_a, rate_b, ratio, ci_lo,
    * ci_hi, z, p_value); rates/ratio/CI rounded 9, z rounded 6. */
  def rateRatio(df: DataFrame, armCol: Column, countCol: Column,
      exposureCol: Column, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must sit in (0,1): $alpha")
    val r = df
      .filter(armCol.isNotNull && countCol.isNotNull &&
        exposureCol.isNotNull)
      .agg(
        sum(when(armCol, countCol.cast("long")).otherwise(0L)).as("ka"),
        sum(when(armCol, exposureCol.cast("double")).otherwise(0.0))
          .as("ea"),
        sum(when(!armCol, countCol.cast("long")).otherwise(0L)).as("kb"),
        sum(when(!armCol, exposureCol.cast("double")).otherwise(0.0))
          .as("eb")).head()
    val ka = r.getAs[Long]("ka"); val ea = r.getAs[Double]("ea")
    val kb = r.getAs[Long]("kb"); val eb = r.getAs[Double]("eb")
    require(ka > 0 && kb > 0,
      s"log-Wald needs events in both arms, got ka=$ka kb=$kb — use an " +
        "exact Poisson method for zero cells")
    require(ea > 0 && eb > 0, s"exposures must be positive: ea=$ea eb=$eb")
    val rateA = ka / ea
    val rateB = kb / eb
    val ratio = rateA / rateB
    val se = math.sqrt(1.0 / ka + 1.0 / kb)
    val z = math.log(ratio) / se
    val zc = zQuantile(1.0 - alpha / 2.0)
    val p = 2.0 * (1.0 - new org.apache.commons.math3.distribution
      .NormalDistribution(0, 1).cumulativeProbability(math.abs(z)))
    def r9(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((ka, ea, kb, eb, r9(rateA), r9(rateB), r9(ratio),
        r9(ratio * math.exp(-zc * se)), r9(ratio * math.exp(zc * se)),
        r6(z), r6(math.min(p, 1.0))))
      .toDF("k_a", "e_a", "k_b", "e_b", "rate_a", "rate_b", "ratio",
        "ci_lo", "ci_hi", "z", "p_value")
  }

  /** Quantile treatment effects — the DISTRIBUTIONAL readout beside the
    * mean-effect tests: per probability p, the treatment-arm quantile
    * minus the control-arm quantile. A zero mean effect with a positive
    * p90 effect and a negative p10 effect is a variance intervention —
    * exactly what averaging hides (Bitler–Gelbach–Hoynes 2006
    * popularized QTEs; the order-statistic arithmetic is textbook).
    *
    * ONE aggregation computes every per-arm exact percentile
    * (conditional percentile cells — the t17 round-6 parity recipe);
    * effects subtract the ROUNDED quantiles and re-round. Swap
    * approx_percentile in past ~10⁹ rows per arm. Returns one row per p
    * (p, q_treatment, q_control, effect) ordered by p; empty arms fail
    * loudly. */
  def quantileEffects(units: DataFrame, armCol: Column, yCol: Column,
      ps: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"probabilities must sit in (0,1): $ps")
    val y = yCol.cast("double")
    val base = units.filter(armCol.isNotNull && y.isNotNull)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(round(percentile(when(armCol, y), lit(p)), 6).as(s"qt_$i"),
        round(percentile(when(!armCol, y), lit(p)), 6).as(s"qc_$i"))
    } ++ Seq(sum(when(armCol, 1L).otherwise(0L)).as("nt"),
      sum(when(!armCol, 1L).otherwise(0L)).as("nc"))
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    require(r.getAs[Long]("nt") > 0 && r.getAs[Long]("nc") > 0,
      s"empty arm: t=${r.getAs[Long]("nt")} c=${r.getAs[Long]("nc")}")
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = units.sparkSession
    import spark.implicits._
    ps.zipWithIndex.map { case (p, i) =>
      val qt = r.getAs[Double](s"qt_$i")
      val qc = r.getAs[Double](s"qc_$i")
      (p, qt, qc, r6(qt - qc))
    }.toDF("p", "q_treatment", "q_control", "effect").orderBy("p")
  }

  /** Sample-ratio-mismatch (SRM) check — the experiment-hygiene test
    * every A/B readout must pass FIRST (Fabijan et al. 2019 popularized
    * it; the χ² goodness-of-fit itself is Pearson 1900, public): do the
    * realized arm sizes match the intended split? A significant SRM
    * means assignment/logging is broken and every downstream metric is
    * untrustworthy — run it before [[proportionTest]], not after.
    * χ²₁ = (n_t − E_t)²/E_t + (n_c − E_c)²/E_c with E_t = ratio·n.
    *
    * One two-cell aggregation; the χ² is the same double tree in both
    * engines, rounded to 6. Returns one row (n_t, n_c, expected_t,
    * expected_c, chi2, p_value); the χ²(1) p is library-only. */
  def srmTest(units: DataFrame, armCol: Column,
      expectedTreatmentRatio: Double = 0.5): DataFrame = {
    require(expectedTreatmentRatio > 0 && expectedTreatmentRatio < 1,
      s"ratio in (0,1): $expectedTreatmentRatio")
    val r = units.filter(armCol.isNotNull).agg(
        sum(when(armCol, 1L).otherwise(0L)).as("nt"),
        sum(when(!armCol, 1L).otherwise(0L)).as("nc"))
      .head()
    val nt = r.getAs[Long]("nt"); val nc = r.getAs[Long]("nc")
    val n = nt + nc
    require(n > 0, "SRM needs assigned units")
    val et = n * expectedTreatmentRatio
    val ec = n * (1.0 - expectedTreatmentRatio)
    val chi2 = (nt - et) * (nt - et) / et + (nc - ec) * (nc - ec) / ec
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val p = r6(1.0 -
      new org.apache.commons.math3.distribution.ChiSquaredDistribution(1.0)
        .cumulativeProbability(chi2))
    val spark = units.sparkSession
    import spark.implicits._
    Seq((nt, nc, r6(et), r6(ec), r6(chi2), p))
      .toDF("n_t", "n_c", "expected_t", "expected_c", "chi2", "p_value")
  }

  /** Cohen's h effect size for two proportions (Cohen 1988, public):
    * h = 2·arcsin√p_t − 2·arcsin√p_c — the SCALE-FREE companion to
    * [[proportionTest]]'s z: z says whether the arms differ, h says by
    * how much in units that mean the same thing at p = 0.01 and
    * p = 0.5 (the arcsine transform is variance-stabilizing, which is
    * exactly what a raw difference of proportions is not). Cohen's rule
    * of thumb bands (|h| < 0.2 negligible, < 0.5 small, < 0.8 medium,
    * else large) ship as a label computed from the ROUNDED h so both
    * engines band identically.
    *
    * One aggregation (four exact longs); h is the same asin/sqrt double
    * tree in both engines, rounded to 6. Empty arms fail loudly.
    * Returns one row (n_t, n_c, rate_t, rate_c, h, magnitude). */
  def cohensH(units: DataFrame, armCol: Column, convCol: Column): DataFrame = {
    val r = units
      .filter(armCol.isNotNull && convCol.isNotNull)
      .agg(
        sum(when(armCol, 1L).otherwise(0L)).as("nt"),
        sum(when(!armCol, 1L).otherwise(0L)).as("nc"),
        sum(when(armCol && convCol, 1L).otherwise(0L)).as("ct"),
        sum(when(!armCol && convCol, 1L).otherwise(0L)).as("cc"))
      .head()
    val nt = r.getAs[Long]("nt"); val nc = r.getAs[Long]("nc")
    require(nt > 0 && nc > 0, s"empty arm: treatment=$nt control=$nc")
    val pt = r.getAs[Long]("ct").toDouble / nt
    val pc = r.getAs[Long]("cc").toDouble / nc
    val h = 2.0 * math.asin(math.sqrt(pt)) - 2.0 * math.asin(math.sqrt(pc))
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def r9(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val h6 = r6(h)
    val magnitude =
      if (math.abs(h6) < 0.2) "negligible"
      else if (math.abs(h6) < 0.5) "small"
      else if (math.abs(h6) < 0.8) "medium"
      else "large"
    val spark = units.sparkSession
    import spark.implicits._
    Seq((nt, nc, r9(pt), r9(pc), h6, magnitude))
      .toDF("n_t", "n_c", "rate_t", "rate_c", "h", "magnitude")
  }

  /** Wald's sequential probability ratio test (Wald 1945, public) on a
    * Bernoulli rate: H₀ p = p₀ vs H₁ p = p₁, LLR = a·ln(p₁/p₀) +
    * (n−a)·ln((1−p₁)/(1−p₀)), decided against the Wald boundaries
    * ln((1−β)/α) and ln(β/(1−α)). THE always-valid monitor for a
    * rate-shaped rollout metric: unlike the fixed-horizon z test
    * (ev_proportion_ztest), peeking at every batch is the DESIGN, not
    * a p-hacking bug.
    *
    * ONE aggregation (n, a); everything after is fixed double
    * arithmetic over exact integers with ln parity — oracle-replayable
    * including the decision CASE on the rounded LLR. Returns one row
    * (n, n_pos, llr, lower_bound, upper_bound, decision ∈ {accept_h0,
    * continue, accept_h1}); bounds and LLR round-6. */
  def sprt(df: DataFrame, flagCol: Column, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct rates in (0,1): p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"error rates in (0,1): alpha=$alpha beta=$beta")
    val r = df.filter(flagCol.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(flagCol, 1L).otherwise(0L)).as("a")).head()
    val n = r.getAs[Long]("n"); val a = r.getAs[Long]("a")
    require(n > 0, "SPRT needs at least one observation")
    val llr = a * math.log(p1 / p0) +
      (n - a) * math.log((1.0 - p1) / (1.0 - p0))
    val up = math.log((1.0 - beta) / alpha)
    val lo = math.log(beta / (1.0 - alpha))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val l6 = r6(llr)
    val decision =
      if (l6 >= r6(up)) "accept_h1"
      else if (l6 <= r6(lo)) "accept_h0"
      else "continue"
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, a, l6, r6(lo), r6(up), decision))
      .toDF("n", "n_pos", "llr", "lower_bound", "upper_bound", "decision")
  }
}
