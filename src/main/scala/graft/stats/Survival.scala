package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958 — public): the
  * nonparametric time-to-event curve under right censoring — retention /
  * time-to-churn over an event log, where a user who is still active at
  * the observation boundary contributes risk-set time without an event.
  * Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over observed-event times tᵢ, with dᵢ
  * events and nᵢ at-risk (duration ≥ tᵢ).
  *
  * Distributed shape: one hash aggregation to the distinct-duration
  * table (map-side combined — the shuffle is duration-cardinality-
  * sized, never row-sized), then windows over that small table for the
  * at-risk countdown and the cumulative product. The product runs as a
  * decimal fold of ln-factors rounded to 9 (the order-invariant
  * cross-engine recipe; each factor 1 − d/n is an exact integer-ratio
  * double, so both engines feed ln the same input). A time where every
  * remaining subject dies (d = n) zeroes survival OUTSIDE the log —
  * Spark's ln(0) is null while DuckDB's is −inf, the exact divergence
  * the weightedSample op documented. */
object Survival {

  /** The ONE distinct-times cap for every op in this file. All three
    * public ops ([[kaplanMeier]], [[logRank]], [[survivalSummary]]) run
    * their countdown/fold windows over a distinct-duration table; the
    * table is calendar-grained-small by design and ROW-SIZED when
    * durations carry microsecond noise — so every op routes its table
    * through this guard and fails loudly with the same remedy. (The r14
    * weak item was exactly the asymmetry: kaplanMeier enforced the cap,
    * logRank built its own uncapped twin of the same table.) */
  private def requireBoundedTimes(
      nTimes: Long, maxDistinctTimes: Long, op: String): Unit =
    require(nTimes <= maxDistinctTimes,
      s"$op: $nTimes distinct durations exceeds the $maxDistinctTimes " +
        "curve-step bound — durations this fine are measurement noise, " +
        "not survival signal; pre-bin them to an analysis grain with " +
        "Survival.binDurations(df, col, grain) and re-run")

  /** The survival curve: one row per OBSERVED-event time with
    * (t, n_risk, d_events, n_censored, survival). Censoring-only times
    * don't step the curve but do shrink later risk sets (handled by the
    * countdown including their counts). Null durations are excluded;
    * `eventCol` is 1/true for an observed event, 0/false for censored.
    *
    * PRE-BINNING CONTRACT: the countdown/fold windows run over the
    * distinct-duration table, which is fine for calendar-grained
    * durations but row-sized when durations carry microsecond noise —
    * so the op ENFORCES `maxDistinctTimes` (default 1,000,000: a
    * 5-column table one task folds in well under a second) and fails
    * loudly with the remedy: round durations to an analysis grain via
    * [[binDurations]] first. A million-step curve already exceeds any
    * plotting or RMST use; finer steps are duration noise, not signal. */
  def kaplanMeier(df: DataFrame, durationCol: Column,
      eventCol: Column, maxDistinctTimes: Long = 1000000L): DataFrame = {
    val base = df.select(durationCol.cast("double").as("t"),
        eventCol.cast("int").as("e"))
      .filter(col("t").isNotNull && col("e").isNotNull)
    val byT = base.groupBy("t").agg(
      sum(col("e")).cast("long").as("d"),
      sum(lit(1) - col("e")).cast("long").as("c"))
    requireBoundedTimes(byT.count(), maxDistinctTimes, "kaplanMeier")
    val ord = Window.orderBy(col("t"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byT
      .withColumn("__total", sum(col("d") + col("c"))
        .over(Window.partitionBy()))
      .withColumn("n_risk",
        col("__total") - coalesce(sum(col("d") + col("c")).over(before),
          lit(0L)))
    val lnTerm = when(col("d") < col("n_risk"),
      round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9))
    val zeroSeen = max(when(col("d") === col("n_risk"), 1).otherwise(0))
      .over(upTo)
    withRisk
      .withColumn("__lnS",
        sum(lnTerm.cast("decimal(38,12)")).over(upTo).cast("double"))
      .withColumn("__zero", zeroSeen)
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        col("c").as("n_censored"),
        when(col("__zero") === 1, lit(0.0))
          .otherwise(round(exp(col("__lnS")), 6)).as("survival"))
  }

  /** The [[kaplanMeier]] pre-binning contract's remedy: round a duration
    * DOWN to a declared analysis grain (floor(t/grain)·grain — seconds,
    * hours, days), collapsing measurement-noise-distinct durations to
    * curve steps. Floor (not round) so a binned duration never exceeds
    * the true one — at-risk sets stay conservative. Pure column
    * arithmetic, identical in any engine. */
  def binDurations(durationCol: Column, grain: Double): Column = {
    require(grain > 0, s"grain must be positive, got $grain")
    floor(durationCol.cast("double") / grain) * lit(grain)
  }

  /** One-row summary of a [[kaplanMeier]] curve: median survival time
    * (the smallest event time with Ŝ ≤ 0.5; null when the curve never
    * reaches it — common under heavy censoring) and the restricted mean
    * survival time RMST(τ) = ∫₀^τ Ŝ(t)dt (Royston & Parmar 2013 —
    * public), the step integral Σ Ŝ(tᵢ₋₁)·(tᵢ − tᵢ₋₁) with Ŝ = 1 before
    * the first event and the last step held to τ. Curve-sized windows —
    * tiny for a [[kaplanMeier]]-built curve (already capped at source),
    * but an EXTERNALLY-built curve rides the same windows, so the cap is
    * re-enforced here rather than trusted. */
  def survivalSummary(curve: DataFrame, tau: Double,
      maxDistinctTimes: Long = 1000000L): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    requireBoundedTimes(curve.count(), maxDistinctTimes, "survivalSummary")
    val ord = Window.orderBy(col("t"))
    // median over the FULL curve (restricting it to tau would misreport
    // heavy-tailed churn); the integral restricts to tau by definition
    val med = curve.agg(
      min(when(col("survival") <= 0.5, col("t"))).as("median_survival"))
    val stepped = curve
      .filter(col("t") <= tau)
      .withColumn("__prevS", lag(col("survival"), 1, 1.0).over(ord))
      .withColumn("__prevT", lag(col("t"), 1, 0.0).over(ord))
      .withColumn("__area",
        round(col("__prevS") * (col("t") - col("__prevT")), 9))
      .withColumn("__tail",
        when(row_number().over(ord) === count(lit(1))
          .over(Window.partitionBy()),
          round(col("survival") * (lit(tau) - col("t")), 9))
          .otherwise(lit(0.0)))
    val rmst = stepped.agg(
      // no events before tau means S = 1 throughout: RMST = tau
      coalesce(
        round(sum((col("__area") + col("__tail")).cast("decimal(38,12)"))
          .cast("double"), 6), lit(tau)).as("rmst"))
    med.crossJoin(rmst).withColumn("tau", lit(tau))
  }

  /** Uncertainty band + cumulative hazard for a [[kaplanMeier]] curve:
    * the Nelson–Aalen cumulative hazard Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ (Nelson
    * 1972; Aalen 1978 — public) and the Greenwood standard error
    * se(t) = Ŝ(t)·√(Σ dᵢ/(nᵢ(nᵢ−dᵢ))) (Greenwood 1926 — public) with
    * the plain linear 95% band clamped to [0, 1] — the honest "how sure
    * is this retention curve" companion every KM plot needs. The z
    * multiplier is an inline literal double shared with the oracle (the
    * zQuantile convention).
    *
    * Composes the CURVE (already distinct-times-capped at source, and
    * re-capped here for externally-built curves): curve-sized windows,
    * round-9 decimal folds for both cumulative sums. At an absorbing
    * time (d = n, Ŝ = 0) the Greenwood term divides by zero — that row
    * reports null se/ci (its hazard increment still lands in Ĥ).
    * Returns (t, n_risk, d_events, survival, cumhaz, se, ci_lo, ci_hi)
    * ordered by t, round-6. */
  def survivalBand(curve: DataFrame, z: Double = 1.959963984540054,
      maxDistinctTimes: Long = 1000000L): DataFrame = {
    requireBoundedTimes(curve.count(), maxDistinctTimes, "survivalBand")
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dD = col("d_events").cast("double")
    val nD = col("n_risk").cast("double")
    val hTerm = round(dD / nD, 9)
    val gTerm = when(col("d_events") < col("n_risk"),
      round(dD / (nD * (nD - dD)), 9))
    val live = col("d_events") < col("n_risk")
    val se = col("survival") * sqrt(col("__g"))
    curve
      .withColumn("__h",
        sum(hTerm.cast("decimal(38,12)")).over(upTo).cast("double"))
      .withColumn("__g",
        sum(gTerm.cast("decimal(38,12)")).over(upTo).cast("double"))
      .select(col("t"), col("n_risk"), col("d_events"), col("survival"),
        round(col("__h"), 6).as("cumhaz"),
        when(live, round(se, 6)).as("se"),
        when(live, round(greatest(lit(0.0),
          col("survival") - lit(z) * se), 6)).as("ci_lo"),
        when(live, round(least(lit(1.0),
          col("survival") + lit(z) * se), 6)).as("ci_hi"))
      .orderBy("t")
  }

  /** Two-sample log-rank test (Mantel 1966; Peto & Peto 1972 — public):
    * does group A churn faster than group B? At every observed-event
    * time, group A's observed events dₐ are compared with the
    * expectation nₐ·d/n under the null of identical hazards; the
    * statistic U = Σ(dₐ − eₐ) normalizes by the hypergeometric variance
    * V = Σ d·(nₐ/n)·(n_b/n)·(n−d)/(n−1), and U²/V ~ χ²(1). One
    * aggregation to the (time, group) table, windows over the distinct
    * times (same scale shape as [[kaplanMeier]]). Groups must be
    * exactly two — fails loudly otherwise. Returns one row
    * (group_a, group_b, n_a, n_b, observed_a, expected_a, chi2). Times
    * where n = 1 contribute no variance term (the n−1 denominator —
    * only possible at the very last at-risk subject).
    *
    * Shares [[kaplanMeier]]'s PRE-BINNING CONTRACT: the windows run over
    * the distinct-duration table, so `maxDistinctTimes` bounds it loudly
    * with the [[binDurations]] remedy. */
  def logRank(df: DataFrame, groupCol: Column, durationCol: Column,
      eventCol: Column, maxDistinctTimes: Long = 1000000L): DataFrame = {
    val base = df.select(groupCol.cast("string").as("g"),
        durationCol.cast("double").as("t"), eventCol.cast("int").as("e"))
      .filter(col("g").isNotNull && col("t").isNotNull &&
        col("e").isNotNull)
    val counts = base.groupBy("g").agg(count(lit(1)).as("__n"))
      .orderBy("g").collect()
    require(counts.length == 2,
      s"log-rank compares exactly two groups, found ${counts.length}: " +
        counts.map(_.getString(0)).mkString(", "))
    val (ga, gb) = (counts(0).getString(0), counts(1).getString(0))
    val (nA, nB) = (counts(0).getAs[Long]("__n"), counts(1).getAs[Long]("__n"))
    val byT = base.groupBy("t").agg(
      sum(col("e")).cast("long").as("d"),
      count(lit(1)).cast("long").as("k"),
      sum(when(col("g") === ga, col("e")).otherwise(0)).cast("long")
        .as("da"),
      sum(when(col("g") === ga, 1).otherwise(0)).cast("long").as("ka"))
    requireBoundedTimes(byT.count(), maxDistinctTimes, "logRank")
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val withRisk = byT
      .withColumn("n",
        sum(col("k")).over(all) - coalesce(sum(col("k")).over(before),
          lit(0L)))
      .withColumn("na",
        sum(col("ka")).over(all) - coalesce(sum(col("ka")).over(before),
          lit(0L)))
      .filter(col("d") > 0)
    val nD = col("n").cast("double")
    val naD = col("na").cast("double")
    val ea = col("d") * naD / nD
    val vTerm = when(col("n") > 1,
      col("d") * (naD / nD) * ((nD - naD) / nD) *
        (nD - col("d")) / (nD - 1)).otherwise(lit(0.0))
    withRisk.agg(
      lit(ga).as("group_a"), lit(gb).as("group_b"),
      lit(nA).as("n_a"), lit(nB).as("n_b"),
      sum(col("da")).as("observed_a"),
      round(sum(round(ea, 9).cast("decimal(38,12)")).cast("double"), 6)
        .as("expected_a"),
      // zero total variance (e.g. the only event time has d = n_risk)
      // determines no statistic: null, never a 0/0 NaN that comparisons
      // silently swallow
      when(sum(round(vTerm, 9).cast("decimal(38,12)")).cast("double") > 0,
        round(
          pow(sum(round(col("da") - ea, 9).cast("decimal(38,12)"))
            .cast("double"), 2)
            / sum(round(vTerm, 9).cast("decimal(38,12)")).cast("double"),
          6)).as("chi2"))
  }

  /** Per-subject durations from an event log: duration = last − first
    * event (in `unitSeconds`), observed (=1, "churned") when the
    * subject's LAST event precedes `horizon` by at least `gapSeconds`
    * of silence, censored (=0) when the subject was still active near
    * the horizon. One aggregation by subject. */
  def durationsFromLog(events: DataFrame, subjectCol: String,
      tsCol: String, horizon: String, gapSeconds: Long,
      unitSeconds: Long = 3600L): DataFrame = {
    val ts = col(tsCol)
    events.filter(col(subjectCol).isNotNull && ts.isNotNull)
      .groupBy(col(subjectCol).as("subject"))
      .agg(min(ts).as("__first"), max(ts).as("__last"))
      .select(col("subject"),
        floor((unix_timestamp(col("__last")) -
          unix_timestamp(col("__first"))) / unitSeconds).cast("long")
          .as("duration"),
        when(unix_timestamp(col("__last"))
          <= unix_timestamp(to_timestamp(lit(horizon))) - gapSeconds, 1)
          .otherwise(0).as("observed"))
  }
}
