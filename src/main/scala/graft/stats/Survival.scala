package graft.stats

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958 — public): the
  * nonparametric time-to-event curve under right censoring — retention /
  * time-to-churn over an event log, where a user who is still active at
  * the observation boundary contributes risk-set time without an event.
  * Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over observed-event times tᵢ, with dᵢ
  * events and nᵢ at-risk (duration ≥ tᵢ).
  *
  * Distributed shape: one hash aggregation to the distinct-duration
  * table (map-side combined — the shuffle is duration-cardinality-
  * sized, never row-sized), then a range-partitioned sort of that table
  * and PARTITION-OFFSET PREFIX SCANS for the at-risk countdown and the
  * cumulative fold — the same idiom the rank tests use
  * (RankTests.groupRankSums): per-partition subtotals collect to the
  * driver (one scalar row per partition), a scanLeft turns them into
  * exclusive offsets, and each partition finishes its own prefix in
  * parallel. NO unpartitioned window anywhere — no single task ever
  * holds the whole curve, and the distinct-times cap is enforced from
  * the scan's own per-partition row counts (no separate count() pass).
  * The cumulative product runs as a decimal fold of ln-factors rounded
  * to 9 (the order-invariant cross-engine recipe; each factor 1 − d/n
  * is an exact integer-ratio double, so both engines feed ln the same
  * input) — the per-row factor and the final exp/round are SPARK
  * expressions, so engine parity comes from the engine, not a replica;
  * only the exact decimal addition happens inside the scan. A time
  * where every remaining subject dies (d = n) zeroes survival OUTSIDE
  * the log — Spark's ln(0) is null while DuckDB's is −inf, the exact
  * divergence the weightedSample op documented. */
object Survival {

  /** The ONE distinct-times cap for every op in this file. All public
    * ops scan a distinct-duration table; the table is calendar-grained-
    * small by design and ROW-SIZED when durations carry microsecond
    * noise — so every op checks the cap (from its scan's own partition
    * counts — the cap costs no extra pass) and fails loudly with the
    * same remedy. The scans themselves are partition-parallel, so the
    * cap is no longer a single-task-window bound — it remains the
    * honest "this is noise, not signal" contract. */
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
    * PRE-BINNING CONTRACT: the scans run over the distinct-duration
    * table, which is fine for calendar-grained durations but row-sized
    * when durations carry microsecond noise — so the op ENFORCES
    * `maxDistinctTimes` (default 1,000,000) and fails loudly with the
    * remedy: round durations to an analysis grain via [[binDurations]]
    * first. A million-step curve already exceeds any plotting or RMST
    * use; finer steps are duration noise, not signal. */
  def kaplanMeier(df: DataFrame, durationCol: Column,
      eventCol: Column, maxDistinctTimes: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(durationCol.cast("double").as("t"),
        eventCol.cast("int").as("e"))
      .filter(col("t").isNotNull && col("e").isNotNull)
    val byT = base.groupBy("t").agg(
      sum(col("e")).cast("long").as("d"),
      sum(lit(1) - col("e")).cast("long").as("c"))
    // localCheckpoint (not persist): the driver-collected partition
    // offsets below are only valid for THIS materialization of the
    // sort — a plain cache released before the returned frame is
    // evaluated would recompute the sort (twice the cost, and wrong
    // under nondeterministic upstreams like sample()). Checkpointing
    // truncates the lineage so the evaluation reads the exact
    // partitions the offsets were taken from; the blocks are released
    // by the ContextCleaner when the RDD is GC'd (r17 advice).
    val sorted = byT.as[(Double, Long, Long)].rdd.sortBy(_._1)
      .localCheckpoint()
    // scan 1: per-partition (rows, at-risk mass) → countdown offsets.
    // The row counts double as the cap check — no separate count pass.
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L; var k = 0L
      it.foreach { case (_, d, c) => rows += 1; k += d + c }
      Iterator((i, rows, k))
    }.collect().sortBy(_._1)
    requireBoundedTimes(stats.map(_._2).sum, maxDistinctTimes,
      "kaplanMeier")
    val total = stats.map(_._3).sum
    val kBefore = stats.map(_._3).scanLeft(0L)(_ + _)
    val risked = sorted.mapPartitionsWithIndex { (i, it) =>
      var before = kBefore(i)
      it.map { case (t, d, c) =>
        val out = (t, d, c, total - before)
        before += d + c
        out
      }
    }.toDF("t", "d", "c", "n_risk")
    // per-row ln factor + absorbing flag in SPARK expressions (narrow
    // projections over the sorted RDD — partition order is preserved)
    val terms = risked.select(col("t"), col("d"), col("c"), col("n_risk"),
      when(col("d") < col("n_risk"),
        round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9))
        .cast("decimal(38,12)").as("__ln"),
      when(col("d") === col("n_risk"), 1).otherwise(0).as("__z"))
    val termRdd = terms.rdd
    // scan 2: per-partition (Σln decimal, absorbing-seen) → offsets
    val lnStats = termRdd.mapPartitionsWithIndex { (i, it) =>
      var s: JBigDecimal = null
      var z = 0
      it.foreach { r =>
        if (!r.isNullAt(4)) {
          val v = r.getDecimal(4)
          s = if (s == null) v else s.add(v)
        }
        if (r.getInt(5) == 1) z = 1
      }
      Iterator((i, s, z))
    }.collect().sortBy(_._1)
    val lnBefore = lnStats.map(_._2).scanLeft(null: JBigDecimal) {
      (a, b) => if (a == null) b else if (b == null) a else a.add(b)
    }
    val zBefore = lnStats.map(_._3).scanLeft(0)(_ max _)
    val schema = StructType(Seq(
      StructField("t", DoubleType), StructField("n_risk", LongType),
      StructField("d_events", LongType),
      StructField("n_censored", LongType),
      StructField("__lnS", DecimalType(38, 12)),
      StructField("__zero", IntegerType)))
    val scanned = termRdd.mapPartitionsWithIndex { (i, it) =>
      var s = lnBefore(i)
      var z = zBefore(i)
      it.flatMap { r =>
        if (!r.isNullAt(4)) {
          val v = r.getDecimal(4)
          s = if (s == null) v else s.add(v)
        }
        if (r.getInt(5) == 1) z = 1
        if (r.getLong(1) > 0)
          Iterator(Row(r.getDouble(0), r.getLong(3), r.getLong(1),
            r.getLong(2), s, z))
        else Iterator.empty
      }
    }
    val out = spark.createDataFrame(scanned, schema)
      .select(col("t"), col("n_risk"), col("d_events"), col("n_censored"),
        when(col("__zero") === 1, lit(0.0))
          .otherwise(round(exp(col("__lnS").cast("double")), 6))
          .as("survival"))
    out
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

  /** Spark's Round-on-double, replicated for the driver-side step
    * integral: BigDecimal.decimal (the shortest-string constructor Spark
    * uses) → setScale HALF_UP → toDouble. */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark's Cast(double → DECIMAL(38,12)), replicated: shortest-string
    * BigDecimal → setScale(12, HALF_UP). */
  private def dec12(x: Double): JBigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).underlying

  /** One-row summary of a [[kaplanMeier]] curve: median survival time
    * (the smallest event time with Ŝ ≤ 0.5; null when the curve never
    * reaches it — common under heavy censoring) and the restricted mean
    * survival time RMST(τ) = ∫₀^τ Ŝ(t)dt (Royston & Parmar 2013 —
    * public), the step integral Σ Ŝ(tᵢ₋₁)·(tᵢ − tᵢ₋₁) with Ŝ = 1 before
    * the first event and the last step held to τ.
    *
    * One range-partitioned sort of the (t, survival) pairs + a two-pass
    * partition-offset scan: pass 1 collects per-partition row counts
    * (the cap check — the former extra count() pass is gone), the
    * ≤τ-prefix boundary (each partition's last in-horizon step) and the
    * median candidate; pass 2 folds the step areas as exact decimals
    * with the previous partition's boundary as its lag seed. NO
    * unpartitioned window, no single-task stage; rows with null t or
    * survival are excluded (they carry no curve information). */
  def survivalSummary(curve: DataFrame, tau: Double,
      maxDistinctTimes: Long = 1000000L): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val spark = curve.sparkSession
    import spark.implicits._
    val slim = curve.select(col("t").cast("double").as("t"),
        col("survival").cast("double").as("survival"))
      .filter(col("t").isNotNull && col("survival").isNotNull)
    val sorted = slim.as[(Double, Double)].rdd.sortBy(_._1)
    sorted.persist()
    try {
      // pass 1: (rows, in-horizon count, last in-horizon (t, S), median
      // candidate) per partition — all scalars
      val stats = sorted.mapPartitionsWithIndex { (i, it) =>
        var rows = 0L; var nTau = 0L
        var lastT = 0.0; var lastS = 1.0; var has = false
        var med = Double.MaxValue; var hasMed = false
        it.foreach { case (t, s) =>
          rows += 1
          if (t <= tau) { nTau += 1; lastT = t; lastS = s; has = true }
          if (s <= 0.5 && t < med) { med = t; hasMed = true }
        }
        Iterator((i, rows, nTau, has, lastT, lastS, hasMed, med))
      }.collect().sortBy(_._1)
      requireBoundedTimes(stats.map(_._2).sum, maxDistinctTimes,
        "survivalSummary")
      // median over the FULL curve (restricting it to tau would
      // misreport heavy-tailed churn); the integral restricts to tau
      val medCands = stats.filter(_._7).map(_._8)
      val median: Option[Double] =
        if (medCands.isEmpty) None else Some(medCands.min)
      // lag seed per partition: the nearest preceding partition's last
      // in-horizon step, (0, 1) before the first event
      val seeds = Array.fill(stats.length)((0.0, 1.0))
      var bT = 0.0; var bS = 1.0
      for (i <- stats.indices) {
        seeds(i) = (bT, bS)
        if (stats(i)._4) { bT = stats(i)._5; bS = stats(i)._6 }
      }
      val lastP = stats.lastIndexWhere(_._3 > 0)
      val nTauAt = stats.map(_._3)
      // pass 2: exact decimal fold of round-9 step areas; the global
      // last in-horizon row holds its survival to tau
      val partSums = sorted.mapPartitionsWithIndex { (i, it) =>
        var (pt, ps) = seeds(i)
        var seen = 0L
        var acc: JBigDecimal = null
        it.foreach { case (t, s) =>
          if (t <= tau) {
            seen += 1
            val a = round9(ps * (t - pt))
            val tl = if (i == lastP && seen == nTauAt(i))
              round9(s * (tau - t)) else 0.0
            val d = dec12(a + tl)
            acc = if (acc == null) d else acc.add(d)
            pt = t; ps = s
          }
        }
        Iterator(acc)
      }.collect().filter(_ != null)
      // no events before tau means S = 1 throughout: RMST = tau
      val rmst =
        if (partSums.isEmpty) tau
        else BigDecimal(partSums.reduce(_.add(_)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((median, rmst, tau)).toDF("median_survival", "rmst", "tau")
    } finally sorted.unpersist(blocking = false)
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
    * Per-row hazard/variance terms are SPARK round-9 expressions; their
    * cumulative sums run as exact-decimal partition-offset scans over
    * one range-partitioned sort (no unpartitioned window, and the cap —
    * still enforced for externally-built curves — now reads the scan's
    * own partition counts instead of a separate count() evaluation). At
    * an absorbing time (d = n, Ŝ = 0) the Greenwood term divides by
    * zero — that row reports null se/ci (its hazard increment still
    * lands in Ĥ). Returns (t, n_risk, d_events, survival, cumhaz, se,
    * ci_lo, ci_hi) ordered by t, round-6. */
  def survivalBand(curve: DataFrame, z: Double = 1.959963984540054,
      maxDistinctTimes: Long = 1000000L): DataFrame = {
    val spark = curve.sparkSession
    val dD = col("d_events").cast("double")
    val nD = col("n_risk").cast("double")
    val terms = curve.select(col("t").cast("double").as("t"),
      col("n_risk").cast("long").as("n_risk"),
      col("d_events").cast("long").as("d_events"),
      col("survival").cast("double").as("survival"),
      round(dD / nD, 9).cast("decimal(38,12)").as("__ht"),
      when(col("d_events") < col("n_risk"),
        round(dD / (nD * (nD - dD)), 9)).cast("decimal(38,12)")
        .as("__gt"))
      // an externally-built curve may carry null rows; a null t would
      // NPE inside sortBy's key extractor — exclude curve rows with no
      // information, matching survivalSummary (r17 advice)
      .filter(col("t").isNotNull && col("n_risk").isNotNull &&
        col("d_events").isNotNull && col("survival").isNotNull)
    // localCheckpoint, not persist: see kaplanMeier — the partition
    // offsets must see the same materialization the output reads
    val sorted = terms.rdd.sortBy(_.getDouble(0)).localCheckpoint()
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L
      var h: JBigDecimal = null
      var g: JBigDecimal = null
      it.foreach { r =>
        rows += 1
        if (!r.isNullAt(4))
          h = if (h == null) r.getDecimal(4) else h.add(r.getDecimal(4))
        if (!r.isNullAt(5))
          g = if (g == null) r.getDecimal(5) else g.add(r.getDecimal(5))
      }
      Iterator((i, rows, h, g))
    }.collect().sortBy(_._1)
    requireBoundedTimes(stats.map(_._2).sum, maxDistinctTimes,
      "survivalBand")
    def offsets(xs: Array[JBigDecimal]) =
      xs.scanLeft(null: JBigDecimal) { (a, b) =>
        if (a == null) b else if (b == null) a else a.add(b)
      }
    val hBefore = offsets(stats.map(_._3))
    val gBefore = offsets(stats.map(_._4))
    val schema = StructType(Seq(
      StructField("t", DoubleType), StructField("n_risk", LongType),
      StructField("d_events", LongType),
      StructField("survival", DoubleType),
      StructField("__h", DecimalType(38, 12)),
      StructField("__g", DecimalType(38, 12))))
    val scanned = sorted.mapPartitionsWithIndex { (i, it) =>
      var h = hBefore(i)
      var g = gBefore(i)
      it.map { r =>
        if (!r.isNullAt(4))
          h = if (h == null) r.getDecimal(4) else h.add(r.getDecimal(4))
        if (!r.isNullAt(5))
          g = if (g == null) r.getDecimal(5) else g.add(r.getDecimal(5))
        Row(r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          h, g)
      }
    }
    val live = col("d_events") < col("n_risk")
    val se = col("survival") * sqrt(col("__g").cast("double"))
    val out = spark.createDataFrame(scanned, schema)
      .select(col("t"), col("n_risk"), col("d_events"), col("survival"),
        round(col("__h").cast("double"), 6).as("cumhaz"),
        when(live, round(se, 6)).as("se"),
        when(live, round(greatest(lit(0.0),
          col("survival") - lit(z) * se), 6)).as("ci_lo"),
        when(live, round(least(lit(1.0),
          col("survival") + lit(z) * se), 6)).as("ci_hi"))
      .orderBy("t")
    out
  }

  /** Two-sample log-rank test (Mantel 1966; Peto & Peto 1972 — public):
    * does group A churn faster than group B? At every observed-event
    * time, group A's observed events dₐ are compared with the
    * expectation nₐ·d/n under the null of identical hazards; the
    * statistic U = Σ(dₐ − eₐ) normalizes by the hypergeometric variance
    * V = Σ d·(nₐ/n)·(n_b/n)·(n−d)/(n−1), and U²/V ~ χ²(1). One
    * aggregation to the (time, group) table, then the same
    * partition-offset countdown scan as [[kaplanMeier]] (no
    * unpartitioned window) feeds a plain hash aggregation of the
    * round-9 decimal term folds. Groups must be exactly two — fails
    * loudly otherwise. Returns one row (group_a, group_b, n_a, n_b,
    * observed_a, expected_a, chi2). Times where n = 1 contribute no
    * variance term (the n−1 denominator — only possible at the very
    * last at-risk subject).
    *
    * Shares [[kaplanMeier]]'s PRE-BINNING CONTRACT via the same
    * scan-count cap with the [[binDurations]] remedy. */
  def logRank(df: DataFrame, groupCol: Column, durationCol: Column,
      eventCol: Column, maxDistinctTimes: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
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
    // localCheckpoint, not persist: see kaplanMeier — the partition
    // offsets must see the same materialization the output reads
    val sorted = byT.as[(Double, Long, Long, Long, Long)].rdd.sortBy(_._1)
      .localCheckpoint()
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L; var k = 0L; var ka = 0L
      it.foreach { case (_, _, kk, _, kka) => rows += 1; k += kk; ka += kka }
      Iterator((i, rows, k, ka))
    }.collect().sortBy(_._1)
    requireBoundedTimes(stats.map(_._2).sum, maxDistinctTimes, "logRank")
    val nTot = stats.map(_._3).sum
    val naTot = stats.map(_._4).sum
    val kBefore = stats.map(_._3).scanLeft(0L)(_ + _)
    val kaBefore = stats.map(_._4).scanLeft(0L)(_ + _)
    val withRisk = sorted.mapPartitionsWithIndex { (i, it) =>
      var bK = kBefore(i); var bKa = kaBefore(i)
      it.map { case (t, d, k, da, ka) =>
        val out = (t, d, da, nTot - bK, naTot - bKa)
        bK += k; bKa += ka
        out
      }
    }.toDF("t", "d", "da", "n", "na")
      .filter(col("d") > 0)
    val nD = col("n").cast("double")
    val naD = col("na").cast("double")
    val ea = col("d") * naD / nD
    val vTerm = when(col("n") > 1,
      col("d") * (naD / nD) * ((nD - naD) / nD) *
        (nD - col("d")) / (nD - 1)).otherwise(lit(0.0))
    val out = withRisk.agg(
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
    out
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
