package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the two product-analytics queries every event warehouse serves, shaped
  * for one pass each.
  *
  * Funnel semantics (the ClickHouse `windowFunnel`/Amplitude convention):
  * a user converts through step k when an event of step k's type exists
  * STRICTLY AFTER their step k−1 conversion time; step 1 is the user's
  * earliest step-1 event. Computed in ONE groupBy pass: per user, min ts
  * for step 1 plus a sorted ts array per later step (collect_list skips
  * the non-matching nulls), then the conversion chain folds left through
  * `filter(arr, _ > prev)[0]` — a per-user in-memory scan, no self-joins,
  * no re-shuffle per step. Per-user step arrays are bounded by that user's
  * own step events; a single pathological user surfaces as one fat row,
  * not a global blow-up.
  *
  * Retention: users bucketed by first-seen day (their cohort); activity
  * counted as distinct (user, day); reported as distinct active users per
  * (cohort day, whole weeks since). Window min, distinct, and groupBy all
  * ride the user-key exchange; output is cohorts × weeks — tiny.
  */
object EventAnalytics {

  /** (step, step_idx, n_users) per funnel step, ordered by step_idx.
    * `steps` are matched against `typeCol` in order; a non-empty `window`
    * (interval literal, e.g. "48 hours") additionally requires every later
    * step to land within that span of the user's step-1 time. */
  /** Per-user chained step times t1..tk (first step-k ts strictly after
    * t_{k-1}, inside the window of t1; null propagates) — the shared
    * core of [[funnel]] and [[funnelStepTimes]]. */
  private def funnelChain(
      events: DataFrame, steps: Seq[String], keyCol: String,
      tsCol: String, typeCol: String, window: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val aggs = min(when(col(typeCol) === steps.head, col(tsCol))).as("t1") +:
      steps.tail.zipWithIndex.map { case (s, i) =>
        array_sort(collect_list(when(col(typeCol) === s, col(tsCol))))
          .as(s"l${i + 2}")
      }
    val perUser = events.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    // fold: t_k = first step-k ts strictly after t_{k-1} (null propagates),
    // and within the window of t1 when one is set
    val inWindow: Column => Column =
      if (window == null || window.isEmpty) _ => lit(true)
      else x => x <= col("t1") + expr(s"interval $window")
    steps.indices.tail.foldLeft(perUser) { (df, i) =>
      val k = i + 1
      // try_element_at: empty filter result → null (ANSI element_at throws)
      df.withColumn(s"t$k",
        try_element_at(
          filter(col(s"l$k"), x => x > col(s"t${k - 1}") && inWindow(x)), lit(1)))
    }
  }

  def funnel(
      events: DataFrame, steps: Seq[String], keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      window: String = ""): DataFrame = {
    val chained = funnelChain(events, steps, keyCol, tsCol, typeCol, window)
    val counts: Seq[Column] = steps.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val row = chained.agg(counts.head, counts.tail: _*)
    // unpivot with stack: one execution of the aggregate, not one per step.
    // Step names are typed lit() columns, never interpolated into SQL text —
    // a step value containing a quote must not break the expression.
    val cells: Seq[Column] = steps.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i + 1), col(s"n${i + 1}"))
    }
    row.select(stack((lit(steps.size) +: cells): _*)
        .as(Seq("step", "step_idx", "n_users")))
      .orderBy("step_idx")
  }

  /** Time-to-convert between adjacent funnel steps — the "WHERE do
    * users stall" companion to [[funnel]]'s "where do they drop":
    * for every user who reached step k, the seconds from their step
    * k−1 time to their step k time (the same chained first-occurrence
    * semantics, same window), summarized per step pair as n / mean /
    * median / p90.
    *
    * One groupBy(user) pass builds the chain (shared [[funnelChain]]),
    * one aggregation summarizes — deltas are exact microsecond integers
    * divided by 1e6 (the identical double both engines), the mean folds
    * as a round-9 decimal, the quantiles are exact percentiles (round-6,
    * the t17 parity recipe). Returns (from_step, to_step, step_idx, n,
    * mean_s, median_s, p90_s) ordered by step_idx. */
  def funnelStepTimes(
      events: DataFrame, steps: Seq[String], keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      window: String = ""): DataFrame = {
    val chained = funnelChain(events, steps, keyCol, tsCol, typeCol, window)
    // ONE aggregation over the chain for ALL step pairs (conditional
    // aggregates — a null delta is skipped by count/sum/percentile), so
    // the per-user groupBy pass runs once, not k−1 times
    val aggs: Seq[Column] = steps.indices.tail.flatMap { i =>
      val k = i + 1
      val d = when(col(s"t$k").isNotNull,
        (expr(s"unix_micros(t$k)") - expr(s"unix_micros(t${k - 1})"))
          .cast("double") / lit(1000000.0))
      Seq(
        count(d).as(s"n$k"),
        round(sum(round(d, 9).cast("decimal(38,12)"))
          .cast("double") / count(d), 6).as(s"mean$k"),
        round(percentile(d, lit(0.5)), 6).as(s"median$k"),
        round(percentile(d, lit(0.9)), 6).as(s"p90$k"))
    }
    val row = chained.agg(aggs.head, aggs.tail: _*)
    val cells: Seq[Column] = steps.indices.tail.flatMap { i =>
      val k = i + 1
      Seq(lit(steps(i - 1)), lit(steps(i)), lit(k), col(s"n$k"),
        col(s"mean$k"), col(s"median$k"), col(s"p90$k"))
    }
    row.select(stack((lit(steps.size - 1) +: cells): _*)
        .as(Seq("from_step", "to_step", "step_idx", "n", "mean_s",
          "median_s", "p90_s")))
      .orderBy("step_idx")
  }

  /** Per-event trailing-window statistics: for every event, the count and
    * value sum of that key's events in the preceding `windowSeconds`
    * (inclusive of both endpoints) — the moving-aggregate feed for rate
    * limiting, rolling spend, or feature generation.
    *
    * A RANGE window frame over epoch seconds: one exchange on the key,
    * one ordered frame scan — no self-join of the stream against itself
    * (the naive events×events-within-24h join is quadratic in the hot
    * keys). Values aggregate in integer cents so the sums are exact and
    * engine-portable. */
  def rollingStats(
      events: DataFrame, windowSeconds: Long, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      ordCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rangeBetween(-windowSeconds, Window.currentRow)
    events
      .select(col(ordCol), col(keyCol),
        unix_seconds(col(tsCol)).as("__t"),
        round(col(valCol) * 100).as("__c"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_cents_window", sum(col("__c")).over(w).cast("long"))
      .select(ordCol, keyCol, "n_window", "sum_cents_window")
      .orderBy(ordCol)
  }

  /** Most-common k-step event paths — user-journey flow analysis ("what
    * do users do in sequence"). One groupBy builds each key's ordered
    * event-type sequence (an in-memory array bounded by that key's own
    * history — the same per-key shape as [[funnel]]); n-grams are
    * constructed in-row (static unroll over the n offsets, no
    * explode-join); one count shuffle of path strings; the final cut is
    * TakeOrderedAndProject. Ties break on the path string. */
  def topPaths(
      events: DataFrame, n: Int = 3, k: Int = 10, keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      ordCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"paths need ≥2 steps, got $n")
    val seqCol = transform(
      array_sort(collect_list(struct(col(tsCol), col(ordCol), col(typeCol)))),
      s => s.getField(typeCol))
    val grams = {
      val s = col("__seq")
      when(size(s) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(s) - n),
          i => concat_ws(">", (0 until n).map(j => get(s, i + j)): _*)))
    }
    events.groupBy(col(keyCol)).agg(seqCol.as("__seq"))
      .select(explode(grams).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Daily and trailing-window active users (DAU/WAU) — the canonical
    * engagement series. Exact rolling DISTINCT counts are not
    * decomposable, so instead of a per-day window (quadratic re-count) or
    * a self-join, each distinct (user, day) pair is exploded to the
    * `windowDays` trailing buckets it contributes to, de-duplicated, and
    * counted — explode factor = windowDays, all counts exact, two
    * distinct shuffles total regardless of the window length. */
  def activeUsers(
      events: DataFrame, keyCol: String = "user_id", tsCol: String = "ts",
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be ≥1, got $windowDays")
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01"))
    val ud = events.select(col(keyCol).as("__u"), day.as("__d")).distinct()
    val dau = ud.groupBy(col("__d").cast("long").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("__u"),
        explode(sequence(col("__d"), col("__d") + (windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day").cast("long").as("day"))
      .agg(count(lit(1)).as(s"active_${windowDays}d"))
    // inner join: report only days that themselves have activity
    dau.join(wau, Seq("day")).orderBy("day")
  }

  /** (cohort_day, week_offset, n_active) — distinct users of each
    * first-seen-day cohort active in each whole week since. Days emit as
    * epoch-day integers for engine-portable hashing. */
  def retention(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01"))
    events
      .select(col(keyCol), day.as("__day"))
      .withColumn("__cohort",
        min(col("__day")).over(Window.partitionBy(col(keyCol))))
      // `div` = floor integer division, matching an oracle's `//`; offsets
      // are non-negative by construction (cohort is the per-key min)
      .select(col(keyCol), col("__cohort").cast("long").as("__cohort"),
        expr("(__day - __cohort) div 7").as("__week"))
      .distinct()
      .groupBy(col("__cohort").as("cohort_day"), col("__week").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "week_offset")
  }

  /** CUSUM changepoint detection (Page 1954, public) over per-period
    * series — the sequential drift monitor that catches SLOW level
    * shifts a per-point z-score (rolling anomaly flags) never
    * accumulates: S⁺_t = max(0, S⁺_{t−1} + x_t − μ − kσ) flags when it
    * exceeds hσ, and symmetrically downward. Computed in closed window
    * form — S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    * (x − μ − kσ) — so the whole recurrence is two per-key windows, no
    * recursion, no driver loop.
    *
    * `df` carries one row per (key, period) with the numeric `valueCol`
    * (aggregate upstream; use exact counts or decimal sums so the series
    * itself is engine-portable). Baseline μ/σ per key come from rows
    * passing `baselineFilter` (sample std over exact decimal moments,
    * rounded 12); keys with fewer than 2 baseline rows fail loudly.
    * Zero-variance baselines yield null S (monitoring is undefined, not
    * infinitely sensitive).
    *
    * Engine-parity: increments round to 12 and accumulate in
    * decimal(38,12) window sums; S and the thresholds round to 6.
    * Scale: one broadcast-joined baseline aggregate + two windows
    * partitioned by key — series length per key is the only per-task
    * width. Returns (keys..., periodCol, value, s_pos, s_neg, flag). */
  def cusumBaseline(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      baselineFilter: Column): DataFrame = {
    require(keyCols.nonEmpty, "at least one series key required")
    df.filter(baselineFilter)
      .select((keyCols.map(col) :+ valueCol.cast("double").as("__x")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(round(col("__x"), 6).cast("decimal(38,12)")).as("__s1"),
        sum(round(round(col("__x"), 6) * round(col("__x"), 6), 6)
          .cast("decimal(38,12)")).as("__s2"))
      .select(
        (keyCols.map(col) :+
          when(col("__n") < 2, raise_error(concat(
            lit("cusum: key with fewer than 2 baseline rows: "),
            concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))))
            .otherwise(col("__n")).as("__n") :+
          col("__s1") :+ col("__s2")): _*)
      .select(
        (keyCols.map(col) :+
          round(col("__s1").cast("double") / col("__n"), 12)
            .as("cusum_mu") :+
          round(sqrt(greatest(lit(0.0),
            (col("__s2").cast("double")
              - col("__s1").cast("double") * col("__s1").cast("double")
                / col("__n")) / (col("__n") - 1))), 12)
            .as("cusum_sigma")): _*)
  }

  /** Page–Hinkley upward-drift detector (Page 1954; Hinkley 1971 —
    * public): the BASELINE-FREE companion to [[cusumWithStats]] — no
    * reference window to choose, the running mean IS the reference:
    * m_t = Σᵢ(xᵢ − x̄ᵢ − δ) with x̄ᵢ the running mean through i, and
    * PH_t = m_t − min_{s≤t} m_s alarms when it exceeds λ. Detects
    * upward mean shifts; feed `-valueCol` for the downward side.
    *
    * Engine-parity: values round 6, the running-mean numerator folds in
    * decimal(38,12), x̄ rounds 12, increments round 12 and fold in
    * decimal, PH rounds 6 — the cusum recipe. Windows partition on the
    * series key (series length per key is the only per-task width).
    * Returns (keys..., periodCol, value, running_mean, ph, alarm)
    * ordered within key by period. */
  def pageHinkley(df: DataFrame, keyCols: Seq[String], periodCol: String,
      valueCol: Column, delta: Double, lambda: Double): DataFrame = {
    require(keyCols.nonEmpty, "at least one series key required")
    require(lambda > 0, s"lambda must be positive: $lambda")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(periodCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = round(valueCol.cast("double"), 6)
    val base = df.select(
      (keyCols.map(col) :+ col(periodCol) :+ x.as("__x")): _*)
    val xbar = round(
      sum(col("__x").cast("decimal(38,12)")).over(w).cast("double")
        / count(lit(1)).over(w), 12)
    base
      .withColumn("__xbar", xbar)
      .withColumn("__m",
        sum(round(col("__x") - col("__xbar") - lit(delta), 12)
          .cast("decimal(38,12)")).over(w))
      .withColumn("ph",
        round((col("__m") - min(col("__m")).over(w)).cast("double"), 6))
      .select(
        (keyCols.map(col) :+ col(periodCol) :+ col("__x").as("value") :+
          col("__xbar").as("running_mean") :+ col("ph") :+
          (col("ph") > lambda).as("alarm")): _*)
  }

  /** [[cusum]] against PRE-COMPUTED reference stats (keys…, cusum_mu,
    * cusum_sigma) — the frozen-reference form the streaming monitor
    * ([[graft.streaming.CusumMonitor]]) shares arithmetic with. */
  def cusumWithStats(df: DataFrame, keyCols: Seq[String], periodCol: String,
      valueCol: Column, stats: DataFrame, kSigma: Double = 0.5,
      hSigma: Double = 5.0): DataFrame = {
    require(keyCols.nonEmpty, "at least one series key required")
    val base = df.select(
      (keyCols.map(col) :+ col(periodCol) :+
        valueCol.cast("double").as("__x")): _*)
    val joined = base.join(broadcast(stats
      .withColumnRenamed("cusum_mu", "__mu")
      .withColumnRenamed("cusum_sigma", "__sigma")), keyCols)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(periodCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slack = col("__sigma") * kSigma
    def s(pCol: Column) = round(
      (pCol - least(lit(0).cast("decimal(38,12)"), min(pCol).over(w)))
        .cast("double"), 6)
    joined
      .withColumn("__ppos", sum(round(col("__x") - col("__mu") - slack, 12)
        .cast("decimal(38,12)")).over(w))
      .withColumn("__pneg", sum(round(col("__mu") - slack - col("__x"), 12)
        .cast("decimal(38,12)")).over(w))
      .withColumn("__spos0", s(col("__ppos")))
      .withColumn("__sneg0", s(col("__pneg")))
      .select(
        (keyCols.map(col) :+ col(periodCol) :+ col("__x").as("value") :+
          when(col("__sigma") > 0, col("__spos0")).as("s_pos") :+
          when(col("__sigma") > 0, col("__sneg0")).as("s_neg") :+
          when(col("__sigma") > 0,
            greatest(col("__spos0"), col("__sneg0"))
              > round(col("__sigma") * hSigma, 6)).as("flag")): _*)
  }

  /** Self-contained form: baseline stats from rows passing
    * `baselineFilter`, then [[cusumWithStats]]. */
  def cusum(df: DataFrame, keyCols: Seq[String], periodCol: String,
      valueCol: Column, baselineFilter: Column, kSigma: Double = 0.5,
      hSigma: Double = 5.0): DataFrame =
    cusumWithStats(df, keyCols, periodCol, valueCol,
      cusumBaseline(df, keyCols, valueCol, baselineFilter), kSigma, hSigma)

  /** Classical additive seasonal decomposition of hourly event counts
    * (the moving-average textbook method — Kendall/Stuart; STL's simple
    * ancestor): per series key, n = trend + seasonal + residual with
    *  - trend: centered moving average over ±period/2 hours (a RANGE
    *    frame on epoch hours — gaps simply contribute fewer neighbors);
    *  - seasonal: the mean detrended value of each hour-of-day slot
    *    ((epoch/3600) % 24 — integer, timezone-free), folded as
    *    12-rounded decimals so slot means are summation-order-proof;
    *  - residual: what's left — the anomaly-feed input.
    * Everything runs on the BUCKET table (hours × keys — tiny next to
    * the event log, which is touched exactly once by the bucketing
    * groupBy); per-key windows partition on the series key. Rounded to
    * 6 at every emitted stage so both engines and any partitioning
    * agree. Returns (key, bucket_s, n, trend, seasonal, residual). */
  def seasonalDecompose(
      events: DataFrame, keyCol: String, tsCol: String,
      periodHours: Int = 24): DataFrame = {
    require(periodHours >= 2 && periodHours % 2 == 0,
      s"periodHours must be even and >= 2, got $periodHours")
    val half = periodHours / 2
    val buckets = events
      .select(col(keyCol).as("key"),
        (unix_seconds(col(tsCol)) - pmod(unix_seconds(col(tsCol)),
          lit(3600L))).as("bucket_s"))
      .groupBy("key", "bucket_s").agg(count(lit(1)).as("n"))
    val wTrend = Window.partitionBy(col("key"))
      .orderBy(col("bucket_s"))
      .rangeBetween(-half * 3600L, half * 3600L)
    val trended = buckets
      .withColumn("trend", round(avg(col("n")).over(wTrend), 6))
      // slot by integer arithmetic: bucket_s % (period·3600) is an exact
      // multiple of 3600, so the division is exact in any numeric type
      .withColumn("slot",
        (pmod(col("bucket_s"), lit(periodHours * 3600L)) / lit(3600L))
          .cast("long"))
      .withColumn("detr", round(col("n") - col("trend"), 6))
    val wSlot = Window.partitionBy(col("key"), col("slot"))
    trended
      .withColumn("seasonal",
        round(sum(col("detr").cast("decimal(38,12)")).over(wSlot)
          .cast("double") / count(lit(1)).over(wSlot), 6))
      .withColumn("residual",
        round(col("n") - col("trend") - col("seasonal"), 6))
      .select("key", "bucket_s", "n", "trend", "seasonal", "residual")
  }

  /** Seasonal and trend STRENGTH of the decomposition (Hyndman &
    * Athanasopoulos, "Forecasting: Principles and Practice" §12 —
    * public): F_s = max(0, 1 − Var(R)/Var(n − T)) and
    * F_t = max(0, 1 − Var(R)/Var(n − S)) per key — the one-number
    * answers to "is this series actually seasonal / trending, or is the
    * decomposition fitting noise", the gate before any
    * seasonality-aware monitor is trusted.
    *
    * Composes [[seasonalDecompose]]: ONE per-key aggregation of
    * round-12 decimal moment folds over the decomposition columns
    * (population variances — the m-divisor; ratios are scale-free so
    * the df convention cancels), then pure column arithmetic. Strength
    * is null when the denominator variance is 0 (constant series).
    * Returns per key (key, n_buckets, var_remainder, seasonal_strength,
    * trend_strength) ordered by key, round-6. */
  def seasonalStrength(
      events: DataFrame, keyCol: String, tsCol: String,
      periodHours: Int = 24): DataFrame = {
    val dec = seasonalDecompose(events, keyCol, tsCol, periodHours)
    def fold(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val sPlusR = col("n") - col("trend")
    val tPlusR = col("n") - col("seasonal")
    val agg = dec.groupBy("key").agg(
      count(lit(1)).as("m"),
      fold(col("residual")).as("sr"),
      fold(col("residual") * col("residual")).as("srr"),
      fold(sPlusR).as("sd"), fold(sPlusR * sPlusR).as("sdd"),
      fold(tPlusR).as("st"), fold(tPlusR * tPlusR).as("stt"))
    val m = col("m").cast("double")
    def varOf(s: Column, ss: Column) = ss / m - (s / m) * (s / m)
    val varR = varOf(col("sr"), col("srr"))
    val varSR = varOf(col("sd"), col("sdd"))
    val varTR = varOf(col("st"), col("stt"))
    agg.select(col("key"), col("m").as("n_buckets"),
        round(varR, 6).as("var_remainder"),
        when(varSR > 0,
          round(greatest(lit(0.0), lit(1.0) - varR / varSR), 6))
          .as("seasonal_strength"),
        when(varTR > 0,
          round(greatest(lit(0.0), lit(1.0) - varR / varTR), 6))
          .as("trend_strength"))
      .orderBy("key")
  }

  /** Marketing-style revenue attribution: each `convType` event's value
    * credits the user's qualifying touch (an event whose type is in
    * `touchTypes`) inside the trailing `windowSeconds`; conversions with
    * no in-window touch credit the `"direct"` channel. Two standard
    * models:
    *  - `"last"`: the latest touch strictly BEFORE the conversion (rows
    *    frame up to the previous (ts, ord) row, `last(..., ignoreNulls)`);
    *  - `"first"`: the earliest in-window touch (RANGE frame over epoch
    *    seconds; struct-min orders by (ts, ord)).
    * Both are one per-user ordered window — no conversions×touches
    * self-join — and values credit in exact integer cents. Ties on ts
    * break by `ordCol`. Returns (channel, n_conversions, revenue_cents),
    * one shuffle on the user key + one channel-sized aggregation. */
  def attributeRevenue(
      events: DataFrame, touchTypes: Seq[String], convType: String,
      windowSeconds: Long, model: String = "last",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valCol: String = "value",
      ordCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(model == "last" || model == "first",
      s"model must be 'last' or 'first', got $model")
    require(windowSeconds > 0, s"windowSeconds must be positive")
    val base = events.select(col(userCol).as("u"),
      unix_seconds(col(tsCol)).as("__t"), col(ordCol).as("__o"),
      col(typeCol).as("ty"), round(col(valCol) * 100).cast("long").as("__c"))
    val isTouch = col("ty").isin(touchTypes: _*)
    val touchStruct = when(isTouch, struct(col("__t"), col("__o"), col("ty")))
    val touched = model match {
      case "last" =>
        val w = Window.partitionBy(col("u")).orderBy(col("__t"), col("__o"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.withColumn("__touch", last(touchStruct, ignoreNulls = true).over(w))
      case "first" =>
        val w = Window.partitionBy(col("u")).orderBy(col("__t"))
          .rangeBetween(-windowSeconds, Window.currentRow)
        base.withColumn("__touch", min(touchStruct).over(w))
    }
    touched.filter(col("ty") === convType)
      .withColumn("channel",
        when(col("__touch").isNotNull &&
            col("__touch.__t") >= col("__t") - windowSeconds,
          col("__touch.ty")).otherwise(lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"),
        coalesce(sum(col("__c")), lit(0L)).as("revenue_cents"))
  }

  /** Linear (equal-split) multi-touch attribution — the third standard
    * model beside [[attributeRevenue]]'s last/first touch: every
    * qualifying touch inside the trailing window shares the conversion
    * equally (1/k of the count, value/k of the cents); conversions with
    * no in-window touch credit `"direct"` in full. Touches must be
    * strictly before the conversion in (ts, ord) order (the last-touch
    * rule), and at most `windowSeconds` old.
    *
    * Scale shape: conversions join touches on the USER key (one
    * shuffle); the in-window filter bounds the pair count by per-user
    * activity inside the window, and k comes from a window partitioned
    * BY CONVERSION — per-conversion frames, never a global sort.
    *
    * Exactness: shares and credits are round-6 doubles of exact
    * integer-cent ratios, folded as decimals — the SQL oracle replays
    * every division. Returns (channel, conversions, revenue_cents),
    * both round-6 doubles (a conversion splits fractionally). */
  def attributeRevenueLinear(
      events: DataFrame, touchTypes: Seq[String], convType: String,
      windowSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valCol: String = "value",
      ordCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowSeconds > 0, s"windowSeconds must be positive")
    // no null filtering: a conversion with a null user or ts simply
    // matches no touch and credits "direct", same as the last/first
    // models and their oracles
    val base = events.select(col(userCol).as("u"),
      unix_seconds(col(tsCol)).as("__t"), col(ordCol).as("__o"),
      col(typeCol).as("ty"), round(col(valCol) * 100).cast("long").as("__c"))
    val conv = base.filter(col("ty") === convType)
      .select(col("u"), col("__t").as("ct"), col("__o").as("co"),
        col("__c").as("cents"))
    val tch = base.filter(col("ty").isin(touchTypes: _*))
      .select(col("u").as("tu"), col("__t").as("tt"), col("__o").as("to"),
        col("ty").as("channel_raw"))
    val j = conv.join(tch,
      conv("u") === tch("tu") &&
        (col("tt") < col("ct") ||
          (col("tt") === col("ct") && col("to") < col("co"))) &&
        col("tt") >= col("ct") - windowSeconds,
      "left")
    val w = Window.partitionBy(col("u"), col("ct"), col("co"))
    j.withColumn("k", count(col("channel_raw")).over(w))
      .select(
        when(col("k") === 0, lit("direct")).otherwise(col("channel_raw"))
          .as("channel"),
        when(col("k") === 0, lit(1.0))
          .otherwise(round(lit(1.0) / col("k"), 6)).as("share"),
        when(col("k") === 0, col("cents").cast("double"))
          .otherwise(round(col("cents") / col("k"), 6)).as("credit"))
      .groupBy("channel").agg(
        round(sum(col("share").cast("decimal(38,12)")).cast("double"), 6)
          .as("conversions"),
        round(sum(col("credit").cast("decimal(38,12)")).cast("double"), 6)
          .as("revenue_cents"))
      .orderBy("channel")
  }

  /** Cohort LTV curve: cumulative revenue per signup-cohort user by
    * account age — the "when does a cohort pay back" view that
    * retention curves (ev_retention_cohorts) show only in counts.
    * Cohort = the week (`grainDays`-bucket) of the user's FIRST event;
    * age = whole buckets since that first event; ltv = cumulative
    * cohort revenue ÷ cohort size (ALL cohort users, not just the ones
    * still active — the standard definition).
    *
    * Scale shape: one groupBy(user) for first days, one join back on
    * the user key, one groupBy(cohort, age) with map-side combine;
    * the cumulative sweep windows WITHIN each cohort over the
    * age-bounded frame. Revenue folds as round-9 decimals end-to-end
    * (the cumulative sum stays decimal), ltv is one double division
    * rounded 6. Returns (cohort_week, age_weeks, cohort_size,
    * n_active_users, revenue, ltv_per_user) ordered by (cohort, age). */
  def ltvCurve(
      events: DataFrame, tsCol: String = "ts", userCol: String = "user_id",
      valCol: String = "value", grainDays: Int = 7): DataFrame = {
    require(grainDays >= 1, s"grainDays must be >= 1, got $grainDays")
    val day = expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(userCol).as("u"), day.as("d"),
        round(col(valCol), 9).cast("decimal(38,12)").as("v"))
    // floor division — the right week semantics for negative epoch days
    // (a bare (x / k).cast("long") truncates toward zero and mis-buckets
    // pre-1970 timestamps). NOTE DuckDB's `//` also TRUNCATES toward
    // zero, so the paired oracle must spell the bucket as
    // CAST(floor(x / 7.0) AS BIGINT), never `// 7`
    val firsts = base.groupBy("u").agg(min(col("d")).as("f"))
    val sizes = firsts
      .groupBy(floor(col("f") / grainDays).cast("long").as("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = base.join(firsts, Seq("u"))
      .groupBy(
        floor(col("f") / grainDays).cast("long").as("cohort_week"),
        floor((col("d") - col("f")) / grainDays).cast("long").as("age_weeks"))
      .agg(count_distinct(col("u")).as("n_active_users"),
        sum(col("v")).as("__rev"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__cum", sum(col("__rev")).over(w))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("age_weeks"), col("cohort_size"),
        col("n_active_users"),
        round(col("__rev").cast("double"), 9).as("revenue"),
        round(col("__cum").cast("double") / col("cohort_size"), 6)
          .as("ltv_per_user"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** Poisson dispersion screen for per-key daily counts (Fisher's
    * dispersion index test, public): VMR = s²/x̄ and the dispersion
    * statistic D = (n−1)·VMR ~ χ²(n−1) under a homogeneous Poisson.
    * VMR ≫ 1 = bursty/clumped arrivals (the usual reality for traffic),
    * VMR ≪ 1 = suspiciously regular (rate-limited or synthetic) — the
    * one-line sanity check before any count-based anomaly threshold.
    *
    * Two map-side-combined aggregations ((key, day) counts, then per-key
    * moments over exact integers); everything after is the same double
    * arithmetic in both engines. Days with zero events are NOT imputed —
    * the index describes observed-day counts (document the grain).
    * Returns per key (key, n_days, mean_count, vmr, dispersion_chi2),
    * round-6; vmr/χ² null when n_days < 2 or the mean is 0. */
  /** Gumbel block-maxima fit + return level (Gumbel 1958; the
    * method-of-moments fit is textbook extreme-value theory, public):
    * split the daily series into fixed `blockDays` blocks, take each
    * block's max, fit Gumbel(μ, β) by moments (β = s·√6/π,
    * μ = m − γ·β), and report the T-block return level
    * μ − β·ln(−ln(1 − 1/T)) — "the busiest day we should expect once
    * per T months", the capacity-planning number a mean+3σ rule gets
    * badly wrong on extreme-value tails.
    *
    * Block maxima are EXACT integer counts from two map-side-combined
    * aggregations; the fit is fixed double arithmetic over exact
    * moments with the three irrational constants (√6/π, Euler γ,
    * ln(−ln(1−1/T))) inlined as literal doubles into BOTH engines (the
    * zQuantile convention). Returns one row (k_blocks, mean_max,
    * sd_max, beta, mu, return_level), round-6; needs ≥ 3 blocks with
    * variance (loud). */
  def gumbelBlockMaxima(
      events: DataFrame, tsCol: String = "ts", blockDays: Int = 30,
      returnPeriod: Int = 100): DataFrame = {
    require(blockDays >= 7, s"blocks under a week are noise: $blockDays")
    require(returnPeriod >= 2, s"returnPeriod >= 2: $returnPeriod")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
    // floor division: pre-1970 days land in the right block (oracle
    // mirrors with CAST(floor(day / b) AS BIGINT) — DuckDB `//` truncates)
    val m = daily
      .groupBy(floor(col("day") / blockDays).cast("long").as("blk"))
      .agg(max(col("x")).as("mx"))
      .agg(count(lit(1)).as("k"), sum(col("mx")).as("sm"),
        sum(col("mx") * col("mx")).as("smm"))
      .head()
    val k = m.getAs[Long]("k")
    require(k >= 3, s"Gumbel fit needs >= 3 blocks, got $k")
    val sm = m.getAs[Long]("sm"); val smm = m.getAs[Long]("smm")
    val mean = sm.toDouble / k
    val v = (smm - sm.toDouble * sm / k) / (k - 1)
    require(v > 0.0, "constant block maxima - no tail to fit")
    val s = math.sqrt(v)
    val beta = s * Sqrt6OverPi
    val mu = mean - EulerGamma * beta
    val g = math.log(-math.log(1.0 - 1.0 / returnPeriod))
    val rl = mu - beta * g
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = events.sparkSession
    import spark.implicits._
    Seq((k, r6(mean), r6(s), r6(beta), r6(mu), r6(rl)))
      .toDF("k_blocks", "mean_max", "sd_max", "beta", "mu",
        "return_level")
  }

  /** √6/π and Euler–Mascheroni γ — shared as the SAME literal doubles
    * by the Spark op and the SQL oracle (cross-engine irrational
    * constants follow the zQuantile inline convention). */
  val Sqrt6OverPi: Double = math.sqrt(6.0) / math.Pi
  val EulerGamma: Double = 0.5772156649015329

  /** Mann–Kendall monotonic-trend test on the daily count series (Mann
    * 1945; Kendall 1975 — public): S = Σ_{i<j} sgn(x_j − x_i) over time
    * pairs, tie-corrected variance, continuity-corrected z — the
    * NONPARAMETRIC companion to the OLS slope: it sees any monotone
    * drift, outliers can't drag it, and with [[graft.stats.Regression]]
    * Theil–Sen it's the standard robust trend pair.
    *
    * The daily series is calendar-bounded BY CONTRACT (the acfDaily
    * grain), so S comes from one driver-side Fenwick pass over the
    * collected series — O(m log m) on m days, loudly capped at
    * `maxDays`; at a finer grain, pre-bin first. Every input to S, the
    * variance, and τ_a is an exact integer, so a SQL oracle replays
    * them from the (m²)-pair join. Returns one row (n_days, s, tau_a,
    * z, p_value): τ/z round-6, z null when the variance is 0 (constant
    * series); the normal p is library-only. */
  def mannKendallDaily(
      events: DataFrame, tsCol: String = "ts",
      maxDays: Int = 200000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy("day")
      .as[(Long, Long)].collect()
    val n = daily.length
    require(n >= 3, s"Mann-Kendall needs >= 3 days, got $n")
    require(n <= maxDays,
      s"$n days exceeds the $maxDays calendar-bounded cap - pre-bin first")
    // Fenwick tree over rank-compressed values: S = concordant − discordant
    val sortedVals = daily.map(_._2).distinct.sorted
    val rank = sortedVals.zipWithIndex.toMap
    val m = sortedVals.length
    val tree = Array.ofDim[Long](m + 1)
    def update(i0: Int): Unit = {
      var i = i0 + 1
      while (i <= m) { tree(i) += 1; i += i & (-i) }
    }
    def queryBelow(i0: Int): Long = { // count of ranks < i0
      var i = i0; var s = 0L
      while (i > 0) { s += tree(i); i -= i & (-i) }
      s
    }
    var s = 0L
    var seen = 0L
    daily.foreach { case (_, x) =>
      val r = rank(x)
      val below = queryBelow(r)
      val atOrBelow = queryBelow(r + 1)
      val above = seen - atOrBelow
      s += below - above
      update(r); seen += 1
    }
    val ties = daily.groupBy(_._2).map(_._2.length.toLong)
      .filter(_ > 1).toSeq
    val nI = BigInt(n)
    val varNum = nI * (n - 1) * (2 * n + 5) -
      ties.map(t => BigInt(t) * (t - 1) * (2 * t + 5)).sum
    val varS = varNum.toDouble / 18.0
    val tau = s.toDouble / (n * (n - 1L) / 2.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val (z, p): (Option[Double], Option[Double]) =
      if (varS <= 0.0) (None, None)
      else {
        val zv =
          if (s > 0) (s - 1) / math.sqrt(varS)
          else if (s < 0) (s + 1) / math.sqrt(varS)
          else 0.0
        (Some(r6(zv)), Some(r6(2.0 * (1.0 -
          new org.apache.commons.math3.distribution.NormalDistribution(0, 1)
            .cumulativeProbability(math.abs(zv))))))
      }
    Seq((n.toLong, s, r6(tau), z, p))
      .toDF("n_days", "s", "tau_a", "z", "p_value")
  }

  /** Day-of-week effect strength on the daily count series — one-way
    * ANOVA of daily counts across the seven weekday phases (weekday =
    * epoch-day mod 7, a pure 7-phase grouping — deterministic and
    * calendar-library-free): F says whether the weekly rhythm is real,
    * η² says how much of the daily variance it explains — the number
    * that decides whether anomaly thresholds must be
    * weekday-conditioned (compose with [[seasonalDecompose]]).
    *
    * Per-weekday moments are EXACT integer sums (counts); the
    * scatter decomposition runs in the plan over the 7-row group table
    * (the t12 recipe — reorder error ≤ 7 ulp, far inside the rounds).
    * Returns one row (n_days, f_stat, df_between, df_within,
    * eta_squared), F round-4, η² round-6. */
  def weekdayEffect(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
    val g = daily.groupBy(pmod(col("day"), lit(7)).as("wd"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"))
    val tot = g.agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
      (sum(col("s1")).cast("double") / sum(col("n_g"))).as("gm"))
    val ss = g.crossJoin(broadcast(tot)).agg(
        max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("n_g") * (col("s1").cast("double") / col("n_g") - col("gm"))
          * (col("s1").cast("double") / col("n_g") - col("gm"))).as("ssb"),
        sum(col("s2").cast("double")
          - col("s1").cast("double") * col("s1") / col("n_g")).as("ssw"))
      .head()
    val n = ss.getAs[Long]("n"); val k = ss.getAs[Long]("k")
    require(k >= 2 && n > k, s"degenerate weekday table: n=$n k=$k")
    val ssb = ss.getAs[Double]("ssb"); val ssw = ss.getAs[Double]("ssw")
    require(ssb + ssw > 0.0, "constant daily series - nothing to decompose")
    val dfb = k - 1; val dfw = n - k
    def hu(x: Double, s: Int) = java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    // ssw = 0 means the rhythm explains EVERYTHING: F is infinite — a
    // null F with eta² = 1 is the honest report, not an exception
    val f: Option[Double] =
      if (ssw > 0.0) Some(hu((ssb / dfb) / (ssw / dfw), 4)) else None
    val spark = events.sparkSession
    import spark.implicits._
    Seq((n, f, dfb, dfw, hu(ssb / (ssb + ssw), 6)))
      .toDF("n_days", "f_stat", "df_between", "df_within", "eta_squared")
  }

  /** Local-maximum days of the daily event-count series — the
    * spike-finder next to the z-score/CUSUM monitors: a peak is a day
    * STRICTLY above both calendar neighbors (a missing neighbor counts
    * as 0 events — an empty day is a real trough of an event count),
    * at or above `minCount` so one-event blips don't report. The
    * strict-both-sides rule means plateaus have NO peak (deterministic
    * by construction; detect plateaus with [[EventAnalytics.cusumDaily]]
    * instead).
    *
    * Scale shape: one day-count aggregation, two hash self-joins on
    * day±1 — calendar-bounded, no window, no sort. Returns
    * (day, n_events, prev_n, next_n) for peak days ordered by day. */
  def dailyPeaks(
      events: DataFrame, tsCol: String = "ts",
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("n_events"))
    val prev = daily.select((col("day") + 1L).as("day"),
      col("n_events").as("prev_n"))
    val next = daily.select((col("day") - 1L).as("day"),
      col("n_events").as("next_n"))
    daily.join(prev, Seq("day"), "left").join(next, Seq("day"), "left")
      .select(col("day"), col("n_events"),
        coalesce(col("prev_n"), lit(0L)).as("prev_n"),
        coalesce(col("next_n"), lit(0L)).as("next_n"))
      .filter(col("n_events") > col("prev_n") &&
        col("n_events") > col("next_n") &&
        col("n_events") >= minCount)
      .orderBy("day")
  }

  /** Inter-event gap statistics + Goh–Barabási burstiness per event
    * type (Goh & Barabási 2008, public): consecutive same-user gaps in
    * seconds, summarized as mean / median / B = (σ−μ)/(σ+μ) with the
    * POPULATION σ (the classic definition). B → −1 is a metronome
    * (rate-limited, synthetic), B ≈ 0 is Poisson, B → 1 is bursty —
    * the per-stream companion to [[dispersionByKey]]'s per-day view.
    *
    * Scale shape: one window partitioned by (type, user) — per-stream
    * frames, never a global sort — then one map-side-combined groupBy
    * with exact integer gap moments plus an exact percentile (the
    * median is over the per-type gap multiset; swap approx_percentile
    * past ~10⁹ gaps per type). Ties on ts break by `ordCol`. Returns
    * (key, n_gaps, mean_gap, median_gap, burstiness), round-6;
    * burstiness null when σ + μ = 0 (a single-gap or all-zero-gap
    * stream). */
  def interEventGaps(
      events: DataFrame, keyCol: String = "event_type",
      userCol: String = "user_id", tsCol: String = "ts",
      ordCol: String = "event_id"): DataFrame = {
    val base = events
      .filter(col(keyCol).isNotNull && col(userCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(userCol).as("u"),
        unix_seconds(col(tsCol)).as("t"), col(ordCol).as("o"))
    val w = Window.partitionBy(col("key"), col("u"))
      .orderBy(col("t"), col("o"))
    val gaps = base
      .withColumn("__prev", lag(col("t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("key"), (col("t") - col("__prev")).as("g"))
    gaps.groupBy("key").agg(
        count(lit(1)).as("n_gaps"),
        sum(col("g")).as("__sg"),
        sum(col("g") * col("g")).as("__sgg"),
        round(percentile(col("g").cast("double"), lit(0.5)), 6)
          .as("median_gap"))
      .select(col("key"), col("n_gaps"),
        round(col("__sg").cast("double") / col("n_gaps"), 6).as("mean_gap"),
        col("median_gap"),
        when(
          sqrt((col("__sgg") - col("__sg").cast("double") * col("__sg")
            / col("n_gaps")) / col("n_gaps"))
            + col("__sg").cast("double") / col("n_gaps") > 0.0,
          round((sqrt((col("__sgg") - col("__sg").cast("double")
            * col("__sg") / col("n_gaps")) / col("n_gaps"))
            - col("__sg").cast("double") / col("n_gaps"))
            / (sqrt((col("__sgg") - col("__sg").cast("double") * col("__sg")
              / col("n_gaps")) / col("n_gaps"))
              + col("__sg").cast("double") / col("n_gaps")), 6))
          .as("burstiness"))
      .orderBy("key")
  }

  def dispersionByKey(
      events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val day = expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("key"), day.as("d"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("key").agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("__sx"),
        sum(col("x") * col("x")).as("__sxx"))
      .select(col("key"), col("n_days"),
        round(col("__sx").cast("double") / col("n_days"), 6)
          .as("mean_count"),
        when(col("n_days") >= 2 && col("__sx") > 0,
          round(((col("__sxx") - col("__sx").cast("double") * col("__sx")
            / col("n_days")) / (col("n_days") - 1))
            / (col("__sx").cast("double") / col("n_days")), 6))
          .as("vmr"),
        when(col("n_days") >= 2 && col("__sx") > 0,
          round((col("n_days") - 1) * (((col("__sxx")
            - col("__sx").cast("double") * col("__sx") / col("n_days"))
            / (col("n_days") - 1))
            / (col("__sx").cast("double") / col("n_days"))), 6))
          .as("dispersion_chi2"))
      .orderBy("key")
  }

  /** Truncated ADJUSTED exponentially-weighted moving average of the
    * daily event-count series (pandas `ewm(adjust=True)` semantics,
    * horizon-truncated): per day t,
    * ewma_t = Σ_{j<H, t−j present} w_j·x_{t−j} / Σ w_j, w_j = (1−α)^j —
    * renormalizing over PRESENT lags handles both the series head and
    * gap days exactly instead of smearing an arbitrary s₀ through them.
    * The classic trend smoother / EWMA control-chart statistic next to
    * the z-score and CUSUM monitors.
    *
    * Engine parity: the weights are computed ONCE here by repeated
    * multiplication and inlined as literals into BOTH plans (IEEE pow
    * is not correctly rounded and may differ between runtimes — literal
    * weights sidestep it); weighted terms round to 12 and decimal-fold,
    * the quotient rounds to 9. Returns (day, n_events, ewma).
    *
    * Scale shape: one day-count aggregation, one H-fold lag explode +
    * hash join on the day key, one map-side-combined fold — shuffles
    * bounded by days × H, independent of event volume. */
  /** Sample autocorrelation of the daily event-count series at lags
    * 1..maxLag (Box & Jenkins 1970 — public): the seasonality/burstiness
    * screen next to [[seasonalDecompose]] — a spike at lag 7 is weekly
    * rhythm, a slow decay is trend the anomaly monitors should detrend
    * first. acf(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² with x̄ and the
    * denominator over the FULL series (the standard estimator); pairs
    * whose t+k day is unobserved are skipped (calendar gaps excluded,
    * reported via n_pairs).
    *
    * Scale shape: one map-side-combined daily count (the only pass over
    * the event log — the series itself is calendar-bounded), a broadcast
    * 1-row mean/denominator, a lag-join of the tiny series against
    * itself. Terms fold as rounded decimals; every number oracle-exact.
    * Returns (lag, n_pairs, acf) for 1..maxLag, acf rounded to 6. */
  def acfDaily(events: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = events.sparkSession
    val daily = events
      .filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    def fold(c: Column): Column =
      sum(c.cast("decimal(38,12)")).cast("double")
    val tot = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val withMu = daily.crossJoin(broadcast(tot))
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .select(col("day"), col("x"), col("mu"))
    val den = withMu.agg(
      fold(round((col("x") - col("mu")) * (col("x") - col("mu")), 6))
        .as("den"))
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag"))
    val a = withMu.crossJoin(broadcast(lags))
    val b = daily.select(col("day").as("__bday"), col("x").as("xb"))
    a.join(b, col("__bday") === col("day") + col("lag"))
      .groupBy("lag").agg(
        count(lit(1)).as("n_pairs"),
        fold(round((col("x") - col("mu")) * (col("xb") - col("mu")), 6))
          .as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("__num") / col("den"), 6).as("acf"))
      .orderBy("lag")
  }

  def ewmaDailyCounts(
      events: DataFrame, tsCol: String = "ts", alpha: Double = 0.3,
      horizon: Int = 16): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    require(horizon >= 1 && horizon <= 64, s"horizon in [1,64]: $horizon")
    val w = ewmaWeights(alpha, horizon)
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
    val daily = events.groupBy(day.as("day"))
      .agg(count(lit(1)).as("n_events"))
    // (target day, weight) fan-out of each source day: day d contributes
    // to targets d..d+H-1 with weight w_j — the join stays on day keys
    val contrib = daily.select(
        posexplode(array(w.map(lit).toIndexedSeq: _*)).as(Seq("__j", "__w")),
        col("day"), col("n_events"))
      .select((col("day") + col("__j")).as("day"), col("__w"),
        col("n_events"))
    daily.join(
        contrib.groupBy("day").agg(
          sum(round(col("__w") * col("n_events"), 12)
            .cast("decimal(38,14)")).as("__num"),
          sum(round(col("__w"), 12).cast("decimal(38,14)")).as("__den")),
        Seq("day"))
      .select(col("day"), col("n_events"),
        round(col("__num").cast("double") / col("__den").cast("double"), 9)
          .as("ewma"))
  }

  /** w_j = (1−α)^j by repeated multiplication — deterministic doubles
    * shared verbatim by the Spark plan and the SQL oracle. */
  private[graft] def ewmaWeights(alpha: Double, horizon: Int): Array[Double] = {
    val w = Array.ofDim[Double](horizon)
    w(0) = 1.0
    for (j <- 1 until horizon) w(j) = w(j - 1) * (1.0 - alpha)
    w
  }

  /** Association rules over per-basket item sets (Agrawal & Srikant's
    * market-basket pairs, 1994 — public): for each ORDERED item pair
    * (a → b) co-occurring in ≥ `minBaskets` baskets, support,
    * confidence, and lift — the event-co-occurrence miner ("users who
    * hit `error` also hit `retry`") beside the sequence-based path
    * trigrams. Items are DISTINCT per basket (multiplicity is a
    * different question); every metric is a ratio of integer basket
    * counts rounded to 9, so engines agree exactly.
    *
    * Scale shape: one distinct (basket, item) pass; the pair join is
    * per-basket — shuffle volume Σ items_b², which is safe when baskets
    * are small by nature (event TYPES per user, tags per doc). Baskets
    * wider than `maxBasketItems` fail loudly rather than quietly
    * going quadratic (pre-bucket items or mine top-k items only).
    * Returns (item_a, item_b, n_a, n_b, n_ab, support, confidence,
    * lift) ordered by (item_a, item_b). */
  def itemsetPairs(
      df: DataFrame, basketCol: String, itemCol: String,
      minBaskets: Long = 1L, maxBasketItems: Int = 1000): DataFrame = {
    val bi = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"),
        col(itemCol).cast("string").as("__i"))
      .distinct()
      .persist()
    try {
      // max over zero baskets is null — read it nullably so an empty or
      // all-null input yields the (correct) empty pair table instead of
      // a bare NullPointerException out of getLong
      val widest = Option(bi.groupBy("__b").agg(count(lit(1)).as("w"))
        .agg(max("w")).head().getAs[java.lang.Long](0))
        .fold(0L)(_.longValue())
      require(widest <= maxBasketItems,
        s"widest basket carries $widest items > maxBasketItems=" +
          s"$maxBasketItems — the pair join would go quadratic; " +
          "pre-bucket or mine top-k items")
      val nBaskets = bi.select("__b").distinct().count()
      val itemCounts = bi.groupBy(col("__i")).agg(count(lit(1)).as("n"))
      val pairs = bi.join(
          bi.select(col("__b"), col("__i").as("__j")), Seq("__b"))
        .filter(col("__i") =!= col("__j"))
        .groupBy(col("__i").as("item_a"), col("__j").as("item_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= minBaskets)
      pairs
        .join(itemCounts.select(col("__i").as("item_a"), col("n").as("n_a")),
          Seq("item_a"))
        .join(itemCounts.select(col("__i").as("item_b"), col("n").as("n_b")),
          Seq("item_b"))
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_ab"),
          round(col("n_ab") / lit(nBaskets.toDouble), 9).as("support"),
          round(col("n_ab") / col("n_a").cast("double"), 9)
            .as("confidence"),
          round(col("n_ab").cast("double") * nBaskets
            / (col("n_a") * col("n_b")).cast("double"), 9).as("lift"))
    } finally bi.unpersist(blocking = false)
  }

  /** First-occurrence precedence mining — the ORDER-aware companion to
    * [[itemsetPairs]]: for each ordered pair of event types (a, b),
    * how many ids saw both, and in how many the FIRST a strictly
    * preceded the FIRST b ("users hit `signup` before `purchase`" —
    * the funnel-hypothesis generator that [[funnel]] then tests with a
    * fixed step order). Ties on the first-occurrence timestamp count
    * NEITHER direction (order unknowable at the stored grain), so
    * n_a_first(a,b) + n_a_first(b,a) ≤ n_both.
    *
    * Scale shape: one (id, type) min-timestamp aggregation, then a
    * per-id self-join whose fan-out is (types-per-id)² — bounded by
    * the event-TYPE domain, the same contract as [[markovTransitions]];
    * ids wider than `maxTypes` fail loudly. Output is type-pair-sized.
    * Returns (type_a, type_b, n_both, n_a_first, precedence) ordered
    * by (type_a, type_b); precedence = n_a_first/n_both rounded 9. */
  def sequencePairs(
      df: DataFrame, idCol: String, tsCol: String, typeCol: String,
      maxTypes: Int = 1000): DataFrame = {
    val firsts = df
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .groupBy(col(idCol).as("__id"), col(typeCol).cast("string").as("__t"))
      .agg(min(col(tsCol)).as("__ts"))
      .persist()
    try {
      val widest = Option(firsts.groupBy("__id")
        .agg(count(lit(1)).as("w")).agg(max("w")).head()
        .getAs[java.lang.Long](0)).fold(0L)(_.longValue())
      require(widest <= maxTypes,
        s"an id carries $widest distinct types > maxTypes=$maxTypes — " +
          "the precedence join would go quadratic; mine top-k types")
      firsts.join(
          firsts.select(col("__id"), col("__t").as("__u"),
            col("__ts").as("__ts2")), Seq("__id"))
        .filter(col("__t") =!= col("__u"))
        .groupBy(col("__t").as("type_a"), col("__u").as("type_b"))
        .agg(
          count(lit(1)).as("n_both"),
          sum(when(col("__ts") < col("__ts2"), 1L).otherwise(0L))
            .as("n_a_first"))
        .select(col("type_a"), col("type_b"), col("n_both"),
          col("n_a_first"),
          round(col("n_a_first").cast("double")
            / col("n_both").cast("double"), 9).as("precedence"))
        .orderBy("type_a", "type_b")
    } finally firsts.unpersist(blocking = false)
  }

  /** Brown's double exponential smoothing over the daily event-count
    * series (Brown 1956, public) — the TREND-aware extension of
    * [[ewmaDailyCounts]]: smooth the series once (S1), smooth the
    * smoothed series again (S2), and read level = 2·S1 − S2,
    * trend = α/(1−α)·(S1 − S2), one-step forecast = level + trend.
    * Because both passes are the truncated-adjusted EWMA (finite
    * weight fan-out, NOT the infinite recursion), the whole operator
    * stays a pair of day-keyed joins over the calendar-bounded daily
    * table — no sequential fold, no driver state, and a SQL oracle
    * replays every term (the recursive form is not expressible without
    * engine-specific recursion semantics; the truncated form is the
    * documented contract, exact to (1−α)^H of the infinite memory).
    *
    * Returns (day, n_events, s1, s2, level, trend, forecast_1): s1/s2
    * rounded 9; level/trend rounded 6; forecast_1 is the sum of the
    * ROUNDED level and trend (exact in both engines). */
  def brownLinearDaily(
      events: DataFrame, tsCol: String = "ts", alpha: Double = 0.3,
      horizon: Int = 16): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    val s1 = ewmaDailyCounts(events, tsCol, alpha, horizon)
      .withColumnRenamed("ewma", "s1")
    val w = ewmaWeights(alpha, horizon)
    val contrib = s1.select(
        posexplode(array(w.map(lit).toIndexedSeq: _*)).as(Seq("__j", "__w")),
        col("day"), col("s1"))
      .select((col("day") + col("__j")).as("day"), col("__w"), col("s1"))
    val s2 = contrib.groupBy("day").agg(
        sum(round(col("__w") * col("s1"), 12).cast("decimal(38,14)"))
          .as("__num"),
        sum(round(col("__w"), 12).cast("decimal(38,14)")).as("__den"))
      .select(col("day"),
        round(col("__num").cast("double") / col("__den").cast("double"), 9)
          .as("s2"))
    val gain = alpha / (1.0 - alpha)
    s1.join(s2, Seq("day"))
      .withColumn("level", round(lit(2.0) * col("s1") - col("s2"), 6))
      .withColumn("trend", round(lit(gain) * (col("s1") - col("s2")), 6))
      .select(col("day"), col("n_events"), col("s1"), col("s2"),
        col("level"), col("trend"),
        (col("level") + col("trend")).as("forecast_1"))
      .orderBy("day")
  }

  /** Rolling-origin backtest of [[brownLinearDaily]]'s one-step
    * forecast against the realized next day — the "is the forecaster
    * actually better than doing nothing" gate every smoother needs:
    * MAE of the model vs MAE of the NAIVE forecast (tomorrow = today),
    * their ratio (MASE-style, < 1 = the model earns its keep), and
    * sMAPE. Pairs skip calendar gaps (a forecast for an unobserved day
    * is unverifiable, not zero-error).
    *
    * Pure composition: the forecast table joins itself shifted one day
    * — day-keyed, calendar-bounded, no window. Errors round to 6 and
    * fold as decimals; each summary is one double division. Returns one
    * row (n_pairs, mae_model, mae_naive, mase, smape, theils_u2),
    * round-6 — Theil's U₂ (Theil 1966, public) is the RMSE-based twin
    * of the MAE-based MASE (squared errors punish the occasional big
    * miss MAE forgives); both < 1 = the model earns its keep. */
  def forecastBacktestDaily(
      events: DataFrame, tsCol: String = "ts", alpha: Double = 0.3,
      horizon: Int = 16): DataFrame = {
    val b = brownLinearDaily(events, tsCol, alpha, horizon)
    val nxt = b.select((col("day") - 1L).as("day"),
      col("n_events").as("a_next"))
    val pairs = b.join(nxt, Seq("day"))
      .select(
        round(abs(col("forecast_1") - col("a_next")), 6).as("e_m"),
        abs(col("a_next") - col("n_events")).as("e_n"),
        round(lit(2.0) * abs(col("forecast_1") - col("a_next"))
          / (col("forecast_1") + col("a_next")), 9).as("sm"),
        round((col("forecast_1") - col("a_next"))
          * (col("forecast_1") - col("a_next")), 9).as("e_m2"),
        ((col("a_next") - col("n_events"))
          * (col("a_next") - col("n_events"))).as("e_n2"))
    def fold(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        fold(col("e_m")).as("__sm_m"),
        sum(col("e_n")).as("__s_n"),
        fold(col("sm")).as("__s_smape"),
        fold(col("e_m2")).as("__s_m2"),
        sum(col("e_n2")).as("__s_n2"))
      .select(col("n_pairs"),
        round(col("__sm_m") / col("n_pairs"), 6).as("mae_model"),
        round(col("__s_n").cast("double") / col("n_pairs"), 6)
          .as("mae_naive"),
        when(col("__s_n") > 0L,
          round((col("__sm_m") / col("n_pairs"))
            / (col("__s_n").cast("double") / col("n_pairs")), 6))
          .as("mase"),
        round(col("__s_smape") / col("n_pairs"), 6).as("smape"),
        when(col("__s_n2") > 0L,
          round(sqrt(col("__s_m2") / col("__s_n2").cast("double")), 6))
          .as("theils_u2"))
  }

  /** Daily OHLC bars per series key — the candlestick/market-bar
    * aggregation (open / high / low / close / volume / total), here over
    * an event stream's numeric `value` keyed by `event_type`.
    *
    * Open and close are selected by lexicographic struct min/max over
    * (ts, id, value): `idCol` must be unique, so the value never
    * participates in the comparison and the picked row is fully
    * deterministic — the same tie-break a SQL oracle replays with
    * row_number ORDER BY (ts, id). High/low/open/close pass the RAW
    * double through untouched (no arithmetic → bit-exact cross-engine);
    * only the total folds, as a round-9 decimal.
    *
    * Scale shape: ONE groupBy on (day, key) with map-side combine —
    * min/max/count/sum are all partial-aggregable, so shuffle volume is
    * one row per (day, key) per map task regardless of event volume. No
    * windows, no joins. */
  def ohlcDaily(
      events: DataFrame, tsCol: String = "ts", keyCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val e = events
      .filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(
        expr(s"unix_micros($tsCol) div ${86400L * 1000000L}").as("day"),
        col(keyCol).as("key"),
        struct(col(tsCol), col(idCol), col(valCol).as("v")).as("__k"),
        col(valCol).as("__v"))
    e.groupBy("day", "key").agg(
        min(col("__k")).getField("v").as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(col("__k")).getField("v").as("close"),
        count(lit(1)).as("volume"),
        round(sum(round(col("__v"), 9).cast("decimal(38,12)")).cast("double"),
          9).as("total_value"))
      .orderBy("day", "key")
  }

  /** Maximum drawdown of a cumulative series (Magdon-Ismail & Atiya
    * 2004 surveys it; the definition is folklore-public): the largest
    * peak-to-trough fall of the running total of `yCol` over `tCol`
    * order — THE risk lens on any wandering KPI (net revenue, token
    * budget burn-down, error-credit balance).
    *
    * Distributed shape: NO unpartitioned window. One integer-grain
    * aggregation is assumed done by the caller (daily sums — the
    * calendar-bounded contract shared with [[acfDaily]]); here the
    * series is range-sorted ONCE, pass 1 collects per-partition
    * (sum, max-prefix, argmax-day) scalars, a driver scanLeft turns
    * them into per-partition (offset, entering-running-max) — the
    * classic parallel scan — and pass 2 finds each partition's best
    * (drawdown, trough) under those offsets. Driver traffic is
    * per-partition scalars.
    *
    * Exactness: the running sums accumulate round-9 values in exact
    * BigDecimal (the same DECIMAL(38,12) fold a SQL oracle windows
    * over), so peaks, troughs, and ties are bit-identical. Tie policy:
    * the EARLIEST day achieving the running max is the peak; the
    * EARLIEST day achieving the maximal drawdown is the trough.
    * Returns one row (n_days, peak_day, trough_day, max_drawdown — the
    * nearest double of the exact ≤9-decimal drawdown, no re-rounding);
    * a never-falling series reports drawdown 0 with peak = trough =
    * first day. */
  def maxDrawdown(series: DataFrame, tCol: String, yCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val sorted = series
      .filter(col(tCol).isNotNull && col(yCol).isNotNull)
      .select(col(tCol).cast("long").as("t"),
        round(col(yCol).cast("double"), 9).cast("decimal(38,12)").as("y"))
      .as[(Long, java.math.BigDecimal)].rdd
      .sortBy(_._1)
    sorted.cache()
    try {
      // pass 1: per-partition total, max prefix, and the EARLIEST day
      // achieving that max prefix (strictly-greater updates only)
      val stats = sorted.mapPartitionsWithIndex { (i, it) =>
        var sum = java.math.BigDecimal.ZERO
        var maxPfx: java.math.BigDecimal = null
        var maxDay = 0L; var n = 0L
        it.foreach { case (t, y) =>
          sum = sum.add(y); n += 1
          if (maxPfx == null || sum.compareTo(maxPfx) > 0) {
            maxPfx = sum; maxDay = t
          }
        }
        Iterator((i, sum, maxPfx, maxDay, n))
      }.collect().sortBy(_._1)
      val nDays = stats.map(_._5).sum
      require(nDays > 0, "max drawdown needs at least one point")
      // driver scan: offsets and the running max (value, day) entering
      // each partition
      val offsets = Array.ofDim[java.math.BigDecimal](stats.length)
      val enterMax = Array.ofDim[(java.math.BigDecimal, Long)](stats.length)
      var off = java.math.BigDecimal.ZERO
      var run: (java.math.BigDecimal, Long) = null
      stats.zipWithIndex.foreach { case ((_, sum, maxPfx, maxDay, n), i) =>
        offsets(i) = off
        enterMax(i) = run
        if (n > 0) {
          val absMax = off.add(maxPfx)
          if (run == null || absMax.compareTo(run._1) > 0) run = (absMax, maxDay)
        }
        off = off.add(sum)
      }
      // pass 2: best (drawdown, trough, peak) per partition under the scan
      val offB = sorted.sparkContext.broadcast((offsets, enterMax))
      val best = sorted.mapPartitionsWithIndex { (i, it) =>
        val (offs, enters) = offB.value
        var cum = offs(i)
        var runMax: java.math.BigDecimal =
          if (enters(i) == null) null else enters(i)._1
        var peakDay: Long = if (enters(i) == null) 0L else enters(i)._2
        var bestDd: java.math.BigDecimal = null
        var bestTrough = 0L; var bestPeak = 0L
        it.foreach { case (t, y) =>
          cum = cum.add(y)
          if (runMax == null || cum.compareTo(runMax) > 0) {
            runMax = cum; peakDay = t
          }
          val dd = runMax.subtract(cum)
          if (bestDd == null || dd.compareTo(bestDd) > 0) {
            bestDd = dd; bestTrough = t; bestPeak = peakDay
          }
        }
        if (bestDd == null) Iterator.empty
        else Iterator((bestDd, bestTrough, bestPeak))
      }.collect()
      val (dd, trough, peak) = best.reduceLeft { (a, b) =>
        val c = a._1.compareTo(b._1)
        if (c > 0 || (c == 0 && a._2 <= b._2)) a else b
      }
      // dd is an exact ≤9-decimal value (round-9 inputs); emit the
      // nearest double of that exact decimal — the same thing a SQL
      // CAST(dd AS DOUBLE) produces, with no re-rounding in between
      Seq((nDays, peak, trough, dd.doubleValue + 0.0))
        .toDF("n_days", "peak_day", "trough_day", "max_drawdown")
    } finally sorted.unpersist(blocking = false)
  }

  /** Period-over-period user turnover: per observed period (grainDays
    * buckets of epoch days), how many users were active, NEW (not
    * active the previous period), RETAINED (active in both), and
    * CHURNED (active the previous period but not this one). The
    * accounting identity behind every growth dashboard:
    * active_t = retained_t + new_t and active_{t−1} = retained_t +
    * churned_t — [[retentionCohorts]] answers "how long do users live",
    * turnover answers "what changed this week".
    *
    * One distinct (user, period) pass, one full-outer self-join on the
    * period-shifted key (both sides shuffle on (user, period) — no
    * window, no driver state), one period rollup of exact counts.
    * A period appears when it has current activity OR observed churn
    * (n_churned counts the PRIOR period's users, so a week in which
    * every previous user vanished still reports — dropping it would
    * break active_{t−1} = retained_t + churned_t across the gap);
    * periods with neither are skipped. Returns (period, n_active,
    * n_new, n_retained, n_churned) ordered by period. */
  def userTurnover(
      events: DataFrame, tsCol: String = "ts", keyCol: String = "user_id",
      grainDays: Int = 7): DataFrame = {
    require(grainDays >= 1, s"grainDays must be >= 1: $grainDays")
    val day = expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
    val uw = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("u"),
        floor(day / grainDays).cast("long").as("w"))
      .distinct()
    val cur = uw.select(col("u"), col("w"), lit(1).as("c"))
    val prev = uw.select(col("u"), (col("w") + 1).as("w"), lit(1).as("p"))
    val maxWRow = uw.agg(max(col("w"))).head()
    require(!maxWRow.isNullAt(0), "turnover needs at least one event")
    val maxW = maxWRow.getLong(0)
    cur.join(prev, Seq("u", "w"), "full_outer")
      .filter(col("w") <= maxW)
      .groupBy("w").agg(
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_active"),
        sum(when(col("c").isNotNull && col("p").isNull, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("c").isNotNull && col("p").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("c").isNull && col("p").isNotNull, 1L).otherwise(0L))
          .as("n_churned"))
      .filter(col("n_active") > 0 || col("n_churned") > 0)
      .select(col("w").as("period"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_churned"))
      .orderBy("period")
  }

  /** Peak concurrency by sweep line: the maximum number of
    * simultaneously-open intervals and the earliest instant attaining
    * it. Intervals are per-(key, day) activity spans [first event ts,
    * last event ts] — closed on both ends, a +1 endpoint sorting before
    * any −1 at the same instant — so the number answers "how many users
    * were on at once", the capacity question a daily-active count hides.
    *
    * The sweep is the [[maxDrawdown]] parallel prefix scan: endpoints
    * sort ONCE by the total order (t, +1-before-−1, key-hash, day), each
    * partition reports its local prefix extremum, the driver combines
    * |partitions| scalars — NO unpartitioned window, no data-sized
    * driver state. All arithmetic is exact longs. Returns one row
    * (n_intervals, peak_concurrency, peak_at_us). */
  def peakConcurrency(
      events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val day = expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
    val iv = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("u"), day.as("d"))
      .agg(min(expr(s"unix_micros($tsCol)")).as("s"),
        max(expr(s"unix_micros($tsCol)")).as("e"))
    val nIv = iv.count()
    require(nIv > 0, "peak concurrency needs at least one interval")
    // the key participates ONLY in the sort's tie order (all deltas in a
    // (t, delta) tie group are equal, so the prefix trajectory — and
    // therefore the peak and its instant — is invariant to that order);
    // hashing it to a long keeps the Dataset encoding independent of the
    // caller's key type (a string keyCol used to throw here)
    val ends = iv.select(col("s").as("t"), lit(1).as("delta"),
        xxhash64(col("u")).as("uh"), col("d"))
      .unionByName(iv.select(col("e").as("t"), lit(-1).as("delta"),
        xxhash64(col("u")).as("uh"), col("d")))
      .as[(Long, Int, Long, Long)].rdd
      .sortBy(r => (r._1, -r._2, r._3, r._4))
    ends.cache()
    try {
      val stats = ends.mapPartitionsWithIndex { (i, it) =>
        var sum = 0L
        var maxPfx = Long.MinValue
        var maxT = 0L
        it.foreach { case (t, d, _, _) =>
          sum += d
          if (sum > maxPfx) { maxPfx = sum; maxT = t }
        }
        Iterator((i, sum, maxPfx, maxT))
      }.collect().sortBy(_._1)
      var off = 0L
      var peak = Long.MinValue
      var peakT = 0L
      stats.foreach { case (_, sum, maxPfx, maxT) =>
        if (maxPfx != Long.MinValue && off + maxPfx > peak) {
          peak = off + maxPfx; peakT = maxT
        }
        off += sum
      }
      Seq((nIv, peak, peakT))
        .toDF("n_intervals", "peak_concurrency", "peak_at_us")
    } finally ends.unpersist(blocking = false)
  }

  /** Hour-of-day activity profile: events per UTC hour with each hour's
    * share and the peak flag — the load-shape table behind capacity
    * planning and the weekday/hour conditioning [[weekdayEffect]]
    * justifies statistically. One map-side-combined groupBy on the
    * 24-bounded hour key (non-negative mod — pre-1970 safe); shares are
    * exact-count ratios round-6, the peak flag compares exact counts
    * (ties all flag). Returns ≤ 24 rows (hour, n_events, share,
    * is_peak) ordered by hour. */
  def hourlyProfile(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val hour = pmod(expr(s"unix_micros($tsCol) div ${3600L * 1000000L}"),
      lit(24L))
    val byHour = events.filter(col(tsCol).isNotNull)
      .groupBy(hour.as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val tot = byHour.agg(sum(col("n_events")).as("t"),
      max(col("n_events")).as("mx"))
    byHour.crossJoin(broadcast(tot))
      .select(col("hour"), col("n_events"),
        round(col("n_events").cast("double") / col("t"), 6).as("share"),
        (col("n_events") === col("mx")).as("is_peak"))
      .orderBy("hour")
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978, public) on the daily
    * count series: Q_L = n(n+2)·Σ_{k≤L} r_k²/(n−k) ~ χ²(L) under white
    * noise — "is there ANY autocorrelation structure up to lag L", the
    * one-number gate before trusting i.i.d.-assuming monitors (EWMA
    * limits, dispersion screens) on a series [[acfDaily]] shows lag by
    * lag.
    *
    * Composes [[acfDaily]]'s round-6 autocorrelations (exact-moment
    * recipe) with one L-bounded cumulative sweep: per-lag terms
    * r_k²/(n−k) round to 9 and fold as decimals, so the cumulative Q is
    * order-invariant and a SQL oracle replays it from the same acf
    * table. Returns one row per lag (lag, acf, q_stat, p_value), Q
    * round-6, χ²(lag) p library-only. */
  def ljungBox(
      events: DataFrame, tsCol: String = "ts", maxLag: Int = 10): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val n = events.filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}").as("day"))
      .distinct().count()
    require(n > maxLag + 1,
      s"Ljung-Box needs more days than lags: n=$n maxLag=$maxLag")
    val acf = acfDaily(events, tsCol, maxLag)
    // L-bounded sweep (lags ≤ maxLag rows — the bins-bounded-window
    // convention); terms fold as round-9 decimals
    val w = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = round(col("acf") * col("acf") / (lit(n) - col("lag")), 9)
    val out = acf
      .withColumn("__cum",
        sum(term.cast("decimal(38,12)")).over(w).cast("double"))
      .select(col("lag"), col("acf"),
        round(lit(n.toDouble) * (n + 2) * col("__cum"), 6).as("q_stat"))
    val spark = events.sparkSession
    val chi = out.collect().map { r =>
      val lag = r.getAs[Long]("lag")
      val q = r.getAs[Double]("q_stat")
      val p = 1.0 - new org.apache.commons.math3.distribution
        .ChiSquaredDistribution(lag.toDouble)
        .cumulativeProbability(math.max(q, 0.0))
      (lag, r.getAs[Double]("acf"), q,
        BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0)
    }
    import spark.implicits._
    chi.toSeq.toDF("lag", "acf", "q_stat", "p_value").orderBy("lag")
  }

  /** Partial autocorrelations of the daily count series at lags 1–3
    * (Durbin–Levinson unrolled; Box–Jenkins, public): the ACF says the
    * series remembers, the PACF says HOW — an AR(p) process cuts off
    * after lag p in the PACF, so this is the 3-line AR-order
    * identification next to [[acfDaily]]'s decay view and
    * [[ljungBox]]'s "any memory at all".
    *
    * Composes [[acfDaily]]'s round-6 autocorrelations; the three-step
    * recursion (φ₁₁ = r₁; φ₂₂ = (r₂−φ₁₁r₁)/(1−r₁²); φ₃₃ with the
    * stage-2 coefficients) is fixed scalar double arithmetic a SQL
    * oracle replays as chained CTEs. Returns 3 rows (lag, acf, pacf),
    * pacf round-6; loud when an innovation variance hits 0 (perfectly
    * predictable series). */
  def pacfDaily(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val acf = acfDaily(events, tsCol, maxLag = 3).orderBy("lag")
      .select("lag", "acf").as[(Long, Double)].collect()
    require(acf.length == 3, s"PACF(3) needs lags 1..3, got ${acf.length}")
    val r1 = acf(0)._2; val r2 = acf(1)._2; val r3 = acf(2)._2
    val phi11 = r1
    val v1 = 1.0 - r1 * r1
    require(v1 > 0.0, "lag-1 autocorrelation is +/-1 - series is AR(1)-exact")
    val phi22 = (r2 - phi11 * r1) / v1
    val phi21 = phi11 - phi22 * phi11
    val v2 = v1 * (1.0 - phi22 * phi22)
    require(v2 > 0.0, "lag-2 recursion degenerate - series is AR(2)-exact")
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) / v2
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((1L, r1, r6(phi11)), (2L, r2, r6(phi22)), (3L, r3, r6(phi33)))
      .toDF("lag", "acf", "pacf")
  }

  /** Dickey–Fuller unit-root screen (Dickey & Fuller 1979, public) on
    * the daily count series: regress Δx_t on x_{t−1} with intercept and
    * report the τ_μ statistic — "is this metric mean-reverting
    * (stationary) or a drifting random walk", the question that decides
    * whether fixed thresholds ([[ewmaDailyCounts]] limits) make sense
    * at all. τ has the non-standard DF distribution, so instead of a p
    * the row carries the verdict against the inlined large-n 5%
    * critical value τ_μ = −2.86 (Fuller 1976 Table 8.5.2 — the
    * cross-engine inline-constant convention).
    *
    * Pairs are CONSECUTIVE days only (join on day+1 — a calendar gap
    * contributes no Δ); u = x_{t−1} and v = Δx_t are exact integers, so
    * one map-side-combined aggregation yields the five exact moment
    * sums (decimal folds) and the OLS t-statistic is fixed double
    * arithmetic a SQL oracle replays. Returns one row (n_pairs, beta,
    * t_stat, stationary_5pct), β and τ round-6. */
  def dickeyFuller(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
    val b = daily.select(col("day").as("__bday"), col("x").as("xb"))
    val dec = "decimal(38,0)"
    val m = daily.join(b, col("__bday") === col("day") + 1)
      .select(col("x").as("u"), (col("xb") - col("x")).as("v"))
      .agg(count(lit(1)).as("m"),
        sum(col("u").cast(dec)).as("su"),
        sum(col("v").cast(dec)).as("sv"),
        sum(col("u").cast(dec) * col("v")).as("suv"),
        sum(col("u").cast(dec) * col("u")).as("suu"),
        sum(col("v").cast(dec) * col("v")).as("svv"))
      .head()
    val mN = m.getAs[Long]("m")
    require(mN >= 4, s"Dickey-Fuller needs >= 4 consecutive-day pairs: $mN")
    def d(i: String) = m.getAs[java.math.BigDecimal](i).doubleValue
    val (su, sv, suv, suu, svv) = (d("su"), d("sv"), d("suv"), d("suu"),
      d("svv"))
    val sxx = suu - su * su / mN
    val sxy = suv - su * sv / mN
    val syy = svv - sv * sv / mN
    require(sxx > 0.0, "constant daily level - unit-root geometry degenerate")
    val beta = sxy / sxx
    val sse = syy - beta * sxy
    require(sse >= 0.0 && mN > 2, s"degenerate residuals: sse=$sse")
    val s2 = sse / (mN - 2)
    require(s2 > 0.0, "perfect AR fit - nothing stochastic to test")
    val t = beta / math.sqrt(s2 / sxx)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((mN, r6(beta), r6(t), r6(t) < -2.86))
      .toDF("n_pairs", "beta", "t_stat", "stationary_5pct")
  }

  /** Sample entropy (Richman & Moorman 2000, public) of the daily count
    * series at template length m=2: SampEn = −ln(A/B) where B counts
    * ordered template pairs matching at length 2 and A those still
    * matching at length 3 (Chebyshev distance ≤ r = 0.2·sd, the
    * canonical tolerance) — LOW SampEn = regular/predictable traffic,
    * HIGH = irregular; the complexity companion to [[weekdayEffect]]'s
    * rhythm strength.
    *
    * Templates are CONSECUTIVE day triples (two day+1 self-joins —
    * calendar gaps break templates by contract); the pair comparison is
    * a bounded self-join of the template table (days loudly capped at
    * `maxDays`, i<j pairs only). Counts are exact integers (integer
    * Chebyshev distances against the round-9-pinned r), so the oracle
    * replays A, B, and −ln(A/B) exactly. Returns one row (n_days,
    * n_templates, r_tol, b_pairs, a_pairs, sampen), round-6. */
  def sampleEntropy(
      events: DataFrame, tsCol: String = "ts",
      maxDays: Int = 20000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
    val mom = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("s2")).head()
    val n = mom.getAs[Long]("n")
    require(n >= 5, s"sample entropy needs >= 5 days, got $n")
    require(n <= maxDays,
      s"$n days exceeds the $maxDays cap - pre-bin to a coarser grain")
    val s1 = mom.getAs[Long]("s1").toDouble
    val s2 = mom.getAs[java.math.BigDecimal]("s2").doubleValue
    val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    require(sd > 0.0, "constant daily series - no variability to measure")
    val r = BigDecimal(0.2 * sd)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t1 = daily.select(col("day").as("d1"), col("x").as("x1"))
    val t2 = daily.select(col("day").as("d2"), col("x").as("x2"))
    val tmpl = daily
      .join(t1, col("d1") === col("day") + 1)
      .join(t2, col("d2") === col("day") + 2)
      .select(col("day"), col("x").as("x0"), col("x1"), col("x2"))
    val a0 = tmpl.select(col("day").as("i"), col("x0").as("a0"),
      col("x1").as("a1"), col("x2").as("a2"))
    val b0 = tmpl.select(col("day").as("j"), col("x0").as("b0"),
      col("x1").as("b1"), col("x2").as("b2"))
    val pairs = a0.join(b0, col("i") < col("j"))
      .select(
        greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")))
          .as("d2m"),
        greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")),
          abs(col("a2") - col("b2"))).as("d3m"))
      .agg(
        sum(when(col("d2m") <= r, 1L).otherwise(0L)).as("b"),
        sum(when(col("d3m") <= r, 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("nt"))
      .head()
    val bC = pairs.getAs[Long]("b"); val aC = pairs.getAs[Long]("a")
    require(bC > 0 && aC > 0,
      s"no matching templates at tolerance r=$r (A=$aC B=$bC) - " +
        "raise rFrac via a coarser grain or accept SampEn undefined")
    val nTemplates = tmpl.count()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((n, nTemplates, r, bC, aC, r6(-math.log(aC.toDouble / bC))))
      .toDF("n_days", "n_templates", "r_tol", "b_pairs", "a_pairs",
        "sampen")
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; the R/S
    * method is textbook, public) on the daily count series: chunk the
    * calendar into fixed blocks of b days, compute each block's
    * rescaled range R/S (range of mean-adjusted cumulative sums over
    * population sd), average per b, and fit H as the log-log slope
    * across block sizes. H ≈ 0.5 = memoryless, H > 0.5 = persistent
    * (trends compound — capacity planning must widen), H < 0.5 =
    * anti-persistent. The long-memory companion to [[acfDaily]]'s
    * short-lag view.
    *
    * Blocks are CALENDAR blocks (floor((day − d_min)/b)); only complete
    * blocks (exactly b observed days) with positive variance enter.
    * The within-block cumulative sweep is a block-PARTITIONED ordered
    * window; per-block R/S rounds to 9 and per-b means fold as
    * decimals, so a SQL oracle replays the whole table. H is OLS over
    * the ≤|blockSizes| (ln b, ln mean R/S) points with ln b shared as
    * the same double by both engines. Returns per-b rows (block_days,
    * n_blocks, mean_rs, h_exponent) ordered by block_days, round-6;
    * needs ≥ 2 usable block sizes (loud). */
  def hurstRS(
      events: DataFrame, tsCol: String = "ts",
      blockSizes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 4),
      s"block sizes must be >= 4 days: $blockSizes")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div ${86400L * 1000000L}")
        .as("day"))
      .agg(count(lit(1)).as("x"))
    val dmin = daily.agg(min(col("day"))).head().getLong(0)
    val perB = blockSizes.distinct.sorted.map { b =>
      val blk = daily
        .withColumn("blk", floor((col("day") - dmin) / b).cast("long"))
      val moms = blk.groupBy("blk").agg(count(lit(1)).as("nb"),
        sum(col("x")).as("bs1"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("bs2"))
        .filter(col("nb") === b)
        .withColumn("mu", col("bs1").cast("double") / b)
        .withColumn("s",
          sqrt((col("bs2").cast("double") - col("bs1").cast("double")
            * col("bs1") / b) / b))
        .filter(col("s") > 0.0)
        .select(col("blk"), col("mu"), col("s"))
      val w = Window.partitionBy(col("blk")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rs = blk.join(moms, "blk")
        .withColumn("z", sum(col("x").cast("double") - col("mu")).over(w))
        .groupBy("blk").agg(
          ((max(col("z")) - min(col("z"))) / max(col("s"))).as("rs"))
        .agg(count(lit(1)).as("k"),
          sum(round(col("rs"), 9).cast("decimal(38,12)")).cast("double")
            .as("srs"))
        .head()
      val k = rs.getAs[Long]("k")
      (b, k, if (k > 0) rs.getAs[Double]("srs") / k else 0.0)
    }.filter(_._2 > 0)
    require(perB.length >= 2,
      s"Hurst fit needs >= 2 block sizes with complete blocks, " +
        s"got ${perB.length} of $blockSizes - series too short")
    val pts = perB.map { case (b, _, mrs) => (math.log(b), math.log(mrs)) }
    val kP = pts.length
    // every cross-point sum folds as round-12 decimals so the oracle's
    // unordered SUM over the ≤|blockSizes| fit points replays exactly
    def r12sum(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val mx = r12sum(pts.map(_._1)) / kP
    val my = r12sum(pts.map(_._2)) / kP
    val h = r12sum(pts.map(p => (p._1 - mx) * (p._2 - my))) /
      r12sum(pts.map(p => (p._1 - mx) * (p._1 - mx)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    perB.map { case (b, k, mrs) => (b.toLong, k, r6(mrs), r6(h)) }
      .toDF("block_days", "n_blocks", "mean_rs", "h_exponent")
      .orderBy("block_days")
  }
}
