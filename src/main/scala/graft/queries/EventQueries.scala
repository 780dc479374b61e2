package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.AsOfJoin
import graft.streaming.StreamingOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (batch plans that are
  * streaming-ready — see [[graft.streaming.StreamingOps]] for the
  * watermarked twins exercised in StreamingSpec).
  */
object EventQueries extends QueryModule {

  /** Tumbling 1-hour window per event type; Spark's epoch-aligned `window`
    * = DuckDB's `time_bucket`. */
  val evWindowed: Q = Q(
    "ev_windowed_agg",
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
    (s, dir) =>
      StreamingOps.windowedAgg(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type"))

  /** Gap-based sessionization (30-min inactivity) via lag + running sum.
    *
    * Driver-proofing (r1 hash mismatch that passed locally): the gate entry
    * emits session bounds as epoch-second BIGINTs (the source parquet is
    * TIMESTAMP(NANOS) — DuckDB keeps ns, Spark reads µs, so raw timestamps
    * can't hash-match) and the value sum as integer cents. The sessionize
    * library API keeps timestamps + decimal-backed doubles.
    */
  val evSessionize: Q = Q(
    "ev_sessionize",
    Some("""
      WITH b AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR (epoch_us(ts) // 1000000)
                    - (epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) // 1000000) > 1800
               THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM b)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        epoch_us(min(ts)) // 1000000 AS session_start_s,
        epoch_us(max(ts)) // 1000000 AS session_end_s,
        count(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_cents
      FROM s
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""),
    (s, dir) =>
      StreamingOps.sessionize(Tables.load(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          col("session_start").cast("long").as("session_start_s"),
          col("session_end").cast("long").as("session_end_s"),
          col("n_events"),
          (col("sum_value_exact") * 100).cast("long").as("sum_value_cents"))
        .orderBy("user_id", "session_seq"))

  /** Backward as-of join: each event takes the latest order at-or-before its
    * timestamp for the same user (ties: max order key) — the union-sort
    * implementation in [[graft.operators.AsOfJoin]]. */
  val evAsOf: Q = Q(
    "ev_asof_join",
    Some("""
      WITH j AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts),
      m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id)
      SELECT j.event_id, j.user_id, j.ts,
        max(j.o_orderkey) AS o_orderkey, max(j.o_orderdate) AS o_orderdate
      FROM j JOIN m ON j.event_id = m.event_id
        AND (j.o_orderdate = m.md OR (j.o_orderdate IS NULL AND m.md IS NULL))
      GROUP BY j.event_id, j.user_id, j.ts
      ORDER BY j.event_id"""),
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val orders = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_custkey", "user_id")
      AsOfJoin.backward(events, orders,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_orderdate"), tiebreak = "o_orderkey")
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    })

  /** Forward as-of: the EARLIEST order on/after each event (pandas
    * merge_asof direction='forward'); ties at the minimal date resolve to
    * the max order key, mirrored in the oracle. */
  val evAsOfForward: Q = Q(
    "ev_asof_forward",
    Some("""
      WITH j AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts),
      m AS (SELECT event_id, min(o_orderdate) AS md FROM j GROUP BY event_id)
      SELECT j.event_id, j.user_id, j.ts,
        max(j.o_orderkey) AS o_orderkey, max(j.o_orderdate) AS o_orderdate
      FROM j JOIN m ON j.event_id = m.event_id
        AND (j.o_orderdate = m.md OR (j.o_orderdate IS NULL AND m.md IS NULL))
      GROUP BY j.event_id, j.user_id, j.ts
      ORDER BY j.event_id"""),
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val orders = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_custkey", "user_id")
      AsOfJoin.forward(events, orders,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_orderdate"), tiebreak = "o_orderkey")
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    })

  /** Backward as-of with a staleness bound (pandas merge_asof tolerance):
    * matches staler than the bound are nulled out. The oracle recomputes
    * the unbounded backward match, then applies the same second-truncated
    * bound — integer epoch-second division on both engines. The bound sits
    * at the MEDIAN of the observed staleness distribution (the testdata's
    * event and order epochs are decades apart), so roughly half the rows
    * keep their match and half null — an always-null or always-keep
    * outcome could not pass this oracle. */
  val evAsOfTolerance: Q = Q(
    "ev_asof_tolerance",
    Some("""
      WITH j AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts),
      m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id),
      b AS (
        SELECT j.event_id, j.user_id, j.ts,
          max(j.o_orderkey) AS o_orderkey, max(j.o_orderdate) AS o_orderdate
        FROM j JOIN m ON j.event_id = m.event_id
          AND (j.o_orderdate = m.md OR (j.o_orderdate IS NULL AND m.md IS NULL))
        GROUP BY j.event_id, j.user_id, j.ts)
      SELECT event_id, user_id, ts,
        CASE WHEN o_orderdate IS NOT NULL
              AND epoch_us(ts) // 1000000 - epoch_us(o_orderdate) // 1000000 <= 725000000
             THEN o_orderkey END AS o_orderkey,
        CASE WHEN o_orderdate IS NOT NULL
              AND epoch_us(ts) // 1000000 - epoch_us(o_orderdate) // 1000000 <= 725000000
             THEN o_orderdate END AS o_orderdate
      FROM b
      ORDER BY event_id"""),
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val orders = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_custkey", "user_id")
      AsOfJoin.backward(events, orders,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_orderdate"), tiebreak = "o_orderkey",
          toleranceSeconds = Some(725000000L))
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    })

  /** JSON property extraction from the events `props` column. */
  /** Time-partitioned layout + partition pruning: events land as
    * Hive-style `event_date=.../` parquet once per source version, and a
    * one-week query must (a) prune 30 day-partitions to 7 AT PLANNING
    * TIME — asserted against the scan's selected-partition count, the
    * 100 TB data-skipping claim itself, not just the row values — and
    * (b) return rows value-identical to the oracle's ts-range scan of
    * the source parquet. */
  private val partDirs = scala.collection.concurrent.TrieMap[String, String]()
  val evPartitionedPrune: Q = Q(
    "ev_partitioned_prune",
    Some("""
      SELECT event_id, ts, user_id, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        AND ts < TIMESTAMP '2024-01-15 00:00:00'
      ORDER BY event_id"""),
    (s, dir) => {
      val path = partDirs.getOrElseUpdate(dir, {
        val d = java.nio.file.Files
          .createTempDirectory("graft-events-bydate-").toString
        graft.catalog.Layout.writeTimePartitioned(
          Tables.load(s, dir, "events"), "ts", d)
        d
      })
      val week = graft.catalog.Layout.readTimePartitioned(s, path)
        .filter(col("event_date") >= lit("2024-01-08") &&
          col("event_date") <= lit("2024-01-14"))
      // prove the prune: the physical scan must have planned only the 7
      // matching partition directories, not all 30
      val scans = week.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      require(scans.nonEmpty, "expected a FileSourceScanExec")
      val selected = scans.head.selectedPartitions.partitionCount
      require(selected == 7,
        s"partition pruning planned $selected partitions, expected 7 of 30")
      require(scans.head.partitionFilters.nonEmpty,
        "scan carries no PartitionFilters — predicate did not reach planning")
      week.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    })

  val evJson: Q = Q(
    "ev_json_extract",
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      ORDER BY event_id"""),
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"))

  /** Sliding-window live distinct-user count (1 h window / 30 min slide):
    * the reference's live participant counter over event time. Each event
    * lands in exactly length/slide = 2 epoch-aligned windows, which the
    * oracle reproduces with an explicit 2-row offset cross join. The
    * streaming twin ([[StreamingOps.liveCountStream]], StreamingSpec) swaps
    * `countDistinct` for HLL so window state stays constant-size. */
  val evLiveCount: Q = Q(
    "ev_live_count",
    Some("""
      SELECT time_bucket(INTERVAL '30 minutes', ts) - to_minutes(30 * i.i) AS window_start,
        count(DISTINCT user_id) AS live_users, count(*) AS n_events
      FROM events CROSS JOIN (VALUES (0), (1)) AS i(i)
      GROUP BY 1
      ORDER BY window_start"""),
    (s, dir) =>
      StreamingOps.liveCount(Tables.load(s, dir, "events"),
          windowLength = "1 hour", slide = "30 minutes")
        .orderBy("window_start"))

  /** Windowed per-event-type profile of `value` (count/nulls/mean/stddev/
    * min/max — all algebraic, so the watermarked streaming twin computes the
    * identical aggregate incrementally). Mean/stddev rounded on both sides
    * per the [[graft.Q]] exactness rules. */
  val evProfile: Q = Q(
    "ev_profile_windowed",
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        count(*) AS n, count(value) AS n_value,
        ROUND(avg(value), 6) AS mean_value,
        ROUND(stddev_pop(value), 4) AS std_value,
        CAST(min(value) AS DOUBLE) AS min_value,
        CAST(max(value) AS DOUBLE) AS max_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
    (s, dir) =>
      StreamingOps.windowedProfile(Tables.load(s, dir, "events"))
        .select(col("window_start"), col("event_type"), col("n"), col("n_value"),
          round(col("mean_value"), 6).as("mean_value"),
          round(col("std_value"), 4).as("std_value"),
          col("min_value"), col("max_value"))
        .orderBy("window_start", "event_type"))

  /** Per-user online z-score anomaly flags ([[graft.streaming.Anomaly]]):
    * each event judged against the running mean/variance of that user's
    * PRIOR events. Values are quantized to cents so the running sums are
    * exact integers — summation order (Spark running frame vs DuckDB
    * segment tree) cannot shift a flag; the oracle mirrors the squared-form
    * comparison op-for-op. */
  val evAnomaly: Q = Q(
    "ev_anomaly_flags",
    Some("""
      WITH c AS (
        SELECT event_id, user_id, ts, round(value * 100) AS c FROM events),
      w AS (
        SELECT event_id, user_id, c,
          count(c) OVER pw AS n_prior,
          sum(c) OVER pw AS sm,
          sum(c * c) OVER pw AS sq
        FROM c
        WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, n_prior,
        CASE WHEN n_prior >= 5
              AND (sq - sm * sm / n_prior) / (n_prior - 1) > 0
              AND (c - sm / n_prior) * (c - sm / n_prior)
                  > 9.0 * ((sq - sm * sm / n_prior) / (n_prior - 1))
             THEN true ELSE false END AS is_anomaly
      FROM w
      ORDER BY event_id"""),
    (s, dir) =>
      graft.streaming.Anomaly.flags(Tables.load(s, dir, "events")))

  /** Hourly forward-fill resampling per user ([[graft.operators.Resample]]):
    * irregular events aligned to a 1-hour grid, value carried from the last
    * prior observation. The carried value is a bit-exact COPY of an
    * observed double (no arithmetic), so hash parity needs no quantization;
    * timestamps emit as epoch seconds (grid points are exact hours). */
  val evResample: Q = Q(
    "ev_resample_ffill",
    Some("""
      WITH b AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS g0, max(ts) AS g1
        FROM events GROUP BY 1),
      grid AS (
        SELECT user_id, unnest(generate_series(g0, g1, INTERVAL 1 HOUR)) AS ts,
          0 AS is_obs, NULL::DOUBLE AS v
        FROM b),
      obs AS (SELECT user_id, ts, 1 AS is_obs, value AS v FROM events),
      u AS (SELECT * FROM grid UNION ALL SELECT * FROM obs),
      f AS (
        SELECT user_id, ts, is_obs,
          last_value(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, is_obs
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
        FROM u)
      SELECT user_id, epoch_us(ts) // 1000000 AS grid_ts_s, ff AS value
      FROM f
      WHERE is_obs = 0
      ORDER BY user_id, grid_ts_s"""),
    (s, dir) =>
      graft.operators.Resample
        .ffillGrid(Tables.load(s, dir, "events"), "user_id", "ts", "value")
        .select(col("user_id"), unix_seconds(col("ts")).as("grid_ts_s"),
          col("value"))
        .orderBy("user_id", "grid_ts_s"))

  /** Per-user value-over-time OLS trend ([[graft.stats.Regression
    * .trendByKey]]): time centered per key, values in cents, so all moment
    * sums are exact integers and the closed-form slope/intercept mirror
    * bit-for-bit. The oracle repeats the identical arithmetic. */
  val evTrend: Q = Q(
    "ev_trend_slopes",
    Some("""
      WITH b AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS t, round(value * 100) AS c
        FROM events),
      m AS (
        SELECT user_id, t, c, min(t) OVER (PARTITION BY user_id) AS t0
        FROM b),
      a AS (
        SELECT user_id, count(*) AS n,
          sum(CAST(t - t0 AS DOUBLE)) AS sx,
          sum(CAST(t - t0 AS DOUBLE) * CAST(t - t0 AS DOUBLE)) AS sxx,
          sum(c) AS sy,
          sum(CAST(t - t0 AS DOUBLE) * c) AS sxy
        FROM m GROUP BY 1)
      SELECT user_id, n,
        ROUND(CASE WHEN n * sxx - sx * sx > 0
          THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
          AS slope_cents_per_s,
        ROUND(CASE WHEN n * sxx - sx * sx > 0
          THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
          END, 6) AS intercept_cents
      FROM a
      ORDER BY user_id"""),
    (s, dir) =>
      graft.stats.Regression
        .trendByKey(Tables.load(s, dir, "events"), "user_id", "ts", "value"))

  /** Ordered funnel view→click→purchase within 48 h of first view
    * ([[graft.ops.EventAnalytics.funnel]]). One groupBy pass; the oracle
    * rebuilds the per-user conversion chain with the same sorted-array
    * fold. 150 → 96 → 41 users at sf0.01 — each stage discriminative. */
  val evFunnel: Q = Q(
    "ev_funnel_conversion",
    Some("""
      WITH u AS (
        SELECT user_id,
          min(ts) FILTER (event_type = 'view') AS t1,
          list_sort(list(ts) FILTER (event_type = 'click')) AS l2,
          list_sort(list(ts) FILTER (event_type = 'purchase')) AS l3
        FROM events GROUP BY 1),
      c AS (
        SELECT user_id, t1, l3,
          list_filter(l2, x -> x > t1
            AND x <= t1 + INTERVAL 48 HOUR)[1] AS t2
        FROM u),
      c2 AS (
        SELECT user_id, t1, t2,
          list_filter(l3, x -> x > t2
            AND x <= t1 + INTERVAL 48 HOUR)[1] AS t3
        FROM c),
      a AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM c2)
      SELECT 'view' AS step, 1 AS step_idx, n1 AS n_users FROM a
      UNION ALL SELECT 'click', 2, n2 FROM a
      UNION ALL SELECT 'purchase', 3, n3 FROM a
      ORDER BY step_idx"""),
    (s, dir) =>
      graft.ops.EventAnalytics.funnel(Tables.load(s, dir, "events"),
        steps = Seq("view", "click", "purchase"), window = "48 hours"))

  /** Weekly cohort retention ([[graft.ops.EventAnalytics.retention]]):
    * distinct users per (first-seen day, whole weeks since), days as
    * epoch-day integers. */
  val evRetention: Q = Q(
    "ev_retention_cohorts",
    Some("""
      WITH d AS (
        SELECT user_id,
          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events),
      m AS (
        SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort
        FROM d),
      w AS (
        SELECT DISTINCT user_id, cohort, (day - cohort) // 7 AS week
        FROM m)
      SELECT CAST(cohort AS BIGINT) AS cohort_day,
        CAST(week AS BIGINT) AS week_offset, count(*) AS n_active
      FROM w
      GROUP BY 1, 2
      ORDER BY cohort_day, week_offset"""),
    (s, dir) =>
      graft.ops.EventAnalytics.retention(Tables.load(s, dir, "events")))

  /** Trailing 24 h count/spend per event via a RANGE frame on epoch
    * seconds ([[graft.ops.EventAnalytics.rollingStats]]) — no quadratic
    * self-join; cents keep the window sums exact in both engines. */
  val evRolling: Q = Q(
    "ev_rolling_24h",
    Some("""
      WITH b AS (
        SELECT event_id, user_id, epoch_us(ts) // 1000000 AS t,
          round(value * 100) AS c
        FROM events)
      SELECT event_id, user_id,
        count(*) OVER rw AS n_window,
        CAST(sum(c) OVER rw AS BIGINT) AS sum_cents_window
      FROM b
      WINDOW rw AS (PARTITION BY user_id ORDER BY t
        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""),
    (s, dir) =>
      graft.ops.EventAnalytics
        .rollingStats(Tables.load(s, dir, "events"), windowSeconds = 86400L))

  /** SCD-2 dimension history from the event change log
    * ([[graft.ops.Upsert.scd2History]]): per-key validity intervals via
    * one lead window; attributes carried bit-for-bit, bounds as epoch
    * seconds, the open (current) interval flagged. */
  val evScd2: Q = Q(
    "mnt_scd2_history",
    Some("""
      SELECT user_id, event_id,
        epoch_us(ts) // 1000000 AS valid_from_s,
        epoch_us(lead(ts, 1) OVER pw) // 1000000 AS valid_to_s,
        (lead(ts, 1) OVER pw IS NULL) AS is_current,
        event_type, value
      FROM events
      WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""),
    (s, dir) =>
      graft.ops.Upsert
        .scd2History(Tables.load(s, dir, "events"), "user_id", "ts",
          "event_id", Seq("event_type", "value"))
        .select(col("user_id"), col("event_id"),
          unix_seconds(col("valid_from")).as("valid_from_s"),
          unix_seconds(col("valid_to")).as("valid_to_s"),
          col("is_current"), col("event_type"), col("value"))
        .orderBy("event_id"))

  /** Chunked range join ([[graft.operators.RangeJoin]]): every event
    * equi-joined (user, time-chunk) to the session interval containing it
    * — the nested-loop-free point-in-interval shape. Sessions partition
    * each user's events, so exactly one match per event (all 10k rows). */
  val evRangeJoin: Q = Q(
    "ev_range_join_sessions",
    Some("""
      WITH b AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch_us(ts) // 1000000)
                    - (epoch_us(lag(ts) OVER w) // 1000000) > 1800
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM b),
      iv AS (
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
          epoch_us(min(ts)) // 1000000 AS lo,
          epoch_us(max(ts)) // 1000000 AS hi
        FROM s GROUP BY 1, 2)
      SELECT e.event_id, iv.session_seq
      FROM events e
      JOIN iv ON e.user_id = iv.user_id
        AND epoch_us(e.ts) // 1000000 BETWEEN iv.lo AND iv.hi
      ORDER BY e.event_id, iv.session_seq"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val pts = ev.select(col("event_id"), col("user_id"),
        unix_seconds(col("ts")).as("t"))
      val iv = StreamingOps.sessionize(ev).select(col("user_id"),
        col("session_seq"),
        unix_seconds(col("session_start")).as("lo"),
        unix_seconds(col("session_end")).as("hi"))
      graft.operators.RangeJoin
        .pointInInterval(pts, iv, "t", "lo", "hi", chunk = 1800L,
          keys = Seq("user_id"))
        .select(col("event_id"), col("session_seq"))
        .orderBy("event_id", "session_seq")
    })

  /** Interval-overlap join ([[graft.operators.RangeJoin.intervalOverlap]]):
    * which wall-clock hours does each session touch — sessions × per-user
    * hour windows, chunk-equi-joined with the max-of-starts dedup trick
    * (each true pair emitted exactly once, no distinct). */
  val evOverlapJoin: Q = Q(
    "ev_interval_overlap",
    Some("""
      WITH b AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch_us(ts) // 1000000)
                    - (epoch_us(lag(ts) OVER w) // 1000000) > 1800
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM b),
      iv AS (
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
          epoch_us(min(ts)) // 1000000 AS lo,
          epoch_us(max(ts)) // 1000000 AS hi
        FROM s GROUP BY 1, 2),
      sp AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS g0, max(ts) AS g1
        FROM events GROUP BY 1),
      h AS (
        SELECT user_id,
          epoch_us(unnest(generate_series(g0, g1, INTERVAL 1 HOUR)))
            // 1000000 AS hlo
        FROM sp)
      SELECT iv.user_id, iv.session_seq, h.hlo AS hour_start_s
      FROM iv
      JOIN h ON iv.user_id = h.user_id
        AND iv.lo <= h.hlo + 3599 AND h.hlo <= iv.hi
      ORDER BY iv.user_id, session_seq, hour_start_s"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val iv = StreamingOps.sessionize(ev).select(col("user_id"),
        col("session_seq"),
        unix_seconds(col("session_start")).as("lo"),
        unix_seconds(col("session_end")).as("hi"))
      val hours = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("g0"),
          max(col("ts")).as("g1"))
        .select(col("user_id"),
          explode(sequence(col("g0"), col("g1"), expr("interval 1 hour")))
            .as("gts"))
        .select(col("user_id"), unix_seconds(col("gts")).as("hlo"),
          (unix_seconds(col("gts")) + 3599L).as("hhi"))
      graft.operators.RangeJoin
        .intervalOverlap(iv, hours, "lo", "hi", "hlo", "hhi",
          chunk = 3600L, keys = Seq("user_id"))
        .select(col("user_id"), col("session_seq"),
          col("hlo").as("hour_start_s"))
        .orderBy("user_id", "session_seq", "hour_start_s")
    })

  /** Two-feed correlation ([[StreamingOps.correlate]], the batch twin of
    * the stream-stream join): every (view, purchase) pair of the same
    * user with the purchase within 1 h after the view. Equi key + range
    * residual — sort-merge, not a nested loop. */
  val evCorrelate: Q = Q(
    "ev_correlate_pairs",
    Some("""
      WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS vts
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id AS purchase_id, ts AS pts
        FROM events WHERE event_type = 'purchase')
      SELECT v.view_id, p.purchase_id
      FROM v
      JOIN p ON v.user_id = p.user_id
        AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR
      ORDER BY view_id, purchase_id"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      StreamingOps.correlate(v, p, "user_id", "vts", "pts", 3600L)
        .select("view_id", "purchase_id")
        .orderBy("view_id", "purchase_id")
    })

  /** Group-mean imputation ([[graft.transform.Impute]]): ~10% of values
    * are deterministically nulled (cents ending in 3 — the same rule in
    * both engines), then refilled with their event-type mean. Observed
    * values must survive bit-for-bit; imputed ones are the rounded
    * exact-sum mean. */
  val evImpute: Q = Q(
    "ev_impute_group_mean",
    Some("""
      WITH d AS (
        SELECT event_id, event_type,
          CASE WHEN CAST(round(value * 100) AS BIGINT) % 10 = 3 THEN NULL
               ELSE value END AS v
        FROM events),
      m AS (
        SELECT event_type, count(v) AS n,
          CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sm
        FROM d GROUP BY 1)
      SELECT d.event_id, COALESCE(d.v, ROUND(sm / n, 6)) AS v_filled
      FROM d JOIN m ON d.event_type = m.event_type
      ORDER BY event_id"""),
    (s, dir) => {
      val holed = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          when(round(col("value") * 100).cast("long") % 10 === 3,
            lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
      graft.transform.Impute.fillWithGroupMean(holed, "event_type", "v")
        .select(col("event_id"), col("v").as("v_filled"))
        .orderBy("event_id")
    })

  /** Top 3-step user-journey paths ([[graft.ops.EventAnalytics
    * .topPaths]]): per-user ordered event-type trigrams, global top 10
    * (count desc, path tie-break). */
  val evPaths: Q = Q(
    "ev_path_trigrams",
    Some("""
      WITH o AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1),
      t AS (
        SELECT unnest(CASE WHEN len(seq) < 3 THEN []
          ELSE list_transform(generate_series(1, len(seq) - 2),
            i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2]) END) AS path
        FROM o)
      SELECT path, count(*) AS n
      FROM t
      GROUP BY 1
      ORDER BY n DESC, path
      LIMIT 10"""),
    (s, dir) =>
      graft.ops.EventAnalytics.topPaths(Tables.load(s, dir, "events")))

  /** DAU + trailing 7-day active users ([[graft.ops.EventAnalytics
    * .activeUsers]]): rolling distinct via contribution explode (factor
    * 7), never a per-day re-count. Days as epoch-day integers. */
  val evActive: Q = Q(
    "ev_dau_wau",
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id,
          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events),
      dau AS (SELECT d AS day, count(*) AS dau FROM ud GROUP BY 1),
      c AS (
        SELECT DISTINCT user_id, unnest(generate_series(d, d + 6)) AS day
        FROM ud),
      wau AS (SELECT day, count(*) AS active_7d FROM c GROUP BY 1)
      SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.active_7d
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY day"""),
    (s, dir) =>
      graft.ops.EventAnalytics.activeUsers(Tables.load(s, dir, "events")))

  /** CUPED A/B analysis over a deterministic hash split of users: the
    * oracle rebuilds unit metrics (pre/post value sums around Jan 16),
    * the md5 arm assignment, the per-arm moment table, and every
    * formula term-for-term ([[graft.stats.Experiment.cuped]]). The
    * synthetic split carries no true effect, so the gate additionally
    * asserts the CUPED SE does not exceed the raw SE (θ-adjustment can
    * only remove covariate-explained variance). */
  val evCuped: Q = Q(
    "ev_cuped_ab",
    Some("""
      WITH u AS (
        SELECT user_id AS unit,
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(round(value, 9) AS DECIMAL(38,12))
              ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS x,
          CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(round(value, 9) AS DECIMAL(38,12))
              ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS y
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1),
      a AS (
        SELECT CASE WHEN CAST(concat('0x', substr(md5(concat_ws('|',
              'graft-ab', CAST(unit AS VARCHAR))), 1, 8)) AS BIGINT)
              / 4294967296.0 < 0.5
            THEN 'treatment' ELSE 'control' END AS arm, x, y
        FROM u),
      m AS (
        SELECT arm, CAST(count(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(round(x, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(round(y, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy,
          CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12))) AS DOUBLE)
            AS syy
        FROM a GROUP BY arm),
      tt AS (SELECT * FROM m WHERE arm = 'treatment'),
      cc AS (SELECT * FROM m WHERE arm = 'control'),
      f AS (
        SELECT tt.n AS nt, cc.n AS nc,
          ((tt.sxy + cc.sxy) - (tt.sx + cc.sx) * (tt.sy + cc.sy)
            / (tt.n + cc.n)) / ((tt.n + cc.n) - 1) AS cov_xy,
          ((tt.sxx + cc.sxx) - (tt.sx + cc.sx) * (tt.sx + cc.sx)
            / (tt.n + cc.n)) / ((tt.n + cc.n) - 1) AS var_x,
          tt.sy / tt.n - cc.sy / cc.n AS diff_raw,
          (tt.syy - tt.sy * tt.sy / tt.n) / (tt.n - 1) AS var_t,
          (cc.syy - cc.sy * cc.sy / cc.n) / (cc.n - 1) AS var_c,
          (tt.sxx - tt.sx * tt.sx / tt.n) / (tt.n - 1) AS varx_t,
          (cc.sxx - cc.sx * cc.sx / cc.n) / (cc.n - 1) AS varx_c,
          (tt.sxy - tt.sx * tt.sy / tt.n) / (tt.n - 1) AS cov_t,
          (cc.sxy - cc.sx * cc.sy / cc.n) / (cc.n - 1) AS cov_c,
          tt.sx / tt.n - cc.sx / cc.n AS diff_x
        FROM tt, cc),
      f2 AS (
        SELECT f.*, CASE WHEN var_x > 0 THEN cov_xy / var_x
          ELSE 0.0 END AS th
        FROM f),
      g AS (
        SELECT nt, nc, th AS theta, diff_raw,
          sqrt(var_t / nt + var_c / nc) AS se_raw,
          diff_raw - th * diff_x AS diff_adj,
          var_t + th * th * varx_t - 2.0 * th * cov_t AS vadj_t,
          var_c + th * th * varx_c - 2.0 * th * cov_c AS vadj_c,
          var_t, var_c
        FROM f2)
      SELECT CAST(nt AS BIGINT) AS n_treatment,
        CAST(nc AS BIGINT) AS n_control,
        round(theta, 8) AS theta,
        round(diff_raw, 8) AS diff_raw,
        round(se_raw, 8) AS se_raw,
        round(diff_adj, 8) AS diff_adj,
        round(sqrt(vadj_t / nt + vadj_c / nc), 8) AS se_adj,
        round(diff_raw / se_raw, 8) AS z_raw,
        round(diff_adj / sqrt(vadj_t / nt + vadj_c / nc), 8) AS z_adj,
        round(1.0 - (vadj_t / nt + vadj_c / nc)
          / (var_t / nt + var_c / nc), 8) AS var_reduction
      FROM g"""),
    (s, dir) => {
      val units = graft.stats.Experiment.unitMetrics(
        Tables.load(s, dir, "events"), "user_id", "ts", "value",
        "2024-01-16 00:00:00", "graft-ab")
      val out = graft.stats.Experiment.cuped(units)
      val r = out.collect().head
      require(r.getAs[Double]("se_adj") <= r.getAs[Double]("se_raw") + 1e-12,
        "CUPED must not inflate the standard error")
      out
    })

  /** Kaplan–Meier time-to-churn ([[graft.stats.Survival]]): per-user
    * activity span in hours, observed ("churned") when the last event
    * precedes the horizon by ≥ 1 day of silence, censored otherwise.
    * The oracle rebuilds the duration table (epoch seconds FLOORED
    * before subtracting — Spark's unix_timestamp truncates microseconds,
    * DuckDB's epoch() keeps them), the at-risk countdown, and the
    * cumulative product as the same decimal fold of rounded ln factors;
    * the d = n_risk zero is handled outside the log on both sides
    * (Spark ln(0) = null vs DuckDB −inf). The gate also asserts the
    * curve is non-increasing from 1.0. */
  /** Shared KM-curve CTEs (ev_kaplan_meier + ev_survival_summary). */
  private val kmCte = """
      u AS (
        SELECT user_id,
          CAST(floor((CAST(floor(epoch(max(ts))) AS BIGINT)
            - CAST(floor(epoch(min(ts))) AS BIGINT)) / 3600) AS BIGINT)
            AS t,
          CASE WHEN CAST(floor(epoch(max(ts))) AS BIGINT)
              <= CAST(floor(epoch(TIMESTAMP '2024-01-31 00:00:00'))
                 AS BIGINT) - 86400
            THEN 1 ELSE 0 END AS e
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1),
      byt AS (
        SELECT CAST(t AS DOUBLE) AS t, CAST(SUM(e) AS BIGINT) AS d,
          CAST(SUM(1 - e) AS BIGINT) AS c
        FROM u GROUP BY 1),
      r AS (
        SELECT t, d, c,
          SUM(d + c) OVER ()
            - COALESCE(SUM(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS n_risk
        FROM byt),
      s AS (
        SELECT t, n_risk, d, c,
          CAST(SUM(CAST(CASE WHEN d < n_risk THEN
              round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9) END
            AS DECIMAL(38,12))) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS lns,
          MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
        FROM r),
      curve AS (
        SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
          c AS n_censored,
          CASE WHEN z = 1 THEN 0.0 ELSE round(exp(lns), 6) END AS survival
        FROM s WHERE d > 0)"""

  val evKaplanMeier: Q = Q(
    "ev_kaplan_meier",
    Some(s"""
      WITH $kmCte
      SELECT t, n_risk, d_events, n_censored, survival
      FROM curve ORDER BY t"""),
    (s, dir) => {
      import graft.stats.Survival
      val durations = Survival.durationsFromLog(
        Tables.load(s, dir, "events"), "user_id", "ts",
        "2024-01-31 00:00:00", gapSeconds = 86400L)
      val out = Survival.kaplanMeier(durations, col("duration"),
        col("observed")).orderBy("t")
      val curve = out.select("survival").collect().map(_.getDouble(0))
      require(curve.nonEmpty && curve.head <= 1.0 + 1e-9,
        "survival starts at or below 1")
      require(curve.zip(curve.tail).forall(p => p._1 >= p._2 - 1e-9),
        "Kaplan-Meier curve must be non-increasing")
      out
    })

  /** Greenwood band + Nelson–Aalen hazard over the churn curve
    * ([[graft.stats.Survival.survivalBand]]): the oracle splices the
    * shared KM CTEs and replays both round-9 cumulative folds, the
    * inline-z linear band with its [0,1] clamps, and the null se at an
    * absorbing d = n time. In-gate: the band brackets the curve and the
    * hazard is non-decreasing. */
  val evKmGreenwood: Q = Q(
    "ev_km_greenwood",
    Some(s"""
      WITH $kmCte,
      gw AS (
        SELECT t, n_risk, d_events, survival,
          CAST(SUM(CAST(round(CAST(d_events AS DOUBLE) / n_risk, 9)
            AS DECIMAL(38,12))) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS h,
          CAST(SUM(CAST(CASE WHEN d_events < n_risk THEN
              round(CAST(d_events AS DOUBLE)
                / (CAST(n_risk AS DOUBLE)
                   * (CAST(n_risk AS DOUBLE) - CAST(d_events AS DOUBLE))),
                9) END
            AS DECIMAL(38,12))) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS g
        FROM curve)
      SELECT t, n_risk, d_events, survival,
        round(h, 6) + 0.0 AS cumhaz,
        CASE WHEN d_events < n_risk
          THEN round(survival * sqrt(g), 6) + 0.0 END AS se,
        CASE WHEN d_events < n_risk
          THEN round(greatest(0.0, survival
            - 1.959963984540054 * (survival * sqrt(g))), 6) + 0.0 END
          AS ci_lo,
        CASE WHEN d_events < n_risk
          THEN round(least(1.0, survival
            + 1.959963984540054 * (survival * sqrt(g))), 6) + 0.0 END
          AS ci_hi
      FROM gw ORDER BY t"""),
    (s, dir) => {
      import graft.stats.Survival
      val durations = Survival.durationsFromLog(
        Tables.load(s, dir, "events"), "user_id", "ts",
        "2024-01-31 00:00:00", gapSeconds = 86400L)
      val out = Survival.survivalBand(
        Survival.kaplanMeier(durations, col("duration"), col("observed")))
      if (Tables.gateMode) {
        val rows = out.collect()
        require(rows.nonEmpty, "empty band")
        rows.filter(!_.isNullAt(5)).foreach { r =>
          require(r.getAs[Double]("ci_lo") <= r.getAs[Double]("survival") &&
            r.getAs[Double]("survival") <= r.getAs[Double]("ci_hi") &&
            r.getAs[Double]("se") > 0.0,
            s"band must bracket the curve: $r")
        }
        val hz = rows.map(_.getAs[Double]("cumhaz"))
        require(hz.zip(hz.tail).forall(p => p._1 <= p._2 + 1e-9),
          "cumulative hazard must be non-decreasing")
      }
      out
    })

  /** Two-sample log-rank test over the hash-split arms' churn durations
    * ([[graft.stats.Survival.logRank]]): the null holds by construction
    * (both arms draw from one population), so the gate asserts the χ²
    * stays under the 0.1% critical value while the oracle rebuilds the
    * risk sets, expectations, hypergeometric variances, and the
    * statistic term-for-term. */
  val evLogRank: Q = Q(
    "ev_log_rank",
    Some("""
      WITH u AS (
        SELECT user_id,
          CASE WHEN CAST(concat('0x', substr(md5(concat_ws('|',
              'graft-ab', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
              / 4294967296.0 < 0.5
            THEN 'treatment' ELSE 'control' END AS arm,
          CAST(floor((CAST(floor(epoch(max(ts))) AS BIGINT)
            - CAST(floor(epoch(min(ts))) AS BIGINT)) / 3600) AS BIGINT)
            AS t,
          CASE WHEN CAST(floor(epoch(max(ts))) AS BIGINT)
              <= CAST(floor(epoch(TIMESTAMP '2024-01-31 00:00:00'))
                 AS BIGINT) - 86400
            THEN 1 ELSE 0 END AS e
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1),
      byt AS (
        SELECT CAST(t AS DOUBLE) AS t, CAST(SUM(e) AS BIGINT) AS d,
          CAST(count(*) AS BIGINT) AS k,
          CAST(SUM(CASE WHEN arm = 'control' THEN e ELSE 0 END)
            AS BIGINT) AS da,
          CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
            AS BIGINT) AS ka
        FROM u GROUP BY 1),
      r AS (
        SELECT t, d, da,
          SUM(k) OVER () - COALESCE(SUM(k) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0,
          SUM(ka) OVER () - COALESCE(SUM(ka) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS na0
        FROM byt),
      f AS (
        SELECT d, da, CAST(n0 AS DOUBLE) AS n, CAST(na0 AS DOUBLE) AS na
        FROM r WHERE d > 0),
      terms AS (
        SELECT da, d * na / n AS ea,
          CASE WHEN n > 1 THEN
            d * (na / n) * ((n - na) / n) * (n - d) / (n - 1)
          ELSE 0.0 END AS v
        FROM f),
      tot AS (
        SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN arm <> 'control' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_b
        FROM u)
      SELECT 'control' AS group_a, 'treatment' AS group_b,
        tot.n_a, tot.n_b,
        CAST(SUM(da) AS BIGINT) AS observed_a,
        round(CAST(SUM(CAST(round(ea, 9) AS DECIMAL(38,12))) AS DOUBLE),
          6) AS expected_a,
        CASE WHEN CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,12)))
            AS DOUBLE) > 0 THEN
          round(pow(CAST(SUM(CAST(round(da - ea, 9) AS DECIMAL(38,12)))
              AS DOUBLE), 2)
            / CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,12))) AS DOUBLE), 6)
        END AS chi2
      FROM terms CROSS JOIN tot
      GROUP BY tot.n_a, tot.n_b"""),
    (s, dir) => {
      import graft.stats.{Experiment, Survival}
      val durations = Survival.durationsFromLog(
          Tables.load(s, dir, "events"), "user_id", "ts",
          "2024-01-31 00:00:00", gapSeconds = 86400L)
        .withColumn("arm", Experiment.arm(col("subject"), "graft-ab"))
      val out = Survival.logRank(durations, col("arm"), col("duration"),
        col("observed"))
      val chi2 = out.collect().head.getAs[Double]("chi2")
      require(chi2 < 10.828,
        s"null-by-construction arms produced chi2=$chi2 over the 0.1% " +
          "critical value — the split or the statistic is broken")
      out
    })

  /** Median survival + RMST(680h) over the same KM curve
    * ([[graft.stats.Survival.survivalSummary]]): the oracle extends the
    * curve CTEs with the identical lag-window step integral. */
  val evSurvivalSummary: Q = Q(
    "ev_survival_summary",
    Some(s"""
      WITH $kmCte,
      cut AS (
        SELECT t, survival,
          lag(survival, 1, 1.0) OVER (ORDER BY t) AS ps,
          lag(t, 1, 0.0) OVER (ORDER BY t) AS pt,
          row_number() OVER (ORDER BY t) AS rn,
          count(*) OVER () AS m
        FROM curve WHERE t <= 680),
      terms AS (
        SELECT round(ps * (t - pt), 9) AS a,
          CASE WHEN rn = m THEN round(survival * (680.0 - t), 9)
            ELSE 0.0 END AS tl
        FROM cut),
      med AS (
        SELECT min(CASE WHEN survival <= 0.5 THEN t END)
          AS median_survival
        FROM curve)
      SELECT (SELECT median_survival FROM med) AS median_survival,
        COALESCE(round(CAST((SELECT SUM(CAST(a + tl AS DECIMAL(38,12)))
          FROM terms) AS DOUBLE), 6), 680.0) AS rmst,
        CAST(680.0 AS DOUBLE) AS tau"""),
    (s, dir) => {
      import graft.stats.Survival
      val durations = Survival.durationsFromLog(
        Tables.load(s, dir, "events"), "user_id", "ts",
        "2024-01-31 00:00:00", gapSeconds = 86400L)
      val curve = Survival.kaplanMeier(durations, col("duration"),
        col("observed"))
      val out = Survival.survivalSummary(curve, tau = 680.0)
      val r = out.collect().head
      require(r.getAs[Double]("rmst") <= 680.0 + 1e-9,
        "RMST cannot exceed its own horizon")
      out
    })

  /** CUSUM changepoints ([[graft.ops.EventAnalytics.cusum]]): daily event
    * counts per type with a +40 level shift planted in 'error' from day
    * 22 — the slow-drift monitor next to the per-point z-score flags
    * (ev_anomaly_flags). Baseline = days 1–14; the closed window form
    * P − min(0, running-min P) replaces the sequential recurrence, so
    * both engines rebuild S⁺/S⁻ from decimal window folds. */
  val evCusum: Q = Q(
    "ev_cusum_changepoints",
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(day(ts) AS INT) AS d, count(*) AS c
        FROM events GROUP BY 1, 2),
      x AS (
        SELECT event_type, d,
          CAST(c + CASE WHEN event_type = 'error' AND d >= 22 THEN 40
            ELSE 0 END AS DOUBLE) AS x
        FROM daily),
      st AS (
        SELECT event_type, count(*) AS n,
          SUM(CAST(round(x, 6) AS DECIMAL(38,12))) AS s1,
          SUM(CAST(round(round(x, 6) * round(x, 6), 6)
            AS DECIMAL(38,12))) AS s2
        FROM x WHERE d <= 14 GROUP BY 1),
      ms AS (
        SELECT event_type,
          round(CAST(s1 AS DOUBLE) / n, 12) AS mu,
          round(sqrt(greatest(0.0,
            (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / n) / (n - 1))), 12) AS sigma
        FROM st),
      j AS (SELECT x.event_type, d, x, mu, sigma
            FROM x JOIN ms USING (event_type)),
      p AS (
        SELECT event_type, d, x, mu, sigma,
          SUM(CAST(round(x - mu - sigma * 0.5, 12) AS DECIMAL(38,12)))
            OVER (PARTITION BY event_type ORDER BY d) AS ppos,
          SUM(CAST(round(mu - sigma * 0.5 - x, 12) AS DECIMAL(38,12)))
            OVER (PARTITION BY event_type ORDER BY d) AS pneg
        FROM j),
      sfin AS (
        SELECT event_type, d, x, sigma,
          round(CAST(ppos - least(CAST(0 AS DECIMAL(38,12)),
            MIN(ppos) OVER (PARTITION BY event_type ORDER BY d))
            AS DOUBLE), 6) AS spos,
          round(CAST(pneg - least(CAST(0 AS DECIMAL(38,12)),
            MIN(pneg) OVER (PARTITION BY event_type ORDER BY d))
            AS DOUBLE), 6) AS sneg
        FROM p)
      SELECT event_type, d, x AS value,
        CASE WHEN sigma > 0 THEN spos END AS s_pos,
        CASE WHEN sigma > 0 THEN sneg END AS s_neg,
        CASE WHEN sigma > 0
          THEN greatest(spos, sneg) > round(sigma * 5.0, 6) END AS flag
      FROM sfin ORDER BY event_type, d"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .select(col("event_type"), dayofmonth(col("ts")).as("d"))
        .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
        .select(col("event_type"), col("d"),
          (col("c") + when(col("event_type") === "error" &&
            col("d") >= 22, 40).otherwise(0)).cast("double").as("x"))
      val out = graft.ops.EventAnalytics.cusum(daily, Seq("event_type"),
        "d", col("x"), col("d") <= 14)
      // the planted shift must be caught, and not before it happened
      val errFlags = out.filter(col("event_type") === "error" && col("flag"))
        .agg(coalesce(min(col("d")), lit(99)).cast("int"),
          count(lit(1))).head()
      require(errFlags.getLong(1) > 0, "planted +40 shift never flagged")
      require(errFlags.getInt(0) >= 22,
        s"flag fired before the shift: day ${errFlags.getInt(0)}")
      out.orderBy("event_type", "d")
    })

  /** Inter-arrival exponentiality ([[graft.stats.Drift
    * .ksExponential]]): KS distance of per-user event gaps against the
    * fitted memoryless law — the "are arrivals homogeneous Poisson"
    * check behind constant-rate capacity models. The oracle replays the
    * round-9 mean fold, the round-12 λ̂, and the two-sided sup walk over
    * the distinct-gap table. In-gate: the synthetic generator's pooled
    * gaps are genuinely near-memoryless (measured D ≈ 0.007), so the
    * gate pins D SMALL on them — and pins the discriminative power on
    * a planted constant-gap series, whose D vs any fitted exponential
    * is 1 − e⁻¹ ≈ 0.632 by construction. */
  val evExponentiality: Q = Q(
    "ev_exponentiality",
    Some("""
      WITH g0 AS (
        SELECT (epoch_us(ts) // 1000000)
          - lag(epoch_us(ts) // 1000000)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      b AS (SELECT CAST(g AS DOUBLE) AS v FROM g0 WHERE g IS NOT NULL),
      c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v),
      t AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
          round(CAST(SUM(c) AS BIGINT)
            / CAST(SUM(CAST(round(v * c, 9) AS DECIMAL(38,12)))
              AS DOUBLE), 12) AS lam
        FROM c),
      w AS (
        SELECT v, c,
          COALESCE(SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
          SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
        FROM c),
      d AS (
        SELECT MAX(greatest(
          abs(cb / CAST(n AS DOUBLE) - (1.0 - exp(-lam * v))),
          abs(ct / CAST(n AS DOUBLE) - (1.0 - exp(-lam * v))))) AS dst
        FROM w, t)
      SELECT n, lam AS lambda_hat, round(dst, 6) + 0.0 AS d_stat
      FROM t, d"""),
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = Tables.load(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select((unix_seconds(col("ts"))
          - lag(unix_seconds(col("ts")), 1).over(w)).as("g"))
        .filter(col("g").isNotNull)
      val out = graft.stats.Drift.ksExponential(gaps, col("g"))
      if (Tables.gateMode) {
        val r = out.head()
        require(r.getAs[Double]("d_stat") < 0.05,
          s"the generator's pooled gaps are memoryless-ish; D blew up: $r")
        // discriminative power: constant gaps vs a fitted exponential
        // have D = max over the single jump = 1 - e^(-1) = 0.632121
        import s.implicits._
        val const = graft.stats.Drift.ksExponential(
          Seq.fill(50)(7.0).toDF("g"), col("g")).head()
        require(const.getAs[Double]("d_stat") == 0.632121,
          s"constant-gap D must be 1 - 1/e: $const")
      }
      out
    })

  /** Page–Hinkley drift detector
    * ([[graft.ops.EventAnalytics.pageHinkley]]) on the ev_cusum fixture
    * (+40 planted in 'error' from day 22): the BASELINE-FREE monitor —
    * the running mean is the reference, so there is no window to
    * choose. δ = 4 (≈ σ/2 of the fixture's daily counts), λ = 60. The
    * oracle replays the running-mean fold, the round-12 increment fold,
    * and the prefix-min PH. In-gate: the planted shift alarms on/after
    * day 22 and NO stable series ever alarms. */
  val evPageHinkley: Q = Q(
    "ev_page_hinkley",
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(day(ts) AS INT) AS d, count(*) AS c
        FROM events GROUP BY 1, 2),
      x AS (
        SELECT event_type, d,
          round(CAST(c + CASE WHEN event_type = 'error' AND d >= 22
            THEN 40 ELSE 0 END AS DOUBLE), 6) AS x
        FROM daily),
      r AS (
        SELECT event_type, d, x,
          round(CAST(SUM(CAST(x AS DECIMAL(38,12))) OVER pw AS DOUBLE)
            / COUNT(*) OVER pw, 12) AS xbar
        FROM x
        WINDOW pw AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      m AS (
        SELECT event_type, d, x, xbar,
          SUM(CAST(round(x - xbar - 4.0, 12) AS DECIMAL(38,12)))
            OVER pw AS mm
        FROM r
        WINDOW pw AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      f AS (
        SELECT event_type, d, x, xbar,
          round(CAST(mm - MIN(mm) OVER pw AS DOUBLE), 6) AS ph
        FROM m
        WINDOW pw AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, d, x AS value, xbar AS running_mean, ph,
        ph > 60.0 AS alarm
      FROM f ORDER BY event_type, d"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .select(col("event_type"), dayofmonth(col("ts")).as("d"))
        .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
        .select(col("event_type"), col("d"),
          (col("c") + when(col("event_type") === "error" &&
            col("d") >= 22, 40).otherwise(0)).cast("double").as("x"))
      val out = graft.ops.EventAnalytics.pageHinkley(daily,
        Seq("event_type"), "d", col("x"), delta = 4.0, lambda = 60.0)
      if (Tables.gateMode) {
        val err = out.filter(col("event_type") === "error" && col("alarm"))
          .agg(coalesce(min(col("d")), lit(99)).cast("int"),
            count(lit(1))).head()
        require(err.getLong(1) > 0, "planted +40 shift never alarmed")
        require(err.getInt(0) >= 22,
          s"alarm fired before the shift: day ${err.getInt(0)}")
        val falseAlarms = out.filter(col("event_type") =!= "error" &&
          col("alarm")).count()
        require(falseAlarms == 0L,
          s"$falseAlarms false alarms on stable series")
      }
      out.orderBy("event_type", "d")
    })

  /** Classical additive seasonal decomposition of hourly counts per
    * event type ([[graft.ops.EventAnalytics.seasonalDecompose]]) — the
    * oracle replays the centered moving average, the integer hour-slot,
    * the decimal-folded slot means, and the residual identity. */
  val evSeasonal: Q = Q(
    "ev_seasonal_decompose",
    Some("""
      WITH b AS (
        SELECT event_type AS key,
          (epoch_us(ts) // 1000000)
            - ((epoch_us(ts) // 1000000) % 3600) AS bucket_s,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      tr AS (
        SELECT key, bucket_s, n,
          round(avg(n) OVER (PARTITION BY key ORDER BY bucket_s
            RANGE BETWEEN 43200 PRECEDING AND 43200 FOLLOWING), 6) AS trend
        FROM b),
      dt AS (SELECT *, (bucket_s % 86400) // 3600 AS slot,
               round(n - trend, 6) AS detr FROM tr),
      se AS (
        SELECT *, round(CAST(SUM(CAST(detr AS DECIMAL(38,12)))
            OVER (PARTITION BY key, slot) AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY key, slot), 6) AS seasonal
        FROM dt)
      SELECT key AS event_type, bucket_s, n, trend, seasonal,
        round(n - trend - seasonal, 6) AS residual
      FROM se ORDER BY event_type, bucket_s"""),
    (s, dir) =>
      graft.ops.EventAnalytics.seasonalDecompose(
          Tables.load(s, dir, "events"), "event_type", "ts",
          periodHours = 24)
        .select(col("key").as("event_type"), col("bucket_s"), col("n"),
          col("trend"), col("seasonal"), col("residual"))
        .orderBy("event_type", "bucket_s"))

  /** Seasonal/trend strength of the hourly decomposition
    * ([[graft.ops.EventAnalytics.seasonalStrength]]): Hyndman's F_s/F_t
    * per event type — the oracle splices the full decompose CTEs and
    * replays the per-key round-12 moment folds, the population
    * variances, and the clamped ratios. In-gate: strengths live in
    * [0, 1] and the synthetic log's planted hour-of-day load shape
    * registers as nonzero seasonal strength on every key. */
  val evSeasonalStrength: Q = Q(
    "ev_seasonal_strength",
    Some("""
      WITH b AS (
        SELECT event_type AS key,
          (epoch_us(ts) // 1000000)
            - ((epoch_us(ts) // 1000000) % 3600) AS bucket_s,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      tr AS (
        SELECT key, bucket_s, n,
          round(avg(n) OVER (PARTITION BY key ORDER BY bucket_s
            RANGE BETWEEN 43200 PRECEDING AND 43200 FOLLOWING), 6) AS trend
        FROM b),
      dt AS (SELECT *, (bucket_s % 86400) // 3600 AS slot,
               round(n - trend, 6) AS detr FROM tr),
      se AS (
        SELECT *, round(CAST(SUM(CAST(detr AS DECIMAL(38,12)))
            OVER (PARTITION BY key, slot) AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY key, slot), 6) AS seasonal
        FROM dt),
      dc AS (
        SELECT key, n, trend, seasonal,
          round(n - trend - seasonal, 6) AS residual
        FROM se),
      agg AS (
        SELECT key, CAST(count(*) AS BIGINT) AS m,
          CAST(SUM(CAST(round(residual, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS sr,
          CAST(SUM(CAST(round(residual * residual, 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS srr,
          CAST(SUM(CAST(round(n - trend, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS sd,
          CAST(SUM(CAST(round((n - trend) * (n - trend), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS sdd,
          CAST(SUM(CAST(round(n - seasonal, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS st,
          CAST(SUM(CAST(round((n - seasonal) * (n - seasonal), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS stt
        FROM dc GROUP BY key),
      v AS (
        SELECT key, m,
          srr / m - (sr / m) * (sr / m) AS vr,
          sdd / m - (sd / m) * (sd / m) AS vsr,
          stt / m - (st / m) * (st / m) AS vtr
        FROM agg)
      SELECT key AS event_type, m AS n_buckets,
        round(vr, 6) + 0.0 AS var_remainder,
        CASE WHEN vsr > 0
          THEN round(greatest(0.0, 1.0 - vr / vsr), 6) + 0.0 END
          AS seasonal_strength,
        CASE WHEN vtr > 0
          THEN round(greatest(0.0, 1.0 - vr / vtr), 6) + 0.0 END
          AS trend_strength
      FROM v ORDER BY event_type"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.seasonalStrength(
          Tables.load(s, dir, "events"), "event_type", "ts",
          periodHours = 24)
        .select(col("key").as("event_type"), col("n_buckets"),
          col("var_remainder"), col("seasonal_strength"),
          col("trend_strength"))
        .orderBy("event_type")
      if (Tables.gateMode) {
        val rows = out.collect()
        require(rows.nonEmpty)
        rows.foreach { r =>
          val fs = r.getAs[Double]("seasonal_strength")
          require(fs >= 0.0 && fs <= 1.0 && fs > 0.0,
            s"planted hour-of-day shape must register: $r")
        }
      }
      out
    })

  /** Last-touch revenue attribution
    * ([[graft.ops.EventAnalytics.attributeRevenue]], model = "last"):
    * each purchase credits the user's latest view/click strictly before
    * it within 48 h, else 'direct'. One per-user ordered window — the
    * oracle replays it with the same IGNORE NULLS last_value frame. */
  val evAttributionLast: Q = Q(
    "ev_attribution_last",
    Some("""
      WITH b AS (
        SELECT user_id AS u, epoch_us(ts) // 1000000 AS t,
          event_id AS o, event_type AS ty,
          CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      tch AS (
        SELECT *, last_value(CASE WHEN ty IN ('view', 'click')
            THEN {'t': t, 'o': o, 'ty': ty} END IGNORE NULLS)
          OVER (PARTITION BY u ORDER BY t, o
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM b)
      SELECT CASE WHEN touch IS NOT NULL AND touch.t >= t - 172800
          THEN touch.ty ELSE 'direct' END AS channel,
        count(*) AS n_conversions,
        CAST(COALESCE(sum(c), 0) AS BIGINT) AS revenue_cents
      FROM tch WHERE ty = 'purchase'
      GROUP BY 1 ORDER BY channel"""),
    (s, dir) =>
      graft.ops.EventAnalytics.attributeRevenue(
          Tables.load(s, dir, "events"), Seq("view", "click"), "purchase",
          windowSeconds = 172800L, model = "last")
        .orderBy("channel"))

  /** First-touch attribution (model = "first"): the EARLIEST in-window
    * touch credits — the struct-min over a trailing RANGE frame; the
    * oracle mirrors with min() over the same epoch-second range. */
  val evAttributionFirst: Q = Q(
    "ev_attribution_first",
    Some("""
      WITH b AS (
        SELECT user_id AS u, epoch_us(ts) // 1000000 AS t,
          event_id AS o, event_type AS ty,
          CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      tch AS (
        SELECT *, min(CASE WHEN ty IN ('view', 'click')
            THEN {'t': t, 'o': o, 'ty': ty} END)
          OVER (PARTITION BY u ORDER BY t
                RANGE BETWEEN 172800 PRECEDING AND CURRENT ROW) AS touch
        FROM b)
      SELECT CASE WHEN touch IS NOT NULL AND touch.t >= t - 172800
          THEN touch.ty ELSE 'direct' END AS channel,
        count(*) AS n_conversions,
        CAST(COALESCE(sum(c), 0) AS BIGINT) AS revenue_cents
      FROM tch WHERE ty = 'purchase'
      GROUP BY 1 ORDER BY channel"""),
    (s, dir) =>
      graft.ops.EventAnalytics.attributeRevenue(
          Tables.load(s, dir, "events"), Seq("view", "click"), "purchase",
          windowSeconds = 172800L, model = "first")
        .orderBy("channel"))

  /** Shared transition-table prelude: per-user event sequences ordered
    * by (ts, event_id), adjacent-pair counts, per-source totals. */
  private val markovPrelude: String = """
      WITH seq AS (
        SELECT user_id, event_type AS src,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS dst
        FROM events),
      tr AS (SELECT src, dst, count(*) AS n FROM seq
             WHERE dst IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1)"""

  /** First-order Markov transition MLE over per-user event sequences
    * ([[graft.ops.Markov.transitionMatrix]]) — one bounded per-entity
    * lead() window, then state-vocabulary-sized tables only. */
  val evMarkovTransitions: Q = Q(
    "ev_markov_transitions",
    Some(markovPrelude + """
      SELECT tr.src, tr.dst, tr.n,
        round(CAST(tr.n AS DOUBLE) / tot.tot, 8) AS p
      FROM tr JOIN tot USING (src)
      ORDER BY src, dst"""),
    (s, dir) =>
      graft.ops.Markov.transitionMatrix(Tables.load(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy("src", "dst"))

  /** Unrolled power-iteration recurrence for the stationary distribution
    * — the same oracle discipline as the PageRank gates: each iteration
    * is a CTE computing the absorbing-state leak, the contribution sum,
    * and the uniform redistribution, term-for-term. */
  /** WITH-body of the stationary recurrence ending at `p<iters>` —
    * shared by the stationary gate and the entropy-rate gate. */
  private def markovStationaryCtes(iters: Int): String = {
    val head = markovPrelude + """,
      e AS (SELECT tr.src, tr.dst, CAST(tr.n AS DOUBLE) / tot.tot AS p
            FROM tr JOIN tot USING (src)),
      st AS (SELECT DISTINCT state FROM (
               SELECT src AS state FROM tr
               UNION SELECT dst AS state FROM tr)),
      kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM st),
      p0 AS (SELECT state, 1.0 / k AS pi FROM st, kk)"""
    val its = (1 to iters).map { i =>
      s""",
      d$i AS (SELECT COALESCE(sum(pi), 0.0) AS dang FROM p${i - 1}
              WHERE state NOT IN (SELECT src FROM tot)),
      c$i AS (SELECT e.dst AS state, sum(q.pi * e.p) AS c
              FROM p${i - 1} q JOIN e ON q.state = e.src GROUP BY 1),
      p$i AS (SELECT st.state, COALESCE(c$i.c, 0.0) + d$i.dang / kk.k AS pi
              FROM st LEFT JOIN c$i USING (state), d$i, kk)"""
    }.mkString
    head + its
  }

  private def markovStationarySql(iters: Int): String =
    markovStationaryCtes(iters) + s"""
      SELECT state, round(pi, 8) AS pi FROM p$iters ORDER BY state"""

  /** Stationary distribution of the user-journey Markov chain
    * ([[graft.ops.Markov.stationary]], 6 power iterations from uniform,
    * absorbing mass redistributed uniformly). Mass conservation asserted
    * in-gate. */
  val evMarkovStationary: Q = Q(
    "ev_markov_stationary",
    Some(markovStationarySql(6)),
    (s, dir) => {
      val tr = graft.ops.Markov.transitionMatrix(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type")
      val pi = graft.ops.Markov.stationary(tr, iters = 6)
      val mass = pi.agg(sum(col("pi"))).head().getDouble(0)
      require(math.abs(mass - 1.0) < 1e-6,
        s"stationary mass not conserved: $mass")
      pi.orderBy("state")
    })

  /** Truncated adjusted EWMA of the daily event-count series
    * ([[graft.ops.EventAnalytics.ewmaDailyCounts]], α = 0.3, H = 16):
    * the weights are computed ONCE in Scala by repeated multiplication
    * and the SAME doubles are inlined into the Spark plan and this SQL
    * (IEEE pow is not correctly rounded across runtimes — literal
    * weights sidestep the only non-portable term). */
  val evEwma: Q = {
    val alpha = 0.3
    val horizon = 16
    val w = graft.ops.EventAnalytics.ewmaWeights(alpha, horizon)
    val wValues = w.zipWithIndex
      .map { case (x, j) => s"($j, CAST($x AS DOUBLE))" }.mkString(", ")
    Q(
      "ev_ewma_daily",
      Some(s"""
        WITH daily AS (
          SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1),
        w(j, w) AS (SELECT * FROM (VALUES $wValues)),
        contrib AS (
          SELECT daily.day + w.j AS day,
            CAST(round(w.w * daily.n_events, 12) AS DECIMAL(38,14)) AS term,
            CAST(round(w.w, 12) AS DECIMAL(38,14)) AS wterm
          FROM daily, w),
        f AS (SELECT day, SUM(term) AS num, SUM(wterm) AS den
              FROM contrib GROUP BY day)
        SELECT daily.day, daily.n_events,
          round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) AS ewma
        FROM daily JOIN f USING (day)
        ORDER BY day"""),
      (s, dir) =>
        graft.ops.EventAnalytics.ewmaDailyCounts(
            Tables.load(s, dir, "events"), alpha = alpha, horizon = horizon)
          .orderBy("day"))
  }

  /** Interrupted time-series regression
    * ([[graft.stats.Regression.segmented]], break at day 15) over the
    * daily count series with a PLANTED post-break trend (+5/day): both
    * engines fold exact decimal moments per segment and derive
    * slope/intercept/RSS/Chow-F through the same short double formulas.
    * The Chow p-value is library-only (no SQL F CDF) — asserted
    * significant in-gate, excluded from the hashed projection. */
  val evSegmented: Q = Q(
    "ev_segmented_trend",
    Some("""
      WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS d, count(*) AS c
        FROM events GROUP BY 1),
      pts AS (
        SELECT CAST(d - (SELECT min(d) FROM daily) AS DOUBLE) AS x,
          CAST(c + CASE WHEN d - (SELECT min(d) FROM daily) >= 15
            THEN 5 * (d - (SELECT min(d) FROM daily) - 15)
            ELSE 0 END AS DOUBLE) AS y
        FROM daily),
      m AS (
        SELECT
          CAST(SUM(CASE WHEN x < 15 THEN 1 ELSE 0 END) AS BIGINT) AS na,
          SUM(CASE WHEN x < 15 THEN CAST(round(x, 12) AS DECIMAL(38,12)) END) AS sxa,
          SUM(CASE WHEN x < 15 THEN CAST(round(y, 12) AS DECIMAL(38,12)) END) AS sya,
          SUM(CASE WHEN x < 15 THEN CAST(round(x * y, 12) AS DECIMAL(38,12)) END) AS sxya,
          SUM(CASE WHEN x < 15 THEN CAST(round(x * x, 12) AS DECIMAL(38,12)) END) AS sxxa,
          SUM(CASE WHEN x < 15 THEN CAST(round(y * y, 12) AS DECIMAL(38,12)) END) AS syya,
          CAST(SUM(CASE WHEN x >= 15 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
          SUM(CASE WHEN x >= 15 THEN CAST(round(x, 12) AS DECIMAL(38,12)) END) AS sxb,
          SUM(CASE WHEN x >= 15 THEN CAST(round(y, 12) AS DECIMAL(38,12)) END) AS syb,
          SUM(CASE WHEN x >= 15 THEN CAST(round(x * y, 12) AS DECIMAL(38,12)) END) AS sxyb,
          SUM(CASE WHEN x >= 15 THEN CAST(round(x * x, 12) AS DECIMAL(38,12)) END) AS sxxb,
          SUM(CASE WHEN x >= 15 THEN CAST(round(y * y, 12) AS DECIMAL(38,12)) END) AS syyb,
          CAST(count(*) AS BIGINT) AS np,
          SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS sxp,
          SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS syp,
          SUM(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS sxyp,
          SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS sxxp,
          SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS syyp
        FROM pts),
      f AS (
        SELECT *,
          (na * CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sya AS DOUBLE))
            / (na * CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE)) AS sla,
          (nb * CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(syb AS DOUBLE))
            / (nb * CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE)) AS slb,
          (np * CAST(sxyp AS DOUBLE) - CAST(sxp AS DOUBLE) * CAST(syp AS DOUBLE))
            / (np * CAST(sxxp AS DOUBLE) - CAST(sxp AS DOUBLE) * CAST(sxp AS DOUBLE)) AS slp
        FROM m),
      g AS (
        SELECT *,
          (CAST(sya AS DOUBLE) - sla * CAST(sxa AS DOUBLE)) / na AS ia,
          (CAST(syb AS DOUBLE) - slb * CAST(sxb AS DOUBLE)) / nb AS ib,
          (CAST(syp AS DOUBLE) - slp * CAST(sxp AS DOUBLE)) / np AS ip
        FROM f),
      h AS (
        SELECT *,
          CAST(syya AS DOUBLE) - ia * CAST(sya AS DOUBLE) - sla * CAST(sxya AS DOUBLE) AS rssa,
          CAST(syyb AS DOUBLE) - ib * CAST(syb AS DOUBLE) - slb * CAST(sxyb AS DOUBLE) AS rssb,
          CAST(syyp AS DOUBLE) - ip * CAST(syp AS DOUBLE) - slp * CAST(sxyp AS DOUBLE) AS rssp
        FROM g)
      SELECT * FROM (
        SELECT 'pooled' AS segment, np AS n, round(slp, 6) AS slope,
          round(ip, 6) AS intercept, round(rssp, 6) AS rss,
          round(((rssp - rssa - rssb) / 2.0)
            / ((rssa + rssb) / CAST(np - 4 AS DOUBLE)), 4) AS chow_f
        FROM h
        UNION ALL
        SELECT 'post', nb, round(slb, 6), round(ib, 6), round(rssb, 6),
          CAST(NULL AS DOUBLE) FROM h
        UNION ALL
        SELECT 'pre', na, round(sla, 6), round(ia, 6), round(rssa, 6),
          CAST(NULL AS DOUBLE) FROM h)
      ORDER BY segment"""),
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      val daily = events
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long").as("d"))
        .agg(count(lit(1)).as("c"))
      val minD = daily.agg(min("d")).head().getLong(0)
      val pts = daily.select(
        (col("d") - minD).cast("double").as("x"),
        (col("c") + when(col("d") - minD >= 15,
          (col("d") - minD - 15) * 5).otherwise(0)).cast("double").as("y"))
      val out = graft.stats.Regression.segmented(pts, "x", "y", breakX = 15)
      val pooled = out.filter(col("segment") === "pooled").head()
      // explicit null check first: getAs[Double] silently unboxes a null
      // chow_p to 0.0, which would fake a significant break
      require(!pooled.isNullAt(pooled.fieldIndex("chow_p")),
        "degenerate Chow statistic on the planted-break fixture")
      require(pooled.getAs[Double]("chow_p") < 0.01,
        s"planted trend break not significant: p=${pooled.getAs[Double]("chow_p")}")
      out.select("segment", "n", "slope", "intercept", "rss", "chow_f")
        .orderBy("segment")
    })

  /** Two-proportion z-test ([[graft.stats.Experiment.proportionTest]]):
    * users hash-split into arms, conversion = ≥ 14 purchase events —
    * everything downstream of four integer counts through fixed double
    * formulas, so the oracle rebuilds z and the Wald CI exactly; the
    * normal p-value is library-only (asserted sane in-gate, excluded
    * from the hashed projection). */
  val evProportionTest: Q = Q(
    "ev_proportion_ztest",
    Some("""
      WITH u AS (
        SELECT user_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
            CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.5 AS arm,
          SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
            AS conv
        FROM events GROUP BY user_id),
      c AS (
        SELECT
          CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(SUM(CASE WHEN arm AND conv THEN 1 ELSE 0 END) AS BIGINT) AS ct,
          CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc,
          CAST(SUM(CASE WHEN NOT arm AND conv THEN 1 ELSE 0 END) AS BIGINT) AS cc
        FROM u),
      f AS (
        SELECT *,
          ct / CAST(nt AS DOUBLE) AS pt, cc / CAST(nc AS DOUBLE) AS pc,
          ct / CAST(nt AS DOUBLE) - cc / CAST(nc AS DOUBLE) AS d,
          (ct + cc) / CAST(nt + nc AS DOUBLE) AS pp
        FROM c),
      g AS (
        SELECT *,
          sqrt(pp * (1.0 - pp) * (1.0 / nt + 1.0 / nc)) AS sp,
          sqrt(pt * (1.0 - pt) / nt + pc * (1.0 - pc) / nc) AS sw
        FROM f)
      SELECT nt AS n_t, ct AS conv_t, round(pt, 9) AS rate_t,
        nc AS n_c, cc AS conv_c, round(pc, 9) AS rate_c,
        round(d, 9) + 0.0 AS diff,
        round(CASE WHEN sp = 0 THEN 0.0 ELSE d / sp END, 9) + 0.0 AS z,
        round(d - 1.959963984540054 * sw, 9) + 0.0 AS ci_lo,
        round(d + 1.959963984540054 * sw, 9) + 0.0 AS ci_hi
      FROM g"""),
    (s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 14).as("conv"))
        .withColumn("arm", graft.ops.Sampling.hashFraction("graft-arm",
          Seq(col("user_id"))) < 0.5)
      val out = graft.stats.Experiment.proportionTest(units,
        col("arm"), col("conv"))
      val r = out.collect().head
      require(r.getAs[Double]("p_value") >= 0 &&
        r.getAs[Double]("p_value") <= 1, "p out of range")
      require(r.getAs[Double]("ci_lo") <= r.getAs[Double]("diff") &&
        r.getAs[Double]("diff") <= r.getAs[Double]("ci_hi"),
        "Wald CI must bracket the difference")
      out.drop("p_value")
    })

  /** Market-basket association pairs
    * ([[graft.ops.EventAnalytics.itemsetPairs]]): baskets are
    * (user, day), items the distinct event types that day — support,
    * confidence, and lift from integer basket counts, every ratio
    * identical cross-engine. minBaskets prunes the long tail the way a
    * real miner would. */
  val evItemsetPairs: Q = Q(
    "ev_itemset_pairs",
    Some("""
      WITH bi AS (
        SELECT DISTINCT
          user_id * 100000 + date_diff('day', DATE '1970-01-01',
            CAST(ts AS DATE)) AS b,
          event_type AS i
        FROM events),
      n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM bi),
      ic AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i),
      p AS (
        SELECT a.i AS item_a, c.i AS item_b,
          CAST(count(*) AS BIGINT) AS n_ab
        FROM bi a JOIN bi c USING (b) WHERE a.i <> c.i
        GROUP BY 1, 2
        HAVING count(*) >= 50)
      SELECT item_a, item_b, na.n AS n_a, nbk.n AS n_b, n_ab,
        round(n_ab / CAST((SELECT nb FROM n) AS DOUBLE), 9) AS support,
        round(n_ab / CAST(na.n AS DOUBLE), 9) AS confidence,
        round(CAST(n_ab AS DOUBLE) * (SELECT nb FROM n)
          / CAST(na.n * nbk.n AS DOUBLE), 9) AS lift
      FROM p
      JOIN ic na ON p.item_a = na.i
      JOIN ic nbk ON p.item_b = nbk.i
      ORDER BY item_a, item_b"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("basket",
          col("user_id") * 100000 +
            datediff(to_date(col("ts")), lit("1970-01-01")))
      graft.ops.EventAnalytics.itemsetPairs(ev, "basket", "event_type",
          minBaskets = 50)
        .orderBy("item_a", "item_b")
    })

  /** Daily-count autocorrelation at lags 1..7
    * ([[graft.ops.EventAnalytics.acfDaily]]): the weekly-rhythm /
    * burstiness screen. The oracle rebuilds the daily series, the
    * broadcast mean, the rounded-product decimal folds and the lag join
    * from scratch — every acf value hash-checked. */
  val evAcf: Q = Q(
    "ev_acf_daily",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx FROM d),
      m AS (SELECT CAST(sx AS DOUBLE) / n AS mu FROM s),
      den AS (
        SELECT CAST(SUM(CAST(round((x - mu) * (x - mu), 6)
          AS DECIMAL(38,12))) AS DOUBLE) AS den
        FROM d, m),
      l AS (SELECT unnest(generate_series(1, 7)) AS lag),
      p AS (
        SELECT l.lag, a.x AS xa, b.x AS xb, m.mu
        FROM l, d a, d b, m WHERE b.day = a.day + l.lag),
      num AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CAST(round((xa - mu) * (xb - mu), 6)
            AS DECIMAL(38,12))) AS DOUBLE) AS num
        FROM p GROUP BY lag)
      SELECT CAST(num.lag AS BIGINT) AS lag, n_pairs,
        round(num.num / den.den, 6) AS acf
      FROM num, den ORDER BY lag"""),
    (s, dir) =>
      graft.ops.EventAnalytics.acfDaily(
        Tables.load(s, dir, "events"), "ts", maxLag = 7))

  /** Difference-in-differences over unit-period outcomes
    * ([[graft.stats.Experiment.differenceInDifferences]]): cohort =
    * odd user ids, post = the 2024-01-16 split the CUPED gate uses;
    * per-unit-period sums fold as round-9 decimals. The synthetic
    * cohort carries no true effect, so the gate is the estimator's
    * arithmetic, not a discovery; the oracle replays all four cells,
    * the Welch SE and the t statistic term-for-term. */
  val evDid: Q = Q(
    "ev_did",
    Some("""
      WITH up AS (
        SELECT user_id, (user_id % 2 = 1) AS treat,
          (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
          round(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38,12)))
            AS DOUBLE), 9) AS y
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2, 3),
      m AS (
        SELECT
          count(*) FILTER (NOT treat AND NOT post) AS n_c0,
          count(*) FILTER (NOT treat AND post) AS n_c1,
          count(*) FILTER (treat AND NOT post) AS n_t0,
          count(*) FILTER (treat AND post) AS n_t1,
          CAST(SUM(CAST(y AS DECIMAL(38,12)))
            FILTER (NOT treat AND NOT post) AS DOUBLE) AS sy_c0,
          CAST(SUM(CAST(y AS DECIMAL(38,12)))
            FILTER (NOT treat AND post) AS DOUBLE) AS sy_c1,
          CAST(SUM(CAST(y AS DECIMAL(38,12)))
            FILTER (treat AND NOT post) AS DOUBLE) AS sy_t0,
          CAST(SUM(CAST(y AS DECIMAL(38,12)))
            FILTER (treat AND post) AS DOUBLE) AS sy_t1,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12)))
            FILTER (NOT treat AND NOT post) AS DOUBLE) AS syy_c0,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12)))
            FILTER (NOT treat AND post) AS DOUBLE) AS syy_c1,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12)))
            FILTER (treat AND NOT post) AS DOUBLE) AS syy_t0,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12)))
            FILTER (treat AND post) AS DOUBLE) AS syy_t1
        FROM up),
      f AS (
        SELECT *,
          sy_c0 / n_c0 AS m_c0, sy_c1 / n_c1 AS m_c1,
          sy_t0 / n_t0 AS m_t0, sy_t1 / n_t1 AS m_t1,
          (syy_c0 - sy_c0 * sy_c0 / n_c0) / (n_c0 - 1) AS v_c0,
          (syy_c1 - sy_c1 * sy_c1 / n_c1) / (n_c1 - 1) AS v_c1,
          (syy_t0 - sy_t0 * sy_t0 / n_t0) / (n_t0 - 1) AS v_t0,
          (syy_t1 - sy_t1 * sy_t1 / n_t1) / (n_t1 - 1) AS v_t1
        FROM m),
      g AS (
        SELECT *,
          (m_t1 - m_t0) - (m_c1 - m_c0) AS eff,
          sqrt(v_t1 / n_t1 + v_t0 / n_t0 + v_c1 / n_c1 + v_c0 / n_c0)
            AS se
        FROM f)
      SELECT n_c0, n_c1, n_t0, n_t1,
        round(m_c0, 8) AS mean_control_pre,
        round(m_c1, 8) AS mean_control_post,
        round(m_t0, 8) AS mean_treat_pre,
        round(m_t1, 8) AS mean_treat_post,
        round(eff, 8) AS did_effect,
        round(se, 8) AS se,
        round(eff / se, 8) AS t_stat
      FROM g"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
      val up = ev
        .groupBy(col("user_id"),
          (col("user_id") % 2 === 1).as("treat"),
          (col("ts") >= to_timestamp(lit("2024-01-16 00:00:00")))
            .as("post"))
        .agg(round(sum(round(col("value"), 9).cast("decimal(38,12)"))
          .cast("double"), 9).as("y"))
      graft.stats.Experiment.differenceInDifferences(up,
        col("treat"), col("post"), col("y"))
    })

  /** Minimum detectable effect
    * ([[graft.stats.Experiment.minimumDetectableEffect]]): the power
    * line every A/B readout must ship beside — here for the exact
    * experiment ev_proportion_ztest runs (same hash arms, same ≥ 14
    * purchases conversion). The normal quantiles are library constants
    * inlined as the SAME doubles into both engines (the
    * Bootstrap-thresholds convention); everything else is fixed double
    * arithmetic over three integer counts. */
  val evPowerMde: Q = {
    val za = graft.stats.Experiment.zQuantile(1.0 - 0.05 / 2.0)
    val zb = graft.stats.Experiment.zQuantile(0.8)
    Q(
      "ev_power_mde",
      Some(s"""
      WITH u AS (
        SELECT user_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
            CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.5 AS arm,
          SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
            AS conv
        FROM events GROUP BY user_id),
      c AS (
        SELECT
          CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc,
          CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS cv
        FROM u),
      f AS (SELECT nt, nc, cv / CAST(nt + nc AS DOUBLE) AS pb FROM c),
      g AS (
        SELECT nt, nc, pb,
          ($za + $zb) * sqrt(pb * (1.0 - pb) * (1.0 / nt + 1.0 / nc))
            AS mde
        FROM f)
      SELECT nt AS n_t, nc AS n_c, round(pb, 9) + 0.0 AS rate_pooled,
        $za AS z_alpha, $zb AS z_power,
        round(mde, 9) + 0.0 AS mde_abs,
        CASE WHEN pb > 0 THEN round(mde / pb, 9) + 0.0 END AS mde_rel
      FROM g"""),
      (s, dir) => {
        val units = Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14).as("conv"))
          .withColumn("arm", graft.ops.Sampling.hashFraction("graft-arm",
            Seq(col("user_id"))) < 0.5)
        val out = graft.stats.Experiment.minimumDetectableEffect(units,
          col("arm"), col("conv"))
        val r = out.head()
        require(r.getAs[Double]("mde_abs") > 0 &&
          r.getAs[Double]("mde_abs") < 1,
          s"MDE out of band: ${r.getAs[Double]("mde_abs")}")
        require(!r.isNullAt(r.fieldIndex("mde_rel")),
          "non-zero baseline must yield a relative MDE")
        out
      })
  }

  /** First-occurrence precedence pairs
    * ([[graft.ops.EventAnalytics.sequencePairs]]): for every ordered
    * event-type pair, ids seeing both and ids where the first a
    * strictly preceded the first b — the order-aware companion to
    * ev_itemset_pairs. Integer counts + a round-9 ratio; the in-gate
    * asserts pin the pair-table geometry (n_both symmetric,
    * directions sum to ≤ n_both with ties counting neither). */
  val evSequencePairs: Q = Q(
    "ev_sequence_pairs",
    Some("""
      WITH f AS (
        SELECT user_id AS id, event_type AS t, min(ts) AS ts
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT a.t AS type_a, b.t AS type_b,
        CAST(count(*) AS BIGINT) AS n_both,
        CAST(SUM(CASE WHEN a.ts < b.ts THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a_first,
        round(CAST(SUM(CASE WHEN a.ts < b.ts THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*), 9) AS precedence
      FROM f a JOIN f b ON a.id = b.id AND a.t <> b.t
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.sequencePairs(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type")
      val rows = out.collect()
      require(rows.nonEmpty, "no event-type pairs mined")
      val both = rows.map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
      val first = rows.map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(3)).toMap
      both.foreach { case ((a, b), n) =>
        require(both((b, a)) == n, s"n_both asymmetric for ($a,$b)")
        require(first((a, b)) + first((b, a)) <= n,
          s"directions overcount n_both for ($a,$b)")
      }
      out
    })

  /** Brown's double exponential smoothing
    * ([[graft.ops.EventAnalytics.brownLinearDaily]], α = 0.3, H = 16):
    * the truncated-adjusted EWMA applied twice (S1, then S2 over S1),
    * with level/trend/one-step forecast derived by fixed double
    * arithmetic — both passes and every derived term replayed by this
    * SQL with the SAME literal weights (the ev_ewma_daily convention:
    * IEEE pow is not portably rounded; repeated multiplication in
    * Scala is, and the literals are shared verbatim). */
  /** Shared WITH-body of the Brown double-exponential oracle: the two
    * truncated-adjusted EWMA passes with literal weights, ending in a
    * `bro` relation (day, n_events, s1, s2, level, trend, forecast_1) —
    * reused verbatim by ev_brown_linear and the backtest gate. */
  private def brownCtes(wValues: String, gain: Double): String = s"""
        daily AS (
          SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1),
        w(j, w) AS (SELECT * FROM (VALUES $wValues)),
        c1 AS (
          SELECT daily.day + w.j AS day,
            CAST(round(w.w * daily.n_events, 12) AS DECIMAL(38,14)) AS term,
            CAST(round(w.w, 12) AS DECIMAL(38,14)) AS wt
          FROM daily, w),
        f1 AS (SELECT day, SUM(term) AS num, SUM(wt) AS den
               FROM c1 GROUP BY day),
        s1 AS (
          SELECT daily.day, daily.n_events,
            round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) AS s1
          FROM daily JOIN f1 USING (day)),
        c2 AS (
          SELECT s1.day + w.j AS day,
            CAST(round(w.w * s1.s1, 12) AS DECIMAL(38,14)) AS term,
            CAST(round(w.w, 12) AS DECIMAL(38,14)) AS wt
          FROM s1, w),
        f2 AS (SELECT day, SUM(term) AS num, SUM(wt) AS den
               FROM c2 GROUP BY day),
        s2 AS (
          SELECT day,
            round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) AS s2
          FROM f2),
        bro AS (
          SELECT s1.day, s1.n_events, s1.s1, s2.s2,
            round(2.0 * s1.s1 - s2.s2, 6) AS level,
            round(CAST($gain AS DOUBLE) * (s1.s1 - s2.s2), 6) AS trend,
            round(2.0 * s1.s1 - s2.s2, 6)
              + round(CAST($gain AS DOUBLE) * (s1.s1 - s2.s2), 6)
              AS forecast_1
          FROM s1 JOIN s2 USING (day))"""

  private val brownAlpha = 0.3
  private val brownHorizon = 16
  private def brownWValues: String = graft.ops.EventAnalytics
    .ewmaWeights(brownAlpha, brownHorizon).zipWithIndex
    .map { case (x, j) => s"($j, CAST($x AS DOUBLE))" }.mkString(", ")

  val evBrownLinear: Q = {
    val alpha = brownAlpha
    val horizon = brownHorizon
    val gain = alpha / (1.0 - alpha)
    Q(
      "ev_brown_linear",
      Some(s"""
        WITH ${brownCtes(brownWValues, gain)}
        SELECT day, n_events, s1, s2, level, trend, forecast_1
        FROM bro ORDER BY day"""),
      (s, dir) => {
        val out = graft.ops.EventAnalytics.brownLinearDaily(
          Tables.load(s, dir, "events"), alpha = alpha, horizon = horizon)
        // a flat series must give trend ≈ 0 geometry: |trend| stays a
        // small fraction of the level on real (noisy but trendless)
        // synthetic data — pins the sign conventions without pinning
        // values the oracle already hashes
        val bad = out.filter(abs(col("trend")) > col("level")).count()
        require(bad == 0, s"$bad days with |trend| > level on a " +
          "trendless daily series — gain arithmetic is off")
        out
      })
  }

  /** Poisson rate ratio ([[graft.stats.Experiment.rateRatio]]) of
    * error-vs-click daily rates: per-(arm, day) counts with
    * one-day exposures, log-Wald interval with the zQuantile literal
    * shared verbatim — every term replayed by the oracle; the normal p
    * is library-only (asserted in-gate, excluded — the
    * ev_proportion_ztest convention). */
  val evRateRatio: Q = {
    val z = graft.stats.Experiment.zQuantile(0.975)
    Q(
      "ev_rate_ratio",
      Some(s"""
        WITH daily AS (
          SELECT event_type = 'error' AS arm, CAST(ts AS DATE) AS day,
            count(*) AS k
          FROM events
          WHERE event_type IN ('error', 'click') AND ts IS NOT NULL
          GROUP BY 1, 2),
        s AS (
          SELECT
            CAST(SUM(CASE WHEN arm THEN k ELSE 0 END) AS BIGINT) AS ka,
            CAST(SUM(CASE WHEN arm THEN 1.0 ELSE 0 END) AS DOUBLE) AS ea,
            CAST(SUM(CASE WHEN NOT arm THEN k ELSE 0 END) AS BIGINT) AS kb,
            CAST(SUM(CASE WHEN NOT arm THEN 1.0 ELSE 0 END) AS DOUBLE)
              AS eb
          FROM daily),
        e AS (
          SELECT ka, ea, kb, eb, (ka / ea) / (kb / eb) AS ratio,
            sqrt(1.0 / ka + 1.0 / kb) AS se
          FROM s)
        SELECT ka AS k_a, ea AS e_a, kb AS k_b, eb AS e_b,
          round(ka / ea, 9) AS rate_a, round(kb / eb, 9) AS rate_b,
          round(ratio, 9) AS ratio,
          round(ratio * exp(-CAST($z AS DOUBLE) * se), 9) AS ci_lo,
          round(ratio * exp(CAST($z AS DOUBLE) * se), 9) AS ci_hi,
          round(ln(ratio) / se, 6) AS z
        FROM e"""),
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .filter(col("event_type").isin("error", "click") &&
            col("ts").isNotNull)
          .groupBy((col("event_type") === "error").as("arm"),
            to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("k"))
        val out = graft.stats.Experiment.rateRatio(
          daily, col("arm"), col("k"), lit(1.0))
        val r = out.head()
        require(r.getAs[Double]("ci_lo") < r.getAs[Double]("ratio") &&
          r.getAs[Double]("ratio") < r.getAs[Double]("ci_hi"),
          "CI must bracket the point estimate")
        val p = r.getAs[Double]("p_value")
        require(p > 0.0 && p <= 1.0, s"p out of range: $p")
        out.drop("p_value")
      })
  }

  /** Daily OHLC bars per event type
    * ([[graft.ops.EventAnalytics.ohlcDaily]]): open/close picked by the
    * deterministic (ts, event_id) struct min/max — raw doubles pass
    * through untouched, so the oracle's row_number replay is bit-exact;
    * high/low/volume are plain min/max/count; only the total folds (as a
    * round-9 decimal). One map-side-combined groupBy, no windows. */
  val evOhlc: Q = Q(
    "ev_ohlc_daily",
    Some("""
      WITH e AS (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type AS key,
          ts, event_id, value
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      r AS (
        SELECT *,
          row_number() OVER (PARTITION BY day, key
            ORDER BY ts, event_id) AS ra,
          row_number() OVER (PARTITION BY day, key
            ORDER BY ts DESC, event_id DESC) AS rd
        FROM e)
      SELECT day, key,
        max(CASE WHEN ra = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rd = 1 THEN value END) AS close,
        CAST(count(*) AS BIGINT) AS volume,
        round(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38,12)))
          AS DOUBLE), 9) + 0.0 AS total_value
      FROM r GROUP BY 1, 2
      ORDER BY day, key NULLS FIRST"""),
    (s, dir) =>
      graft.ops.EventAnalytics.ohlcDaily(Tables.load(s, dir, "events")))

  /** RFM quintile segmentation over the order ledger
    * ([[graft.ops.Segmentation.rfmScores]]): per-customer recency /
    * frequency / monetary plus 1–5 quintile scores against the ledger's
    * own round-6 percentile thresholds (recency reversed — recent = 5).
    * Row-level oracle: every customer's metrics AND scores replayed,
    * including the deterministic ties-fall-low bucket rule. */
  val evRfm: Q = Q(
    "seg_rfm_scores",
    Some("""
      WITH o AS (
        SELECT o_custkey AS cust,
          epoch_us(o_orderdate) // 86400000000 AS od,
          o_totalprice AS amt
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND o_totalprice IS NOT NULL),
      c AS (
        SELECT cust, max(od) AS last_day,
          CAST(count(*) AS BIGINT) AS frequency,
          round(CAST(SUM(CAST(amt AS DECIMAL(18,2))) AS DOUBLE), 2)
            AS monetary
        FROM o GROUP BY 1),
      mx AS (SELECT max(last_day) AS mxd FROM c),
      base AS (
        SELECT cust, mxd - last_day AS recency_days, frequency, monetary
        FROM c, mx),
      t AS (SELECT
          round(quantile_cont(CAST(recency_days AS DOUBLE), 0.2), 6) AS r20,
          round(quantile_cont(CAST(recency_days AS DOUBLE), 0.4), 6) AS r40,
          round(quantile_cont(CAST(recency_days AS DOUBLE), 0.6), 6) AS r60,
          round(quantile_cont(CAST(recency_days AS DOUBLE), 0.8), 6) AS r80,
          round(quantile_cont(CAST(frequency AS DOUBLE), 0.2), 6) AS f20,
          round(quantile_cont(CAST(frequency AS DOUBLE), 0.4), 6) AS f40,
          round(quantile_cont(CAST(frequency AS DOUBLE), 0.6), 6) AS f60,
          round(quantile_cont(CAST(frequency AS DOUBLE), 0.8), 6) AS f80,
          round(quantile_cont(monetary, 0.2), 6) AS m20,
          round(quantile_cont(monetary, 0.4), 6) AS m40,
          round(quantile_cont(monetary, 0.6), 6) AS m60,
          round(quantile_cont(monetary, 0.8), 6) AS m80
        FROM base)
      SELECT cust, recency_days, frequency, monetary,
        6 - (1 + (CAST(recency_days AS DOUBLE) > r20)::INT
          + (CAST(recency_days AS DOUBLE) > r40)::INT
          + (CAST(recency_days AS DOUBLE) > r60)::INT
          + (CAST(recency_days AS DOUBLE) > r80)::INT) AS r_score,
        1 + (CAST(frequency AS DOUBLE) > f20)::INT
          + (CAST(frequency AS DOUBLE) > f40)::INT
          + (CAST(frequency AS DOUBLE) > f60)::INT
          + (CAST(frequency AS DOUBLE) > f80)::INT AS f_score,
        1 + (monetary > m20)::INT + (monetary > m40)::INT
          + (monetary > m60)::INT + (monetary > m80)::INT AS m_score
      FROM base, t ORDER BY cust"""),
    (s, dir) =>
      graft.ops.Segmentation.rfmScores(Tables.load(s, dir, "orders"),
        "o_custkey", "o_orderdate", "o_totalprice"))

  /** Maximum drawdown of the cumulative daily event-value series
    * ([[graft.ops.EventAnalytics.maxDrawdown]]): the Spark side runs the
    * two-pass partition-offset scan (NO window); the oracle replays the
    * identical exact-decimal running sums with SQL windows and the same
    * earliest-peak / earliest-trough tie policy, so peak day, trough
    * day, and the drawdown double must all agree bit-for-bit. */
  val evMaxDrawdown: Q = Q(
    "ev_max_drawdown",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          round(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38,12)))
            AS DOUBLE), 9) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1),
      c AS (
        SELECT day,
          sum(CAST(round(y, 9) AS DECIMAL(38,12))) OVER (ORDER BY day)
            AS cum
        FROM d),
      r AS (
        SELECT day, cum, max(cum) OVER (ORDER BY day) AS runmax FROM c),
      tr AS (
        SELECT day AS trough_day, runmax, runmax - cum AS dd
        FROM r ORDER BY dd DESC, day ASC LIMIT 1),
      pk AS (
        SELECT min(r.day) AS peak_day
        FROM r, tr WHERE r.cum = tr.runmax AND r.day <= tr.trough_day),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d)
      SELECT n.n_days, pk.peak_day, tr.trough_day,
        CAST(tr.dd AS DOUBLE) AS max_drawdown
      FROM n, pk, tr"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .filter(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(expr(s"unix_micros(ts) div ${86400L * 1000000L}").as("day"))
        .agg(round(sum(round(col("value"), 9).cast("decimal(38,12)"))
          .cast("double"), 9).as("y"))
      val out = graft.ops.EventAnalytics.maxDrawdown(daily, "day", "y")
      val r = out.head()
      require(r.getAs[Long]("peak_day") <= r.getAs[Long]("trough_day"),
        s"a peak cannot follow its trough: $r")
      require(r.getAs[Double]("max_drawdown") >= 0.0)
      out
    })

  /** Linear (equal-split) multi-touch attribution
    * ([[graft.ops.EventAnalytics.attributeRevenueLinear]]) — the third
    * model beside ev_attribution_last/first: every in-window touch
    * shares the conversion equally. The oracle replays the
    * strictly-before join, the per-conversion k window, and every
    * round-6 share/credit division. */
  val evAttributionLinear: Q = Q(
    "ev_attribution_linear",
    Some("""
      WITH b AS (
        SELECT user_id AS u, epoch_us(ts) // 1000000 AS t,
          event_id AS o, event_type AS ty,
          CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      conv AS (
        SELECT u, t AS ct, o AS co, c AS cents FROM b WHERE ty = 'purchase'),
      tch AS (
        SELECT u AS tu, t AS tt, o AS tto, ty AS ch
        FROM b WHERE ty IN ('view', 'click')),
      j AS (
        SELECT conv.u, conv.ct, conv.co, conv.cents, tch.ch
        FROM conv LEFT JOIN tch ON conv.u = tch.tu
          AND (tch.tt < conv.ct
            OR (tch.tt = conv.ct AND tch.tto < conv.co))
          AND tch.tt >= conv.ct - 172800),
      k AS (SELECT *, count(ch) OVER (PARTITION BY u, ct, co) AS k FROM j),
      cr AS (
        SELECT CASE WHEN k = 0 THEN 'direct' ELSE ch END AS channel,
          CASE WHEN k = 0 THEN 1.0 ELSE round(1.0 / k, 6) END AS share,
          CASE WHEN k = 0 THEN CAST(cents AS DOUBLE)
            ELSE round(cents / k, 6) END AS credit
        FROM k)
      SELECT channel,
        round(CAST(SUM(CAST(share AS DECIMAL(38,12))) AS DOUBLE), 6)
          AS conversions,
        round(CAST(SUM(CAST(credit AS DECIMAL(38,12))) AS DOUBLE), 6)
          AS revenue_cents
      FROM cr GROUP BY 1 ORDER BY channel"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.attributeRevenueLinear(
        Tables.load(s, dir, "events"), Seq("view", "click"), "purchase",
        windowSeconds = 172800L)
      val convTotal = out.agg(sum(col("conversions"))).head().getDouble(0)
      val nConv = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase").count()
      require(math.abs(convTotal - nConv) < 0.01 * nConv + 1,
        s"linear shares must re-sum to the conversion count " +
          s"(got $convTotal of $nConv)")
      out
    })

  /** Cohort LTV curve ([[graft.ops.EventAnalytics.ltvCurve]]): weekly
    * signup cohorts, cumulative revenue per cohort user by account age.
    * The oracle replays first-event days, cohort sizes, the decimal
    * revenue cells, and the within-cohort cumulative window. In-gate:
    * ltv must be non-decreasing in age within every cohort (revenue is
    * non-negative in this data). */
  val evLtv: Q = Q(
    "ev_ltv_curve",
    Some("""
      WITH b AS (
        SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d,
          CAST(round(value, 9) AS DECIMAL(38,12)) AS v
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
      f AS (SELECT u, min(d) AS f FROM b GROUP BY 1),
      sizes AS (
        SELECT CAST(floor(f / 7.0) AS BIGINT) AS cohort_week,
          CAST(count(*) AS BIGINT) AS cohort_size
        FROM f GROUP BY 1),
      cells AS (
        SELECT CAST(floor(f.f / 7.0) AS BIGINT) AS cohort_week,
          CAST(floor((b.d - f.f) / 7.0) AS BIGINT) AS age_weeks,
          CAST(count(DISTINCT b.u) AS BIGINT) AS n_active_users,
          SUM(b.v) AS rev
        FROM b JOIN f ON b.u = f.u GROUP BY 1, 2),
      cum AS (
        SELECT *, sum(rev) OVER (PARTITION BY cohort_week
          ORDER BY age_weeks) AS cumrev
        FROM cells)
      SELECT c.cohort_week, c.age_weeks, s.cohort_size, c.n_active_users,
        round(CAST(c.rev AS DOUBLE), 9) AS revenue,
        round(CAST(c.cumrev AS DOUBLE) / s.cohort_size, 6) AS ltv_per_user
      FROM cum c JOIN sizes s USING (cohort_week)
      ORDER BY cohort_week, age_weeks"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.ltvCurve(
        Tables.load(s, dir, "events"))
      if (Tables.gateMode) {
        // monotone-in-age contract: value >= 0 in this data, so the
        // cumulative per-user curve can never fall within a cohort
        val bad = out.select(col("cohort_week"), col("age_weeks"),
            col("ltv_per_user"))
          .withColumn("__prev", lag(col("ltv_per_user"), 1).over(
            Window.partitionBy(col("cohort_week"))
              .orderBy(col("age_weeks"))))
          .filter(col("__prev").isNotNull &&
            col("ltv_per_user") < col("__prev"))
          .count()
        require(bad == 0L, s"$bad cohort-age cells fell - not cumulative")
      }
      out
    })

  /** Poisson dispersion screen on per-type daily counts
    * ([[graft.ops.EventAnalytics.dispersionByKey]]): VMR and Fisher's
    * dispersion χ², replayed from exact integer moments. */
  val evDispersion: Q = Q(
    "ev_dispersion",
    Some("""
      WITH d AS (
        SELECT event_type AS key, epoch_us(ts) // 86400000000 AS dday,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      m AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days,
          CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(x * x) AS BIGINT) AS sxx
        FROM d GROUP BY 1)
      SELECT key, n_days,
        round(CAST(sx AS DOUBLE) / n_days, 6) AS mean_count,
        CASE WHEN n_days >= 2 AND sx > 0
          THEN round(((sxx - CAST(sx AS DOUBLE) * sx / n_days)
            / (n_days - 1)) / (CAST(sx AS DOUBLE) / n_days), 6) + 0.0
        END AS vmr,
        CASE WHEN n_days >= 2 AND sx > 0
          THEN round((n_days - 1) * (((sxx - CAST(sx AS DOUBLE) * sx
            / n_days) / (n_days - 1))
            / (CAST(sx AS DOUBLE) / n_days)), 6) + 0.0
        END AS dispersion_chi2
      FROM m ORDER BY key NULLS FIRST"""),
    (s, dir) =>
      graft.ops.EventAnalytics.dispersionByKey(
        Tables.load(s, dir, "events")))

  /** Cohen's h effect size ([[graft.stats.Experiment.cohensH]]) on the
    * same hash-split arms as ev_proportion_ztest — the scale-free "how
    * big" beside that gate's "is it real". The oracle replays the four
    * exact cells and the asin/sqrt tree; the magnitude band is computed
    * from the ROUNDED h in both engines. */
  val evCohensH: Q = Q(
    "ev_cohens_h",
    Some("""
      WITH u AS (
        SELECT user_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
            CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.5 AS arm,
          SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
            AS conv
        FROM events GROUP BY user_id),
      c AS (
        SELECT
          CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc,
          CAST(SUM(CASE WHEN arm AND conv THEN 1 ELSE 0 END) AS BIGINT)
            AS ct,
          CAST(SUM(CASE WHEN NOT arm AND conv THEN 1 ELSE 0 END) AS BIGINT)
            AS cc
        FROM u WHERE arm IS NOT NULL AND conv IS NOT NULL),
      f AS (
        SELECT *, ct / CAST(nt AS DOUBLE) AS pt,
          cc / CAST(nc AS DOUBLE) AS pc
        FROM c),
      g AS (
        SELECT *, round(2.0 * asin(sqrt(pt)) - 2.0 * asin(sqrt(pc)), 6)
          AS h6
        FROM f)
      SELECT nt AS n_t, nc AS n_c,
        round(pt, 9) AS rate_t, round(pc, 9) AS rate_c, h6 + 0.0 AS h,
        CASE WHEN abs(h6) < 0.2 THEN 'negligible'
          WHEN abs(h6) < 0.5 THEN 'small'
          WHEN abs(h6) < 0.8 THEN 'medium' ELSE 'large' END AS magnitude
      FROM g"""),
    (s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 14).as("conv"))
        .withColumn("arm", graft.ops.Sampling.hashFraction("graft-arm",
          Seq(col("user_id"))) < 0.5)
      val out = graft.stats.Experiment.cohensH(units, col("arm"),
        col("conv"))
      val r = out.head()
      require(r.getAs[String]("magnitude") == "negligible",
        s"hash arms carry no true effect: $r")
      out
    })

  /** Empirical-Bayes beta-binomial shrinkage of per-customer order
    * failure rates ([[graft.stats.Shrinkage.betaBinomialRates]]): the
    * oracle replays the per-key cells, the round-9 rate folds, the
    * method-of-moments prior, and every posterior mean. In-gate: every
    * shrunken rate must sit at least as close to the prior mean as the
    * raw rate (shrinkage can't push outward), asserted distributed. */
  val evEbShrinkage: Q = Q(
    "seg_eb_shrinkage",
    Some("""
      WITH pk AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_trials,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_success
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
        GROUP BY 1),
      r AS (SELECT *, round(n_success / n_trials, 9) AS rate FROM pk),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(SUM(CAST(rate AS DECIMAL(38,12))) AS DOUBLE) AS sp,
          CAST(SUM(CAST(round(rate * rate, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS spp
        FROM r),
      pr AS (
        SELECT k, sp / k AS mn, (spp - sp * sp / k) / (k - 1) AS v FROM m),
      pr2 AS (
        SELECT *,
          CASE WHEN k >= 2 AND v > 0 AND v < mn * (1.0 - mn)
            THEN mn * (mn * (1.0 - mn) / v - 1.0) END AS alpha,
          CASE WHEN k >= 2 AND v > 0 AND v < mn * (1.0 - mn)
            THEN (1.0 - mn) * (mn * (1.0 - mn) / v - 1.0) END AS beta
        FROM pr)
      SELECT r.key, r.n_trials, r.n_success, r.rate,
        pr2.alpha, pr2.beta,
        CASE WHEN pr2.alpha IS NOT NULL
          THEN round((r.n_success + pr2.alpha)
            / (r.n_trials + pr2.alpha + pr2.beta), 6)
          ELSE round(r.rate, 6) END AS shrunk_rate
      FROM r, pr2 ORDER BY key"""),
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val out = graft.stats.Shrinkage.betaBinomialRates(orders,
        col("o_custkey"), col("o_orderstatus") === "F")
      if (Tables.gateMode) {
        val head = out.limit(1).head()
        if (!head.isNullAt(head.fieldIndex("alpha"))) {
          val a = head.getAs[Double]("alpha")
          val b = head.getAs[Double]("beta")
          val pm = a / (a + b)
          val outward = out.filter(
            abs(col("shrunk_rate") - pm) >
              abs(round(col("rate"), 6) - pm) + 1e-9).count()
          require(outward == 0L,
            s"$outward keys shrank AWAY from the prior mean")
        }
      }
      out
    })

  /** Inter-event gap statistics + Goh–Barabási burstiness per event
    * type ([[graft.ops.EventAnalytics.interEventGaps]]): per-stream
    * lag gaps, exact integer moments, quantile_cont median parity. */
  val evInterEvent: Q = Q(
    "ev_interevent_gaps",
    Some("""
      WITH b AS (
        SELECT event_type AS key, user_id AS u,
          epoch_us(ts) // 1000000 AS t, event_id AS o
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL),
      g AS (
        SELECT key, t - lag(t) OVER (PARTITION BY key, u ORDER BY t, o)
          AS g
        FROM b),
      g2 AS (SELECT key, g FROM g WHERE g IS NOT NULL),
      m AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_gaps,
          CAST(sum(g) AS BIGINT) AS sg,
          CAST(sum(g * g) AS BIGINT) AS sgg,
          round(quantile_cont(CAST(g AS DOUBLE), 0.5), 6) AS median_gap
        FROM g2 GROUP BY 1)
      SELECT key, n_gaps,
        round(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap, median_gap,
        CASE WHEN sqrt((sgg - CAST(sg AS DOUBLE) * sg / n_gaps) / n_gaps)
            + CAST(sg AS DOUBLE) / n_gaps > 0.0
          THEN round((sqrt((sgg - CAST(sg AS DOUBLE) * sg / n_gaps)
            / n_gaps) - CAST(sg AS DOUBLE) / n_gaps)
            / (sqrt((sgg - CAST(sg AS DOUBLE) * sg / n_gaps) / n_gaps)
              + CAST(sg AS DOUBLE) / n_gaps), 6) + 0.0
        END AS burstiness
      FROM m ORDER BY key"""),
    (s, dir) =>
      graft.ops.EventAnalytics.interEventGaps(
        Tables.load(s, dir, "events")))

  /** Sample-ratio-mismatch check ([[graft.stats.Experiment.srmTest]])
    * on the hash-split arms every experiment gate shares: realized arm
    * sizes vs the intended 50/50, χ²₁ goodness-of-fit. The oracle
    * replays the two cells and the χ² tree; the χ²(1) p is library-only
    * (asserted in-gate: a healthy deterministic hash split must NOT
    * flag SRM). */
  val evSrm: Q = Q(
    "ev_srm_check",
    Some("""
      WITH u AS (
        SELECT user_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
            CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.5 AS arm
        FROM events GROUP BY user_id),
      c AS (
        SELECT CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc
        FROM u WHERE arm IS NOT NULL)
      SELECT nt AS n_t, nc AS n_c,
        round((nt + nc) * 0.5, 6) AS expected_t,
        round((nt + nc) * 0.5, 6) AS expected_c,
        round((nt - (nt + nc) * 0.5) * (nt - (nt + nc) * 0.5)
            / ((nt + nc) * 0.5)
          + (nc - (nt + nc) * 0.5) * (nc - (nt + nc) * 0.5)
            / ((nt + nc) * 0.5), 6) + 0.0 AS chi2
      FROM c"""),
    (s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("__n"))
        .withColumn("arm", graft.ops.Sampling.hashFraction("graft-arm",
          Seq(col("user_id"))) < 0.5)
      val out = graft.stats.Experiment.srmTest(units, col("arm"))
      val r = out.head()
      require(r.getAs[Double]("p_value") > 1e-4,
        s"a healthy deterministic split must not flag SRM: $r")
      out.drop("p_value")
    })

  /** Daily spike days ([[graft.ops.EventAnalytics.dailyPeaks]]):
    * strict local maxima of the daily count series with missing
    * calendar neighbors counted as zero; the oracle replays the two
    * day±1 self-joins and the strict filter row for row. */
  val evPeaks: Q = Q(
    "ev_daily_peaks",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS n_events
        FROM events WHERE ts IS NOT NULL GROUP BY 1)
      SELECT d.day, d.n_events,
        COALESCE(p.n_events, 0) AS prev_n,
        COALESCE(nx.n_events, 0) AS next_n
      FROM d
      LEFT JOIN d p ON p.day = d.day - 1
      LEFT JOIN d nx ON nx.day = d.day + 1
      WHERE d.n_events > COALESCE(p.n_events, 0)
        AND d.n_events > COALESCE(nx.n_events, 0)
      ORDER BY d.day"""),
    (s, dir) =>
      graft.ops.EventAnalytics.dailyPeaks(Tables.load(s, dir, "events")))

  /** Time-to-convert between funnel steps
    * ([[graft.ops.EventAnalytics.funnelStepTimes]]) on the ev_funnel
    * fixture: the oracle rebuilds the identical chained
    * first-occurrence times, then replays the microsecond deltas, the
    * round-9 decimal mean fold, and the exact quantiles per step pair. */
  val evFunnelTiming: Q = Q(
    "ev_funnel_timing",
    Some("""
      WITH u AS (
        SELECT user_id,
          min(ts) FILTER (event_type = 'view') AS t1,
          list_sort(list(ts) FILTER (event_type = 'click')) AS l2,
          list_sort(list(ts) FILTER (event_type = 'purchase')) AS l3
        FROM events GROUP BY 1),
      c AS (
        SELECT user_id, t1, l3,
          list_filter(l2, x -> x > t1
            AND x <= t1 + INTERVAL 48 HOUR)[1] AS t2
        FROM u),
      c2 AS (
        SELECT user_id, t1, t2,
          list_filter(l3, x -> x > t2
            AND x <= t1 + INTERVAL 48 HOUR)[1] AS t3
        FROM c),
      d2 AS (SELECT CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE)
          / 1000000.0 AS d FROM c2 WHERE t2 IS NOT NULL),
      d3 AS (SELECT CAST(epoch_us(t3) - epoch_us(t2) AS DOUBLE)
          / 1000000.0 AS d FROM c2 WHERE t3 IS NOT NULL),
      s2 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          round(CAST(SUM(CAST(round(d, 9) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) AS mean_s,
          round(quantile_cont(d, 0.5), 6) AS median_s,
          round(quantile_cont(d, 0.9), 6) AS p90_s
        FROM d2),
      s3 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          round(CAST(SUM(CAST(round(d, 9) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) AS mean_s,
          round(quantile_cont(d, 0.5), 6) AS median_s,
          round(quantile_cont(d, 0.9), 6) AS p90_s
        FROM d3)
      SELECT 'view' AS from_step, 'click' AS to_step, 2 AS step_idx,
        n, mean_s, median_s, p90_s FROM s2
      UNION ALL
      SELECT 'click', 'purchase', 3, n, mean_s, median_s, p90_s FROM s3
      ORDER BY step_idx"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.funnelStepTimes(
        Tables.load(s, dir, "events"),
        steps = Seq("view", "click", "purchase"), window = "48 hours")
      val rows = out.collect()
      rows.foreach { r =>
        require(r.getAs[Double]("median_s") >= 0.0 &&
          r.getAs[Double]("p90_s") >= r.getAs[Double]("median_s"), s"$r")
      }
      out
    })

  /** Rolling-origin backtest of the Brown one-step forecast
    * ([[graft.ops.EventAnalytics.forecastBacktestDaily]]): the oracle
    * re-derives the full forecast table (shared [[brownCtes]]) and
    * replays the next-day join, the round-6 error folds, the naive
    * benchmark, MASE, and sMAPE. In-gate: MASE must be finite-positive
    * and sMAPE in [0, 2] (its algebraic range). */
  val evForecastBacktest: Q = {
    val gain = brownAlpha / (1.0 - brownAlpha)
    Q(
      "ev_forecast_backtest",
      Some(s"""
        WITH ${brownCtes(brownWValues, gain)},
        nxt AS (SELECT day - 1 AS day, n_events AS a_next FROM bro),
        p AS (
          SELECT round(abs(b.forecast_1 - n.a_next), 6) AS e_m,
            abs(n.a_next - b.n_events) AS e_n,
            round(2.0 * abs(b.forecast_1 - n.a_next)
              / (b.forecast_1 + n.a_next), 9) AS sm,
            round((b.forecast_1 - n.a_next)
              * (b.forecast_1 - n.a_next), 9) AS e_m2,
            (n.a_next - b.n_events) * (n.a_next - b.n_events) AS e_n2
          FROM bro b JOIN nxt n USING (day)),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(SUM(CAST(e_m AS DECIMAL(38,12))) AS DOUBLE) AS sm_m,
            CAST(SUM(e_n) AS BIGINT) AS s_n,
            CAST(SUM(CAST(sm AS DECIMAL(38,12))) AS DOUBLE) AS s_smape,
            CAST(SUM(CAST(e_m2 AS DECIMAL(38,12))) AS DOUBLE) AS s_m2,
            CAST(SUM(e_n2) AS BIGINT) AS s_n2
          FROM p)
        SELECT n_pairs,
          round(sm_m / n_pairs, 6) AS mae_model,
          round(CAST(s_n AS DOUBLE) / n_pairs, 6) AS mae_naive,
          CASE WHEN s_n > 0
            THEN round((sm_m / n_pairs)
              / (CAST(s_n AS DOUBLE) / n_pairs), 6) + 0.0 END AS mase,
          round(s_smape / n_pairs, 6) AS smape,
          CASE WHEN s_n2 > 0
            THEN round(sqrt(s_m2 / CAST(s_n2 AS DOUBLE)), 6) + 0.0 END
            AS theils_u2
        FROM agg"""),
      (s, dir) => {
        val out = graft.ops.EventAnalytics.forecastBacktestDaily(
          Tables.load(s, dir, "events"), alpha = brownAlpha,
          horizon = brownHorizon)
        val r = out.head()
        val mase = r.getAs[Double]("mase")
        val smape = r.getAs[Double]("smape")
        require(mase > 0.0 && smape >= 0.0 && smape <= 2.0,
          s"degenerate backtest: $r")
        require(r.getAs[Double]("theils_u2") > 0.0,
          s"U2 must be positive on a non-degenerate backtest: $r")
        out
      })
  }

  /** Quantile treatment effects
    * ([[graft.stats.Experiment.quantileEffects]]) of per-user total
    * value across the standard hash arms: the distributional readout
    * beside ev_proportion_ztest's single rate. The oracle replays every
    * per-arm round-6 quantile and the re-rounded differences. In-gate:
    * each arm's quantiles must be nondecreasing in p (a free
    * order-statistic invariant). */
  val evQte: Q = {
    val ps = (1 to 9).map(_ / 10.0)
    val qCols = ps.zipWithIndex.map { case (p, i) =>
      s"""round(quantile_cont(y, $p) FILTER (arm), 6) AS qt_$i,
          round(quantile_cont(y, $p) FILTER (NOT arm), 6) AS qc_$i"""
    }.mkString(",\n          ")
    val outRows = ps.zipWithIndex.map { case (p, i) =>
      s"SELECT CAST($p AS DOUBLE) AS p, qt_$i AS q_treatment, " +
        s"qc_$i AS q_control, round(qt_$i - qc_$i, 6) + 0.0 AS effect FROM q"
    }.mkString("\n      UNION ALL ")
    Q(
      "ev_quantile_effects",
      Some(s"""
      WITH u AS (
        SELECT user_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
            CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.5 AS arm,
          round(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38,12)))
            AS DOUBLE), 9) AS y
        FROM events WHERE value IS NOT NULL GROUP BY user_id),
      b AS (SELECT arm, y FROM u
        WHERE arm IS NOT NULL AND y IS NOT NULL),
      q AS (SELECT
          $qCols
        FROM b)
      $outRows
      ORDER BY p"""),
      (s, dir) => {
        val units = Tables.load(s, dir, "events")
          .filter(col("value").isNotNull)
          .groupBy("user_id")
          .agg(round(sum(round(col("value"), 9).cast("decimal(38,12)"))
            .cast("double"), 9).as("y"))
          .withColumn("arm", graft.ops.Sampling.hashFraction("graft-arm",
            Seq(col("user_id"))) < 0.5)
        val out = graft.stats.Experiment.quantileEffects(units,
          col("arm"), col("y"))
        val rows = out.collect()
        rows.sliding(2).foreach {
          case Array(a, b) =>
            require(a.getAs[Double]("q_treatment") <=
              b.getAs[Double]("q_treatment") &&
              a.getAs[Double]("q_control") <= b.getAs[Double]("q_control"),
              s"quantiles must be nondecreasing in p: $a -> $b")
          case _ =>
        }
        out
      })
  }

  /** Day-of-week effect strength
    * ([[graft.ops.EventAnalytics.weekdayEffect]]): one-way ANOVA of
    * daily counts across the 7 weekday phases — the oracle replays the
    * exact integer moments and the t12 scatter decomposition. */
  val evWeekday: Q = Q(
    "ev_weekday_anova",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      g AS (
        -- non-negative modulus: matches Spark's pmod for pre-1970
        -- (negative epoch-day) timestamps; a bare % is sign-following
        SELECT ((day % 7) + 7) % 7 AS wd, CAST(count(*) AS BIGINT) AS n_g,
          CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2
        FROM d GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS k,
          CAST(sum(s1) AS DOUBLE) / sum(n_g) AS gm
        FROM g),
      ss AS (
        SELECT tot.n, tot.k,
          SUM(n_g * (CAST(s1 AS DOUBLE) / n_g - gm)
            * (CAST(s1 AS DOUBLE) / n_g - gm)) AS ssb,
          SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_g) AS ssw
        FROM g, tot GROUP BY tot.n, tot.k)
      SELECT n AS n_days,
        CASE WHEN ssw > 0
          THEN round((ssb / (k - 1)) / (ssw / (n - k)), 4) + 0.0
        END AS f_stat,
        k - 1 AS df_between, n - k AS df_within,
        round(ssb / (ssb + ssw), 6) + 0.0 AS eta_squared
      FROM ss"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.weekdayEffect(
        Tables.load(s, dir, "events"))
      val r = out.head()
      require(r.getAs[Long]("df_between") == 6L &&
        r.getAs[Double]("eta_squared") >= 0.0 &&
        r.getAs[Double]("eta_squared") <= 1.0, s"$r")
      out
    })

  /** Mann–Kendall monotonic trend
    * ([[graft.ops.EventAnalytics.mannKendallDaily]]) on the daily count
    * series: the Spark side runs the driver Fenwick pass over the
    * calendar-bounded series; the oracle replays S from the full pair
    * join, the tie-corrected variance (HUGEINT), τ_a, and the
    * continuity-corrected z; the normal p is library-only. */
  val evMannKendall: Q = Q(
    "ev_mann_kendall",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      p AS (SELECT a.x AS xa, b.x AS xb FROM d a, d b WHERE b.day > a.day),
      sagg AS (
        SELECT CAST(SUM(CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1
          ELSE 0 END) AS BIGINT) AS s
        FROM p),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      ties AS (
        SELECT SUM(CASE WHEN t > 1
          THEN CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)
          ELSE 0 END) AS tsum
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY x)),
      v AS (
        SELECT CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
          - COALESCE(tsum, 0) AS DOUBLE) / 18.0 AS var
        FROM nn, ties)
      SELECT nn.n AS n_days, sagg.s,
        round(CAST(sagg.s AS DOUBLE) / (nn.n * (nn.n - 1) / 2.0), 6) + 0.0
          AS tau_a,
        CASE WHEN v.var > 0 THEN round(
          CASE WHEN sagg.s > 0 THEN (sagg.s - 1) / sqrt(v.var)
            WHEN sagg.s < 0 THEN (sagg.s + 1) / sqrt(v.var)
            ELSE 0.0 END, 6) + 0.0 END AS z
      FROM nn, sagg, v"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.mannKendallDaily(
        Tables.load(s, dir, "events"))
      val r = out.head()
      require(math.abs(r.getAs[Double]("tau_a")) <= 1.0)
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0)
      out.drop("p_value")
    })

  /** Gumbel block-maxima fit
    * ([[graft.ops.EventAnalytics.gumbelBlockMaxima]]): WEEKLY block
    * maxima of the daily count series (the synthetic log spans ~2
    * months — 30-day blocks would leave 2 points), method-of-moments Gumbel
    * parameters, 100-block return level — the irrational constants
    * inlined as identical literal doubles into both engines. In-gate:
    * the return level must exceed every moment-scale summary (it is an
    * extreme, not an average). */
  val evGumbel: Q = {
    import graft.ops.EventAnalytics.{EulerGamma, Sqrt6OverPi}
    val g = math.log(-math.log(1.0 - 1.0 / 100))
    Q(
      "ev_gumbel_maxima",
      Some(s"""
        WITH d AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS x
          FROM events WHERE ts IS NOT NULL GROUP BY 1),
        b AS (
          SELECT CAST(floor(day / 7.0) AS BIGINT) AS blk,
            CAST(max(x) AS BIGINT) AS mx
          FROM d GROUP BY 1),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
            CAST(sum(mx) AS BIGINT) AS sm,
            CAST(sum(mx * mx) AS BIGINT) AS smm
          FROM b),
        f AS (
          SELECT k, CAST(sm AS DOUBLE) / k AS mean,
            (smm - CAST(sm AS DOUBLE) * sm / k) / (k - 1) AS v
          FROM m),
        f2 AS (SELECT *, sqrt(v) * CAST($Sqrt6OverPi AS DOUBLE) AS beta
          FROM f),
        f3 AS (SELECT *, mean - CAST($EulerGamma AS DOUBLE) * beta AS mu
          FROM f2)
        SELECT k AS k_blocks, round(mean, 6) + 0.0 AS mean_max,
          round(sqrt(v), 6) + 0.0 AS sd_max,
          round(beta, 6) + 0.0 AS beta, round(mu, 6) + 0.0 AS mu,
          round(mu - beta * CAST($g AS DOUBLE), 6) + 0.0 AS return_level
        FROM f3"""),
      (s, dir) => {
        val out = graft.ops.EventAnalytics.gumbelBlockMaxima(
          Tables.load(s, dir, "events"), blockDays = 7)
        val r = out.head()
        require(r.getAs[Double]("return_level") >
          r.getAs[Double]("mean_max"),
          s"a 100-block return level must exceed the mean maximum: $r")
        out
      })
  }

  /** Entropy rate of the user-journey chain
    * ([[graft.ops.Markov.entropyRate]]): π-weighted conditional
    * entropies of the transition MLE — the oracle re-derives the full
    * 6-iteration stationary recurrence (shared CTEs), the per-state
    * round-9 entropy folds, and the round-12 weighted rate. In-gate:
    * 0 ≤ rate ≤ ln k (Shannon bounds). */
  val evMarkovEntropy: Q = Q(
    "ev_markov_entropy",
    Some(markovStationaryCtes(6) + """,
      hs AS (
        SELECT tr.src,
          round(-CAST(SUM(CAST(round((CAST(tr.n AS DOUBLE) / tot.tot)
            * ln(CAST(tr.n AS DOUBLE) / tot.tot), 9) AS DECIMAL(38,12)))
            AS DOUBLE), 9) AS h
        FROM tr JOIN tot USING (src) GROUP BY tr.src),
      pr AS (SELECT state, round(pi, 8) AS pi FROM p6),
      rt AS (
        SELECT CAST(COALESCE(SUM(CAST(round(pr.pi * hs.h, 12)
          AS DECIMAL(38,14))), 0) AS DOUBLE) AS rate
        FROM pr JOIN hs ON pr.state = hs.src),
      ks AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st)
      SELECT ks.k AS k_states, round(rt.rate, 6) + 0.0 AS entropy_rate,
        round(rt.rate / ln(CAST(ks.k AS DOUBLE)), 6) + 0.0 AS normalized
      FROM rt, ks"""),
    (s, dir) => {
      val out = graft.ops.Markov.entropyRate(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type")
      val r = out.head()
      val rate = r.getAs[Double]("entropy_rate")
      val norm = r.getAs[Double]("normalized")
      require(rate >= 0.0 && norm <= 1.0 + 1e-9,
        s"Shannon bounds violated: $r")
      out
    })

  /** Hour-of-day profile ([[graft.ops.EventAnalytics.hourlyProfile]]) —
    * the oracle replays the non-negative hour bucket, the exact counts,
    * shares, and the peak flag. */
  val evHourly: Q = Q(
    "ev_hourly_profile",
    Some("""
      WITH h AS (
        SELECT ((epoch_us(ts) // 3600000000) % 24 + 24) % 24 AS hour,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t,
        CAST(MAX(n_events) AS BIGINT) AS mx FROM h)
      SELECT hour, n_events,
        round(CAST(n_events AS DOUBLE) / t.t, 6) + 0.0 AS share,
        n_events = t.mx AS is_peak
      FROM h, t ORDER BY hour"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.hourlyProfile(
        Tables.load(s, dir, "events"))
      val rows = out.collect()
      require(rows.nonEmpty && rows.count(_.getAs[Boolean]("is_peak")) >= 1,
        "at least one peak hour")
      out
    })

  /** Wald SPRT ([[graft.stats.Experiment.sprt]]) on the finished-order
    * rate (~0.33 in the synthetic data), H₀ 0.25 vs H₁ 0.33 — the oracle replays the count pass, the
    * ln-parity LLR (operand-for-operand, since 1−0.4 and the literal
    * 0.6 are DIFFERENT doubles), the Wald bounds, and the decision
    * CASE on the rounded values. */
  val evSprt: Q = Q(
    "ev_sprt",
    Some("""
      WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS a
        FROM orders WHERE o_orderstatus IS NOT NULL),
      f AS (
        SELECT n, a,
          round(a * ln(0.33 / 0.25)
            + (n - a) * ln((1.0 - 0.33) / (1.0 - 0.25)), 6) + 0.0 AS llr,
          round(ln(0.2 / (1.0 - 0.05)), 6) + 0.0 AS lo,
          round(ln((1.0 - 0.2) / 0.05), 6) + 0.0 AS up
        FROM m)
      SELECT n, a AS n_pos, llr, lo AS lower_bound, up AS upper_bound,
        CASE WHEN llr >= up THEN 'accept_h1'
             WHEN llr <= lo THEN 'accept_h0'
             ELSE 'continue' END AS decision
      FROM f"""),
    (s, dir) => {
      val out = graft.stats.Experiment.sprt(
        Tables.load(s, dir, "orders").filter(col("o_orderstatus").isNotNull),
        col("o_orderstatus") === "F", p0 = 0.25, p1 = 0.33)
      val r = out.head()
      require(r.getAs[String]("decision") == "accept_h1",
        s"the ~0.33 finished rate at n~15k must decide for H1: $r")
      out
    })

  /** Weekly user turnover ([[graft.ops.EventAnalytics.userTurnover]]) —
    * the oracle replays the distinct (user, week) set and the shifted
    * full-outer accounting; the in-gate assert pins the identity
    * active = new + retained. */
  val evTurnover: Q = Q(
    "ev_user_turnover",
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id AS u,
          CAST(floor((epoch_us(ts) // 86400000000) / 7.0) AS BIGINT) AS w
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      mx AS (SELECT MAX(w) AS mw FROM uw),
      j AS (
        SELECT COALESCE(c.w, p.w + 1) AS w,
          (c.u IS NOT NULL) AS cur, (p.u IS NOT NULL) AS prv
        FROM uw c FULL OUTER JOIN uw p
          ON c.u = p.u AND c.w = p.w + 1)
      SELECT CAST(w AS BIGINT) AS period,
        CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        CAST(SUM(CASE WHEN cur AND NOT prv THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(SUM(CASE WHEN cur AND prv THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retained,
        CAST(SUM(CASE WHEN NOT cur AND prv THEN 1 ELSE 0 END) AS BIGINT)
          AS n_churned
      FROM j, mx WHERE w <= mw
      GROUP BY w
      HAVING SUM(CASE WHEN cur THEN 1 ELSE 0 END) > 0
          OR SUM(CASE WHEN NOT cur AND prv THEN 1 ELSE 0 END) > 0
      ORDER BY period"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.userTurnover(
        Tables.load(s, dir, "events"))
      val rows = out.collect()
      require(rows.nonEmpty && rows.forall(r =>
        r.getAs[Long]("n_active") ==
          r.getAs[Long]("n_new") + r.getAs[Long]("n_retained")),
        "active = new + retained must hold every period")
      out
    })

  /** Peak concurrency ([[graft.ops.EventAnalytics.peakConcurrency]])
    * over per-(user, day) activity spans — the oracle replays the
    * sweep with an ordered window over the endpoint list (the Spark
    * side uses the partition-prefix scan instead of a global window). */
  val evPeakConcurrency: Q = Q(
    "ev_peak_concurrency",
    Some("""
      WITH iv AS (
        SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d,
          MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY u, d),
      ends AS (
        SELECT s AS t, 1 AS delta, u, d FROM iv
        UNION ALL SELECT e, -1, u, d FROM iv),
      sw AS (
        SELECT t, SUM(delta) OVER (ORDER BY t, delta DESC, u, d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM ends),
      mx AS (SELECT MAX(cum) AS peak FROM sw),
      frst AS (
        SELECT t FROM sw, mx WHERE cum = peak ORDER BY t LIMIT 1)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM iv) AS n_intervals,
        CAST(mx.peak AS BIGINT) AS peak_concurrency,
        CAST(frst.t AS BIGINT) AS peak_at_us
      FROM mx, frst"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.peakConcurrency(
        Tables.load(s, dir, "events"))
      val r = out.head()
      require(r.getAs[Long]("peak_concurrency") >= 1L &&
        r.getAs[Long]("peak_concurrency") <= r.getAs[Long]("n_intervals"),
        s"peak bounded by interval count: $r")
      out
    })

  /** Ljung–Box portmanteau ([[graft.ops.EventAnalytics.ljungBox]]) over
    * the daily counts at lags 1..7 — the oracle replays the ev_acf_daily
    * recipe and the round-9 decimal cumulative Q sweep. χ² p is
    * library-only (asserted monotone-df-sane in-gate, dropped). */
  val evLjungBox: Q = Q(
    "ev_ljung_box",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx FROM d),
      m AS (SELECT CAST(sx AS DOUBLE) / n AS mu FROM s),
      den AS (
        SELECT CAST(SUM(CAST(round((x - mu) * (x - mu), 6)
          AS DECIMAL(38,12))) AS DOUBLE) AS den
        FROM d, m),
      l AS (SELECT unnest(generate_series(1, 7)) AS lag),
      p AS (
        SELECT l.lag, a.x AS xa, b.x AS xb, m.mu
        FROM l, d a, d b, m WHERE b.day = a.day + l.lag),
      num AS (
        SELECT lag,
          CAST(SUM(CAST(round((xa - mu) * (xb - mu), 6)
            AS DECIMAL(38,12))) AS DOUBLE) AS num
        FROM p GROUP BY lag),
      acf AS (
        SELECT CAST(num.lag AS BIGINT) AS lag,
          round(num.num / den.den, 6) AS acf
        FROM num, den),
      t AS (
        SELECT lag, acf,
          CAST(round(acf * acf / ((SELECT n FROM s) - lag), 9)
            AS DECIMAL(38,12)) AS term
        FROM acf),
      c AS (
        SELECT lag, acf,
          CAST(SUM(term) OVER (ORDER BY lag
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS cum
        FROM t)
      SELECT lag, acf,
        round(CAST((SELECT n FROM s) AS DOUBLE)
          * ((SELECT n FROM s) + 2) * cum, 6) AS q_stat
      FROM c ORDER BY lag"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.ljungBox(
        Tables.load(s, dir, "events"), "ts", maxLag = 7)
      val rows = out.orderBy("lag").collect()
      require(rows.length == 7, s"expected 7 lags, got ${rows.length}")
      rows.sliding(2).foreach { case Array(a, b) =>
        require(b.getAs[Double]("q_stat") >= a.getAs[Double]("q_stat"),
          "Q is a cumulative sum of squares - must be non-decreasing")
        val p = b.getAs[Double]("p_value")
        require(p >= 0.0 && p <= 1.0, s"chi2 p must be a probability: $p")
      }
      out.drop("p_value")
    })

  /** PACF lags 1–3 ([[graft.ops.EventAnalytics.pacfDaily]]) — the
    * oracle replays the acf recipe then the unrolled Durbin–Levinson
    * scalar chain as CTEs. */
  val evPacf: Q = Q(
    "ev_pacf",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx FROM d),
      m AS (SELECT CAST(sx AS DOUBLE) / n AS mu FROM s),
      den AS (
        SELECT CAST(SUM(CAST(round((x - mu) * (x - mu), 6)
          AS DECIMAL(38,12))) AS DOUBLE) AS den
        FROM d, m),
      l AS (SELECT unnest(generate_series(1, 3)) AS lag),
      p AS (
        SELECT l.lag, a.x AS xa, b.x AS xb, m.mu
        FROM l, d a, d b, m WHERE b.day = a.day + l.lag),
      num AS (
        SELECT lag,
          CAST(SUM(CAST(round((xa - mu) * (xb - mu), 6)
            AS DECIMAL(38,12))) AS DOUBLE) AS num
        FROM p GROUP BY lag),
      acf AS (
        SELECT CAST(num.lag AS BIGINT) AS lag,
          round(num.num / den.den, 6) AS acf
        FROM num, den),
      rr AS (SELECT
          MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
          MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
          MAX(CASE WHEN lag = 3 THEN acf END) AS r3
        FROM acf),
      p1 AS (SELECT r1, r2, r3, r1 AS phi11, 1.0 - r1 * r1 AS v1
        FROM rr),
      p2 AS (SELECT r1, r2, r3, phi11, v1,
          (r2 - phi11 * r1) / v1 AS phi22 FROM p1),
      p3 AS (SELECT r1, r2, r3, phi11, v1, phi22,
          phi11 - phi22 * phi11 AS phi21,
          v1 * (1.0 - phi22 * phi22) AS v2 FROM p2),
      p4 AS (SELECT r1, r2, r3, phi11, phi22,
          (r3 - phi21 * r2 - phi22 * r1) / v2 AS phi33 FROM p3)
      SELECT CAST(1 AS BIGINT) AS lag, r1 AS acf,
        round(phi11, 6) + 0.0 AS pacf FROM p4
      UNION ALL SELECT CAST(2 AS BIGINT), r2, round(phi22, 6) + 0.0
        FROM p4
      UNION ALL SELECT CAST(3 AS BIGINT), r3, round(phi33, 6) + 0.0
        FROM p4
      ORDER BY lag"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.pacfDaily(
        Tables.load(s, dir, "events"), "ts")
      val rows = out.orderBy("lag").collect()
      require(rows.length == 3 &&
        rows(0).getAs[Double]("pacf") == rows(0).getAs[Double]("acf"),
        "PACF at lag 1 IS the lag-1 autocorrelation")
      out
    })

  /** Dickey–Fuller unit-root screen
    * ([[graft.ops.EventAnalytics.dickeyFuller]]) on the daily counts —
    * the oracle replays the consecutive-day pair moments and the τ_μ
    * OLS arithmetic; the verdict compares the rounded τ against the
    * inlined −2.86 large-n 5% critical value on both sides. */
  val evUnitRoot: Q = Q(
    "ev_unit_root",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      pr AS (
        SELECT a.x AS u, b.x - a.x AS v
        FROM d a, d b WHERE b.day = a.day + 1),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(u) AS DOUBLE) AS su, CAST(SUM(v) AS DOUBLE) AS sv,
          CAST(SUM(u * v) AS DOUBLE) AS suv,
          CAST(SUM(u * u) AS DOUBLE) AS suu,
          CAST(SUM(v * v) AS DOUBLE) AS svv
        FROM pr),
      f AS (
        SELECT m, suu - su * su / m AS sxx, suv - su * sv / m AS sxy,
          svv - sv * sv / m AS syy
        FROM m),
      g AS (
        SELECT m, sxy / sxx AS beta, sxx,
          syy - (sxy / sxx) * sxy AS sse
        FROM f)
      SELECT m AS n_pairs, round(beta, 6) + 0.0 AS beta,
        round(beta / sqrt((sse / (m - 2)) / sxx), 6) + 0.0 AS t_stat,
        round(beta / sqrt((sse / (m - 2)) / sxx), 6) + 0.0 < -2.86
          AS stationary_5pct
      FROM g"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.dickeyFuller(
        Tables.load(s, dir, "events"), "ts")
      val r = out.head()
      require(r.getAs[Double]("beta") <= 0.0,
        s"mean reversion pulls beta non-positive on a level series: $r")
      out
    })

  /** Sample entropy ([[graft.ops.EventAnalytics.sampleEntropy]]) of the
    * daily counts at m=2, r=0.2·sd — the oracle replays the consecutive
    * triple templates, the integer Chebyshev pair counts against the
    * round-9-pinned tolerance, and −ln(A/B). */
  val evSampleEntropy: Q = Q(
    "ev_sample_entropy",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS BIGINT) AS s1,
        CAST(SUM(x * x) AS DOUBLE) AS s2 FROM d),
      r AS (SELECT n, round(0.2 * sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n)
          / (n - 1)), 9) AS r
        FROM mom),
      t AS (
        SELECT a.day AS day, a.x AS x0, b.x AS x1, c.x AS x2
        FROM d a, d b, d c
        WHERE b.day = a.day + 1 AND c.day = a.day + 2),
      p AS (
        SELECT GREATEST(abs(i.x0 - j.x0), abs(i.x1 - j.x1)) AS d2m,
          GREATEST(abs(i.x0 - j.x0), abs(i.x1 - j.x1),
            abs(i.x2 - j.x2)) AS d3m
        FROM t i, t j WHERE i.day < j.day),
      cnt AS (
        SELECT
          CAST(SUM(CASE WHEN d2m <= r.r THEN 1 ELSE 0 END) AS BIGINT)
            AS b,
          CAST(SUM(CASE WHEN d3m <= r.r THEN 1 ELSE 0 END) AS BIGINT)
            AS a
        FROM p, r),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_templates FROM t)
      SELECT r.n AS n_days, nt.n_templates, r.r AS r_tol,
        cnt.b AS b_pairs, cnt.a AS a_pairs,
        round(-ln(CAST(cnt.a AS DOUBLE) / cnt.b), 6) + 0.0 AS sampen
      FROM r, cnt, nt"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.sampleEntropy(
        Tables.load(s, dir, "events"), "ts")
      val r = out.head()
      require(r.getAs[Long]("a_pairs") <= r.getAs[Long]("b_pairs") &&
        r.getAs[Double]("sampen") >= 0.0,
        s"length-3 matches are a subset of length-2 matches: $r")
      out
    })

  /** Hurst exponent by R/S ([[graft.ops.EventAnalytics.hurstRS]]) over
    * calendar blocks of 8/16/32 days — the oracle replays the complete-
    * block moments, the block-partitioned cumulative-deviation window,
    * the round-9 per-block R/S fold, and the round-12 log-log OLS. */
  val evHurst: Q = Q(
    "ev_hurst_rs",
    Some("""
      WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      dm AS (SELECT MIN(day) AS dmin FROM d),
      bs AS (SELECT unnest([8, 16, 32]) AS b),
      blk AS (
        SELECT bs.b, CAST(floor((d.day - dm.dmin) / bs.b) AS BIGINT)
          AS blk, d.day, d.x
        FROM d, dm, bs),
      mom AS (
        SELECT b, blk, COUNT(*) AS nb, CAST(SUM(x) AS BIGINT) AS bs1,
          CAST(SUM(x * x) AS DOUBLE) AS bs2
        FROM blk GROUP BY b, blk),
      ok AS (
        SELECT b, blk, CAST(bs1 AS DOUBLE) / b AS mu,
          sqrt((bs2 - CAST(bs1 AS DOUBLE) * bs1 / b) / b) AS s
        FROM mom
        WHERE nb = b AND sqrt((bs2 - CAST(bs1 AS DOUBLE) * bs1 / b) / b) > 0),
      z AS (
        SELECT blk.b, blk.blk, ok.s,
          SUM(CAST(blk.x AS DOUBLE) - ok.mu) OVER (
            PARTITION BY blk.b, blk.blk ORDER BY blk.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
        FROM blk JOIN ok ON blk.b = ok.b AND blk.blk = ok.blk),
      rs AS (
        SELECT b, blk, (MAX(z) - MIN(z)) / MAX(s) AS rs
        FROM z GROUP BY b, blk),
      perb AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n_blocks,
          CAST(SUM(CAST(round(rs, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS srs
        FROM rs GROUP BY b),
      pts AS (
        SELECT b, n_blocks, srs / n_blocks AS mrs,
          ln(CAST(b AS DOUBLE)) AS lx, ln(srs / n_blocks) AS ly
        FROM perb WHERE n_blocks > 0),
      fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(CAST(round(lx, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sx,
          CAST(SUM(CAST(round(ly, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sy
        FROM pts),
      fit2 AS (SELECT k, sx / k AS mx, sy / k AS my FROM fit),
      h AS (
        SELECT
          CAST(SUM(CAST(round((lx - mx) * (ly - my), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS num,
          CAST(SUM(CAST(round((lx - mx) * (lx - mx), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS den
        FROM pts, fit2)
      SELECT CAST(b AS BIGINT) AS block_days, n_blocks,
        round(mrs, 6) + 0.0 AS mean_rs,
        round(num / den, 6) + 0.0 AS h_exponent
      FROM pts, h ORDER BY block_days"""),
    (s, dir) => {
      val out = graft.ops.EventAnalytics.hurstRS(
        Tables.load(s, dir, "events"), "ts")
      val rows = out.collect()
      require(rows.nonEmpty && rows.forall(_.getAs[Double]("mean_rs") > 0),
        "rescaled ranges are positive by construction")
      val h = rows.head.getAs[Double]("h_exponent")
      require(h > 0.0 && h < 1.5, s"H outside any plausible range: $h")
      out
    })

  override def queries: Seq[Q] =
    Seq(evLjungBox, evUnitRoot, evSampleEntropy, evHurst,
      evTurnover, evPeakConcurrency, evSprt, evPacf, evHourly,
      evPowerMde, evRateRatio, evOhlc, evRfm, evMaxDrawdown,
      evAttributionLinear, evLtv, evDispersion, evCohensH, evEbShrinkage,
      evInterEvent, evSrm, evPeaks, evFunnelTiming, evForecastBacktest,
      evQte, evWeekday, evMannKendall, evGumbel, evMarkovEntropy,
      evWindowed, evSessionize, evAsOf, evAsOfForward, evAsOfTolerance,
      evJson, evPartitionedPrune, evLiveCount, evProfile, evAnomaly,
      evResample, evTrend, evFunnel, evRetention, evRolling, evScd2,
      evRangeJoin, evOverlapJoin, evCorrelate, evImpute, evPaths, evActive,
      evCuped, evKaplanMeier, evKmGreenwood, evLogRank, evSurvivalSummary,
      evCusum, evPageHinkley, evExponentiality,
      evMarkovTransitions, evMarkovStationary, evAttributionLast,
      evAttributionFirst, evSeasonal, evSeasonalStrength, evEwma,
      evSegmented, evProportionTest,
      evItemsetPairs, evAcf, evDid, evSequencePairs, evBrownLinear)
}
