package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.AsOfJoin
import graft.streaming.StreamingOps
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

  /** JSON property extraction from the events `props` column. */
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

  override def queries: Seq[Q] = Seq(evWindowed, evSessionize, evAsOf, evJson)
}
