package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key online anomaly detection: flag an event when its value deviates
  * more than `z` standard deviations from that key's OWN history (mean and
  * sample variance of all PRIOR events), once at least `minPrior`
  * observations exist. The classic per-entity drift/outlier monitor a
  * training-data ingest pipeline runs on its event feeds.
  *
  * Engine-parity design: values are quantized to integer cents
  * (round(value·100)) before aggregation, so the running count/sum/sum-of-
  * squares are EXACT integers in doubles (≤ 2^53) — summation order
  * (Spark's sequential running frame, an oracle's segment tree, the
  * streaming fold) cannot change them, and every downstream double op is
  * the same IEEE sequence on the same inputs in every engine. The z-score
  * itself is scale-invariant, so flags on cents equal flags on raw values
  * up to the quantization. The comparison is kept in squared form
  * ((v−m)² > z²·s²) — no sqrt, one fewer op to mirror.
  *
  * Scale shape (batch): one shuffle on the key; rank/mean/variance all ride
  * a single running frame over the same Exchange. Streaming: state is three
  * doubles per key — [[flagsStream]] holds (n, Σc, Σc²) in
  * `flatMapGroupsWithState` and emits per-event flags incrementally;
  * identical arithmetic to the batch path, so stream == batch on in-order
  * feeds (spec-pinned). State eviction: pass an idle timeout to drop keys
  * not seen for that long (unbounded key spaces); NoTimeout keeps all.
  */
object Anomaly {

  final case class Flag(
      event_id: Long, user_id: Long, n_prior: Long, is_anomaly: Boolean)

  /** Internal row shape for the streaming fold (public: Dataset encoders
    * generate bytecode outside this object and cannot see private types). */
  final case class Obs(event_id: Long, user_id: Long, ts_us: Long, c: Double)

  /** Σ-state per key; exact while counts of cents² stay under 2^53. */
  final case class MomState(n: Long, sm: Double, sq: Double)

  private def cents(value: Column): Column = round(value * 100)

  /** Shared flag arithmetic: prior (n, Σc, Σc²) + this event's cents. */
  private def decide(
      z: Double, minPrior: Int,
      n: Long, sm: Double, sq: Double, c: Double): Boolean = {
    if (n < minPrior) false
    else {
      val m = sm / n
      val v = (sq - sm * sm / n) / (n - 1)
      v > 0 && (c - m) * (c - m) > z * z * v
    }
  }

  /** Batch: (event_id, user_id, n_prior, is_anomaly), one per input event,
    * ordered by event_id. History = prior events by (ts, event_id). */
  def flags(
      events: DataFrame, z: Double = 3.0, minPrior: Int = 5): DataFrame = {
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = cents(col("value"))
    val n = count(c).over(prior)
    val sm = sum(c).over(prior)
    val sq = sum(c * c).over(prior)
    // `when` guards keep ANSI mode from throwing DIVIDE_BY_ZERO on the
    // first (n=0) and second (n=1) event per key; the flag's n_prior ≥
    // minPrior conjunct makes the resulting nulls unreachable anyway.
    val m = when(n >= 1, sm / n)
    val v = when(n >= 2, (sq - sm * sm / n) / (n - lit(1)))
    events
      .select(col("event_id"), col("user_id"), c.as("__c"),
        n.as("n_prior"), m.as("__m"), v.as("__v"))
      .withColumn("is_anomaly",
        col("n_prior") >= minPrior && col("__v") > 0 &&
          (col("__c") - col("__m")) * (col("__c") - col("__m")) >
            lit(z * z) * col("__v"))
      .select("event_id", "user_id", "n_prior", "is_anomaly")
      .orderBy("event_id")
  }

  /** Streaming twin: per-key (n, Σc, Σc²) state folded event-by-event in
    * (ts, event_id) order within each micro-batch; emits one [[Flag]] per
    * event as it arrives (append mode). Matches [[flags]] exactly when
    * each key's events arrive in order across micro-batches — late
    * cross-batch arrivals see the state as of processing time, the
    * standard online-monitor semantics. `idleTimeout` (e.g. "1 hour")
    * evicts state for keys with no traffic, bounding memory over unbounded
    * key spaces; null/empty keeps state forever. */
  def flagsStream(
      events: DataFrame, z: Double = 3.0, minPrior: Int = 5,
      idleTimeout: String = ""): Dataset[Flag] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (idleTimeout == null || idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("c"))
      .as[Obs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, it: Iterator[Obs], state: GroupState[MomState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(MomState(0L, 0.0, 0.0))
            val out = it.toArray.sortBy(o => (o.ts_us, o.event_id)).map { o =>
              val f = Flag(o.event_id, o.user_id, s.n,
                decide(z, minPrior, s.n, s.sm, s.sq, o.c))
              s = MomState(s.n + 1, s.sm + o.c, s.sq + o.c * o.c)
              f
            }
            state.update(s)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}
