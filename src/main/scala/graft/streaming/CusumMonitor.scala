package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.UnscaledRound12

/** Streaming twin of [[graft.ops.EventAnalytics.cusumWithStats]]: fold
  * each key's per-period values through Page's CUSUM against FROZEN
  * reference stats, emitting (s_pos, s_neg, flag) per period as it
  * arrives — the monitor a training-data ingest pipeline runs on its
  * per-source volume/quality series between full recomputes.
  *
  * Arithmetic parity with the batch path is EXACT, not approximate: the
  * per-period increment is the same `(x − mu) − sigma·k` double sequence,
  * [[UnscaledRound12]] replays the batch round(·,12)::decimal cast, and
  * state holds UNSCALED LONGS (prefix sum and running min per leg) whose
  * addition is the batch decimal fold — so stream output == batch output
  * row-for-row on in-order feeds (spec-pinned). Late cross-batch
  * arrivals fold in processing order, the standard online-monitor
  * semantics.
  *
  * The monitored key set is driver-bounded by contract (the stats map
  * broadcasts with the closure); a web-scale key space belongs on the
  * batch path. Events for keys absent from `stats` are dropped —
  * unmonitorable, as are zero/negative-sigma keys (reject them when
  * building the map; the batch path nulls them instead). `idleTimeout`
  * (e.g. "1 hour") evicts state for silent keys; empty keeps all.
  */
object CusumMonitor {

  final case class Point(key: String, period: Long, value: Double)

  final case class CusumFlag(key: String, period: Long, value: Double,
      s_pos: Double, s_neg: Double, flag: Boolean)

  /** Per-leg unscaled-long prefix state: running sum P and min(0, min P). */
  final case class LegState(p: Long, minP: Long)

  final case class MonState(pos: LegState, neg: LegState)

  /** One leg step, exactly the batch window algebra on unscaled longs. */
  private def step(s: LegState, incU: Long): (LegState, Long) = {
    val p = Math.addExact(s.p, incU)
    val m = math.min(s.minP, math.min(0L, p))
    (LegState(p, m), p - m)
  }

  /** The batch `round(decimal.cast(double), 6)` tail on an unscaled long. */
  private def r6OfUnscaled(u: Long): Double =
    java.math.BigDecimal.valueOf(
        new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 12)
          .doubleValue())
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `stats`: key → (mu, sigma), sigma > 0 required. Input `events` must
    * carry (key string, period long, value numeric). */
  def monitorStream(events: DataFrame,
      stats: Map[String, (Double, Double)], kSigma: Double = 0.5,
      hSigma: Double = 5.0, idleTimeout: String = ""): Dataset[CusumFlag] = {
    stats.foreach { case (k, (_, sigma)) =>
      require(sigma > 0, s"key '$k' has non-positive sigma $sigma — " +
        "zero-variance references cannot be monitored")
    }
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (idleTimeout == null || idleTimeout.isEmpty)
        GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    val thresholds: Map[String, Double] = stats.map { case (k, (_, sigma)) =>
      k -> java.math.BigDecimal.valueOf(sigma * hSigma)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    events
      .select(col("key").cast("string").as("key"),
        col("period").cast("long").as("period"),
        col("value").cast("double").as("value"))
      .as[Point]
      .filter((p: Point) => stats.contains(p.key))
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: String, it: Iterator[Point], state: GroupState[MonState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (mu, sigma) = stats(key)
            val h = thresholds(key)
            var s = state.getOption.getOrElse(
              MonState(LegState(0L, 0L), LegState(0L, 0L)))
            val out = it.toArray.sortBy(_.period).map { p =>
              // the batch double sequence: (x - mu) - sigma*kSigma
              val posInc = UnscaledRound12.unscaled(
                p.value - mu - sigma * kSigma)
              val negInc = UnscaledRound12.unscaled(
                mu - sigma * kSigma - p.value)
              val (np, dPos) = step(s.pos, posInc)
              val (nn, dNeg) = step(s.neg, negInc)
              s = MonState(np, nn)
              val sPos = r6OfUnscaled(dPos)
              val sNeg = r6OfUnscaled(dNeg)
              CusumFlag(key, p.period, p.value, sPos, sNeg,
                math.max(sPos, sNeg) > h)
            }
            state.update(s)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}
