package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA control chart (Roberts 1959 — public; the smoother
  * companion to [[CusumMonitor]]'s jump detector): per key, fold each
  * period's value through the TRUE recursion
  * s_t = α·x_t + (1−α)·s_{t−1} (the batch
  * [[graft.ops.EventAnalytics.ewmaDailyCounts]] is the horizon-
  * truncated adjusted form — streaming state is exactly where the
  * untruncated recursion is the natural fit), flagging periods where
  * |x_t − s_{t−1}| exceeds `hSigma`·sigma against FROZEN per-key
  * reference sigmas — deviation is measured against the smoothed level
  * BEFORE folding the point in, so a level shift flags on arrival
  * instead of being absorbed first.
  *
  * Determinism: state carries the smoothed level as an exact
  * MICRO-UNIT long (round(s·10⁶)); each fold recomputes
  * s' = round₆(α·x + (1−α)·s) through BigDecimal HALF_UP, so a retried
  * micro-batch replays to the identical state and the emitted levels
  * are 6-decimal engine-stable doubles. In-order feeds reproduce the
  * same sequence a driver-side fold computes (spec-pinned); late
  * cross-batch arrivals fold in processing order — online-monitor
  * semantics, as [[CusumMonitor]].
  *
  * The monitored key set is driver-bounded by contract (sigmas ride the
  * closure); keys absent from `stats` are unmonitorable and dropped;
  * `idleTimeout` evicts silent keys' state. */
object EwmaMonitor {

  final case class Point(key: String, period: Long, value: Double)

  final case class EwmaFlag(key: String, period: Long, value: Double,
      level: Double, deviation: Double, flag: Boolean)

  /** Micro-unit fold: s' = round₆(α·x + (1−α)·s). */
  private[graft] def fold(alpha: Double, sMicro: Long, x: Double): Long =
    java.math.BigDecimal.valueOf(
        alpha * x + (1.0 - alpha) * (sMicro / 1e6))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** `stats`: key → sigma (> 0). Input `events` must carry
    * (key string, period long, value numeric). The first point of a key
    * initializes the level (no flag — there is no prior level to
    * deviate from). */
  def monitorStream(events: DataFrame, stats: Map[String, Double],
      alpha: Double = 0.3, hSigma: Double = 4.0,
      idleTimeout: String = ""): Dataset[EwmaFlag] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    stats.foreach { case (k, sigma) =>
      require(sigma > 0, s"key '$k' has non-positive sigma $sigma")
    }
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (idleTimeout == null || idleTimeout.isEmpty)
        GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    events
      .select(col("key").cast("string").as("key"),
        col("period").cast("long").as("period"),
        col("value").cast("double").as("value"))
      .as[Point]
      .filter((p: Point) => stats.contains(p.key))
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: String, it: Iterator[Point], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sigma = stats(key)
            val threshold = hSigma * sigma
            var hasLevel = state.exists
            var sMicro = state.getOption.getOrElse(0L)
            val out = it.toArray.sortBy(_.period).map { p =>
              if (!hasLevel) {
                sMicro = java.math.BigDecimal.valueOf(p.value)
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .unscaledValue().longValueExact()
                hasLevel = true
                EwmaFlag(key, p.period, p.value, sMicro / 1e6, 0.0,
                  flag = false)
              } else {
                val prior = sMicro / 1e6
                val dev = p.value - prior
                sMicro = fold(alpha, sMicro, p.value)
                EwmaFlag(key, p.period, p.value, sMicro / 1e6, dev,
                  math.abs(dev) > threshold)
              }
            }
            state.update(sMicro)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}
