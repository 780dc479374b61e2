package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front — Börzsönyi, Kossmann & Stocker's skyline
  * operator, ICDE 2001, public): the rows not DOMINATED on two
  * maximize-criteria — r dominates s when r.x ≥ s.x ∧ r.y ≥ s.y with at
  * least one strict. The curation read: the quality-vs-length (or
  * freshness-vs-score) frontier of a corpus, the candidates no tradeoff
  * argument can exclude.
  *
  * 2-D structure makes the classic O(n²) dominance test unnecessary: on
  * the x-descending order a row is on the front iff its y exceeds the
  * running y-max of everything before its x (ties in x share the
  * position — a row is never dominated by an equal-x row unless that
  * row also has ≥ y, which the strict running max over LOWER x plus an
  * equal-x group max handles below). The front is therefore one
  * VALUE-LEVEL pass:
  *
  *  1. collapse to distinct x with the group's max y (only a group's
  *     max-y rows can survive; this is distinct-x-sized, not row-sized),
  *  2. running strict-predecessor max over x descending via the
  *     partition-offset prefix pass (no unpartitioned window),
  *  3. keep x-groups whose max y beats every higher-x group's y; join
  *     back to keep EVERY row attaining (x, front y) — co-optimal
  *     duplicates all belong to the front.
  *
  * Nulls in either criterion never reach the front (incomparable).
  * Returns the input rows of the front plus nothing else. */
object Skyline {

  def paretoFront2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // NaN is incomparable, so it is excluded like null: Spark's max()
    // treats NaN as the largest double, so one NaN y would become its
    // group's ymax and then poison the driver-side running max
    // (math.max(m, NaN) = NaN), silently dropping every legitimate
    // front row at lower x
    val base = df.filter(x.isNotNull && y.isNotNull &&
      !isnan(x) && !isnan(y))
    val groups = base.groupBy(x.as("__x")).agg(max(y).as("__ymax"))
      .as[(Double, Double)].rdd
      .sortBy(-_._1) // x descending
      .persist()
    try {
      val partMax = groups.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(Double.NegativeInfinity)(
          (m, p) => math.max(m, p._2))))
      }.collect().sortBy(_._1).map(_._2)
      val prefix = partMax.scanLeft(Double.NegativeInfinity)(math.max)
      val bPre = spark.sparkContext.broadcast(prefix)
      val front = groups.mapPartitionsWithIndex { (i, it) =>
        var best = bPre.value(i) // max y over all STRICTLY higher x
        it.flatMap { case (gx, gy) =>
          val keep = gy > best
          best = math.max(best, gy)
          if (keep) Iterator((gx, gy)) else Iterator.empty
        }
      }.toDF("__fx", "__fy")
      // the front is distinct-x-bounded and usually tiny; AQE picks the
      // broadcast side on its own (a pathological ascending corpus can
      // put every row on the front, so never FORCE the broadcast)
      base.join(front, x === col("__fx") && y === col("__fy"))
        .drop("__fx", "__fy")
    } finally groups.unpersist(blocking = false)
  }
}
