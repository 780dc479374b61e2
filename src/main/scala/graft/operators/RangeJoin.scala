package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop: which interval does
  * each point fall in (events → sessions, readings → maintenance windows,
  * prices → validity periods).
  *
  * Spark plans a bare `p BETWEEN lo AND hi` predicate with no equi-key as
  * BroadcastNestedLoopJoin — quadratic, and a non-starter once neither
  * side broadcasts. This operator makes the join EQUI: points hash to
  * chunk floor(p/chunk); each interval explodes to every chunk it
  * overlaps; the join runs on (keys…, chunk) through the ordinary
  * hash/sort-merge machinery and an exact containment filter keeps the
  * true matches. Each point lives in exactly one chunk and an interval
  * visits each of its chunks once, so no post-join dedup is needed.
  *
  * Cost: shuffle ∝ |points| + |intervals|·(avg span/chunk + 1). Pick
  * `chunk` near the median interval span — smaller chunks replicate
  * intervals further; larger chunks widen each equi-bucket toward the
  * nested loop. Both knobs are visible in the plan (the explode factor is
  * the interval-side row multiplier). Equi-`keys` (e.g. the entity id)
  * ride along in the join condition and bound buckets further.
  */
object RangeJoin {

  /** Inner-join `points` to the intervals containing them:
    * `lo ≤ point ≤ hi` (inclusive bounds), matching on `keys` first when
    * given. Point/lo/hi are numeric (cast timestamps to epoch first). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, chunk: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    val p = points.withColumn("__chunk",
      floor(col(pointCol) / chunk).cast("long"))
    val iv = intervals.withColumn("__chunk",
      explode(sequence(floor(col(loCol) / chunk).cast("long"),
        floor(col(hiCol) / chunk).cast("long"))))
    p.join(iv, (keys :+ "__chunk").toSeq)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__chunk")
  }

  /** Interval-overlap join: pairs (left, right) whose [lo, hi] ranges
    * intersect (inclusive), matching on `keys` first. Same chunking idea
    * as [[pointInInterval]], plus the standard duplicate-free trick: a
    * candidate pair appears once per shared chunk, so the containment
    * filter also requires the JOIN chunk to be the chunk of
    * max(left.lo, right.lo) — the first chunk both intervals inhabit —
    * which keeps exactly one copy of each true pair with no post-join
    * distinct (no wide dedup shuffle).
    *
    * Left/right column names must be disjoint apart from `keys` (alias
    * before calling). */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      chunk: Long, keys: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    def chunked(df: DataFrame, lo: String, hi: String) = df.withColumn(
      "__chunk",
      explode(sequence(floor(col(lo) / chunk).cast("long"),
        floor(col(hi) / chunk).cast("long"))))
    chunked(left, lLo, lHi).join(chunked(right, rLo, rHi),
        (keys :+ "__chunk").toSeq)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__chunk") === floor(greatest(col(lLo), col(rLo)) / chunk)
          .cast("long"))
      .drop("__chunk")
  }
}
