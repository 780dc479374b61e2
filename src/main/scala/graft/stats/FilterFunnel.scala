package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T7 filter-funnel report + T8 per-filter impact
  * (reference: analysis/filtering.py:23–322, 385–505).
  *
  * The reference re-executes the count query K+1 times with cumulatively
  * growing WHERE clauses. Here each report is ONE scan: a per-key
  * `max(when(cond, 1))` flag per step (a key survives a step iff ANY of its
  * rows does), then one tiny sum over the per-key flags. Both aggregates are
  * hash aggregations with map-side partials — no repeated scans, and no
  * `Expand`: K+1 `countDistinct(when(...))` in one agg would multiply every
  * input row ×(K+1) through an Expand node, which at 100 TB is K extra
  * scans' worth of shuffle. At 100 TB that's the difference between K full
  * passes and one.
  */
object FilterFunnel {

  final case class Step(
      step: Int, label: String, n: Long, removed: Long, removalPct: Double)

  /** Distinct-key count per condition without Expand: groupBy(key) with a
    * 0/1 `max(when(cond,1))` flag per condition, then sum the flags. Null
    * keys are excluded (countDistinct semantics). Returns one Long per
    * condition. */
  private def distinctCounts(base: DataFrame, key: String, conds: Seq[Column]): Seq[Long] = {
    val flags = conds.zipWithIndex.map { case (cond, i) =>
      max(when(cond, 1L).otherwise(0L)).as(s"m__$i")
    }
    val perKey = base.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(flags.head, flags.tail: _*)
    val sums = conds.indices.map(i => sum(col(s"m__$i")).as(s"n__$i"))
    val row = perKey.agg(sums.head, sums.tail: _*).head()
    conds.indices.map(i =>
      Option(row.getAs[Any](s"n__$i")).fold(0L)(_.asInstanceOf[Long]))
  }

  /** Cumulative funnel: step 0 = unfiltered baseline, step i adds the i-th
    * predicate (canonical order is the caller's responsibility —
    * [[graft.query.CohortQuery.orderedFilters]]). */
  def funnel(base: DataFrame, key: String, steps: Seq[(String, Column)]): Seq[Step] = {
    val cumulative: Seq[Column] = steps.scanLeft(lit(true))((acc, s) => acc && s._2)
    val counts = distinctCounts(base, key, cumulative)
    ("baseline" +: steps.map(_._1)).zipWithIndex.map { case (label, i) =>
      val n = counts(i)
      val prev = if (i == 0) n else counts(i - 1)
      val removed = prev - n
      Step(i, label, n, removed,
        if (prev == 0) 0.0 else removed.toDouble / prev * 100.0)
    }
  }

  /** Per-filter impact vs baseline: each predicate applied alone, plus all
    * combined (filtering.py:385–505). */
  def impact(base: DataFrame, key: String, filters: Seq[(String, Column)]): Seq[Step] = {
    val conds = lit(true) +: filters.map(_._2) :+ filters.map(_._2).reduceOption(_ && _).getOrElse(lit(true))
    val counts = distinctCounts(base, key, conds)
    val baseline = counts.head
    val labels = "baseline" +: filters.map(_._1) :+ "all_filters"
    labels.zipWithIndex.map { case (label, i) =>
      val n = counts(i)
      val removed = baseline - n
      Step(i, label, n, removed,
        if (baseline == 0) 0.0 else removed.toDouble / baseline * 100.0)
    }
  }

  def toDF(spark: SparkSession, steps: Seq[Step]): DataFrame = {
    import spark.implicits._
    steps.toDF()
  }
}
