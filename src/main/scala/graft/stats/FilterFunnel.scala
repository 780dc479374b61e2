package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T7 filter-funnel report + T8 per-filter impact
  * (reference: analysis/filtering.py:23–322, 385–505).
  *
  * The reference re-executes the count query K+1 times with cumulatively
  * growing WHERE clauses. Here each report is ONE aggregate over one scan:
  * `COUNT(DISTINCT CASE WHEN <filters so far> THEN key END)` per step —
  * map-side combinable, no repeated scans. At 100 TB that's the difference
  * between K full passes and one.
  */
object FilterFunnel {

  final case class Step(
      step: Int, label: String, n: Long, removed: Long, removalPct: Double)

  /** Cumulative funnel: step 0 = unfiltered baseline, step i adds the i-th
    * predicate (canonical order is the caller's responsibility —
    * [[graft.query.CohortQuery.orderedFilters]]). */
  def funnel(base: DataFrame, key: String, steps: Seq[(String, Column)]): Seq[Step] = {
    val cumulative: Seq[Column] = steps.scanLeft(lit(true))((acc, s) => acc && s._2)
    val aggs = cumulative.zipWithIndex.map { case (cond, i) =>
      countDistinct(when(cond, col(key))).as(s"n__$i")
    }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val counts = cumulative.indices.map(i => row.getAs[Long](s"n__$i"))
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
    val aggs = conds.zipWithIndex.map { case (cond, i) =>
      countDistinct(when(cond, col(key))).as(s"n__$i")
    }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val baseline = row.getAs[Long]("n__0")
    val labels = "baseline" +: filters.map(_._1) :+ "all_filters"
    labels.zipWithIndex.map { case (label, i) =>
      val n = row.getAs[Long](s"n__$i")
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
