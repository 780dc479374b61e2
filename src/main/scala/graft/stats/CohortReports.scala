package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

import graft.core.MergeKeys

/** T5 final data summary + T6 demographics breakdown
  * (reference: analysis/demographics.py:21–252).
  *
  * T6 runs four queries over the same filtered plan in the reference; here
  * the caller passes one (cached) cohort DataFrame and we derive all
  * metrics from as few aggregates as possible.
  */
object CohortReports {

  /** T6: participant count, age range, per-category distinct counts,
    * available sessions — as a long-format (metric, value) frame, ordered
    * by metric for determinism. */
  def breakdown(
      cohort: DataFrame,
      keys: MergeKeys,
      ageCol: Option[String],
      categoryCol: Option[String]): Seq[(String, Double)] = {

    val aggs = Seq(countDistinct(col(keys.mergeColumn)).as("n_participants")) ++
      ageCol.toSeq.flatMap(a => Seq(
        min(col(a)).cast("double").as("age_min"),
        max(col(a)).cast("double").as("age_max")))
    val row = cohort.agg(aggs.head, aggs.tail: _*).head()
    val base = Seq("n_participants" -> row.getAs[Long]("n_participants").toDouble) ++
      ageCol.toSeq.flatMap { _ =>
        Seq(
          Option(row.getAs[Any]("age_min")).map(v => "age_min" -> v.asInstanceOf[Number].doubleValue()),
          Option(row.getAs[Any]("age_max")).map(v => "age_max" -> v.asInstanceOf[Number].doubleValue())
        ).flatten
      }

    val perCategory = categoryCol.toSeq.flatMap { c =>
      cohort.filter(col(c).isNotNull)
        .groupBy(col(c).cast(StringType).as("k"))
        .agg(countDistinct(col(keys.mergeColumn)).as("n"))
        .collect()
        .map(r => s"${c}_${r.getString(0)}" -> r.getAs[Long]("n").toDouble)
    }
    (base ++ perCategory).sortBy(_._1)
  }

  def breakdownDF(spark: SparkSession, metrics: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    metrics.toDF("metric", "value")
  }

  /** T5: one-row-per-column final summary — numeric columns get
    * mean/median/std/min/max, categorical get distinct count and top value
    * (demographics.py:135–252). One stats pass for numerics, one top-k scan
    * per categorical (bounded by the reference's own display caps). */
  final case class ColumnSummary(
      column: String, dtype: String, n: Long,
      mean: Option[Double], median: Option[Double], std: Option[Double],
      min: Option[Double], max: Option[Double],
      distinct: Option[Long], topValue: Option[String], topCount: Option[Long])

  def finalSummary(df: DataFrame, keys: MergeKeys): Seq[ColumnSummary] = {
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !keys.idColumns(f.name) => f.name
    }.toSeq
    val categorical = df.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[NumericType] && !keys.idColumns(f.name) => f.name
    }.toSeq

    val numStats =
      if (numeric.isEmpty) Map.empty[String, ColumnStats.Stats]
      else ColumnStats.describe(df, numeric).map(s => s.column -> s).toMap

    val numSummaries = numeric.map { c =>
      val s = numStats(c)
      ColumnSummary(c, "numeric", s.n, s.mean, s.median, s.std, s.min, s.max,
        Some(s.distinct), None, None)
    }
    val catSummaries = categorical.map { c =>
      val top = ColumnStats.topValues(df, c, 1).collect().headOption
      val agg = df.agg(
        count(col(c)).as("n"), countDistinct(col(c)).as("d")).head()
      ColumnSummary(c, "categorical", agg.getAs[Long]("n"),
        None, None, None, None, None,
        Some(agg.getAs[Long]("d")),
        top.map(_.getString(0)), top.map(_.getAs[Long]("n")))
    }
    numSummaries ++ catSummaries
  }

  /** A13 per-session sub-summaries (reference query/callbacks/export.py:
    * 426–446): longitudinal final summary repeated per session value. The
    * reference loops `filter(session == s)` per session; here ONE
    * groupBy(session) computes every session's summary in a single
    * shuffle — same numbers, K fewer scans. Decimal-exact means so the
    * result is oracle-hashable. */
  def perSessionSummary(
      df: DataFrame,
      keys: MergeKeys,
      numericCols: Seq[String]): DataFrame = {
    val sess = keys.sessionId.getOrElse(
      throw new IllegalArgumentException("perSessionSummary needs longitudinal keys"))
    val aggs = Seq(
      countDistinct(col(keys.primaryId)).as("n_participants"),
      count(lit(1)).as("n_rows")) ++
      numericCols.flatMap(c => Seq(
        (sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") / count(col(c))).as(s"mean_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c")))
    df.filter(col(sess).isNotNull)
      .groupBy(col(sess).cast(StringType).as("session"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("session")
  }
}
