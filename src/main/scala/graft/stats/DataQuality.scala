package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

import graft.core.MergeKeys

/** T3 data-quality report (reference: analysis/statistics.py:263–406):
  * missing-data severities, duplicate IDs / duplicate full rows, IQR
  * outlier columns, and mixed numeric/text detection via cast-failure
  * deltas — each category one aggregate/scan, never per-column jobs.
  */
object DataQuality {

  final case class MissingIssue(column: String, missingCount: Long, missingPct: Double, severity: String)
  final case class OutlierIssue(column: String, outlierCount: Long, outlierPct: Double, severity: String)
  final case class MixedTypeIssue(column: String, failedConversions: Long)
  final case class Report(
      missing: Seq[MissingIssue],
      primaryIdDuplicates: Long,
      duplicateRows: Long,
      outliers: Seq[OutlierIssue],
      mixedTypes: Seq[MixedTypeIssue]) {
    def totalIssues: Int = missing.size + outliers.size + mixedTypes.size +
      (if (primaryIdDuplicates > 0) 1 else 0) + (if (duplicateRows > 0) 1 else 0)
  }

  /** Reference severity tiers (statistics.py:300, 355). */
  private def missingSeverity(pct: Double): String =
    if (pct > 50) "high" else if (pct > 20) "medium" else "low"
  private def outlierSeverity(pct: Double): String =
    if (pct > 10) "high" else if (pct > 5) "medium" else "low"

  def report(df: DataFrame, keys: MergeKeys): Report = {
    val cols = df.columns.toSeq

    // Missing data: one pass for all columns.
    val missAggs = count(lit(1)).as("__rows") +: cols.map(c => count(col(c)).as(s"n__$c"))
    val mrow = df.agg(missAggs.head, missAggs.tail: _*).head()
    val rows = mrow.getAs[Long]("__rows")
    val missing = cols.flatMap { c =>
      val miss = rows - mrow.getAs[Long](s"n__$c")
      val pct = if (rows == 0) 0.0 else miss.toDouble / rows * 100
      if (miss > 0) Some(MissingIssue(c, miss, pct, missingSeverity(pct))) else None
    }

    // Duplicate keys: count of rows beyond the first per key (pandas
    // `.duplicated().sum()` semantics).
    val keyCol = keys.mergeColumn
    val dupIds =
      if (!cols.contains(keyCol)) 0L
      else df.groupBy(col(keyCol)).count()
        .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)

    val dupRows = rows - df.dropDuplicates().count()

    // IQR outliers over numeric non-ID columns (needs >10 non-null values).
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !keys.idColumns(f.name) => f.name
    }.toSeq
    val outliers =
      if (numericCols.isEmpty) Seq.empty
      else ColumnStats.describe(df, numericCols).flatMap { s =>
        s.iqrOutliers match {
          case Some(o) if o > 0 && s.n > 10 =>
            val pct = o.toDouble / s.n * 100
            Some(OutlierIssue(s.column, o, pct, outlierSeverity(pct)))
          case _ => None
        }
      }

    // Mixed numeric/text: string columns where try_cast-to-double fails for
    // some but fewer than 90% of non-null values (statistics.py:370–390).
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType && !keys.idColumns(f.name) => f.name
    }.toSeq
    val mixed =
      if (stringCols.isEmpty) Seq.empty
      else {
        val aggs = stringCols.flatMap(c => Seq(
          count(col(c)).as(s"n__$c"),
          count(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"ok__$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        stringCols.flatMap { c =>
          val n = row.getAs[Long](s"n__$c")
          val failed = n - row.getAs[Long](s"ok__$c")
          if (n > 0 && failed > 0 && failed.toDouble / n * 100 < 90)
            Some(MixedTypeIssue(c, failed))
          else None
        }
      }

    Report(missing, dupIds, dupRows, outliers, mixed)
  }
}
