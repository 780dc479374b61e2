package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.MergeKeys

/** Export preparation (reference: analysis/export.py:285–398 + A9/A12):
  * all-null column pruning, sparse-column warnings (>95% missing),
  * duplicate-key detection, and the final sort by primary ID — all driven by
  * ONE aggregate pass for the null statistics.
  */
object ExportPrep {

  final case class Report(
      rowCount: Long,
      droppedAllNull: Seq[String],
      /** column -> missing fraction, for columns >95% missing (but not all-null). */
      sparseColumns: Map[String, Double],
      duplicateKeyRows: Long)

  val SparseThreshold = 0.95

  def prepare(df: DataFrame, keys: MergeKeys, sort: Boolean = true): (DataFrame, Report) = {
    val cols = df.columns.toSeq
    // One pass: total rows + per-column non-null counts.
    val aggs = count(lit(1)).as("__total") +:
      cols.map(c => count(col(c)).as(s"__nn__$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")

    val missing: Map[String, Double] = cols.map { c =>
      val nn = row.getAs[Long](s"__nn__$c")
      c -> (if (total == 0) 0.0 else (total - nn).toDouble / total)
    }.toMap
    val allNull = cols.filter(c => total > 0 && missing(c) == 1.0)
    val sparse = missing.filter { case (c, frac) =>
      frac > SparseThreshold && frac < 1.0 && !keys.idColumns(c)
    }

    val mergeCol = keys.mergeColumn
    val dupRows =
      if (!df.columns.contains(mergeCol)) 0L
      else df.groupBy(col(mergeCol)).count().filter(col("count") > 1)
        .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)

    val pruned = allNull.foldLeft(df)(_ drop _)
    val sorted =
      if (sort && pruned.columns.contains(keys.primaryId)) pruned.orderBy(col(keys.primaryId))
      else pruned
    (sorted, Report(total, allNull, sparse, dupRows))
  }
}
