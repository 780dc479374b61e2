package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** T14 cross-filter selection + A5 capped unique values. */
object CrossFilter {

  /** T14 (reference: pages/plotting.py:1916–2000): plot-point indices →
    * row subset of the plotted (null-filtered, deterministically ordered)
    * frame. Index = 0-based position in `orderBy(orderCols)`.
    *
    * No-partition `Window.orderBy` would funnel the whole dataset through
    * ONE task; instead: distributed range-partitioned sort + zipWithIndex
    * (partition order is the sort order, so indices match row_number − 1). */
  def selectByIndex(df: DataFrame, orderCols: Seq[String], indices: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    val idxSet = indices.toSet
    val picked = df.sort(orderCols.map(col): _*).rdd
      .zipWithIndex()
      .filter { case (_, i) => idxSet.contains(i) }
      .map(_._1)
    spark.createDataFrame(picked, df.schema)
  }

  /** A5 (reference: analysis/statistics.py:26–102): distinct values of a
    * column as strings, nulls dropped, capped, sorted — the filter-options
    * feed. The cap bounds driver memory; sort happens after the cap in the
    * reference, but capping an unsorted distinct is nondeterministic in a
    * distributed engine, so we sort-then-cap (documented deviation: the
    * reference's uncapped case is identical). */
  def uniqueValues(df: DataFrame, c: String, cap: Int = 1000): Seq[String] =
    df.select(col(c).cast(StringType).as("v")).na.drop()
      .distinct().orderBy("v").limit(cap)
      .collect().map(_.getString(0)).toSeq
}
