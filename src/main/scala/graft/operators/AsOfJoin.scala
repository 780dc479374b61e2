package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right row
  * with rightTime ≤ leftTime within the same key — the "latest order before
  * this event" operator Spark lacks natively.
  *
  * Implementation is the scalable union-sort trick, not a range cross-join:
  * union both sides tagged, ONE shuffle+sort per key on (time, tag), then a
  * running `last(_, ignoreNulls=true)` window carries the latest right-side
  * values forward onto left rows. Cost is a single sort-merge pass —
  * O((|L|+|R|) log) per partition, no |L|×|R| blowup, AQE-skew friendly.
  *
  * Determinism on ties: right rows sort BEFORE left rows at equal
  * timestamps (inclusive ≤ semantics), and among equal right timestamps the
  * highest tiebreak column wins — fixed, documented, and mirrored in the
  * DuckDB oracle.
  */
object AsOfJoin {

  /** @param left       left (probe) side, e.g. events
    * @param right      right (reference) side, e.g. orders
    * @param keys       equi-join key column names, present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right-side columns to attach (values carried as-of)
    * @param tiebreak   right column ordering the winner among equal
    *                   rightTime rows (max wins)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val t = "__asof_t"; val tag = "__asof_tag"; val tb = "__asof_tb"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .withColumn(tb, lit(null).cast(right.schema(tiebreak).dataType))
      .select((keys ++ Seq(t, tag, tb)).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .withColumn(tb, col(tiebreak))
      .select((keys ++ Seq(t, tag, tb)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    // Right rows first at equal time (tag 0 < 1); among right ties the
    // largest tiebreak lands last, so running-last picks it.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col(tag).asc, col(tb).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__carry_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col(tag) === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.map(c => col(s"__carry_$c").as(c)): _*)
  }
}
