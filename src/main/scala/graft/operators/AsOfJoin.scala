package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the nearest right row in event
  * time within the same key — the "latest order before this event" /
  * "next reading after this event" operator Spark lacks natively
  * (pandas `merge_asof` directions `backward` and `forward`, plus its
  * `tolerance` bound).
  *
  * Implementation is the scalable union-sort trick, not a range cross-join:
  * union both sides tagged, ONE shuffle+sort per key on (time, tag), then a
  * running `last(_, ignoreNulls=true)` window carries the adjacent
  * right-side values onto left rows. Cost is a single sort-merge pass —
  * O((|L|+|R|) log) per partition, no |L|×|R| blowup, AQE-skew friendly.
  * `forward` is the same pass over the reversed time ordering.
  *
  * Determinism on ties: right rows sort BEFORE left rows at equal
  * timestamps (inclusive ≤ / ≥ semantics), and among equal right
  * timestamps the highest tiebreak column wins — fixed, documented, and
  * mirrored in the DuckDB oracles.
  *
  * `toleranceSeconds` (pandas `tolerance`): a match farther than the bound
  * from the left row's time is nulled out — the carried right TIME rides
  * along for the comparison, so the bound costs no extra pass. Time
  * columns must cast to timestamp for the bound to apply.
  */
object AsOfJoin {

  /** Most recent right row with rightTime ≤ leftTime (per key). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tiebreak: String,
      toleranceSeconds: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightCols, tiebreak,
      toleranceSeconds, forwardDir = false)

  /** Earliest right row with rightTime ≥ leftTime (per key). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tiebreak: String,
      toleranceSeconds: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightCols, tiebreak,
      toleranceSeconds, forwardDir = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tiebreak: String,
      toleranceSeconds: Option[Long],
      forwardDir: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val t = "__asof_t"; val tag = "__asof_tag"; val tb = "__asof_tb"
    val rt = "__asof_rt" // the matched right row's own time, for tolerance

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .withColumn(tb, lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn(rt, lit(null).cast(right.schema(rightTime).dataType))
      .select((keys ++ Seq(t, tag, tb, rt)).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .withColumn(tb, col(tiebreak))
      .withColumn(rt, col(rightTime))
      .select((keys ++ Seq(t, tag, tb, rt)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    // Right rows first at equal time (tag 0 < 1) under BOTH directions —
    // inclusive match semantics; among right ties the largest tiebreak
    // lands last in scan order, so running-last picks it. Forward is the
    // identical pass over descending time.
    val timeOrder = if (forwardDir) col(t).desc else col(t).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col(tag).asc, col(tb).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carryCols = rightCols.map(c => s"__r_$c" -> s"__carry_$c") :+ (rt -> "__carry_rt")
    val carried = carryCols.foldLeft(l.unionByName(r)) { case (df, (src, dst)) =>
      df.withColumn(dst, last(col(src), ignoreNulls = true).over(w))
    }

    // Tolerance: null out carried values whose matched time is farther
    // than the bound (diff is nonnegative by construction per direction).
    val withinTol: Column = toleranceSeconds match {
      case None => lit(true)
      case Some(tol) =>
        val lSec = unix_seconds(col(t).cast("timestamp"))
        val rSec = unix_seconds(col("__carry_rt").cast("timestamp"))
        val diff = if (forwardDir) rSec - lSec else lSec - rSec
        col("__carry_rt").isNotNull && diff <= tol
    }

    carried.filter(col(tag) === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.map(c =>
          when(withinTol, col(s"__carry_$c")).otherwise(lit(null)).as(c)): _*)
  }
}
