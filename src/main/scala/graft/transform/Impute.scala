package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null imputation — fill missing numerics with the group mean, the
  * standard repair before models that cannot take nulls.
  *
  * One groupBy computes per-group (count, decimal-exact sum) over the
  * OBSERVED values; the groups-sized table broadcasts back and a coalesce
  * fills the holes — the data never shuffles. Observed values pass
  * through bit-for-bit; imputed values are the rounded group mean
  * (exact-sum-derived, so engine-portable); groups with no observed value
  * stay null (no global fallback unless the caller adds one).
  */
object Impute {

  /** `df` with nulls in `valueCol` replaced by their group's mean. */
  def fillWithGroupMean(
      df: DataFrame, groupCol: String, valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val d = col(valueCol).cast("decimal(18,2)")
    val m = df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("__n"),
      sum(d).cast("double").as("__sm"))
    df.join(broadcast(m), Seq(groupCol), "left")
      .withColumn(valueCol,
        coalesce(col(valueCol).cast("double"),
          when(col("__n") > 0, round(col("__sm") / col("__n"), roundTo))))
      .drop("__n", "__sm")
  }
}
