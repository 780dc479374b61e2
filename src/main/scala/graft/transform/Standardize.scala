package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-score standardization — (v − mean)/stddev per numeric column, the
  * feature-scaling step before distance-based models and regularized
  * fits.
  *
  * One aggregate computes every column's moments, one narrow map applies
  * them — no second shuffle. Engine-parity design: the moment sums run in
  * DECIMAL(18,2) (values) and its exact product (squares), so they are
  * exact in ANY engine regardless of partition summation order; the mean
  * and sample stddev then derive through an identical double sequence,
  * and the per-row z-score is rounded at `roundTo`. A zero-variance
  * column standardizes to null (no ANSI divide error).
  */
object Standardize {

  /** `df` with each named column replaced by its rounded z-score. */
  def zscore(
      df: DataFrame, cols: Seq[String], roundTo: Int = 6): DataFrame = {
    require(cols.nonEmpty, "no columns to standardize")
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("decimal(18,2)")
      Seq(count(col(c)).as(s"__n_$c"),
        sum(d).cast("double").as(s"__sm_$c"),
        sum(d * d).cast("double").as(s"__sq_$c"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (out, (c, i)) =>
      val n = m.getLong(3 * i).toDouble
      val sm = m.getDouble(3 * i + 1)
      val sq = m.getDouble(3 * i + 2)
      val mean = sm / n
      val varS = (sq - sm * sm / n) / (n - 1.0)
      if (!(varS > 0.0)) out.withColumn(c, lit(null).cast("double"))
      else {
        val sd = math.sqrt(varS)
        out.withColumn(c,
          round((col(c).cast("double") - lit(mean)) / lit(sd), roundTo))
      }
    }
  }
}
