package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split conformal prediction (Vovk, Gammerman & Shafer 2005; Lei et al.
  * JASA 2018 — public): wrap ANY point predictor in distribution-free
  * intervals. Given a held-out calibration set, qhat = the
  * ⌈(n+1)(1−α)⌉-th smallest absolute residual |y − ŷ|; the interval
  * ŷ ± qhat then covers the truth with probability ≥ 1−α under
  * exchangeability — no model or noise assumptions. This is the
  * model-agnostic uncertainty layer for the engine's predictors (OLS,
  * the logistic quality classifier, group-mean baselines).
  *
  * Distributed shape: residuals are a narrow map; the single order
  * statistic comes from a rank selection over the CALIBRATION set only.
  * Calibration sets are held-out samples — bounded by design (the
  * conformal guarantee needs exchangeable calibration draws, not the
  * corpus), so the global-order window here is over sample-sized data;
  * the corpus-sized step, applying ŷ ± qhat, is a stateless narrow map.
  * Residuals are rounded to 9 decimals (engine-portable), and the value
  * at a rank is deterministic under ties because the sorted multiset is
  * — no tie-break column is needed for a quantile VALUE. */
object Conformal {

  /** The conformal quantile rank: ⌈(n+1)(1−α)⌉, in exact decimal
    * arithmetic (the [[Bootstrap.ranks]] lesson: binary-double ceil can
    * drift a whole rank). A rank beyond n means the requested coverage
    * is unattainable at this calibration size (qhat = +∞); callers get
    * a null qhat and must grow the calibration set or raise α. */
  def rank(n: Long, alpha: Double): Long = {
    require(alpha > 0 && alpha < 1, s"bad alpha $alpha")
    ((BigDecimal(1) - BigDecimal.valueOf(alpha)) * (n + 1))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
  }

  /** One-row fit over the calibration set: n, the rank, and qhat (the
    * rank-th smallest |y − ŷ| rounded to 9; null when rank > n). */
  def fit(cal: DataFrame, yCol: Column, yhatCol: Column,
      alpha: Double = 0.1): DataFrame = {
    // persisted: the count and the rank selection would otherwise each
    // re-run the upstream calibration pipeline (joins included); the
    // result is evaluated eagerly so the cache releases before return
    val res = cal
      .select(round(abs(yCol.cast("double") - yhatCol.cast("double")), 9)
        .as("__r"))
      .filter(col("__r").isNotNull)
      .withColumn("__rn", row_number().over(Window.orderBy(col("__r"))))
      .persist()
    val n = res.agg(count(lit(1))).head().getLong(0)
    val r = rank(n, alpha)
    val row = res.agg(
      lit(n).as("n_cal"),
      lit(r).as("q_rank"),
      max(when(col("__rn") === r, col("__r"))).as("qhat")).head()
    res.unpersist()
    cal.sparkSession.createDataFrame(
      java.util.Arrays.asList(row), row.schema)
  }

  /** Add [lo, hi] = ŷ ± qhat to every row — the corpus-sized step, a
    * stateless narrow map (qhat rides as a literal). A null qhat
    * (unattainable coverage) yields null bounds rather than pretending
    * an interval. */
  def intervals(df: DataFrame, yhatCol: Column,
      qhat: Option[Double]): DataFrame = {
    val q = qhat.map(lit).getOrElse(lit(null).cast("double"))
    df.withColumn("lo", yhatCol.cast("double") - q)
      .withColumn("hi", yhatCol.cast("double") + q)
  }

  /** Empirical coverage of ŷ ± qhat on a test set: one aggregation,
    * (n_test, covered, coverage rounded to 6). The conformal theorem
    * says E[coverage] ≥ 1−α; a drastic shortfall means the
    * calibration/test split was not exchangeable (distribution shift —
    * which is itself the useful alarm). */
  def coverage(test: DataFrame, yCol: Column, yhatCol: Column,
      qhat: Double): DataFrame =
    test
      .select(yCol.cast("double").as("__y"),
        yhatCol.cast("double").as("__p"))
      .filter(col("__y").isNotNull && col("__p").isNotNull)
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(abs(col("__y") - col("__p")) <= lit(qhat), 1L)
          .otherwise(0L)).as("covered"))
      .withColumn("coverage",
        round(col("covered").cast("double") / col("n_test"), 6))
}
