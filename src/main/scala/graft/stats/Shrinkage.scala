package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Empirical-Bayes shrinkage of per-key rates (Robbins 1956; the
  * beta-binomial method-of-moments form is standard textbook material —
  * public): the fix for "this customer has 1 order and it failed, so
  * their failure rate is 100%". A Beta(α, β) prior is fitted to the
  * key-level rate distribution by matching its mean and variance, and
  * every key's rate is replaced by the posterior mean
  * (s + α)/(n + α + β) — small-n keys pull hard toward the global mean,
  * large-n keys barely move. The standard smoothing for CTRs, defect
  * rates, and per-domain quality scores before ranking on them.
  */
object Shrinkage {

  /** Per-key beta-binomial shrunken rates.
    *
    * Method of moments on the UNWEIGHTED key-level rates p_k = s_k/n_k:
    * with m = mean(p), v = var(p) (sample), the prior strength is
    * ν = m(1−m)/v − 1, α = m·ν, β = (1−m)·ν. When the prior is
    * inadmissible (fewer than 2 keys, zero rate variance, or v ≥ m(1−m)
    * — rates more dispersed than any beta-binomial allows) there is
    * nothing defensible to shrink toward: α/β are null and the shrunken
    * rate equals the raw rate (documented fallback, never a silent
    * half-shrink).
    *
    * Scale shape: one groupBy(key) with map-side combine, ONE 3-cell
    * moment aggregate over the key-grain table, prior literals
    * broadcast back in the projection. Exactness: rates round to 9
    * before the decimal moment folds; m/v/ν/α/β are the same double
    * trees in both engines; the posterior mean rounds to 6. Rows with a
    * null key or flag are excluded. Returns (key, n_trials, n_success,
    * rate, alpha, beta, shrunk_rate) ordered by key. */
  def betaBinomialRates(
      df: DataFrame, keyCol: Column, successCol: Column): DataFrame = {
    val perKey = df
      .filter(keyCol.isNotNull && successCol.isNotNull)
      .groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("n_trials"),
        sum(when(successCol, 1L).otherwise(0L)).as("n_success"))
      .withColumn("rate", round(col("n_success") / col("n_trials"), 9))
    def fold(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    val m = perKey.agg(
        count(lit(1)).as("k"),
        fold(col("rate")).as("sp"),
        fold(round(col("rate") * col("rate"), 12)).as("spp"))
      .head()
    val k = m.getAs[Long]("k")
    require(k > 0, "shrinkage needs at least one key")
    val prior: Option[(Double, Double)] =
      if (k < 2) None
      else {
        val sp = m.getAs[Double]("sp"); val spp = m.getAs[Double]("spp")
        val mean = sp / k
        val v = (spp - sp * sp / k) / (k - 1)
        if (v <= 0.0 || v >= mean * (1.0 - mean)) None
        else {
          val nu = mean * (1.0 - mean) / v - 1.0
          Some((mean * nu, (1.0 - mean) * nu))
        }
      }
    val (alphaC, betaC, shrunk) = prior match {
      case Some((a, b)) =>
        (lit(a), lit(b),
          round((col("n_success") + lit(a)) /
            (col("n_trials") + lit(a) + lit(b)), 6))
      case None =>
        (lit(null).cast("double"), lit(null).cast("double"),
          round(col("rate"), 6))
    }
    perKey.select(col("key"), col("n_trials"), col("n_success"),
        col("rate"), alphaC.as("alpha"), betaC.as("beta"),
        shrunk.as("shrunk_rate"))
      .orderBy("key")
  }
}
