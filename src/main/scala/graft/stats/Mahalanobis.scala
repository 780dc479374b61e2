package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Squared Mahalanobis distance to the column mean under the sample
  * (population, /n) covariance — the multivariate outlier score that
  * respects correlation where per-column z-scores cannot: a row can sit
  * inside every marginal yet far outside the joint ellipsoid (the
  * quantity×price mismatch rows a univariate screen never sees).
  *
  * Distributed shape: ONE moment aggregation over the declared columns
  * (d(d+1)/2 + d cells, map-side combined — decimal folds of round-12
  * terms, the covariance recipe, but folded directly in decimal(38,12)
  * because measure-scale products overflow the unscaled-long fast path
  * built for unit-scale embeddings), a driver-side d×d inversion, then
  * one narrow codegen map with the precision matrix inlined as literals.
  * No shuffle beyond the moment partials; d is loudly capped.
  *
  * Exactness: means and covariances round to 6 (round-before-reuse);
  * the d = 2 precision matrix uses the closed-form adjugate — every
  * entry one fixed double expression a SQL oracle replays bit-for-bit.
  * d > 2 inverts by Gauss–Jordan with partial pivoting: deterministic,
  * but not SQL-replayable — that path is spec-pinned against the
  * closed form and hand-computed references instead. */
object Mahalanobis {

  /** Gauss–Jordan inverse with partial pivoting; fails loudly on a
    * (near-)singular matrix — constant or collinear columns have no
    * Mahalanobis geometry and must not NaN-poison every score. */
  private[stats] def invert(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val m = Array.tabulate(d, 2 * d) { (i, j) =>
      if (j < d) a(i)(j) else if (j - d == i) 1.0 else 0.0
    }
    for (c <- 0 until d) {
      val pivot = (c until d).maxBy(r => math.abs(m(r)(c)))
      require(math.abs(m(pivot)(c)) > 1e-12,
        s"covariance is singular at column $c — a constant or collinear " +
          "input column has no Mahalanobis geometry; drop it")
      if (pivot != c) { val t = m(pivot); m(pivot) = m(c); m(c) = t }
      val pv = m(c)(c)
      for (j <- 0 until 2 * d) m(c)(j) /= pv
      for (r <- 0 until d if r != c) {
        val f = m(r)(c)
        if (f != 0.0) for (j <- 0 until 2 * d) m(r)(j) -= f * m(c)(j)
      }
    }
    Array.tabulate(d, d)((i, j) => m(i)(d + j))
  }

  /** Fit + score in one call: adds `outCol` = round₆ squared Mahalanobis
    * distance. Rows with a null in any declared column are EXCLUDED from
    * the fit and score null (the null-in/null-out convention). */
  def distances(df: DataFrame, cols: Seq[String],
      outCol: String = "md2", maxDim: Int = 64): DataFrame = {
    val d = cols.size
    require(d >= 2, s"need at least 2 columns, got $d")
    require(d <= maxDim,
      s"$d columns exceeds maxDim=$maxDim — the scoring expression is " +
        "d² terms per row and the driver inverse d³; project down first")
    def fold(c: Column): Column =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val xs = cols.map(c => col(c).cast("double"))
    val complete = cols.map(col(_).isNotNull).reduce(_ && _)
    val fitRows = df.filter(complete)
    val aggs =
      count(lit(1)).as("n") +:
        (xs.zipWithIndex.map { case (x, i) => fold(x).as(s"s_$i") } ++
          (for { i <- 0 until d; j <- i until d }
            yield fold(xs(i) * xs(j)).as(s"p_${i}_$j")))
    val m = fitRows.agg(aggs.head, aggs.tail: _*).head()
    val n = m.getAs[Long]("n")
    require(n > d.toLong,
      s"need more complete rows ($n) than dimensions ($d) for a covariance")
    // + 0.0 is the IEEE negative-zero canonicalizer (the r13 covariance
    // lesson): BigDecimal's signless zero vs a binary round's -0.0 is a
    // byte-level hash divergence on value-equal results
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val mean = Array.tabulate(d)(i => r6(m.getAs[Double](s"s_$i") / n))
    val cov = Array.ofDim[Double](d, d)
    for { i <- 0 until d; j <- i until d } {
      val c = r6(m.getAs[Double](s"p_${i}_$j") / n - mean(i) * mean(j))
      cov(i)(j) = c; cov(j)(i) = c
    }
    val prec: Array[Array[Double]] =
      if (d == 2) {
        // closed-form adjugate — each entry one fixed double expression
        // (same arithmetic a SQL oracle writes), so the 2-D path is
        // hash-checkable end to end
        val det = cov(0)(0) * cov(1)(1) - cov(0)(1) * cov(0)(1)
        require(math.abs(det) > 1e-12,
          "covariance is singular — collinear columns have no " +
            "Mahalanobis geometry; drop one")
        Array(
          Array(cov(1)(1) / det, -cov(0)(1) / det),
          Array(-cov(0)(1) / det, cov(0)(0) / det))
      } else invert(cov)
    val dx = xs.zipWithIndex.map { case (x, i) => x - lit(mean(i)) }
    val md2 = (for { i <- 0 until d; j <- 0 until d }
      yield dx(i) * dx(j) * lit(prec(i)(j))).reduce(_ + _)
    df.withColumn(outCol, when(complete, round(md2, 6)))
  }
}
