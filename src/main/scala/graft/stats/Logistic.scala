package graft.stats

import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector, LUDecomposition, SingularMatrixException}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ridge-regularized logistic regression trained IN the engine — the
  * linear quality-classifier step of a training-data pipeline (the
  * fastText-style filters of GPT-3/CCNet lineage are linear models over
  * cheap surface features; here the features are any Column expressions,
  * e.g. [[graft.ops.TextOps]] quality signals).
  *
  * Solver: IRLS / Newton-Raphson. Each iteration is ONE distributed
  * aggregate computing the gradient Xᵀ(y−p) and Hessian XᵀWX as moment
  * sums — d(d+3)/2 codegen'd builtin expressions, no UDFs, no MLlib, no
  * per-row driver traffic. The d×d normal system (d = features + 1,
  * intercept last, intercept unpenalized) is solved driver-side with
  * commons-math3 LU — d is small by design (surface features), so the
  * driver work is microscopic while the data pass is embarrassingly
  * parallel: the 100 TB cost is `iterations` scans of a (d+1)-double
  * projection, which is cached once.
  *
  * Determinism: every iteration consumes exact distributed sums; the fit
  * is reproducible up to float-sum ordering (~1e-12 relative), so round
  * scores for artifact comparison.
  */
object Logistic {

  final case class LogisticFit(
      featureNames: Seq[String], weights: Array[Double], intercept: Double,
      iterations: Int, deviance: Double, converged: Boolean, n: Long) {
    /** Scoring expression for this fit over the SAME feature expressions
      * (codegen'd sigmoid of the linear predictor). */
    def score(features: Seq[Column]): Column =
      Logistic.score(features, weights, intercept)
  }

  /** σ(intercept + Σ wᵢ·fᵢ) as a pure builtin-expression Column. */
  def score(features: Seq[Column], weights: Array[Double],
      intercept: Double): Column = {
    require(features.length == weights.length,
      s"${features.length} features vs ${weights.length} weights")
    val eta = features.zip(weights)
      .map { case (f, w) => f.cast(DoubleType) * lit(w) }
      .foldLeft(lit(intercept))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-eta))
  }

  /** Fit y ∈ {0,1} on the named feature expressions. Rows with a null
    * feature or label are dropped (pairwise-complete, like [[Regression]]).
    * Returns None when there are no rows, the label never varies, or the
    * (regularized) Hessian is singular — degenerate inputs degrade to
    * None, never to a throw. `lambda` penalizes the feature weights only
    * (never the intercept). */
  def fit(df: DataFrame, features: Seq[(String, Column)], label: Column,
      lambda: Double = 1e-6, maxIter: Int = 25,
      tol: Double = 1e-8): Option[LogisticFit] = {
    require(features.nonEmpty, "no features")
    require(lambda >= 0.0 && maxIter >= 1 && tol > 0.0,
      "lambda >= 0, maxIter >= 1, tol > 0")
    val d = features.length + 1 // intercept last
    val xNames = (0 until d).map(i => s"__x$i")
    val projected = features.map(_._2.cast(DoubleType)) :+ lit(1.0)
    val y = label.cast(DoubleType)
    val prepared = df
      .select((y.as("__y") +: projected.zip(xNames).map {
        case (c, n) => c.as(n) }): _*)
      .filter(col("__y").isNotNull &&
        xNames.map(col(_).isNotNull).reduce(_ && _))
      .cache()
    try {
      val head = prepared.agg(count(lit(1)).as("n"),
        min(col("__y")).as("lo"), max(col("__y")).as("hi")).head()
      val n = head.getAs[Long]("n")
      if (n == 0L) return None
      val (lo, hi) = (head.getAs[Double]("lo"), head.getAs[Double]("hi"))
      require(lo >= 0.0 && hi <= 1.0,
        s"label must be in {0,1}, saw [$lo, $hi]")
      if (lo == hi) return None // constant label: no boundary to fit

      val beta = Array.fill(d)(0.0)
      var iter = 0
      var converged = false
      var deviance = Double.NaN
      while (iter < maxIter && !converged) {
        val eta = xNames.zip(beta)
          .map { case (xn, b) => col(xn) * lit(b) }.reduce(_ + _)
        // clamp p away from 0/1: keeps the deviance logs finite and the
        // Hessian weights positive under (near-)perfect separation
        val p = least(greatest(lit(1.0) / (lit(1.0) + exp(-eta)),
          lit(1e-12)), lit(1.0 - 1e-12))
        val w = p * (lit(1.0) - p)
        val r = col("__y") - p
        val hessTerms = for {
          i <- 0 until d; j <- i until d
        } yield sum(w * col(xNames(i)) * col(xNames(j))).as(s"__h${i}_$j")
        val gradTerms = (0 until d).map(i =>
          sum(r * col(xNames(i))).as(s"__g$i"))
        val devTerm = sum(lit(-2.0) * (col("__y") * log(p) +
          (lit(1.0) - col("__y")) * log(lit(1.0) - p))).as("__dev")
        val row = prepared.agg(hessTerms.head,
          (hessTerms.tail ++ gradTerms :+ devTerm): _*).head()
        deviance = row.getAs[Double]("__dev")
        val h = Array.ofDim[Double](d, d)
        for (i <- 0 until d; j <- i until d) {
          val v = row.getAs[Double](s"__h${i}_$j")
          h(i)(j) = v; h(j)(i) = v
        }
        val g = Array.tabulate(d)(i => row.getAs[Double](s"__g$i"))
        // ridge on feature weights only; intercept unpenalized
        for (i <- 0 until d - 1) {
          h(i)(i) += lambda
          g(i) -= lambda * beta(i)
        }
        val step =
          try new LUDecomposition(new Array2DRowRealMatrix(h, false))
            .getSolver.solve(new ArrayRealVector(g, false)).toArray
          catch { case _: SingularMatrixException => return None }
        var maxStep = 0.0
        for (i <- 0 until d) {
          beta(i) += step(i)
          maxStep = math.max(maxStep, math.abs(step(i)))
        }
        iter += 1
        converged = maxStep < tol
      }
      Some(LogisticFit(features.map(_._1), beta.take(d - 1),
        beta(d - 1), iter, deviance, converged, n))
    } finally prepared.unpersist(blocking = false)
  }

  /** [[fit]] for a BOUNDED labeled fixture: collects the (label,
    * features) matrix once — feature EXTRACTION stays a distributed
    * codegen pass; only the already-projected doubles come back — and
    * runs the identical IRLS driver-side, so a d-feature model costs
    * zero Catalyst analysis per iteration (the distributed path pays
    * d(d+3)/2 expression analyses per step, the right trade when the
    * LABELED ROWS are the big thing; a labeled training fixture is
    * small by nature — labels are expensive). Loudly capped at
    * `maxRows`: past it, use [[fit]]. Same clamps, same ridge, same
    * convergence rule; results differ from [[fit]] only by float-sum
    * ordering (~1e-12). */
  def fitLocal(df: DataFrame, features: Seq[(String, Column)],
      label: Column, lambda: Double = 1e-6, maxIter: Int = 25,
      tol: Double = 1e-8, maxRows: Long = 100000L): Option[LogisticFit] = {
    require(features.nonEmpty, "no features")
    require(lambda >= 0.0 && maxIter >= 1 && tol > 0.0,
      "lambda >= 0, maxIter >= 1, tol > 0")
    val d = features.length + 1 // intercept last
    val projected = features.map(_._2.cast(DoubleType)) :+ lit(1.0)
    val prepared = df.select(
      (label.cast(DoubleType).as("__y") +: projected.zipWithIndex.map {
        case (c, i) => c.as(s"__x$i") }): _*)
      .filter(col("__y").isNotNull &&
        (0 until d).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    // ONE action: collect through limit(maxRows + 1) so the guard and
    // the data share a single feature-extraction pass (count + collect
    // ran the projection twice for any caller that did not pre-cache —
    // r17 advice); one extra row past the cap is proof enough to fail
    val lim = math.min(maxRows, Int.MaxValue - 1L).toInt + 1
    val collected = prepared.limit(lim).collect()
    require(collected.length < lim,
      s"fitLocal: more than $maxRows labeled rows exceed the driver " +
        "bound - this solver is for bounded training fixtures; use " +
        "Logistic.fit (distributed IRLS) for corpus-scale labels")
    if (collected.isEmpty) return None
    val rows = collected.map { r =>
      (r.getDouble(0), Array.tabulate(d)(i => r.getDouble(i + 1)))
    }
    val n = rows.length.toLong
    val ys = rows.map(_._1)
    require(ys.forall(y => y >= 0.0 && y <= 1.0),
      s"label must be in {0,1}, saw [${ys.min}, ${ys.max}]")
    if (ys.min == ys.max) return None // constant label
    val beta = Array.fill(d)(0.0)
    var iter = 0
    var converged = false
    var deviance = Double.NaN
    while (iter < maxIter && !converged) {
      val h = Array.ofDim[Double](d, d)
      val g = Array.fill(d)(0.0)
      var dev = 0.0
      rows.foreach { case (y, x) =>
        var eta = 0.0
        var i = 0
        while (i < d) { eta += x(i) * beta(i); i += 1 }
        val p0 = 1.0 / (1.0 + math.exp(-eta))
        val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
        val w = p * (1.0 - p)
        val r = y - p
        dev += -2.0 * (y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
        i = 0
        while (i < d) {
          g(i) += r * x(i)
          var j = i
          while (j < d) { h(i)(j) += w * x(i) * x(j); j += 1 }
          i += 1
        }
      }
      for (i <- 0 until d; j <- i + 1 until d) h(j)(i) = h(i)(j)
      deviance = dev
      for (i <- 0 until d - 1) {
        h(i)(i) += lambda
        g(i) -= lambda * beta(i)
      }
      val step =
        try new LUDecomposition(new Array2DRowRealMatrix(h, false))
          .getSolver.solve(new ArrayRealVector(g, false)).toArray
        catch { case _: SingularMatrixException => return None }
      var maxStep = 0.0
      for (i <- 0 until d) {
        beta(i) += step(i)
        maxStep = math.max(maxStep, math.abs(step(i)))
      }
      iter += 1
      converged = maxStep < tol
    }
    Some(LogisticFit(features.map(_._1), beta.take(d - 1),
      beta(d - 1), iter, deviance, converged, n))
  }
}
