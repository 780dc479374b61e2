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
  * array-typed aggregate: [[graft.functions.LogisticMomentAgg]]
  * accumulates every row's d(d+3)/2 + 1 moment terms (Hessian XᵀWX
  * cells, gradient Xᵀ(y−p), deviance) straight into one double[]
  * buffer per partition — the ApproximatePercentile execution shape
  * (ObjectHashAggregate, no grouping keys), so the per-row cost is the
  * unavoidable O(d²) flops and the shuffle is #partitions × one
  * buffer. β rides into the plan as an opaque operator parameter, so
  * per-iteration Catalyst planning is O(1) in d (the previous form
  * built d(d+3)/2 separate aggregate expressions per step and paid a d²
  * ANALYSIS cost — measured 67–550 s on a fixture-sized corpus, r17).
  * No UDFs, no MLlib, no per-row driver traffic. The d×d normal system
  * (d = features + 1, intercept last, intercept unpenalized) is solved
  * driver-side with commons-math3 LU — the driver work is d²-sized
  * while the data pass is embarrassingly parallel: the 100 TB cost is
  * `iterations` scans of a (d+1)-double projection, cached once.
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
    val projected = features.map(_._2.cast(DoubleType)) :+ lit(1.0)
    val y = label.cast(DoubleType)
    val spark = df.sparkSession
    // NO null pre-filter: a Filter over the projected features gets
    // pushed below the projection and re-embeds the whole feature tree
    // into every null check (measured 27× the bare feature pass at
    // d = 25 — see LogisticMomentAgg's scaladoc). Pairwise-complete
    // dropping happens inside the aggregate; its buffer's n/min/max
    // cells feed the degenerate-input checks from the same pass.
    val prepared = df
      .select(y.as("__y"), array(projected: _*).as("__xs"))
      .cache()
    try {
      var n = 0L
      val beta = Array.fill(d)(0.0)
      var iter = 0
      var converged = false
      var deviance = Double.NaN
      val nPairs = d * (d + 1) / 2
      while (iter < maxIter && !converged) {
        // ONE array-typed aggregate: every row's moment terms (p-clamp,
        // weights, deviance all inside) accumulate straight into one
        // double[] buffer per partition — no per-row array
        // materialization, one merge of #partitions partials
        val sums = prepared
          .select(graft.functions.LogisticMomentAgg(
            spark, col("__y"), col("__xs"), beta).as("m"))
          .head().getSeq[Double](0)
        require(sums.length == nPairs + d + 4,
          s"moment pass returned ${sums.length} positions, " +
            s"expected ${nPairs + d + 4}")
        if (iter == 0) {
          n = sums(nPairs + d + 1).toLong
          if (n == 0L) return None
          val (lo, hi) = (sums(nPairs + d + 2), sums(nPairs + d + 3))
          require(lo >= 0.0 && hi <= 1.0,
            s"label must be in {0,1}, saw [$lo, $hi]")
          if (lo == hi) return None // constant label: no boundary to fit
        }
        val h = Array.ofDim[Double](d, d)
        var k = 0
        for (i <- 0 until d; j <- i until d) {
          val v = sums(k); k += 1
          h(i)(j) = v; h(j)(i) = v
        }
        val g = Array.tabulate(d)(i => sums(nPairs + i))
        deviance = sums(nPairs + d)
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
    * runs the identical IRLS driver-side, dodging even the O(1)
    * per-iteration job overhead. Loudly capped at `maxRows`: past it,
    * use [[fit]], which since the array-moment rewrite IS a credible
    * corpus path — each step is one codegen scan + a d²-bounded
    * hash-agg (ScaleBench `logistic_fit`: K×-linear at 1/20/100×), so
    * corpus-scale labels (distillation labels, weak supervision) train
    * in-engine. Same clamps, same ridge, same convergence rule;
    * results differ from [[fit]] only by float-sum ordering (~1e-12;
    * parity spec-pinned at 1e-9). */
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
