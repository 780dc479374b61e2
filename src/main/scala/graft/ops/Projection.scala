package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction: Johnson–Lindenstrauss sign random
  * projection (Achlioptas 2003, "Database-friendly random projections" —
  * public) and distributed PCA. Both produce the compact vectors that make
  * downstream ANN/dedup affordable at 100 TB: a 64-d float corpus shrinks
  * 4× (JL to 16-d) with pairwise distances preserved to the JL bound, or
  * variance-optimally via PCA.
  *
  * Everything is a pure function of the data + seed so two engines (or a
  * retried stage) produce identical vectors:
  *
  *  - JL signs s(i,j) ∈ {±1} derive from the engine-portable md5 scheme
  *    (the [[Sampling.hashHex]] family): parity of the first 8 hex chars
  *    of md5("seed|i|j"). The DuckDB oracle rebuilds the matrix from the
  *    same formula — no RNG state to ship.
  *  - The projection is one NARROW codegen'd map: the sign matrix is
  *    inlined as array literals and each output component rides the native
  *    sequential-fold [[graft.functions.DotProduct]], bit-compatible with
  *    the SQL mirror's `list_sum(list_transform(generate_series ...))` —
  *    the gate hash-compares raw doubles, no rounding.
  *  - PCA moments use decimal(38,12) sums (exact, summation-order-
  *    invariant — distributed partial aggregation cannot perturb them),
  *    with means and covariances rounded IN the engine before reuse (the
  *    [[KMeans]] round-before-reuse trick), so the eigensolver on any
  *    driver starts from identical doubles.
  *
  * Scale shape: projection/centering are narrow maps (no shuffle; stream-
  * safe). The covariance pass is one explode(d(d+1)/2 upper-triangle
  * pairs) + one hash aggregation — map-side combined, shuffle volume =
  * partitions × d² regardless of row count; the d×d matrix (4096 doubles
  * at d=64) and the Jacobi eigensolve are driver-side, the same bounded
  * driver traffic as [[KMeans]]' centroid table.
  */
object Projection {

  /** Fitted PCA model: orthonormal rows of `components` (k × d, rounded),
    * the corpus `mean` (d, rounded), and all-d eigenvalues (descending). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      decimals: Int)

  /** ±1 from the parity of the first 8 md5 hex chars of "seed|i|j" —
    * byte-identical to the Spark/DuckDB expression mirror
    * (`conv(substring(md5(...), 1, 8), 16, 10) % 2`). */
  def sign(seed: String, i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$i|$j".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** The outDim × inDim sign matrix, row i = hyperplane for output dim i. */
  def signMatrix(outDim: Int, inDim: Int, seed: String): Array[Array[Double]] = {
    require(outDim >= 1 && inDim >= 1, s"bad shape: $outDim x $inDim")
    Array.tabulate(outDim, inDim)((i, j) => sign(seed, i, j))
  }

  /** Project `vecCol` (array<float|double>, inDim components) to an
    * `outDim`-component array<double> column `outCol`:
    * y(i) = (1/√outDim) · Σ_j x(j)·s(i,j). One narrow codegen'd map with
    * the matrix inlined; a null vector projects to null. Rows whose
    * vector length differs from inDim produce null output components
    * ([[graft.functions.DotProduct]]'s length algebra) — validate
    * upstream if mixed dims are possible. */
  def signProject(
      df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      seed: String = "graft-jl", outCol: String = "proj"): DataFrame = {
    val s = signMatrix(outDim, inDim, seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val v = col(vecCol).cast("array<double>")
    val comps = s.map { row =>
      val sLit = array(row.map(lit).toIndexedSeq: _*)
      lit(scale) * Similarity.dot(v, sLit)
    }
    df.withColumn(outCol,
      when(v.isNotNull, array(comps.toIndexedSeq: _*)))
  }

  /** Raw upper-triangle (i ≤ j) second-moment table of `vecCol` over
    * non-null vectors: (i, j, n, si, sj, sij) with decimal(38,12) sums
    * of round(term, 12) — round-before-cast (the [[Procrustes]] idiom)
    * because engines truncate a full-mantissa double into a decimal
    * differently at the 12th digit; the rounded term is the same number
    * everywhere. Exact, summation-order-invariant, and ADDITIVE, so shard/micro-batch
    * sketches merge by cell-wise sum into exactly the whole-corpus table
    * (the mergeable-moment shape of [[graft.stats.IncrementalStats]],
    * here for the full d×d covariance). Shuffle = partitions × d(d+1)/2
    * partial rows; null vectors are excluded (they vote in no moment). */
  def momentsUpper(df: DataFrame, vecCol: String, inDim: Int): DataFrame = {
    // Plan shape, each step measured at sf0.1 (16→~2 s):
    //  1. upper-triangle pairs via TWO chained posexplodes (GenerateExec,
    //     codegen) — the original in-row struct-array build went through
    //     interpreted higher-order functions (transform/flatten never
    //     enter whole-stage codegen). slice(v, i+1, d-i) yields
    //     components i..d-1 (1-based slice), so j = i + offset.
    //  2. terms as UNSCALED LONGS of round(x,12)::decimal(38,12)
    //     ([[graft.functions.UnscaledRound12]] — bit-identical to the
    //     declarative form, which spent its time on per-row BigDecimal
    //     round/cast allocs and non-compact decimal adds).
    //  3. heavy aggregation sums LONGS per (i, j, input partition) —
    //     codegen'd long arithmetic, map-side combined; the partition key
    //     bounds each long sum by partition row count (≤ ~10⁷ rows ×
    //     |term| ≤ 10⁶ headroom under 2⁶³/10¹²·10⁷; ANSI makes any
    //     overflow loud, never silent wraparound).
    //  4. the partition-count-sized partials convert to EXACT decimals
    //     (unscaled × 10⁻¹², precision algebra uncapped) and cell-sum —
    //     identical values to the old pipeline because decimal addition
    //     is associative.
    val spark = df.sparkSession
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_unscaled_round12",
      exprs => graft.functions.UnscaledRound12(exprs.head), "built-in")
    def u(c: Column) = call_function("graft_unscaled_round12", c)
    // exact 10^-12 as decimal(1,12): unscaled 1, scale 12
    val e12inv = lit(new java.math.BigDecimal(java.math.BigInteger.ONE, 12))
    def toDec(c: Column) =
      sum((c.cast("decimal(20,0)") * e12inv).cast("decimal(38,12)"))
    val v = col(vecCol).cast("array<double>")
    df.filter(v.isNotNull && size(v) === inDim)
      .select(v.as("__v"))
      // each input row fans out d(d+1)/2 terms, so parallelism must come
      // from ROW count, not input file splits — a compact parquet file
      // would otherwise funnel the whole d² explode through one task.
      // The repartition shuffles only the skinny vectors (2/d of the
      // exploded volume); results are placement-invariant (long partials
      // per pid merge by associative decimal addition).
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"),
        posexplode(slice(col("__v"), col("i") + 1, lit(inDim) - col("i")))
          .as(Seq("__p", "xj")))
      .select(col("i"), (col("i") + col("__p")).as("j"),
        col("xi"), col("xj"), spark_partition_id().as("__pid"))
      .groupBy("i", "j", "__pid").agg(
        count(lit(1)).as("__n"),
        sum(u(col("xi"))).as("__si_u"),
        sum(u(col("xj"))).as("__sj_u"),
        sum(u(col("xi") * col("xj"))).as("__sij_u"))
      .groupBy("i", "j").agg(
        sum(col("__n")).as("n"),
        toDec(col("__si_u")).as("si"),
        toDec(col("__sj_u")).as("sj"),
        toDec(col("__sij_u")).as("sij"))
  }

  /** Cell-wise sum: mergeMoments(momentsUpper(A), momentsUpper(B)) ==
    * momentsUpper(A ∪ B) EXACTLY (decimal addition is associative —
    * additive, NOT idempotent; see [[runningMomentsSink]] for the
    * redelivery-safe streaming fold). */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("i", "j")
      .agg(sum(col("n")).as("n"), sum(col("si")).as("si"),
        sum(col("sj")).as("sj"), sum(col("sij")).as("sij"))

  /** Finalize a moment table into the covariance view: means rounded to
    * `decimals` BEFORE the cross term, covariance rounded to `decimals`
    * (round-before-reuse — identical doubles regardless of how many
    * shards the moments arrived in). */
  def covarianceFromMoments(m: DataFrame, decimals: Int = 6): DataFrame =
    m.select(
        col("i"), col("j"), col("n"),
        round(col("si").cast("double") / col("n"), decimals).as("mean_i"),
        round(col("sj").cast("double") / col("n"), decimals).as("mean_j"),
        col("sij"))
      .withColumn("cov",
        round(col("sij").cast("double") / col("n") -
          col("mean_i") * col("mean_j"), decimals))
      .drop("sij")

  /** The (i, j, n, mean_i, mean_j, cov) upper-triangle population
    * covariance of `vecCol`, as a DataFrame both engines rebuild exactly
    * ([[momentsUpper]] finalized by [[covarianceFromMoments]]). */
  def covarianceUpper(
      df: DataFrame, vecCol: String, inDim: Int,
      decimals: Int = 6): DataFrame =
    covarianceFromMoments(momentsUpper(df, vecCol, inDim), decimals)

  /** foreachBatch accumulator folding per-micro-batch moment tables —
    * the streaming path to a periodically-refreshed PCA without ever
    * rescanning the corpus: fold moments as documents arrive, finalize +
    * eigensolve on whatever cadence the pipeline refits. Moments are
    * additive, so a replayed micro-batch would double-count — the fold
    * keys on the batchId (stable across retries of one epoch) and skips
    * batches already folded, the same at-least-once discipline as
    * [[CountMin.runningSketchSink]]. */
  def runningMomentsSink(vecCol: String, inDim: Int):
      (java.util.concurrent.atomic.AtomicReference[
        Map[(Int, Int), (Long, BigDecimal, BigDecimal, BigDecimal)]],
        (DataFrame, Long) => Unit) = {
    val ref = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[(Int, Int), (Long, BigDecimal, BigDecimal, BigDecimal)])
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val fn = (batch: DataFrame, batchId: Long) => {
      if (batchId > seen.get()) {
        val m = momentsUpper(batch, vecCol, inDim).collect().map { r =>
          (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
            ((r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("si")),
              BigDecimal(r.getAs[java.math.BigDecimal]("sj")),
              BigDecimal(r.getAs[java.math.BigDecimal]("sij"))))
        }.toMap
        ref.updateAndGet { prev =>
          (prev.keySet ++ m.keySet).map { k =>
            val (an, asi, asj, asij) =
              prev.getOrElse(k, (0L, BigDecimal(0), BigDecimal(0), BigDecimal(0)))
            val (bn, bsi, bsj, bsij) =
              m.getOrElse(k, (0L, BigDecimal(0), BigDecimal(0), BigDecimal(0)))
            k -> ((an + bn, asi + bsi, asj + bsj, asij + bsij))
          }.toMap
        }
        seen.set(batchId)
      }
      ()
    }
    (ref, fn)
  }

  /** Fit PCA: one distributed covariance pass ([[covarianceUpper]]), then
    * a driver-side cyclic Jacobi eigensolve of the d×d rounded matrix.
    * Eigenpairs sort by (eigenvalue desc, Jacobi column asc); each
    * component's sign is normalized so its largest-magnitude entry is
    * positive (first such index on magnitude ties) — a deterministic
    * orientation. Components are rounded to `decimals` so projections are
    * engine-stable doubles. */
  def pcaFit(
      df: DataFrame, vecCol: String, inDim: Int, k: Int,
      decimals: Int = 6): PcaModel = {
    require(k >= 1 && k <= inDim, s"k must be in [1, $inDim], got $k")
    val rows = covarianceUpper(df, vecCol, inDim, decimals).collect()
    require(rows.nonEmpty, "no non-null vectors of the declared dimension")
    val n = rows.head.getAs[Long]("n")
    require(rows.forall(_.getAs[Long]("n") == n),
      "inconsistent moment counts — concurrent mutation of the input?")
    val cov = Array.ofDim[Double](inDim, inDim)
    val mean = Array.ofDim[Double](inDim)
    rows.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val c = r.getAs[Double]("cov")
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = r.getAs[Double]("mean_i")
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i))
    val comps = order.take(k).map { idx =>
      val raw = vectors.map(_(idx))
      val pivot = raw.indices.maxBy(p => (math.abs(raw(p)), -p))
      val s = if (raw(pivot) < 0) -1.0 else 1.0
      raw.map(x => BigDecimal.valueOf(x * s)
        .setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray, decimals)
  }

  /** Center on the model mean and project onto the k components: adds
    * `outCol` (array<double>, k components). One narrow codegen'd map,
    * literals inlined — stream-safe, no shuffle. */
  def pcaProject(
      df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pc", whiten: Boolean = false): DataFrame = {
    val scales: Array[Double] =
      if (!whiten) Array.fill(model.components.length)(1.0)
      else {
        val used = model.eigenvalues.take(model.components.length)
        require(used.forall(_ > 0.0),
          s"whitening needs strictly positive eigenvalues, got " +
            s"${used.mkString(", ")} — reduce k below the rank")
        used.map(l => 1.0 / math.sqrt(l))
      }
    val meanLit = array(model.mean.map(lit).toIndexedSeq: _*)
    val v = col(vecCol).cast("array<double>")
    val centered = zip_with(v, meanLit, (x, m) => x - m)
    val comps = model.components.zip(scales).map { case (c, s) =>
      Similarity.dot(centered, array(c.map(lit).toIndexedSeq: _*)) * lit(s)
    }
    df.withColumn(outCol,
      when(v.isNotNull && size(v) === model.mean.length,
        array(comps.toIndexedSeq: _*)))
  }

  /** Persist a [[PcaModel]] as a tiny parquet table (kind, idx, vals) —
    * the same bounded-artifact shape as [[KMeans.saveModel]]. */
  def savePcaModel(spark: SparkSession, model: PcaModel, path: String): Unit = {
    import spark.implicits._
    val rows =
      Seq(("mean", -1, model.mean.toSeq, model.decimals)) ++
        Seq(("eigenvalues", -1, model.eigenvalues.toSeq, model.decimals)) ++
        model.components.zipWithIndex.map { case (c, i) =>
          ("component", i, c.toSeq, model.decimals)
        }
    rows.toDF("kind", "idx", "vals", "decimals")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPcaModel(spark: SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path).collect()
    def one(kind: String): Array[Double] = {
      val m = rows.filter(_.getAs[String]("kind") == kind)
      require(m.length == 1, s"model at $path: expected one '$kind' row")
      m.head.getSeq[Double](2).toArray
    }
    val comps = rows.filter(_.getAs[String]("kind") == "component")
      .sortBy(_.getAs[Int]("idx"))
    require(comps.nonEmpty, s"model at $path has no components")
    require(comps.map(_.getAs[Int]("idx")).toSeq == comps.indices.toSeq,
      s"model at $path: component ids not contiguous")
    val decimals = rows.head.getAs[Int]("decimals")
    PcaModel(one("mean"), comps.map(_.getSeq[Double](2).toArray),
      one("eigenvalues"), decimals)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5). Returns (eigenvalues,
    * eigenvector matrix V with eigenvector i in COLUMN i). Deterministic:
    * fixed sweep order, fixed tolerance, no RNG. */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiagNorm(a)
    val tol = 1e-14 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        // 2x2 symmetric Schur rotation zeroing a(p)(q)
        val apq = a(p)(q); val app = a(p)(p); val aqq = a(q)(q)
        val tau = (aqq - app) / (2.0 * apq)
        val t = {
          val s = if (tau >= 0) 1.0 else -1.0
          s / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
        }
        val c = 1.0 / math.sqrt(1.0 + t * t)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    require(off <= tol,
      s"Jacobi failed to converge in $maxSweeps sweeps (off-diag $off)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double =
    math.sqrt(a.map(_.map(x => x * x).sum).sum)
}
