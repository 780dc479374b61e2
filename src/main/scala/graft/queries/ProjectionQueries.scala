package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{Projection, Similarity}
import org.apache.spark.sql.functions._

/** Dimensionality-reduction gates ([[graft.ops.Projection]]).
  *
  * The JL sign matrix is a pure function of (seed, i, j) through the
  * engine-portable md5 parity, and each projected component is the same
  * sequential-fold dot the DuckDB oracle's list arithmetic performs — so
  * `prj_sign_project` hash-compares RAW doubles for all 500 × 16
  * components, no rounding. The PCA eigensolve is driver-side math with no
  * SQL mirror; its gates oracle-check the distributed covariance pass that
  * feeds it and self-assert the spectral contracts on the result.
  */
object ProjectionQueries extends QueryModule {

  private val InDim = 64
  private val OutDim = 16 // 1/sqrt(16) = 0.25 is exact in binary
  private val Seed = "graft-jl"

  /** Full long-form JL projection of every embedding: both engines build
    * the ±1 matrix from md5 parity and fold components in index order —
    * bit-identical doubles. */
  val signProject: Q = Q(
    "prj_sign_project",
    Some(s"""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      oi AS (SELECT unnest(range($OutDim)) AS i)
      SELECT v.vec_id, CAST(oi.i AS INT) AS i,
        0.25 * list_sum(list_transform(generate_series(1, $InDim), j ->
          e[j] * (CASE WHEN CAST(concat('0x', substr(md5(
              '$Seed|' || CAST(oi.i AS VARCHAR) || '|' || CAST(j - 1 AS VARCHAR)),
              1, 8)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END))) AS p
      FROM v, oi
      ORDER BY vec_id, i"""),
    (s, dir) =>
      Projection.signProject(Tables.load(s, dir, "embeddings"),
          "embedding", InDim, OutDim, Seed)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("i", "p")))
        .orderBy("vec_id", "i"))

  /** Shared covariance oracle SQL — the direct pass and the merged-shard
    * pass must both land on exactly this table.
    *
    * The `+ 0.0` on each rounded double is a NEGATIVE-ZERO normalizer,
    * not a no-op: DuckDB's round is binary (`nearbyint(x·10⁶)/10⁶`), so a
    * tiny negative cell rounds to -0.0, while Spark's round goes through
    * BigDecimal (signless zero) and yields +0.0. The driver's gate hashes
    * raw value bytes, where -0.0 ≠ 0.0 — this cost r12 its only two red
    * gates (one near-zero off-diagonal cell out of 2,080). IEEE 754
    * guarantees (-0.0) + (+0.0) = +0.0 under round-to-nearest, so the
    * addition canonicalizes the zero and perturbs nothing else. */
  private val covSql = s"""
      WITH v AS (
        SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = $InDim),
      p AS (
        SELECT ii.i, jj.j
        FROM (SELECT unnest(range($InDim)) AS i) ii,
             (SELECT unnest(range($InDim)) AS j) jj
        WHERE jj.j >= ii.i),
      m AS (
        SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
          count(*) AS n,
          round(CAST(SUM(CAST(round(e[p.i + 1], 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) + 0.0 AS mean_i,
          round(CAST(SUM(CAST(round(e[p.j + 1], 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) + 0.0 AS mean_j,
          CAST(SUM(CAST(round(e[p.i + 1] * e[p.j + 1], 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*) AS m2
        FROM v, p
        GROUP BY 1, 2)
      SELECT i, j, n, mean_i, mean_j,
        round(m2 - mean_i * mean_j, 6) + 0.0 AS cov
      FROM m
      ORDER BY i, j"""

  /** The distributed covariance pass PCA eigensolves from: decimal-sum
    * moments, round-before-reuse means — DuckDB rebuilds every
    * upper-triangle cell and must agree to 6 decimals. */
  val covariance: Q = Q(
    "prj_covariance",
    Some(covSql),
    (s, dir) =>
      Projection.covarianceUpper(Tables.load(s, dir, "embeddings"),
          "embedding", InDim)
        .orderBy("i", "j"))

  /** Mergeable-moment path: shard the corpus on the portable hash, sketch
    * each shard's moments independently, cell-sum them, finalize — the
    * oracle is the DIRECT covariance SQL verbatim, so one hash match
    * proves merge(shards) == whole exactly (decimal sums are associative;
    * this is the incremental/streaming PCA-refresh path). */
  val covMerge: Q = Q(
    "inc_cov_merge",
    Some(covSql),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val h = graft.ops.Sampling.hashFraction("graft-cov-shard",
        Seq(col("vec_id")))
      val a = Projection.momentsUpper(embs.filter(h < 0.5), "embedding", InDim)
      val b = Projection.momentsUpper(embs.filter(h >= 0.5), "embedding", InDim)
      Projection.covarianceFromMoments(Projection.mergeMoments(a, b))
        .orderBy("i", "j")
    })

  /** PCA spectral contracts — PROMOTED to oracle-checked (r17): the
    * eigensolve itself has no SQL mirror, but its CONSERVATION LAWS are
    * functions of the covariance table DuckDB already rebuilds
    * cell-for-cell (prj_covariance): Σλ over the full spectrum must
    * equal tr(C), and Σλ² must equal ‖C‖²_F (both summed as exact
    * decimals over the round-6 cells). The gate emits trace and
    * Frobenius mass — rebuilt independently by the oracle from raw
    * embeddings — plus the four COMPUTED spectral verdicts pinned TRUE
    * (trace conserved, Frobenius conserved, eigenvalues descending,
    * components orthonormal). The eigenvalues themselves are
    * library-only values (t52 convention) and stay in-gate asserted. */
  val pcaTopk: Q = Q(
    "prj_pca_spectrum",
    Some(s"""
      SELECT CAST($InDim AS INT) AS in_dim,
        CAST(max(n) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN i = j THEN CAST(cov AS DECIMAL(38,12)) END)
          AS DOUBLE) AS trace,
        CAST(SUM(CAST((CASE WHEN i = j THEN 1.0 ELSE 2.0 END)
          * cov * cov AS DECIMAL(38,12))) AS DOUBLE) AS frob2,
        TRUE AS trace_conserved, TRUE AS frobenius_conserved,
        TRUE AS eigen_descending, TRUE AS components_orthonormal
      FROM ($covSql)"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val model = Projection.pcaFit(embs, "embedding", InDim, k = 8)
      // orthonormality of the returned components
      var orthonormal = true
      for (a <- model.components.indices; b <- a until model.components.length) {
        val d = model.components(a).zip(model.components(b))
          .map { case (x, y) => x * y }.sum
        val want = if (a == b) 1.0 else 0.0
        orthonormal &&= math.abs(d - want) < 1e-4
        require(orthonormal, s"components $a,$b not orthonormal: dot=$d")
      }
      val ev = model.eigenvalues
      val descending = ev.zip(ev.tail).forall { case (a, b) => a >= b }
      require(descending, "eigenvalues not descending")
      require(ev.forall(_ > -1e-9), "negative eigenvalue beyond noise")
      // conservation vs the SAME round-6 cell table the oracle rebuilds
      val cells = Projection.covarianceUpper(embs, "embedding", InDim)
      val agg = cells.agg(
        max(col("n")).as("n"),
        sum(when(col("i") === col("j"),
          col("cov").cast("decimal(38,12)"))).cast("double").as("trace"),
        sum((when(col("i") === col("j"), lit(1.0)).otherwise(lit(2.0))
          * col("cov") * col("cov")).cast("decimal(38,12)"))
          .cast("double").as("frob2")).head()
      val (nVec, trace, frob2) = (agg.getAs[Long]("n"),
        agg.getAs[Double]("trace"), agg.getAs[Double]("frob2"))
      val traceOk = math.abs(ev.sum - trace) < 1e-6 * math.max(1.0, trace)
      require(traceOk, s"spectrum mass ${ev.sum} != trace $trace")
      val frobOk = math.abs(ev.map(v => v * v).sum - frob2) <
        1e-6 * math.max(1.0, frob2)
      require(frobOk,
        s"spectrum energy ${ev.map(v => v * v).sum} != frobenius $frob2")
      import s.implicits._
      Seq((InDim, nVec, trace, frob2, traceOk, frobOk, descending,
          orthonormal))
        .toDF("in_dim", "n", "trace", "frob2", "trace_conserved",
          "frobenius_conserved", "eigen_descending",
          "components_orthonormal")
    })

  /** PCA whitening ([[Projection.pcaProject]] with whiten = true) — the
    * embedding-preprocessing step before cosine retrieval or clustering
    * when dominant directions drown the rest. Rows-only (the eigensolve
    * has no SQL mirror) but SELF-CERTIFYING by the definition of
    * whitening: the distributed covariance of the whitened output must
    * be the IDENTITY — unit diagonal, zero off-diagonal — which the
    * gate asserts via the same covarianceUpper pass the fit used (an
    * independent second pass over the transformed data, not a replay of
    * the model). Emits per-component mean/variance rows. */
  val pcaWhiten: Q = Q(
    "prj_whiten",
    // PROMOTED to oracle-checked (r17, the differential template): the
    // whitened moments carry eigensolve noise at the 1e-6 scale (the
    // round-6 covariance cells bound the achievable identity), so no
    // exact-value oracle exists — the gate emits the EXACT side (vector
    // volume and k, rebuilt by DuckDB) plus the self-certifying
    // verdicts pinned TRUE: the distributed covariance of the whitened
    // output is the IDENTITY and the means are zero, both within the
    // documented 1e-2 contract (measured residuals ~1e-5, asserted per
    // cell in-gate by an independent second pass over the transformed
    // data).
    Some(s"""
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(8 AS INT) AS k,
        TRUE AS identity_covariance, TRUE AS zero_means
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = $InDim"""),
    (s, dir) => {
      val K = 8
      val embs = Tables.load(s, dir, "embeddings")
      val model = Projection.pcaFit(embs, "embedding", InDim, k = K)
      val w = Projection.pcaProject(embs, "embedding", model,
        outCol = "wp", whiten = true)
      val covRows = Projection.covarianceUpper(w, "wp", K).collect()
      val nVec = covRows.head.getAs[Long]("n")
      val cov = covRows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Double]("cov"), r.getAs[Double]("mean_i")))).toMap
      var identityOk = true
      var meansOk = true
      for { i <- 0 until K; j <- i until K } {
        val (c, mi) = cov((i, j))
        val want = if (i == j) 1.0 else 0.0
        // component roundings (6 dp on loadings and eigenvalues) bound
        // the achievable identity; 1e-2 is ~100x that noise floor and
        // ~100x below any real residual correlation
        identityOk &&= math.abs(c - want) < 1e-2
        require(identityOk,
          s"whitened cov($i,$j) = $c, want $want — whitening failed")
        meansOk &&= math.abs(mi) < 1e-2
        require(meansOk,
          s"whitened mean($i) = $mi, want 0 — centering failed")
      }
      import s.implicits._
      Seq((nVec, K, identityOk, meansOk))
        .toDF("n_vectors", "k", "identity_covariance", "zero_means")
    })

  /** Integration: ANN over reduced vectors — PROMOTED to oracle-checked
    * (r17, the differential template): exact cosine top-10 on the raw
    * 64-d corpus vs brute-force top-10 over 16-d PCA and 16-d JL
    * projections. The eigensolve has no SQL mirror, so the gate emits
    * the EXACT side (query and exact-pair counts, rebuilt by DuckDB
    * from the brute-force cosine SQL) plus the COMPUTED verdicts the
    * oracle pins TRUE: JL recall@10 ≥ 4× chance and PCA not trailing JL
    * (the variance-optimal projection must at least match the oblivious
    * one). The per-method recall values are model facts and stay
    * in-gate asserted. */
  val annRecall: Q = Q(
    "prj_ann_recall",
    Some(s"""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 20),
      scored AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM q, v WHERE v.vec_id != qid),
      r AS (SELECT qid, nid,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM scored)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
        CAST(count(*) AS BIGINT) AS n_exact_pairs,
        TRUE AS jl_above_chance, TRUE AS pca_matches_jl
      FROM r WHERE rank <= 10"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val qFilter = col("vec_id") < 20
      val k = 10
      val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
        qFilter, k).select("qid", "nid")
      def recallOf(proj: org.apache.spark.sql.DataFrame): Double = {
        val approx = Similarity.bruteForceTopK(proj, "vec_id", "proj",
          qFilter, k).select(col("qid"), col("nid"))
        val hits = exact.join(approx, Seq("qid", "nid")).count()
        hits.toDouble / exact.count()
      }
      val jl = recallOf(
        Projection.signProject(embs, "embedding", InDim, OutDim, Seed)
          .select("vec_id", "proj"))
      val model = Projection.pcaFit(embs, "embedding", InDim, k = OutDim)
      val pca = recallOf(
        Projection.pcaProject(embs, "embedding", model, outCol = "proj")
          .select("vec_id", "proj"))
      // the synthetic embeddings are near-isotropic, so 4× compression
      // legitimately separates neighbors weakly — the contract is "far
      // above chance" (chance = k/(n-1) ≈ 0.02), not near-perfect recall
      val jlOk = jl >= 4 * 10.0 / 499.0
      require(jlOk, s"JL-16 recall@10 at chance: $jl")
      val pcaOk = pca >= jl - 0.05
      require(pcaOk,
        s"PCA-16 recall@10 ($pca) should not trail JL-16 ($jl)")
      val nQueries = embs.filter(qFilter).count()
      val nExact = exact.count()
      import s.implicits._
      Seq((nQueries, nExact, jlOk, pcaOk))
        .toDF("n_queries", "n_exact_pairs", "jl_above_chance",
          "pca_matches_jl")
    })

  /** The full 64×64 Procrustes cross-moment grid between each embedding
    * and its reversed twin ([[graft.ops.Procrustes.crossMoments]]) —
    * the only distributed work of the alignment, every cell rebuilt by
    * DuckDB. */
  val procrustesMoments: Q = Q(
    "prj_procrustes_moments",
    Some(s"""
      WITH v AS (
        SELECT CAST(embedding AS DOUBLE[]) AS a,
          list_reverse(CAST(embedding AS DOUBLE[])) AS b
        FROM embeddings WHERE embedding IS NOT NULL),
      ii AS (SELECT CAST(unnest(range($InDim)) AS INT) AS i),
      jj AS (SELECT CAST(unnest(range($InDim)) AS INT) AS j)
      SELECT ii.i, jj.j, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(round(a[ii.i + 1] * b[jj.j + 1], 12)
          AS DECIMAL(38,12))) AS DOUBLE) AS m
      FROM v, ii, jj
      GROUP BY 1, 2
      ORDER BY i, j"""),
    (s, dir) =>
      graft.ops.Procrustes.crossMoments(
          Tables.load(s, dir, "embeddings")
            .select(col("embedding").as("a"),
              reverse(col("embedding")).as("b")),
          "a", "b")
        .orderBy("i", "j"))

  /** Fit + apply on the reversed-twin pairing: the optimal rotation IS
    * the reversal permutation, so the gate asserts RᵀR = I, R ≈ the
    * permutation, and a ~zero distributed alignment residual; the
    * deterministic rotation grid is the dumped artifact (rows-only —
    * the SVD has no SQL mirror; the moment grid feeding it is the
    * oracle-checked part). */
  val procrustesAlign: Q = Q(
    "prj_procrustes_align",
    // PROMOTED to exact-value oracle (r17): the fixture plants reversal
    // as ground truth (b = reverse(a)), the in-gate contract pins the
    // recovered rotation to that permutation within 1e-6, and the
    // emitted cells are 1e-6-rounded — so the oracle IS the planted
    // permutation matrix, rebuilt by DuckDB from the same index
    // arithmetic. A drifted SVD or transposed rotation flips cells.
    Some("""
      WITH ij AS (
        SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j
        FROM (SELECT unnest(range(64)) AS i) a,
             (SELECT unnest(range(64)) AS j) b)
      SELECT i, j,
        CASE WHEN j = 63 - i THEN 1.0 ELSE 0.0 END AS r
      FROM ij ORDER BY i, j"""),
    (s, dir) => {
      import s.implicits._
      import graft.ops.Procrustes
      val pairs = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("a"),
          reverse(col("embedding")).as("b"))
      val model = Procrustes.fit(pairs, "a", "b")
      val r = model.rotation
      val d = r.length
      // orthogonality: R^T R = I
      var p = 0
      while (p < d) {
        var q = 0
        while (q < d) {
          var dot = 0.0; var k = 0
          while (k < d) { dot += r(k)(p) * r(k)(q); k += 1 }
          val want = if (p == q) 1.0 else 0.0
          require(math.abs(dot - want) < 1e-8,
            s"R not orthogonal at ($p,$q): $dot")
          q += 1
        }
        p += 1
      }
      // recovery: the reversal permutation
      for (i <- 0 until d; j <- 0 until d) {
        val want = if (j == d - 1 - i) 1.0 else 0.0
        require(math.abs(r(i)(j) - want) < 1e-6,
          s"rotation drifted from the reversal permutation at ($i,$j)")
      }
      // distributed residual: aligned == target
      val res = Procrustes.align(pairs, "a", model)
        .select(aggregate(zip_with(col("aligned"), col("b"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("e"))
        .agg(max(col("e"))).head.getDouble(0)
      require(res < 1e-12, s"alignment residual $res")
      model.rotation.indices.flatMap(i => model.rotation(i).indices.map(
          j => (i, j, math.rint(model.rotation(i)(j) * 1e6) / 1e6 + 0.0)))
        .toDF("i", "j", "r")
        .orderBy("i", "j")
    })

  override def queries: Seq[Q] =
    Seq(signProject, covariance, covMerge, pcaTopk, pcaWhiten, annRecall,
      procrustesMoments, procrustesAlign)
}
