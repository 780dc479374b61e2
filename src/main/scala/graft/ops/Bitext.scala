package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, ACL — "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings",
  * public): mine translation pairs from two corpora embedded in a shared
  * space. Raw cosine over-selects hubs — sentences near everything — so
  * each candidate is scored by its RATIO MARGIN: cosine divided by the
  * mean cosine of both endpoints' k-nearest neighborhoods,
  *
  *   margin(x, y) = cos(x, y) / ((penalty(x) + penalty(y)) / 2),
  *
  * penalizing hub endpoints whose neighborhoods are uniformly close. The
  * mined set keeps pairs that are each other's best margin both ways
  * (the paper's intersection strategy) above `minMargin`.
  *
  * Engine-parity: cosines are rounded to 12 ONCE on the symmetric pair
  * table (so forward and backward read the same number), neighborhood
  * penalties are decimal folds of those rounded cosines divided by the
  * actual neighbor count, margins round to 6, and every rank breaks ties
  * on the partner id.
  *
  * Scale shape: this exact form scores the |X|·|Y| pair table — the
  * BASELINE for bounded corpora (the shape every published exact miner
  * uses). The pair table is never wider than (id, id, double) and is
  * shuffled twice (once per endpoint's window+aggregate). At 100 TB,
  * generate the candidate pair table with an ANN shortlist
  * ([[Ivf]]/[[Similarity.annTopK]] per side) and feed it to the same
  * margin/mutual-best tail — the scoring tail only ever sees
  * candidate-list-sized input.
  */
object Bitext {

  /** All-pairs margin scoring: (x_id, y_id, c, margin, __rf, __rb) with
    * endpoint penalties joined in. Each side is L2-normalized ONCE (a
    * row-count-sized map) so the pair loop runs a single codegen'd dot
    * instead of three (cosine = dot/(‖x‖·‖y‖) recomputes both norms per
    * pair); the sides also repartition so parallelism comes from rows,
    * not input file splits (the covariance lesson — one compact file
    * would otherwise run the |X|·|Y| loop on one task). Zero-norm or
    * null vectors drop (no direction to mine). */
  /** L2-normalize one side once (a row-count-sized map) so the pair
    * loop runs a single codegen'd dot instead of three (cosine =
    * dot/(‖x‖·‖y‖) recomputes both norms per pair); the side also
    * repartitions so parallelism comes from rows, not input file splits
    * (the covariance lesson — one compact file would otherwise run the
    * pair loop on one task). Zero-norm or null vectors drop (no
    * direction to mine). */
  private def side(df: DataFrame, idCol: String, vecCol: String,
      idName: String, vecName: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    df.select(col(idCol).as(idName),
        col(vecCol).cast("array<double>").as("__raw"))
      .filter(col("__raw").isNotNull)
      .repartition(parts)
      // norm² > 0 ⟺ sqrt(norm²) > 0 (also under NaN) — same kept rows as
      // the old sqrt-column form, one sqrt cheaper; the normalize itself
      // is the native one-pass expression (the HOF transform-by-alias
      // form re-ran the norm fold per element after optimizer inlining —
      // see graft.functions.L2Normalize)
      .filter(Similarity.norm2(col("__raw")) > 0)
      .select(col(idName),
        Similarity.l2normalize(col("__raw")).as(vecName))
  }

  /** Margin scoring over an arbitrary candidate pair table
    * (x_id, y_id, c) — exact when the caller feeds all pairs, blocked
    * when it feeds IVF candidates. Each endpoint's rank AND its top-k
    * neighborhood penalty ride the SAME partitioning — the penalty is a
    * window aggregate over the rank, so the pair table is shuffled
    * exactly twice (once per endpoint), then immediately cut to the
    * candidate union: every later pass (margins, mutual-best) is
    * candidate-list-sized. Penalties: mean of the top-k rounded cosines
    * per endpoint — decimal fold then ONE double division by the actual
    * neighbor count (≤ k when the other side is small). */
  private def marginOverPairs(pairs: DataFrame, k: Int): DataFrame = {
    val parts = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val wf = Window.partitionBy(col("x_id"))
      .orderBy(col("c").desc, col("y_id"))
    val wb = Window.partitionBy(col("y_id"))
      .orderBy(col("c").desc, col("x_id"))
    def pen(part: String, rankCol: Column) = {
      val w = Window.partitionBy(col(part))
      round(sum(when(rankCol <= k, col("c").cast("decimal(38,12)")))
        .over(w).cast("double")
        / sum(when(rankCol <= k, 1L).otherwise(0L)).over(w), 12)
    }
    val bestB = Window.partitionBy(col("y_id"))
      .orderBy(col("margin").desc, col("x_id"))
    pairs
      // The two ranking exchanges are pinned at the session's shuffle
      // width (REPARTITION_BY_NUM satisfies each window's clustered
      // distribution, so NO extra exchange is added — the explicit
      // repartition simply replaces the window's own implicit one).
      // Without the pin, AQE's byte-based coalescing sees a few tens of
      // MB of (id, id, double) rows and coalesces the candidate table to
      // 1-3 partitions, serializing the sort+window CPU (profiled r19:
      // the two window stages ran 748 ms/1 t and 892 ms/3 t on a 32-core
      // host — §2.5-style parallelism collapse, bytes small but per-row
      // work large). Same rows per key either way: ranks, penalties and
      // margins are bit-identical.
      .repartition(parts, col("x_id"))
      .withColumn("__rf", row_number().over(wf))
      .withColumn("px", pen("x_id", col("__rf")))
      .repartition(parts, col("y_id")) // pin the y-side exchange likewise
      .withColumn("__rb", row_number().over(wb))
      .withColumn("py", pen("y_id", col("__rb")))
      .filter(col("__rf") <= k || col("__rb") <= k)
      .withColumn("margin",
        round(col("c") / ((col("px") + col("py")) / 2), 6))
      // backward mutual-best rank computed HERE, while the candidate rows
      // are still hash-partitioned on y_id from the __rb/py windows: the
      // filter above preserves that distribution, so this window costs a
      // local sort only. Computing it inside mutualBest instead (after
      // the forward window re-keys on x_id) costs one extra full exchange
      // of the candidate table (r18 plan audit: 5 exchanges → 4).
      .withColumn("__bb", row_number().over(bestB))
  }

  /** All-pairs margin scoring: (x_id, y_id, c, margin, __rf, __rb) with
    * endpoint penalties joined in. */
  private def scoredPairs(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"neighborhood size k must be >= 1, got $k")
    val x = side(xs, idCol, vecCol, "x_id", "xv")
    val y = side(ys, idCol, vecCol, "y_id", "yv")
    val pairs = x.crossJoin(y)
      .select(col("x_id"), col("y_id"),
        round(Similarity.dot(col("xv"), col("yv")), 12).as("c"))
      .filter(col("c").isNotNull)
    marginOverPairs(pairs, k)
  }

  /** Mutual-best cut shared by the exact and blocked miners: the backward
    * rank (`__bb`) already rides on the scored table from
    * [[marginOverPairs]]'s y-partitioned pass, so only the forward window
    * is added here. */
  private def mutualBest(scored: DataFrame, minMargin: Double): DataFrame = {
    val bestF = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id"))
    scored
      .withColumn("__bf", row_number().over(bestF))
      .filter(col("__bf") === 1 && col("__bb") === 1 &&
        col("margin") >= minMargin)
      .select(col("x_id"), col("y_id"), col("c").as("cosine"),
        col("margin"))
  }

  /** Mine pairs between `xs` and `ys` (both carrying `idCol`, `vecCol`;
    * ids must be unique within each side). Returns mined rows
    * (x_id, y_id, cosine, margin) — pairs that are each other's best
    * margin within the k-NN CANDIDATE UNION (the paper mines over the
    * retrieved neighbor lists, which is also what keeps every pass after
    * the two ranking shuffles candidate-list-sized), with margin ≥
    * `minMargin`. Null or zero-norm vectors never pair. */
  def marginMine(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.0): DataFrame =
    mutualBest(scoredPairs(xs, ys, idCol, vecCol, k), minMargin)

  /** The 100 TB bitext path: identical margin/mutual-best semantics
    * restricted to an IVF candidate graph instead of all pairs. The
    * quantizer fits on ys (the index side, on a bounded hash sample),
    * each x probes its `nProbe` nearest cells, and candidate pairs are
    * Σ_x (probed cell sizes) — never |X|·|Y|. The pair table then runs
    * the same two ranking shuffles as the exact miner. A y sits in ONE
    * cell, so probing can't duplicate a pair. Approximation is
    * one-sided: pairs outside the probed cells are unseen (recall is
    * gate-pinned against the exact miner); everything retrieved scores
    * exactly as [[marginMine]] would over the same candidates.
    *
    * Scale note: candidates shuffle on the cell key; cells are bounded
    * by the k-means balance of the quantizer (the [[Dedup.semanticDedup]]
    * trade) — raise `nLists` with corpus size (~√N) to keep them even. */
  def marginMineIvf(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.0,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42,
      maxIter: Int = 8, fitSampleRows: Long = 4096L): DataFrame = {
    require(k >= 1, s"neighborhood size k must be >= 1, got $k")
    val pairs = ivfCandidatePairs(xs, ys, idCol, vecCol, nLists, nProbe,
      seed, maxIter, fitSampleRows)
    mutualBest(marginOverPairs(pairs, k), minMargin)
  }

  /** The scored IVF candidate table (x_id, y_id, c) behind
    * [[marginMineIvf]] — public so the candidate VOLUME (the quantity
    * that decides whether the blocked miner scales) is directly
    * countable: its row count is Σ_x (probed cell sizes), growing with
    * the corpus, never |X|·|Y|. ScaleBench measures exactly this. */
  def ivfCandidatePairs(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, nLists: Int = 16, nProbe: Int = 4, seed: Long = 42,
      maxIter: Int = 8, fitSampleRows: Long = 4096L): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists,
      s"nProbe must sit in [1, nLists=$nLists], got $nProbe")
    // zero-norm/null ys never pair in the exact miner; drop them before
    // the build so they can't surface as c = 0 candidates here either
    val ysClean = ys.filter(col(vecCol).isNotNull &&
      Similarity.norm2(col(vecCol).cast("array<double>")) > 0)
    val idx = Ivf.build(ysClean, idCol, vecCol, nLists, seed, maxIter,
      initMode = "random", fitSampleRows = fitSampleRows)
    val x = side(xs, idCol, vecCol, "x_id", "xv")
    // nearest-nProbe cells per x as one narrow literal-centroid map
    // ([[Ivf.probeCells]]) — no centroid cross join, no ranking shuffle
    val probes = Ivf.probeCells(idx.centroids, x, "x_id", "xv", nProbe)
    // The candidate join is BROADCAST on the probe side (the [[Ivf.search]]
    // idiom, r18 verdict item 3): a shuffle join on `cell` has at most
    // nLists distinct keys — at the local nLists=16 that is a ≤16-task
    // stage with k-means-imbalanced (skewed) cells, and AQE's skew
    // splitter cannot help a single hot key. Broadcasting removes the
    // cell exchange outright and runs the |candidates| dot products at
    // the scan side's full width ([[graft.core.Parallelism.widen]] on the
    // index side, whose parquet-backed lineage would otherwise funnel the
    // join through its file-split count). Scale note: the probe side is
    // |X|·nProbe rows of (id, vec) — broadcastable through the corpus
    // sizes this engine benches; beyond broadcast reach the documented
    // path is growing nLists ~√N (object scaladoc), which also gives the
    // shuffle join enough cell keys to parallelize.
    idx.assigned
      .select(col("cell"), col("id").as("y_id"), col("v").as("yv"))
      .join(probes, "cell")
      .select(col("x_id"), col("y_id"),
        round(Similarity.dot(col("xv"), col("yv")), 12).as("c"))
      .filter(col("c").isNotNull)
  }

  /** The scored candidate table (x_id, y_id, cosine, margin, fwd_rank,
    * bwd_rank) — pairs inside either endpoint's top-k neighborhood, the
    * inspection/threshold-tuning view behind [[marginMine]]'s
    * mutual-best cut. */
  def marginScores(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame =
    scoredPairs(xs, ys, idCol, vecCol, k)
      .select(col("x_id"), col("y_id"), col("c").as("cosine"),
        col("margin"), col("__rf").as("fwd_rank"), col("__rb").as("bwd_rank"))
}
