package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics over scored retrieval results — the eval side
  * of the engine's search stack (BM25, TF-IDF, ANN top-k, RRF fusion):
  * given (query, doc, system score, graded relevance), per-query nDCG@k,
  * MRR, precision@k and recall@k, plus a macro average row. What a
  * retrieval pipeline reads before swapping its ranker, next to
  * [[Eval.auc]] for the pointwise-classifier filters.
  *
  * Engine-parity design (the house style): ranks are `row_number` with a
  * deterministic doc-id tie-break, so both engines rank identically; DCG
  * gain terms (2^rel − 1)/log2(rank+1) are rounded to 12 decimals BEFORE
  * the decimal(38,12) fold (summation-order-invariant), and every final
  * ratio is rounded to 6 — one double sequence, identical everywhere.
  *
  * Scale shape: everything is ONE shuffle on the query key — two sorts
  * inside the same partition (system order, ideal order) and one
  * aggregation; no global window, no self-join, no per-query driver
  * loop. Result is query-count-sized. Relevance is graded (0 = not
  * relevant); rows with null score or relevance are excluded (a null
  * score is an unranked doc, not rank infinity).
  */
object Ranking {

  /** Per-query metrics at cutoff `k`: (query, n_docs, n_rel, ndcg_at_k,
    * mrr, precision_at_k, recall_at_k). `ndcg_at_k` is null when the
    * query has no relevant doc (IDCG = 0 — undefined, not 0-by-fiat);
    * `mrr` is 0.0 then (the standard convention: reciprocal rank of a
    * miss is 0); `recall_at_k` is null with no relevant docs. */
  def rankingMetrics(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: Column, relCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"cutoff k must be >= 1, got $k")
    val base = df
      .filter(scoreCol.isNotNull && relCol.isNotNull)
      .select(col(queryCol).as("q"), col(docCol).as("d"),
        scoreCol.cast("double").as("s"), relCol.cast("int").as("rel"))
    val wSys = Window.partitionBy(col("q"))
      .orderBy(col("s").desc, col("d"))
    val wIdeal = Window.partitionBy(col("q"))
      .orderBy(col("rel").desc, col("d"))
    // gain terms rounded-12 then decimal-folded: order-invariant sums
    def dcgTerm(rank: Column) = round(
      (pow(lit(2.0), col("rel").cast("double")) - 1.0) /
        log(2.0, rank.cast("double") + 1.0), 12).cast("decimal(38,12)")
    val ranked = base
      .withColumn("__r", row_number().over(wSys))
      .withColumn("__ri", row_number().over(wIdeal))
    ranked.groupBy(col("q").as(queryCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("__r") <= k, dcgTerm(col("__r")))
          .otherwise(lit(0).cast("decimal(38,12)"))).as("__dcg"),
        sum(when(col("__ri") <= k, dcgTerm(col("__ri")))
          .otherwise(lit(0).cast("decimal(38,12)"))).as("__idcg"),
        min(when(col("rel") > 0, col("__r"))).as("__first_rel"),
        sum(when(col("__r") <= k && col("rel") > 0, 1L).otherwise(0L))
          .as("__rel_at_k"))
      .withColumn("ndcg_at_k",
        when(col("__idcg") > 0,
          round(col("__dcg").cast("double") / col("__idcg").cast("double"),
            6)))
      .withColumn("mrr",
        coalesce(round(lit(1.0) / col("__first_rel"), 6), lit(0.0)))
      .withColumn("precision_at_k",
        round(col("__rel_at_k") / lit(k.toDouble), 6))
      .withColumn("recall_at_k",
        when(col("n_rel") > 0,
          round(col("__rel_at_k") / col("n_rel").cast("double"), 6)))
      .drop("__dcg", "__idcg", "__first_rel", "__rel_at_k")
  }

  /** Macro averages of [[rankingMetrics]]: one row (n_queries, plus the
    * mean of each per-query metric over the queries where it is
    * defined). Defined-only averaging is the standard macro treatment —
    * a query with no relevant docs contributes to MRR (as 0) but not to
    * nDCG/recall, which are undefined there, not zero. */
  def macroMetrics(perQuery: DataFrame): DataFrame = {
    // decimal folds of the already-rounded per-query values: the mean is
    // summation-order-invariant, so the 6-decimal result is identical in
    // any engine (avg over raw doubles can flip the last digit)
    // exact decimal sum -> ONE double division (decimal division itself
    // has engine-specific scale rules; double division does not)
    def meanOf(c: String) = round(
      sum(col(c).cast("decimal(38,12)")).cast("double") /
        count(col(c)), 6).as(s"macro_${c.stripSuffix("_at_k")}")
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      meanOf("ndcg_at_k"),
      meanOf("mrr"),
      meanOf("precision_at_k"),
      meanOf("recall_at_k"))
  }

  /** Rank-biased overlap at prefix depth `depth` (Webber, Moffat &
    * Zobel 2010, truncated form): RBO = (1−p)·Σ_{d=1..k} p^{d−1}·
    * |A_d ∩ B_d|/d — the standard "how similar are two rankers"
    * score, top-weighted by the persistence parameter p.
    *
    * Distributed identity that makes it one join instead of k prefix
    * intersections: an item ranked r1 by A and r2 by B sits in BOTH
    * depth-d prefixes exactly when d ≥ max(r1, r2), so it contributes
    * W(m) = Σ_{d=m..k} p^{d−1}/d with m = max(r1, r2) — a k-row weight
    * table built once and broadcast. Per-query RBO is then one inner
    * join on (query, item), one weight lookup, one decimal-folded sum
    * (terms rounded to 12 — pow's last-ulp engine differences absorbed,
    * summation order irrelevant). Queries present in either ranking but
    * sharing no item inside depth score 0. Ranks must be unique 1..n
    * per (query, side) — window-generated ranks by contract.
    *
    * Returns (query, overlap_at_depth, rbo), rbo rounded to 6. */
  def rbo(a: DataFrame, b: DataFrame, queryCol: String, docCol: String,
      rankCol: String, p: Double = 0.9, depth: Int = 20): DataFrame = {
    require(p > 0 && p < 1, s"persistence p must sit in (0,1), got $p")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val spark = a.sparkSession
    val dTab = spark.range(1, depth + 1).select(col("id").as("d"))
    val mTab = spark.range(1, depth + 1).select(col("id").as("m"))
    val weights = mTab.join(dTab, col("d") >= col("m"))
      .groupBy("m")
      .agg(sum(round(pow(lit(p), col("d") - 1) / col("d"), 12)
        .cast("decimal(38,12)")).as("w"))
    val left = a.select(col(queryCol).as("query"), col(docCol).as("doc"),
      col(rankCol).cast("long").as("r1"))
    val right = b.select(col(queryCol).as("query"), col(docCol).as("doc"),
      col(rankCol).cast("long").as("r2"))
    val co = left.join(right, Seq("query", "doc"))
      .withColumn("m", greatest(col("r1"), col("r2")))
      .filter(col("m") <= depth)
      .join(broadcast(weights), "m")
      .groupBy("query")
      .agg(count(lit(1)).as("overlap_at_depth"),
        sum(col("w")).as("__ws"))
    val queries = left.select("query").union(right.select("query")).distinct()
    queries.join(co, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("overlap_at_depth"), lit(0L)).as("overlap_at_depth"),
        round(lit(1.0 - p) *
          coalesce(col("__ws"), lit(0).cast("decimal(38,12)"))
            .cast("double"), 6).as("rbo"))
  }
}
