package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus: BM25 top-k for an
  * ad-hoc query string (Robertson et al.'s Okapi weighting, the Lucene
  * variant: idf = ln(1 + (N − df + 0.5)/(df + 0.5)), never negative).
  *
  * Scale shape — two narrow passes and NO per-term explode/join:
  *
  *  1. a stats pass aggregates N, avgdl, and one `df` per query term
  *     (map-side-combined sums over `array_contains`) into a single driver
  *     row — query terms are few by construction, so this is one scan
  *     producing a handful of scalars;
  *  2. a scoring pass evaluates the full BM25 sum as a pure `Column`
  *     expression per document (term stats inlined as literals), then
  *     `orderBy(...).limit(k)` — Catalyst plans TakeOrderedAndProject, a
  *     per-partition heap + driver merge, not a global sort shuffle.
  *
  * Both passes are codegen-friendly (array_contains / filter on the token
  * array) and the corpus never rides a shuffle. At 100 TB the cost is two
  * scans; to amortize across many queries, materialize the token arrays
  * (or an inverted postings table) once and reuse.
  */
object TextSearch {

  /** (doc_id ordered by BM25 desc, score) for `query`'s whitespace terms.
    * Tokenization lowercases then splits like [[TextOps.tokens]]; duplicate
    * query terms count once. Rounds the score to `roundTo` decimals and
    * breaks ties by id so the ranking is total and engine-portable. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String, query: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    val terms: Seq[String] =
      query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")

    val w = TextOps.tokens(lower(col(textCol)))
    val docs = df.select(col(idCol).as("id"), w.as("w"))

    // Pass 1: corpus stats. One aggregate row: N, avgdl, df per term.
    val statAggs =
      count(lit(1)).as("n") +: avg(size(col("w"))).as("avgdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = docs.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getLong(0)
    // empty corpus: avgdl is null and every score is vacuous — top-k of
    // nothing is the empty result, not an NPE
    if (n == 0L)
      return docs.select(col("id"), lit(0.0).as("score")).limit(0)
    // all-blank corpus: avgdl = 0 would make the length norm dl/avgdl a
    // 0/0 = NaN that poisons every score's ordering; with every dl = 0 the
    // stand-in value cancels out of the norm, so scores stay an honest 0
    // (tf = 0) instead of NaN
    val rawAvgdl = stats.getDouble(1)
    val avgdl = if (rawAvgdl > 0.0) rawAvgdl else 1.0
    val dfs = terms.indices.map(i => stats.getLong(2 + i))

    // Pass 2: score expression — arithmetic ordered exactly as the DuckDB
    // oracle writes it so doubles agree bit-for-bit (before rounding).
    val dl = size(col("w")).cast("double")
    val score: Column = terms.zipWithIndex.map { case (t, i) =>
      val dfT = dfs(i)
      val idf = log(lit(1.0) +
        (lit((n - dfT).toDouble) + lit(0.5)) / (lit(dfT.toDouble) + lit(0.5)))
      val tf = size(filter(col("w"), x => x === lit(t))).cast("double")
      idf * ((tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / lit(avgdl))))
    }.reduce(_ + _)

    docs.select(col("id"), round(score, roundTo).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** TF-IDF top-k for an ad-hoc query: score = Σ_t (tf_t/dl)·idf_t with the
    * smoothed idf = ln((1+N)/(1+df_t)) + 1 (never zero, so a term present in
    * every document still contributes) and length-normalized term frequency
    * (tf/dl), which removes the long-document bias raw counts carry.
    *
    * Same two-pass, no-explode shape as [[bm25TopK]]: one stats aggregate
    * (N + one df per term, map-side combined), then one scoring scan with
    * term stats inlined as literals, ending in orderBy+limit which Catalyst
    * plans as TakeOrderedAndProject (per-partition heap, no sort shuffle).
    * BM25 saturates tf and weights rare terms harder; TF-IDF is the linear
    * classic — both live here so callers can pick per workload. */
  def tfidfTopK(
      df: DataFrame, idCol: String, textCol: String, query: String,
      k: Int = 10, roundTo: Int = 6): DataFrame = {
    val terms: Seq[String] =
      query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")

    val w = TextOps.tokens(lower(col(textCol)))
    val docs = df.select(col(idCol).as("id"), w.as("w"))

    val statAggs = count(lit(1)).as("n") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = docs.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getLong(0)
    if (n == 0L)
      return docs.select(col("id"), lit(0.0).as("score")).limit(0)
    val dfs = terms.indices.map(i => stats.getLong(1 + i))

    // Arithmetic ordered exactly as the DuckDB oracle writes it; the dl=0
    // guard keeps blank documents at score 0 instead of NULL (0/0).
    val dl = size(col("w")).cast("double")
    val score: Column = terms.zipWithIndex.map { case (t, i) =>
      val idf = log(lit((1.0 + n) / (1.0 + dfs(i)))) + lit(1.0)
      val tf = size(filter(col("w"), x => x === lit(t))).cast("double")
      when(dl === 0.0, 0.0).otherwise(tf / dl) * idf
    }.reduce(_ + _)

    docs.select(col("id"), round(score, roundTo).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Flat inverted postings — ONE row per (term, doc): in-doc term
    * frequency plus the doc's token length (denormalized so scoring never
    * joins a corpus-sized doc-length table). This is the amortization
    * path the scan-based search documents: build once per corpus version
    * (one explode + one groupBy), persist BUCKETED BY `term`, and every
    * query reads k term slices instead of scanning all text —
    * query-time cost scales with posting-list sizes, not corpus bytes. */
  def buildPostings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.tokens(lower(col(textCol)))
    df.select(col(idCol).as("id"), w.as("w"))
      .select(col("id"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Corpus scalars BM25 needs alongside [[buildPostings]]: (N, avgdl) —
    * computed over ALL documents (including empty ones), exactly like the
    * scan path's stats pass; store them with the index. */
  def corpusStats(df: DataFrame, textCol: String): (Long, Double) = {
    val w = TextOps.tokens(lower(col(textCol)))
    val row = df.agg(count(lit(1)).as("n"), avg(size(w)).as("avgdl")).head()
    (row.getLong(0), if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  /** BM25 top-k answered FROM the postings index: k term slices (the
    * `term IN (...)` filter prunes buckets/row groups), per-term df from
    * those same slices, literal-inlined scoring, and a fixed-term-order
    * pivot sum per doc so the double arithmetic is the scan path's
    * op-for-op (a commutative groupBy sum would drift in its last ulps).
    * Returns only documents containing ≥1 query term — identical scores
    * to [[bm25TopK]] on those documents (spec-pinned); the scan path also
    * pads with score-0 documents when k exceeds the match count. */
  def bm25TopKIndexed(
      postings: DataFrame, n: Long, avgdl: Double, query: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    val terms: Seq[String] =
      query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")
    if (n == 0L)
      return postings.select(col("id"), lit(0.0).as("score")).limit(0)
    val avgdlSafe = if (avgdl > 0.0) avgdl else 1.0
    val p = postings.filter(col("term").isin(terms: _*))
    val dfs: Map[String, Long] = p.groupBy(col("term"))
      .agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dl = col("dl").cast("double")
    val tf = col("tf").cast("double")
    val termScores = terms.zipWithIndex.map { case (t, i) =>
      val dfT = dfs.getOrElse(t, 0L)
      val idf = log(lit(1.0) +
        (lit((n - dfT).toDouble) + lit(0.5)) / (lit(dfT.toDouble) + lit(0.5)))
      max(when(col("term") === t,
        idf * ((tf * (lit(k1) + lit(1.0))) /
          (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / lit(avgdlSafe))))))
        .as(s"__s$i")
    }
    val pivoted = p.groupBy(col("id")).agg(termScores.head, termScores.tail: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _)
    pivoted.select(col("id"), round(total, roundTo).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
