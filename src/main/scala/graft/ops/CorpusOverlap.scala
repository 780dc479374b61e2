package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level CONTENT overlap between two corpora — "how much of crawl B
  * is already in A" asked of the text itself, with no shared ids (the
  * id-keyed complement of [[CorpusDiff]]). Jaccard and containment over
  * distinct word n-grams are the standard corpus-comparison metrics
  * (crawl-snapshot redundancy, source-acquisition valuation, benchmark
  * kinship).
  *
  * Two paths:
  *  - [[exact]]: tag each side's shingles and resolve membership in ONE
  *    hash aggregation keyed by shingle (map-side combine collapses
  *    per-partition repeats before the shuffle) followed by a scalar
  *    rollup. Oracle-checkable; cost is a shuffle of the distinct-shingle
  *    space.
  *  - [[kmvSketch]] / [[estimate]]: a bottom-k (KMV) summary per corpus —
  *    the k smallest unsigned shingle hashes. Sketches are tiny (k
  *    longs), MERGEABLE (union-then-truncate, so per-partition/per-day
  *    sketches fold without revisiting data), and estimate both distinct
  *    cardinalities ((k-1)/u_k) and Jaccard (the share of the union's
  *    bottom-k present in both sides — Bar-Yossef et al. 2002's min-wise
  *    coincidence argument). At 100 TB this is the only shape that
  *    works across snapshots: keep one sketch per snapshot and compare
  *    any pair later without touching either corpus again.
  */
object CorpusOverlap {

  /** One-row exact overlap report: distinct-shingle counts per side,
    * intersection, union, `jaccard`, and directional containments
    * (`containment_a` = share of A's shingles also in B). Empty-vs-empty
    * reports 0.0 everywhere rather than NULL. */
  def exact(
      a: DataFrame, aTextCol: String,
      b: DataFrame, bTextCol: String, n: Int = 3): DataFrame = {
    val sa = a.select(explode(TextOps.shingles(col(aTextCol), n)).as("sg"))
      .select(col("sg"), lit(1).as("in_a"), lit(0).as("in_b"))
    val sb = b.select(explode(TextOps.shingles(col(bTextCol), n)).as("sg"))
      .select(col("sg"), lit(0).as("in_a"), lit(1).as("in_b"))
    sa.union(sb)
      .groupBy("sg")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .agg(
        sum(col("in_a").cast("long")).as("n_a"),
        sum(col("in_b").cast("long")).as("n_b"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_intersect"),
        count(lit(1)).as("n_union"))
      .select(
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
        col("n_union"),
        when(col("n_union") === 0, lit(0.0))
          .otherwise(col("n_intersect").cast("double") / col("n_union"))
          .as("jaccard"),
        when(coalesce(col("n_a"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_intersect").cast("double") / col("n_a"))
          .as("containment_a"),
        when(coalesce(col("n_b"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_intersect").cast("double") / col("n_b"))
          .as("containment_b"))
  }

  /** Bottom-k sketch of a corpus's distinct-shingle hash space: the k
    * smallest xxhash64 values in UNSIGNED order, stored sign-flipped
    * (h ^ Long.MinValue) so Scala/Spark's signed sort IS the unsigned
    * sort. Bounded driver transfer by construction (k longs via
    * TakeOrderedAndProject — per-partition heads, never a full sort).
    * A corpus with fewer than k distinct shingles yields them all (the
    * sketch is then exact). */
  def kmvSketch(
      df: DataFrame, textCol: String, n: Int = 3, k: Int = 4096): Array[Long] = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    df.select(explode(TextOps.shingles(col(textCol), n)).as("sg"))
      .select((xxhash64(col("sg")).bitwiseXOR(lit(Long.MinValue))).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
      .collect().map(_.getLong(0))
  }

  /** Fold two bottom-k sketches into the bottom-k of the union — the
    * mergeability that makes per-snapshot sketches composable. */
  def mergeSketches(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Distinct-cardinality estimate from a bottom-k sketch: exact when the
    * sketch is unsaturated; else (k-1)/u_k with u_k the k-th smallest
    * hash as a (0,1) fraction. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double = {
    require(sketch.length <= k, s"sketch larger than k: ${sketch.length} > $k")
    if (sketch.length < k) sketch.length.toDouble
    else {
      val uk = (sketch.last.toDouble / 18446744073709551616.0) + 0.5
      (k - 1).toDouble / uk
    }
  }

  /** foreachBatch accumulator folding per-micro-batch KMV sketches over an
    * unbounded ingest stream — live snapshot cardinality/overlap with NO
    * state store: the sketch is k longs, and [[mergeSketches]] is
    * associative, commutative, and IDEMPOTENT (it dedupes hashes), so an
    * at-least-once source redelivering a micro-batch cannot bias the
    * estimate — the property counting accumulators (the MG summary sink)
    * fundamentally lack. Wire with
    * `stream.writeStream.foreachBatch(sink)`; read `ref.get()` any time
    * and compare against another snapshot's sketch via [[estimate]]. */
  def runningSketchSink(textCol: String, n: Int = 3, k: Int = 4096):
      (java.util.concurrent.atomic.AtomicReference[Array[Long]],
        (DataFrame, Long) => Unit) = {
    val ref = new java.util.concurrent.atomic.AtomicReference(Array.empty[Long])
    val fn = (batch: DataFrame, _: Long) => {
      val s = kmvSketch(batch, textCol, n, k)
      ref.updateAndGet(prev => mergeSketches(prev, s, k))
      ()
    }
    (ref, fn)
  }

  /** (jaccard, distinct_a, distinct_b) estimates from two sketches built
    * with the same `n` and `k`: the union's bottom-k is a uniform sample
    * of A∪B's hash space, so the fraction of it present in BOTH input
    * sketches estimates |A∩B|/|A∪B|. */
  def estimate(a: Array[Long], b: Array[Long], k: Int): (Double, Double, Double) = {
    val union = mergeSketches(a, b, k)
    val inBoth =
      if (union.isEmpty) 0
      else {
        val sa = a.toSet; val sb = b.toSet
        union.count(h => sa.contains(h) && sb.contains(h))
      }
    val j = if (union.isEmpty) 0.0 else inBoth.toDouble / union.length
    (j, estimateDistinct(a, k), estimateDistinct(b, k))
  }

  /** Distributional divergence between the two corpora's unigram token
    * distributions (Kullback & Leibler 1951; Jensen–Shannon per Lin
    * 1991 — public): where [[exact]] asks "how much content is
    * shared?", this asks "how differently do they WRITE?" — the domain
    * shift signal behind mixture reweighting and drift alarms (the
    * token-level sibling of [[graft.stats.Drift]]'s feature-level PSI).
    *
    * Laplace-smoothed over the union vocabulary: pₐ = (cₐ+1)/(Nₐ+V),
    * so both KLs are finite even on disjoint vocabularies. One tagged
    * wordcount aggregation (map-side combined, shuffle vocabulary-
    * sized), scalars via a broadcast 1-row aggregate, per-token ln
    * terms rounded to 9 and folded in decimal — the established
    * cross-engine recipe, so the DuckDB oracle rebuilds every number. Output one row: vocabulary
    * and token totals, kl_ab, kl_ba, js (JS in nats, bounded by ln 2),
    * all rounded to 8. */
  def divergence(
      a: DataFrame, aTextCol: String,
      b: DataFrame, bTextCol: String): DataFrame = {
    val ta = a.select(explode(TextOps.tokens(col(aTextCol))).as("tok"))
      .select(col("tok"), lit(1L).as("ca"), lit(0L).as("cb"))
    val tb = b.select(explode(TextOps.tokens(col(bTextCol))).as("tok"))
      .select(col("tok"), lit(0L).as("ca"), lit(1L).as("cb"))
    val counts = ta.union(tb).groupBy("tok")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
    // The three scalars (vocab size, token totals) are one 1-row
    // aggregate broadcast back onto the vocabulary table — NOT a
    // Window.partitionBy(), which would funnel the entire (web-scale:
    // 10⁸–10⁹ row) vocabulary through a single task. Same idiom as
    // Standardize.quantileNormalizeByGroup. counts is computed twice
    // (totals pass + term pass); both are map-side-combined wordcounts,
    // cheaper at scale than one single-task sort.
    val totals = counts.agg(
      count(lit(1)).as("v"),
      sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"))
    val withTotals = counts.crossJoin(broadcast(totals))
    val pa = (col("ca") + 1).cast("double") / (col("na") + col("v"))
    val pb = (col("cb") + 1).cast("double") / (col("nb") + col("v"))
    val pm = (pa + pb) / lit(2.0)
    def fold(term: org.apache.spark.sql.Column) =
      sum(round(term, 9).cast("decimal(38,12)")).cast("double")
    withTotals
      .agg(
        max(col("v")).as("vocab"),
        max(col("na")).as("tokens_a"),
        max(col("nb")).as("tokens_b"),
        fold(pa * log(pa / pb)).as("__klab"),
        fold(pb * log(pb / pa)).as("__klba"),
        fold(lit(0.5) * (pa * log(pa / pm) + pb * log(pb / pm)))
          .as("__js"))
      .select(col("vocab"), col("tokens_a"), col("tokens_b"),
        round(col("__klab"), 8).as("kl_ab"),
        round(col("__klba"), 8).as("kl_ba"),
        round(col("__js"), 8).as("js"))
  }

  /** Corpus keyness (Dunning 1993 log-likelihood keywords, public): per
    * term, the 2-cell G² of its rate in corpus A vs corpus B, signed by
    * direction — "WHICH words changed", the term-level drill-down
    * behind [[divergence]]'s one-number drift. The standard snapshot
    * diff for a training corpus: a new boilerplate flood or topic shift
    * surfaces as its vocabulary, ranked.
    *
    * Shape: two map-side-combined wordcounts union into one vocabulary
    * rollup (the [[divergence]] idiom — totals broadcast, no window);
    * per-term G = 2·[a·ln(a/E_a) + b·ln(b/E_b)] from exact integers
    * (zero cells contribute 0 — lim x·ln x), rounded to 9 with a
    * deterministic (G DESC, term ASC) top-k cut. Terms below `minCount`
    * total occurrences are dropped (rare-word G is noise). Returns ≤ k
    * rows (term, count_a, count_b, g_score, direction ∈ {a, b}). */
  def keynessTopK(
      a: DataFrame, aTextCol: String, b: DataFrame, bTextCol: String,
      topK: Int = 25, minCount: Long = 10L): DataFrame = {
    require(topK >= 1 && minCount >= 1, s"topK/minCount must be >= 1")
    val ta = a.select(explode(TextOps.tokens(col(aTextCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("tok"), lit(1L).as("ca"), lit(0L).as("cb"))
    val tb = b.select(explode(TextOps.tokens(col(bTextCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("tok"), lit(0L).as("ca"), lit(1L).as("cb"))
    val counts = ta.union(tb).groupBy("tok")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"))
    val t = counts.filter(col("ca") + col("cb") >= minCount)
      .crossJoin(broadcast(totals))
    val ea = (col("ca") + col("cb")).cast("double") * col("na") /
      (col("na") + col("nb"))
    val eb = (col("ca") + col("cb")).cast("double") * col("nb") /
      (col("na") + col("nb"))
    val term = (c: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column) =>
      when(c > 0, c.cast("double") * log(c.cast("double") / e))
        .otherwise(0.0)
    t.select(col("tok").as("term"), col("ca").as("count_a"),
        col("cb").as("count_b"),
        round(lit(2.0) * (term(col("ca"), ea) + term(col("cb"), eb)), 9)
          .as("g_score"),
        when(col("ca").cast("double") * col("nb") >
          col("cb").cast("double") * col("na"), "a").otherwise("b")
          .as("direction"))
      .orderBy(col("g_score").desc, col("term").asc)
      .limit(topK)
  }
}
