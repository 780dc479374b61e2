package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-relative language-model quality scoring: train a unigram model on
  * a reference corpus, score documents by their mean token log-probability
  * — the cheap stand-in for perplexity-based quality filtering (CCNet/
  * Gopher-style pipelines use a KenLM n-gram model; the unigram variant
  * keeps the same decision shape with pure engine arithmetic and no model
  * artifact). Low scores flag documents whose vocabulary is unusual
  * relative to the reference — boilerplate, wrong-language, or garbage.
  *
  * Scale shape: training is one map-side-combined wordcount (vocab-sized
  * output, shuffled by token) + one tiny stats aggregate; scoring explodes
  * tokens once, joins the vocab on the token key (AQE broadcasts when the
  * vocab fits — millions of rows is typical and broadcastable; beyond
  * that, the join degrades gracefully to shuffle), and aggregates one mean
  * per document. Nothing touches the driver except two scalars.
  */
object LanguageModel {

  /** Trained unigram model: per-token counts plus the two scalars the
    * add-one-smoothed probability needs. */
  final case class Unigram(vocab: DataFrame, totalTokens: Long, vocabSize: Long)

  /** One wordcount pass over `textCol` (whitespace tokens, lowercased). */
  def train(corpus: DataFrame, textCol: String): Unigram = {
    val vocab = corpus
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val stats = vocab.agg(
      coalesce(sum(col("c")), lit(0L)).as("tt"), count(lit(1)).as("vs")).head()
    Unigram(vocab, stats.getLong(0), stats.getLong(1))
  }

  /** `(id, n_tokens, logprob)` where `logprob` is the mean over the doc's
    * tokens of ln((c + 1)/(T + V)) — add-one smoothing, so out-of-vocabulary
    * tokens in NEW documents score ln(1/(T+V)) instead of −∞. Documents
    * with no tokens score 0.0 (no evidence). Rounded to 6 decimals: the
    * mean is a cross-row double aggregate whose addition order is not
    * deterministic; same-sign ln terms keep the reordering error at
    * machine-epsilon scale, absorbed by the rounding. */
  def scoreBy(lm: Unigram, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // empty reference model (T = V = 0): ln((c+1)/0) would be +Inf for
    // every token; flooring the denominator at 1 makes an evidence-free
    // model score every token ln(1) = 0 — the same "no evidence" value
    // empty documents get
    val denom = lit(math.max(lm.totalTokens + lm.vocabSize, 1L).toDouble)
    val tok = docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
    // n_tokens rides the same aggregate — the text is tokenized ONCE
    val perDoc = tok.join(lm.vocab, Seq("t"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log((coalesce(col("c"), lit(0L)) + lit(1.0)) / denom)).as("lp"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("lp"), lit(0.0)), 6).as("logprob"))
  }

  /** Self-scoring convenience: train on `df` and score `df` with it. */
  def selfScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreBy(train(df, textCol), df, idCol, textCol)

  /** Trained bigram model: the unigram base plus per-bigram counts
    * (keyed on the "w1 w2" string). */
  final case class Bigram(unigram: Unigram, bigrams: DataFrame)

  /** ALL word bigrams in order, duplicates kept — the LM needs the
    * multiset, so this is NOT [[TextOps.shingles]] (which dedupes for
    * Jaccard). The size<2 guard matters: sequence(0, -1) would DESCEND. */
  private[ops] def bigramsOf(textCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val w = TextOps.tokens(lower(textCol))
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2),
        i => concat(get(w, i), lit(" "), get(w, i + 1))))
  }

  /** One additional bigram-count pass on top of [[train]]. */
  def trainBigram(corpus: DataFrame, textCol: String): Bigram = {
    val bg = corpus
      .select(explode(bigramsOf(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    Bigram(train(corpus, textCol), bg)
  }

  /** `(id, n_bigrams, logprob)`: mean over the doc's word bigrams of
    * ln((c(w1 w2) + 1)/(c(w1) + V)) — the conditional add-one bigram
    * probability (V = unigram vocab size), one step closer to the KenLM
    * perplexity filter than [[scoreBy]]'s unigram. Scoring is two key
    * joins (bigram count, context unigram count — both vocab-sized,
    * AQE-broadcast when they fit) and one mean per document; docs with
    * fewer than two tokens score 0 (no evidence). */
  def scoreBigram(
      lm: Bigram, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // same empty-model floor as scoreBy: V = 0 with an unseen context
    // (cu null→0) would divide by zero
    val v = lit(math.max(lm.unigram.vocabSize, 1L).toDouble)
    val ctxVocab = lm.unigram.vocab
      .select(col("t").as("ctx"), col("c").as("cu"))
    val perDoc = docs
      .select(col(idCol).as("id"), explode(bigramsOf(col(textCol))).as("bg"))
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .join(lm.bigrams, Seq("bg"), "left")
      .join(ctxVocab, Seq("ctx"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)) + v))).as("lp"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("lp"), lit(0.0)), 6).as("logprob"))
  }

  /** Bigram self-scoring convenience. */
  def selfScoreBigram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreBigram(trainBigram(df, textCol), df, idCol, textCol)

  /** Trained interpolated Kneser–Ney bigram model (Chen & Goodman 1998,
    * the smoothing KenLM defaults to — the real CCNet filter's model
    * family, where [[scoreBigram]]'s add-one is only the decision-shape
    * stand-in). All four tables are vocab-/bigram-type-sized count
    * tables, never row-count-sized:
    *  - `bigrams` (bg, cb): raw bigram counts;
    *  - `contexts` (ctx, cw, fanout): per-context total count and
    *    distinct-continuation fanout N1+(ctx ·) — ONE groupBy over the
    *    bigram table;
    *  - `continuation` (nxt, nc): N1+(· w), how many distinct contexts
    *    precede w — the KN insight that "Francisco" is frequent but
    *    follows only "San";
    *  - scalars: B bigram types, V unigram vocab size, and the
    *    estimated discount D = n1/(n1 + 2·n2) from the count-of-counts
    *    (0 when the corpus has no singleton/doubleton bigrams).
    *
    * The continuation probability is add-one smoothed over the vocab,
    * pc(w) = (N1+(· w) + 1)/(B + V), which keeps it EXACTLY normalized
    * (Σ_vocab (nc+1) = B + V) so the interpolated conditional sums to 1
    * over the training vocab — the toy-spec invariant — while
    * out-of-vocabulary words still score the small floor 1/(B + V)
    * instead of −∞. */
  final case class KneserNey(
      bigrams: DataFrame, contexts: DataFrame, continuation: DataFrame,
      bigramTypes: Long, vocabSize: Long, discount: Double)

  // KN runs THREE corpus passes, so a compact input must widen first
  // (graft.core.Parallelism — the shared covariance-lesson guard)
  private def widen(df: DataFrame): DataFrame =
    graft.core.Parallelism.widen(df)

  /** Two groupBy passes over the bigram multiset plus one distinct-token
    * count; the bigram type table persists across its three consumers so
    * the corpus tokenizes exactly once. */
  def trainKneserNey(corpus0: DataFrame, textCol: String): KneserNey = {
    val corpus = widen(corpus0)
    val parts = corpus
      .select(explode(bigramsOf(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
      // tokens contain no whitespace, so bg is exactly "w1 w2"
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .withColumn("nxt", substring_index(col("bg"), " ", -1))
      .persist()
    val contexts = parts.groupBy("ctx")
      .agg(sum(col("cb")).as("cw"), count(lit(1)).as("fanout"))
    val continuation = parts.groupBy("nxt").agg(count(lit(1)).as("nc"))
    val sc = parts.agg(count(lit(1)).as("b"),
      coalesce(sum(when(col("cb") === 1, 1L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("cb") === 2, 1L)), lit(0L)).as("n2")).head()
    val v = corpus
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
      .agg(count_distinct(col("t"))).head().getLong(0)
    val (b, n1, n2) = (sc.getLong(0), sc.getLong(1), sc.getLong(2))
    val d = if (n1 + 2 * n2 == 0) 0.0 else n1.toDouble / (n1 + 2 * n2)
    KneserNey(parts.select("bg", "cb"), contexts, continuation, b, v, d)
  }

  /** `(id, n_bigrams, logprob, perplexity)`: per-bigram interpolated KN
    * probability
    *   seen ctx:  max(c(w1 w2) − D, 0)/c(w1) + (D·N1+(w1 ·)/c(w1))·pc(w2)
    *   OOV ctx:   pc(w2)
    * with pc(w2) = (N1+(· w2) + 1)/(B + V); logprob is the 6-rounded
    * mean ln p, perplexity = exp(−logprob) rounded to 6 (computed FROM
    * the rounded mean so both engines exponentiate the same double).
    * Docs with fewer than two tokens score logprob 0, perplexity 1 (no
    * evidence). Scoring is three vocab-sized key joins (AQE broadcasts
    * each when it fits) and one mean per document — the corpus shuffles
    * only its exploded bigram keys, nothing driver-side but scalars. */
  def scoreKneserNey(
      lm: KneserNey, docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = widen(docs0)
    val d = lit(lm.discount)
    val bPlusV = lit(math.max(lm.bigramTypes + lm.vocabSize, 1L).toDouble)
    val pc = (coalesce(col("nc"), lit(0L)) + lit(1.0)) / bPlusV
    val p = when(col("cw").isNotNull,
        greatest(coalesce(col("cb"), lit(0L)) - d, lit(0.0)) / col("cw") +
          d * col("fanout") / col("cw") * pc)
      .otherwise(pc)
    val perDoc = docs
      .select(col(idCol).as("id"), explode(bigramsOf(col(textCol))).as("bg"))
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .withColumn("nxt", substring_index(col("bg"), " ", -1))
      .join(lm.bigrams, Seq("bg"), "left")
      .join(lm.contexts, Seq("ctx"), "left")
      .join(lm.continuation, Seq("nxt"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(log(p)).as("lp"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("lp"), lit(0.0)), 6).as("logprob"))
      .withColumn("perplexity", round(exp(-col("logprob")), 6))
  }

  /** KN self-scoring: the train→score composition with the two training
    * scalar passes (count-of-counts over the persisted bigram-type table
    * and the distinct-token vocab — different bases, so they cannot share
    * one aggregate) overlapped as concurrent jobs (guide §2.6; they were
    * two sequential driver barriers). The exploded per-doc bigram
    * instances are deliberately NOT cached between training and scoring:
    * they are corpus-sized, and a narrow re-explode is the cheaper side
    * of the cache-vs-recompute trade at scale (guide §5) — measured at
    * sf0.1 the data-sized persist variant was net slower.
    *
    * Self-score coverage is TOTAL: every scored bigram instance is, by
    * construction, a bigram TYPE of the same corpus. So instead of
    * [[scoreKneserNey]]'s three instance-side joins (bg, ctx, nxt — each
    * a full pass over the corpus-sized exploded instance table, a full
    * instance shuffle each when the vocab outgrows broadcast), the
    * per-type log-probability ln p(bg) is computed ONCE on the
    * vocabulary-sized type table (two type-sized joins fold contexts and
    * continuation back onto `parts`) and the instance table joins that
    * single (bg, lp) table (guide §2.3/§2.4: 3 instance joins → 1, and
    * the per-instance divisions/log collapse to one lookup). The p
    * arithmetic is the identical expression over identical
    * (cb, cw, fanout, nc, D, B+V) values, so every per-instance double is
    * bit-identical to the unfused form; the per-doc mean's 6-decimal
    * rounding absorbs aggregation-order noise exactly as before. */
  def selfScoreKneserNey(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val corpus = widen(df)
    val parts = corpus
      .select(explode(bigramsOf(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .withColumn("nxt", substring_index(col("bg"), " ", -1))
      .persist()
    val contexts = parts.groupBy("ctx")
      .agg(sum(col("cb")).as("cw"), count(lit(1)).as("fanout"))
    val continuation = parts.groupBy("nxt").agg(count(lit(1)).as("nc"))
    val scF = Future(parts.agg(count(lit(1)).as("b"),
      coalesce(sum(when(col("cb") === 1, 1L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("cb") === 2, 1L)), lit(0L)).as("n2")).head())
    val vF = Future(corpus
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
      .agg(count_distinct(col("t"))).head().getLong(0))
    val sc = Await.result(scF, Duration.Inf)
    val v = Await.result(vF, Duration.Inf)
    val (b, n1, n2) = (sc.getLong(0), sc.getLong(1), sc.getLong(2))
    val d = if (n1 + 2 * n2 == 0) 0.0 else n1.toDouble / (n1 + 2 * n2)
    val dL = lit(d)
    val bPlusV = lit(math.max(b + v, 1L).toDouble)
    // per-TYPE ln p — [[scoreKneserNey]]'s exact p expression (every ctx
    // and nxt of a type row is present in contexts/continuation by
    // construction, so cw/fanout/nc are never null here and the
    // when(cw.isNotNull, ...) branch always takes the seen-context arm,
    // exactly as it does per instance in the unfused form)
    val pc = (coalesce(col("nc"), lit(0L)) + lit(1.0)) / bPlusV
    val p = when(col("cw").isNotNull,
        greatest(coalesce(col("cb"), lit(0L)) - dL, lit(0.0)) / col("cw") +
          dL * col("fanout") / col("cw") * pc)
      .otherwise(pc)
    val typeLp = parts
      .join(contexts, Seq("ctx"))
      .join(continuation, Seq("nxt"))
      .select(col("bg"), log(p).as("__lp"))
    val docs = widen(df)
    val perDoc = docs
      .select(col(idCol).as("id"), explode(bigramsOf(col(textCol))).as("bg"))
      // left join: coverage is total in self-score (see scaladoc), and a
      // left join keeps n_bigrams = instance count under all circumstances
      .join(typeLp, Seq("bg"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("lp"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("lp"), lit(0.0)), 6).as("logprob"))
      .withColumn("perplexity", round(exp(-col("logprob")), 6))
  }

  /** CCNet's head/middle/tail quality buckets: per-language perplexity
    * terciles over the KN self-score, assigned by DETERMINISTIC rank
    * (ORDER BY perplexity, id — engine-portable, unlike ntile on ties)
    * — head is the lowest-perplexity third, the slice CCNet keeps by
    * default. One partitioned window per language (bounded partitions —
    * the per-group window shape, never a global one). Zero-evidence
    * docs (< 2 tokens) rank by their perplexity-1 sentinel like any
    * other row. Returns (id, lang, perplexity, bucket). */
  def ccnetBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = selfScoreKneserNey(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("id"), col(langCol).as("lang")), "id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("perplexity"), col("id"))
    val n = Window.partitionBy(col("lang"))
    scored
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("bucket",
        when(col("__r") * 3 <= col("__n"), "head")
          .when(col("__r") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail"))
      .select(col("id"), col("lang"), col("perplexity"), col("bucket"))
  }
}
