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
  private def bigramsOf(textCol: org.apache.spark.sql.Column)
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
}
