package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation / phrase mining over adjacent word bigrams — the classic
  * association statistics (PMI, Student's t, Dunning's log-likelihood
  * ratio; Manning & Schütze ch. 5, all public) that a training-data
  * pipeline uses to discover multi-word terms worth protecting from
  * tokenizer splits, to build phrase tables, or to flag templated
  * boilerplate (a handful of hyper-associated bigrams dominating a
  * source is a strong spam signal).
  *
  * Probability convention: the corpus is its bigram multiset of size N;
  * a word's left marginal c1 counts bigrams it BEGINS, its right
  * marginal c2 counts bigrams it ENDS — all three tables fall out of
  * ONE bigram wordcount plus two marginal groupBys over it (bigram-type
  * sized, never corpus-sized). Association math is pure double
  * arithmetic on (cb, c1, c2, N), so the whole table is one shuffle-free
  * pair of key joins after the counts.
  *
  * LLR is the measure that stays calibrated for rare events (Dunning
  * 1993): 2·Σ O·ln(O/E) over the 2×2 contingency table, with the O = 0
  * cells contributing 0 (their limit). E = 0 with O > 0 cannot occur
  * (a zero expectation implies a zero margin implies a zero observed).
  */
object Collocations {

  /** Full association table: (bigram, cb, c1, c2, pmi, tscore, llr),
    * restricted to bigrams with cb ≥ `minCount` (the standard noise
    * floor — PMI is degenerate on singletons). Doubles are computed in
    * one fixed expression shape (cast-first, left-associative) so an
    * engine re-deriving the same counts reproduces them bit-for-bit;
    * products run in DOUBLE from the first factor because c·N overflows
    * a long at corpus scale. All three statistics round to 6. */
  def collocations(
      corpus: DataFrame, textCol: String, minCount: Long = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bg = corpus
      .select(explode(LanguageModel.bigramsOf(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cb"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .persist()
    val left = bg.groupBy("w1").agg(sum(col("cb")).as("c1"))
    val right = bg.groupBy("w2").agg(sum(col("cb")).as("c2"))
    val n = bg.agg(coalesce(sum(col("cb")), lit(0L)).as("n"))
    val cb = col("cb").cast("double")
    val c1 = col("c1").cast("double")
    val c2 = col("c2").cast("double")
    val nn = col("n").cast("double")
    // O/E cells of the 2x2 table, every product started in double
    def ll(o: Column, e: Column): Column =
      when(o > 0.0, o * log(o / e)).otherwise(lit(0.0))
    val o11 = cb
    val o12 = c1 - cb
    val o21 = c2 - cb
    val o22 = nn - c1 - c2 + cb
    val e11 = c1 * c2 / nn
    val e12 = c1 * (nn - c2) / nn
    val e21 = (nn - c1) * c2 / nn
    val e22 = (nn - c1) * (nn - c2) / nn
    bg.filter(col("cb") >= minCount)
      .join(left, "w1")
      .join(right, "w2")
      .crossJoin(broadcast(n))
      .select(col("bigram"), col("cb"), col("c1"), col("c2"),
        round(log(cb * nn / (c1 * c2)), 6).as("pmi"),
        round((cb - c1 * c2 / nn) / sqrt(cb), 6).as("tscore"),
        round(lit(2.0) * (ll(o11, e11) + ll(o12, e12) +
          ll(o21, e21) + ll(o22, e22)), 6).as("llr"))
  }

  /** Top-k collocations by (llr desc, bigram asc) — the deterministic
    * phrase-table cut. One TakeOrderedAndProject over the association
    * table: per-partition heads, k rows to the driver, never a full
    * sort. */
  def topCollocations(
      corpus: DataFrame, textCol: String, k: Int,
      minCount: Long = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    collocations(corpus, textCol, minCount)
      .orderBy(col("llr").desc, col("bigram"))
      .limit(k)
  }
}
