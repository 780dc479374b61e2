package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicated-n-gram fraction — the Gopher/FineWeb-family
  * quality signal the WITHIN-document repetition score
  * ([[TextOps.duplicateLineFraction]], txt_repetition) cannot see: for
  * each document, the share of its DISTINCT word n-grams that also occur
  * in at least one other document. Boilerplate, templated spam, and
  * near-duplicate families score high; original prose scores low. The
  * same machinery emits the corpus's n-gram document-frequency table
  * (the input to span-level dedup threshold tuning).
  *
  * Scale shape: one shingle explode (distinct-per-doc, so a doc
  * contributes each n-gram once), one n-gram-keyed document-frequency
  * groupBy (map-side combined; n-gram-type-sized output), one join back
  * on the n-gram key, one per-doc mean — the wordcount shape twice.
  * Nothing is pairwise: the df table mediates all cross-document
  * evidence, so cost is corpus-linear where a naive "shared with any
  * other doc" formulation is quadratic.
  */
object CrossDocNgrams {

  /** (ngram, df) document frequencies over distinct per-doc shingles. */
  def documentFrequencies(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.shingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))

  /** Per-document duplicated-n-gram fraction: (id, n_ngrams, dup_frac)
    * where dup_frac = mean over the doc's distinct n-grams of
    * [df ≥ 2], rounded to 6. Documents with fewer than `n` words carry
    * no n-grams: n_ngrams = 0 and a null fraction (no evidence — the
    * convention every scoring op here follows). */
  def dupNgramFraction(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val exploded = docs.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("ngram"))
    // df as a COUNT WINDOW over the ngram key instead of
    // groupBy(ngram) + join-back: the join form evaluated the
    // scan+shingle explode twice (no exchange reuse across the
    // differently-pruned subtrees — r19 plan audit: 3 parquet scans) and
    // paid the type-table exchange on top of the instance exchange; the
    // window form shingles once and shuffles the instances once
    // (guide §2.4 — two operations keyed the same way share one
    // exchange). df per instance is the identical count, so n_ngrams and
    // the [df ≥ 2] mean are unchanged row for row.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ngram"))
    val perDoc = exploded
      .withColumn("df", count(lit(1)).over(w))
      .groupBy("id")
      .agg(count(lit(1)).as("n_ngrams"),
        round(avg(when(col("df") >= 2, 1.0).otherwise(0.0)), 6)
          .as("dup_frac"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        col("dup_frac"))
  }
}
