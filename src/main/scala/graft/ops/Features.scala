package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick (Weinberger et al. 2009, public): map an unbounded
  * token vocabulary onto a FIXED feature dimension by hashing each token
  * to a bucket and counting — no dictionary to build, broadcast, or keep
  * in sync, which is what makes it the vectorizer for 100 TB corpora (a
  * dictionary encoder needs a vocabulary pass + a broadcast that grows
  * with the corpus; the hash needs neither). Pairs with
  * [[graft.stats.Logistic]] for fully in-engine classifier training:
  * hash-featurize → IRLS fit (one moment aggregate per step) → codegen'd
  * scoring expression, no model export round-trip.
  *
  * Everything is a pure Column expression over the row's own tokens —
  * stateless, shuffle-free, and streaming-safe (the same expressions
  * score a micro-batch).
  */
object Features {

  /** Per-token bucket in [0, dim): xxhash64 of the token, mod dim. One
    * hash per token (compute once, derive counts from it). */
  def tokenBuckets(text: Column, dim: Int): Column = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    transform(TextOps.tokens(text),
      t => pmod(xxhash64(t), lit(dim.toLong)).cast("int"))
  }

  /** Length-`dim` array of exact bucket counts (the raw hashed
    * bag-of-words; Σ counts == token count, spec-pinned). O(dim · tokens)
    * comparisons per row over the precomputed bucket array — the
    * interpreted-HOF hazard: this form stays as the SPEC MIRROR of the
    * native one-pass [[graft.functions.TokenBow]] (bit-identical,
    * FeaturesSpec-pinned), which [[hashedBow]] actually uses. */
  def bucketCounts(buckets: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => size(filter(buckets, b => b === j)))

  /** The standard ln(1+count) damping as the model feature value: keeps
    * one runaway token from dominating the linear predictor. */
  def logCount(counts: Column, j: Int): Column =
    log1p(element_at(counts, j + 1).cast("double"))

  /** Attach hashed bag-of-words features to `df`: returns the frame with
    * a `__graft_bow` counts column plus the (name, expression) pairs in
    * the shape [[graft.stats.Logistic.fit]] consumes. The counts come
    * from the NATIVE one-pass [[graft.functions.TokenBow]] expression
    * (bit-identical buckets to the compositional
    * `bucketCounts(tokenBuckets(...))` form, which stays as the spec
    * mirror): the interpreted form re-traverses the bucket array once
    * per output bucket — O(dim · tokens) with per-element closures, the
    * exact hazard [[graft.functions.CharGramBow]] killed for char grams
    * — while the native pass is O(token bytes). */
  def hashedBow(df: DataFrame, textCol: String, dim: Int,
      prefix: String = "h"): (DataFrame, Seq[(String, Column)]) = {
    val out = df.withColumn("__graft_bow",
      graft.functions.TokenBow(df.sparkSession, col(textCol), dim))
    val feats = (0 until dim).map(j =>
      s"$prefix$j" -> logCount(col("__graft_bow"), j))
    (out, feats)
  }
}
