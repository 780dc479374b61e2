package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, public): a depth × width
  * counter grid answering "how often did key x occur?" in O(depth) with
  * one-sided error — estimates NEVER undercount, and overcount beyond
  * ε·N = (e/width)·N has probability ≤ e^(−depth) per query. The mirror
  * image of [[HeavyHitters]]' Misra–Gries summaries (which only ever
  * UNDERcount): a pipeline tracks frequent tokens with MG and answers
  * point queries about arbitrary keys — including ones MG evicted — with
  * CMS. Counters are additive, so sketches of corpus shards merge by
  * counter-wise sum into exactly the sketch of the union.
  *
  * Engineered for the cross-engine gate and for scale:
  *  - Buckets come from the engine-portable md5 identity hash (the
  *    [[Sampling.hashFraction]] family), with the depth index salted into
  *    the hash input — the sketch is a pure function of the data, so two
  *    engines (or a retried stage) build bit-identical counter tables.
  *  - The sketch IS a DataFrame of (depth, bucket, cnt) nonzero counters
  *    (sparse: absent = 0): building it is one explode(depth) + one hash
  *    aggregation — map-side combined, shuffle bounded by
  *    partitions × depth × width regardless of row count.
  *  - Point queries join the (tiny, ≤ depth × width rows) sketch
  *    broadcast against the query keys: one narrow pass over the keys.
  */
object CountMin {

  /** Counter bucket of `key` at `depthIdx`: first 8 md5 hex chars of
    * "seed|depth|key" as a 32-bit value, modulo width. */
  def bucket(key: Column, depthIdx: Column, width: Int, seed: String): Column =
    pmod(
      conv(substring(md5(concat_ws("|", lit(seed), depthIdx.cast("string"),
        key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(width.toLong))

  /** Build the sketch: one (depth, bucket) hash aggregation over
    * `df[keyCol]` exploded across the `depth` hash rows. NULL keys are
    * excluded (a missing key is not an occurrence). */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 512, seed: String = "graft-cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val depths = explode(array((0 until depth).map(lit): _*)).as("depth")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), depths)
      .select(col("depth"),
        bucket(col("__k"), col("depth"), width, seed).as("bucket"))
      .groupBy("depth", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Counter-wise sum: merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    * exactly (additive — NOT idempotent; see [[runningSketchSink]] for the
    * redelivery-safe streaming fold). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("depth", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query estimates for every row of `keys[keyCol]`: min over the
    * depth counters, with absent counters read as 0. Adds `cms_est`.
    * The sketch side is broadcast — cost is one narrow pass over keys.
    *
    * Contract: `keys` rows must be DISTINCT across its columns (the
    * grouping that reassembles the depth probes collapses duplicates —
    * dedupe first if the frame can repeat; same shape of contract as
    * `Sampling.weightedSample`'s key uniqueness). A NULL key estimates
    * NULL: [[sketch]] defines null keys as non-occurrences, so hashing
    * one (concat_ws drops nulls) would return a collided bucket's count
    * for a key that, by definition, never occurred. */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512,
      seed: String = "graft-cms"): DataFrame = {
    val depths = explode(array((0 until depth).map(lit): _*)).as("depth")
    val est = keys.filter(col(keyCol).isNotNull)
      .withColumn("depth", depths)
      .withColumn("bucket", bucket(col(keyCol), col("depth"), width, seed))
      .join(broadcast(sk), Seq("depth", "bucket"), "left")
      .groupBy(keys.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    est.unionByName(
      keys.filter(col(keyCol).isNull)
        .withColumn("cms_est", lit(null).cast("long")))
  }

  /** Equi-join cardinality estimate from two sketches built with the SAME
    * (depth, width, seed): |A ⋈ B| = min over depths of Σ_bucket
    * cntA·cntB (Cormode & Muthukrishnan's inner-product estimator). Like
    * point queries it NEVER undercounts — collisions only add mass — so
    * it is a safe upper bound for join planning (broadcast/skew
    * decisions) without touching either table again. Terms are decimal:
    * two 10¹¹-row inputs overflow a long product under ANSI. Returns one
    * row (cms_join_est). */
  def joinCardinality(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.alias("a")
      .join(skB.alias("b"), Seq("depth", "bucket"))
      .groupBy("depth")
      .agg(sum(col("a.cnt").cast("decimal(38,0)") *
        col("b.cnt").cast("decimal(38,0)")).as("dot"))
      .agg(min(col("dot")).cast("long").as("cms_join_est"))

  /** foreachBatch accumulator folding per-micro-batch sketches over an
    * unbounded stream. Counters are additive, so a replayed micro-batch
    * would double-count — the fold therefore keys on Structured
    * Streaming's batchId (stable across retries of the same epoch) and
    * skips batches it has already folded, making the accumulator
    * idempotent under at-least-once redelivery. */
  def runningSketchSink(keyCol: String, depth: Int = 4, width: Int = 512,
      seed: String = "graft-cms"):
      (java.util.concurrent.atomic.AtomicReference[Map[(Int, Long), Long]],
        (DataFrame, Long) => Unit) = {
    val ref = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[(Int, Long), Long])
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val fn = (batch: DataFrame, batchId: Long) => {
      if (batchId > seen.get()) {
        val s = sketch(batch, keyCol, depth, width, seed).collect()
          .map(r => (r.getAs[Int]("depth"), r.getAs[Long]("bucket")) ->
            r.getAs[Long]("cnt")).toMap
        ref.updateAndGet { prev =>
          (prev.keySet ++ s.keySet).map { k =>
            k -> (prev.getOrElse(k, 0L) + s.getOrElse(k, 0L))
          }.toMap
        }
        seen.set(batchId)
      }
      ()
    }
    (ref, fn)
  }
}
