package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH bucketed variant as the scale path (candidates ≈ bucket-mates, so
  * the pair space is ~n²/2^bits instead of n²; recall is tunable via bits
  * and multiprobe).
  *
  * Cosine rides the native [[graft.functions.DotProduct]] expression
  * (whole-stage codegen; the compositional `zip_with` + `aggregate` form is
  * interpreted and was the hot path's bottleneck) — bit-compatible with the
  * sequential left-fold the DuckDB oracle's list arithmetic performs, so
  * results still hash-match.
  */
object Similarity {

  /** Native sequential-left-fold dot product (see
    * [[graft.functions.DotProduct]] for the exact null/length algebra). */
  def dot(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    call_function("graft_dot", a, b)
  }

  def norm2(a: Column): Column = dot(a, a)

  /** Native one-pass L2 normalization (see [[graft.functions.L2Normalize]]
    * for the exact compositional-form parity contract). */
  def l2normalize(a: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2norm", exprs => graft.functions.L2Normalize(exprs(0)),
      "built-in")
    call_function("graft_l2norm", a)
  }

  /** cosine = dot / (sqrt(||a||²) * sqrt(||b||²)); null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(norm2(a)); val nb = sqrt(norm2(b))
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))
  }

  /** Exact top-k neighbors for each query id: the query side is broadcast
    * (queries are few), the corpus scan streams — one pass, no shuffle of
    * the corpus. Returns (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, k: Int = 10): DataFrame = {
    val corpus = df.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
    val queries = df.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttner, SIGIR 2009 —
    * public): combine per-query ranked lists from heterogeneous
    * retrievers (BM25, dense ANN, a recency prior, ...) by score
    * Σ_lists 1/(kConst + rank) — rank-based, so no score normalization
    * across retrievers is ever needed; kConst = 60 is the paper's
    * robust default. The standard hybrid-search merge in front of a
    * re-ranker ([[graft.functions.MmrSelect]] composes downstream).
    *
    * Inputs: each DataFrame carries (queryCol, idCol, rankCol) with
    * 1-based ranks; a (query, id) absent from a list simply contributes
    * nothing. One union + one hash aggregation (map-side combined,
    * shuffle bounded by Σ list sizes) + one per-query window cut —
    * candidate lists in, candidate lists out, never the corpus.
    * Reciprocal terms are rounded to 12 and decimal-folded so the fused
    * score is order-invariant and engine-portable; ties break on id.
    * Returns (qid, rank, nid, rrf, n_lists). */
  def rrfFuse(lists: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(kConst >= 1 && topK >= 1, s"bad kConst=$kConst topK=$topK")
    val tagged = lists.map(_.select(col(queryCol).as("qid"),
        col(idCol).as("nid"), col(rankCol).cast("int").as("__r")))
      .reduce(_ unionByName _)
    val scored = tagged
      .groupBy("qid", "nid")
      .agg(
        sum(round(lit(1.0) / (col("__r") + lit(kConst)), 12)
          .cast("decimal(38,14)")).cast("double").as("__s"),
        count(lit(1)).as("n_lists"))
      .withColumn("rrf", round(col("__s"), 9))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "rrf", "n_lists")
  }

  /** Borda-count fusion (de Borda 1781 — the positional twin of
    * [[rrfFuse]]'s reciprocal weighting): an item at rank r in a list
    * truncated at `listK` earns `listK − r + 1` points, absent earns 0;
    * per-query totals rank the fused list. ALL-INTEGER arithmetic — no
    * rounding contract to maintain at all, and the fused score is
    * trivially summation-order-invariant, which makes Borda the
    * default when the rankers' score scales are garbage but their
    * ORDER is trusted. Same candidate-list-sized shuffles as RRF.
    * Returns (qid, rank, nid, borda, n_lists); ties break on id. */
  def bordaFuse(lists: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, listK: Int, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(listK >= 1 && topK >= 1, s"bad listK=$listK topK=$topK")
    val tagged = lists.map(_.select(col(queryCol).as("qid"),
        col(idCol).as("nid"), col(rankCol).cast("int").as("__r")))
      .reduce(_ unionByName _)
    val scored = tagged
      .filter(col("__r") <= listK)
      .groupBy("qid", "nid")
      .agg(sum(lit(listK) - col("__r") + 1).cast("long").as("borda"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("borda").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "borda", "n_lists")
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query row, the `k` most-cosine-similar corpus rows with a DIFFERENT
    * label — the highest-loss negatives a triplet/InfoNCE batch builder
    * wants (random negatives are mostly easy; the near-boundary ones are
    * the gradient signal). Same plan shape as [[bruteForceTopK]]: the
    * query side broadcasts, the corpus streams in one pass; at 100 TB use
    * an ANN shortlist ([[annTopK]]/[[graft.ops.Ivf]]) and post-filter
    * labels when even one corpus pass per query batch is too wide.
    * A NULL label never pairs (unknown labels can't be asserted
    * different). Returns (qid, q_label, rank, nid, n_label, cosine). */
  def hardNegatives(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queryFilter: Column, k: Int = 10): DataFrame = {
    val corpus = df.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nv"), col(labelCol).as("n_label"))
    val queries = df.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"),
        col(labelCol).as("q_label"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("n_label").isNotNull && col("q_label").isNotNull &&
        col("n_label") =!= col("q_label"))
      .select(col("qid"), col("q_label"), col("nid"), col("n_label"),
        cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "q_label", "rank", "nid", "n_label", "cosine")
  }

  /** Random-hyperplane signature buckets: `bits` seeded hyperplanes; bucket
    * = integer of sign bits. Deterministic via seed. Output keeps the
    * (cast) vector for downstream scoring. */
  def hyperplaneBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, seed: Long = 42): DataFrame =
    hyperplaneBucketTables(df, idCol, vecCol, bits, tables = 1, seed)
      .withColumn("bucket", col("buckets").getItem(0)).drop("buckets")

  /** OR-construction signatures: `tables` independent `bits`-bit hyperplane
    * signatures per row, as one `buckets` array column — all tables computed
    * in a single pass over the vectors. A near pair collides when ANY table
    * agrees (P = 1-(1-p^bits)^tables, p = 1-θ/π), the same AND/OR structure
    * as MinHash banding. */
  def hyperplaneBucketTables(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, seed: Long = 42): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val dim = v.select(size(col("v"))).head().getInt(0)
    val rnd = new java.util.Random(seed)
    val bucketCols = (0 until tables).map { _ =>
      val planes: Seq[Array[Double]] =
        Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
      planes.zipWithIndex.map { case (p, i) =>
        val planeCol = array(p.map(lit): _*)
        when(dot(col("v"), planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    v.withColumn("buckets", array(bucketCols: _*))
  }

  /** ANN top-k via hyperplane LSH with hamming-`multiprobe` probing: each
    * query probes its own bucket plus every bucket within `multiprobe` sign
    * flips — near neighbors that straddle a few hyperplanes are recovered.
    * At bits=4/multiprobe=2 that is 11/16 of the bucket space per query and
    * ≳0.8 expected recall on cos≥0.3 neighbors; candidate growth is
    * Σ_{j≤r} C(bits,j) probes, all on the (broadcast) query side. Each
    * corpus row still has ONE bucket, so no candidate dedup is needed. */
  def annTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, k: Int = 10, bits: Int = 6, seed: Long = 42,
      multiprobe: Int = 2): DataFrame = {
    val bucketed = hyperplaneBuckets(df, idCol, vecCol, bits, seed)
    val qids = df.filter(queryFilter).select(col(idCol).as("qid0"))
    val queries = bucketed.join(broadcast(qids), col("id") === col("qid0"))
      .select(col("id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
    // all XOR masks over `bits` positions with popcount ≤ multiprobe
    val masks = (0 until (1 << bits)).filter(m =>
      java.lang.Integer.bitCount(m) <= multiprobe)
    val probeCols: Seq[Column] =
      masks.map(m => col("qbucket").bitwiseXOR(lit(m.toLong)))
    val probed = queries.select(col("qid"), col("qv"),
      explode(array(probeCols: _*)).as("qbucket"))
    val scored = bucketed.join(broadcast(probed),
        col("bucket") === col("qbucket") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cosine(col("qv"), col("v")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** Per-label embedding centroids — `Summarizer.mean` over ml vectors is
    * the distributed per-group vector mean (ONE pass, map-side combined
    * vector sums; no per-dimension explode/shuffle of n×d rows). Returns
    * (label, centroid array<double>). */
  def labelCentroids(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    df.select(col(labelCol).as("label"),
        array_to_vector(col(vecCol).cast("array<double>")).as("__f"))
      .groupBy("label")
      .agg(Summarizer.mean(col("__f")).as("__m"))
      .select(col("label"), vector_to_array(col("__m")).as("centroid"))
  }

  /** Label confusion in embedding space: pairwise cosine between label
    * centroids — high off-diagonal cosine = labels a linear probe will
    * confuse. Centroids are rounded BEFORE the cosine so any engine
    * computes the same similarity from the same inputs; the pair join is
    * labels² — tiny by premise. */
  def labelConfusion(
      df: DataFrame, labelCol: String, vecCol: String,
      roundTo: Int = 6): DataFrame = {
    val r = labelCentroids(df, labelCol, vecCol)
      .select(col("label"),
        transform(col("centroid"), x => round(x, roundTo)).as("c"))
    val a = r.select(col("label").as("la"), col("c").as("ca"))
    val b = r.select(col("label").as("lb"), col("c").as("cb"))
    a.join(b, col("la") < col("lb"))
      .select(col("la"), col("lb"),
        round(cosine(col("ca"), col("cb")), roundTo).as("cosine"))
      .orderBy("la", "lb")
  }

  /** Farthest-point-sampled coreset (k-center greedy — Gonzalez 1985;
    * Sener & Savarese 2018 for training-set selection, both public): a
    * diversity sample where each pick is the row FARTHEST (squared L2)
    * from everything already selected — the complement of
    * [[graft.ops.KMeans.prunePrototypes]]' redundancy pruning, and a
    * 2-approximation of the optimal k-center cover.
    *
    * Deterministic and engine-portable end to end: the seed is the
    * min-identity-hash row ([[Sampling.hashHex]] order — the k-means init
    * discipline), each iteration's min-distance expression inlines the
    * selected vectors as literals over the native sequential-fold dot
    * (|x|² − 2·x·s + |s|², the SQL-mirrorable form), and the argmax
    * tie-breaks on id — so the DuckDB oracle can replay the whole greedy
    * recurrence as unrolled CTEs and match raw doubles.
    *
    * Scale shape: k scans, each a narrow codegen'd map + a top-1
    * reduction (TakeOrdered — no shuffle of the data); driver traffic is
    * one (id, vector) row per iteration. Cache the projected input for
    * the k passes when it is not already materialized. */
  private val mmrSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** MMR-diversified retrieval: exact cosine shortlist per query, then
    * the [[graft.functions.MmrSelect]] greedy inside each query's row —
    * argmax λ·cos(q,d) − (1−λ)·max_{s∈picked} cos(d,s), k picks. Plan
    * shape: the [[bruteForceTopK]] scan, one broadcast join of the tiny
    * (queries × shortlist) id set against the corpus to fetch candidate
    * vectors, one groupBy(qid) collect, then a narrow map — the greedy
    * never shuffles and parallelizes across queries. Returns
    * (qid, sel_rank, nid, score) with sel_rank starting at 0. */
  def mmrRerank(
      df: DataFrame, idCol: String, vecCol: String, queryFilter: Column,
      k: Int, lambda: Double, shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val top = bruteForceTopK(df, idCol, vecCol, queryFilter, shortlist)
      .select("qid", "nid")
    val corpus = df.select(col(idCol).cast("long").as("nid"),
      col(vecCol).cast("array<double>").as("nv"))
    val queries = df.filter(queryFilter)
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
    val cands = corpus.join(broadcast(top), "nid")
      .groupBy("qid")
      .agg(collect_list(struct(col("nid"), col("nv"))).as("cands"))
      .join(broadcast(queries), "qid")
    val spark = df.sparkSession
    // fresh sequence per (k, lambda) registration — the UnigramLm naming
    // discipline (identityHashCode collisions silently rebind)
    val fname = s"graft_mmr_${mmrSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => graft.functions.MmrSelect(exprs(0), exprs(1), k, lambda),
      "built-in")
    cands
      .select(col("qid"),
        posexplode(call_function(fname, col("qv"), col("cands"))))
      .select(col("qid"), col("pos").as("sel_rank"),
        col("col.nid").as("nid"), col("col.score").as("score"))
  }

  final case class FpsPick(rank: Int, id: Long, dist: Option[Double],
      vec: Array[Double])

  def farthestPointSample(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      seed: String = "graft-fps"): Seq[FpsPick] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val data = df.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    val s0 = data
      .withColumn("__h", Sampling.hashHex(seed, Seq(col("__id"))))
      .orderBy(col("__h"), col("__id"))
      .limit(1).collect()
    require(s0.nonEmpty, "no non-null vectors to sample from")
    val picks = scala.collection.mutable.ArrayBuffer(
      FpsPick(0, s0.head.getLong(0), None,
        s0.head.getSeq[Double](1).toArray))
    for (r <- 1 until k) {
      // min squared L2 to the selected set, selected vectors inlined;
      // |s|² folded on the driver in the SAME sequential order the SQL
      // mirror's list_sum uses (the k-means discipline)
      val v = col("__v")
      val xx = dot(v, v)
      val minDist = picks.map { p =>
        val sLit = array(p.vec.map(lit).toIndexedSeq: _*)
        val ss = p.vec.foldLeft(0.0)((a, x) => a + x * x)
        xx - lit(2.0) * dot(v, sLit) + lit(ss)
      }.reduceLeft(least(_, _))
      val next = data.select(col("__id"), col("__v"), minDist.as("__d"))
        .filter(col("__d").isNotNull)
        .orderBy(col("__d").desc, col("__id"))
        .limit(1).collect()
      require(next.nonEmpty, s"corpus exhausted after ${picks.size} picks")
      picks += FpsPick(r, next.head.getLong(0),
        Some(next.head.getDouble(2)), next.head.getSeq[Double](1).toArray)
    }
    picks.toSeq
  }
}
