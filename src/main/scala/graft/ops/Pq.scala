package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 33(1)) — the memory-bound ANN
  * path: vectors are split into `m` subspaces, each subvector replaced by
  * the index of its nearest codeword in a per-subspace codebook of `k`
  * centroids, so a d-dim float vector compresses to m small ints (d=64,
  * m=8, k=16 → 8 nibbles vs 256 bytes: 32×). Search is asymmetric
  * distance computation (ADC): the QUERY stays exact, a per-query lookup
  * table of subspace dot products is built once, and each candidate's
  * score is m table lookups — no float vector is ever touched at scan
  * time.
  *
  * Why this matters at 100 TB: brute force and IVF both scan raw
  * vectors, so the working set is the embedding column itself. PQ codes
  * shrink that scan ~30×: the encoded table fits in memory/cache where
  * the raw vectors never would, and the ADC scan is a narrow
  * codegen'd array-lookup pass (zip_with + element_at over broadcast
  * LUTs — no UDFs, no shuffle beyond the final per-query top-k).
  *
  * Approximation contract: scores are subspace-quantized dot products;
  * recall@k against exact cosine is pinned by spec (and tunable via m/k:
  * more subspaces or codewords → finer quantization). Compose with
  * [[Ivf]] cells for IVF-PQ when even the code scan needs pruning.
  *
  * Everything driver-side is small by construction: codebooks are
  * m × k × (d/m) doubles (= d·k total, a few KB).
  */
object Pq {

  final case class Codebooks(
      m: Int, k: Int, dSub: Int,
      /** [subspace][codeword][component]; subvectors of L2-NORMALIZED
        * vectors, so ADC dot sums approximate cosine. */
      centroids: Array[Array[Array[Double]]])

  // native one-pass normalize (graft.functions.L2Normalize) — the HOF
  // form re-ran the norm fold per element after optimizer inlining (r18)
  private def l2normalize(v: Column): Column = Similarity.l2normalize(v)

  private def subvector(v: Column, j: Int, dSub: Int): Column =
    slice(v, j * dSub + 1, dSub)

  /** Fit per-subspace codebooks: a bounded deterministic hash sample is
    * collected ONCE (≤ `fitSampleRows` vectors — the d·fitSampleRows
    * doubles are megabytes, not data-scale), then the m independent
    * k-means runs execute driver-side. This is the faiss/standard PQ
    * training shape — codebooks converge on a sample, and training them
    * in the cluster would cost m·maxIter distributed jobs to move
    * kilobytes of centroids. At 100 TB the cluster cost of fit() is one
    * count + one ~2 MB collect; [[encode]] is the real corpus pass.
    *
    * Deterministic end to end: the sample is the xxhash64-threshold row
    * set (stable across partitionings/engines) sorted by id, and Lloyd
    * iterations are seeded and order-stable — identical codebooks every
    * run. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, seed: Long = 42, maxIter: Int = 20,
      fitSampleRows: Long = 65536L): Codebooks = {
    require(m >= 1 && k >= 2, "need m >= 1 subspaces and k >= 2 codewords")
    require(fitSampleRows >= k, s"fitSampleRows must be >= k=$k")
    val base = df.select(col(idCol).as("id"),
      l2normalize(col(vecCol).cast("array<double>")).as("v"))
    val n = base.count()
    val sampled =
      if (n <= fitSampleRows) base
      else {
        val mod = 1L << 40
        val threshold = math.max(1L,
          (fitSampleRows.toDouble / n * mod).toLong)
        base.filter(pmod(xxhash64(col("id")), lit(mod)) < threshold)
      }
    val sample: Array[Array[Double]] = sampled
      .orderBy(col("id"))
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k,
      s"PQ fit sample has ${sample.length} rows (< k=$k) — raise fitSampleRows")
    val dim = sample.head.length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val dSub = dim / m
    val centroids = Array.tabulate(m) { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * dSub, (j + 1) * dSub))
      localKMeans(subs, k, seed + j, maxIter)
    }
    Codebooks(m, k, dSub, centroids)
  }

  /** Seeded, order-stable Lloyd's algorithm on a driver-side sample.
    * Init is a deterministic shuffle of the rows (k distinct-position
    * picks); an emptied cluster keeps its previous centroid. */
  private def localKMeans(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    val d = points.head.length
    val rnd = new java.util.Random(seed)
    // deterministic init: k distinct row positions when the sample allows
    // (an infinite distinct() stream would hang if rows < k — guard first)
    val order =
      if (points.length <= k) Array.tabulate(points.length)(identity)
      else rnd.ints(0, points.length).distinct().limit(k.toLong).toArray
    val cents = order.map(i => points(i).clone())
    // fewer sample rows than k: pad with duplicates of the first
    val full = if (cents.length == k) cents
    else cents ++ Array.fill(k - cents.length)(points(0).clone())
    var iter = 0
    var moved = true
    val assign = new Array[Int](points.length)
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var t = 0
          while (t < d) {
            val diff = points(i)(t) - full(c)(t); dist += diff * diff; t += 1
          }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Long](k)
      i = 0
      while (i < points.length) {
        val c = assign(i); counts(c) += 1
        var t = 0
        while (t < d) { sums(c)(t) += points(i)(t); t += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var t = 0
          while (t < d) { full(c)(t) = sums(c)(t) / counts(c); t += 1 }
        } // else: emptied cluster keeps its previous centroid
        c += 1
      }
      iter += 1
    }
    full
  }

  /** Encode every vector to its `m` codeword indices — a single narrow
    * pass. Each subspace's k distances are STATIC expressions over the
    * native codegen'd [[Similarity.dot]] (via ‖s−c‖² = ‖c‖² − 2⟨s,c⟩ up
    * to the per-row constant ‖s‖²), NOT nested higher-order functions:
    * Spark evaluates transform/aggregate lambdas interpreted, and m·k
    * nested HOF distance evaluations per row cost ~100× more than the
    * same arithmetic as unrolled codegen expressions (measured 74 ms vs
    * <1 ms per 64-dim row at m=16, k=16). argmin via array_min +
    * array_position (single-level, tiny array — cheap either way; first
    * index wins ties). Returns (id, code array<int>[m]). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame = {
    val normed = df.select(col(idCol).as("id"),
      l2normalize(col(vecCol).cast("array<double>")).as("__v"))
    val withSubs = normed.select(col("id") +:
      (0 until cb.m).map(j =>
        subvector(col("__v"), j, cb.dSub).as(s"__s$j")): _*)
    val codes = (0 until cb.m).map { j =>
      val sub = col(s"__s$j")
      val dists = array(cb.centroids(j).map { c =>
        val cNorm2 = c.map(x => x * x).sum
        lit(cNorm2) - lit(2.0) * Similarity.dot(sub, array(c.map(lit): _*))
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    withSubs.select(col("id"), array(codes: _*).as("code"))
  }

  /** ADC top-k: for each query row (qid, query vector), build the m × k
    * LUT of subspace dot products AGAINST THE EXACT QUERY (one tiny
    * expression per query row), broadcast queries+LUTs, and score every
    * code as m lookups. One broadcast, one window top-k — the encoded
    * corpus never shuffles. Returns (qid, rank, nid, approx_cosine). */
  def searchAdc(encoded: DataFrame, cb: Codebooks,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10): DataFrame = {
    // same unrolled-codegen shape as encode(): the LUT is m arrays of k
    // native dot products, not nested interpreted lambdas (the broadcast
    // side is small, but projection collapse can re-evaluate this per
    // JOINED row — keep it cheap, not just rare)
    val qv = l2normalize(col(qvecCol).cast("array<double>"))
    val lut = array((0 until cb.m).map { j =>
      val qsub = subvector(qv, j, cb.dSub)
      array(cb.centroids(j).map(c =>
        Similarity.dot(qsub, array(c.map(lit): _*))): _*)
    }: _*)
    val q = queries.select(col(qidCol).as("qid"), lut.as("__lut"))
    val scored = encoded.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        aggregate(
          zip_with(col("code"), col("__lut"),
            (cd, l) => element_at(l, cd + 1)),
          lit(0.0), (acc, x) => acc + x).as("approx_cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("approx_cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "approx_cosine")
  }

  /** IVF-PQ (the composed index of Jégou §V / faiss IndexIVFPQ): the
    * [[Ivf]] coarse quantizer prunes the corpus to each query's `nProbe`
    * nearest cells, the ADC scan scores only those cells' CODES, and the
    * shortlist re-ranks with exact cosine. At 100 TB this is the full
    * memory-and-compute story: cells bound the candidate set
    * (~nProbe/nLists of the corpus), codes shrink what the candidate
    * scan touches ~30×, and raw vectors are read only for
    * |queries| × shortlist re-rank rows. The encoded table joins the
    * cell assignment by id once — persist `index.assigned` and the codes
    * bucketed by cell to make that join and the probe filter zero-cost
    * across query batches.
    *
    * Recall contract: misses come from either quantizer (a neighbor in
    * an unprobed cell, or outside the ADC shortlist) — both tunable
    * (nProbe, shortlist) and spec-pinned against brute force. */
  def searchIvfPq(df: DataFrame, idCol: String, vecCol: String,
      index: Ivf.Index, encoded: DataFrame, cb: Codebooks,
      queryFilter: Column, k: Int = 10, nProbe: Int = 4,
      shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val spark = df.sparkSession
    import spark.implicits._
    val nLists = index.centroids.length
    val probes = math.min(nProbe, nLists)
    val centroidDF = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cv")
    // per-query probe set: nearest coarse centroids (tiny broadcast join)
    val queries = index.assigned.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"))
    val probeSets = queries.crossJoin(broadcast(centroidDF))
      .select(col("qid"), col("qv"), col("cell"),
        Similarity.dot(col("qv"), col("cv")).as("__sim"))
      .withColumn("__pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__pr") <= probes)
    // the same unrolled LUT as searchAdc, built once per (query, probe)
    val lut = array((0 until cb.m).map { j =>
      val qsub = subvector(col("qv"), j, cb.dSub)
      array(cb.centroids(j).map(c =>
        Similarity.dot(qsub, array(c.map(lit): _*))): _*)
    }: _*)
    val probesWithLut = probeSets.select(col("qid"), col("cell"),
      lut.as("__lut"))
    // candidate scan: only probed cells' codes are scored
    val celledCodes = encoded
      .join(index.assigned.select(col("id"), col("cell")), "id")
    val scored = celledCodes.join(broadcast(probesWithLut), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        aggregate(
          zip_with(col("code"), col("__lut"),
            (cd, l) => element_at(l, cd + 1)),
          lit(0.0), (acc, x) => acc + x).as("approx_cosine"))
    val ws = Window.partitionBy(col("qid"))
      .orderBy(col("approx_cosine").desc, col("nid"))
    val candidates = scored.withColumn("rank", row_number().over(ws))
      .filter(col("rank") <= shortlist)
      .select(col("qid"), col("nid"))
    // exact re-rank of the shortlist only
    val corpus = df.select(col(idCol).as("nid"),
      l2normalize(col(vecCol).cast("array<double>")).as("nv"))
    val qv = index.assigned.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"))
    val exact = candidates
      .join(broadcast(qv), "qid")
      .join(corpus, "nid")
      .select(col("qid"), col("nid"),
        Similarity.dot(col("qv"), col("nv")).as("cosine"))
    val wr = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    exact.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** ADC shortlist + exact re-rank (the standard PQ deployment, Jégou
    * §VI): the compressed scan picks `shortlist` candidates per query,
    * then ONLY those rows' raw vectors are fetched (a semi-join against
    * ids — at scale, the point where 99%+ of the corpus is never
    * re-read) and re-scored with exact cosine. Quantization error now
    * only costs recall when a true neighbor falls outside the whole
    * shortlist, so recall@k climbs with shortlist/k while the expensive
    * exact pass stays |queries| × shortlist. Returns
    * (qid, rank, nid, cosine) with EXACT cosines. */
  def searchAdcRerank(df: DataFrame, idCol: String, vecCol: String,
      encoded: DataFrame, cb: Codebooks,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val candidates = searchAdc(encoded, cb, queries, qidCol, qvecCol,
      k = shortlist).select(col("qid"), col("nid"))
    val corpus = df.select(col(idCol).as("nid"),
      l2normalize(col(vecCol).cast("array<double>")).as("nv"))
    val qv = queries.select(col(qidCol).as("qid"),
      l2normalize(col(qvecCol).cast("array<double>")).as("qv"))
    val exact = candidates
      .join(broadcast(qv), "qid")
      .join(corpus, "nid")
      .select(col("qid"), col("nid"),
        Similarity.dot(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }
}
