package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * primitive behind corpus bucketing (topic-balanced sampling), SemDeDup's
  * cell stage, and IVF coarse quantizers. [[graft.ops.Ivf]] fits its
  * quantizer driver-side on a bounded hash sample (the right call when the
  * quantizer only needs to be *good enough*); this is the full distributed
  * fit for when cluster assignments ARE the product and every row must
  * vote (reference for the surrounding pipeline:
  * basic-data-fusion/analysis/demographics.py:1 groups cohorts by derived
  * class labels — the same partition-the-corpus shape, here over vectors).
  *
  * Everything is engineered to be a pure function of the data so two
  * engines (or two cluster sizes, or a retried stage) produce identical
  * clusterings:
  *
  *  - Init: the k rows with the smallest md5 identity hash (the
  *    engine-portable [[Sampling.hashHex]] order) seed the centroids —
  *    deterministic and expressible in SQL, unlike kmeans++ RNG draws.
  *  - Assignment: squared L2 via the `|x|² − 2·x·c + |c|²` expansion; the
  *    dot products ride the native sequential-fold
  *    [[graft.functions.DotProduct]] (codegen'd, bit-compatible with a
  *    SQL `list_sum(list_transform(...))` mirror); argmin tie-breaks on
  *    cluster id through one `least()` over (dist, cid) structs — a
  *    NARROW map with centroid literals inlined, no join, no shuffle.
  *  - Update: per-component means via posexplode → one hash aggregation
  *    on (cluster, pos) with decimal(38,12) sums — exact and
  *    summation-order-invariant, so distributed partial aggregation
  *    cannot perturb the mean; the mean is rounded to `decimals` IN THE
  *    ENGINE before it becomes the next iteration's centroid, so both
  *    engines iterate from identical doubles (the same
  *    round-before-reuse trick as [[graft.transform.Standardize]]'s
  *    robust z).
  *
  * Scale shape: per iteration, one narrow assignment map over the data +
  * one aggregation whose shuffle volume is partitions × k × dim partial
  * rows — independent of row count. Driver traffic is k × dim rounded
  * doubles per iteration (the centroid table itself, like PageRank's
  * dangling scalar — bounded and tiny). Empty clusters keep their
  * previous centroid rather than being dropped, so cluster ids are
  * stable across iterations.
  */
object KMeans {

  /** Trained model: `centroids(cid)` is the rounded centroid vector. */
  final case class Model(centroids: Array[Array[Double]], decimals: Int)

  /** Deterministic seeding: the k rows with the smallest identity hash,
    * cluster ids assigned in hash order (ties broken on id). Components
    * rounded to `decimals` like every later centroid. */
  def initCentroids(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      seed: String, decimals: Int): Array[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val picked = df
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull) // a null vector must never seed a centroid
      .withColumn("__h", Sampling.hashHex(seed, Seq(col("__id"))))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .select(transform(col("__v"), x => round(x, decimals)).as("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(picked.length == k,
      s"need at least k=$k rows to seed centroids, got ${picked.length}")
    val dim = picked.head.length
    require(picked.forall(_.length == dim),
      "embedding column has mixed dimensions")
    picked
  }

  /** (dist, cid) of the nearest centroid as a struct column; lexicographic
    * struct ordering = min distance with min-cid tie-break. Centroids are
    * inlined as literals: assignment is one narrow codegen'd map. */
  private def nearest(v: Column, centroids: Array[Array[Double]]): Column = {
    val xx = Similarity.dot(v, v)
    val cands = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit).toIndexedSeq: _*)
      // |c|² folded on the driver in the same sequential order the SQL
      // mirror's list_sum uses
      val cc = c.foldLeft(0.0)((a, x) => a + x * x)
      val dist = xx - lit(2.0) * Similarity.dot(v, cLit) + lit(cc)
      struct(dist.as("dist"), lit(i).as("cid"))
    }
    if (cands.length == 1) cands.head else least(cands.toIndexedSeq: _*)
  }

  /** Tag each row with its nearest cluster: adds `cluster_id` and the
    * squared L2 `dist` to that centroid. A null vector gets a null
    * cluster and distance (it belongs to no cluster; dropping the row
    * is the caller's policy decision, not the scorer's). */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val best = when(v.isNotNull, nearest(v, model.centroids))
    df.withColumn("__best", best)
      .withColumn("cluster_id", col("__best.cid"))
      .withColumn("dist", col("__best.dist"))
      .drop("__best")
  }

  /** `iters` Lloyd steps from the deterministic hash seeding. Returns the
    * fitted model; run [[assign]] for the final labels (equivalently: the
    * labels after a fit of `iters` steps are the assignment against the
    * model fitted with the same `iters`). */
  def fit(
      df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      seed: String = "graft-km", decimals: Int = 6): Model = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val data = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull) // null vectors vote in no cluster
    var centroids = initCentroids(df, idCol, vecCol, k, seed, decimals)
    for (_ <- 1 to iters) {
      val assigned = data
        .withColumn("__cid", nearest(col("__v"), centroids).getField("cid"))
      // exact order-invariant component sums; mean rounded IN the engine
      // so the Spark round semantics (not the driver JVM's) define the
      // next centroid, identically to the SQL mirror
      val means = assigned
        .select(col("__cid"), posexplode(col("__v")))
        .groupBy("__cid", "pos")
        .agg(round(
          sum(col("col").cast("decimal(38,12)")).cast("double") /
            count(lit(1)), decimals).as("m"))
        .collect()
      // mixed-dimension data shows up here as a cluster with ≠dim
      // component rows (a longer vector adds positions, a shorter one
      // starves the tail) — fail loudly instead of corrupting means;
      // this check is free, it reads the already-collected k×dim rows
      val dim = centroids.head.length
      means.groupBy(_.getAs[Int]("__cid")).foreach { case (cid, rs) =>
        require(rs.length == dim,
          s"embedding column has mixed dimensions: cluster $cid saw " +
            s"${rs.length} component positions, centroids have $dim")
      }
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("__cid"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      } // clusters absent from `means` are empty: keep previous centroid
      centroids = next
    }
    Model(centroids, decimals)
  }

  /** Per-cluster census of a fitted assignment: size and mean squared
    * distance (decimal-exact sum before the ratio). */
  def clusterSizes(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("size"),
        round(sum(col("dist").cast("decimal(38,12)")).cast("double") /
          count(lit(1)), 6).as("mean_sq_dist"))
      .orderBy("cluster_id")

  /** Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws", public): within each cluster keep the
    * `ceil(keepFraction · n)` rows FARTHEST from their centroid — the
    * least prototypical examples — and drop the redundant core. (With
    * abundant data, pruning easy/prototypical examples beats random
    * pruning; the paper's self-supervised metric is exactly this
    * distance-to-centroid rank.) Every cluster keeps at least one row.
    *
    * Expects [[assign]] output (`cluster_id`, `dist`). Ranks on
    * `round(dist, decimals)` with an id tie-break, NOT raw doubles: the
    * rounded distances are the values the cross-engine gate proves
    * identical, so the kept SET is engine-stable even where raw doubles
    * differ in the last ulp. One exchange: the per-cluster count and the
    * rank window share the cluster_id partitioning. */
  def prunePrototypes(assigned: DataFrame, idCol: String,
      keepFraction: Double, decimals: Int = 6): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1], got $keepFraction")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
    val ranked = assigned
      .withColumn("proto_rank", row_number().over(
        w.orderBy(round(col("dist"), decimals).desc, col(idCol))))
      .withColumn("__n", count(lit(1)).over(w))
    ranked
      .filter(col("proto_rank") <=
        greatest(lit(1.0), ceil(lit(keepFraction) * col("__n"))))
      .drop("__n")
  }

  /** Sequential (mini-batch) k-means over an unbounded stream (MacQueen
    * 1967, public) — the streaming twin of [[fit]]: each micro-batch
    * assigns its rows against the CURRENT centroids (the same one-pass
    * aggregation as a fit iteration, k × dim rows back to the driver),
    * folds per-cluster counts and exact decimal component sums into the
    * running state, and moves each centroid to the mean of every row ever
    * assigned to it. When the whole corpus arrives in one micro-batch
    * this IS one Lloyd step from `init` (spec-pinned); across batches the
    * result is order-dependent by design — the classic sequential
    * trade-off. Rounding matches the engine's `round` exactly
    * (BigDecimal.valueOf → HALF_UP, what Spark's round does), so a
    * single-batch fold is bit-identical to [[fit]]. The fold keys on
    * Structured Streaming's batchId, so at-least-once redelivery of an
    * epoch cannot double-count. */
  def runningFitSink(vecCol: String, init: Array[Array[Double]],
      decimals: Int = 6):
      (java.util.concurrent.atomic.AtomicReference[Model],
        (DataFrame, Long) => Unit) = {
    require(init.nonEmpty, "need initial centroids")
    val k = init.length
    val sums = Array.fill(k)(
      Array.fill(init.head.length)(java.math.BigDecimal.ZERO))
    val counts = Array.fill(k)(0L)
    val ref = new java.util.concurrent.atomic.AtomicReference(
      Model(init.map(_.clone()), decimals))
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val fn = (batch: DataFrame, batchId: Long) => {
      if (batchId > seen.get()) {
        val assigned = batch
          .select(col(vecCol).cast("array<double>").as("__v"))
          .withColumn("__cid",
            nearest(col("__v"), ref.get().centroids).getField("cid"))
        val parts = assigned
          .select(col("__cid"), posexplode(col("__v")))
          .groupBy("__cid", "pos")
          .agg(sum(col("col").cast(s"decimal(38,$DecimalScale)")).as("s"),
            count(lit(1)).as("n"))
          .collect() // ≤ k × dim rows — bounded driver traffic
        val dim = init.head.length
        parts.groupBy(_.getAs[Int]("__cid")).foreach { case (cid, rs) =>
          require(rs.length == dim &&
            rs.map(_.getAs[Long]("n")).distinct.length == 1,
            s"micro-batch has mixed embedding dimensions in cluster $cid")
        }
        parts.foreach { r =>
          val (cid, pos) = (r.getAs[Int]("__cid"), r.getAs[Int]("pos"))
          sums(cid)(pos) = sums(cid)(pos).add(r.getAs[java.math.BigDecimal]("s"))
          if (pos == 0) counts(cid) += r.getAs[Long]("n")
        }
        val next = ref.get().centroids.map(_.clone())
        for (c <- 0 until k if counts(c) > 0L; j <- next(c).indices)
          next(c)(j) = java.math.BigDecimal
            .valueOf(sums(c)(j).doubleValue() / counts(c))
            .setScale(decimals, java.math.RoundingMode.HALF_UP).doubleValue()
        ref.set(Model(next, decimals))
        seen.set(batchId)
      }
      ()
    }
    (ref, fn)
  }

  /** Scale of the exact component sums (shared by [[fit]] and the
    * streaming fold so both accumulate identical decimals). */
  private val DecimalScale = 12

  /** Persist a model as a tiny parquet table (cluster_id, centroid,
    * decimals) — assignment in a later session (or another engine that
    * reads parquet) needs only this. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, model.decimals) }.toSeq
      .toDF("cluster_id", "centroid", "decimals")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveModel]]: cluster ids must be the contiguous range
    * 0..k−1 (anything else means the table was edited or mixed). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("cluster_id", "centroid", "decimals")
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no centroids at $path")
    require(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      s"cluster ids at $path are not the contiguous range 0..${rows.length - 1}")
    val decimals = rows.head.getInt(2)
    Model(rows.map(_.getSeq[Double](1).toArray), decimals)
  }
}
