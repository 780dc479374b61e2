package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nLists` cells; a query scores only
  * the `nProbe` cells nearest its own position — candidates shrink
  * ~nLists/nProbe-fold vs brute force while recall stays high because
  * neighbors concentrate in nearby cells.
  *
  * Vectors are L2-normalized before clustering (spherical k-means), so
  * euclidean cell assignment orders cells consistently with cosine
  * similarity. The index is a plain DataFrame (id, v, cell) — persist it
  * (or write it bucketed by cell) and reuse across queries; centroids are
  * driver-side (nLists × dim, small by construction).
  */
object Ivf {

  final case class Index(
      assigned: DataFrame, // id, v (normalized array<double>), cell
      centroids: Array[Array[Double]])

  // native one-pass normalize — the compositional HOF form it replaces
  // (`when(sqrt(aggregate(transform(v, x*x), 0, +)) === 0, v)
  //   .otherwise(transform(v, x / n))`) re-ran the whole norm fold per
  // element once the optimizer inlined the alias into the division lambda
  // (O(dim²) interpreted per row, measured ~ms/row at dim 64 — r18)
  private def l2normalize(v: Column): Column = Similarity.l2normalize(v)

  /** `fitSampleRows > 0` fits the quantizer on a deterministic hash-based
    * sample of ~that many rows and then assigns the FULL corpus — the
    * 100 TB shape (every k-means iteration is otherwise a full corpus
    * pass; centroids converge the same on a uniform sample orders of
    * magnitude smaller). The sample is keyed on `xxhash64(id)` so it is
    * reproducible across runs, partitionings, and engines; sizing costs
    * one metadata-cheap `count()`. `0` fits on everything (exact parity
    * with prior behavior, right for small/medium corpora). */
  def build(
      df: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, seed: Long = 42, maxIter: Int = 20,
      initMode: String = "k-means||", fitSampleRows: Long = 0L): Index = {
    val base = df.select(col(idCol).as("id"),
        l2normalize(col(vecCol).cast("array<double>")).as("v"))
      .withColumn("__features", array_to_vector(col("v")))
    val fitSet =
      if (fitSampleRows <= 0) base
      else {
        val n = df.count()
        if (n <= fitSampleRows) base
        else {
          // 2^40 modulus keeps resolution at extreme ratios (a ~500k sample
          // of a trillion rows needs thresholds ~5e5, far below a 2^20
          // modulus's truncation floor); the max(1, _) clamp guarantees a
          // non-empty selectivity even when the ratio rounds to zero. The
          // sample is then verified ≥ nLists before the fit — an empty or
          // sub-k fit set would crash (or degrade) KMeans.fit silently.
          val mod = 1L << 40
          val want = math.max(fitSampleRows, nLists * 16L)
          val threshold = math.max(1L, (want.toDouble / n * mod).toLong)
          val sampled =
            base.filter(pmod(xxhash64(col("id")), lit(mod)) < threshold)
          val m = sampled.count()
          require(m >= nLists,
            s"IVF sampled fit selected $m rows (< nLists=$nLists) from n=$n " +
              s"at fitSampleRows=$fitSampleRows — raise fitSampleRows")
          sampled
        }
      }
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(maxIter).setInitMode(initMode)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(fitSet)
    val assigned = model.transform(base)
      .select(col("id"), col("v"), col("cell"))
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** The `nProbe` nearest cells for each vector row, as ONE narrow map:
    * centroids are inlined as literal arrays (the [[assign]] idiom), each
    * row computes its nLists dot products, and the top-nProbe cells by
    * (similarity desc, cell asc) come from an `array_sort` over
    * (negated-sim, cell) structs — exactly `row_number() <= nProbe` under
    * the same ordering, with zero shuffle. The previous form (cross join
    * against a broadcast centroid table + a row_number window keyed on the
    * query id) shuffled the nLists-fold exploded query table once per
    * probe pass (r18: one full exchange + sort removed from every IVF
    * search/mine plan). Negated sims canonicalize -0.0 → 0.0 so a zero
    * dot product sorts identically in both forms. Appends `cell` (one row
    * per probed cell) to the input's `idName`/`vecName` columns. */
  private[ops] def probeCells(
      centroids: Array[Array[Double]], df: DataFrame,
      idName: String, vecName: String, nProbe: Int): DataFrame = {
    val probes = math.min(nProbe, centroids.length)
    val ranked = centroids.zipWithIndex.map { case (cv, i) =>
      val d = Similarity.dot(col(vecName),
        array(cv.map(lit).toIndexedSeq: _*))
      // 0.0 - d IS IEEE negation except at d = ±0.0, where it canonicalizes
      // to +0.0 — one dot per centroid (a when/otherwise negation would
      // embed the dot twice)
      struct((lit(0.0) - d).as("ns"), lit(i).as("cell"))
    }
    df.select(col(idName), col(vecName),
        slice(array_sort(array(ranked.toIndexedSeq: _*)), 1, probes)
          .getField("cell").as("__cells"))
      .select(col(idName), col(vecName), explode(col("__cells")).as("cell"))
  }

  /** Top-k cosine neighbors for each query id, probing `nProbe` cells. */
  def search(
      index: Index, queryFilter: Column,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    val queries = index.assigned.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"))
    val probeSets = probeCells(index.centroids, queries, "qid", "qv", nProbe)

    val scored = index.assigned.join(broadcast(probeSets), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        Similarity.cosine(col("qv"), col("v")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** Assign NEW vectors to an existing quantizer without refitting —
    * the incremental-ingest path (a nightly batch or a stream's
    * foreachBatch appends to the same cells the index was built with;
    * refitting would move centroids and silently invalidate every
    * stored assignment). One narrow map: L2-normalize, then argmin
    * squared L2 to the centroid literals (ties to the lower cell id —
    * KMeans' own rule), inlined like [[Similarity.dot]]'s literal
    * folds — no shuffle, stream-safe. Null vectors are dropped (an
    * unassignable vector must not land in cell 0 silently). */
  def assign(centroids: Array[Array[Double]], df: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val v = l2normalize(col(vecCol).cast("array<double>"))
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), v.as("v"))
    // squared L2 to centroid c: ||x||² − 2·x·c + ||c||²; ||x||² is
    // shared by all cells so the argmin only needs −2·x·c + ||c||²
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit).toIndexedSeq: _*)
      val cc = c.foldLeft(0.0)((a, x) => a + x * x)
      struct((lit(-2.0) * Similarity.dot(col("v"), cLit) + lit(cc))
        .as("d"), lit(i).as("cell"))
    }
    // least() needs two args; a single-cell quantizer assigns trivially
    val winner =
      if (scores.length == 1) scores.head
      else least(scores.toIndexedSeq: _*)
    base.withColumn("cell", winner.getField("cell"))
  }

  /** Persist an [[Index]]: the assignment table as parquet PARTITIONED
    * BY CELL (a reloaded search's per-cell probe join prunes to its
    * cells' directories) and the centroid grid as a tiny parquet
    * table — the bounded-artifact shape of
    * [[graft.ops.Projection.savePcaModel]]. */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/assigned")
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(cents.nonEmpty, s"no centroids at $path")
    require(cents.map(_._1).toSeq == cents.indices.toSeq,
      s"centroid cells not contiguous at $path")
    Index(spark.read.parquet(s"$path/assigned")
        .select("id", "v", "cell"),
      cents.map(_._2))
  }
}
