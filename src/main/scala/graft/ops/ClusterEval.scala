package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality evaluation: silhouette scores (Rousseeuw 1987,
  * public) for any clustering the engine produces — k-means topics
  * ([[KMeans]]), IVF cells ([[Ivf]]), semantic-dedup clusters
  * ([[Dedup.semanticDedup]]) or plain labels. s(i) = (b−a)/max(a,b)
  * with a = mean distance to own cluster, b = the nearest other
  * cluster's mean distance: +1 compact and well-separated, 0 boundary,
  * negative misassigned.
  *
  * Exact silhouette is O(n²); the standard practice (and scikit-learn's
  * `sample_size` knob) evaluates a SAMPLE of points against the full
  * corpus — O(m·n) with m chosen by the caller's filter (use the
  * engine's deterministic hash filters for reproducibility). Shape: the
  * sampled points broadcast, the corpus streams in ONE pass, then a
  * (point × cluster)-sized aggregation — never a corpus×corpus shuffle.
  *
  * Engine-parity: per-pair euclidean distances round to 12, per-cluster
  * means are decimal folds with ONE double division (rounded 12), the
  * final silhouette rounds to 6. Singleton clusters score 0 by the
  * standard convention; fewer than two clusters overall fails loudly
  * (silhouette is undefined, not zero).
  */
object ClusterEval {

  /** Per-sampled-point silhouette: (pid, cluster, a_mean, b_mean, s)
    * for points passing `sampleFilter`, distances against the ENTIRE
    * input. Null vectors and null clusters are excluded from both
    * sides. */
  def silhouetteSample(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, sampleFilter: Column): DataFrame = {
    val base = df
      .filter(col(vecCol).isNotNull && col(clusterCol).isNotNull)
    val corpus = base.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nv"),
      col(clusterCol).as("nc"))
    val points = base.filter(sampleFilter)
      .select(col(idCol).as("pid"),
        col(vecCol).cast("array<double>").as("pv"),
        col(clusterCol).as("pc"))
    val nClusters = corpus.select("nc").distinct().count()
    require(nClusters >= 2,
      s"silhouette needs at least 2 clusters, found $nClusters")
    val dist = round(sqrt(aggregate(
      zip_with(col("pv"), col("nv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)), 12)
    val perCluster = corpus.crossJoin(broadcast(points))
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("pc"), col("nc"), dist.as("d"))
      .groupBy("pid", "pc", "nc")
      .agg(round(sum(col("d").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 12).as("md"))
    perCluster.groupBy(col("pid"), col("pc").as("cluster"))
      .agg(
        max(when(col("nc") === col("pc"), col("md"))).as("a_mean"),
        min(when(col("nc") =!= col("pc"), col("md"))).as("b_mean"))
      .withColumn("s",
        when(col("a_mean").isNull, lit(0.0))
          .otherwise(round((col("b_mean") - col("a_mean"))
            / greatest(col("a_mean"), col("b_mean")), 6)))
  }

  /** Macro summary of [[silhouetteSample]]: one row (n_points, mean_s,
    * min_s, frac_negative) — the screening numbers before a per-point
    * drill-down. Mean through a decimal fold. */
  def silhouetteSummary(perPoint: DataFrame): DataFrame =
    perPoint.agg(
      count(lit(1)).as("n_points"),
      round(sum(col("s").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 6).as("mean_s"),
      min(col("s")).as("min_s"),
      round(sum(when(col("s") < 0, 1L).otherwise(0L))
        / count(lit(1)).cast("double"), 6).as("frac_negative"))
}
