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

  /** Calinski–Harabasz (1974) and Davies–Bouldin (1979) cluster-validity
    * indices (both public) — the O(n·d) health checks beside the O(m·n)
    * silhouette: CH = (B/(k−1)) / (W/(n−k)) rewards between-cluster
    * scatter per within-cluster scatter (bigger = better);
    * DB = mean_i max_{j≠i} (s_i + s_j)/d(c_i, c_j) punishes any cluster
    * whose nearest neighbor is not clearly separated (smaller = better).
    * Run them on every [[KMeans]]/[[Ivf]] fit before trusting the
    * assignment downstream.
    *
    * Distributed shape: ONE posexplode of the vectors, then everything
    * is (cluster, dim)- or cluster-bounded — per-dim centroid folds, a
    * scatter fold joined back on (cluster, dim), per-point distance
    * folds for the s_i means, and a k²-row centroid self-join for the
    * pairwise distances. No driver math at all: every arithmetic tree
    * lives in the plan, so a SQL oracle replays it term for term.
    * Exactness: centroids round-12 after round-9 decimal dim folds;
    * every squared term rounds to 12 and folds as DECIMAL(38,14); one
    * double division per finish, indices round-6.
    *
    * Null vectors/clusters excluded; needs k ≥ 2 and n > k (CH is
    * undefined otherwise — loud). Returns one row (n, k, wss, bss,
    * ch_index, db_index), scatters round-6. */
  def validityIndices(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String): DataFrame = {
    def fold9(c: Column) =
      sum(round(c, 9).cast("decimal(38,12)")).cast("double")
    def fold14(c: Column) = sum(c.cast("decimal(38,14)")).cast("double")
    val v = df.filter(col(vecCol).isNotNull && col(clusterCol).isNotNull)
      .select(col(idCol).as("pid"),
        col(clusterCol).cast("string").as("label"),
        col(vecCol).cast("array<double>").as("e"))
    val dims = v.select(col("pid"), col("label"),
      posexplode(col("e")).as(Seq("i", "x")))
    val cnt = v.groupBy("label").agg(count(lit(1)).as("n_k"))
    val tot = cnt.agg(sum(col("n_k")).as("n"), count(lit(1)).as("k")).head()
    val n = tot.getAs[Long]("n"); val k = tot.getAs[Long]("k")
    require(k >= 2, s"validity indices need >= 2 clusters, got $k")
    require(n > k, s"need more points than clusters: n=$n k=$k")
    val cent = dims.groupBy("label", "i")
      .agg(round(fold9(col("x")) / count(lit(1)), 12).as("m"))
    val gcent = dims.groupBy("i")
      .agg(round(fold9(col("x")) / count(lit(1)), 12).as("g"))
    val joined = dims.join(cent, Seq("label", "i"))
    val wss = joined
      .agg(fold14(round((col("x") - col("m")) * (col("x") - col("m")), 12))
        .as("wss")).head().getAs[Double]("wss")
    val bss = cent.join(gcent, Seq("i")).join(cnt, Seq("label"))
      .agg(fold14(round(col("n_k") * (col("m") - col("g"))
        * (col("m") - col("g")), 12)).as("bss"))
      .head().getAs[Double]("bss")
    val ch = (bss / (k - 1)) / (wss / (n - k))
    // per-cluster mean point-to-centroid distance (s_i)
    val sI = joined.groupBy("pid", "label")
      .agg(round(sqrt(fold14(round((col("x") - col("m"))
        * (col("x") - col("m")), 12))), 12).as("dist"))
      .groupBy("label")
      .agg(round(fold14(col("dist")) / count(lit(1)), 12).as("s"))
    // k²-row centroid pair distances, then the DB max-ratio fold
    val a = cent.select(col("label").as("la"), col("i"), col("m").as("ma"))
    val b = cent.select(col("label").as("lb"), col("i"), col("m").as("mb"))
    val cd = a.join(b, Seq("i")).filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(round(sqrt(fold14(round((col("ma") - col("mb"))
        * (col("ma") - col("mb")), 12))), 12).as("d"))
    val sa = sI.select(col("label").as("la"), col("s").as("s_a"))
    val sb = sI.select(col("label").as("lb"), col("s").as("s_b"))
    val withS = cd.join(sa, Seq("la")).join(sb, Seq("lb"))
      .select(col("la"), col("lb"),
        ((col("s_a") + col("s_b")) / col("d")).as("r"))
    val ratios = withS.select(col("la").as("l"), col("r"))
      .unionByName(withS.select(col("lb").as("l"), col("r")))
    val db = ratios.groupBy("l").agg(max(col("r")).as("mx"))
      .agg((fold14(round(col("mx"), 12)) / count(lit(1))).as("db"))
      .head().getAs[Double]("db")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, k, r6(wss), r6(bss), r6(ch), r6(db)))
      .toDF("n", "k", "wss", "bss", "ch_index", "db_index")
  }
}
