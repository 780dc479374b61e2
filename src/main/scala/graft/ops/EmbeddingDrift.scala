package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space drift between two snapshots of the same corpus — the
  * monitor a pipeline runs when the encoder is retrained or upstream
  * preprocessing changes: per-label centroid rotation (cosine) and
  * displacement (L2), plus per-id displacement for row-level forensics.
  * Large centroid drift on one label = that slice's meaning moved;
  * uniform drift = a global transform (often harmless, fixable with
  * [[Procrustes]] alignment).
  *
  * Scale shape: centroids come from one Summarizer-backed aggregation
  * per snapshot ([[Similarity.labelCentroids]] — no n×d explode), so the
  * drift arithmetic runs on label×dim tables. Per-dim centroid values
  * round to 6 first and the drift terms fold as 12-rounded decimals —
  * summation-order-proof, the cross-engine exactness discipline.
  */
object EmbeddingDrift {

  private def longCentroids(df: DataFrame, labelCol: String,
      vecCol: String, cName: String): DataFrame =
    Similarity.labelCentroids(df, labelCol, vecCol)
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "cv")))
      .select(col("label"), col("dim").cast("int").as("dim"),
        round(col("cv"), 6).as(cName))

  private def fold12(c: Column): Column =
    sum(round(c, 12).cast("decimal(38,12)")).cast("double")

  /** Per-label centroid drift between snapshots: (label, cosine,
    * l2_shift), cosine null when either centroid is zero-norm. Labels
    * must appear in BOTH snapshots to report (inner join — a label that
    * vanished is a census question, not a drift measurement). */
  def centroidDrift(oldDf: DataFrame, newDf: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val a = longCentroids(oldDf, labelCol, vecCol, "c1")
    val b = longCentroids(newDf, labelCol, vecCol, "c2")
    a.join(b, Seq("label", "dim"))
      .groupBy("label")
      .agg(fold12(col("c1") * col("c2")).as("__dot"),
        fold12(col("c1") * col("c1")).as("__n1"),
        fold12(col("c2") * col("c2")).as("__n2"),
        fold12((col("c1") - col("c2")) * (col("c1") - col("c2")))
          .as("__d2"))
      .select(col("label"),
        when(col("__n1") > 0 && col("__n2") > 0,
          round(col("__dot") / (sqrt(col("__n1")) * sqrt(col("__n2"))), 6))
          .as("cosine"),
        round(sqrt(col("__d2")), 6).as("l2_shift"))
  }

  /** Per-id displacement between snapshots: (id, cosine, l2_shift) for
    * every id present in both, cosine null on zero-norm vectors. A
    * narrow join + codegen'd vector arithmetic — row-level forensics
    * when [[centroidDrift]] flags a slice. */
  def idDisplacement(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val a = oldDf.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v1"))
    val b = newDf.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v2"))
    val n1 = Similarity.norm2(col("v1"))
    val n2 = Similarity.norm2(col("v2"))
    val diff = zip_with(col("v1"), col("v2"), (x, y) => x - y)
    a.join(b, "id")
      .select(col("id"),
        when(n1 > 0 && n2 > 0,
          round(Similarity.dot(col("v1"), col("v2"))
            / (sqrt(n1) * sqrt(n2)), 6)).as("cosine"),
        round(sqrt(Similarity.norm2(diff)), 6).as("l2_shift"))
  }

  /** Anisotropy / embedding-collapse screen (Ethayarajh 2019 observed
    * the phenomenon; this ratio form is the standard one-number check,
    * public): ratio = ‖μ‖² / E‖x‖², where μ is the corpus mean vector.
    * ≈ 0 means the cloud is centered (healthy); → 1 means every vector
    * points the same way — cosine similarity stops discriminating and
    * every ANN/dedup threshold silently degrades. Run it on every new
    * encoder BEFORE trusting sim_* thresholds tuned on the old one.
    *
    * One posexplode pass: per-dim round-12 means (round-9 decimal
    * folds), one global second-moment fold, a d-bounded fold of μ²
    * terms. Returns one row (n, dim, mean_norm2, mean_sq_norm,
    * anisotropy), round-6; fails loudly on an empty or zero corpus. */
  def isotropy(df: DataFrame, vecCol: String): DataFrame = {
    def fold9(c: Column) =
      sum(round(c, 9).cast("decimal(38,12)")).cast("double")
    val dims = df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("i", "x")))
    val m = dims.groupBy("i")
      .agg(round(fold9(col("x")) / count(lit(1)), 12).as("m"),
        count(lit(1)).as("n"))
    val mu2 = m.agg(
        sum(round(col("m") * col("m"), 12).cast("decimal(38,14)"))
          .cast("double").as("mu2"),
        count(lit(1)).as("dim"), max(col("n")).as("n"))
      .head()
    val n = mu2.getAs[Long]("n")
    require(n > 0, "isotropy needs vectors")
    val sq = dims.agg(
        sum(round(col("x") * col("x"), 12).cast("decimal(38,14)"))
          .cast("double").as("sq"))
      .head().getAs[Double]("sq")
    val meanSq = sq / n
    require(meanSq > 0.0, "all-zero vectors - no geometry to measure")
    val muNorm2 = mu2.getAs[Double]("mu2")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, mu2.getAs[Long]("dim"), r6(muNorm2), r6(meanSq),
        r6(muNorm2 / meanSq)))
      .toDF("n", "dim", "mean_norm2", "mean_sq_norm", "anisotropy")
  }

  /** k-NN label purity: for every labeled vector, the fraction of its k
    * nearest neighbors (round-9 squared L2, deterministic (d², id)
    * order) sharing its label — the embedding-space label-noise screen
    * (Northcutt-style confident learning seen GEOMETRICALLY): a point
    * whose neighborhood votes against its label is either mislabeled or
    * sits on a class boundary, and mean purity is the one-number
    * "are these labels learnable from this encoder" check.
    *
    * Brute-force n² neighbor ranking, loudly capped at `maxVectors`
    * (the [[intrinsicDimension]] contract — sample or go through an IVF
    * candidate graph past it). Per-point purity is an exact k-rational;
    * the mean folds round-9 as decimals. Returns one row (n_vectors, k,
    * mean_purity, n_low_purity) with low = purity < 0.5, round-6. */
  def knnLabelPurity(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int = 5, maxVectors: Long = 5000L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"),
        col(labelCol).as("lab"))
    val n = v.count()
    require(n > k, s"purity@$k needs > $k vectors, got $n")
    require(n <= maxVectors,
      s"$n vectors exceed the brute-force cap $maxVectors - " +
        "hash-sample or rank through an IVF candidate graph")
    val a = v.select(col("id").as("i"), col("e").as("ea"),
      col("lab").as("la"))
    val b = v.select(col("id").as("j"), col("e").as("eb"),
      col("lab").as("lb"))
    val d2 = round(aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x), 9)
    val w = Window.partitionBy(col("i")).orderBy(col("d2"), col("j"))
    val purity = a.join(b, col("i") =!= col("j"))
      .select(col("i"), col("j"), d2.as("d2"),
        (col("la") === col("lb")).as("same"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("i").agg(
        (sum(when(col("same"), 1L).otherwise(0L)).cast("double") / k)
          .as("p"))
    val s = purity.agg(count(lit(1)).as("m"),
      sum(round(col("p"), 9).cast("decimal(38,12)")).cast("double")
        .as("sp"),
      sum(when(col("p") < 0.5, 1L).otherwise(0L)).as("low")).head()
    val m = s.getAs[Long]("m")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((m, k.toLong, r6(s.getAs[Double]("sp") / m), s.getAs[Long]("low")))
      .toDF("n_vectors", "k", "mean_purity", "n_low_purity")
  }

  /** TwoNN intrinsic dimension (Facco, d'Errico, Rodriguez & Laio 2017,
    * public): d̂ = n / Σᵢ ln(r₂ᵢ/r₁ᵢ) from only each point's first and
    * second neighbor distances — "how many dimensions does this
    * embedding cloud ACTUALLY use". A 768-dim encoder whose corpus
    * lives on a ~10-dim manifold is normal; intrinsic dim ≈ 1–2 means
    * collapse ([[isotropy]]'s pathology seen geometrically), and a
    * large gap between corpora flags a domain shift no mean-vector
    * test sees.
    *
    * Brute-force n² neighbor search, loudly capped at `maxVectors`
    * (past the cap, estimate on a hash sample or an IVF candidate
    * graph). Squared distances round to 9 (absorbing cross-engine
    * fold jitter), the 2-NN pick is a (d², id)-ordered partitioned
    * window — deterministic under ties — and the ln-ratio terms fold
    * round-9 as decimals, so a SQL oracle replays the estimate.
    * Duplicate points (r₁ = 0 — ln undefined) are excluded and
    * surface in n_vectors − n_used. Returns one row (n_vectors,
    * n_used, sum_log_mu, intrinsic_dim), round-6. */
  def intrinsicDimension(
      df: DataFrame, idCol: String, vecCol: String,
      maxVectors: Long = 5000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"))
    val n = v.count()
    require(n >= 3, s"TwoNN needs >= 3 vectors, got $n")
    require(n <= maxVectors,
      s"$n vectors exceed the brute-force cap $maxVectors - " +
        "hash-sample the corpus or rank 2-NN through an IVF candidate graph")
    val a = v.select(col("id").as("i"), col("e").as("ea"))
    val b = v.select(col("id").as("j"), col("e").as("eb"))
    val d2 = round(aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x), 9)
    val w = Window.partitionBy(col("i")).orderBy(col("d2"), col("j"))
    val nn = a.join(b, col("i") =!= col("j"))
      .select(col("i"), col("j"), d2.as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("i").agg(
        min(when(col("rn") === 1, col("d2"))).as("r1"),
        min(when(col("rn") === 2, col("d2"))).as("r2"))
    val s = nn.filter(col("r1") > 0.0)
      .agg(count(lit(1)).as("n_used"),
        sum(round(log(col("r2") / col("r1")) * 0.5, 9)
          .cast("decimal(38,12)")).cast("double").as("slnmu"))
      .head()
    val nUsed = s.getAs[Long]("n_used")
    require(nUsed > 0, "every point duplicated - no neighbor geometry")
    val slnmu = s.getAs[Double]("slnmu")
    require(slnmu > 0.0,
      "first and second neighbors tied everywhere - dimension undefined")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((n, nUsed, r6(slnmu), r6(nUsed / slnmu)))
      .toDF("n_vectors", "n_used", "sum_log_mu", "intrinsic_dim")
  }
}
