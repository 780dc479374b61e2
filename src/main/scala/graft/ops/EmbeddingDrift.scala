package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
