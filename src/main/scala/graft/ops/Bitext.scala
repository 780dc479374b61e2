package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, ACL — "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings",
  * public): mine translation pairs from two corpora embedded in a shared
  * space. Raw cosine over-selects hubs — sentences near everything — so
  * each candidate is scored by its RATIO MARGIN: cosine divided by the
  * mean cosine of both endpoints' k-nearest neighborhoods,
  *
  *   margin(x, y) = cos(x, y) / ((penalty(x) + penalty(y)) / 2),
  *
  * penalizing hub endpoints whose neighborhoods are uniformly close. The
  * mined set keeps pairs that are each other's best margin both ways
  * (the paper's intersection strategy) above `minMargin`.
  *
  * Engine-parity: cosines are rounded to 12 ONCE on the symmetric pair
  * table (so forward and backward read the same number), neighborhood
  * penalties are decimal folds of those rounded cosines divided by the
  * actual neighbor count, margins round to 6, and every rank breaks ties
  * on the partner id.
  *
  * Scale shape: this exact form scores the |X|·|Y| pair table — the
  * BASELINE for bounded corpora (the shape every published exact miner
  * uses). The pair table is never wider than (id, id, double) and is
  * shuffled twice (once per endpoint's window+aggregate). At 100 TB,
  * generate the candidate pair table with an ANN shortlist
  * ([[Ivf]]/[[Similarity.annTopK]] per side) and feed it to the same
  * margin/mutual-best tail — the scoring tail only ever sees
  * candidate-list-sized input.
  */
object Bitext {

  /** All-pairs margin scoring: (x_id, y_id, c, margin, __rf, __rb) with
    * endpoint penalties joined in. */
  private def scoredPairs(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"neighborhood size k must be >= 1, got $k")
    val x = xs.select(col(idCol).as("x_id"),
      col(vecCol).cast("array<double>").as("xv"))
    val y = ys.select(col(idCol).as("y_id"),
      col(vecCol).cast("array<double>").as("yv"))
    val pairs = x.crossJoin(y)
      .select(col("x_id"), col("y_id"),
        round(Similarity.cosine(col("xv"), col("yv")), 12).as("c"))
      .filter(col("c").isNotNull)
    val wf = Window.partitionBy(col("x_id"))
      .orderBy(col("c").desc, col("y_id"))
    val wb = Window.partitionBy(col("y_id"))
      .orderBy(col("c").desc, col("x_id"))
    val ranked = pairs
      .withColumn("__rf", row_number().over(wf))
      .withColumn("__rb", row_number().over(wb))
    // neighborhood penalties: mean of the top-k rounded cosines per
    // endpoint — decimal fold then ONE double division by the actual
    // neighbor count (≤ k when the other side is small)
    def penalty(keyCol: String, rankCol: String, out: String) = ranked
      .filter(col(rankCol) <= k)
      .groupBy(keyCol)
      .agg(round(sum(col("c").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 12).as(out))
    ranked
      .join(penalty("x_id", "__rf", "px"), "x_id")
      .join(penalty("y_id", "__rb", "py"), "y_id")
      .withColumn("margin",
        round(col("c") / ((col("px") + col("py")) / 2), 6))
  }

  /** Mine pairs between `xs` and `ys` (both carrying `idCol`, `vecCol`;
    * ids must be unique within each side). Returns mined rows
    * (x_id, y_id, cosine, margin) — mutual-best pairs with margin ≥
    * `minMargin`. Null or zero-norm vectors never pair. */
  def marginMine(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.0): DataFrame = {
    val scored = scoredPairs(xs, ys, idCol, vecCol, k)
    val bestF = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id"))
    val bestB = Window.partitionBy(col("y_id"))
      .orderBy(col("margin").desc, col("x_id"))
    scored
      .withColumn("__bf", row_number().over(bestF))
      .withColumn("__bb", row_number().over(bestB))
      .filter(col("__bf") === 1 && col("__bb") === 1 &&
        col("margin") >= minMargin)
      .select(col("x_id"), col("y_id"), col("c").as("cosine"),
        col("margin"))
  }

  /** The scored candidate table (x_id, y_id, cosine, margin, fwd_rank,
    * bwd_rank) restricted to pairs inside either endpoint's top-k
    * neighborhood — the inspection/threshold-tuning view behind
    * [[marginMine]]'s mutual-best cut. */
  def marginScores(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame =
    scoredPairs(xs, ys, idCol, vecCol, k)
      .filter(col("__rf") <= k || col("__rb") <= k)
      .select(col("x_id"), col("y_id"), col("c").as("cosine"),
        col("margin"), col("__rf").as("fwd_rank"), col("__rb").as("bwd_rank"))
}
