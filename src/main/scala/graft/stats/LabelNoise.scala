package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-noise detection via confident learning (Northcutt, Jiang & Chuang
  * 2021, JAIR — "Confident Learning: Estimating Uncertainty in Dataset
  * Labels", public): given each example's noisy label and a model's
  * per-class predicted probabilities, estimate WHICH labels are wrong —
  * the audit a labeling campaign runs between [[Agreement]]'s rater
  * coefficients and a relabeling pass.
  *
  * The count method: per-class self-confidence thresholds
  * t_j = mean p_j over examples GIVEN label j; an example counts into the
  * confident joint C[given][suggested] where suggested = argmax_j p_j
  * over classes whose threshold the example clears (no class cleared →
  * the example abstains from the joint, the paper's convention).
  * Off-diagonal mass estimates the mislabeling rate; the flagged table
  * lists examples whose suggested class differs from their given label.
  *
  * Engine-parity: thresholds are decimal-folded means rounded to 12; the
  * argmax breaks ties on the SMALLEST class index; labels are integer
  * class indices 0..k−1 (fail loudly outside — a silently coerced label
  * would misattribute noise).
  *
  * Scale shape: one k-group aggregate for thresholds (collected — k is
  * the class count, driver-bounded by contract), then one k-wide
  * posexplode joined to the broadcast threshold table with a per-example
  * window — shuffle k·n thin rows once, k² result. No corpus×corpus
  * anything.
  */
object LabelNoise {

  /** (given label, probs) → per-example confident suggestion:
    * (idCol, given, suggested, p_given, p_suggested). Examples clearing
    * no class threshold are absent. `probsCol` must be an array<double>
    * of length `k` (violations fail loudly at execution). */
  def confidentSuggestions(df: DataFrame, idCol: String, labelCol: Column,
      probsCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 classes, got $k")
    val base = df
      .filter(labelCol.isNotNull && probsCol.isNotNull)
      .select(col(idCol), labelCol.cast("int").as("given"),
        probsCol.cast("array<double>").as("probs"))
      .select(col(idCol), col("given"),
        when(col("given") < 0 || col("given") >= k,
          raise_error(concat(lit(s"label outside 0..${k - 1}: "),
            col("given").cast("string"))))
          .otherwise(col("given")).as("given2"),
        when(size(col("probs")) =!= k,
          raise_error(concat(lit(s"probs length != $k: "),
            size(col("probs")).cast("string"))))
          .otherwise(col("probs")).as("probs2"))
      .select(col(idCol), col("given2").as("given"),
        col("probs2").as("probs"))
    // t_j = rounded decimal-fold mean of p_j over examples given label j
    val thresholds = base
      .select(col("given").as("j"),
        element_at(col("probs"), col("given") + 1).as("p"))
      .groupBy("j")
      .agg(round(sum(col("p").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 12).as("t"))
    val exploded = base
      .select(col(idCol), col("given"),
        posexplode(col("probs")).as(Seq("j", "p")))
      .join(broadcast(thresholds), "j")
      .filter(col("p") >= col("t"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("p").desc, col("j"))
    exploded
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col("given"), col("j").as("suggested"),
        col("p").as("p_suggested"))
      .join(base.select(col(idCol), col("given"),
        element_at(col("probs"), col("given") + 1).as("p_given")),
        Seq(idCol, "given"))
      .select(col(idCol), col("given"), col("suggested"),
        col("p_given"), col("p_suggested"))
  }

  /** The confident joint C[given][suggested]: (given, suggested, n) for
    * non-zero cells, plus each cell's share of the counted examples
    * (rounded 6). Off-diagonal rows are the estimated label noise. */
  def confidentJoint(df: DataFrame, idCol: String, labelCol: Column,
      probsCol: Column, k: Int): DataFrame = {
    val sugg = confidentSuggestions(df, idCol, labelCol, probsCol, k)
    val cells = sugg.groupBy("given", "suggested")
      .agg(count(lit(1)).as("n"))
    cells
      .crossJoin(broadcast(cells.agg(sum(col("n")).as("__tot"))))
      .select(col("given"), col("suggested"), col("n"),
        round(col("n") / col("__tot"), 6).as("share"))
  }

  /** Flagged examples: confident suggestion ≠ given label, the
    * relabel-queue table sorted by how confidently the model disagrees. */
  def labelIssues(df: DataFrame, idCol: String, labelCol: Column,
      probsCol: Column, k: Int): DataFrame =
    confidentSuggestions(df, idCol, labelCol, probsCol, k)
      .filter(col("suggested") =!= col("given"))
}
