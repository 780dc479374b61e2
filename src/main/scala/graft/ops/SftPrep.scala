package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / preference-data preparation: the last transform between a scored
  * corpus and a fine-tuning run. Both operators are pure narrow maps or
  * single windows over candidate tables — no corpus-sized shuffles — and
  * both are deterministic, so the exact training file is reproducible
  * from the corpus snapshot.
  *
  * The chat template is the ChatML-style role framing (public across
  * open-model ecosystems): `<|im_start|>role\ncontent<|im_end|>\n`
  * per turn. Rendering is string concatenation — oracle-checkable —
  * and the special-token strings are parameters, not policy.
  */
object SftPrep {

  /** Render (system, user, assistant) turn columns into one training
    * string. Null system drops the system turn entirely (not an empty
    * turn); null user or assistant yields null (a pair with a missing
    * side is not a trainable example). Adds `rendered`. */
  def renderChat(df: DataFrame, systemCol: Column, userCol: Column,
      assistantCol: Column, bos: String = "<|im_start|>",
      eos: String = "<|im_end|>"): DataFrame = {
    def turn(role: String, content: Column): Column =
      concat(lit(bos), lit(role), lit("\n"), content, lit(eos), lit("\n"))
    val sys = when(systemCol.isNull, lit("")).otherwise(
      turn("system", systemCol))
    val body = concat(sys, turn("user", userCol),
      turn("assistant", assistantCol))
    df.withColumn("rendered",
      when(userCol.isNull || assistantCol.isNull,
        lit(null).cast("string")).otherwise(body))
  }

  /** Build (chosen, rejected) preference pairs from scored candidates:
    * per group (prompt), the highest-scoring candidate is `chosen` and
    * the lowest is `rejected`, kept only when the score margin STRICTLY
    * exceeds `minMargin` (a pair the scorer can barely separate is
    * label noise; with the default 0.0, tied candidates never form a
    * pair — a tie's orientation would be a pure id-order artifact) and
    * the two are distinct rows. Ties break on id — deterministic,
    * engine-portable. One window over the candidate table. Null scores
    * never pair. Returns (groupCol, chosen_id, rejected_id,
    * chosen_score, rejected_score, margin). */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
        col(scoreCol).cast("double").as("s"))
      .filter(col("s").isNotNull)
    val wTop = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id"))
    val wBot = Window.partitionBy(col("g"))
      .orderBy(col("s").asc, col("id").desc)
    base
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
      .withColumn("__best", max(when(col("__rt") === 1,
        struct(col("s").as("s"), col("id").as("id"))))
        .over(Window.partitionBy(col("g"))))
      .filter(col("__rb") === 1)
      .filter(col("__best.id") =!= col("id"))
      .select(col("g").as(groupCol),
        col("__best.id").as("chosen_id"),
        col("id").as("rejected_id"),
        col("__best.s").as("chosen_score"),
        col("s").as("rejected_score"),
        (col("__best.s") - col("s")).as("margin"))
      .filter(col("margin") > minMargin)
  }
}
