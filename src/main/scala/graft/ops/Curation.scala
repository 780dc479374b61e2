package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships: quality floor → exact dedup → decontamination, with a
  * funnel report accounting for every document. Each stage is an
  * already-gated operator ([[TextOps.qualityScore]], [[Dedup]]'s
  * fingerprint groups, [[Decontaminate.overlapExact]]); this ties them
  * together with the FilterFunnel discipline: all stage flags ride ONE
  * wide frame (one corpus scan + one fingerprint aggregation + one
  * shingle join), so the funnel is a single aggregation instead of a
  * count per stage.
  *
  * Stage semantics are SEQUENTIAL (a funnel, not independent filters):
  * dedup canonicality is decided among quality survivors (the canonical
  * copy of a duplicate family is its lowest-id member that passed the
  * quality floor), and contamination only removes docs that survived
  * both earlier stages. Thresholds compare on 6-rounded scores so the
  * cut is engine-portable at the boundary.
  */
object Curation {

  /** The per-document stage-flag frame: (id, quality, q_pass, canonical,
    * contam_frac, clean, kept, n_tokens). `evalDocs` is the benchmark /
    * holdout corpus to decontaminate against (its shingle set broadcasts
    * via the Decontaminate machinery's join). */
  def stageFlags(
      docs: DataFrame, idCol: String, textCol: String, evalDocs: DataFrame,
      evalTextCol: String, minQuality: Double = 0.5,
      maxContamination: Double = 0.2, ngram: Int = 3): DataFrame = {
    require(minQuality >= 0 && minQuality <= 1, s"minQuality in [0,1]: $minQuality")
    require(maxContamination >= 0 && maxContamination <= 1,
      s"maxContamination in [0,1]: $maxContamination")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__text"),
        round(TextOps.qualityScore(col(textCol)), 6).as("quality"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("q_pass", col("quality") >= minQuality)
    // canonical = lowest id among QUALITY SURVIVORS sharing the
    // normalized-text fingerprint; failing docs are never canonical
    val wFp = Window.partitionBy(col("__fp"))
    val withFp = base
      .withColumn("__fp",
        when(col("q_pass"), TextOps.fingerprint(col("__text"))))
      .withColumn("canonical",
        col("q_pass") && col("id") === min(when(col("q_pass"), col("id")))
          .over(wFp))
    // contamination vs the eval shingle set, for every doc (cheap to
    // carry; the funnel applies it only to stage-2 survivors)
    val contam = Decontaminate.overlapExact(
        docs.select(col(idCol).as("id"), col(textCol).as("t")), "id", "t",
        evalDocs.select(col(evalTextCol).as("t")), "t", n = ngram)
      .select(col("id"), round(col("frac"), 6).as("contam_frac"))
    withFp.join(contam, Seq("id"), "left")
      .withColumn("contam_frac", coalesce(col("contam_frac"), lit(0.0)))
      .withColumn("clean", col("contam_frac") <= maxContamination)
      .withColumn("kept", col("q_pass") && col("canonical") && col("clean"))
      .select("id", "quality", "q_pass", "canonical", "contam_frac",
        "clean", "kept", "n_tokens")
  }

  /** One-row funnel: (n_input, n_quality, n_dedup, n_clean,
    * tokens_kept) — sequential survivor counts plus the final token
    * mass, from ONE aggregation over [[stageFlags]]. */
  def funnelReport(flags: DataFrame): DataFrame =
    flags.agg(
      count(lit(1)).as("n_input"),
      coalesce(sum(when(col("q_pass"), 1L)), lit(0L)).as("n_quality"),
      coalesce(sum(when(col("q_pass") && col("canonical"), 1L)), lit(0L))
        .as("n_dedup"),
      coalesce(sum(when(col("kept"), 1L)), lit(0L)).as("n_clean"),
      coalesce(sum(when(col("kept"), col("n_tokens"))), lit(0L))
        .as("tokens_kept"))

  /** The curated corpus itself: input rows surviving all stages. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String, evalDocs: DataFrame,
      evalTextCol: String, minQuality: Double = 0.5,
      maxContamination: Double = 0.2, ngram: Int = 3): DataFrame = {
    val kept = stageFlags(docs, idCol, textCol, evalDocs, evalTextCol,
        minQuality, maxContamination, ngram)
      .filter(col("kept")).select(col("id"))
    docs.join(kept, docs(idCol) === kept("id")).drop(kept("id"))
  }
}
