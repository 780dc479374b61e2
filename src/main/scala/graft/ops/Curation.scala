package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships: rule filters → quality floor → exact dedup →
  * decontamination, with a funnel report accounting for every document.
  * Each stage is an already-gated operator
  * ([[QualityRules.gopherFlags]]/[[QualityRules.c4Clean]] via the
  * pluggable verdict frame, [[TextOps.qualityScore]], [[Dedup]]'s
  * fingerprint groups, [[Decontaminate.overlapExact]]); this ties them
  * together with the FilterFunnel discipline: all stage flags ride ONE
  * wide frame (one corpus scan + one fingerprint aggregation + one
  * shingle join), so the funnel is a single aggregation instead of a
  * count per stage.
  *
  * Stage semantics are SEQUENTIAL (a funnel, not independent filters):
  * rule verdicts cut first (the Gopher/C4 shape — cheap codegen column
  * rules run before anything that aggregates), dedup canonicality is
  * decided among rule+quality survivors (the canonical copy of a
  * duplicate family is its lowest-id member that passed both), and
  * contamination only removes docs that survived every earlier stage.
  * Thresholds compare on 6-rounded scores so the cut is
  * engine-portable at the boundary.
  */
object Curation {

  /** The per-document stage-flag frame: (id, rules_pass, quality,
    * q_pass, canonical, contam_frac, clean, kept, n_tokens). `evalDocs`
    * is the benchmark / holdout corpus to decontaminate against (its
    * shingle set broadcasts via the Decontaminate machinery's join).
    *
    * `ruleVerdicts` is the optional stage-1 rule table — (id,
    * rules_pass), typically the conjunction of
    * [[QualityRules.gopherFlags]] and [[QualityRules.c4Clean]] `keep`
    * columns (pluggable, so a pipeline can swap in language-ID or
    * custom rules). Docs absent from the verdict frame fail the stage
    * (a rule filter that silently skipped rows would inflate the
    * corpus); with no frame the stage passes everything. */
  def stageFlags(
      docs: DataFrame, idCol: String, textCol: String, evalDocs: DataFrame,
      evalTextCol: String, minQuality: Double = 0.5,
      maxContamination: Double = 0.2, ngram: Int = 3,
      ruleVerdicts: Option[DataFrame] = None): DataFrame = {
    require(minQuality >= 0 && minQuality <= 1, s"minQuality in [0,1]: $minQuality")
    require(maxContamination >= 0 && maxContamination <= 1,
      s"maxContamination in [0,1]: $maxContamination")
    val base0 = docs.select(col(idCol).as("id"), col(textCol).as("__text"),
      round(TextOps.qualityScore(col(textCol)), 6).as("quality"),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val withRules = ruleVerdicts match {
      case Some(rv) => base0
        .join(rv.select(col("id"), col("rules_pass")), Seq("id"), "left")
        .withColumn("rules_pass", coalesce(col("rules_pass"), lit(false)))
      case None => base0.withColumn("rules_pass", lit(true))
    }
    val base = withRules.withColumn("q_pass", col("quality") >= minQuality)
    // canonical = lowest id among RULE+QUALITY SURVIVORS sharing the
    // normalized-text fingerprint; failing docs are never canonical
    val surv = col("rules_pass") && col("q_pass")
    val wFp = Window.partitionBy(col("__fp"))
    val withFp = base
      .withColumn("__fp",
        when(surv, TextOps.fingerprint(col("__text"))))
      .withColumn("canonical",
        surv && col("id") === min(when(surv, col("id"))).over(wFp))
    // contamination vs the eval shingle set, for every doc (cheap to
    // carry; the funnel applies it only to earlier-stage survivors)
    val contam = Decontaminate.overlapExact(
        docs.select(col(idCol).as("id"), col(textCol).as("t")), "id", "t",
        evalDocs.select(col(evalTextCol).as("t")), "t", n = ngram)
      .select(col("id"), round(col("frac"), 6).as("contam_frac"))
    withFp.join(contam, Seq("id"), "left")
      .withColumn("contam_frac", coalesce(col("contam_frac"), lit(0.0)))
      .withColumn("clean", col("contam_frac") <= maxContamination)
      .withColumn("kept",
        col("rules_pass") && col("q_pass") && col("canonical") &&
          col("clean"))
      .select("id", "rules_pass", "quality", "q_pass", "canonical",
        "contam_frac", "clean", "kept", "n_tokens")
  }

  /** One-row funnel: (n_input, n_rules, n_quality, n_dedup, n_clean,
    * tokens_kept) — sequential survivor counts plus the final token
    * mass, from ONE aggregation over [[stageFlags]]. */
  def funnelReport(flags: DataFrame): DataFrame =
    flags.agg(
      count(lit(1)).as("n_input"),
      coalesce(sum(when(col("rules_pass"), 1L)), lit(0L)).as("n_rules"),
      coalesce(sum(when(col("rules_pass") && col("q_pass"), 1L)),
        lit(0L)).as("n_quality"),
      coalesce(sum(when(col("rules_pass") && col("q_pass") &&
        col("canonical"), 1L)), lit(0L)).as("n_dedup"),
      coalesce(sum(when(col("kept"), 1L)), lit(0L)).as("n_clean"),
      coalesce(sum(when(col("kept"), col("n_tokens"))), lit(0L))
        .as("tokens_kept"))

  /** The curated corpus itself: input rows surviving all stages. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String, evalDocs: DataFrame,
      evalTextCol: String, minQuality: Double = 0.5,
      maxContamination: Double = 0.2, ngram: Int = 3,
      ruleVerdicts: Option[DataFrame] = None): DataFrame = {
    val kept = stageFlags(docs, idCol, textCol, evalDocs, evalTextCol,
        minQuality, maxContamination, ngram, ruleVerdicts)
      .filter(col("kept")).select(col("id"))
    docs.join(kept, docs(idCol) === kept("id")).drop(kept("id"))
  }
}
