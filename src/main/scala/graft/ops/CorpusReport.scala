package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source corpus datasheet — the "dataset card" numbers a training-data
  * pipeline publishes for every ingested source: volume (docs, tokens),
  * exact-duplicate pressure (distinct canonical fingerprints), language
  * composition, and mean surface quality.
  *
  * One scan, one groupBy on the source key; every column is either an
  * integer aggregate or derived from one. The mean quality is aggregated
  * in micro-units (round(q·1e6) per doc) so the group sum is an exact
  * integer — summation order across partitions cannot move the reported
  * mean, which keeps the whole card engine-portable bit-for-bit. The
  * distinct-fingerprint count is Spark's two-phase distinct aggregate
  * (partial distinct map-side); at 100 TB swap in approx_count_distinct
  * if an exact dup census per source stops being worth its shuffle.
  */
object CorpusReport {

  /** (source, n_docs, n_tokens, n_unique_fp, n_en, mean_quality) ordered
    * by source. `mean_quality` = mean of per-doc [[TextOps.qualityScore]]
    * values, micro-quantized then rounded to 6 decimals.
    *
    * Pass a trained `tokenizer` to add `n_bpe_tokens` — REAL byte-pair
    * token volume ([[graft.functions.Bpe]]) next to the whitespace
    * estimate, so the card reports the number budgets actually spend. */
  def bySource(
      docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text", langCol: String = "lang",
      tokenizer: Option[graft.functions.BpeTokenizer] = None): DataFrame = {
    val t = col(textCol)
    val bpeAgg = tokenizer.toSeq.map { tok =>
      sum(size(graft.functions.Bpe.encodeIds(docs.sparkSession, t, tok))
        .cast("long")).as("n_bpe_tokens")
    }
    docs.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        (Seq(
          sum(TextOps.tokenCount(t)).as("n_tokens"),
          countDistinct(TextOps.fingerprint(t)).as("n_unique_fp"),
          sum(when(col(langCol) === "en", 1L).otherwise(0L)).as("n_en"),
          sum(round(TextOps.qualityScore(t) * 1e6)).as("__qsum")) ++
          bpeAgg): _*)
      .select(
        (Seq(col(sourceCol), col("n_docs"), col("n_tokens"),
          col("n_unique_fp"), col("n_en"),
          round(col("__qsum") / col("n_docs") / 1e6, 6).as("mean_quality")) ++
          tokenizer.toSeq.map(_ => col("n_bpe_tokens"))): _*)
      .orderBy(col(sourceCol))
  }
}
