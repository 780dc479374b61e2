package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published rule-based quality filters every large text-corpus
  * pipeline starts from — Gopher's document heuristics (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", §A.1.1 — public) and C4's
  * line-and-document cleaning (Raffel et al. 2020, "Exploring the Limits
  * of Transfer Learning", §2.2 — public). Both are PURE column
  * expressions over tokens and lines (codegen'd, narrow, zero shuffles),
  * so they run at scan speed on any corpus size and a DuckDB oracle
  * replays every emitted cell: rule filters must be auditable — a corpus
  * card that says "Gopher rules applied" is only trustworthy if the
  * per-document verdicts can be recomputed.
  *
  * Scale shape: narrow map over the documents scan; every statistic is a
  * per-row array fold. Nothing here aggregates — compose with the usual
  * groupBy rollups for corpus-level reporting.
  */
object QualityRules {

  /** The Gopher stop list: a document should contain at least
    * `minStopwordHits` DISTINCT words from this set (the paper's "stop
    * word" existence check — a weak but cheap English-fluency signal). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher rule table: one row per input row with every
    * signal the paper thresholds, plus the composite `keep`. Thresholds
    * are the paper's (word count in [minWords, maxWords], mean word
    * length in [3, 10], symbol-to-word ratio ≤ 0.1 counting '#' and
    * '...'/'…', ≤ 90% bullet-started and ≤ 30% ellipsis-ended non-blank
    * lines, ≥ 80% of words carrying an alphabetic character, ≥ 2 distinct
    * stop-list hits). Ratios emit round-6; counts are exact integers.
    * Empty documents report zero words and keep = false. The stop list
    * defaults to the paper's; corpora with a different function-word
    * inventory (non-English, synthetic) pass their own. */
  def gopherFlags(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopwords: Seq[String] = GopherStopwords): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"bad word bounds [$minWords, $maxWords]")
    require(stopwords.nonEmpty, "empty stop list")
    val t = col(textCol)
    val w = TextOps.tokens(t)
    val nWords = size(w).cast("long")
    val sumLen = aggregate(transform(w, x => length(x).cast("long")),
      lit(0L), _ + _)
    val meanLen = when(nWords > 0, round(sumLen.cast("double") / nWords, 6))
    val hashCount = (length(t) - length(replace(t, lit("#"), lit(""))))
      .cast("long")
    val ellipsisCount = ((size(split(t, "\\.\\.\\.")) - 1) +
      (length(t) - length(replace(t, lit("…"), lit("")))))
      .cast("long")
    val symbolRatio = when(nWords > 0,
      round((hashCount + ellipsisCount).cast("double") / nWords, 6))
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletStarts = size(filter(lines,
      l => trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("long")
    val ellipsisEnds = size(filter(lines,
      l => trim(l).endsWith("...") || trim(l).endsWith("…")))
      .cast("long")
    val bulletFrac = when(nLines > 0,
      round(bulletStarts.cast("double") / nLines, 6))
    val ellipsisFrac = when(nLines > 0,
      round(ellipsisEnds.cast("double") / nLines, 6))
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val alphaFrac = when(nWords > 0,
      round(alphaWords.cast("double") / nWords, 6))
    val stopHits = size(filter(array_distinct(w),
      x => x.isin(stopwords.map(lit): _*))).cast("long")
    val keep = nWords >= minWords && nWords <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 &&
      coalesce(bulletFrac <= 0.9, lit(true)) &&
      coalesce(ellipsisFrac <= 0.3, lit(true)) &&
      alphaFrac >= 0.8 && stopHits >= 2
    docs.select(col(idCol), nWords.as("n_words"),
      meanLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_word_frac"), stopHits.as("stopword_hits"),
      coalesce(keep, lit(false)).as("keep"))
  }

  /** Per-document C4 cleaning table: line-level retention (keep lines
    * with ≥ 5 words ending in terminal punctuation `.?!"`), then the
    * document verdicts — no "lorem ipsum", no '{' (the paper's
    * code-page proxy), and ≥ `minSentences` sentences among KEPT lines
    * (sentence = a non-blank `[.!?]`-delimited span). Emits the cleaned
    * text's md5 (both engines render md5 identically) rather than the
    * text itself, so the hashed gate pins the exact line set retained.
    * One row per input row: (id, n_lines, n_lines_kept, n_words_kept,
    * n_sentences, has_lorem, has_brace, keep, cleaned_md5). */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      minSentences: Int = 3): DataFrame = {
    require(minSentences >= 1, s"minSentences must be >= 1: $minSentences")
    val t = col(textCol)
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val isKept = (l: Column) => {
      val tl = trim(l)
      (tl.endsWith(".") || tl.endsWith("?") || tl.endsWith("!") ||
        tl.endsWith("\"")) &&
        size(split(tl, "\\s+")) >= 5
    }
    val kept = filter(lines, isKept)
    val cleaned = array_join(transform(kept, l => trim(l)), "\n")
    val nWordsKept = when(length(cleaned) === 0, 0L)
      .otherwise(size(split(cleaned, "\\s+")).cast("long"))
    val nSentences = size(filter(split(cleaned, "[.!?]"),
      s => length(trim(s)) > 0)).cast("long")
    // Null text yields null line/sentence columns (size-of-null) and a
    // null md5 — those stay null as the "no text" marker — but the
    // VERDICT coalesces to false so every input row carries one, the
    // same null-text semantics gopherFlags uses.
    val hasLorem = coalesce(lower(t).contains("lorem ipsum"), lit(false))
    val hasBrace = coalesce(t.contains("{"), lit(false))
    val keep = coalesce(
      !hasLorem && !hasBrace && nSentences >= minSentences, lit(false))
    docs.select(col(idCol), size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      nWordsKept.as("n_words_kept"), nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
      keep.as("keep"), md5(cleaned.cast("binary")).as("cleaned_md5"))
  }
}
