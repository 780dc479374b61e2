package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Text-analysis operators for a training-data pipeline: tokenization,
  * shingling, language ID, quality scoring, fingerprinting. All pure
  * `Column` expressions (codegen'd, no UDFs) so they run inside whole-stage
  * codegen at any scale.
  *
  * Every function here has a DuckDB-SQL mirror in
  * [[graft.queries.TextQueries]] — arithmetic is ordered identically so
  * results hash-match bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens of trimmed text; empty/blank → empty array (the
    * split-of-empty-string quirk returns [""] in both engines, guarded
    * identically here and in the oracle). */
  /** Chao1 vocabulary-richness estimate + Good–Turing unseen mass
    * (Chao 1984; Good 1953 — public): "how many types does this corpus
    * REALLY have" and "what probability mass belongs to words we have
    * not seen yet" — both read off the frequency-of-frequencies table:
    * Chao1 = D + f₁²/(2f₂) (bias-corrected (f₁(f₁−1))/(2(f₂+1)) when
    * f₂ = 0), p_unseen = f₁/N. The corpus-coverage companions to the
    * Heaps/Zipf fits: a crawl whose Chao1 keeps running away from its
    * observed vocabulary is nowhere near lexical saturation.
    *
    * Two map-side-combined aggregations (wordcount, then
    * counts-of-counts) — every input to both estimators is an exact
    * integer, so the oracle replays them bit-for-bit before the shared
    * rounds. Returns one row (n_tokens, vocab, f1, f2, chao1,
    * p_unseen), estimates round-6. */
  def lexicalRichness(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    counts.agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        when(col("f2") > 0L,
          round(col("vocab") + col("f1").cast("double") * col("f1")
            / (lit(2.0) * col("f2")), 6))
          .otherwise(round(col("vocab")
            + col("f1").cast("double") * (col("f1") - 1)
            / (lit(2.0) * (col("f2") + 1)), 6)).as("chao1"),
        round(col("f1").cast("double") / col("n_tokens"), 6)
          .as("p_unseen"))
  }

  /** Vocabulary-concentration indices (all textbook, public): Yule's K
    * = 10⁴·(Σc² − N)/N² (Yule 1944 — repeat-rate characteristic,
    * famously stable under corpus truncation), Simpson's D =
    * Σc(c−1)/(N(N−1)) (the probability two random tokens are the same
    * type), and Herdan's C = lnV/lnN (log type–token ratio). The
    * "too-repetitive corpus" screens that complement
    * [[lexicalRichness]]'s "how much vocabulary is left" view: K and D
    * spike on template/boilerplate floods long before dedup sees exact
    * copies.
    *
    * Same shape as [[lexicalRichness]]: one wordcount groupBy + one
    * counts rollup; Σc² folds in decimal (a 10¹¹-count type squares
    * past a long). All three indices are fixed double arithmetic over
    * exact integers — oracle-replayable. Returns one row (n_tokens,
    * vocab, yules_k, simpson_d, herdan_c), round-6; needs N ≥ 2 and
    * V ≥ 2 (loud). */
  def vocabConcentration(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val r = counts.agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("v"),
      sum(col("c").cast("decimal(38,0)") * col("c")).as("s2")).head()
    val n = r.getAs[Long]("n"); val v = r.getAs[Long]("v")
    require(n >= 2 && v >= 2,
      s"concentration needs >= 2 tokens of >= 2 types, got n=$n v=$v")
    val s2 = r.getAs[java.math.BigDecimal]("s2").doubleValue
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val k = 10000.0 * (s2 - n) / (n.toDouble * n)
    val d = (s2 - n) / (n.toDouble * (n - 1))
    val c = math.log(v.toDouble) / math.log(n.toDouble)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((n, v, r6(k), r6(d), r6(c)))
      .toDF("n_tokens", "vocab", "yules_k", "simpson_d", "herdan_c")
  }

  /** Term burstiness (Church & Gale 1995's cf/df contrast, public): a
    * term appearing 1000 times in 10 documents behaves NOTHING like one
    * appearing 100 times in 100 — bursty terms are topical/entity-like
    * (and template artifacts at the extreme), spread terms are function
    * words. Reported as the top-k most bursty terms above a document-
    * frequency floor — the screen that surfaces boilerplate signatures
    * [[vocabConcentration]] only hints at corpus-wide.
    *
    * One groupBy(token) with count + count_distinct(doc) — both exact
    * integers riding the same shuffle; burstiness = cf/df is the
    * identical double in both engines, and the top-k cut orders by
    * (burstiness DESC, token ASC) so the boundary is deterministic.
    * Returns ≤ k rows (token, cf, df, burstiness round-6). */
  def termBurstiness(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 5, topK: Int = 20): DataFrame = {
    require(minDf >= 1 && topK >= 1, s"minDf/topK must be >= 1")
    docs.select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cf"),
        count_distinct(col("__id")).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("burstiness",
        round(col("cf").cast("double") / col("df"), 6))
      .orderBy(col("burstiness").desc, col("tok").asc)
      .limit(topK)
      .select(col("tok").as("token"), col("cf"), col("df"),
        col("burstiness"))
  }

  /** Per-document character-bigram Shannon entropy (in nats) — the
    * gibberish/repetition screen below the token level: keyboard mash
    * and template floods both collapse bigram entropy long before any
    * word-level statistic moves, and it needs no language model. H =
    * ln m − (Σ c·ln c)/m from exact bigram counts, so a low-H doc is
    * provably repetitive, not "model said so". Composes with
    * [[vocabConcentration]] (corpus level) as the per-doc filter
    * column.
    *
    * Bigrams extract in-plan via transform/substring (codegen, no UDF);
    * one (doc, gram) groupBy rides a single shuffle, the per-doc
    * Σc·ln c folds round-9 as decimals. Docs with < 2 characters have
    * no bigrams and are excluded (document the floor). Returns (id,
    * n_bigrams, n_distinct, entropy) ordered by id, entropy round-6. */
  def charBigramEntropy(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= 2)
      .select(col(idCol).as("id"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - 1), " +
            s"i -> substring($textCol, i, 2))")).as("g"))
    grams.groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")),
          9).cast("decimal(38,12)")).cast("double").as("__sclc"))
      .select(col("id"), col("n_bigrams"), col("n_distinct"),
        round(log(col("n_bigrams").cast("double")) -
          col("__sclc") / col("n_bigrams"), 6).as("entropy"))
      .orderBy("id")
  }

  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** GPT-style pre-tokenizer pieces — the "BPE-ish" unit whose count tracks
    * real tokenizer costs far better than whitespace words (punctuation,
    * digit runs, and contractions split off; a BPE vocab then only
    * subdivides these further). The pattern is the classic byte-pair
    * pre-split reduced to RE2-safe syntax (no lookahead, so DuckDB/Go
    * mirrors are byte-identical): contractions | optional-space letters |
    * optional-space digits | optional-space other-punct runs. Whitespace
    * itself is not a piece. */
  val BpePiecePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** All pre-tokenizer pieces of the text, in order (regexp extraction —
    * codegen'd, no UDF). */
  def bpePieces(c: Column): Column =
    regexp_extract_all(c.cast(StringType), lit(BpePiecePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpePieces(c))

  /** Conservative PII redaction for training corpora: emails, IPv4
    * addresses, then long digit runs (7+: phone/account shapes) replaced
    * with typed placeholders, in that order — emails first because they
    * contain digits and dots the later patterns would mangle. A pure
    * `regexp_replace` chain (codegen'd, no shuffle); patterns avoid
    * Java-only regex features so an RE2 engine (DuckDB, Go tooling)
    * produces byte-identical output. Idempotent: placeholders match none
    * of the patterns. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
      "\\b\\d{7,}\\b", "<NUM>")

  /** Luhn checksum verdict for a PURE-DIGIT string column (ISO/IEC 7812
    * — public): true iff the mod-10 sum with every second digit from
    * the right doubled (minus 9 past 9) clears. Null/empty/non-digit
    * inputs are null. Compositional higher-order form — the DuckDB
    * mirror is the identical list fold, which is what makes the
    * validator oracle-checkable; the PRODUCTION redaction path is the
    * native [[graft.functions.LuhnRedactCards]] (codegen'd single
    * scan). */
  def luhnValid(c: Column): Column = {
    val s = c.cast("string")
    val n = length(s)
    val total = aggregate(
      transform(sequence(lit(1), n), r => {
        val d = substring(s, (n - r + 1).cast("int"), lit(1)).cast("int")
        when(r % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    when(s.isNotNull && n > 0 && s.rlike("^[0-9]+$"), total % 10 === 0)
  }

  /** Mojibake signature pattern — the classic UTF-8-misdecoded-as-
    * Latin-1/Windows-1252 fingerprints: `Ã`+continuation (é→Ã©),
    * `â€` (curly quotes/dashes), `Â`+non-breaking-space block, the
    * replacement character U+FFFD (a decoder already gave up), and raw
    * C1 control characters (valid in NO sane text). `\x{..}` escapes
    * parse identically in Java regex and RE2, and no alternative shares
    * a leading character with another, so leftmost-first (Java) and the
    * RE2 scan count the same non-overlapping matches. */
  val MojibakePattern: String =
    "Ã[\\x{0080}-\\x{00BF}]|â€|" +
      "Â[\\x{00A0}-\\x{00BF}]|\\x{FFFD}|[\\x{0080}-\\x{009F}]"

  /** Encoding-damage signal count — how many mojibake fingerprints the
    * text carries (0 = clean). The cheap pre-filter a web-scale corpus
    * runs before any language ID or quality score: double-encoded
    * documents poison token statistics and always need re-decoding, not
    * scoring. Pure codegen regexp count; null text is null. */
  def mojibakeCount(c: Column): Column =
    regexp_count(c.cast(StringType), lit(MojibakePattern))

  /** Jaro–Winkler similarity of two string columns (the name-matching
    * score for entity resolution beside the Levenshtein candidate
    * filter) — native codegen expression, DuckDB-built-in semantics.
    * See [[graft.functions.JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => graft.functions.JaroWinkler(exprs(0), exprs(1)), "built-in")
    call_function("graft_jaro_winkler",
      a.cast(StringType), b.cast(StringType))
  }

  /** Payment-card redaction: maximal 13–19 digit runs that pass Luhn
    * become `<CARD>`; everything else (order ids, timestamps) is
    * untouched. Native single-scan expression — see
    * [[graft.functions.LuhnRedactCards]]. */
  def redactCards(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_luhn_redact",
      exprs => graft.functions.LuhnRedactCards(exprs.head), "built-in")
    call_function("graft_luhn_redact", c.cast(StringType))
  }

  /** Duplicate-line fraction — the within-document repetition signal of
    * the Gopher/C4 quality filters: 1 − distinct/total over non-blank
    * trimmed lines; 0 for texts with no non-blank line. Pure array
    * expression (split/transform/filter/array_distinct), codegen'd. */
  def duplicateLineFraction(c: Column): Column = {
    val lines = filter(
      transform(split(c, "\n"), l => trim(l)), l => length(l) > 0)
    when(size(lines) > 0,
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
      .otherwise(lit(0.0))
  }

  /** Overlapping character chunks for embedding/context windows: starts
    * step by `size - overlap`, the last chunk begins at or before
    * `length - overlap - 1` so text is covered exactly once with no
    * redundant trailing chunk; chunks may run short at the end. Empty/null
    * text → empty array. A pure array expression (sequence + transform +
    * substr): codegen'd, no UDF, explodes map-side — chunking 100 TB is a
    * narrow stage fused into the scan. */
  def chunks(c: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    when(c.isNotNull && length(c) > 0,
      transform(
        sequence(lit(0), greatest(length(c) - overlap - 1, lit(0)), lit(stride)),
        start => c.substr(start + 1, lit(size))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles joined with single spaces (distinct set), via the
    * native [[graft.functions.ShingleNGrams]] expression. The compositional
    * `transform(sequence(...), i -> concat_ws(slice(w, ...)))` form embeds
    * the split pipeline inside the lambda so interpreted eval re-splits the
    * document per shingle — O(words²) and never codegen'd; the native
    * expression is one pass (same output, bit-for-bit). */
  def shingles(c: Column, n: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val fname = s"graft_shingles_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.ShingleNGrams(exprs.head, n), "built-in")
    call_function(fname, c.cast(StringType))
  }

  /** Flesch–Kincaid readability (Kincaid 1975; Flesch 1948 — public):
    * grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59 and
    * reading ease = 206.835 − 1.015·(w/s) − 84.6·(sy/w) — the classic
    * complexity screens a quality filter slices corpora by.
    *
    * Everything derives from exact integer counts so the oracle mirrors
    * division-for-division:
    *  - words = [[tokens]];
    *  - sentences = terminator runs followed by whitespace or
    *    end-of-text (`[.!?]+(\s|\z)` — \z, never $, whose before-final-
    *    newline semantics differ between java.util.regex and RE2),
    *    floored at 1;
    *  - syllables = vowel-group runs over the lowercased text (runs
    *    cannot span whitespace, so the whole-text count equals the
    *    per-word sum) plus one for each vowel-less word (FK's
    *    min-1-syllable rule).
    * Empty documents yield null grades (0/0 is undefined, and ANSI would
    * throw). Adds n_words, n_sentences, n_syllables, fk_grade, fre —
    * a pure narrow map. */
  def readability(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val w = tokens(t)
    val nWords = size(w).cast("long")
    val nSentences = greatest(lit(1L),
      size(regexp_extract_all(t, lit("[.!?]+(\\s|\\z)"), lit(0))).cast("long"))
    val vowelRuns =
      size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0))).cast("long")
    val noVowelWords =
      size(filter(w, x => !lower(x).rlike("[aeiouy]"))).cast("long")
    val nSyll = vowelRuns + noVowelWords
    val wps = nWords.cast("double") / nSentences
    val spw = nSyll.cast("double") / nWords
    df.withColumn("n_words", nWords)
      .withColumn("n_sentences", nSentences)
      .withColumn("n_syllables", nSyll)
      .withColumn("fk_grade",
        when(nWords > 0, round(lit(0.39) * wps + lit(11.8) * spw
          - lit(15.59), 4)))
      .withColumn("fre",
        when(nWords > 0, round(lit(206.835) - lit(1.015) * wps
          - lit(84.6) * spw, 4)))
  }

  /** Heaps-law vocabulary growth curve (Heaps 1978 — public): distinct
    * vocabulary size after the first N tokens, at a GEOMETRIC grid
    * (powers of 2 up to the total, plus the total itself — log-spaced,
    * because the fit lives in ln-ln space and a linear grid lands every
    * point past the saturation knee) — V(N) ≈ K·N^β on natural text, so
    * a corpus whose curve bends early (vocabulary saturating) is
    * template/boilerplate-heavy, and one that never bends is noise/IDs.
    * The corpus order is the engine-portable identity hash of the doc
    * id (reproducible and engine-replayable, unlike file order).
    *
    * Scale shape: ONE distributed range-partitioned sort of the docs by
    * hash, then the classic two-pass parallel prefix scan (per-partition
    * length totals to the driver — partition-count-sized — broadcast
    * back as offsets) assigns every token its global 1-based position;
    * first-occurrence positions are one wordcount-shaped groupBy; the
    * curve is a broadcast join against the ≤10-row grid. No global
    * window anywhere. Returns (n_prefix, vocab) ordered by n_prefix. */
  def heapsCurve(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(col(idCol).cast("long").as("id"),
        coalesce(tokens(col(textCol)), array().cast("array<string>")).as("w"),
        Sampling.hashHex("graft-heaps", Seq(col(idCol))).as("h"))
      .as[(Long, Seq[String], String)].rdd
      .sortBy { case (id, _, h) => (h, id) }
      .persist()
    try {
      val partLens = docs.mapPartitionsWithIndex { case (i, it) =>
          Iterator((i, it.map(_._2.size.toLong).sum))
        }.collect().sortBy(_._1).map(_._2)
      val total = partLens.sum
      val offsets = partLens.scanLeft(0L)(_ + _)
      val bOff = spark.sparkContext.broadcast(offsets)
      val firstSeen = docs.mapPartitionsWithIndex { case (i, it) =>
          var off = bOff.value(i)
          it.flatMap { case (_, w, _) =>
            val start = off
            off += w.size
            w.iterator.zipWithIndex.map { case (t, j) => (t, start + j + 1L) }
          }
        }.toDF("t", "pos")
        .groupBy("t").agg(min(col("pos")).as("fp"))
      val grid = (Iterator.iterate(2L)(_ * 2).takeWhile(p => p < total)
        .toSeq ++ Seq(total)).distinct.filter(_ > 0)
      firstSeen
        .crossJoin(broadcast(grid.toDF("n_prefix")))
        .filter(col("fp") <= col("n_prefix"))
        .groupBy("n_prefix").agg(count(lit(1)).as("vocab"))
        .orderBy("n_prefix")
    } finally {
      docs.unpersist()
      ()
    }
  }

  /** OLS fit of ln(vocab) on ln(n_prefix) over the [[heapsCurve]] geometric
    * grid — one row (n_points, beta, ln_k, r2); β is Heaps' exponent
    * (~0.4–0.6 on natural text), ln_k the intercept (emitted in log
    * space — exponentiating is the caller's choice, keeping the gate to
    * ln/arithmetic parity). Same rounded-ln decimal-fold moments as
    * [[zipfFit]]; nulls when fewer than 2 distinct grid points. */
  def heapsFit(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val curve = heapsCurve(df, idCol, textCol)
      .withColumn("x", round(log(col("n_prefix").cast("double")), 9))
      .withColumn("y", round(log(col("vocab").cast("double")), 9))
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    curve.agg(
        count(lit(1)).as("n_points"),
        fold(col("x")).as("__sx"), fold(col("y")).as("__sy"),
        fold(round(col("x") * col("y"), 9)).as("__sxy"),
        fold(round(col("x") * col("x"), 9)).as("__sxx"),
        fold(round(col("y") * col("y"), 9)).as("__syy"))
      .withColumn("__cxy",
        col("__sxy") - col("__sx") * col("__sy") / col("n_points"))
      .withColumn("__cxx",
        col("__sxx") - col("__sx") * col("__sx") / col("n_points"))
      .withColumn("__cyy",
        col("__syy") - col("__sy") * col("__sy") / col("n_points"))
      .select(col("n_points"),
        when(col("__cxx") > 0,
          round(col("__cxy") / col("__cxx"), 6)).as("beta"),
        when(col("__cxx") > 0,
          round(col("__sy") / col("n_points")
            - (col("__cxy") / col("__cxx")) * col("__sx") / col("n_points"),
            6)).as("ln_k"),
        when(col("__cxx") > 0 &&
            col("__cyy") > lit(1e-9) * greatest(col("__syy"), lit(1.0)),
          round(pow(col("__cxy"), 2) / (col("__cxx") * col("__cyy")), 6))
          .as("r2"))
  }

  /** Zipf rank-frequency fit over the corpus vocabulary (Zipf 1949 —
    * public): OLS of ln(count) on ln(rank) over the token frequency
    * table. Natural text sits near slope −1; synthetic, templated, or
    * keyword-stuffed corpora flatten or steepen it, making the slope a
    * one-number corpus-health screen next to the quality filters.
    * Also reports the hapax share (frequency-1 tokens / vocabulary —
    * the Heaps-law companion; collapsed hapax share flags boilerplate).
    *
    * One wordcount aggregation (vocabulary-sized shuffle), one
    * DISTRIBUTED sort of the vocabulary table for ranks (count desc,
    * token asc ties; partition-offset positions, never a global
    * window), OLS moments as rounded-ln decimal folds — fully
    * oracle-checkable.
    * Returns one row (vocab, n_tokens, slope, intercept, r2,
    * hapax_share), nulls when fewer than 2 distinct ranks exist. */
  def zipfFit(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    // global frequency rank WITHOUT a global window (web-scale
    // vocabularies run 1e8-1e9 rows — one task must never see them
    // all): distributed range-partitioned sort on (count desc, token),
    // then zipWithIndex's partition-size offset pass assigns positions
    val ranked = counts.as[(String, Long)].rdd
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex()
      .map { case ((t, c), i) => (t, c, i + 1L) }
      .toDF("t", "c", "r")
      .withColumn("x", round(log(col("r").cast("double")), 9))
      .withColumn("y", round(log(col("c").cast("double")), 9))
    def fold(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,12)")).cast("double")
    ranked.agg(
      count(lit(1)).as("vocab"),
      sum(col("c")).as("n_tokens"),
      fold(col("x")).as("__sx"), fold(col("y")).as("__sy"),
      fold(round(col("x") * col("y"), 9)).as("__sxy"),
      fold(round(col("x") * col("x"), 9)).as("__sxx"),
      fold(round(col("y") * col("y"), 9)).as("__syy"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("__hapax"))
      .withColumn("__cxy",
        col("__sxy") - col("__sx") * col("__sy") / col("vocab"))
      .withColumn("__cxx",
        col("__sxx") - col("__sx") * col("__sx") / col("vocab"))
      .withColumn("__cyy",
        col("__syy") - col("__sy") * col("__sy") / col("vocab"))
      .select(col("vocab"), col("n_tokens"),
        when(col("__cxx") > 0,
          round(col("__cxy") / col("__cxx"), 6)).as("slope"),
        when(col("__cxx") > 0,
          round(col("__sy") / col("vocab")
            - (col("__cxy") / col("__cxx")) * col("__sx") / col("vocab"),
            6)).as("intercept"),
        // cyy carries a ~n·5e-10 residue from the rounded y² terms even
        // when y is constant; the RELATIVE floor (identical in both
        // engines, so portable) nulls the degenerate fit instead of
        // emitting junk r²
        when(col("__cxx") > 0 &&
            col("__cyy") > lit(1e-9) * greatest(col("__syy"), lit(1.0)),
          round(pow(col("__cxy"), 2) / (col("__cxx") * col("__cyy")), 6))
          .as("r2"),
        round(col("__hapax").cast("double") / col("vocab"), 6)
          .as("hapax_share"))
  }

  /** Per-script character counts (array<int> in
    * [[graft.functions.ScriptCounts.names]] order) — one codegen'd pass
    * over code points; the script prefilter language ID needs before any
    * n-gram scoring makes sense. */
  def scriptCounts(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_script_counts",
      exprs => graft.functions.ScriptCounts(exprs.head), "built-in")
    call_function("graft_script_counts", c.cast(StringType))
  }

  /** Writing-system profile of `textCol`: one count column per script
    * bucket, plus `script_chars` (characters any bucket claimed) and
    * `dominant_script` — the FIRST bucket in [[graft.functions
    * .ScriptCounts.names]] order holding the maximum count ('none' when
    * no bucket matched anything; the digit bucket never dominates —
    * digits are script-neutral). Null text profiles as null counts. */
  def scriptProfile(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val names = graft.functions.ScriptCounts.names
    val withArr = df.withColumn("__sc", scriptCounts(col(textCol)))
    val withCounts = names.zipWithIndex.foldLeft(withArr) {
      case (d, (n, i)) =>
        d.withColumn(s"sc_$n", element_at(col("__sc"), i + 1))
    }
    val scriptNames = names.filterNot(_ == "digit")
    val m = greatest(scriptNames.map(n => col(s"sc_$n")): _*)
    val dominant = scriptNames.foldLeft(
        when(m === 0, lit("none")): Column) {
      (acc, n) => acc.when(col(s"sc_$n") === m, n)
    }
    withCounts
      .withColumn("script_chars",
        names.map(n => col(s"sc_$n")).reduce(_ + _))
      .withColumn("dominant_script", dominant)
      .drop("__sc")
  }

  /** Stopword marker sets for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"))

  /** Occurrences of any marker from `set` among the tokens. */
  def markerCount(c: Column, set: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(set.map(lit): _*)))

  /** Predicted language: argmax of marker counts with deterministic
    * priority en > de > es > fr on ties. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, set) => lang -> markerCount(c, set) }
    val Seq(en, de, es, fr) = scores.map(_._2)
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Ratio of distinct tokens to tokens (0 for empty docs). */
  // ONE native token pass ([[graft.functions.TokenQualityStats]]) behind
  // all four quality ratio columns: the compositional forms re-tokenized
  // the text per ratio through interpreted HOFs (~7 tokenizations per row
  // in the quality projection after CollapseProject inlining); the native
  // struct is codegen'd and whole-stage CSE evaluates the textually
  // repeated instances once per row (r18). Ratio arithmetic below is
  // expression-identical to the old forms (int counts cast to double over
  // int sizes; long length sum), so oracle hashes are unaffected.
  private def qualityStats(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.TokenQualityStats(spark, c, LangMarkers.head._2)
  }

  def distinctRatio(c: Column): Column = {
    val s = qualityStats(c)
    when(s.getField("n_tokens") === 0, 0.0)
      .otherwise(s.getField("n_distinct").cast("double") / s.getField("n_tokens"))
  }

  /** English-stopword ratio (0 for empty docs). */
  def stopwordRatio(c: Column): Column = {
    val s = qualityStats(c)
    when(s.getField("n_tokens") === 0, 0.0)
      .otherwise(s.getField("n_stop").cast("double") / s.getField("n_tokens"))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLength(c: Column): Column = {
    val s = qualityStats(c)
    when(s.getField("n_tokens") === 0, 0.0)
      .otherwise(s.getField("sum_len").cast("double") / s.getField("n_tokens"))
  }

  /** Composite quality score in [0,1]: length prior + lexical diversity +
    * stopword naturalness. Deterministic double arithmetic, mirrored
    * op-for-op in the oracle. */
  def qualityScore(c: Column): Column = {
    val lengthTerm = least(lit(1.0), qualityStats(c).getField("n_tokens").cast("double") / 100.0)
    lit(0.3) * lengthTerm + lit(0.4) * distinctRatio(c) + lit(0.3) * stopwordRatio(c)
  }

  /** Canonical document fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text. */
  def fingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c.cast(StringType), "\\s+", " "))).cast("binary"))

  /** 64-bit canonical fingerprint: xxhash64 of the same normalization as
    * [[fingerprint]]. Collision-safe enough for sketch membership (the
    * Bloom novelty path layers its own fpp on top); 4× cheaper to probe
    * and store than the md5 hex form. */
  def fingerprint64(c: Column): Column =
    xxhash64(lower(trim(regexp_replace(c.cast(StringType), "\\s+", " "))))

  /** 64-bit rolling content signature: min of xxhash64 over word shingles —
    * cheap near-identity fingerprint for winnowing-style dedup (no DuckDB
    * xxhash, so this one is spec-tested rather than oracle-checked). */
  def minShingleHash(c: Column, n: Int = 3): Column = {
    val sh = shingles(c, n)
    when(size(sh) === 0, lit(null).cast("long"))
      .otherwise(array_min(transform(sh, s => xxhash64(s))))
  }

  /** Sentence-ish units. A boundary is a `.!?` run FOLLOWED BY
    * WHITESPACE — a terminator inside a token ("3.14", "v1.2.3", URLs)
    * is not a boundary, so the word-sequence conservation contract holds
    * on numeric/URL-bearing text. RE2-safe without lookaround: the
    * boundary's whitespace is rewritten to a NUL sentinel via a capture
    * group, then the text splits on the sentinel. Known heuristic limit
    * (standard for regex sentence splitting): abbreviations before a
    * space ("e.g. x") split. A trailing fragment without a terminator is
    * its own unit, so every WORD of the document survives the split
    * ([[tokens]] multiset conservation is spec-pinned). */
  def sentences(c: Column): Column =
    filter(
      transform(
        split(regexp_replace(
          // strip any NUL already in the input so it cannot collide with
          // the boundary sentinel below
          regexp_replace(c.cast(StringType), "\u0000", " "),
          "([.!?]+)\\s+", "$1\u0000"), "\u0000"),
        // NOT trim(): Spark's trim strips only 0x20, so a sentence after
        // a blank line would keep its leading newlines
        s => regexp_replace(s, "^\\s+|\\s+$", "")),
      s => length(s) > 0)

  /** Greedy sentence packing under a unit budget — the retrieval-chunking
    * shape (split to sentences, accumulate whole sentences until the next
    * one would overflow `maxUnits`, then start a new chunk). Runs as ONE
    * in-row `aggregate` fold over [[sentences]] — a pure narrow expression,
    * no explode, no shuffle, streaming-safe.
    *
    * `unitCount` prices a sentence (whitespace tokens via
    * [[packSentences]]; REAL BPE ids via `Bpe.tokenCount` for
    * budget-faithful retrieval windows). Returns
    * `array<struct<text, n_units, n_sents, first_n>>`: the packed chunk,
    * its accumulated unit cost, how many sentences it folds, and the
    * cost of its FIRST sentence — `first_n` exists so a verifier can pin
    * greedy maximality (chunkᵢ.n_units + chunkᵢ₊₁.first_n > maxUnits for
    * every consecutive pair) without re-deriving sentence costs. A single
    * sentence over the budget becomes its own over-budget chunk
    * (n_sents == 1) rather than being split or dropped. */
  def packSentencesBy(text: Column, maxUnits: Int,
      unitCount: Column => Column): Column = {
    require(maxUnits >= 1, s"maxUnits must be >= 1, got $maxUnits")
    val chunkType = "array<struct<text:string,n_units:int,n_sents:int,first_n:int>>"
    def state(chunks: Column, cur: Column, n: Column, sents: Column,
        first: Column) =
      struct(chunks.as("chunks"), cur.as("cur"), n.as("n"),
        sents.as("sents"), first.as("first"))
    def asChunk(st: Column) = struct(
      st.getField("cur").as("text"), st.getField("n").as("n_units"),
      st.getField("sents").as("n_sents"), st.getField("first").as("first_n"))
    aggregate(
      sentences(text),
      state(array().cast(chunkType), lit(""), lit(0), lit(0), lit(0)),
      (st, s) => {
        val c = unitCount(s).cast("int")
        when(st.getField("sents") === 0,
          state(st.getField("chunks"), s, c, lit(1), c))
          .when(st.getField("n") + c > maxUnits,
            state(concat(st.getField("chunks"), array(asChunk(st))),
              s, c, lit(1), c))
          .otherwise(
            state(st.getField("chunks"),
              concat(st.getField("cur"), lit(" "), s),
              st.getField("n") + c, st.getField("sents") + 1,
              st.getField("first")))
      },
      st => when(st.getField("sents") > 0,
        concat(st.getField("chunks"), array(asChunk(st))))
        .otherwise(st.getField("chunks")))
  }

  /** [[packSentencesBy]] priced in whitespace tokens. */
  def packSentences(text: Column, maxTokens: Int): Column =
    packSentencesBy(text, maxTokens, s => tokenCount(s))

  /** Markup strip for crawled HTML-ish text — the first move of every
    * web-corpus pipeline. Heuristic by design (no DOM; RE2-safe patterns,
    * so any engine mirrors it byte-for-byte): script/style blocks go
    * first (their CONTENT is code, not prose — `(?s)` + lazy `.*?`),
    * then tags become spaces (never empty string: `a<br>b` must not fuse
    * into one word), then the six entities whose escaping every page
    * shares are decoded — `&amp;` LAST, so `&amp;lt;` decodes to the
    * literal `&lt;` the author wrote, not `<` — then whitespace collapses
    * and trims. A tag split across chunk boundaries survives as text,
    * the standard accepted failure of regex stripping. */
  def stripMarkup(c: Column): Column = {
    val noBlocks = regexp_replace(c.cast(StringType),
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        // entity names contain no regex metacharacters — literal patterns
        regexp_replace(acc, ent, ch)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
