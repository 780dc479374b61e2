package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.stats.Logistic

/** Language identification v2 — the fastText-shaped hashed linear
  * classifier (Joulin et al. 2016 "Bag of Tricks for Efficient Text
  * Classification", public design): hashed character n-gram features
  * (the hashing trick, [[Features]]) feeding one-vs-rest ridge-IRLS
  * logistic models ([[graft.stats.Logistic]]), trained entirely
  * in-engine. Replaces the 4-language stopword scorer
  * ([[TextOps.langId]]) as the first-class language-ID signal; the
  * stopword scorer stays as the zero-training fallback and the
  * agreement baseline.
  *
  * Scale shape: training is `iterations` scans of a (dim+2)-double
  * projection of the TRAINING fixture (tiny by design); scoring is a
  * pure codegen'd Column over each row's own characters — O(dim·chars)
  * comparisons, stateless, shuffle-free, streaming-safe. No vocabulary
  * pass, no dictionary broadcast: the model is dim+1 doubles per
  * language. */
object LangId {

  /** ASCII-only common-word pools (standard public frequency lists,
    * accents folded to ASCII so the fixture is encoding-portable). TEN
    * languages since r18 (the r17 verdict's breadth item). The Romance
    * overlaps (es/pt/it/fr/ro share de/la/que/un/se/...) and the
    * Germanic ones (de/nl/sv share in/an/als/...) are deliberate — they
    * keep the task from being solvable by any single marker word and
    * make per-language floors genuinely discriminative. */
  val Pools: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it",
      "was", "for", "with", "as", "they", "at", "be", "this", "have",
      "from", "which", "not", "are", "but", "had", "his"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den",
      "von", "nicht", "mit", "sich", "auf", "fuer", "als", "auch", "es",
      "an", "werden", "aus", "er", "hat", "dass", "sie", "nach"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "en", "un",
      "por", "con", "no", "una", "su", "para", "como", "esta", "le",
      "lo", "todo", "pero", "mas", "hacer", "o", "este"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un",
      "une", "du", "en", "que", "qui", "dans", "pour", "ce", "il",
      "ne", "sur", "se", "pas", "plus", "par", "je", "avec"),
    "it" -> Seq("il", "la", "di", "e", "che", "a", "in", "un", "per",
      "una", "sono", "con", "non", "le", "si", "da", "come", "anche",
      "lo", "ma", "piu", "del", "della", "questo", "hanno"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um",
      "para", "com", "nao", "uma", "os", "no", "se", "na", "por",
      "mais", "as", "dos", "como", "mas", "foi", "ele"),
    "nl" -> Seq("de", "het", "een", "van", "en", "in", "is", "dat",
      "op", "te", "zijn", "met", "voor", "niet", "aan", "er", "om",
      "ook", "als", "dan", "maar", "bij", "uit", "naar", "heeft"),
    "sv" -> Seq("och", "att", "det", "som", "en", "pa", "ar", "av",
      "for", "den", "till", "med", "de", "inte", "om", "ett", "han",
      "var", "jag", "sig", "fran", "vi", "sa", "kan", "nar"),
    "pl" -> Seq("w", "i", "na", "z", "do", "to", "sie", "nie", "jest",
      "ze", "o", "jak", "po", "co", "tak", "za", "od", "ale", "przez",
      "juz", "czy", "tylko", "byl", "oraz", "ktory"),
    "ro" -> Seq("de", "si", "in", "la", "cu", "a", "pe", "este", "din",
      "un", "o", "care", "nu", "mai", "se", "ca", "pentru", "sa", "au",
      "fost", "dar", "sunt", "dupa", "prin", "ani"))

  /** Deterministic synthetic multilingual corpus, SQL-mirrorable on
    * purpose (the oracle rebuilds it with list literals and the same
    * index arithmetic): doc i of language ℓ is `wordsPerDoc` words drawn
    * from ℓ's pool at positions 1 + (i·7 + j·3) mod |pool| — no RNG, no
    * seed, identical in any engine. Every 5th doc (i % 5 = 0) is the
    * held-out test split. Columns: (doc_id, lang, text, is_test). */
  def syntheticCorpus(spark: SparkSession, docsPerLang: Int = 150,
      wordsPerDoc: Int = 40): DataFrame = {
    require(docsPerLang >= 5 && wordsPerDoc >= 1,
      s"need docsPerLang >= 5 and wordsPerDoc >= 1")
    import spark.implicits._
    val base = Pools.zipWithIndex.map { case ((lang, pool), li) =>
      (lang, pool, li)
    }.toDF("lang", "pool", "li")
    base
      .select(col("lang"), col("pool"), col("li"),
        explode(sequence(lit(1), lit(docsPerLang))).as("i"))
      .select(
        (col("li") * docsPerLang + col("i")).cast("long").as("doc_id"),
        col("lang"),
        array_join(transform(sequence(lit(1), lit(wordsPerDoc)),
          j => element_at(col("pool"),
            (lit(1) + pmod(col("i") * 7 + j * 3, size(col("pool"))))
              .cast("int"))), " ").as("text"),
        (pmod(col("i"), lit(5)) === 0).as("is_test"))
  }

  /** Per-character-n-gram bucket in [0, dim) over the lowercased text
    * (spaces kept — boundary grams like " th" carry the signal word
    * hashing loses). O(chars) substr+hash expressions per row. */
  def charGramBuckets(text: Column, n: Int, dim: Int): Column = {
    require(n >= 1 && dim >= 2, s"need n >= 1, dim >= 2; got n=$n dim=$dim")
    val t = lower(text)
    when(t.isNull || length(t) < n, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => pmod(xxhash64(t.substr(i, lit(n))), lit(dim.toLong))
          .cast("int")))
  }

  /** Hashed char-(2,3)-gram bag features: one shared `dim`-bucket space
    * (fastText's single hash space), log1p-damped counts in the
    * (name, expression) shape [[graft.stats.Logistic.fit]] consumes.
    * The counts come from the NATIVE one-pass
    * [[graft.functions.CharGramBow]] expression (bit-identical buckets
    * to the compositional [[charGramBuckets]] form, which stays as the
    * spec mirror): the interpreted higher-order form measured ~35 ms
    * per 300-char row (r17) — minutes per 100k docs — while the native
    * pass is O(gram bytes). Null text coalesces to the zero-count
    * vector (same "no grams" semantics as the empty-array form). */
  def charGramFeatures(df: DataFrame, textCol: String, dim: Int,
      ns: Seq[Int] = Seq(2, 3), prefix: String = "cg")
      : (DataFrame, Seq[(String, Column)]) = {
    require(ns.nonEmpty, "need at least one gram length")
    val bow = graft.functions.CharGramBow(df.sparkSession,
      lower(col(textCol)), ns, dim)
    val out = df.withColumn("__graft_cbow",
      coalesce(bow, array_repeat(lit(0), dim)))
    val feats = (0 until dim).map(j =>
      s"$prefix$j" -> Features.logCount(col("__graft_cbow"), j))
    (out, feats)
  }

  /** A trained one-vs-rest model: dim+1 doubles per language. */
  final case class LangIdModel(dim: Int, ns: Seq[Int],
      fits: Seq[(String, Logistic.LogisticFit)]) {
    def langs: Seq[String] = fits.map(_._1)
  }

  /** Train one ridge-IRLS logistic per language (one-vs-rest) on the
    * labeled corpus. Feature extraction (the char-gram hashing) runs as
    * ONE distributed codegen pass; the projected (label, dim+1 doubles)
    * matrix then fits driver-side ([[Logistic.fitLocal]], loudly capped
    * at `maxRows`) — a labeled language fixture is small by nature, and
    * the distributed IRLS would pay dim² Catalyst analyses per
    * iteration for rows that fit in one page. Fails loudly when any
    * language's fit degenerates or does not converge — a language-ID
    * model that silently half-trained would mislabel a corpus
    * downstream. */
  def train(corpus: DataFrame, textCol: String, langCol: String,
      dim: Int = 64, ns: Seq[Int] = Seq(2, 3),
      lambda: Double = 1e-3, maxIter: Int = 25,
      tol: Double = 1e-5, maxRows: Long = 100000L): LangIdModel = {
    val (df, feats) = charGramFeatures(corpus, textCol, dim, ns)
    // one distributed pass materializes text -> damped bucket counts for
    // every one-vs-rest fit (the text never rides to the driver)
    val proj = df.select((col(langCol).cast("string").as("__lang") +:
      feats.map { case (n, c) => c.as(n) }): _*)
    proj.cache()
    try {
      import corpus.sparkSession.implicits._
      val langs = proj.select(col("__lang"))
        .filter(col("__lang").isNotNull)
        .distinct().as[String].collect().sorted.toSeq
      require(langs.size >= 2,
        s"language-ID needs >= 2 labeled languages, got ${langs.size}")
      val featRefs = feats.map { case (n, _) => n -> col(n) }
      val fits = langs.map { l =>
        val fit = Logistic.fitLocal(proj, featRefs,
            (col("__lang") === l).cast("int"), lambda = lambda,
            maxIter = maxIter, tol = tol, maxRows = maxRows)
          .getOrElse(sys.error(
            s"langIdV2: one-vs-rest fit for '$l' degenerated (constant " +
              "label or singular Hessian) - check the training corpus"))
        require(fit.converged,
          s"langIdV2: IRLS for '$l' did not converge in " +
            s"${fit.iterations} iterations - raise maxIter or lambda")
        l -> fit
      }
      LangIdModel(dim, ns, fits)
    } finally proj.unpersist(blocking = false)
  }

  /** Per-language scores + argmax prediction for `textCol` (ties break
    * to the alphabetically-first language — deterministic). Appends
    * `lang_pred` plus one `score_<lang>` column per language; the
    * feature column is computed once and dropped.
    *
    * The argmax is ONE `greatest` over (score, −index) structs — each
    * score column referenced exactly once. The previous
    * greatest-then-coalesce/when chain referenced every score ~12
    * times, and the optimizer re-embedded the full 64-term score
    * expressions (and through them the char-gram pass) into each
    * reference — measured 42 s vs 0.16 s over 5k docs at 10 languages
    * (r18). Struct ordering compares score first, then −index, so a
    * tie picks the smallest index = alphabetically-first language,
    * identical to the old chain. */
  def predict(df: DataFrame, textCol: String,
      model: LangIdModel): DataFrame = {
    val (withBow, feats) = charGramFeatures(df, textCol, model.dim,
      model.ns)
    val fexprs = feats.map(_._2)
    val scored = model.fits.foldLeft(withBow) { case (d, (l, fit)) =>
      d.withColumn(s"score_$l", fit.score(fexprs))
    }
    val langArr = array(model.langs.map(lit): _*)
    val pred =
      if (model.langs.size == 1) lit(model.langs.head)
      else {
        val structs = model.langs.zipWithIndex.map { case (l, i) =>
          struct(col(s"score_$l").as("s"), lit(-i).as("ni"))
        }
        element_at(langArr, -greatest(structs: _*).getField("ni") + 1)
      }
    scored.withColumn("lang_pred", pred).drop("__graft_cbow")
  }
}
