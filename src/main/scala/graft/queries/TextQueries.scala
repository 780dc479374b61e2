package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{Dedup, TextOps, Winnow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over the `documents` table, with DuckDB
  * oracles where the computation is SQL-expressible (everything except the
  * xxhash64-based MinHash/SimHash paths, which get rows-only entries).
  *
  * The token guard (blank text → empty array) and every arithmetic step is
  * mirrored op-for-op between the Spark expressions in [[graft.ops.TextOps]]
  * and the oracle SQL. NB DuckDB `regexp_replace` needs the 'g' flag to
  * match Spark's replace-all semantics.
  */
object TextQueries extends QueryModule {

  /** DuckDB mirror of TextOps.tokens. */
  private val wSql =
    """CASE WHEN length(trim(text)) = 0 THEN []
       ELSE regexp_split_to_array(trim(text), '\s+') END"""

  val txtTokenStats: Q = Q(
    "txt_token_stats",
    Some(s"""
      SELECT doc_id, length(text) AS n_chars, len(w) AS n_tokens,
        len(list_distinct(w)) AS n_distinct_tokens
      FROM (SELECT doc_id, text, $wSql AS w FROM documents)
      ORDER BY doc_id"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"), length(col("text")).as("n_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          size(array_distinct(TextOps.tokens(col("text")))).as("n_distinct_tokens"))
        .orderBy("doc_id")
    })

  val txtLangId: Q = Q(
    "txt_lang_id",
    Some {
      val scoreSql = TextOps.LangMarkers.map { case (lang, set) =>
        val inList = set.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(w, t -> t IN ($inList))) AS s_$lang"
      }.mkString(",\n        ")
      s"""
      SELECT doc_id, s_en, s_de, s_es, s_fr,
        CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM (SELECT doc_id, $scoreSql
            FROM (SELECT doc_id, $wSql AS w FROM documents))
      ORDER BY doc_id"""
    },
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val scores = TextOps.LangMarkers.map { case (lang, set) =>
        TextOps.markerCount(col("text"), set).as(s"s_$lang")
      }
      d.select(col("doc_id") +: scores :+ TextOps.langId(col("text")).as("pred_lang"): _*)
        .orderBy("doc_id")
    })

  /** Language-ID v2 ([[graft.ops.LangId]], the fastText-shaped hashed
    * char-n-gram one-vs-rest logistic — r16 verdict item 3; TEN
    * languages since r18): trained on the deterministic synthetic
    * multilingual fixture (no RNG — both engines rebuild it from the
    * same word pools and index arithmetic) and evaluated on the
    * held-out i%5=0 split. The oracle rebuilds the corpus, the split,
    * and the v1 STOPWORD scorer's per-language correct counts (the
    * agreement baseline — v1 only knows en/de/es/fr, so the six new
    * languages measure it near zero, both engines agreeing), and pins
    * the two v2 verdicts TRUE: per-language held-out accuracy ≥ 0.95
    * and beats-or-ties v1. In-gate, the FULL true×predicted confusion
    * table is computed and every off-diagonal cell must stay inside
    * the 5% per-language budget — an aggregate accuracy cannot hide
    * one Romance language collapsing into a neighbor. The model's
    * xxhash features are not SQL-expressible — its quality enters the
    * hash through the pinned verdicts, the loud in-gate floors, and
    * LangIdSpec. */
  val txtLangIdV2: Q = Q(
    "txt_langid_v2",
    Some {
      val pools = graft.ops.LangId.Pools.zipWithIndex.map {
        case ((lang, pool), li) =>
          s"('$lang', $li, [${pool.map(w => s"'$w'").mkString(", ")}])"
      }.mkString(",\n          ")
      val scoreSql = TextOps.LangMarkers.map { case (lang, set) =>
        val inList = set.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(w, t -> t IN ($inList))) AS s_$lang"
      }.mkString(",\n          ")
      s"""
      WITH p AS (
        SELECT * FROM (VALUES
          $pools) AS t(lang, li, pool)),
      d AS (
        SELECT CAST(li * 150 + i AS BIGINT) AS doc_id, lang,
          array_to_string(list_transform(generate_series(1, 40),
            j -> pool[1 + (i * 7 + j * 3) % len(pool)]), ' ') AS text
        FROM p, generate_series(1, 150) AS g(i)
        WHERE i % 5 = 0),
      m AS (
        SELECT lang, $scoreSql
        FROM (SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM d)),
      v1 AS (
        SELECT lang,
          CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr
                 THEN 'en'
               WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
               WHEN s_es >= s_fr THEN 'es'
               ELSE 'fr' END AS pred
        FROM m)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_test,
        CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
          AS v1_correct,
        TRUE AS v2_floor_met, TRUE AS v2_beats_or_ties_v1
      FROM v1 GROUP BY lang ORDER BY lang"""
    },
    (s, dir) => {
      import graft.ops.LangId
      val corpus = LangId.syntheticCorpus(s)
      val model = LangId.train(corpus.filter(!col("is_test")),
        "text", "lang")
      val test = LangId.predict(corpus.filter(col("is_test")),
          "text", model)
        .withColumn("v1", TextOps.langId(col("text")))
      val per = test.groupBy("lang").agg(
        count(lit(1)).as("n_test"),
        sum(when(col("v1") === col("lang"), 1L).otherwise(0L))
          .as("v1_correct"),
        avg((col("lang_pred") === col("lang")).cast("double"))
          .as("__acc2"),
        avg((col("v1") === col("lang")).cast("double")).as("__acc1"))
      val rows = per.collect()
      val overall = test.agg(
        avg((col("lang_pred") === col("lang")).cast("double")))
        .head().getDouble(0)
      require(overall >= 0.95,
        s"langid v2 held-out accuracy $overall below the 0.95 floor")
      // per-language CONFUSION (r18): the full true×predicted table —
      // at 10 languages with deliberate Romance/Germanic pool overlap,
      // an aggregate accuracy can hide one language collapsing into a
      // neighbor, which is exactly what the per-language floor + the
      // bounded off-diagonal cells rule out. ≤ langs² cells collect.
      val confusion = test.groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val confusionTable = confusion.sortBy(c => (c._1, c._2))
        .map { case (t, p, n) => s"$t->$p:$n" }.mkString(", ")
      val nTestByLang = rows.map(r =>
        r.getString(0) -> r.getAs[Long]("n_test")).toMap
      confusion.filter { case (t, p, _) => t != p }.foreach {
        case (t, p, n) =>
          require(n <= math.floor(0.05 * nTestByLang(t)).toLong,
            s"confusion cell $t->$p has $n misses — over the 5% " +
              s"per-language budget; full table: $confusionTable")
      }
      val out = per.select(col("lang"), col("n_test"), col("v1_correct"),
        (col("__acc2") >= 0.95).as("v2_floor_met"),
        (col("__acc2") >= col("__acc1")).as("v2_beats_or_ties_v1"))
        .orderBy("lang")
      require(rows.forall(_.getAs[Double]("__acc2") >= 0.95),
        s"a language fell below the per-language 0.95 floor; " +
          s"confusion: $confusionTable")
      out
    })

  val txtQuality: Q = Q(
    "txt_quality",
    Some {
      val enList = TextOps.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""
      SELECT doc_id,
        ROUND(CASE WHEN len(w) = 0 THEN 0.0
          ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END, 6) AS distinct_ratio,
        ROUND(CASE WHEN len(w) = 0 THEN 0.0
          ELSE CAST(len(list_filter(w, t -> t IN ($enList))) AS DOUBLE) / len(w) END, 6) AS stop_ratio,
        ROUND(CASE WHEN len(w) = 0 THEN 0.0
          ELSE CAST(list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(w) END, 6) AS mean_token_len,
        ROUND(0.3 * least(1.0, len(w) / 100.0)
          + 0.4 * (CASE WHEN len(w) = 0 THEN 0.0
              ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END)
          + 0.3 * (CASE WHEN len(w) = 0 THEN 0.0
              ELSE CAST(len(list_filter(w, t -> t IN ($enList))) AS DOUBLE) / len(w) END), 6) AS quality
      FROM (SELECT doc_id, $wSql AS w FROM documents)
      ORDER BY doc_id"""
    },
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val t = col("text")
      d.select(col("doc_id"),
          round(TextOps.distinctRatio(t), 6).as("distinct_ratio"),
          round(TextOps.stopwordRatio(t), 6).as("stop_ratio"),
          round(TextOps.meanTokenLength(t), 6).as("mean_token_len"),
          round(TextOps.qualityScore(t), 6).as("quality"))
        .orderBy("doc_id")
    })

  val ddExact: Q = Q(
    "dd_exact_dedup",
    Some("""
      SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY keep_id"""),
    (s, dir) =>
      Dedup.exactGroups(Tables.load(s, dir, "documents"), "doc_id", "text")
        .select("fp", "keep_id", "n_copies")
        .orderBy("keep_id"))

  /** Cross-corpus paragraph dedup ([[Dedup.dedupParagraphs]]): paragraphs
    * here are 120-char chunks (the fixture corpus has no blank-line
    * structure); the fixture's exact-duplicate documents make whole chunk
    * runs collide across doc_ids, so the first-occurrence rule does real
    * work. Oracle rebuilds the entire pipeline relationally: chunk →
    * fingerprint → row_number first-occurrence → ordered string_agg. */
  val ddParagraphDedup: Q = Q(
    "dd_paragraph_dedup",
    Some("""
      WITH p AS (
        SELECT d.doc_id, CAST(t.s / 120 AS BIGINT) AS idx,
          substr(d.text, CAST(t.s + 1 AS BIGINT), 120) AS para
        FROM documents d,
          unnest(range(0, greatest(length(d.text) - 1, 0) + 1, 120)) t(s)
        WHERE length(d.text) > 0),
      f AS (SELECT doc_id, idx, para,
              md5(lower(trim(regexp_replace(para, '\s+', ' ', 'g')))) AS fp
            FROM p),
      k AS (SELECT doc_id, idx, para,
              row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
            FROM f)
      SELECT doc_id,
        string_agg(para, chr(10) ORDER BY idx) AS text,
        count(*) AS n_paragraphs_kept
      FROM k WHERE rn = 1
      GROUP BY doc_id
      ORDER BY doc_id"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Dedup.dedupParagraphs(d, "doc_id", "text",
          TextOps.chunks(col("text"), size = 120, overlap = 0))
        .orderBy("doc_id")
    })

  val ddJaccard: Q = Q(
    "dd_jaccard_pairs",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS intersection
        FROM e a JOIN e b ON a.sg = b.sg AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id1, id2, sa.n AS n1, sb.n AS n2, intersection,
        ROUND(CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection), 6) AS jaccard
      FROM inter
      JOIN sz sa ON inter.id1 = sa.doc_id
      JOIN sz sb ON inter.id2 = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.3
      ORDER BY id1, id2"""),
    (s, dir) =>
      // maxPostings = MaxValue: the oracle SQL above is the EXACT pairwise
      // Jaccard (no posting cap), so the gate must run the exact
      // configuration — the cap is an opt-in scale control, not the
      // documented semantics of this query
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 2, threshold = 0.3, maxPostings = Int.MaxValue)
        .select(col("id1"), col("id2"), col("n1"), col("n2"), col("intersection"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2"))

  /** Containment (asymmetric-Jaccard) pairs
    * ([[Dedup.containmentPairs]]): the corpus gains planted EXCERPTS
    * (first 150 chars of every 10th doc) — quote-style subset
    * duplicates whose containment is near 1 while their Jaccard stays
    * far below any symmetric threshold; the gate asserts at least one
    * surviving pair has jaccard < 0.3 (the case the operator exists to
    * catch) and the oracle rebuilds every pair's both-direction
    * containments. */
  val ddContainment: Q = Q(
    "dd_containment_pairs",
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000, substr(text, 1, 150)
        FROM documents WHERE doc_id % 10 = 0),
      t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM corpus),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS intersection
        FROM e a JOIN e b ON a.sg = b.sg AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id1, id2, sa.n AS n1, sb.n AS n2, intersection,
        ROUND(CAST(intersection AS DOUBLE) / sa.n, 6) AS containment_1in2,
        ROUND(CAST(intersection AS DOUBLE) / sb.n, 6) AS containment_2in1,
        ROUND(CAST(intersection AS DOUBLE)
          / (sa.n + sb.n - intersection), 6) AS jaccard
      FROM inter
      JOIN sz sa ON inter.id1 = sa.doc_id
      JOIN sz sb ON inter.id2 = sb.doc_id
      WHERE greatest(CAST(intersection AS DOUBLE) / sa.n,
        CAST(intersection AS DOUBLE) / sb.n) >= 0.8
      ORDER BY id1, id2"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            substring(col("text"), 1, 150).as("text")))
      val out = Dedup.containmentPairs(corpus, "doc_id", "text",
          n = 2, threshold = 0.8)
        .select(col("id1"), col("id2"), col("n1"), col("n2"),
          col("intersection"),
          round(col("containment_1in2"), 6).as("containment_1in2"),
          round(col("containment_2in1"), 6).as("containment_2in1"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
      val oneWay = out.filter(col("jaccard") < 0.3).count()
      require(oneWay > 0,
        "no surviving pair below symmetric-Jaccard reach — the fixture " +
          "no longer exercises the operator's reason to exist")
      out
    })

  /** Shared planted-republication corpus for the dedup-observability
    * gates: every 5th doc is re-published two days later under the
    * 'syndicator' source — exact duplicates with known provenance. */
  private val repubSql = """
      corpus AS (
        SELECT doc_id, text, source, doc_id % 7 AS day FROM documents
        UNION ALL
        SELECT doc_id + 20000, text, 'syndicator', doc_id % 7 + 2
        FROM documents WHERE doc_id % 5 = 0)"""

  private def repubCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(col("doc_id"), col("text"), col("source"),
        (col("doc_id") % 7).as("day"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"),
          lit("syndicator").as("source"), (col("doc_id") % 7 + 2).as("day")))
  }

  /** Per-source duplicate attribution ([[Dedup.dupAttribution]]): the
    * planted syndicator re-publishes earlier docs, so it must show a
    * 100% drop rate while original sources show 0 — the curation
    * dashboard that points the dedup losses at the upstream culprit. */
  val ddDupAttribution: Q = Q(
    "dd_dup_attribution",
    Some(s"""
      WITH $repubSql,
      fp AS (
        SELECT doc_id, source,
          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
        FROM corpus),
      canon AS (SELECT f, min(doc_id) AS keep FROM fp GROUP BY f)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(count(*) - SUM(CASE WHEN doc_id = keep THEN 1 ELSE 0 END)
          AS BIGINT) AS n_dropped,
        round((count(*) - SUM(CASE WHEN doc_id = keep THEN 1 ELSE 0 END))
          / CAST(count(*) AS DOUBLE), 9) AS drop_rate
      FROM fp JOIN canon USING (f)
      GROUP BY source
      ORDER BY source"""),
    (s, dir) => {
      val out = Dedup.dupAttribution(repubCorpus(s, dir),
        "doc_id", "text", "source").orderBy("source")
      val rates = out.collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Double]("drop_rate")).toMap
      require(rates("syndicator") == 1.0,
        s"syndicator drop rate ${rates("syndicator")} != 1.0")
      require(rates.forall { case (src, r) => src == "syndicator" || r == 0.0 },
        "original sources must drop nothing")
      out
    })

  /** Daily novelty rate ([[Dedup.noveltyByDay]]): re-publications land
    * two days after their originals with novelty false, so their days
    * dip below 1.0 — the growth-observability curve that separates a
    * healthy crawl from one re-fetching itself. */
  val mntNoveltyByDay: Q = Q(
    "mnt_novelty_by_day",
    Some(s"""
      WITH $repubSql,
      fp AS (
        SELECT CAST(day AS BIGINT) AS day,
          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
        FROM corpus),
      fd AS (SELECT f, min(day) AS fst FROM fp GROUP BY f)
      SELECT day, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN day = fst THEN 1 ELSE 0 END) AS BIGINT)
          AS n_novel,
        round(SUM(CASE WHEN day = fst THEN 1 ELSE 0 END)
          / CAST(count(*) AS DOUBLE), 9) AS novelty_rate
      FROM fp JOIN fd USING (f)
      GROUP BY day
      ORDER BY day"""),
    (s, dir) => {
      val out = Dedup.noveltyByDay(repubCorpus(s, dir), "text", col("day"))
        .orderBy("day")
      val rates = out.collect().map(r =>
        r.getAs[Long]("day") -> r.getAs[Double]("novelty_rate")).toMap
      require(rates.values.exists(_ < 1.0),
        "planted re-publications produced no novelty dip")
      out
    })

  /** Prefix-filtering EXACT Jaccard join ([[Dedup.prefixJaccardPairs]],
    * PPJoin shape): the SAME oracle as dd_jaccard_pairs — prefix
    * filtering is pruning, not approximation, so a different Spark
    * algorithm must produce the identical pair set, scores included.
    * Differential testing squared: two independent Spark plans (naive
    * common-shingle join and rarest-prefix join) against one independent
    * SQL derivation. */
  val ddPrefixJaccard: Q = Q(
    "dd_prefix_jaccard_pairs",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS intersection
        FROM e a JOIN e b ON a.sg = b.sg AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id1, id2, sa.n AS n1, sb.n AS n2, intersection,
        ROUND(CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection), 6) AS jaccard
      FROM inter
      JOIN sz sa ON inter.id1 = sa.doc_id
      JOIN sz sb ON inter.id2 = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.3
      ORDER BY id1, id2"""),
    (s, dir) =>
      Dedup.prefixJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 2, threshold = 0.3)
        .select(col("id1"), col("id2"), col("n1"), col("n2"),
          col("intersection"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2"))

  /** Incremental dedup, exact baseline: incoming batch (2 fresh docs in 10
    * plus a re-crawl of 1 in 10) anti-joined against the historical corpus
    * on the canonical fingerprint. NOT EXISTS (not NOT IN) in the oracle:
    * anti-join keeps null-fingerprint rows, NOT IN would not. */
  val ddNoveltyExact: Q = Q(
    "dd_novelty_exact",
    Some("""
      WITH hist AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
      inc AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id FROM inc
      WHERE NOT EXISTS (
        SELECT 1 FROM hist
        WHERE md5(lower(trim(regexp_replace(hist.text, '\s+', ' ', 'g'))))
            = md5(lower(trim(regexp_replace(inc.text, '\s+', ' ', 'g')))))
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val hist = docs.filter(col("doc_id") % 10 < 8)
      val inc = docs.filter(col("doc_id") % 10 >= 8)
        .unionByName(docs.filter(col("doc_id") % 10 === 0))
      Dedup.novelAgainstExact(inc, hist, "text")
        .select("doc_id").orderBy("doc_id")
    })

  /** Incremental dedup, Bloom scale path — PROMOTED to oracle-checked
    * (r16, the inc_quantile_sketch template): the filter's bit layout is
    * not SQL-expressible, so the gate emits the DIFFERENTIAL against the
    * exact anti-join twin — incoming volume, the exact novel count
    * (DuckDB rebuilds both from the shared fingerprint normalization),
    * and the two COMPUTED Bloom-contract verdicts the oracle pins TRUE:
    * no false negatives (bloom-novel ⊆ exact-novel) and false-drop rate
    * within slack of the configured fpp. A broken filter now flips a
    * hashed cell, not just an in-gate assert. */
  val ddNoveltyBloom: Q = Q(
    "dd_novelty_bloom",
    Some("""
      WITH fp AS (
        SELECT doc_id,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
        FROM documents),
      hist AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 < 8),
      inc AS (
        SELECT doc_id, f FROM fp WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id, f FROM fp WHERE doc_id % 10 = 0)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM inc) AS n_incoming,
        CAST(count(*) AS BIGINT) AS n_exact_novel,
        TRUE AS no_false_negatives,
        TRUE AS within_drop_budget
      FROM inc WHERE f NOT IN (SELECT f FROM hist)"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val hist = docs.filter(col("doc_id") % 10 < 8)
      val inc = docs.filter(col("doc_id") % 10 >= 8)
        .unionByName(docs.filter(col("doc_id") % 10 === 0))
      val exact = Dedup.novelAgainstExact(inc, hist, "text").select("doc_id")
      val novel = Dedup.novelAgainstBloom(inc, hist, "text", fpp = 0.01)
        .select("doc_id")
      val noFalseNeg = novel.join(exact, Seq("doc_id"), "left_anti").isEmpty
      require(noFalseNeg,
        "bloom novelty returned a row the exact anti-join calls duplicate " +
          "(false negative — violates the Bloom contract)")
      val nIncoming = inc.count()
      val nExact = exact.count()
      val nNovel = novel.count()
      val withinBudget =
        nNovel >= nExact - math.max(5L, (0.05 * nExact).toLong)
      require(withinBudget,
        s"bloom false-drop rate out of contract: $nNovel of $nExact novel kept")
      import s.implicits._
      Seq((nIncoming, nExact, noFalseNeg, withinBudget))
        .toDF("n_incoming", "n_exact_novel", "no_false_negatives",
          "within_drop_budget")
    })

  /** Near-dup novelty vs a historical corpus — PROMOTED to
    * oracle-checked (r17, the dd_novelty_bloom template): MinHash is
    * not SQL-expressible, so the gate emits the DIFFERENTIAL — incoming
    * volumes and the exact-anti-join novel count (DuckDB rebuilds all
    * three from the shared fingerprint normalization and the planted
    * corpus arithmetic) plus the two COMPUTED verdicts the oracle pins
    * TRUE: every planted history copy caught (identical shingles ⇒
    * identical signature ⇒ non-novel) and minhash-novel ⊆ exact-novel
    * (near-dup matching may only drop MORE than exact). */
  val ddNoveltyMinhash: Q = Q(
    "dd_novelty_minhash",
    Some("""
      WITH fp AS (
        SELECT doc_id,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
        FROM documents),
      hist AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 < 8),
      planted AS (
        SELECT doc_id + 1000000 AS doc_id
        FROM documents WHERE doc_id % 10 < 8 AND doc_id < 50),
      inc AS (SELECT doc_id, f FROM fp WHERE doc_id % 10 >= 8)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM inc)
          + (SELECT CAST(count(*) AS BIGINT) FROM planted) AS n_incoming,
        (SELECT CAST(count(*) AS BIGINT) FROM planted) AS n_planted,
        CAST(count(*) AS BIGINT) AS n_exact_novel,
        TRUE AS planted_all_caught,
        TRUE AS subset_of_exact
      FROM inc WHERE f NOT IN (SELECT f FROM hist)"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val hist = docs.filter(col("doc_id") % 10 < 8)
      val planted = hist.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000)
      val inc = docs.filter(col("doc_id") % 10 >= 8).unionByName(planted)
      val novel = Dedup.novelAgainstMinhash(inc, hist, "doc_id", "text",
        threshold = 0.5)
      val plantedNovel = novel.filter(col("doc_id") >= 1000000).count()
      require(plantedNovel == 0,
        s"$plantedNovel planted history copies escaped as novel")
      val kept = novel.filter(col("doc_id") < 1000000).count()
      require(kept > 0, "every genuinely-new doc was (wrongly) matched")
      // differential vs the exact anti-join twin (r13 verdict item 8):
      // an exact duplicate has an identical shingle set, hence identical
      // minhash signature, so minhash-novel ⊆ exact-novel MUST hold —
      // near-dup matching may only drop MORE than exact, never keep a
      // doc the exact twin calls duplicate
      val exactNovel = Dedup.novelAgainstExact(
        inc.filter(col("doc_id") < 1000000), hist, "text").select("doc_id")
      val subsetOk = novel.filter(col("doc_id") < 1000000).select("doc_id")
        .join(exactNovel, Seq("doc_id"), "left_anti").isEmpty
      require(subsetOk,
        "minhash kept a doc the exact anti-join calls an exact duplicate")
      val nPlanted = planted.count()
      val nIncoming = inc.count()
      val nExactNovel = exactNovel.count()
      import s.implicits._
      Seq((nIncoming, nPlanted, nExactNovel, plantedNovel == 0, subsetOk))
        .toDF("n_incoming", "n_planted", "n_exact_novel",
          "planted_all_caught", "subset_of_exact")
    })

  /** MinHash-LSH near-dup candidates — PROMOTED to oracle-checked (r17,
    * the distributed-differential template): the xxhash64 signatures and
    * banding are not SQL-expressible, so the gate emits the EXACT
    * pairwise-Jaccard twin's pair table at j ≥ 0.5 (id1, id2, n1, n2,
    * intersection, jaccard — DuckDB rebuilds every cell from the naive
    * shingle join, the dd_jaccard_pairs oracle at a higher floor) with a
    * per-pair `lsh_found` verdict the oracle pins TRUE: the banded LSH
    * path must RECALL every exact pair (r=3/b=48 collision probability
    * ≥ 0.998 at j = 0.5, ≥ 1 − 1e−6 at the fixture's j ≥ 0.8 band, and
    * the 144-hash estimate is deterministic under the fixed seed). A
    * recall miss now flips a hashed cell, not just an in-gate assert;
    * the precision guard (every LSH pair is a true pair at the 0.3
    * posting floor) stays in-gate. Bench mode times the production LSH
    * path alone — the exact twin never rides into the timed window. */
  val ddMinhash: Q = Q(
    "dd_minhash_lsh",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS intersection
        FROM e a JOIN e b ON a.sg = b.sg AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id1, id2, sa.n AS n1, sb.n AS n2, intersection,
        ROUND(CAST(intersection AS DOUBLE)
          / (sa.n + sb.n - intersection), 6) AS jaccard,
        TRUE AS lsh_found
      FROM inter
      JOIN sz sa ON inter.id1 = sa.doc_id
      JOIN sz sb ON inter.id2 = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.5
      ORDER BY id1, id2"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.45)
      if (!Tables.gateMode) lsh.orderBy("id1", "id2")
      else {
        val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 2, threshold = 0.5, maxPostings = Int.MaxValue)
        val found = lsh.select(col("id1"), col("id2"),
          lit(true).as("__f"))
        val out = exact.join(found, Seq("id1", "id2"), "left")
          .select(col("id1"), col("id2"), col("n1"), col("n2"),
            col("intersection"), round(col("jaccard"), 6).as("jaccard"),
            coalesce(col("__f"), lit(false)).as("lsh_found"))
        require(out.filter(!col("lsh_found")).isEmpty,
          "LSH missed an exact pair at j >= 0.5 (recall contract)")
        // precision: LSH may only surface pairs the exact join knows at
        // its 0.3 floor (est >= 0.45 on a true j < 0.3 pair would mean
        // a broken estimator, not sampling noise)
        val exactLow = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 2, threshold = 0.3, maxPostings = Int.MaxValue)
        require(lsh.select("id1", "id2")
            .join(exactLow.select("id1", "id2"),
              Seq("id1", "id2"), "left_anti").isEmpty,
          "LSH surfaced a pair below the exact join's 0.3 floor " +
            "(precision contract)")
        out.orderBy("id1", "id2")
      }
    })

  /** SimHash near-dups via the custom Catalyst expression — PROMOTED to
    * oracle-checked (r17): the 64-bit signature is xxhash64-based and
    * not SQL-expressible, so the gate plants EXACT COPIES (every 3rd
    * doc re-published under doc_id + 50000 — a corpus both engines
    * rebuild) and emits the planted pair table with the hamming distance
    * the simhash join reported: identical text ⇒ identical tokens ⇒
    * identical signature, so the oracle pins hamming = 0 and found =
    * TRUE for every planted pair. In-gate, the stronger invariance
    * holds distributed: a copy must pair with EXACTLY the same partners
    * as its original (signature equality makes every hamming distance,
    * bucket, and cap decision identical), so the full result's edge set
    * is exercised, not just the planted diagonal. Bench mode times the
    * production pair join alone. */
  val ddSimhash: Q = Q(
    "dd_simhash",
    Some("""
      SELECT doc_id AS id1, doc_id + 50000 AS id2,
        CAST(0 AS INT) AS hamming, TRUE AS found
      FROM documents WHERE doc_id % 3 = 0
      ORDER BY id1"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      if (!Tables.gateMode)
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
          .orderBy("id1", "id2")
      else {
        val planted = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(planted.select(
            (col("doc_id") + 50000).as("doc_id"), col("text")))
        val pairs = Dedup.simhashPairs(corpus, "doc_id", "text",
          maxHamming = 8)
        // copies pair exactly like their originals (minus the mutual
        // planted edge): identical signatures leave no room for drift
        val und = pairs.select(col("id1").as("a"), col("id2").as("b"))
          .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
        val origP = und.filter(col("a") < 50000 &&
            col("a") % 3 === 0 && col("b") =!= col("a") + 50000)
          .select(col("a").as("o"), col("b").as("p"))
        val copyP = und.filter(col("a") >= 50000 &&
            col("b") =!= col("a") - 50000)
          .select((col("a") - 50000).as("o"), col("b").as("p"))
        require(origP.join(copyP, Seq("o", "p"), "left_anti").isEmpty &&
            copyP.join(origP, Seq("o", "p"), "left_anti").isEmpty,
          "a planted copy's partner set diverged from its original's " +
            "(signature or banding nondeterminism)")
        val out = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id").as("id1"),
            (col("doc_id") + 50000).as("id2"))
          .join(pairs, Seq("id1", "id2"), "left")
          .select(col("id1"), col("id2"),
            coalesce(col("hamming"), lit(-1)).cast("int").as("hamming"),
            col("hamming").isNotNull.as("found"))
        require(out.filter(!col("found") || col("hamming") =!= 0).isEmpty,
          "a planted exact copy was missed or scored hamming > 0")
        out.orderBy("id1")
      }
    })

  /** Duplicate-cluster resolution ([[graft.ops.Clusters]]): generic
    * connected components over pairwise edges, oracle-checked by building
    * edges between CONSECUTIVE same-user events ≤30 min apart — so the
    * components are exactly the gap-sessions, which DuckDB computes by the
    * completely different lag/cumsum method. A hash match means the
    * iterative hash-min+shortcut propagation reproduces ground truth it
    * never saw. */
  val ddClusterResolve: Q = Q(
    "dd_cluster_resolve",
    Some("""
      WITH b AS (
        SELECT event_id, user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR (epoch_us(ts) // 1000000)
                    - (epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000) > 1800
               THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (
        SELECT event_id, user_id,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM b)
      SELECT event_id AS id, min(event_id) OVER (PARTITION BY user_id, seq) AS cluster_id
      FROM s
      ORDER BY id"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events").select("event_id", "user_id", "ts")
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .withColumn("prev_id", lag(col("event_id"), 1).over(byUser))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .filter(col("prev_id").isNotNull &&
          col("ts").cast("long") - col("prev_ts").cast("long") <= 1800L)
        .select(col("prev_id").as("a"), col("event_id").as("b"))
      graft.ops.Clusters.assignClusters(ev, "event_id", pairs)
        .orderBy("id")
    })

  /** End-to-end corpus dedup — PROMOTED to oracle-checked (r17): the
    * gate first requires (distributed anti-joins, both directions) that
    * the LSH pair set EQUALS the exact pairwise-Jaccard pair set at the
    * same threshold on this fixture — the dd_minhash_lsh differential
    * already pins recall and precision separately, and on equality the
    * op's clusters are exactly the connected components of the EXACT
    * pair graph, which DuckDB rebuilds independently with a RECURSIVE
    * transitive-closure CTE (min-reachable-id labels). Every kept row's
    * (doc_id, cluster_id, n_cluster) is then hash-pinned. The r14
    * in-gate invariants stay: cluster sizes account for every document
    * exactly once, and re-mining the kept set finds zero residual
    * pairs. */
  val ddDedupCorpus: Q = Q(
    "dd_dedup_corpus",
    Some("""
      WITH RECURSIVE
      t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        FROM e a JOIN e b ON a.sg = b.sg AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id1, id2 FROM inter
        JOIN sz sa ON inter.id1 = sa.doc_id
        JOIN sz sb ON inter.id2 = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      und AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION ALL SELECT id2, id1 FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.id, und.b FROM reach JOIN und ON reach.r = und.a),
      lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
      csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cluster
              FROM lbl GROUP BY cluster_id)
      SELECT lbl.id AS doc_id, lbl.cluster_id, csz.n_cluster
      FROM lbl JOIN csz USING (cluster_id)
      WHERE lbl.id = lbl.cluster_id
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val dedup = Dedup.deduplicateCorpus(docs, "doc_id", "text", threshold = 0.5)
      val out = dedup.select(col("doc_id"), col("cluster_id"), col("n_cluster"))
      // partition invariant: every document is accounted for by exactly
      // one cluster
      val covered = out.agg(sum(col("n_cluster"))).head().getLong(0)
      val total = docs.count()
      require(covered == total,
        s"dedup clusters cover $covered of $total documents")
      // dedup-completeness invariant: re-mining the KEPT set with the same
      // deterministic signatures/banding must find ZERO near-dup pairs —
      // any survivor pair is two same-cluster documents both kept, i.e.
      // the transitive resolution failed. (Deterministic LSH makes this
      // sound: a pair found on the subset is found on the superset.)
      val residual = Dedup.minhashLshPairs(
        dedup.select(col("doc_id"), col("text")), "doc_id", "text",
        threshold = 0.5).count()
      require(residual == 0,
        s"$residual LSH-confirmed near-dup pairs survived corpus dedup")
      if (Tables.gateMode) {
        // the oracle's premise: on this fixture the LSH pair set equals
        // the exact >= 0.5 pair set (recall AND precision at once), so
        // the exact graph's components ARE the op's clusters
        val lshPairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.5).select("id1", "id2")
        val exactPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 2, threshold = 0.5, maxPostings = Int.MaxValue)
          .select("id1", "id2")
        require(lshPairs.join(exactPairs, Seq("id1", "id2"), "left_anti")
            .isEmpty &&
          exactPairs.join(lshPairs, Seq("id1", "id2"), "left_anti")
            .isEmpty,
          "LSH and exact pair sets diverge — the component oracle's " +
            "premise does not hold on this corpus")
      }
      out.orderBy("doc_id")
    })

  /** In-engine quality classifier (rows-only: IRLS is iterative, no SQL
    * oracle; the solver itself is pinned against an independent NumPy fit
    * in StatsSpec). Trains ridge-logistic "is this English?" on four
    * surface features — the fastText-style linear filter of CCNet/GPT-3
    * lineage — then scores every document with the codegen'd sigmoid
    * expression. Self-asserts convergence and separability (mean English
    * score must exceed mean non-English score), so a silently useless
    * model fails the gate. */
  val txtQualityClassifier: Q = Q(
    "txt_quality_classifier",
    Some("""
      SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_en,
        CAST(SUM(CASE WHEN lang <> 'en' OR lang IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_other,
        TRUE AS converged, TRUE AS separates
      FROM documents"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val feats = Seq(
        "stopword_ratio" -> TextOps.stopwordRatio(col("text")),
        "mean_token_len" -> TextOps.meanTokenLength(col("text")),
        "distinct_ratio" -> TextOps.distinctRatio(col("text")),
        "log_chars" -> log(col("n_chars") + 1))
      val fit = graft.stats.Logistic.fit(docs, feats,
          (col("lang") === "en").cast("double"), lambda = 1e-3)
        .getOrElse(sys.error("logistic fit produced no model"))
      require(fit.converged,
        s"IRLS did not converge in ${fit.iterations} iterations")
      val scored = docs.select(col("doc_id"), col("lang"),
        round(fit.score(feats.map(_._2)), 6).as("en_score"))
      val m = scored.groupBy((col("lang") === "en").as("is_en"))
        .agg(avg(col("en_score")).as("m")).collect()
        .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      val separates = m(true) > m(false)
      require(separates,
        s"classifier is not discriminative: en ${m(true)} <= other ${m(false)}")
      // PROMOTED (r17, the differential template): IRLS weights are
      // iterative facts; the hashed output is the exact class volumes
      // (DuckDB rebuilds them from the lang column) plus the
      // convergence and mean-separation verdicts pinned TRUE. Scores
      // stay in-gate.
      val nEn = docs.filter(col("lang") === "en").count()
      val nOther = docs.count() - nEn
      import s.implicits._
      Seq((nEn, nOther, fit.converged, separates))
        .toDF("n_en", "n_other", "converged", "separates")
    })

  /** Cross-corpus frequent-span removal (word-5-gram exact-substring
    * dedup, Lee et al. 2022): spans in ≥2 distinct docs are stripped,
    * documents reassembled in order. The oracle rebuilds the identical
    * pipeline with window leads + NOT EXISTS coverage — full per-row,
    * per-word parity including the rewritten text. */
  val ddSpanRemoval: Q = Q(
    "dd_span_removal",
    Some(s"""
      WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
      t AS (
        SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS word,
               len(w) AS nw
        FROM d),
      g AS (
        SELECT doc_id, pos AS start, nw,
          concat_ws(' ', word, lead(word, 1) OVER wd, lead(word, 2) OVER wd,
                    lead(word, 3) OVER wd, lead(word, 4) OVER wd) AS gram
        FROM t WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)),
      g2 AS (SELECT doc_id, start, gram FROM g WHERE start <= nw - 5),
      f AS (SELECT gram FROM g2 GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      cov AS (SELECT DISTINCT g2.doc_id, g2.start FROM g2 JOIN f USING (gram)),
      kept AS (
        SELECT t.doc_id, t.pos, t.word FROM t
        WHERE NOT EXISTS (SELECT 1 FROM cov c
                          WHERE c.doc_id = t.doc_id
                            AND t.pos >= c.start AND t.pos < c.start + 5)),
      agg AS (
        SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
               count(*) AS kept_words
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.text, '') AS text,
             len(d.w) - coalesce(a.kept_words, 0) AS words_removed
      FROM d LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id"""),
    (s, dir) =>
      Dedup.removeFrequentSpans(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 5, minDocFreq = 2)
        .select(col("doc_id"), col("text"), col("words_removed"))
        .orderBy("doc_id"))

  /** Character chunking (200-char windows, 50 overlap) for embedding
    * pipelines; the oracle reproduces every chunk boundary with
    * generate_series + substr. */
  val txtChunks: Q = Q(
    "txt_chunks",
    Some("""
      SELECT d.doc_id, CAST(t.s / 150 AS BIGINT) AS chunk_idx,
        substr(d.text, CAST(t.s + 1 AS BIGINT), 200) AS chunk
      FROM documents d,
        unnest(range(0, greatest(length(d.text) - 51, 0) + 1, 150)) t(s)
      WHERE length(d.text) > 0
      ORDER BY d.doc_id, chunk_idx"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.chunks(col("text"), size = 200, overlap = 50)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk"))
        .orderBy("doc_id", "chunk_idx"))

  /** Within-document repetition (duplicate-line fraction, the Gopher/C4
    * repetition filter) — DuckDB mirrors the line pipeline with list
    * functions. */
  val txtRepetition: Q = Q(
    "txt_repetition",
    Some("""
      WITH l AS (
        SELECT doc_id,
          list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
            x -> length(x) > 0) AS lines
        FROM documents)
      SELECT doc_id,
        CASE WHEN len(lines) > 0
          THEN ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 6)
          ELSE 0.0 END AS dup_line_frac
      FROM l
      ORDER BY doc_id"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.duplicateLineFraction(col("text")), 6).as("dup_line_frac"))
        .orderBy("doc_id"))

  /** Corpus vocabulary: whitespace-token counts, top 100 by frequency
    * (ties broken by token so the cut is total-ordered) — the map-side-
    * combined wordcount every tokenizer-training pipeline starts from. */
  val txtVocab: Q = Q(
    "txt_vocab",
    Some("""
      WITH t AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
        WHERE length(trim(text)) > 0)
      SELECT token, count(*) AS n
      FROM t
      WHERE token <> ''
      GROUP BY token
      ORDER BY n DESC, token
      LIMIT 100"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(100))

  /** PII redaction parity: both engines apply the same RE2-safe pattern
    * chain (DuckDB needs the 'g' flag — its regexp_replace defaults to
    * first-match-only where Spark replaces all). The corpus is mostly
    * clean, so the oracle's value is proving the no-op is EXACTLY a no-op
    * and any match redacts identically. */
  val txtRedact: Q = Q(
    "txt_redact_pii",
    Some("""
      SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
          '\b\d{7,}\b', '<NUM>', 'g') AS clean_text
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextOps.redactPii(col("text")).as("clean_text"))
        .orderBy("doc_id"))

  /** Train/test decontamination, exact semantics: 3-gram overlap of every
    * corpus doc (doc_id % 17 <> 3) against the benchmark slice
    * (doc_id % 17 = 3). The oracle rebuilds the shingle sets with DuckDB
    * list functions and reproduces overlap counts + fractions. */
  val txtDecontaminate: Q = Q(
    "txt_decontaminate",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS s
        FROM t),
      bench AS (SELECT DISTINCT unnest(s) AS sg FROM sh WHERE doc_id % 17 = 3),
      corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 17 <> 3),
      e AS (SELECT doc_id, unnest(s) AS sg FROM corp),
      ov AS (SELECT e.doc_id, count(*) AS overlap
             FROM e JOIN bench USING (sg) GROUP BY 1)
      SELECT c.doc_id, len(c.s) AS n_shingles,
        COALESCE(ov.overlap, 0) AS overlap,
        ROUND(CASE WHEN len(c.s) = 0 THEN 0.0
          ELSE CAST(COALESCE(ov.overlap, 0) AS DOUBLE) / len(c.s) END, 6) AS frac
      FROM corp c LEFT JOIN ov USING (doc_id)
      ORDER BY c.doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 3)
      val corpus = docs.filter(col("doc_id") % 17 =!= 3)
      graft.ops.Decontaminate.overlapExact(corpus, "doc_id", "text", bench, "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"), col("overlap"),
          round(col("frac"), 6).as("frac"))
        .orderBy("doc_id")
    })

  /** Decontamination, Bloom scale path — PROMOTED to oracle-checked
    * (r17, the dd_novelty_bloom template): the filter bit layout is not
    * SQL-expressible, so the gate emits the DIFFERENTIAL against the
    * exact twin — corpus volume and the exact clean count (DuckDB
    * rebuilds both from the 3-gram overlap SQL the txt_decontaminate
    * oracle already pins) plus the two COMPUTED Bloom-contract verdicts
    * the oracle pins TRUE: no false negatives (the bloom clean set ⊆
    * exact clean set) and over-flagging within slack of the configured
    * fpp. A broken filter now flips a hashed cell, not just an in-gate
    * assert. */
  val txtDecontaminateBloom: Q = Q(
    "txt_decontaminate_bloom",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS s
        FROM t),
      bench AS (SELECT DISTINCT unnest(s) AS sg FROM sh WHERE doc_id % 17 = 3),
      corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 17 <> 3),
      e AS (SELECT doc_id, unnest(s) AS sg FROM corp),
      ov AS (SELECT e.doc_id, count(*) AS overlap
             FROM e JOIN bench USING (sg) GROUP BY 1)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM corp) AS n_corpus,
        CAST(count(*) AS BIGINT) AS n_exact_clean,
        TRUE AS no_false_negatives,
        TRUE AS within_flag_budget
      FROM corp c LEFT JOIN ov USING (doc_id)
      WHERE COALESCE(ov.overlap, 0) < 3"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 3)
      val corpus = docs.filter(col("doc_id") % 17 =!= 3)
      val exact = graft.ops.Decontaminate.cleanExact(
        corpus, "doc_id", "text", bench, "text", n = 3, maxOverlap = 3L)
      val bloom = graft.ops.Decontaminate.cleanBloom(
        corpus, "doc_id", "text", bench, "text", n = 3, maxOverlap = 3L, fpp = 0.001)
      val noFalseNeg = bloom.select("doc_id")
        .join(exact.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty
      require(noFalseNeg,
        "bloom decontamination kept a doc the exact path flags " +
          "(false negative — violates the Bloom contract)")
      val nCorpus = corpus.count()
      val nExact = exact.count()
      val nBloom = bloom.count()
      val withinBudget =
        nBloom >= nExact - math.max(5L, (0.05 * nExact).toLong)
      require(withinBudget,
        s"bloom over-flagging out of contract: kept $nBloom of $nExact clean docs")
      import s.implicits._
      Seq((nCorpus, nExact, noFalseNeg, withinBudget))
        .toDF("n_corpus", "n_exact_clean", "no_false_negatives",
          "within_flag_budget")
    })

  /** BM25 top-10 for the query "spark hash join" — the oracle recomputes
    * N/avgdl/df from the corpus and the identical Lucene-variant scoring
    * arithmetic (term order and operator shape mirrored, both engines
    * order by the ROUNDED score so the cut is stable). */
  val txtBm25: Q = Q(
    "txt_bm25_topk",
    Some("""
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
        FROM documents),
      s AS (
        SELECT count(*) AS n, avg(len(w)) AS avgdl,
          sum(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END) AS df0,
          sum(CASE WHEN list_contains(w, 'hash') THEN 1 ELSE 0 END) AS df1,
          sum(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS df2
        FROM d)
      SELECT doc_id AS id, ROUND(
          ln(1.0 + (CAST(n - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
            * ((CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) * (1.2 + 1.0))
               / (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(w) AS DOUBLE) / avgdl)))
        + ln(1.0 + (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
            * ((CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) * (1.2 + 1.0))
               / (CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(w) AS DOUBLE) / avgdl)))
        + ln(1.0 + (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
            * ((CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) * (1.2 + 1.0))
               / (CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(w) AS DOUBLE) / avgdl)))
        , 6) AS score
      FROM d, s
      ORDER BY score DESC, id
      LIMIT 10"""),
    (s, dir) =>
      graft.ops.TextSearch.bm25TopK(Tables.load(s, dir, "documents"),
        "doc_id", "text", "spark hash join", k = 10))

  /** BM25 answered FROM the inverted postings index
    * ([[graft.ops.TextSearch.buildPostings]] + `bm25TopKIndexed`): the
    * oracle REBUILDS the index relationally (unnest → per-(term,doc)
    * tf+dl rows) and scores from it with the same literal-inlined
    * arithmetic, fixed term order, COALESCE-0 missing terms — matched
    * documents only, by construction on both sides. */
  val txtBm25Indexed: Q = Q(
    "txt_bm25_indexed",
    Some("""
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
        FROM documents),
      s AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
      tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term
              FROM d WHERE len(w) > 0),
      p AS (SELECT term, doc_id, dl, count(*) AS tf FROM tok
            WHERE term IN ('merge', 'batch', 'window')
            GROUP BY term, doc_id, dl),
      df AS (SELECT term, count(*) AS dft FROM p GROUP BY term),
      piv AS (
        SELECT p.doc_id,
          MAX(CASE WHEN p.term = 'merge' THEN
            ln(1.0 + (CAST(s.n - COALESCE((SELECT dft FROM df WHERE term = 'merge'), 0) AS DOUBLE) + 0.5)
                   / (CAST(COALESCE((SELECT dft FROM df WHERE term = 'merge'), 0) AS DOUBLE) + 0.5))
            * ((CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(p.tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))) END) AS s0,
          MAX(CASE WHEN p.term = 'batch' THEN
            ln(1.0 + (CAST(s.n - COALESCE((SELECT dft FROM df WHERE term = 'batch'), 0) AS DOUBLE) + 0.5)
                   / (CAST(COALESCE((SELECT dft FROM df WHERE term = 'batch'), 0) AS DOUBLE) + 0.5))
            * ((CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(p.tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))) END) AS s1,
          MAX(CASE WHEN p.term = 'window' THEN
            ln(1.0 + (CAST(s.n - COALESCE((SELECT dft FROM df WHERE term = 'window'), 0) AS DOUBLE) + 0.5)
                   / (CAST(COALESCE((SELECT dft FROM df WHERE term = 'window'), 0) AS DOUBLE) + 0.5))
            * ((CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(p.tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))) END) AS s2
        FROM p, s GROUP BY p.doc_id)
      SELECT doc_id AS id,
        ROUND(COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0), 6) AS score
      FROM piv
      ORDER BY score DESC, id
      LIMIT 10"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val postings = graft.ops.TextSearch.buildPostings(docs, "doc_id", "text")
      val (n, avgdl) = graft.ops.TextSearch.corpusStats(docs, "text")
      graft.ops.TextSearch.bm25TopKIndexed(
        postings, n, avgdl, "merge batch window", k = 10)
    })

  /** TF-IDF top-10 for "data filter stream" — length-normalized tf times
    * smoothed idf (ln((1+N)/(1+df)) + 1). The oracle recomputes N and the
    * per-term dfs from the corpus and mirrors the scoring arithmetic
    * term-for-term; both engines order by the ROUNDED score. */
  val txtTfidf: Q = Q(
    "txt_tfidf_topk",
    Some("""
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
        FROM documents),
      s AS (
        SELECT count(*) AS n,
          sum(CASE WHEN list_contains(w, 'data') THEN 1 ELSE 0 END) AS df0,
          sum(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS df1,
          sum(CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END) AS df2
        FROM d)
      SELECT doc_id AS id, ROUND(
          (CASE WHEN len(w) = 0 THEN 0.0
            ELSE CAST(len(list_filter(w, x -> x = 'data')) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE) END)
            * (ln((1.0 + n) / (1.0 + df0)) + 1.0)
        + (CASE WHEN len(w) = 0 THEN 0.0
            ELSE CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE) END)
            * (ln((1.0 + n) / (1.0 + df1)) + 1.0)
        + (CASE WHEN len(w) = 0 THEN 0.0
            ELSE CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE) END)
            * (ln((1.0 + n) / (1.0 + df2)) + 1.0)
        , 6) AS score
      FROM d, s
      ORDER BY score DESC, id
      LIMIT 10"""),
    (s, dir) =>
      graft.ops.TextSearch.tfidfTopK(Tables.load(s, dir, "documents"),
        "doc_id", "text", "data filter stream", k = 10))

  /** Bigram LM self-scoring (mean conditional add-one log-probability —
    * one step closer to the KenLM perplexity filter than the unigram
    * entry). The oracle retrains both count tables in SQL and mirrors
    * the ln((cb+1)/(cu+V)) arithmetic; ROUND(…,6) absorbs the cross-row
    * mean's order noise (same-sign terms). */
  val txtBigramLogprob: Q = Q(
    "txt_bigram_logprob",
    Some(s"""
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w
        FROM documents),
      uni AS (SELECT unnest(w) AS t FROM d),
      uc AS (SELECT t, count(*) AS cu FROM uni GROUP BY 1),
      vs AS (SELECT count(*) AS v FROM uc),
      sh AS (
        SELECT doc_id, CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END AS s
        FROM d),
      bc AS (
        SELECT bg, count(*) AS cb
        FROM (SELECT unnest(s) AS bg FROM sh) GROUP BY 1),
      e AS (SELECT doc_id, unnest(s) AS bg FROM sh),
      j AS (
        SELECT e.doc_id,
          ln((COALESCE(bc.cb, 0) + 1.0) / (COALESCE(uc.cu, 0) + v)) AS lp
        FROM e
        LEFT JOIN bc ON e.bg = bc.bg
        LEFT JOIN uc ON split_part(e.bg, ' ', 1) = uc.t, vs),
      a AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS lp
            FROM j GROUP BY 1)
      SELECT d.doc_id AS id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
        ROUND(COALESCE(a.lp, 0.0), 6) AS logprob
      FROM d LEFT JOIN a ON d.doc_id = a.doc_id
      ORDER BY id"""),
    (s, dir) =>
      graft.ops.LanguageModel
        .selfScoreBigram(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("id"))

  /** Shared KN-replay prelude: DuckDB retrains the SAME interpolated
    * Kneser–Ney bigram model (bigram counts, context totals + fanouts,
    * continuation counts, count-of-counts discount, add-one continuation
    * over B + V) and rescores every document — the oracle checks the
    * smoothing algebra term-for-term, not just the plumbing. Expression
    * shapes mirror graft.ops.LanguageModel.scoreKneserNey exactly
    * (left-associative `dd * fanout / cw * pc`, greatest against 0.0,
    * perplexity exponentiates the ROUNDED mean) so both engines walk the
    * same IEEE ops. */
  private val knReplayPrelude: String = """
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
        FROM documents),
      uni AS (SELECT unnest(w) AS t FROM d),
      vs AS (SELECT count(DISTINCT t) AS v FROM uni),
      sh AS (
        SELECT doc_id, CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END AS s
        FROM d),
      bc AS (
        SELECT bg, count(*) AS cb
        FROM (SELECT unnest(s) AS bg FROM sh) GROUP BY 1),
      parts AS (
        SELECT bg, cb, split_part(bg, ' ', 1) AS ctx,
          split_part(bg, ' ', 2) AS nxt
        FROM bc),
      ctxs AS (
        SELECT ctx, CAST(sum(cb) AS BIGINT) AS cw, count(*) AS fanout
        FROM parts GROUP BY 1),
      cont AS (SELECT nxt, count(*) AS nc FROM parts GROUP BY 1),
      sc AS (
        SELECT count(*) AS b,
          CAST(COALESCE(sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n1,
          CAST(COALESCE(sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n2
        FROM parts),
      kd AS (
        SELECT b, CASE WHEN n1 + 2 * n2 = 0 THEN 0.0
          ELSE CAST(n1 AS DOUBLE) / (n1 + 2 * n2) END AS dd
        FROM sc),
      bv AS (SELECT CAST(greatest(b + v, 1) AS DOUBLE) AS bv FROM kd, vs),
      e AS (SELECT doc_id, unnest(s) AS bg FROM sh),
      j AS (
        SELECT e.doc_id,
          ln(CASE WHEN ctxs.cw IS NOT NULL
            THEN greatest(COALESCE(bc.cb, 0) - dd, 0.0) / ctxs.cw
              + dd * ctxs.fanout / ctxs.cw
                * ((COALESCE(cont.nc, 0) + 1.0) / bv)
            ELSE (COALESCE(cont.nc, 0) + 1.0) / bv END) AS lp
        FROM e
        LEFT JOIN bc ON e.bg = bc.bg
        LEFT JOIN ctxs ON split_part(e.bg, ' ', 1) = ctxs.ctx
        LEFT JOIN cont ON split_part(e.bg, ' ', 2) = cont.nxt, kd, bv),
      a AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS lp
            FROM j GROUP BY 1),
      scored AS (
        SELECT d.doc_id AS id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
          ROUND(COALESCE(a.lp, 0.0), 6) AS logprob,
          ROUND(exp(-ROUND(COALESCE(a.lp, 0.0), 6)), 6) AS perplexity
        FROM d LEFT JOIN a ON d.doc_id = a.doc_id)"""

  /** Interpolated Kneser–Ney self-score over the corpus — the real
    * perplexity-filter model family (KenLM's default smoothing), scored
    * distributed: three vocab-sized key joins + one mean per doc. */
  val txtKneserNey: Q = Q(
    "txt_kneser_ney",
    Some(knReplayPrelude + """
      SELECT id, n_bigrams, logprob, perplexity FROM scored ORDER BY id"""),
    (s, dir) =>
      graft.ops.LanguageModel
        .selfScoreKneserNey(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("id"))

  /** CCNet head/middle/tail buckets: per-language KN-perplexity
    * terciles by deterministic rank (ORDER BY perplexity, id) — the
    * public CCNet pipeline's quality split, with `head` the
    * lowest-perplexity third it keeps by default. */
  val txtCcnetBuckets: Q = Q(
    "txt_ccnet_buckets",
    Some(knReplayPrelude + """,
      withlang AS (
        SELECT s.id, d0.lang, s.perplexity,
          row_number() OVER (PARTITION BY d0.lang
            ORDER BY s.perplexity, s.id) AS r,
          count(*) OVER (PARTITION BY d0.lang) AS n
        FROM scored s JOIN documents d0 ON s.id = d0.doc_id)
      SELECT id, lang, perplexity,
        CASE WHEN r * 3 <= n THEN 'head'
             WHEN r * 3 <= n * 2 THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM withlang ORDER BY id"""),
    (s, dir) =>
      graft.ops.LanguageModel
        .ccnetBuckets(Tables.load(s, dir, "documents"), "doc_id", "text",
          "lang")
        .orderBy("id"))

  /** Top-50 collocations by Dunning LLR ([[graft.ops.Collocations]]) —
    * the oracle rebuilds the bigram multiset, both marginals, and all
    * three association statistics (PMI / t / LLR) with the exact
    * double-expression shapes the Spark side uses (cast-first products,
    * left-associative cell sum, O=0 cells contributing 0). */
  val txtCollocations: Q = Q(
    "txt_collocations",
    Some("""
      WITH d AS (
        SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, CASE WHEN len(w) < 2 THEN []
          ELSE list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1]) END AS s
        FROM d),
      bc AS (
        SELECT bg AS bigram, count(*) AS cb
        FROM (SELECT unnest(s) AS bg FROM sh) GROUP BY 1),
      parts AS (
        SELECT bigram, cb, split_part(bigram, ' ', 1) AS w1,
          split_part(bigram, ' ', 2) AS w2
        FROM bc),
      lm AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1 FROM parts GROUP BY 1),
      rm AS (SELECT w2, CAST(sum(cb) AS BIGINT) AS c2 FROM parts GROUP BY 1),
      nt AS (SELECT CAST(COALESCE(sum(cb), 0) AS BIGINT) AS n FROM parts),
      dv AS (
        SELECT p.bigram, p.cb, lm.c1, rm.c2,
          CAST(p.cb AS DOUBLE) AS cbd, CAST(lm.c1 AS DOUBLE) AS c1d,
          CAST(rm.c2 AS DOUBLE) AS c2d, CAST(nt.n AS DOUBLE) AS nn
        FROM parts p JOIN lm USING (w1) JOIN rm USING (w2), nt
        WHERE p.cb >= 5),
      assoc AS (
        SELECT bigram, cb, c1, c2,
          round(ln(cbd * nn / (c1d * c2d)), 6) AS pmi,
          round((cbd - c1d * c2d / nn) / sqrt(cbd), 6) AS tscore,
          round(2.0 * (
            (CASE WHEN cbd > 0.0
              THEN cbd * ln(cbd / (c1d * c2d / nn)) ELSE 0.0 END)
            + (CASE WHEN c1d - cbd > 0.0
              THEN (c1d - cbd) * ln((c1d - cbd) / (c1d * (nn - c2d) / nn))
              ELSE 0.0 END)
            + (CASE WHEN c2d - cbd > 0.0
              THEN (c2d - cbd) * ln((c2d - cbd) / ((nn - c1d) * c2d / nn))
              ELSE 0.0 END)
            + (CASE WHEN nn - c1d - c2d + cbd > 0.0
              THEN (nn - c1d - c2d + cbd)
                * ln((nn - c1d - c2d + cbd) / ((nn - c1d) * (nn - c2d) / nn))
              ELSE 0.0 END)), 6) AS llr
        FROM dv)
      SELECT bigram, cb, c1, c2, pmi, tscore, llr
      FROM assoc ORDER BY llr DESC, bigram LIMIT 50"""),
    (s, dir) =>
      graft.ops.Collocations
        .topCollocations(Tables.load(s, dir, "documents"), "text",
          k = 50, minCount = 5)
        .orderBy(col("llr").desc, col("bigram")))

  /** Exact frequent tokens ≥ 3.4% of the token stream via Misra-Gries
    * candidates + an exact verify pass (graft.ops.HeavyHitters). The output
    * is EXACT by construction, so the oracle is the brute-force unnest +
    * HAVING — what the two-pass plan avoids shuffling at scale. */
  val txtHeavyHitters: Q = Q(
    "txt_heavy_hitters",
    Some("""
      WITH d AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      e AS (SELECT unnest(w) AS token FROM d),
      n AS (SELECT count(*) AS total FROM e)
      SELECT token, count(*) AS cnt
      FROM e, n
      GROUP BY token, n.total
      HAVING count(*) >= CAST(ceil(0.034 * total) AS BIGINT)
      ORDER BY cnt DESC, token"""),
    (s, dir) =>
      graft.ops.HeavyHitters.frequentTokens(
        Tables.load(s, dir, "documents"), "text", minFraction = 0.034))

  /** The [[graft.ops.CorpusReport.bySource]] oracle — shared with
    * s12_dataset_card, whose rendered markdown parses back to exactly
    * this table (one SQL string, two gates: the numbers and their
    * rendering can't drift apart). */
  private[queries] val corpusCardSql: String = {
      val enList = TextOps.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""
      WITH d AS (
        SELECT source, lang, text, $wSql AS w FROM documents),
      q AS (
        SELECT source, lang,
          len(w) AS n_tok,
          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
          round((0.3 * least(1.0, len(w) / 100.0)
            + 0.4 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END)
            + 0.3 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_filter(w, t -> t IN ($enList))) AS DOUBLE)
                     / len(w) END)) * 1e6) AS qmicro
        FROM d)
      SELECT source,
        count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        count(DISTINCT fp) AS n_unique_fp,
        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        ROUND(sum(qmicro) / count(*) / 1e6, 6) AS mean_quality
      FROM q
      GROUP BY source
      ORDER BY source"""
  }

  /** Per-source corpus datasheet ([[graft.ops.CorpusReport]]): volume,
    * exact-dup census, language mix, mean quality — one groupBy scan.
    * Quality is micro-quantized before summing so the mean is exact. */
  val txtCorpusCard: Q = Q(
    "txt_corpus_card",
    Some(corpusCardSql),
    (s, dir) =>
      graft.ops.CorpusReport.bySource(Tables.load(s, dir, "documents")))

  /** Entity-resolution candidates ([[graft.ops.EntityResolution]]):
    * customer records blocked by nation, paired at name edit distance ≤ 1.
    * Levenshtein is exact integer arithmetic in both engines; the
    * length-gap prefilter drops most of the block² comparisons before the
    * DP runs. */
  val erFuzzyCandidates: Q = Q(
    "er_fuzzy_candidates",
    Some("""
      WITH c AS (SELECT c_custkey, c_nationkey, c_name FROM customer)
      SELECT a.c_nationkey, a.c_custkey AS id1, b.c_custkey AS id2,
        levenshtein(a.c_name, b.c_name) AS edit
      FROM c a
      JOIN c b ON a.c_nationkey = b.c_nationkey
        AND a.c_custkey < b.c_custkey
      WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
        AND levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id1, id2"""),
    (s, dir) =>
      graft.ops.EntityResolution
        .candidatePairs(Tables.load(s, dir, "customer"),
          blockCols = Seq("c_nationkey"), idCol = "c_custkey",
          nameCol = "c_name", maxEdit = 1)
        .select("c_nationkey", "id1", "id2", "edit")
        .orderBy("id1", "id2"))

  /** Unigram LM self-scoring (mean token log-probability, add-one
    * smoothing) — the perplexity-style quality signal. The oracle retrains
    * the same model in SQL; ROUND(…,6) absorbs the cross-row double
    * aggregation's order noise (same-sign terms, machine-epsilon scale). */
  /** Golden-record survivorship ([[graft.ops.Survivorship]]): customers
    * clustered by custkey % 97 play matched entities; per-attribute
    * rules merge each cluster to one record — longest name, max balance,
    * majority segment, nation of the latest (max-custkey) record. Every
    * rule is a struct-max total order, so ties resolve identically in
    * both engines and the merge hash-matches exactly. */
  val mntGoldenRecords: Q = Q(
    "mnt_golden_records",
    Some("""
      WITH g AS (SELECT c_custkey % 97 AS cluster, * FROM customer),
      base AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_records,
          max(c_acctbal) AS c_acctbal,
          max(CASE WHEN c_name IS NOT NULL THEN
            {'k': length(c_name), 'v': c_name} END).v AS c_name,
          max(CASE WHEN c_nationkey IS NOT NULL THEN
            {'k': c_custkey, 'v': c_nationkey} END).v AS c_nationkey
        FROM g GROUP BY cluster),
      mj AS (
        SELECT cluster, max({'k': n, 'v': v}).v AS c_mktsegment FROM (
          SELECT cluster, c_mktsegment AS v, count(*) AS n
          FROM g WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2)
        GROUP BY cluster)
      SELECT b.cluster, b.n_records, b.c_acctbal, b.c_name,
        b.c_nationkey, m.c_mktsegment
      FROM base b LEFT JOIN mj m USING (cluster)
      ORDER BY cluster"""),
    (s, dir) => {
      import graft.ops.Survivorship._
      goldenRecords(
        Tables.load(s, dir, "customer")
          .withColumn("cluster", col("c_custkey") % 97),
        "cluster",
        Map("c_name" -> LongestString, "c_acctbal" -> MaxValue,
          "c_mktsegment" -> Majority,
          "c_nationkey" -> Latest("c_custkey")))
        .orderBy("cluster")
    })

  /** Luhn card-number validation ([[graft.ops.TextOps.luhnValid]]): both
    * engines build the same synthetic 16-digit candidates from doc_id
    * and fold the identical mod-10 checksum — exact integers, so the
    * verdict grid hash-matches. */
  val txtLuhnValidate: Q = Q(
    "txt_luhn_validate",
    Some("""
      WITH c AS (
        SELECT doc_id,
          CAST(4000000000000000 + doc_id * 137 AS VARCHAR) AS candidate
        FROM documents)
      SELECT doc_id, candidate,
        list_sum(list_transform(generate_series(1, length(candidate)),
          r -> CASE WHEN r % 2 = 0 THEN
              CASE WHEN 2 * CAST(substr(candidate,
                  length(candidate) - r + 1, 1) AS INT) > 9
                THEN 2 * CAST(substr(candidate,
                  length(candidate) - r + 1, 1) AS INT) - 9
                ELSE 2 * CAST(substr(candidate,
                  length(candidate) - r + 1, 1) AS INT) END
            ELSE CAST(substr(candidate,
              length(candidate) - r + 1, 1) AS INT) END))
          % 10 = 0 AS valid
      FROM c
      ORDER BY doc_id"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(4000000000000000L) + col("doc_id") * 137).cast("string")
            .as("candidate"))
        .withColumn("valid", graft.ops.TextOps.luhnValid(col("candidate")))
        .orderBy("doc_id"))

  /** Card redaction over planted candidates
    * ([[graft.functions.LuhnRedactCards]]) — PROMOTED to oracle-checked
    * (r17): on the planted fixture the redaction outcome is a PURE
    * FUNCTION of the oracle-green Luhn verdict (valid ⇒ the one card
    * run becomes `<CARD>`, invalid ⇒ the text is untouched), so DuckDB
    * rebuilds the candidates, replays the mod-10 fold, and emits the
    * exact expected redacted string per row — a redactor that touched
    * the wrong span, the short run, or an invalid number now flips a
    * hashed cell. Idempotence stays in-gate. */
  val txtLuhnRedact: Q = Q(
    "txt_luhn_redact",
    Some("""
      WITH c AS (
        SELECT doc_id,
          CAST(4000000000000000 + doc_id * 137 AS VARCHAR) AS candidate
        FROM documents),
      v AS (
        SELECT doc_id, candidate,
          list_sum(list_transform(generate_series(1, length(candidate)),
            r -> CASE WHEN r % 2 = 0 THEN
                CASE WHEN 2 * CAST(substr(candidate,
                    length(candidate) - r + 1, 1) AS INT) > 9
                  THEN 2 * CAST(substr(candidate,
                    length(candidate) - r + 1, 1) AS INT) - 9
                  ELSE 2 * CAST(substr(candidate,
                    length(candidate) - r + 1, 1) AS INT) END
              ELSE CAST(substr(candidate,
                length(candidate) - r + 1, 1) AS INT) END))
            % 10 = 0 AS valid
        FROM c)
      SELECT doc_id, valid,
        CASE WHEN valid THEN 'order 123456 card <CARD> end'
          ELSE 'order 123456 card ' || candidate || ' end' END AS redacted
      FROM v
      ORDER BY doc_id"""),
    (s, dir) => {
      import graft.ops.TextOps
      val planted = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(4000000000000000L) + col("doc_id") * 137).cast("string")
            .as("candidate"))
        .withColumn("text2",
          concat(lit("order 123456 card "), col("candidate"), lit(" end")))
        .withColumn("valid", TextOps.luhnValid(col("candidate")))
        .withColumn("redacted", TextOps.redactCards(col("text2")))
      val bad = planted.filter(
        (col("valid") && !col("redacted").contains("<CARD>")) ||
          (!col("valid") && col("redacted") =!= col("text2")) ||
          (col("valid") &&
            col("redacted") =!= concat(lit("order 123456 card <CARD> end")))
      ).count()
      require(bad == 0, s"$bad redaction mismatches against the validator")
      val notIdempotent = planted.filter(
        TextOps.redactCards(col("redacted")) =!= col("redacted")).count()
      require(notIdempotent == 0, "redaction must be idempotent")
      planted.select(col("doc_id"), col("valid"), col("redacted"))
        .orderBy("doc_id")
    })

  /** Jaro–Winkler scoring over adjacent-key customer name pairs
    * ([[graft.ops.TextOps.jaroWinkler]]): the oracle is DuckDB's OWN
    * `jaro_winkler_similarity` — a genuinely independent implementation
    * of the same published spec (match window, transposition halving,
    * 0.7-thresholded prefix boost), so agreement on all 1,499 pairs is
    * a real differential test, not a replay. */
  val erJaroWinkler: Q = Q(
    "er_jaro_winkler",
    Some("""
      SELECT c1.c_custkey AS k1, c2.c_custkey AS k2,
        round(jaro_winkler_similarity(c1.c_name, c2.c_name), 9) AS jw
      FROM customer c1 JOIN customer c2
        ON c2.c_custkey = c1.c_custkey + 1
      ORDER BY k1"""),
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val c1 = c.select(col("c_custkey").as("k1"), col("c_name").as("n1"))
      val c2 = c.select((col("c_custkey") - 1).as("k1"),
        col("c_custkey").as("k2"), col("c_name").as("n2"))
      c1.join(c2, Seq("k1"))
        .select(col("k1"), col("k2"),
          round(TextOps.jaroWinkler(col("n1"), col("n2")), 9).as("jw"))
        .orderBy("k1")
    })

  /** Fellegi–Sunter m/u rates shared by the Spark plan AND the oracle
    * string below — the log₂(m/u) weights are driver-computed constants,
    * so interpolating Double.toString (shortest round-trip) into the SQL
    * hands DuckDB the bit-identical literals Spark folds. (The Column
    * side of each FieldSpec is built inside the gate lambda: the
    * Jaro–Winkler Column registers a function against the ACTIVE session,
    * which does not exist at module-initialization time.) */
  private val fsRates = Map(
    "name" -> (0.9, 0.05), "nation" -> (0.95, 0.04),
    "segment" -> (0.9, 0.2), "acctbal" -> (0.8, 0.1))
  private def fsWeights(field: String): (String, String) = {
    val (m, u) = fsRates(field)
    ((math.log(m / u) / math.log(2.0)).toString,
      (math.log((1 - m) / (1 - u)) / math.log(2.0)).toString)
  }

  /** Fellegi–Sunter probabilistic linkage scoring
    * ([[graft.ops.EntityResolution.fellegiSunter]]) over adjacent-key
    * customer pairs: four comparison fields (Jaro–Winkler name, nation
    * equality, segment equality, balance tolerance) fold their literal
    * log₂ likelihood ratios into a match weight classified against
    * ±2 bits. Every flag, weight and class is recomputed by the oracle —
    * DuckDB's own jaro_winkler_similarity makes the name flag a genuine
    * cross-implementation differential. */
  val erFellegiSunter: Q = Q(
    "er_fellegi_sunter",
    Some {
      val (na, nd) = fsWeights("name"); val (ta, td) = fsWeights("nation")
      val (sa, sd) = fsWeights("segment"); val (ba, bd) = fsWeights("acctbal")
      s"""
      WITH p AS (
        SELECT c1.c_custkey AS id1, c2.c_custkey AS id2,
          CASE WHEN round(jaro_winkler_similarity(c1.c_name, c2.c_name), 9)
            >= 0.99 THEN 1 ELSE 0 END AS agree_name,
          CASE WHEN c1.c_nationkey = c2.c_nationkey THEN 1 ELSE 0 END
            AS agree_nation,
          CASE WHEN c1.c_mktsegment = c2.c_mktsegment THEN 1 ELSE 0 END
            AS agree_segment,
          CASE WHEN abs(c1.c_acctbal - c2.c_acctbal) <= 1000.0
            THEN 1 ELSE 0 END AS agree_acctbal
        FROM customer c1 JOIN customer c2
          ON c2.c_custkey = c1.c_custkey + 1),
      sc AS (
        SELECT *, round(
            (CASE WHEN agree_name = 1 THEN $na ELSE $nd END)
          + (CASE WHEN agree_nation = 1 THEN $ta ELSE $td END)
          + (CASE WHEN agree_segment = 1 THEN $sa ELSE $sd END)
          + (CASE WHEN agree_acctbal = 1 THEN $ba ELSE $bd END), 6)
          AS match_weight
        FROM p)
      SELECT id1, id2, agree_name, agree_nation, agree_segment,
        agree_acctbal, match_weight,
        CASE WHEN match_weight >= 2.0 THEN 'match'
          WHEN match_weight < -2.0 THEN 'non_match'
          ELSE 'possible' END AS classification
      FROM sc ORDER BY id1"""
    },
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val c1 = c.select(col("c_custkey").as("id1"), col("c_name").as("n1"),
        col("c_nationkey").as("nat1"), col("c_mktsegment").as("seg1"),
        col("c_acctbal").as("bal1"))
      val c2 = c.select((col("c_custkey") - 1).as("id1"),
        col("c_custkey").as("id2"), col("c_name").as("n2"),
        col("c_nationkey").as("nat2"), col("c_mktsegment").as("seg2"),
        col("c_acctbal").as("bal2"))
      val pairs = c1.join(c2, Seq("id1"))
      import graft.ops.EntityResolution.FieldSpec
      def spec(field: String, agree: org.apache.spark.sql.Column) = {
        val (m, u) = fsRates(field); FieldSpec(field, agree, m, u)
      }
      val scored = graft.ops.EntityResolution.fellegiSunter(pairs,
        Seq(
          spec("name",
            round(TextOps.jaroWinkler(col("n1"), col("n2")), 9) >= 0.99),
          spec("nation", col("nat1") === col("nat2")),
          spec("segment", col("seg1") === col("seg2")),
          spec("acctbal", abs(col("bal1") - col("bal2")) <= 1000.0)),
        upper = 2.0, lower = -2.0)
      // the spec must separate: disagreement on everything must land
      // below the evidence of agreement on everything, with both sides
      // of the clerical band populated on this fixture
      val byClass = scored.groupBy("classification").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(byClass.getOrElse("non_match", 0L) > 0,
        "fixture must produce non-matches")
      require(byClass.values.sum == pairs.count(),
        "every pair must classify")
      scored.select(col("id1"), col("id2"), col("agree_name"),
        col("agree_nation"), col("agree_segment"), col("agree_acctbal"),
        col("match_weight"), col("classification"))
        .orderBy("id1")
    })

  /** Encoding-damage detection ([[graft.ops.TextOps.mojibakeCount]]):
    * the corpus is deterministically corrupted in three styles both
    * engines replay — UTF-8-as-Latin-1 (every 'e' → 'Ã©' on the %7
    * shard), a trailing replacement character (%11 shard), raw text
    * otherwise — and the fingerprint count plus clean verdict are
    * hash-checked. The pattern string is shared verbatim with the
    * oracle; `\x{..}` escapes parse identically in Java regex and RE2,
    * and no alternative shares a leading character, so both engines
    * count the same non-overlapping matches. */
  val txtMojibake: Q = Q(
    "txt_mojibake",
    Some {
      val pat = graft.ops.TextOps.MojibakePattern
      s"""
      WITH c AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©')
            WHEN doc_id % 11 = 0 THEN text || '�'
            ELSE text END AS t
        FROM documents)
      SELECT doc_id, len(regexp_extract_all(t, '$pat')) AS n_mojibake,
        len(regexp_extract_all(t, '$pat')) = 0 AS clean
      FROM c ORDER BY doc_id"""
    },
    (s, dir) => {
      import graft.ops.TextOps
      val corrupted = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            regexp_replace(col("text"), "e", "Ã©"))
            .when(col("doc_id") % 11 === 0, concat(col("text"), lit("�")))
            .otherwise(col("text")).as("t"))
      val out = corrupted
        .select(col("doc_id"),
          TextOps.mojibakeCount(col("t")).cast("long").as("n_mojibake"))
        .withColumn("clean", col("n_mojibake") === 0)
      // the planted corruption must actually trip the detector (an
      // always-zero regexp would hash-match a clean corpus): every %7
      // doc whose text carries an 'e' gained at least one fingerprint
      val missed = corrupted
        .filter(col("doc_id") % 7 === 0 && col("t").contains("Ã©"))
        .join(out.filter(col("clean")), Seq("doc_id"), "left_semi").count()
      require(missed == 0, s"$missed Latin-1-corrupted docs read as clean")
      out.orderBy("doc_id")
    })

  val txtUnigramLogprob: Q = Q(
    "txt_unigram_logprob",
    Some("""
      WITH d AS (
        SELECT doc_id, list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\s+') END, x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS t FROM d),
      v AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      s AS (SELECT (SELECT count(*) FROM tok) AS tt, (SELECT count(*) FROM v) AS vs),
      sc AS (
        SELECT tok.doc_id, avg(ln((COALESCE(v.c, 0) + 1.0) / (tt + vs))) AS lp
        FROM tok LEFT JOIN v USING (t), s
        GROUP BY tok.doc_id)
      SELECT d.doc_id, len(d.w) AS n_tokens,
        ROUND(COALESCE(sc.lp, 0.0), 6) AS logprob
      FROM d LEFT JOIN sc USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, dir) =>
      graft.ops.LanguageModel
        .selfScore(Tables.load(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"))

  /** BPE-ish piece counts next to whitespace counts: both engines extract
    * the same RE2-safe pre-tokenizer pattern, so the piece lists (first 5
    * shown) and counts are byte-identical. */
  val txtBpeTokens: Q = Q(
    "txt_bpe_tokens",
    Some {
      // DuckDB string literals are not backslash-escaped; only the
      // pattern's own single quotes (contractions) need doubling
      val pat = TextOps.BpePiecePattern.replace("'", "''")
      s"""
      SELECT doc_id,
        len(regexp_extract_all(text, '$pat')) AS n_pieces,
        CASE WHEN length(trim(text)) = 0 THEN 0
          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
        array_to_string(regexp_extract_all(text, '$pat')[1:5], '|') AS head_pieces
      FROM documents
      ORDER BY doc_id"""
    },
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.bpeTokenCount(col("text")).as("n_pieces"),
          TextOps.tokenCount(col("text")).as("n_words"),
          concat_ws("|", slice(TextOps.bpePieces(col("text")), 1, 5)).as("head_pieces"))
        .orderBy("doc_id"))

  /** REAL byte-level BPE over the checked-in merges fixture
    * ([[graft.functions.Bpe]]) — actual pair merges, not the pre-split
    * estimate of `txt_bpe_tokens`. PROMOTED to oracle-checked (r18, the
    * mnt_token_export replay ridden to PER-DOCUMENT resolution): DuckDB
    * re-derives every document's FULL id sequence itself — the
    * recursive merge replay tokenizes each distinct piece, then each
    * document's ordered piece list maps through the replayed
    * symbol→id table and flattens (BPE's lossless pre-split means
    * encode(doc) is exactly the concatenation of encode(piece) over
    * the doc's pieces) — so n_bpe_tokens and the head-8 id string are
    * both independently rebuilt, not just hashed back. The in-gate
    * self-asserts stay:
    *  - PINNED literals: encodings of fixed strings (incl. multi-byte
    *    UTF-8) must byte-match the values recorded when the fixture was
    *    trained (tools/BpeTrain prints them) — fixture drift dies loudly;
    *  - BIJECTIVITY, distributed: decode(encode(text)) == text for EVERY
    *    document in the table (byte-level BPE is lossless by
    *    construction; one extra count() verifies it end to end). */
  val txtBpeReal: Q = Q(
    "txt_bpe_real",
    Some {
      val bpePat = TextOps.BpePiecePattern.replace("'", "''")
      val losslessPat =
        graft.functions.Bpe.LosslessSplitPattern.replace("'", "''")
      bpeReplayPrelude + s""",
      docp AS (
        SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i
        FROM (SELECT doc_id, regexp_extract_all(text, '$losslessPat') AS ps
              FROM documents)),
      docids AS (
        SELECT d.doc_id, d.i,
          list_transform(f.syms, s -> map_extract(sm.m, s)[1]) AS ids
        FROM (SELECT doc_id, i, ps[i] AS piece FROM docp) d
        JOIN final f USING (piece), sm),
      flat AS (
        SELECT doc_id, flatten(list(ids ORDER BY i)) AS allids
        FROM docids GROUP BY doc_id)
      SELECT dd.doc_id,
        CAST(COALESCE(len(f.allids), 0) AS INT) AS n_bpe_tokens,
        len(regexp_extract_all(dd.text, '$bpePat')) AS n_presplit_pieces,
        COALESCE(array_to_string(list_transform(f.allids[1:8],
          x -> CAST(x AS VARCHAR)), ','), '') AS head_ids
      FROM documents dd LEFT JOIN flat f ON dd.doc_id = f.doc_id
      ORDER BY dd.doc_id"""
    },
    (s, dir) => {
      val tok = graft.functions.Bpe.fromResource()
      val pins: Seq[(String, Array[Int])] = Seq(
        "the fast table scan" ->
          Array(116, 104, 101, 270, 266, 116, 271, 97, 98, 108, 101, 290),
        "spark  join\nmerge" -> Array(115, 263, 107, 32, 32, 301, 10, 303),
        "a" -> Array(97),
        "naïve café 🚀" -> Array(110, 97, 195, 175, 118, 101, 267, 97,
          102, 195, 169, 32, 240, 159, 154, 128),
        "" -> Array.empty[Int])
      pins.foreach { case (t, ids) =>
        require(tok.encode(t).sameElements(ids),
          s"BPE fixture drift: '$t' -> ${tok.encode(t).mkString(",")}, " +
            s"pinned ${ids.mkString(",")}")
        require(tok.decode(ids) == t, s"BPE decode drift on pinned '$t'")
      }
      val d = Tables.load(s, dir, "documents")
      val withIds = d.select(col("doc_id"), col("text"),
        graft.functions.Bpe.encodeIds(s, col("text"), tok).as("ids"))
      val bad = withIds.filter(
        graft.functions.Bpe.decodeIds(s, col("ids"), tok) =!= col("text")).count()
      require(bad == 0, s"BPE roundtrip failed on $bad documents")
      withIds.select(col("doc_id"),
          size(col("ids")).as("n_bpe_tokens"),
          TextOps.bpeTokenCount(col("text")).as("n_presplit_pieces"),
          concat_ws(",", transform(slice(col("ids"), 1, 8),
            i => i.cast("string"))).as("head_ids"))
        .orderBy("doc_id")
    })

  /** Distributed BPE training, part 1 — the piece-count table
    * ([[graft.functions.Bpe.pieceCounts]]), the ONE corpus pass training
    * actually needs (the merge loop then runs on this vocabulary-sized
    * table, never the corpus). ORACLE-checked: both engines pre-split
    * with the same lossless RE2-safe pattern and count independently;
    * ties at the top-100 cut break on the piece's UTF-8 byte order (the
    * sort order both engines share). */
  val txtBpePieceCounts: Q = Q(
    "txt_bpe_piece_counts",
    Some {
      val pat = graft.functions.Bpe.LosslessSplitPattern.replace("'", "''")
      s"""
      WITH p AS (
        SELECT unnest(regexp_extract_all(text, '$pat')) AS piece
        FROM documents)
      SELECT piece, count(*) AS n FROM p
      GROUP BY piece
      ORDER BY n DESC, piece
      LIMIT 100"""
    },
    (s, dir) =>
      graft.functions.Bpe
        .pieceCounts(Tables.load(s, dir, "documents"), "text")
        .orderBy(col("n").desc, col("piece"))
        .limit(100))

  /** Distributed BPE training, part 2 — the merges table itself
    * ([[graft.functions.Bpe.trainOn]]: distributed piece counting, then
    * the deterministic driver merge loop over the bounded count table).
    * No SQL engine can express the merge loop, so the entry is rows-only
    * with a DIFFERENTIAL self-assert: an independent driver-side recount
    * (regex loop over collected texts — the tools/BpeTrain path) must
    * train to byte-identical merges. BpeSpec additionally pins that
    * trainOn reproduces the checked-in fixture from its recorded
    * provenance knobs. */
  val txtBpeTrain: Q = Q(
    "txt_bpe_train",
    None,
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val merges = graft.functions.Bpe.trainOn(docs, "text", maxMerges = 48)
      val splitter = java.util.regex.Pattern
        .compile(graft.functions.Bpe.LosslessSplitPattern)
      val local = scala.collection.mutable.HashMap.empty[String, Long]
      for (t <- docs.select("text").collect().map(_.getString(0))) {
        val m = splitter.matcher(t)
        while (m.find())
          local.updateWith(m.group())(c => Some(c.getOrElse(0L) + 1L))
      }
      val expect = graft.functions.Bpe.train(local.toMap, 48)
      require(merges.sameElements(expect),
        s"distributed training diverged from driver-side counting at rank " +
          merges.zip(expect).indexWhere { case (a, b) => a != b })
      require(merges.length == 48, s"training stopped at ${merges.length}/48")
      import s.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }.toSeq
        .toDF("rank", "left", "right")
        .orderBy("rank")
    })

  /** Mergeable Misra-Gries summary ([[graft.ops.HeavyHitters.summarize]]
    * / `merge` — the streaming-capable twin of the exact two-pass
    * txt_heavy_hitters) — PROMOTED to oracle-checked (r17, the
    * differential template): the sketch's counters are merge-order facts
    * with no SQL mirror, so the gate emits the EXACT side of the
    * contract — per guaranteed-hitter token (true count > n/(capacity+1),
    * both rebuilt by DuckDB from the corpus) the exact count and the two
    * COMPUTED sketch verdicts the oracle pins TRUE: the token is PRESENT
    * in the summary and its estimate sits inside [cnt − n/(cap+1), cnt].
    * Capacity drops 128 → 16 (below the vocabulary) so the eviction
    * path actually runs — at 128 the sketch was exact and the bound
    * clauses were vacuous — and the corpus gains two PLANTED heavy
    * hitters (the fixture's natural 31-token distribution is near
    * uniform at ~900±30, all under the bound): 'spark' ×3000 and
    * 'hadoop' ×2000 over uniform noise is exactly the skew MG exists to
    * find. The full-table bound asserts stay in-gate. */
  val txtMgSummary: Q = Q(
    "txt_mg_summary",
    Some("""
      WITH corpus AS (
        SELECT text FROM documents
        UNION ALL SELECT trim(repeat('spark ', 60)) FROM documents
          WHERE doc_id % 10 = 0
        UNION ALL SELECT trim(repeat('hadoop ', 40)) FROM documents
          WHERE doc_id % 10 = 5),
      tok AS (
        SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END) AS token
        FROM corpus),
      c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM tok GROUP BY token),
      n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
      SELECT token, cnt,
        TRUE AS present, TRUE AS within_bound
      FROM c, n
      WHERE cnt > n.n // 17
      ORDER BY cnt DESC, token"""),
    (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "documents")
      val docs = base.select(col("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 0)
          .select(trim(repeat(lit("spark "), 60)).as("text")))
        .unionByName(base.filter(col("doc_id") % 10 === 5)
          .select(trim(repeat(lit("hadoop "), 40)).as("text")))
      val sm = graft.ops.HeavyHitters.summarize(docs, "text", capacity = 16)
      val exact = docs
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val est = sm.counters.toSeq.toDF("token", "estimate")
      val joined = exact.join(est, Seq("token"), "left")
        .select(col("token"), col("cnt"),
          coalesce(col("estimate"), lit(0L)).as("estimate"))
      val violations = joined.filter(col("estimate") > col("cnt") ||
        col("cnt") - col("estimate") > lit(sm.maxError)).count()
      require(violations == 0, s"$violations tokens break the MG bound")
      val missed = joined.filter(col("cnt") > lit(sm.maxError) &&
        col("estimate") === 0).count()
      require(missed == 0, s"$missed guaranteed hitters absent")
      // the bound in n/(capacity+1) form (sm.maxError is the tighter
      // merge-time residual; the oracle can only rebuild the loose bound,
      // and the guarantee holds a fortiori under the tighter one)
      val n = exact.agg(sum(col("cnt"))).head().getLong(0)
      val bound = n / 17
      val out = joined.filter(col("cnt") > bound)
        .select(col("token"), col("cnt"),
          (col("estimate") > 0).as("present"),
          (col("estimate") <= col("cnt") &&
            col("cnt") - col("estimate") <= bound).as("within_bound"))
        .orderBy(col("cnt").desc, col("token"))
      require(out.filter(!col("present") || !col("within_bound")).isEmpty,
        "a guaranteed hitter is missing or outside the MG bound")
      require(out.count() >= 2,
        "the planted heavy hitters vanished — the gate went vacuous")
      out
    })

  /** Vocabulary-utilization histogram over real BPE ids
    * ([[graft.functions.Bpe.tokenFrequencies]]) — ORACLE-checked since
    * round 13: DuckDB re-tokenizes every distinct piece itself with a
    * recursive CTE that replays the checked-in merges fixture (embedded
    * as a map literal — model input, like the k-means centroid
    * literals). Each step merges the LEFTMOST occurrence of the
    * globally lowest-rank adjacent pair; equivalent to the canonical
    * left-to-right `mergeAll` pass because a merge only creates pairs
    * involving its output symbol, whose rules train strictly later (so
    * never outrank the current best), and destroys only pairs at rank ≥
    * best (a lower-ranked pair would have been chosen). The byte→
    * printable-symbol alphabet rides along as a 256-entry hex map
    * (deterministic spec constant). In-gate self-asserts stay:
    * CONSERVATION (histogram total == summed encoded length) and full
    * vocab coverage (every id exactly once, unused ids at n = 0). */
  /** The shared DuckDB BPE-replay prelude (WITH RECURSIVE ... final):
    * merges fixture + symbol alphabet as map literals, distinct-piece
    * extraction, and the leftmost-min-rank recursive encode (see
    * [[txtBpeTokenFreq]]'s scaladoc for the equivalence argument).
    * Gates append their own tails. */
  private[queries] lazy val bpeReplayPrelude: String =
    bpeReplayPreludeFor(graft.functions.Bpe.fromResource())

  /** The merge-replay WITH-RECURSIVE block for ANY tokenizer — the
    * truncated-vocab gate replays a PREFIX of the merge list through
    * the same machinery (BPE merges are rank-ordered, so a vocab-size
    * cut is exactly a merge-list prefix). `textSource` overrides the
    * corpus the distinct-piece table is extracted from (default: the
    * documents table) — the sentence-priced chunk gate replays over
    * SENTENCE substrings, whose boundary pieces differ from the parent
    * document's. */
  private[queries] def bpeReplayPreludeFor(
      tok: graft.functions.BpeTokenizer,
      textSource: String = "SELECT lang, text FROM documents"): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val pat = graft.functions.Bpe.LosslessSplitPattern.replace("'", "''")
    val mergePairs = tok.merges.zipWithIndex
      .map { case ((l, r), i) => (l + " " + r, i) }
    require(mergePairs.map(_._1).distinct.length == mergePairs.length,
      "duplicate merge pair in fixture — rank map would be ambiguous")
    // last-wins symbol -> id, mirroring the tokenizer's symbolId map
    val symToId = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (0 until 256).foreach(b => symToId(tok.symbolOf(b)) = b)
    tok.merges.zipWithIndex.foreach { case ((l, r), i) =>
      symToId(l + r) = 256 + i }
    val byteKeys = (0 until 256).map(b => q(f"$b%02X")).mkString(", ")
    val byteVals = (0 until 256).map(b => q(tok.symbolOf(b))).mkString(", ")
    val vocabRows = (0 until tok.vocabSize)
      .map(i => s"($i, ${q(tok.symbolOf(i))})").mkString(", ")
    s"""
      WITH RECURSIVE
      mm AS (SELECT map(
        [${mergePairs.map(p => q(p._1)).mkString(", ")}],
        [${mergePairs.map(_._2).mkString(", ")}]) AS m),
      sm AS (SELECT map(
        [${symToId.keys.map(q).mkString(", ")}],
        [${symToId.values.mkString(", ")}]) AS m),
      bm AS (SELECT map([$byteKeys], [$byteVals]) AS m),
      vocab(token_id, symbol) AS (VALUES $vocabRows),
      rawpieces AS (
        SELECT lang, unnest(regexp_extract_all(text, '$pat')) AS piece
        FROM ($textSource)),
      pieces AS (
        SELECT piece, count(*) AS cnt FROM rawpieces
        GROUP BY piece),
      hexed AS (SELECT piece, hex(encode(piece)) AS h FROM pieces),
      init AS (
        SELECT piece, list_transform(range(0, length(h) // 2),
          i -> map_extract(bm.m, substr(h, CAST(2 * i + 1 AS INT), 2))[1])
          AS syms
        FROM hexed, bm),
      rec AS (
        SELECT piece, syms FROM init
        UNION ALL
        SELECT piece,
          syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms
        FROM (
          SELECT piece, syms,
            list_position(rks, list_min(rks)) AS bi, list_min(rks) AS mn
          FROM (
            SELECT r.piece, r.syms,
              list_transform(range(1, len(r.syms)),
                i -> coalesce(map_extract(mm.m,
                  r.syms[i] || ' ' || r.syms[i+1])[1], 999999)) AS rks
            FROM rec r, mm))
        WHERE mn < 999999),
      final AS (
        SELECT piece, arg_min(syms, len(syms)) AS syms
        FROM rec GROUP BY piece)"""
  }

  /** Tokenizer surgery: the same corpus re-encoded under a TRUNCATED
    * vocab (merge-list prefix — BPE merges are rank-ordered, so a
    * vocab cut is exactly a prefix) — the sweep a tokenizer-sizing
    * decision reads. The oracle replays the 32-merge prefix through
    * the same recursive machinery; the gate asserts the monotonicity
    * contract (fewer merges can never produce fewer tokens) against
    * the full tokenizer per language. */
  val txtBpeTruncated: Q = {
    val TruncMerges = 32
    Q(
      "txt_bpe_truncated_fertility",
      Some(bpeReplayPreludeFor(new graft.functions.BpeTokenizer(
        graft.functions.Bpe.fromResource().merges.take(TruncMerges))) + """,
      plen AS (
        SELECT piece, len(syms) AS ntok,
          octet_length(encode(piece)) AS nbytes
        FROM final)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_pieces,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        round(CAST(SUM(ntok) AS BIGINT)
          / CAST(count(*) AS DOUBLE), 6) AS fertility,
        round(CAST(SUM(nbytes) AS BIGINT)
          / CAST(SUM(ntok) AS DOUBLE), 6) AS bytes_per_token
      FROM rawpieces JOIN plen USING (piece)
      GROUP BY lang ORDER BY lang"""),
      (s, dir) => {
        val full = graft.functions.Bpe.fromResource()
        val trunc = new graft.functions.BpeTokenizer(
          full.merges.take(TruncMerges))
        val docs = Tables.load(s, dir, "documents")
        def fert(tok: graft.functions.BpeTokenizer) =
          docs.select(col("lang"),
              graft.functions.Bpe.tokenCount(s, col("text"), tok)
                .cast("long").as("ntok"),
              TextOps.bpeTokenCount(col("text")).cast("long").as("npieces"),
              octet_length(col("text")).cast("long").as("nbytes"))
            .groupBy("lang")
            .agg(
              sum(col("npieces")).as("n_pieces"),
              sum(col("ntok")).as("n_tokens"),
              round(sum(col("ntok")) / sum(col("npieces")).cast("double"), 6)
                .as("fertility"),
              round(sum(col("nbytes")) / sum(col("ntok")).cast("double"), 6)
                .as("bytes_per_token"))
        val out = fert(trunc)
        val fullTok = fert(full).select(col("lang"),
          col("n_tokens").as("full_tokens"))
        val bad = out.join(fullTok, Seq("lang"))
          .filter(col("n_tokens") < col("full_tokens")).count()
        require(bad == 0,
          s"$bad languages got FEWER tokens from a truncated vocab — " +
            "monotonicity broken")
        out.orderBy("lang")
      })
  }

  val txtBpeTokenFreq: Q = Q(
    "txt_bpe_token_freq",
    Some(bpeReplayPrelude + """,
      toks AS (
        SELECT map_extract(sm.m, u.sym)[1] AS token_id, p.cnt
        FROM final f
        JOIN pieces p USING (piece), unnest(f.syms) AS u(sym), sm),
      counts AS (
        SELECT token_id, CAST(sum(cnt) AS BIGINT) AS n
        FROM toks GROUP BY token_id)
      SELECT v.token_id, v.symbol, COALESCE(c.n, 0) AS n
      FROM vocab v LEFT JOIN counts c USING (token_id)
      ORDER BY v.token_id"""),
    (s, dir) => {
      val tok = graft.functions.Bpe.fromResource()
      val docs = Tables.load(s, dir, "documents")
      val freq = graft.functions.Bpe.tokenFrequencies(s, docs, "text", tok)
      val total = freq.agg(sum("n")).head().getLong(0)
      val expect = docs
        .select(graft.functions.Bpe.tokenCount(s, col("text"), tok)
          .cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      require(total == expect,
        s"token conservation broken: histogram $total vs encoded $expect")
      require(freq.count() == tok.vocabSize,
        s"vocab coverage broken: ${freq.count()} rows vs ${tok.vocabSize}")
      freq.orderBy("token_id")
    })

  /** Per-language tokenizer fertility — BPE tokens per pre-split piece
    * and bytes per token, the standard "how well does this tokenizer
    * serve each language" table (a hot language with high fertility
    * burns context window; public metric from the multilingual-tokenizer
    * literature). Spark encodes with the real tokenizer; DuckDB
    * re-derives every piece's token count through the same recursive
    * replay as txt_bpe_token_freq and aggregates the per-document piece
    * multiset by language. The lossless split means per-language byte
    * mass equals the summed piece bytes. */
  val txtBpeFertility: Q = Q(
    "txt_bpe_fertility",
    Some(bpeReplayPrelude + """,
      plen AS (
        SELECT piece, len(syms) AS ntok,
          octet_length(encode(piece)) AS nbytes
        FROM final)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_pieces,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        round(CAST(SUM(ntok) AS BIGINT)
          / CAST(count(*) AS DOUBLE), 6) AS fertility,
        round(CAST(SUM(nbytes) AS BIGINT)
          / CAST(SUM(ntok) AS DOUBLE), 6) AS bytes_per_token
      FROM rawpieces JOIN plen USING (piece)
      GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val tok = graft.functions.Bpe.fromResource()
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("lang"),
          graft.functions.Bpe.tokenCount(s, col("text"), tok)
            .cast("long").as("ntok"),
          TextOps.bpeTokenCount(col("text")).cast("long").as("npieces"),
          octet_length(col("text")).cast("long").as("nbytes"))
        .groupBy("lang")
        .agg(
          sum(col("npieces")).as("n_pieces"),
          sum(col("ntok")).as("n_tokens"),
          round(sum(col("ntok")) / sum(col("npieces")).cast("double"), 6)
            .as("fertility"),
          round(sum(col("nbytes")) / sum(col("ntok")).cast("double"), 6)
            .as("bytes_per_token"))
        .orderBy("lang")
    })

  /** Keyed upsert/delete corpus maintenance ([[graft.ops.Upsert]]): lay out
    * the historical corpus bucket-partitioned, apply one batch of
    * replacements (doc_id%10=0), inserts (doc_id%10=8) and deletes
    * (doc_id%20=4), read the corpus back. The oracle computes the same
    * merge relationally — a hash match proves the copy-on-write bucket
    * rewrite preserves exactly the rows a full relational merge keeps. */
  val mntUpsert: Q = Q(
    "mnt_upsert_merge",
    Some("""
      WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
      upd AS (SELECT doc_id, 'v2 ' || text AS text FROM documents
              WHERE doc_id % 10 = 0 OR doc_id % 10 = 8)
      SELECT doc_id, text FROM hist
      WHERE doc_id % 10 <> 0 AND doc_id % 20 <> 4
      UNION ALL
      SELECT doc_id, text FROM upd
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val hist = docs.filter(col("doc_id") % 10 < 8)
      val upd = docs.filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 8)
        .select(col("doc_id"), concat(lit("v2 "), col("text")).as("text"))
      val dels = docs.filter(col("doc_id") % 20 === 4).select("doc_id")
      val path = java.nio.file.Files.createTempDirectory("graft-upsert")
        .toString + "/corpus"
      graft.ops.Upsert.writeKeyed(hist, "doc_id", path, nBuckets = 16)
      graft.ops.Upsert.upsert(s, path, upd, "doc_id", nBuckets = 16,
        deletes = Some(dels))
      graft.ops.Upsert.readKeyed(s, path)
        .select("doc_id", "text").orderBy("doc_id")
    })

  /** Deflate compressibility quality signal (Gopher/RefinedWeb lineage) as
    * a native codegen expression — rows-only (DuckDB has no deflate), with
    * the signal's defining ordering self-asserted on synthetic anchors:
    * repetitive text must compress far below natural prose, and
    * high-entropy text must sit near 1.0. CodegenSpec pins eval==codegen
    * parity and determinism. */
  val txtCompressionRatio: Q = Q(
    "txt_compression_ratio",
    // PROMOTED to oracle-checked (r17, the differential template):
    // Deflate byte counts are JDK facts with no SQL mirror, so the gate
    // emits the EXACT side (corpus volume + both planted-anchor text
    // lengths, rebuilt by DuckDB from the same constructions) plus the
    // COMPUTED compressibility verdicts the oracle pins TRUE — the
    // degenerate repetition crushes below 0.05, the high-entropy id
    // soup resists above 0.5, and the corpus ratios stay in (0, 1.1].
    // Per-doc ratios stay in-gate asserted.
    Some("""
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        CAST(length(repeat('a', 4000)) AS BIGINT) AS rep_anchor_chars,
        (SELECT CAST(length(string_agg(x, ' ' ORDER BY i)) AS BIGINT)
         FROM (SELECT i, printf('%08x', (i * 2654435761) % 100000000) AS x
               FROM (SELECT unnest(range(500)) AS i)))
          AS entropy_anchor_chars,
        TRUE AS repetition_crushes, TRUE AS entropy_resists,
        TRUE AS corpus_in_range"""),
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val entropyAnchor = Seq.tabulate(500)(i =>
        f"${(i * 2654435761L) % 100000000L}%08x").mkString(" ")
      val anchors = Seq(
        (-1L, "a" * 4000),                               // degenerate repetition
        (-2L, entropyAnchor))                            // high-entropy id soup
        .toDF("doc_id", "text")
      val out = docs.select(col("doc_id"), col("text"))
        .unionByName(anchors)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.compressionRatio(s, col("text")), 6)
            .as("compression_ratio"))
      val byId = out.filter(col("doc_id") < 0).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val crushes = byId(-1L) < 0.05
      require(crushes, s"repetition must crush: ${byId(-1L)}")
      val resists = byId(-2L) > 0.5
      require(resists, s"entropy must resist: ${byId(-2L)}")
      val corpus = out.filter(col("doc_id") >= 0)
        .agg(min("compression_ratio"), max("compression_ratio")).head()
      val inRange = corpus.getDouble(0) > 0.0 && corpus.getDouble(1) <= 1.1
      require(inRange, s"corpus ratios out of range: $corpus")
      Seq((docs.count(), 4000L, entropyAnchor.length.toLong,
          crushes, resists, inRange))
        .toDF("n_docs", "rep_anchor_chars", "entropy_anchor_chars",
          "repetition_crushes", "entropy_resists", "corpus_in_range")
    })

  /** Unicode-canonical text normalization (NFC → lower → whitespace
    * collapse → trim) — the cleaning pass that runs BEFORE any content
    * hashing (byte-different NFC forms dodge exact dedup and shingles).
    * Oracle-exact: DuckDB's nfc_normalize + the same explicit whitespace
    * class reproduce every byte. */
  val txtNormalize: Q = Q(
    "txt_normalize",
    Some("""
      SELECT doc_id,
        trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r\f]+', ' ', 'g')) AS text_norm
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.GraftFunctions.normalizeText(s, col("text")).as("text_norm"))
        .orderBy("doc_id"))

  /** End-to-end in-engine text classification with NO vocabulary state:
    * [[graft.ops.Features.hashedBow]] (hashing-trick bag of words) →
    * [[graft.stats.Logistic]] IRLS fit → codegen'd scoring — the 100 TB
    * vectorizer path, since hashing needs no dictionary pass or
    * broadcast. The synthetic documents' `lang` column is random metadata
    * (every language draws from the same token pool — verified, ~0.56
    * ceiling), so the gate builds a label that IS a function of the text:
    * original documents vs their token-reversed twins. Real words and
    * reversed words hash to different buckets, so the fit must recover
    * ≥ 0.9 in-sample accuracy or the gate fails. dim = 8 keeps the IRLS
    * moment pass at ~60 aggregate terms (d² grows the Hessian — the
    * documented cost knob). Rows-only: IRLS has no SQL mirror. */
  val txtHashClassifier: Q = Q(
    "txt_hash_classifier",
    Some("""
      WITH rv AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN '' ELSE
            array_to_string(list_transform(
              regexp_split_to_array(trim(text), '\s+'),
              t -> reverse(t)), ' ') END AS rtext,
          CASE WHEN length(trim(text)) = 0 THEN '' ELSE
            array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')
            END AS ntext
        FROM documents)
      SELECT CAST(count(*) AS BIGINT) AS n_orig,
        CAST(count(*) AS BIGINT) AS n_reversed,
        CAST(SUM(CASE WHEN rtext = ntext THEN 1 ELSE 0 END) AS BIGINT)
          AS n_ambiguous,
        TRUE AS acc_floor_met, TRUE AS converged
      FROM rv"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val reversed = docs.select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ",
          transform(TextOps.tokens(col("text")), t => reverse(t))).as("text"))
      val corpus = docs.withColumn("is_orig", lit(1.0))
        .unionByName(reversed.withColumn("is_orig", lit(0.0)))
      val (df, feats) = graft.ops.Features.hashedBow(corpus, "text", dim = 8)
      val fit = graft.stats.Logistic.fit(df, feats, col("is_orig"),
          lambda = 1e-3)
        .getOrElse(sys.error("logistic fit produced no model"))
      require(fit.converged,
        s"IRLS did not converge in ${fit.iterations} iterations")
      val scored = df.select(col("doc_id"), col("is_orig"),
        round(fit.score(feats.map(_._2)), 6).as("orig_score"))
      val acc = scored
        .agg(avg(((col("orig_score") >= 0.5) === (col("is_orig") === 1.0))
          .cast("double"))).head().getDouble(0)
      require(acc >= 0.9,
        s"hashed-BoW classifier separates poorly: accuracy $acc")
      // PROMOTED (r17, the differential template): the IRLS weights are
      // iterative facts with no SQL mirror, so the hashed output is the
      // EXACT side — class volumes and the irreducible-ambiguity count
      // (docs whose token-reversed form equals their normalized form —
      // all-palindrome tokens), each rebuilt by DuckDB from the same
      // reversed-corpus arithmetic — plus the accuracy-floor and
      // convergence verdicts pinned TRUE. Scores stay in-gate.
      val ambiguous = docs.filter(
        concat_ws(" ", transform(TextOps.tokens(col("text")),
          t => reverse(t))) ===
          concat_ws(" ", TextOps.tokens(col("text")))).count()
      import s.implicits._
      Seq((docs.count(), reversed.count(), ambiguous, acc >= 0.9,
          fit.converged))
        .toDF("n_orig", "n_reversed", "n_ambiguous", "acc_floor_met",
          "converged")
    })

  /** Shared body of the retrieval-chunking gates: pack, then enforce the
    * three clauses that fully characterize greedy sentence packing —
    * (1) conservation: the whitespace-token SEQUENCE of the chunks equals
    * the document's, (2) budget: only single-sentence chunks may exceed
    * `maxUnits`, (3) greedy maximality: no chunk could have absorbed the
    * next chunk's first sentence. Together these pin the semantics as
    * tightly as a SQL oracle would (the fold itself has no SQL mirror). */
  private def sentenceChunkGate(
      s: org.apache.spark.sql.SparkSession, dir: String, maxUnits: Int,
      unitCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      corpus: Option[DataFrame] = None) = {
    val docs = corpus.getOrElse(
      Tables.load(s, dir, "documents").select("doc_id", "text"))
    val packed = docs.withColumn("chunks",
      TextOps.packSentencesBy(col("text"), maxUnits, unitCount))
    val drift = packed.filter(
      flatten(transform(col("chunks"), ch => TextOps.tokens(ch.getField("text"))))
        =!= TextOps.tokens(col("text"))).count()
    require(drift == 0, s"chunking dropped/reordered words in $drift docs")
    val ex = packed
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_ix", "ch")))
    val over = ex.filter(col("ch.n_units") > maxUnits &&
      col("ch.n_sents") > 1).count()
    require(over == 0, s"$over multi-sentence chunks exceed the budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_ix")
    val lazyPacks = ex
      .withColumn("next_first", lead(col("ch.first_n"), 1).over(w))
      .filter(col("next_first").isNotNull &&
        col("ch.n_units") + col("next_first") <= maxUnits).count()
    require(lazyPacks == 0,
      s"$lazyPacks chunks are not greedily maximal")
    ex.select(col("doc_id"), col("chunk_ix"),
        col("ch.n_units").as("n_units"), col("ch.n_sents").as("n_sents"),
        col("ch.text").as("chunk"))
      .orderBy("doc_id", "chunk_ix")
  }

  /** Retrieval chunking priced in whitespace tokens
    * ([[graft.ops.TextOps.packSentences]]) — PROMOTED to oracle-checked
    * (r17): the greedy fold is sequential per document, which is exactly
    * what a DuckDB RECURSIVE CTE replays — both engines compose the same
    * multi-sentence corpus (the fixture has no sentence delimiters, so
    * substring pieces are joined with '. '/'! '/'? ' — r16 bench-hygiene
    * note), split it with the same delimiter regex, and the oracle walks
    * the sentence list one step per recursion level, reproducing every
    * chunk boundary, unit count, and the space-joined chunk text. The
    * three in-gate clauses (conservation, budget, greedy maximality)
    * stay. */
  val txtSentenceChunks: Q = Q(
    "txt_sentence_chunks",
    Some("""
      WITH RECURSIVE
      d AS (
        SELECT doc_id,
          substr(text, 1, 80) || '. ' || substr(text, 81, 80) || '! '
            || substr(text, 161, 80) || '? ' || substr(text, 241, 80)
            || '. ' || substr(text, 321, 80) || '! '
            || substr(text, 401, 80) || '? ' || substr(text, 481, 100000)
            AS text
        FROM documents),
      sx AS (
        SELECT doc_id,
          list_filter(
            list_transform(
              string_split(regexp_replace(text, '([.!?]+)\s+',
                '\1' || chr(2), 'g'), chr(2)),
              p -> regexp_replace(p, '^\s+|\s+$', '', 'g')),
            p -> length(p) > 0) AS ss
        FROM d),
      r AS (
        SELECT doc_id, ss, 1 AS i, 1 AS cix,
          len(regexp_split_to_array(ss[1], '\s+')) AS run
        FROM sx WHERE len(ss) >= 1
        UNION ALL
        SELECT doc_id, ss, i + 1,
          CASE WHEN run + len(regexp_split_to_array(ss[i + 1], '\s+')) > 48
            THEN cix + 1 ELSE cix END,
          CASE WHEN run + len(regexp_split_to_array(ss[i + 1], '\s+')) > 48
            THEN len(regexp_split_to_array(ss[i + 1], '\s+'))
            ELSE run + len(regexp_split_to_array(ss[i + 1], '\s+')) END
        FROM r WHERE i < len(ss))
      SELECT doc_id, CAST(cix - 1 AS INT) AS chunk_ix,
        CAST(max(run) AS INT) AS n_units,
        CAST(count(*) AS INT) AS n_sents,
        string_agg(ss[i], ' ' ORDER BY i) AS chunk
      FROM r GROUP BY doc_id, cix
      ORDER BY doc_id, chunk_ix"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val composed = docs.select(col("doc_id"),
        concat(
          substring(col("text"), 1, 80), lit(". "),
          substring(col("text"), 81, 80), lit("! "),
          substring(col("text"), 161, 80), lit("? "),
          substring(col("text"), 241, 80), lit(". "),
          substring(col("text"), 321, 80), lit("! "),
          substring(col("text"), 401, 80), lit("? "),
          substring(col("text"), 481, 100000)).as("text"))
      sentenceChunkGate(s, dir, maxUnits = 48,
        c => TextOps.tokenCount(c), corpus = Some(composed))
    })

  /** Retrieval chunking priced in REAL BPE tokens (the checked-in
    * tokenizer fixture) — budget-faithful windows for an embedding model
    * with a hard context limit; same three-clause contract as
    * txt_sentence_chunks. PROMOTED to oracle-checked (r18): the greedy
    * fold replays as the same RECURSIVE CTE as the whitespace-priced
    * twin, but each sentence's unit count is its REAL BPE token count,
    * which DuckDB re-derives itself — the merge replay runs over the
    * SENTENCE corpus (boundary pieces differ from the parent document's,
    * so the distinct-piece table is extracted from the split sentences,
    * the `textSource` override) and a sentence's count is the summed
    * replayed piece lengths (the lossless pre-split makes encode(sent)
    * exactly the concat of encode(piece)). Same composed multi-sentence
    * corpus as the twin (the fixture has no delimiters); budget 160 BPE
    * tokens ≈ 2–3 of the ~80-char sentences, so multi-sentence packing
    * and boundary decisions are genuinely exercised. Every chunk
    * boundary, BPE unit count, and chunk text is hash-pinned; the three
    * in-gate clauses stay. */
  val txtSentenceChunksBpe: Q = {
    val sentSource = """
      SELECT lang, sent AS text FROM (
        SELECT lang, unnest(list_filter(list_transform(
          string_split(regexp_replace(ctext, '([.!?]+)\s+',
            '\1' || chr(2), 'g'), chr(2)),
          p -> regexp_replace(p, '^\s+|\s+$', '', 'g')),
          p -> length(p) > 0)) AS sent
        FROM (SELECT lang,
          substr(text, 1, 80) || '. ' || substr(text, 81, 80) || '! '
            || substr(text, 161, 80) || '? ' || substr(text, 241, 80)
            || '. ' || substr(text, 321, 80) || '! '
            || substr(text, 401, 80) || '? ' || substr(text, 481, 100000)
            AS ctext
          FROM documents))"""
    val losslessPat =
      graft.functions.Bpe.LosslessSplitPattern.replace("'", "''")
    Q(
      "txt_sentence_chunks_bpe",
      Some(bpeReplayPreludeFor(graft.functions.Bpe.fromResource(),
        sentSource) + raw""",
      plen AS (SELECT piece, len(syms) AS ntok FROM final),
      dd AS (
        SELECT doc_id,
          substr(text, 1, 80) || '. ' || substr(text, 81, 80) || '! '
            || substr(text, 161, 80) || '? ' || substr(text, 241, 80)
            || '. ' || substr(text, 321, 80) || '! '
            || substr(text, 401, 80) || '? ' || substr(text, 481, 100000)
            AS text
        FROM documents),
      sx AS (
        SELECT doc_id,
          list_filter(
            list_transform(
              string_split(regexp_replace(text, '([.!?]+)\s+',
                '\1' || chr(2), 'g'), chr(2)),
              p -> regexp_replace(p, '^\s+|\s+$$', '', 'g')),
            p -> length(p) > 0) AS ss
        FROM dd),
      sent AS (
        SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM sx),
      sentc AS (
        SELECT doc_id, i, CAST(COALESCE(SUM(p.ntok), 0) AS BIGINT) AS cnt
        FROM (SELECT doc_id, i,
                unnest(regexp_extract_all(ss[i], '$losslessPat')) AS piece
              FROM sent) sp
        JOIN plen p USING (piece)
        GROUP BY doc_id, i),
      sxc AS (
        SELECT sx.doc_id, sx.ss, l.cnts
        FROM sx JOIN (SELECT doc_id, list(cnt ORDER BY i) AS cnts
                      FROM sentc GROUP BY doc_id) l USING (doc_id)),
      r AS (
        SELECT doc_id, ss, cnts, 1 AS i, 1 AS cix, cnts[1] AS run
        FROM sxc WHERE len(ss) >= 1
        UNION ALL
        SELECT doc_id, ss, cnts, i + 1,
          CASE WHEN run + cnts[i + 1] > 160 THEN cix + 1 ELSE cix END,
          CASE WHEN run + cnts[i + 1] > 160 THEN cnts[i + 1]
            ELSE run + cnts[i + 1] END
        FROM r WHERE i < len(ss))
      SELECT doc_id, CAST(cix - 1 AS INT) AS chunk_ix,
        CAST(max(run) AS INT) AS n_units,
        CAST(count(*) AS INT) AS n_sents,
        string_agg(ss[i], ' ' ORDER BY i) AS chunk
      FROM r GROUP BY doc_id, cix
      ORDER BY doc_id, chunk_ix"""),
      (s, dir) => {
        val tok = graft.functions.Bpe.fromResource()
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val composed = docs.select(col("doc_id"),
          concat(
            substring(col("text"), 1, 80), lit(". "),
            substring(col("text"), 81, 80), lit("! "),
            substring(col("text"), 161, 80), lit("? "),
            substring(col("text"), 241, 80), lit(". "),
            substring(col("text"), 321, 80), lit("! "),
            substring(col("text"), 401, 80), lit("? "),
            substring(col("text"), 481, 100000)).as("text"))
        sentenceChunkGate(s, dir, maxUnits = 160,
          c => graft.functions.Bpe.tokenCount(s, c, tok),
          corpus = Some(composed))
      })
  }

  /** Unigram-LM tokenizer end to end ([[graft.ops.UnigramLm]], Kudo 2018
    * shape): ONE distributed word-count pass → driver EM → native
    * codegen'd Viterbi tokenization of the whole corpus. Rows-only (EM
    * has no SQL mirror), with the contract enforced distributed in-gate:
    * (1) losslessness — concat(pieces) rebuilds every document minus
    * whitespace; (2) closure — every multi-char piece is in the trained
    * vocabulary (single chars may be UNK floor pieces); (3) compression —
    * the corpus tokenizes to fewer pieces than characters. Output: the
    * top-50 piece frequencies. */
  val txtUnigramTokenize: Q = Q(
    "txt_unigram_tokenize",
    None,
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val m = graft.ops.UnigramLm.trainOn(docs, "text",
        vocabSize = 256, maxPieceLen = 6)
      val tokked = docs.select(col("doc_id"), col("text"),
        graft.ops.UnigramLm.tokenize(s, col("text"), m).as("pieces"))
      val lossy = tokked.filter(concat_ws("", col("pieces")) =!=
        regexp_replace(col("text"), "\\s+", "")).count()
      require(lossy == 0, s"unigram tokenization lossy on $lossy documents")
      import s.implicits._
      val stray = tokked.select(explode(col("pieces")).as("p")).distinct()
        .filter(length(col("p")) > 1)
        .join(m.logp.keySet.toSeq.toDF("p"), Seq("p"), "left_anti").count()
      require(stray == 0, s"$stray multi-char pieces outside the vocabulary")
      val agg = tokked.agg(
        sum(size(col("pieces"))).as("n_pieces"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).as("n_chars"))
        .head()
      require(agg.getAs[Long]("n_pieces") < agg.getAs[Long]("n_chars"),
        s"no compression: ${agg.getAs[Long]("n_pieces")} pieces for " +
          s"${agg.getAs[Long]("n_chars")} chars")
      tokked.select(explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("piece"))
        .limit(50)
    })

  /** Training-shard export ([[graft.report.TokenExport]]): every
    * document's REAL BPE ids land in int32-LE binary shards + a parquet
    * index, then the gate seeks every document back out of its shard
    * file and requires byte-exact ids — the full encode → shard →
    * mmap-read loop a trainer depends on. PROMOTED to oracle-checked
    * (r17, the differential template): the binary sink and the xxhash
    * shard routing have no SQL mirror, so the gate emits the EXACT side
    * — document volume and the corpus-total TOKEN MASS, which DuckDB
    * rebuilds by re-tokenizing every distinct piece itself through the
    * recursive BPE-merge replay (the txt_bpe_fertility machinery) —
    * plus the byte-roundtrip and index-completeness verdicts pinned
    * TRUE. Per-shard rows are xxhash facts and stay in-gate. */
  val mntTokenExport: Q = Q(
    "mnt_token_export",
    Some(bpeReplayPrelude + """,
      plen AS (SELECT piece, len(syms) AS ntok FROM final)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens_total,
        CAST(4 AS INT) AS n_shards,
        TRUE AS roundtrip_exact, TRUE AS index_complete
      FROM rawpieces JOIN plen USING (piece)"""),
    (s, dir) => {
      val tok = graft.functions.Bpe.fromResource()
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Bpe.encodeIds(s, col("text"), tok).as("ids"))
      val out = java.nio.file.Files.createTempDirectory("graft-tokexp")
      try {
        val index = graft.report.TokenExport.writeShards(
          s, docs, "doc_id", "ids", out.toString, nShards = 4)
        val expected = docs.collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](1)).toMap
        val idx = index.collect()
        require(idx.length == expected.size,
          s"index has ${idx.length} rows for ${expected.size} documents")
        idx.foreach { r =>
          val id = r.getAs[Long]("doc_id")
          val got = graft.report.TokenExport.readDoc(out.toString,
            r.getAs[String]("file"), r.getAs[Long]("offset"),
            r.getAs[Int]("n_tokens"))
          require(got.toSeq == expected(id),
            s"shard bytes drifted for doc $id")
        }
        // materialize BEFORE the finally deletes the index files the
        // summary plan reads from
        val summary = index.agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("n_tokens"))
          .head()
        val indexComplete = summary.getAs[Long]("n_docs") == expected.size
        require(indexComplete, "index row count drifted")
        import s.implicits._
        Seq((summary.getAs[Long]("n_docs"), summary.getAs[Long]("n_tokens"),
            4, true, indexComplete))
          .toDF("n_docs", "n_tokens_total", "n_shards",
            "roundtrip_exact", "index_complete")
      } finally graft.core.Fs.deleteRecursively(out)
    })

  /** Markup strip ([[graft.ops.TextOps.stripMarkup]]): both engines wrap
    * each document in the same synthetic HTML (attributes, a script block
    * with a raw `<` inside, a style block, and all six supported
    * entities) and strip it independently — byte parity over the full
    * cleaned corpus proves block removal, tag→space, entity decode order
    * (&amp; last), and whitespace collapse all agree. */
  val txtStripMarkup: Q = Q(
    "txt_strip_markup",
    Some("""
      WITH m AS (
        SELECT doc_id,
          '<div id="d' || CAST(doc_id AS VARCHAR) || '" class="x"><p>' || text
          || '</p><script type="text/javascript">if (1 < 2) { run(); }</script>'
          || '<style>p { color: red; }</style>&nbsp;<b>tail &amp;gt; &amp; &#39;q&#39; &lt; 2 &quot;z&quot;</b></div>'
          AS h
        FROM documents),
      s1 AS (SELECT doc_id, regexp_replace(h,
        '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS x FROM m),
      s2 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'g') AS x FROM s1),
      s3 AS (SELECT doc_id,
        replace(replace(replace(replace(replace(replace(x,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
          '&nbsp;', ' '), '&amp;', '&') AS x
        FROM s2)
      SELECT doc_id, trim(regexp_replace(x, '\s+', ' ', 'g')) AS clean
      FROM s3
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val marked = concat(
        lit("<div id=\"d"), col("doc_id").cast("string"),
        lit("\" class=\"x\"><p>"), col("text"),
        lit("</p><script type=\"text/javascript\">if (1 < 2) { run(); }</script>" +
          "<style>p { color: red; }</style>&nbsp;<b>tail &amp;gt; &amp; " +
          "&#39;q&#39; &lt; 2 &quot;z&quot;</b></div>"))
      docs.select(col("doc_id"), TextOps.stripMarkup(marked).as("clean"))
        .orderBy("doc_id")
    })

  /** Writing-system histogram ([[TextOps.scriptProfile]], the native
    * one-pass [[graft.functions.ScriptCounts]] expression) vs a DuckDB
    * mirror built from the SAME range table as per-bucket
    * regexp_replace strip-and-count — mixed-script text is planted by
    * suffixing a third of the docs with Cyrillic and a third with
    * CJK+Greek, so dominance flips and ties are exercised. */
  val txtScriptHistogram: Q = {
    import graft.functions.ScriptCounts
    val names = ScriptCounts.names
    val scriptNames = names.filterNot(_ == "digit")
    val countsSql = names.zipWithIndex.map { case (n, i) =>
      s"""CAST(length(regexp_replace(t2, '${ScriptCounts.negatedClassRegex(i)}',
          '', 'g')) AS INT) AS sc_$n"""
    }.mkString(",\n          ")
    val mSql = s"GREATEST(${scriptNames.map(n => s"sc_$n").mkString(", ")})"
    val domSql = scriptNames.map(n =>
      s"WHEN sc_$n = $mSql THEN '$n'").mkString("\n            ")
    Q(
      "txt_script_histogram",
      Some(s"""
        WITH t AS (
          SELECT doc_id,
            concat(text, CASE WHEN doc_id % 3 = 0 THEN ' привет мир 123'
                              WHEN doc_id % 3 = 1 THEN ' 你好世界 γειά'
                              ELSE '' END) AS t2
          FROM documents),
        c AS (
          SELECT doc_id,
          $countsSql
          FROM t)
        SELECT doc_id, ${names.map(n => s"sc_$n").mkString(", ")},
          ${names.map(n => s"sc_$n").mkString(" + ")} AS script_chars,
          CASE WHEN $mSql = 0 THEN 'none'
            $domSql
          END AS dominant_script
        FROM c
        ORDER BY doc_id"""),
      (s, dir) => {
        val suffixed = Tables.load(s, dir, "documents")
          .withColumn("t2", concat(col("text"),
            when(col("doc_id") % 3 === 0, " привет мир 123")
              .when(col("doc_id") % 3 === 1, " 你好世界 γειά")
              .otherwise("")))
        TextOps.scriptProfile(suffixed, "t2")
          .select((col("doc_id") +: names.map(n => col(s"sc_$n")) :+
            col("script_chars") :+ col("dominant_script")): _*)
          .orderBy("doc_id")
      })
  }

  /** Flesch–Kincaid readability ([[TextOps.readability]]): word /
    * sentence / syllable counts are exact integers mirrored
    * regex-for-regex (\z end anchors — $ differs between engines on
    * trailing newlines), the grade/ease formulas identical divisions. */
  val txtReadability: Q = Q(
    "txt_readability",
    Some(s"""
      WITH base AS (SELECT doc_id, text, $wSql AS w FROM documents),
      c AS (
        SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_words,
          GREATEST(CAST(1 AS BIGINT),
            CAST(len(regexp_extract_all(text, '[.!?]+(\\s|\\z)')) AS BIGINT))
            AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
            + CAST(len(list_filter(w,
                t -> NOT regexp_matches(lower(t), '[aeiouy]'))) AS BIGINT)
            AS n_syllables
        FROM base)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        CASE WHEN n_words > 0 THEN
          round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
            + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
        END AS fk_grade,
        CASE WHEN n_words > 0 THEN
          round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
            - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
        END AS fre
      FROM c
      ORDER BY doc_id"""),
    (s, dir) =>
      TextOps.readability(Tables.load(s, dir, "documents"), "text")
        .select("doc_id", "n_words", "n_sentences", "n_syllables",
          "fk_grade", "fre")
        .orderBy("doc_id"))

  /** Winnowing CTEs shared by both wn_* oracles: k = 8 char grams,
    * window w = 8, rightmost-min via (hash ASC, pos DESC) row_number —
    * the SQL mirror of [[graft.ops.Winnow]]'s struct-min on (h, −p). */
  private val wnCte = """
      g AS (
        SELECT doc_id, p,
          CAST(concat('0x', substr(md5(substr(text, p+1, 8)), 1, 8))
            AS BIGINT) AS h
        FROM (SELECT doc_id, text,
                unnest(range(0, GREATEST(length(text)-8+1, 0))) AS p
              FROM documents)),
      wcnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
      ws AS (
        SELECT doc_id, unnest(range(0, GREATEST(n-8, 0)+1)) AS s
        FROM wcnt),
      wm AS (
        SELECT ws.doc_id, ws.s, g.h, g.p,
          row_number() OVER (PARTITION BY ws.doc_id, ws.s
            ORDER BY g.h, g.p DESC) AS rn
        FROM ws JOIN g ON g.doc_id = ws.doc_id
          AND g.p BETWEEN ws.s AND ws.s + 7),
      wfp AS (SELECT DISTINCT doc_id, h, p FROM wm WHERE rn = 1)"""

  /** Every selected winnowing fingerprint of every document — both
    * engines derive the full (doc, hash, offset) set independently
    * ([[graft.ops.Winnow.fingerprints]]): Spark as one narrow doc-local
    * array expression, the oracle via an exploded window rank. */
  val wnFingerprints: Q = Q(
    "wn_fingerprints",
    Some(s"""
      WITH $wnCte
      SELECT doc_id, h, p FROM wfp ORDER BY doc_id, h, p"""),
    (s, dir) =>
      Winnow.fingerprints(Tables.load(s, dir, "documents"), "doc_id",
          "text", k = 8, w = 8)
        .orderBy("doc_id", "h", "p"))

  /** Document pairs sharing ≥ 8 winnowing fingerprints under the
    * 64-document posting cap ([[graft.ops.Winnow.overlapPairs]]). */
  val wnOverlapPairs: Q = Q(
    "wn_overlap_pairs",
    Some(s"""
      WITH $wnCte,
      dfp AS (SELECT DISTINCT doc_id, h FROM wfp),
      keep AS (SELECT h FROM dfp GROUP BY h HAVING count(*) <= 64),
      posted AS (SELECT dfp.doc_id, dfp.h FROM dfp JOIN keep USING (h))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        count(*) AS shared
      FROM posted a JOIN posted b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 8
      ORDER BY id_a, id_b"""),
    (s, dir) =>
      Winnow.overlapPairs(
          Winnow.fingerprints(Tables.load(s, dir, "documents"), "doc_id",
            "text", k = 8, w = 8),
          "doc_id", minShared = 8, maxPostings = 64)
        .orderBy("id_a", "id_b"))

  /** ChatML rendering ([[graft.ops.SftPrep.renderChat]]): every-third
    * document gets a system turn, the text becomes the user turn, the
    * reversed-token text stands in as the assistant turn — pure string
    * concatenation both engines rebuild byte-for-byte, including the
    * null-system drop and null-assistant poisoning. */
  val sftRenderChat: Q = Q(
    "sft_render_chat",
    Some(s"""
      WITH b AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'Be concise.' END AS sys,
          text AS usr,
          CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE array_to_string(list_reverse($wSql), ' ') END AS asst
        FROM documents)
      SELECT doc_id,
        CASE WHEN usr IS NULL OR asst IS NULL THEN NULL
          ELSE concat(
            CASE WHEN sys IS NULL THEN ''
              ELSE concat('<|im_start|>system', chr(10), sys, '<|im_end|>',
                chr(10)) END,
            '<|im_start|>user', chr(10), usr, '<|im_end|>', chr(10),
            '<|im_start|>assistant', chr(10), asst, '<|im_end|>', chr(10))
        END AS rendered
      FROM b ORDER BY doc_id"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, lit("Be concise.")).as("sys"),
          col("text").as("usr"),
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(array_join(reverse(TextOps.tokens(col("text"))), " "))
            .as("asst"))
      graft.ops.SftPrep.renderChat(d, col("sys"), col("usr"), col("asst"))
        .select("doc_id", "rendered")
        .orderBy("doc_id")
    })

  /** Preference pairs ([[graft.ops.SftPrep.preferencePairs]]): per
    * (lang, source) group the longest document is chosen, the shortest
    * rejected, margin-thresholded — the oracle mirrors both windows and
    * tie rules. */
  val sftPreferencePairs: Q = Q(
    "sft_preference_pairs",
    Some("""
      WITH base AS (
        SELECT lang || '|' || source AS g, doc_id AS id,
          CAST(n_chars AS DOUBLE) AS s
        FROM documents WHERE n_chars IS NOT NULL),
      rk AS (
        SELECT g, id, s,
          row_number() OVER (PARTITION BY g ORDER BY s DESC, id) AS rt,
          row_number() OVER (PARTITION BY g ORDER BY s ASC, id DESC) AS rb
        FROM base),
      best AS (SELECT g, id AS chosen_id, s AS chosen_score
               FROM rk WHERE rt = 1),
      worst AS (SELECT g, id AS rejected_id, s AS rejected_score
                FROM rk WHERE rb = 1)
      SELECT best.g, chosen_id, rejected_id, chosen_score, rejected_score,
        chosen_score - rejected_score AS margin
      FROM best JOIN worst USING (g)
      WHERE chosen_id != rejected_id
        AND chosen_score - rejected_score > 25.0
      ORDER BY g"""),
    (s, dir) =>
      graft.ops.SftPrep.preferencePairs(
          Tables.load(s, dir, "documents")
            .select(concat_ws("|", col("lang"), col("source")).as("g"),
              col("doc_id"), col("n_chars")),
          "g", "doc_id", "n_chars", minMargin = 25.0)
        .orderBy("g"))

  /** Per-eval-document contamination
    * ([[graft.ops.Decontaminate.evalContamination]]): every 50th
    * document plays the benchmark, the rest the training corpus; both
    * engines rebuild each eval item's distinct-trigram count, the count
    * found anywhere in the corpus, and the fraction. */
  val txtEvalContamination: Q = Q(
    "txt_eval_contamination",
    Some(s"""
      WITH t AS (SELECT doc_id, $wSql AS w FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS s
        FROM t),
      ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 50 = 0),
      evsh AS (SELECT eval_id, unnest(s) AS sg FROM ev),
      corp AS (SELECT DISTINCT unnest(s) AS sg FROM sh
               WHERE doc_id % 50 <> 0),
      hit AS (SELECT DISTINCT evsh.sg FROM evsh JOIN corp USING (sg)),
      cnt AS (
        SELECT eval_id, count(*) AS n,
          SUM(CASE WHEN hit.sg IS NOT NULL THEN 1 ELSE 0 END) AS h
        FROM evsh LEFT JOIN hit ON evsh.sg = hit.sg
        GROUP BY eval_id)
      SELECT ev.eval_id,
        CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_shingles,
        CAST(COALESCE(cnt.h, 0) AS BIGINT) AS n_contaminated,
        CASE WHEN COALESCE(cnt.n, 0) = 0 THEN 0.0
          ELSE CAST(cnt.h AS DOUBLE) / cnt.n END AS frac
      FROM ev LEFT JOIN cnt USING (eval_id)
      ORDER BY eval_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.ops.Decontaminate.evalContamination(
          docs.filter(col("doc_id") % 50 =!= 0), "text",
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 3)
        .withColumnRenamed("eval_id", "eval_id")
        .orderBy("eval_id")
    })

  /** Zipf rank-frequency fit + hapax share over the corpus vocabulary
    * ([[TextOps.zipfFit]]): the oracle rebuilds the frequency table,
    * the (count desc, token) rank, and the OLS moments term-for-term. */
  val txtZipfFit: Q = Q(
    "txt_zipf_fit",
    Some(s"""
      WITH t AS (SELECT $wSql AS w FROM documents),
      tok AS (SELECT unnest(w) AS t FROM t),
      cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      rk AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM cnt),
      xy AS (
        SELECT round(ln(CAST(r AS DOUBLE)), 9) AS x,
          round(ln(CAST(c AS DOUBLE)), 9) AS y, c
        FROM rk),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy,
          CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx,
          CAST(SUM(CAST(round(y * y, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS syy,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hap
        FROM xy),
      d AS (
        SELECT vocab, n_tokens, sx, sy, syy, hap,
          sxy - sx * sy / vocab AS cxy,
          sxx - sx * sx / vocab AS cxx,
          syy - sy * sy / vocab AS cyy
        FROM m)
      SELECT vocab, n_tokens,
        CASE WHEN cxx > 0 THEN round(cxy / cxx, 6) END AS slope,
        CASE WHEN cxx > 0 THEN
          round(sy / vocab - (cxy / cxx) * sx / vocab, 6) END AS intercept,
        CASE WHEN cxx > 0 AND cyy > 1e-9 * greatest(syy, CAST(1.0 AS DOUBLE)) THEN
          round(pow(cxy, 2) / (cxx * cyy), 6) END AS r2,
        round(CAST(hap AS DOUBLE) / vocab, 6) AS hapax_share
      FROM d"""),
    (s, dir) => {
      val out = TextOps.zipfFit(Tables.load(s, dir, "documents"), "text")
      val r = out.collect().head
      require(r.getAs[Double]("slope") < 0,
        "rank-frequency slope must be negative on any real vocabulary")
      out
    })

  /** Shared composite-curation prelude: Gopher+C4 rule verdicts (stage
    * 1 — each fragment cribbed from its own oracle-green gate,
    * txt_gopher_rules / txt_c4_rules, C4 over the same planted
    * multi-line composition because the raw fixture is single-line),
    * quality scores, rule+quality-gated fingerprint canonicality, and
    * eval-set contamination over the non-eval corpus — the SEQUENTIAL
    * funnel [[graft.ops.Curation]] runs, each stage reusing its
    * individually-gated oracle fragment. */
  private def curationPrelude: String = {
    val enList = TextOps.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
    s"""
      WITH t AS (
        SELECT doc_id, text, $wSql AS w FROM documents
        WHERE doc_id % 17 <> 3),
      gf AS (
        SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_words,
          CASE WHEN len(w) > 0 THEN
            round(CAST(list_sum(list_transform(w, t -> length(t)))
              AS DOUBLE) / len(w), 6) END AS mean_word_len,
          CASE WHEN len(w) > 0 THEN
            round(CAST((length(text) - length(replace(text, '#', '')))
              + (len(regexp_split_to_array(text, '\\.\\.\\.')) - 1)
              + (length(text) - length(replace(text, '…', '')))
              AS DOUBLE) / len(w), 6) END AS symbol_ratio,
          CASE WHEN len(w) > 0 THEN
            round(CAST(len(list_filter(w,
              t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
              / len(w), 6) END AS alpha_word_frac,
          CAST(len(list_filter(list_distinct(w), t -> t IN ($enList)))
            AS BIGINT) AS stopword_hits
        FROM t),
      gk AS (
        SELECT doc_id,
          COALESCE(n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1
            AND alpha_word_frac >= 0.8 AND stopword_hits >= 2, FALSE)
            AS gkeep
        FROM gf),
      cd AS (
        SELECT doc_id,
          concat_ws(chr(10),
            text || '.',
            'too short.',
            'this line has no terminal punctuation for doc '
              || CAST(doc_id AS VARCHAR),
            CASE WHEN doc_id % 5 = 0
              THEN 'this document contains lorem ipsum boilerplate text here.'
              WHEN doc_id % 7 = 0 THEN 'function() { return 1; }'
              ELSE 'a perfectly fine closing sentence appears right here.'
            END) AS ctext
        FROM t),
      ckp AS (
        SELECT doc_id, ctext,
          COALESCE(list_aggregate(list_transform(
            list_filter(
              list_filter(regexp_split_to_array(ctext, '\\n'),
                l -> length(trim(l)) > 0),
              l -> (ends_with(trim(l), '.') OR ends_with(trim(l), '?')
                OR ends_with(trim(l), '!') OR ends_with(trim(l), '"'))
                AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5),
            l -> trim(l)), 'string_agg', chr(10)), '') AS cleaned
        FROM cd),
      ck AS (
        SELECT doc_id,
          (NOT contains(lower(ctext), 'lorem ipsum'))
            AND (NOT contains(ctext, '{'))
            AND len(list_filter(regexp_split_to_array(cleaned, '[.!?]'),
              x -> length(trim(x)) > 0)) >= 2 AS ckeep
        FROM ckp),
      rl AS (
        SELECT gk.doc_id, gk.gkeep AND ck.ckeep AS rules_pass
        FROM gk JOIN ck USING (doc_id)),
      q AS (
        SELECT doc_id, text, w,
          ROUND(0.3 * least(1.0, len(w) / 100.0)
            + 0.4 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END)
            + 0.3 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_filter(w, t -> t IN ($enList)))
                  AS DOUBLE) / len(w) END), 6) AS quality
        FROM t),
      f AS (
        SELECT q.*, rl.rules_pass, quality >= 0.36 AS q_pass
        FROM q JOIN rl USING (doc_id)),
      fp AS (
        SELECT *, CASE WHEN rules_pass AND q_pass THEN
          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) END AS fpv
        FROM f),
      cn AS (
        SELECT doc_id, quality, rules_pass, q_pass, w,
          rules_pass AND q_pass AND doc_id
            = min(CASE WHEN rules_pass AND q_pass THEN doc_id END)
            OVER (PARTITION BY fpv) AS canonical
        FROM fp),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS s
        FROM t),
      bench AS (
        SELECT DISTINCT unnest(list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END)) AS sg
        FROM (SELECT $wSql AS w FROM documents WHERE doc_id % 17 = 3)),
      e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      ov AS (SELECT e.doc_id, count(*) AS overlap
             FROM e JOIN bench USING (sg) GROUP BY 1),
      ct AS (
        SELECT sh.doc_id,
          ROUND(CASE WHEN len(s) = 0 THEN 0.0
            ELSE CAST(COALESCE(ov.overlap, 0) AS DOUBLE) / len(s) END, 6)
            AS contam_frac
        FROM sh LEFT JOIN ov USING (doc_id)),
      flags AS (
        SELECT cn.doc_id AS id, cn.rules_pass, cn.quality, cn.q_pass,
          cn.canonical,
          ct.contam_frac, ct.contam_frac <= 0.2 AS clean,
          cn.rules_pass AND cn.q_pass AND cn.canonical
            AND ct.contam_frac <= 0.2 AS kept,
          CAST(len(cn.w) AS BIGINT) AS n_tokens
        FROM cn JOIN ct ON cn.doc_id = ct.doc_id)"""
  }

  /** Per-document curation stage flags ([[graft.ops.Curation.stageFlags]])
    * — quality floor 0.36 (fixture-calibrated: scores span 0.27-0.47), exact-dedup canonicality among survivors,
    * contamination cap 0.2 vs the doc_id%17=3 eval slice. */
  val pipeCurationFlags: Q = Q(
    "pipe_curation_flags",
    Some(curationPrelude + """
      SELECT id, rules_pass, quality, q_pass, canonical, contam_frac,
        clean, kept, n_tokens
      FROM flags ORDER BY id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 17 =!= 3)
      graft.ops.Curation.stageFlags(
          corpus, "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 3), "text",
          minQuality = 0.36, maxContamination = 0.2,
          ruleVerdicts = Some(curationRules(corpus)))
        .orderBy("id")
    })

  /** The stage-1 rule table the pipe gates feed
    * [[graft.ops.Curation.stageFlags]]: Gopher keep (en-marker stop
    * list — the fixture's function-word inventory) AND C4 keep over the
    * planted multi-line composition (the raw fixture is single-line, so
    * C4's line rules need the txt_c4_rules fixture shape). */
  private def curationRules(corpus: DataFrame): DataFrame = {
    val gop = graft.ops.QualityRules.gopherFlags(corpus, "doc_id", "text",
        stopwords = TextOps.LangMarkers.head._2)
      .select(col("doc_id").as("id"), col("keep").as("__g"))
    val composed = corpus.select(col("doc_id"),
      concat_ws("\n",
        concat(col("text"), lit(".")),
        lit("too short."),
        concat(lit("this line has no terminal punctuation for doc "),
          col("doc_id")),
        when(col("doc_id") % 5 === 0,
          lit("this document contains lorem ipsum boilerplate text here."))
          .when(col("doc_id") % 7 === 0,
            lit("function() { return 1; }"))
          .otherwise(
            lit("a perfectly fine closing sentence appears right here.")))
        .as("text"))
    val c4 = graft.ops.QualityRules.c4Clean(composed, "doc_id", "text",
        minSentences = 2)
      .select(col("doc_id").as("id"), col("keep").as("__c"))
    gop.join(c4, Seq("id"))
      .select(col("id"), (col("__g") && col("__c")).as("rules_pass"))
  }

  /** The one-row curation funnel ([[graft.ops.Curation.funnelReport]]) —
    * sequential survivor counts + kept token mass from one aggregation.
    * The gate requires each stage to be DISCRIMINATIVE on the fixture
    * (strictly shrinking funnel), so threshold drift is loud. */
  val pipeCurationFunnel: Q = Q(
    "pipe_curation_funnel",
    Some(curationPrelude + """
      SELECT CAST(count(*) AS BIGINT) AS n_input,
        CAST(COALESCE(SUM(CASE WHEN rules_pass THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS n_rules,
        CAST(COALESCE(SUM(CASE WHEN rules_pass AND q_pass THEN 1 ELSE 0
          END), 0) AS BIGINT) AS n_quality,
        CAST(COALESCE(SUM(CASE WHEN rules_pass AND q_pass AND canonical
          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dedup,
        CAST(COALESCE(SUM(CASE WHEN kept THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS n_clean,
        CAST(COALESCE(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END), 0)
          AS BIGINT) AS tokens_kept
      FROM flags"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 17 =!= 3)
      val out = graft.ops.Curation.funnelReport(
        graft.ops.Curation.stageFlags(
          corpus, "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 3), "text",
          minQuality = 0.36, maxContamination = 0.2,
          ruleVerdicts = Some(curationRules(corpus))))
      val r = out.head()
      val (ni, nr, nq, nd, nc) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      // the rule stage (planted %5 lorem / %7 brace + Gopher's word
      // floor), quality, and contamination must all bite; dedup passes
      // through monotonically (this fixture carries no exact whole-doc
      // duplicates — verified — so nd == nq here; OpsSpec pins the
      // dedup stage on a corpus that has them)
      require(ni > nr && nr > nq && nq >= nd && nd > nc && nc > 0,
        s"funnel not discriminative: $ni -> $nr -> $nq -> $nd -> $nc")
      out
    })

  /** Cross-document duplicated-3-gram fraction
    * ([[graft.ops.CrossDocNgrams.dupNgramFraction]]) — the corpus-level
    * repetition signal txt_repetition's within-doc score can't see; the
    * oracle rebuilds distinct per-doc 3-gram sets, the document-frequency
    * table, and the per-doc mean. */
  val txtDupNgramFraction: Q = Q(
    "txt_dup_ngram_fraction",
    Some("""
      WITH t AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
          ELSE list_transform(generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS s
        FROM t),
      e AS (SELECT doc_id, unnest(s) AS ngram FROM sh),
      dfq AS (SELECT ngram, count(*) AS df FROM e GROUP BY 1),
      pd AS (
        SELECT e.doc_id, count(*) AS n_ngrams,
          round(avg(CASE WHEN df >= 2 THEN 1.0 ELSE 0.0 END), 6) AS dup_frac
        FROM e JOIN dfq USING (ngram) GROUP BY 1)
      SELECT t.doc_id AS id, COALESCE(pd.n_ngrams, 0) AS n_ngrams,
        pd.dup_frac
      FROM t LEFT JOIN pd ON t.doc_id = pd.doc_id
      ORDER BY id"""),
    (s, dir) =>
      graft.ops.CrossDocNgrams
        .dupNgramFraction(Tables.load(s, dir, "documents"), "doc_id",
          "text", n = 3)
        .orderBy("id"))

  /** Shared Heaps-law prelude: tokens in engine-portable hash order of
    * the doc id, global 1-based token positions via a running length
    * sum (the oracle's window replays Spark's two-pass prefix scan),
    * first-occurrence position per word, geometric power-of-2 grid. */
  private val heapsPrelude: String = s"""
      WITH tk AS (
        SELECT doc_id, $wSql AS w,
          md5(concat_ws('|', 'graft-heaps', CAST(doc_id AS VARCHAR))) AS h
        FROM documents),
      o AS (
        SELECT doc_id, w,
          COALESCE(sum(len(w)) OVER (ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM tk),
      p AS (SELECT unnest(w) AS t,
              off + unnest(generate_series(1, len(w))) AS pos FROM o),
      f AS (SELECT t, min(pos) AS fp FROM p GROUP BY 1),
      tot AS (SELECT CAST(COALESCE(sum(len(w)), 0) AS BIGINT) AS total
              FROM tk),
      grid AS (
        SELECT DISTINCT n_prefix FROM (
          SELECT CAST(pow(2.0, g) AS BIGINT) AS n_prefix
          FROM (SELECT unnest(generate_series(1, 62)) AS g) gg, tot
          WHERE pow(2.0, g) < total
          UNION ALL SELECT total AS n_prefix FROM tot)
        WHERE n_prefix > 0),
      curve AS (
        SELECT g.n_prefix, count(*) AS vocab
        FROM f, grid g WHERE f.fp <= g.n_prefix GROUP BY 1)"""

  /** Vocabulary growth at the geometric token-count grid
    * ([[graft.ops.TextOps.heapsCurve]]) — first-occurrence positions
    * from a distributed prefix scan, never a global window. */
  val txtHeapsCurve: Q = Q(
    "txt_heaps_curve",
    Some(heapsPrelude + """
      SELECT n_prefix, vocab FROM curve ORDER BY n_prefix"""),
    (s, dir) =>
      TextOps.heapsCurve(Tables.load(s, dir, "documents"), "doc_id", "text"))

  /** Heaps' exponent fit over the growth curve
    * ([[graft.ops.TextOps.heapsFit]]): ln-ln OLS with the zipfFit
    * decimal-fold moments. Natural text lands β in (0, 1). */
  val txtHeapsFit: Q = Q(
    "txt_heaps_fit",
    Some(heapsPrelude + """,
      xy AS (
        SELECT round(ln(CAST(n_prefix AS DOUBLE)), 9) AS x,
          round(ln(CAST(vocab AS DOUBLE)), 9) AS y
        FROM curve),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_points,
          CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy,
          CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx,
          CAST(SUM(CAST(round(y * y, 9) AS DECIMAL(38,12))) AS DOUBLE)
            AS syy
        FROM xy),
      d AS (
        SELECT n_points, sx, sy, syy,
          sxy - sx * sy / n_points AS cxy,
          sxx - sx * sx / n_points AS cxx,
          syy - sy * sy / n_points AS cyy
        FROM m)
      SELECT n_points,
        CASE WHEN cxx > 0 THEN round(cxy / cxx, 6) END AS beta,
        CASE WHEN cxx > 0 THEN
          round(sy / n_points - (cxy / cxx) * sx / n_points, 6) END AS ln_k,
        CASE WHEN cxx > 0
            AND cyy > 1e-9 * greatest(syy, CAST(1.0 AS DOUBLE)) THEN
          round(pow(cxy, 2) / (cxx * cyy), 6) END AS r2
      FROM d"""),
    (s, dir) => {
      val out = TextOps.heapsFit(Tables.load(s, dir, "documents"),
        "doc_id", "text")
      val r = out.collect().head
      val beta = r.getAs[Double]("beta")
      require(beta > 0 && beta < 1,
        s"Heaps exponent must sit in (0,1) on natural-ish text, got $beta")
      out
    })

  /** TextRank keyword scores ([[graft.ops.TextRank.keywords]]):
    * PageRank over the adjacent-word co-occurrence graph — vertices are
    * the (vocabulary-bounded) tokens, undirected edges weighted by
    * adjacency counts, scores the damped stationary mass. Pure
    * composition of the bigram recipe and [[graft.ops.Graph.pageRank]],
    * so the oracle is the gr_pagerank unrolled recurrence rebuilt on
    * word vertices — same arithmetic form per iteration, both engines
    * rounding to 8 at the very end. In-gate: Σ rank = 1. */
  val txtTextrank: Q = {
    val iterCtes = (1 to 5).map { i =>
      val p = i - 1
      s"""
      d$i AS (SELECT COALESCE(SUM(r.rank), 0.0) AS mass
              FROM r$p r LEFT JOIN outd o ON r.node = o.src
              WHERE o.src IS NULL),
      c$i AS (SELECT e.dst AS node, SUM(r.rank * e.w / o.deg) AS c
              FROM r$p r
              JOIN outd o ON r.node = o.src
              JOIN edges e ON e.src = r.node
              GROUP BY e.dst),
      r$i AS (SELECT tele.node,
                (1.0 - 0.85) * tele.t
                  + 0.85 * (COALESCE(c.c, 0.0)
                    + (SELECT mass FROM d$i) * tele.t) AS rank
              FROM tele LEFT JOIN c$i c ON tele.node = c.node)"""
    }.mkString(",")
    Q(
      "txt_textrank",
      Some(s"""
      WITH d AS (
        SELECT CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS wa
        FROM documents),
      sh AS (
        SELECT CASE WHEN len(wa) < 2 THEN []
          ELSE list_transform(generate_series(1, len(wa) - 1),
            i -> wa[i] || ' ' || wa[i + 1]) END AS s
        FROM d),
      pr AS (
        SELECT split_part(bg, ' ', 1) AS a, split_part(bg, ' ', 2) AS b
        FROM (SELECT unnest(s) AS bg FROM sh)
        WHERE split_part(bg, ' ', 1) <> split_part(bg, ' ', 2)),
      edges AS (
        SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
        FROM (SELECT a AS src, b AS dst FROM pr
              UNION ALL SELECT b AS src, a AS dst FROM pr)
        GROUP BY src, dst),
      nodes AS (SELECT DISTINCT unnest(wa) AS node FROM d),
      tele AS (SELECT node,
          1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM nodes) AS t
        FROM nodes),
      outd AS (SELECT src, SUM(w) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT node, t AS rank FROM tele),$iterCtes
      SELECT node AS word, ROUND(rank, 8) AS textrank
      FROM r5
      ORDER BY word"""),
      (s, dir) => {
        val out = graft.ops.TextRank.keywords(
          Tables.load(s, dir, "documents"), "text")
        val total = out.agg(sum("rank")).head().getDouble(0)
        require(math.abs(total - 1.0) < 1e-9,
          s"keyword mass not conserved: $total")
        out.select(col("word"), round(col("rank"), 8).as("textrank"))
          .orderBy("word")
      })
  }

  /** Capture–recapture dedup-coverage estimate
    * ([[graft.ops.Dedup.captureRecapture]]): two independent
    * hash-seeded "detectors" over a planted duplicate population
    * (orderkey % 7); Chapman's estimator must recover the true
    * population inside its own 95% interval — asserted in-gate against
    * the planted truth, which neither detector sees. Counts are exact
    * integers; the estimate/CI are fixed double arithmetic with the
    * zQuantile literal, all replayed by the oracle. */
  val ddCoverageEstimate: Q = {
    val z = graft.stats.Experiment.zQuantile(0.975)
    Q(
      "dd_coverage_estimate",
      Some(s"""
        WITH pop AS (
          SELECT o_orderkey AS id
          FROM orders
          WHERE o_orderkey % 7 = 0),
        a AS (SELECT DISTINCT id FROM pop
          WHERE CAST(concat('0x', substr(md5(concat_ws('|', 'graft-cra',
            CAST(id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.6),
        b AS (SELECT DISTINCT id FROM pop
          WHERE CAST(concat('0x', substr(md5(concat_ws('|', 'graft-crb',
            CAST(id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.5),
        s AS (
          SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS na,
            CAST((SELECT count(*) FROM b) AS BIGINT) AS nb,
            CAST((SELECT count(*) FROM a JOIN b USING (id)) AS BIGINT)
              AS m),
        e AS (
          SELECT na, nb, m,
            (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0 AS est,
            sqrt((na + 1.0) * (nb + 1.0) * CAST(na - m AS DOUBLE)
              * (nb - m) / ((m + 1.0) * (m + 1.0) * (m + 2.0))) AS se
          FROM s)
        SELECT na AS n_a, nb AS n_b, m AS n_overlap,
          round(est, 6) AS est_total,
          round(GREATEST(est - CAST($z AS DOUBLE) * se,
            CAST(GREATEST(na, nb) AS DOUBLE)), 6) AS ci_lo,
          round(est + CAST($z AS DOUBLE) * se, 6) AS ci_hi
        FROM e"""),
      (s, dir) => {
        val pop = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("id"))
        val detA = pop.filter(graft.ops.Sampling
          .hashFraction("graft-cra", Seq(col("id"))) < 0.6)
        val detB = pop.filter(graft.ops.Sampling
          .hashFraction("graft-crb", Seq(col("id"))) < 0.5)
        val out = graft.ops.Dedup.captureRecapture(detA, detB, "id")
        val truth = pop.count()
        val r = out.head()
        require(r.getAs[Double]("ci_lo") <= truth &&
          truth <= r.getAs[Double]("ci_hi"),
          s"Chapman 95% CI [${r.getAs[Double]("ci_lo")}, " +
            s"${r.getAs[Double]("ci_hi")}] misses the planted truth " +
            s"$truth")
        out
      })
  }

  /** Chao1 richness + Good–Turing unseen mass
    * ([[graft.ops.TextOps.lexicalRichness]]): both estimators read off
    * exact integer frequency-of-frequencies, so the oracle replays them
    * bit-for-bit. In-gate: Chao1 ≥ observed vocabulary (the estimator
    * only ever adds undiscovered types). */
  /** Corpus keyness ([[graft.ops.CorpusOverlap.keynessTopK]]) between
    * the even- and odd-doc_id halves — the oracle replays the union
    * wordcount, the per-term 2-cell G², and the deterministic
    * (G DESC, term) cut. */
  val txtKeyness: Q = Q(
    "txt_keyness",
    Some("""
      WITH ta AS (
        SELECT token, 1 AS ca, 0 AS cb FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents
          WHERE doc_id % 2 = 0 AND length(trim(text)) > 0)
        WHERE token <> ''),
      tb AS (
        SELECT token, 0 AS ca, 1 AS cb FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents
          WHERE doc_id % 2 = 1 AND length(trim(text)) > 0)
        WHERE token <> ''),
      c AS (
        SELECT token, CAST(SUM(ca) AS BIGINT) AS ca,
          CAST(SUM(cb) AS BIGINT) AS cb
        FROM (SELECT * FROM ta UNION ALL SELECT * FROM tb)
        GROUP BY token),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      t AS (SELECT c.token, c.ca, c.cb, tot.na, tot.nb
        FROM c, tot WHERE ca + cb >= 10),
      g AS (
        SELECT token AS term, ca AS count_a, cb AS count_b,
          round(2.0 * (
            CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE)
              * ln(CAST(ca AS DOUBLE)
                / (CAST(ca + cb AS DOUBLE) * na / (na + nb)))
              ELSE 0.0 END +
            CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE)
              * ln(CAST(cb AS DOUBLE)
                / (CAST(ca + cb AS DOUBLE) * nb / (na + nb)))
              ELSE 0.0 END), 9) AS g_score,
          CASE WHEN CAST(ca AS DOUBLE) * nb > CAST(cb AS DOUBLE) * na
            THEN 'a' ELSE 'b' END AS direction
        FROM t)
      SELECT term, count_a, count_b, g_score, direction
      FROM g ORDER BY g_score DESC, term ASC LIMIT 25"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val out = graft.ops.CorpusOverlap.keynessTopK(
        d.filter(col("doc_id") % 2 === 0), "text",
        d.filter(col("doc_id") % 2 === 1), "text")
      val rows = out.collect()
      require(rows.nonEmpty &&
        rows.forall(_.getAs[Double]("g_score") >= 0.0),
        "G-squared is non-negative")
      out
    })

  /** Per-doc character-bigram entropy
    * ([[graft.ops.TextOps.charBigramEntropy]]) — the oracle replays the
    * in-plan substring bigram extraction, the exact (doc, gram) counts,
    * and the round-9 Σc·ln c fold. */
  val txtCharEntropy: Q = Q(
    "txt_char_entropy",
    Some("""
      WITH g AS (
        SELECT doc_id AS id,
          unnest(list_transform(generate_series(1, length(text) - 1),
            i -> substr(text, i, 2))) AS g
        FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
          AND length(text) >= 2),
      c AS (
        SELECT id, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM g GROUP BY id, g),
      e AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(SUM(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)),
            9) AS DECIMAL(38,12))) AS DOUBLE) AS sclc
        FROM c GROUP BY id)
      SELECT id, n_bigrams, n_distinct,
        round(ln(CAST(n_bigrams AS DOUBLE)) - sclc / n_bigrams, 6) + 0.0
          AS entropy
      FROM e ORDER BY id"""),
    (s, dir) => {
      val out = graft.ops.TextOps.charBigramEntropy(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      val rows = out.collect()
      require(rows.nonEmpty && rows.forall { r =>
        val h = r.getAs[Double]("entropy")
        h >= -1e-9 && h <= math.log(r.getAs[Long]("n_distinct")
          .toDouble) + 1e-9
      }, "entropy bounded by 0 and ln(distinct bigrams)")
      out
    })

  /** Vocabulary concentration ([[graft.ops.TextOps.vocabConcentration]]):
    * Yule's K, Simpson's D, and Herdan's C from the same exact
    * wordcount table as txt_chao1_richness — the oracle replays the
    * decimal Σc² fold and the three index formulas. */
  val txtYulesK: Q = Q(
    "txt_yules_k",
    Some("""
      WITH t AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
        WHERE length(trim(text)) > 0),
      c AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM t WHERE token <> '' GROUP BY token),
      f AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS v,
          CAST(SUM(c * c) AS DOUBLE) AS s2
        FROM c)
      SELECT n AS n_tokens, v AS vocab,
        round(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n), 6) + 0.0
          AS yules_k,
        round((s2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 6) + 0.0
          AS simpson_d,
        round(ln(CAST(v AS DOUBLE)) / ln(CAST(n AS DOUBLE)), 6) + 0.0
          AS herdan_c
      FROM f"""),
    (s, dir) => {
      val out = graft.ops.TextOps.vocabConcentration(
        Tables.load(s, dir, "documents"), "text")
      val r = out.head()
      require(r.getAs[Double]("yules_k") > 0.0 &&
        r.getAs[Double]("herdan_c") > 0.0 &&
        r.getAs[Double]("herdan_c") < 1.0,
        s"repeated types give K > 0 and lnV < lnN: $r")
      out
    })

  /** Term burstiness ([[graft.ops.TextOps.termBurstiness]]): top-20
    * cf/df-bursty terms with df ≥ 5 — the oracle replays the exact
    * (cf, df) pairs and the (burstiness DESC, token ASC) deterministic
    * cut. */
  val txtBurstiness: Q = Q(
    "txt_burstiness",
    Some("""
      WITH t AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
          AS token
        FROM documents
        WHERE length(trim(text)) > 0),
      c AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cf,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM t WHERE token <> '' GROUP BY token)
      SELECT token, cf, df,
        round(CAST(cf AS DOUBLE) / df, 6) + 0.0 AS burstiness
      FROM c WHERE df >= 5
      ORDER BY burstiness DESC, token ASC LIMIT 20"""),
    (s, dir) => {
      val out = graft.ops.TextOps.termBurstiness(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      val rows = out.collect()
      require(rows.length == 20 &&
        rows.forall(r => r.getAs[Double]("burstiness") >= 1.0),
        s"cf >= df always, and the corpus has >= 20 df-5 terms")
      out
    })

  val txtChao1: Q = Q(
    "txt_chao1_richness",
    Some("""
      WITH t AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
        WHERE length(trim(text)) > 0),
      c AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM t WHERE token <> '' GROUP BY token),
      f AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS vocab,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM c)
      SELECT n_tokens, vocab, f1, f2,
        CASE WHEN f2 > 0
          THEN round(vocab + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2), 6)
          ELSE round(vocab + CAST(f1 AS DOUBLE) * (f1 - 1)
            / (2.0 * (f2 + 1)), 6) END AS chao1,
        round(CAST(f1 AS DOUBLE) / n_tokens, 6) AS p_unseen
      FROM f"""),
    (s, dir) => {
      val out = graft.ops.TextOps.lexicalRichness(
        Tables.load(s, dir, "documents"), "text")
      val r = out.head()
      require(r.getAs[Double]("chao1") >= r.getAs[Long]("vocab"),
        s"Chao1 only ever adds undiscovered types: $r")
      out
    })

  /** Gopher document-quality rules ([[graft.ops.QualityRules
    * .gopherFlags]]): every per-document signal the paper thresholds
    * (word bounds, mean word length, symbol ratio, bullet/ellipsis line
    * fractions, alphabetic-word fraction, stop-list hits) plus the
    * composite keep — all replayed by DuckDB list functions. In-gate:
    * the corpus splits (both verdicts occur), and every verdict is
    * re-derivable from its own row's emitted signals. */
  val txtGopherRules: Q = Q(
    "txt_gopher_rules",
    Some(s"""
      WITH d AS (
        SELECT doc_id, text, $wSql AS w FROM documents),
      ln AS (
        SELECT doc_id,
          list_filter(regexp_split_to_array(text, '\\n'),
            l -> length(trim(l)) > 0) AS lines
        FROM d),
      f AS (
        SELECT d.doc_id,
          CAST(len(w) AS BIGINT) AS n_words,
          CASE WHEN len(w) > 0 THEN
            round(CAST(list_sum(list_transform(w, t -> length(t)))
              AS DOUBLE) / len(w), 6) END AS mean_word_len,
          CASE WHEN len(w) > 0 THEN
            round(CAST((length(text) - length(replace(text, '#', '')))
              + (len(regexp_split_to_array(text, '\\.\\.\\.')) - 1)
              + (length(text) - length(replace(text, '…', '')))
              AS DOUBLE) / len(w), 6) END AS symbol_ratio,
          CASE WHEN len(lines) > 0 THEN
            round(CAST(len(list_filter(lines,
              l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*')
                OR starts_with(trim(l), '•'))) AS DOUBLE)
              / len(lines), 6) END AS bullet_frac,
          CASE WHEN len(lines) > 0 THEN
            round(CAST(len(list_filter(lines,
              l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
              AS DOUBLE) / len(lines), 6) END AS ellipsis_frac,
          CASE WHEN len(w) > 0 THEN
            round(CAST(len(list_filter(w,
              t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
              / len(w), 6) END AS alpha_word_frac,
          CAST(len(list_filter(list_distinct(w), t -> t IN ('the', 'a',
            'and', 'of', 'to', 'in', 'is'))) AS BIGINT)
            AS stopword_hits
        FROM d JOIN ln ON d.doc_id = ln.doc_id)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        ellipsis_frac, alpha_word_frac, stopword_hits,
        COALESCE(n_words >= 50 AND n_words <= 100000
          AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          AND symbol_ratio <= 0.1
          AND COALESCE(bullet_frac <= 0.9, TRUE)
          AND COALESCE(ellipsis_frac <= 0.3, TRUE)
          AND alpha_word_frac >= 0.8 AND stopword_hits >= 2, FALSE)
          AS keep
      FROM f ORDER BY doc_id"""),
    (s, dir) => {
      // the synthetic corpus's function-word inventory is the en marker
      // list (only 'the' from the paper's own stop list occurs), so the
      // gate exercises the stop-word rule through the parameter
      val out = graft.ops.QualityRules.gopherFlags(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        stopwords = TextOps.LangMarkers.head._2)
        .orderBy("doc_id")
      if (Tables.gateMode) {
        val rows = out.collect()
        val kept = rows.count(_.getAs[Boolean]("keep"))
        require(kept > 0 && kept < rows.length,
          s"fixture must split on the rules: $kept of ${rows.length}")
        rows.foreach { r =>
          val want = r.getAs[Long]("n_words") >= 50 &&
            r.getAs[Long]("n_words") <= 100000 &&
            r.getAs[Double]("mean_word_len") >= 3.0 &&
            r.getAs[Double]("mean_word_len") <= 10.0 &&
            r.getAs[Double]("symbol_ratio") <= 0.1 &&
            r.getAs[Double]("bullet_frac") <= 0.9 &&
            r.getAs[Double]("ellipsis_frac") <= 0.3 &&
            r.getAs[Double]("alpha_word_frac") >= 0.8 &&
            r.getAs[Long]("stopword_hits") >= 2
          require(r.getAs[Boolean]("keep") == want,
            s"verdict must follow its own signals: $r")
        }
      }
      out
    })

  /** C4 line-and-document cleaning ([[graft.ops.QualityRules.c4Clean]])
    * over a PLANTED multi-line composition (the raw corpus is
    * single-line): line 1 = the doc text with terminal punctuation
    * (kept), a too-short line and an unterminated line (dropped), and a
    * closing sentence that is lorem-ipsum boilerplate on doc_id%5=0 and
    * a brace-bearing code line on doc_id%7=0. The oracle rebuilds the
    * composition, the line retention, the md5 of the cleaned text, and
    * the verdicts. In-gate: verdicts match the planted pattern exactly. */
  val txtC4Rules: Q = Q(
    "txt_c4_rules",
    Some("""
      WITH d AS (
        SELECT doc_id,
          concat_ws(chr(10),
            text || '.',
            'too short.',
            'this line has no terminal punctuation for doc '
              || CAST(doc_id AS VARCHAR),
            CASE WHEN doc_id % 5 = 0
              THEN 'this document contains lorem ipsum boilerplate text here.'
              WHEN doc_id % 7 = 0 THEN 'function() { return 1; }'
              ELSE 'a perfectly fine closing sentence appears right here.'
            END) AS text
        FROM documents),
      ln AS (
        SELECT doc_id, text,
          list_filter(regexp_split_to_array(text, '\n'),
            l -> length(trim(l)) > 0) AS lines
        FROM d),
      kp AS (
        SELECT doc_id, text, lines,
          list_filter(lines, l ->
            (ends_with(trim(l), '.') OR ends_with(trim(l), '?')
              OR ends_with(trim(l), '!') OR ends_with(trim(l), '"'))
            AND len(regexp_split_to_array(trim(l), '\s+')) >= 5) AS kept
        FROM ln),
      cl AS (
        SELECT doc_id, text, lines, kept,
          list_aggregate(list_transform(kept, l -> trim(l)),
            'string_agg', chr(10)) AS cleaned0
        FROM kp),
      cl2 AS (
        SELECT doc_id, text, lines, kept,
          COALESCE(cleaned0, '') AS cleaned
        FROM cl),
      f AS (
        SELECT doc_id,
          CAST(len(lines) AS BIGINT) AS n_lines,
          CAST(len(kept) AS BIGINT) AS n_lines_kept,
          CASE WHEN length(cleaned) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(len(regexp_split_to_array(cleaned, '\s+'))
              AS BIGINT) END AS n_words_kept,
          CAST(len(list_filter(regexp_split_to_array(cleaned, '[.!?]'),
            x -> length(trim(x)) > 0)) AS BIGINT) AS n_sentences,
          contains(lower(text), 'lorem ipsum') AS has_lorem,
          contains(text, '{') AS has_brace,
          md5(cleaned) AS cleaned_md5
        FROM cl2)
      SELECT doc_id, n_lines, n_lines_kept, n_words_kept, n_sentences,
        has_lorem, has_brace,
        (NOT has_lorem) AND (NOT has_brace) AND n_sentences >= 2 AS keep,
        cleaned_md5
      FROM f ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val composed = docs.select(col("doc_id"),
        concat_ws("\n",
          concat(col("text"), lit(".")),
          lit("too short."),
          concat(lit("this line has no terminal punctuation for doc "),
            col("doc_id")),
          when(col("doc_id") % 5 === 0,
            lit("this document contains lorem ipsum boilerplate text here."))
            .when(col("doc_id") % 7 === 0,
              lit("function() { return 1; }"))
            .otherwise(
              lit("a perfectly fine closing sentence appears right here.")))
          .as("text"))
      val out = graft.ops.QualityRules.c4Clean(composed, "doc_id", "text",
        minSentences = 2).orderBy("doc_id")
      if (Tables.gateMode) {
        val rows = out.collect()
        rows.foreach { r =>
          val id = r.getAs[Long]("doc_id")
          val want = id % 5 != 0 && id % 7 != 0
          require(r.getAs[Boolean]("keep") == want,
            s"verdict must match the planted %5/%7 pattern: $r")
          val wantKept = if (id % 7 == 0 && id % 5 != 0) 1L else 2L
          require(r.getAs[Long]("n_lines_kept") == wantKept &&
            r.getAs[Long]("n_lines") == 4L,
            s"line retention off the planted shape: $r")
        }
      }
      out
    })

  override def queries: Seq[Q] = Seq(
    txtGopherRules, txtC4Rules,
    txtYulesK, txtBurstiness, txtCharEntropy, txtKeyness,
    txtChao1,
    ddCoverageEstimate,
    txtTextrank,
    txtScriptHistogram, txtReadability, wnFingerprints, wnOverlapPairs,
    sftRenderChat, sftPreferencePairs, txtEvalContamination, txtZipfFit,
    txtHeapsCurve, txtHeapsFit, txtDupNgramFraction,
    pipeCurationFlags, pipeCurationFunnel,
    txtTokenStats, txtLangId, txtLangIdV2, txtQuality, txtCompressionRatio, txtNormalize, ddExact,
    ddParagraphDedup,
    ddJaccard, ddPrefixJaccard, ddMinhash, ddSimhash, ddClusterResolve, ddDedupCorpus, ddSpanRemoval,
    ddNoveltyExact, ddNoveltyBloom, ddNoveltyMinhash, txtChunks, txtRepetition, txtVocab,
    txtRedact, txtDecontaminate, txtDecontaminateBloom, txtBm25, txtBm25Indexed,
    txtTfidf,
    txtHeavyHitters, txtCorpusCard, erFuzzyCandidates, erJaroWinkler,
    erFellegiSunter, txtMojibake,
    ddContainment, ddDupAttribution, mntNoveltyByDay,
    mntGoldenRecords,
    txtLuhnValidate, txtLuhnRedact, txtUnigramLogprob,
    txtBigramLogprob, txtKneserNey, txtCcnetBuckets, txtCollocations,
    txtBpeTokens, txtBpeReal, txtBpePieceCounts,
    txtBpeTrain, txtBpeTokenFreq, txtBpeFertility, txtBpeTruncated,
    txtMgSummary, txtQualityClassifier,
    txtSentenceChunks, txtSentenceChunksBpe, txtStripMarkup, txtUnigramTokenize,
    mntTokenExport,
    txtHashClassifier, mntUpsert)
}
