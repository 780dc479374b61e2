package graft.queries

import graft.{Q, QueryModule}
import graft.catalog.{BucketedLayout, TableCatalog}
import graft.core.Filter._
import graft.query.CohortQuery
import graft.stats.FilterFunnel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-gate entries proving the cohort API is correct OVER THE BUCKETED
  * LAYOUT (round-8 verdict item 2): the same [[CohortQuery]] code paths the
  * plain-catalog entries exercise, but served from a
  * [[graft.catalog.BucketedLayout]]-backed [[TableCatalog]], so the star
  * join runs the zero-exchange regime the 100 TB design claims (measured
  * 2.3–5.5× in README §bucketed-layout crossover; plan shape pinned by
  * LayoutCohortSpec).
  *
  * The cohort data dir is [[CatalogQueries]]'s synthesized derivation
  * (customer → longitudinal demographics, orders → scores), so each oracle
  * reproduces the derivation in SQL over the original parquet — a pass
  * proves derive → CSV → bucketed parquet layout → cohort operator,
  * value-identical to DuckDB.
  */
object LayoutQueries extends QueryModule {

  private val layoutCats =
    scala.collection.concurrent.TrieMap[String, TableCatalog]()

  /** Layout-backed catalog over the synthesized cohort dir (one per sf dir;
    * shared across entries so the one-time bucketed write is paid once). */
  private def layoutCatalogFor(s: SparkSession, sfDir: String): TableCatalog =
    layoutCats.getOrElseUpdate(sfDir, {
      val (_, config) = CatalogQueries.cohort(s, sfDir)
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft_cohort_layout/$tag"
      new TableCatalog(s, config, Some(BucketedLayout(wh, 8, s"graft_lay_$tag")))
    })

  /** The cohort derivation as oracle CTEs (must mirror
    * [[CatalogQueries.cohort]] exactly): demographics = customer × sessions
    * {1,2}, scores = orders with session = o_orderkey % 2 + 1; customID =
    * the engine's derived composite `primary + '_' + session`. */
  private val cohortCte = """
      demo AS (
        SELECT CAST(c_custkey AS BIGINT) AS ursi,
               CAST(s.s AS BIGINT) AS session_num,
               c_acctbal AS age, c_mktsegment AS sex,
               'SITE_' || CAST(c_nationkey % 3 AS VARCHAR) AS study_site,
               CAST(c_custkey AS VARCHAR) || '_' || CAST(s.s AS VARCHAR) AS customID
        FROM customer, (SELECT 1 AS s UNION ALL SELECT 2) s),
      scores AS (
        SELECT o_totalprice AS score,
               CAST(o_custkey AS VARCHAR) || '_'
                 || CAST(o_orderkey % 2 + 1 AS VARCHAR) AS customID
        FROM orders)"""

  /** A1 over the layout: live COUNT(DISTINCT customID) through
    * [[CohortQuery.count]] with an age filter plus a phenotypic range on the
    * behavioral table (LEFT→INNER rewrite, J2). */
  val layCohortCount: Q = Q(
    "lay_cohort_count",
    Some(s"""
      WITH $cohortCte
      SELECT COUNT(DISTINCT d.customID) AS n_participants
      FROM demo d LEFT JOIN scores sc ON d.customID = sc.customID
      WHERE d.age BETWEEN 0 AND 5000 AND sc.score BETWEEN 1000 AND 200000"""),
    (s, dir) => {
      import s.implicits._
      val q = CohortQuery(layoutCatalogFor(s, dir),
        filters = Seq(
          AgeRange(0, 5000),
          NumericRange("scores", "score", 1000, 200000)))
      Seq(q.count()).toDF("n_participants")
    })

  /** P1–P4 over the layout: the merged data export ([[CohortQuery.data]])
    * with an age range + categorical filter and one selected behavioral
    * column — key columns first, demographics wide, selections appended. */
  val layCohortData: Q = Q(
    "lay_cohort_data",
    Some(s"""
      WITH $cohortCte
      SELECT d.customID, d.ursi, d.session_num, d.age, d.sex, d.study_site,
             sc.score
      FROM demo d LEFT JOIN scores sc ON d.customID = sc.customID
      WHERE d.age BETWEEN 0 AND 5000
        AND d.sex IN ('BUILDING', 'AUTOMOBILE')
      ORDER BY d.customID, sc.score NULLS FIRST"""),
    (s, dir) => {
      val q = CohortQuery(layoutCatalogFor(s, dir),
        filters = Seq(
          AgeRange(0, 5000),
          Categorical("demographics", "sex", Seq("BUILDING", "AUTOMOBILE"))),
        selections = Seq(("scores", "score")))
      q.data
        .select(col("customID"), col("ursi").cast("long"),
          col("session_num").cast("long"), col("age"), col("sex"),
          col("study_site"), col("score"))
        .orderBy(col("customID"), col("score"))
    })

  /** T7 over the layout: the one-scan cumulative funnel on a layout-backed
    * [[CohortQuery.basePlan]] (hub ⟕ scores, zero exchange). */
  val layFilterFunnel: Q = Q(
    "lay_filter_funnel",
    Some(s"""
      WITH $cohortCte,
      base AS (
        SELECT d.customID AS k, d.age, d.sex, sc.score
        FROM demo d LEFT JOIN scores sc ON d.customID = sc.customID),
      c0 AS (SELECT count(DISTINCT k) AS n FROM base),
      c1 AS (SELECT count(DISTINCT CASE WHEN age >= 0 THEN k END) AS n FROM base),
      c2 AS (SELECT count(DISTINCT CASE WHEN age >= 0
                AND sex IN ('BUILDING','AUTOMOBILE') THEN k END) AS n FROM base),
      c3 AS (SELECT count(DISTINCT CASE WHEN age >= 0
                AND sex IN ('BUILDING','AUTOMOBILE')
                AND score > 150000.0 THEN k END) AS n FROM base)
      SELECT 0 AS step, 'baseline' AS label, c0.n AS n, 0 AS removed, 0.0 AS removal_pct FROM c0
      UNION ALL
      SELECT 1, 'age_nonneg', c1.n, c0.n - c1.n,
        ROUND((c0.n - c1.n) * 1.0 / c0.n * 100.0, 4) FROM c0, c1
      UNION ALL
      SELECT 2, 'segment_in', c2.n, c1.n - c2.n,
        ROUND((c1.n - c2.n) * 1.0 / c1.n * 100.0, 4) FROM c1, c2
      UNION ALL
      SELECT 3, 'high_score', c3.n, c2.n - c3.n,
        ROUND((c2.n - c3.n) * 1.0 / c2.n * 100.0, 4) FROM c2, c3
      ORDER BY step"""),
    (s, dir) => {
      val base = CohortQuery(layoutCatalogFor(s, dir),
        selectedTables = Seq("scores")).basePlan
      val steps = FilterFunnel.funnel(base, "customID", Seq(
        "age_nonneg" -> (col("age") >= 0),
        "segment_in" -> col("sex").isin("BUILDING", "AUTOMOBILE"),
        "high_score" -> (col("score") > 150000.0)))
      FilterFunnel.toDF(s, steps)
        .select(col("step"), col("label"), col("n"), col("removed"),
          round(col("removalPct"), 4).as("removal_pct"))
        .orderBy("step")
    })

  /** Small-file compaction ([[graft.catalog.Layout.compact]]): shatter
    * `events` into 64 KB-scale files (the streaming-sink pathology),
    * compact to ~256 KB targets, and self-assert the three contract
    * clauses — content preserved (order-invariant xxhash64 fingerprint +
    * row count over every column), file count collapsed, every output
    * file within 2× target (parquet encoding variance). Rows-only:
    * filesystem maintenance has no SQL mirror; the output is the one-row
    * stats frame a maintenance log would record. */
  val mntCompact: Q = Q(
    "mnt_compact",
    None,
    (s, dir) => {
      val events = graft.Tables.load(s, dir, "events")
      val base = java.nio.file.Files.createTempDirectory("graft-compact")
        .toString
      val shattered = s"$base/in"
      val compacted = s"$base/out"
      events.repartition(64).write.parquet(shattered)
      def fingerprint(df: org.apache.spark.sql.DataFrame) = {
        // decimal sum: exact, order-invariant, ANSI-safe under overflow
        val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
        df.agg(sum(h.cast("decimal(38,0)")).as("fp"),
          count(lit(1)).as("n")).head()
      }
      val before = fingerprint(s.read.parquet(shattered))
      val target = 256L * 1024
      val stats = graft.catalog.Layout.compact(s, shattered, compacted,
        targetBytes = target)
      val after = fingerprint(s.read.parquet(compacted))
      require(before == after,
        s"compaction changed content: $before -> $after")
      val row = stats.head()
      require(row.getAs[Long]("files_after") < row.getAs[Long]("files_before"),
        s"compaction did not reduce file count: $row")
      require(row.getAs[Long]("n_rows") == after.getAs[Long]("n"),
        s"stats row count drift: $row vs $after")
      val sizes = graft.catalog.Layout.dataFiles(s, compacted).map(_._2)
      require(sizes.forall(_ <= 2 * target),
        s"output file exceeds 2x target: ${sizes.max}")
      stats
    })

  /** Corpus snapshot diff ([[graft.ops.CorpusDiff]]): both engines derive
    * the same two synthetic corpus versions (drops, edits, and appends
    * keyed off doc_id) and diff them independently — Spark compares
    * 8-byte map-side content hashes (the metadata-sized-shuffle design),
    * DuckDB compares the text itself; statuses agree unless xxhash64
    * collides (2^-64 per changed doc). */
  val mntCorpusDiff: Q = Q(
    "mnt_corpus_diff",
    Some("""
      WITH prev AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
      cur AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'v2 ' || text ELSE text END AS text
        FROM documents WHERE doc_id % 11 <> 5
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text
        FROM documents WHERE doc_id % 13 = 0)
      SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
        CASE WHEN p.doc_id IS NULL THEN 'added'
             WHEN c.doc_id IS NULL THEN 'removed'
             WHEN p.text = c.text THEN 'unchanged'
             ELSE 'changed' END AS status
      FROM prev p FULL JOIN cur c ON p.doc_id = c.doc_id
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val prev = docs.filter(col("doc_id") % 7 =!= 3)
      val cur = docs.filter(col("doc_id") % 11 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, concat(lit("v2 "), col("text")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.ops.CorpusDiff.diff(prev, cur, "doc_id", Seq("text"))
        .orderBy("doc_id")
    })

  override def queries: Seq[Q] =
    Seq(layCohortCount, layCohortData, layFilterFunnel, mntCompact,
      mntCorpusDiff)
}
