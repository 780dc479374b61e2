package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.MergeKeys
import graft.stats.CohortReports
import graft.transform.ExportPrep
import org.apache.spark.sql.functions._

/** Driver-gate entries for the export-preparation operators (SURVEY.md
  * §2.4): A9 sort-for-export, A12 empty/sparse column pruning, A13
  * per-session sub-summaries — previously spec-only.
  */
object ExportQueries extends QueryModule {

  private val custKeys = MergeKeys("c_custkey")
  private val liKeys = MergeKeys(
    primaryId = "l_orderkey",
    sessionId = Some("l_linenumber"),
    compositeId = None,
    isLongitudinal = true)

  /** A9: final export sort by primary ID (analysis/export.py:379–382),
    * through the one-pass ExportPrep (which also computes the null/dup
    * report — asserted empty here). */
  val a9ExportSort: Q = Q(
    "a9_export_sort",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      ORDER BY c_custkey"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val (prepared, report) = ExportPrep.prepare(df, custKeys, sort = true)
      require(report.droppedAllNull.isEmpty && report.duplicateKeyRows == 0L,
        s"unexpected export report: $report")
      prepared
    })

  /** A12: empty/sparse column pruning (export.py:285–337): the all-null
    * column is dropped from the export, the ~1%-populated column is kept
    * but reported sparse. Schema compare proves the drop. */
  val a12PruneColumns: Q = Q(
    "a12_prune_columns",
    Some("""
      SELECT c_custkey, c_name,
        CASE WHEN c_custkey % 100 = 0 THEN c_name END AS rare_note
      FROM customer
      ORDER BY c_custkey"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
        .withColumn("all_null", lit(null).cast("string"))
        .withColumn("rare_note",
          when(col("c_custkey") % 100 === 0, col("c_name")))
      val (prepared, report) = ExportPrep.prepare(df, custKeys, sort = true)
      require(report.droppedAllNull == Seq("all_null"),
        s"expected all_null dropped, got ${report.droppedAllNull}")
      require(report.sparseColumns.contains("rare_note"),
        s"expected rare_note flagged sparse, got ${report.sparseColumns.keys}")
      prepared
    })

  /** A13: per-session sub-summaries (query/callbacks/export.py:426–446) —
    * the longitudinal final summary repeated per session value, computed in
    * ONE groupBy(session) pass instead of the reference's per-session
    * filter loop. */
  val a13PerSession: Q = Q(
    "a13_per_session_summary",
    Some("""
      SELECT CAST(l_linenumber AS VARCHAR) AS session,
        COUNT(DISTINCT l_orderkey) AS n_participants,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean_l_quantity,
        CAST(MIN(l_quantity) AS DOUBLE) AS min_l_quantity,
        CAST(MAX(l_quantity) AS DOUBLE) AS max_l_quantity
      FROM lineitem
      WHERE l_linenumber IS NOT NULL
      GROUP BY 1
      ORDER BY session"""),
    (s, dir) =>
      CohortReports.perSessionSummary(
        Tables.load(s, dir, "lineitem"), liKeys, Seq("l_quantity")))

  override def queries: Seq[Q] = Seq(a9ExportSort, a12PruneColumns, a13PerSession)
}
