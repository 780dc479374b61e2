package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.core.{Filter, MergeKeys}
import graft.core.Filter._

/** The cohort query builder — the heart of the reference
  * (query/query_secure.py:20–325), re-expressed as a Catalyst logical plan.
  *
  * Shape: hub (demographics) table LEFT JOINed to the *minimal* set of
  * behavioral tables (those explicitly selected for export plus those
  * referenced by any phenotypic filter — query/callbacks/export.py:73–87),
  * on the composite key when longitudinal else the primary key, with
  * predicates applied in the reference's canonical order: substudies →
  * sessions → age → phenotypic (query_secure.py:94–184).
  *
  * Catalyst notes (SURVEY.md §4): predicates on behavioral tables after a
  * LEFT JOIN are null-rejecting, so Catalyst rewrites those joins to INNER
  * (J2) and can reorder them; filters and the projection push into the
  * scans; small behavioral tables broadcast automatically under AQE. The
  * join-set minimization is *ours* — the optimizer cannot drop a join whose
  * table was never needed, because a left join to a table with duplicate
  * keys changes row multiplicity.
  */
final case class CohortQuery(
    catalog: TableCatalog,
    filters: Seq[Filter] = Seq.empty,
    /** (table, column) pairs explicitly selected for export. */
    selections: Seq[(String, String)] = Seq.empty,
    /** Tables explicitly selected for export (their filter/selection columns
      * drive the join set). */
    selectedTables: Seq[String] = Seq.empty) {

  import CohortQuery._

  private def keys: MergeKeys = catalog.mergeKeys
  private def hubName: String = catalog.config.demographicsTable

  /** Canonical filter order (query_secure.py:97–133): substudy, session,
    * age, then phenotypic filters in user order. Required for the filter
    * funnel's step order (T7), not for correctness. */
  def orderedFilters: Seq[Filter] = {
    val sub = filters.collect { case f: Substudies => f }
    val ses = filters.collect { case f: Sessions => f }
    val age = filters.collect { case f: AgeRange => f }
    val phen = filters.filter {
      case _: Substudies | _: Sessions | _: AgeRange => false
      case _ => true
    }
    sub ++ ses ++ age ++ phen
  }

  /** Join-set minimization: demographics ∪ selected tables ∪ tables named by
    * any phenotypic filter (export.py:73–87). */
  def joinTables: Seq[String] = {
    val fromFilters = filters.flatMap(Filter.referencedTable)
    val fromSelections = selections.map(_._1)
    (selectedTables ++ fromSelections ++ fromFilters)
      .distinct.filterNot(_ == hubName)
      .filter(catalog.tableNames.contains)
  }

  /** The hub with behavioral tables folded in via LEFT equi-joins on the
    * shared merge column (query_secure.py:66–92). Equi-join on the common
    * column name keeps a single key column (no demo.k vs t.k duplication). */
  def basePlan: DataFrame = planOver(joinTables)

  private def predicate(f: Filter): Column =
    CohortQuery.predicateFor(f, catalog.config.ageColumn, keys,
      catalog.config.studySiteColumn)

  /** Join set for the COUNT path only (reference filters.py:289–291): same
    * as [[joinTables]], except the reference's quirk — longitudinal data +
    * a session filter + a demographics-only join set force-adds the FIRST
    * available behavioral table. COUNT(DISTINCT key) over a LEFT join is
    * unchanged by the extra join, so this is bug-for-bug plan parity
    * (SURVEY.md §7.4 #11), reproduced on the count path and nowhere else;
    * `countPathQuirk = false` opts out. */
  def countJoinTables(countPathQuirk: Boolean = true): Seq[String] = {
    val base = joinTables
    val hasSessionFilter = filters.exists {
      case _: Sessions => true
      case _ => false
    }
    val behavioral = catalog.behavioralTableNames
    if (countPathQuirk && keys.isLongitudinal && hasSessionFilter
        && base.isEmpty && behavioral.nonEmpty)
      Seq(behavioral.head)
    else base
  }

  private def planOver(tables: Seq[String]): DataFrame = {
    val mergeCol = keys.mergeColumn
    val hub = catalog.demographics
    val joined = tables.foldLeft(hub) { (acc, t) =>
      val other = catalog.table(t)
      require(other.columns.contains(mergeCol),
        s"Table '$t' lacks merge column '$mergeCol'")
      // Drop duplicated non-key hub columns from the behavioral side: the
      // reference's SELECT namespaces them per-table; with common-name
      // equi-joins we keep the hub's copy (first wins, P1 dedup semantics).
      val dupCols = other.columns.toSet.intersect(acc.columns.toSet) - mergeCol
      acc.join(dupCols.foldLeft(other)(_ drop _), Seq(mergeCol), "left")
    }
    orderedFilters.foldLeft(joined)((df, f) => df.filter(predicate(f)))
  }

  /** Live participant count: COUNT(DISTINCT mergeColumn) over the filtered
    * join (query_secure.py:289–325). For longitudinal data this counts
    * participant-sessions, not participants — reference behavior, preserved
    * (SURVEY.md §7.4 #9). The join set includes the count-path quirk above. */
  def count(countPathQuirk: Boolean = true): Long =
    planOver(countJoinTables(countPathQuirk))
      .agg(countDistinct(col(keys.mergeColumn))).head().getLong(0)

  /** Approximate fast path for the interactive counter at scale (opt-in;
    * default rsd 5%). */
  def approxCount(rsd: Double = 0.05): Long =
    basePlan.agg(approx_count_distinct(col(keys.mergeColumn), rsd)).head().getLong(0)

  /** Data query SELECT list (query_secure.py:194–286): merge keys first,
    * then all demographics columns (when demographics is selected or by
    * default), then explicitly selected behavioral columns; deduplicated,
    * order-preserving. Deviation from the reference's hardcoded `demo.ursi`:
    * we use the configured keys (SURVEY.md §7.4 #10). */
  def selectColumns: Seq[String] = {
    val hubCols = catalog.demographics.columns.toSeq
    val keyCols = Seq(keys.mergeColumn) ++
      (if (keys.isLongitudinal) Seq(keys.primaryId) ++ keys.sessionId else Seq.empty)
    val demoCols = hubCols.filterNot(keys.idColumns)
    val selected = selections.map(_._2)
    (keyCols ++ demoCols ++ selected).distinct
  }

  /** Merged wide dataset (entry point 3.1). */
  def data: DataFrame = {
    val plan = basePlan
    val cols = selectColumns.filter(plan.columns.contains)
    plan.select(cols.map(col): _*)
  }
}

object CohortQuery {
  /** Whole-word token match inside a multi-valued, space-separated cell —
    * the reference's `(' ' || site || ' ') LIKE '% tok %'`
    * (query_secure.py:112). Kept LIKE-shaped for oracle parity; the
    * ArrayType model (split + array_contains) is the documented improvement
    * and is what [[graft.stats.SiteValues]] uses. */
  def tokenMatch(c: Column, token: String): Column =
    concat(lit(" "), c, lit(" ")).like(s"% $token %")

  /** Filter → Column lowering (query_secure.py:94–184), independent of a
    * catalog so any DataFrame-shaped source can apply the engine's filter
    * algebra. P2 age BETWEEN; P7 session IN (string-cast, longitudinal
    * only); P6 substudy token OR-chain; P3 numeric BETWEEN; P4 categorical
    * IN; P5 boolean `= v` for one value, OR-chain for several
    * (query_secure.py:160–172). */
  def predicateFor(
      f: Filter,
      ageColumn: String,
      keys: MergeKeys,
      siteColumn: Option[String]): Column = f match {
    case AgeRange(lo, hi) =>
      col(ageColumn).between(lo, hi)
    case Sessions(values) =>
      if (keys.isLongitudinal && keys.sessionId.nonEmpty)
        col(keys.sessionId.get).cast("string").isin(values: _*)
      else lit(true)
    case Substudies(tokens) =>
      val siteCol = siteColumn.getOrElse("all_studies")
      tokens.map(t => tokenMatch(col(siteCol), t)).reduceOption(_ || _).getOrElse(lit(true))
    case NumericRange(_, c, lo, hi) => col(c).between(lo, hi)
    case Categorical(_, c, values) => col(c).isin(values: _*)
    case BooleanFilter(_, c, values) =>
      values.distinct match {
        case Seq(v) => col(c) === lit(v)
        case vs     => vs.map(v => col(c) === lit(v)).reduce(_ || _)
      }
  }
}
