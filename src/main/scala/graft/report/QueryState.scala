package graft.report

import graft.catalog.TableCatalog
import graft.core.Filter
import graft.core.Filter._
import graft.report.Toml._

/** S10: full query-state TOML round-trip with validation against the
  * current dataset (reference: query/query_export.py:49–349,
  * query/query_parameters.py:17–231).
  *
  * Format mirrors the reference: [metadata], [cohort_filters],
  * [[phenotypic_filters]] array-of-tables, [export_selection] (+
  * [export_selection.selected_columns] sub-table).
  */
final case class PhenotypicFilterState(
    table: String,
    column: String,
    filterType: String, // "range" | "categorical"
    rangeMin: Option[Double] = None,
    rangeMax: Option[Double] = None,
    values: Seq[String] = Seq.empty)

final case class QueryState(
    ageRange: Option[(Double, Double)] = None,
    substudies: Seq[String] = Seq.empty,
    sessions: Seq[String] = Seq.empty,
    phenotypic: Seq[PhenotypicFilterState] = Seq.empty,
    selectedTables: Seq[String] = Seq.empty,
    selectedColumns: Map[String, Seq[String]] = Map.empty,
    enwidenLongitudinal: Boolean = false,
    consolidateBaseline: Boolean = false,
    userNotes: String = "",
    appVersion: String = "1.0.0",
    formatVersion: String = "1.0",
    exportTimestamp: String = "")

object QueryState {

  def toToml(s: QueryState): String = {
    val cohort = Map.newBuilder[String, Value]
    s.ageRange.foreach { case (lo, hi) => cohort += "age_range" -> Arr(Seq(Num(lo), Num(hi))) }
    if (s.substudies.nonEmpty) cohort += "substudies" -> Arr(s.substudies.map(Str))
    if (s.sessions.nonEmpty) cohort += "sessions" -> Arr(s.sessions.map(Str))

    val phen = s.phenotypic.map { f =>
      Map[String, Value]("table" -> Str(f.table), "column" -> Str(f.column),
        "filter_type" -> Str(f.filterType)) ++
        f.rangeMin.map(v => "min_val" -> Num(v)) ++
        f.rangeMax.map(v => "max_val" -> Num(v)) ++
        (if (f.values.nonEmpty) Map("selected_values" -> Arr(f.values.map(Str))) else Map.empty)
    }

    val doc = Map[String, Value](
      "metadata" -> Tbl(Map(
        "export_timestamp" -> Str(s.exportTimestamp),
        "app_version" -> Str(s.appVersion),
        "format_version" -> Str(s.formatVersion),
        "user_notes" -> Str(s.userNotes))),
      "cohort_filters" -> Tbl(cohort.result()),
      "phenotypic_filters" -> TblArr(phen),
      "export_selection" -> Tbl(Map(
        "selected_tables" -> Arr(s.selectedTables.map(Str)),
        "enwiden_longitudinal" -> Bool(s.enwidenLongitudinal),
        "consolidate_baseline" -> Bool(s.consolidateBaseline))),
      "export_selection.selected_columns" -> Tbl(
        s.selectedColumns.map { case (t, cols) => t -> Arr(cols.map(Str)) }))
    Toml.render(doc)
  }

  def fromToml(text: String): (QueryState, Seq[String]) = {
    val errors = Seq.newBuilder[String]
    val doc = Toml.parse(text)

    def tbl(name: String): Map[String, Value] = doc.get(name) match {
      case Some(Tbl(m)) => m
      case _ => Map.empty
    }
    def str(m: Map[String, Value], k: String, default: String = ""): String =
      m.get(k) match { case Some(Str(s)) => s; case _ => default }
    def strArr(m: Map[String, Value], k: String): Seq[String] =
      m.get(k) match {
        case Some(Arr(xs)) => xs.collect { case Str(s) => s
          case Num(n) => if (n == math.floor(n)) n.toLong.toString else n.toString }
        case _ => Seq.empty
      }
    def bool(m: Map[String, Value], k: String): Boolean =
      m.get(k) match { case Some(Bool(b)) => b; case _ => false }

    val meta = tbl("metadata")
    val cohort = tbl("cohort_filters")
    val ageRange = cohort.get("age_range") match {
      case Some(Arr(Seq(Num(lo), Num(hi)))) => Some((lo, hi))
      case Some(_) => errors += "age_range must be a two-number array"; None
      case None => None
    }
    val phen = doc.get("phenotypic_filters") match {
      case Some(TblArr(items)) => items.flatMap { m =>
        val table = str(m, "table"); val column = str(m, "column")
        val ft = str(m, "filter_type")
        if (table.isEmpty || column.isEmpty || ft.isEmpty) {
          errors += s"phenotypic filter missing table/column/filter_type: $m"
          None
        } else Some(PhenotypicFilterState(
          table, column, ft,
          m.get("min_val").collect { case Num(n) => n },
          m.get("max_val").collect { case Num(n) => n },
          strArr(m, "selected_values")))
      }
      case _ => Seq.empty
    }
    val sel = tbl("export_selection")
    val selCols = tbl("export_selection.selected_columns")
      .map { case (t, v) => t -> (v match {
        case Arr(xs) => xs.collect { case Str(s) => s }
        case _ => Seq.empty[String]
      }) }

    (QueryState(
      ageRange = ageRange,
      substudies = strArr(cohort, "substudies"),
      sessions = strArr(cohort, "sessions"),
      phenotypic = phen,
      selectedTables = strArr(sel, "selected_tables"),
      selectedColumns = selCols,
      enwidenLongitudinal = bool(sel, "enwiden_longitudinal"),
      consolidateBaseline = bool(sel, "consolidate_baseline"),
      userNotes = str(meta, "user_notes"),
      appVersion = str(meta, "app_version", "1.0.0"),
      formatVersion = str(meta, "format_version", "1.0"),
      exportTimestamp = str(meta, "export_timestamp")), errors.result())
  }

  /** Catalog validation (replaces the reference's identifier sanitization):
    * unknown tables/columns are reported, not silently dropped. */
  def validate(s: QueryState, catalog: TableCatalog): Seq[String] = {
    val errors = Seq.newBuilder[String]
    val known = catalog.tableNames.toSet
    (s.selectedTables ++ s.phenotypic.map(_.table) ++ s.selectedColumns.keys)
      .distinct.filterNot(known).foreach(t => errors += s"Unknown table '$t'")
    s.phenotypic.filter(f => known(f.table)).foreach { f =>
      if (!catalog.table(f.table).columns.contains(f.column))
        errors += s"Unknown column '${f.column}' in table '${f.table}'"
    }
    s.selectedColumns.filter(kv => known(kv._1)).foreach { case (t, cols) =>
      val have = catalog.table(t).columns.toSet
      cols.filterNot(have).foreach(c => errors += s"Unknown column '$c' in table '$t'")
    }
    errors.result()
  }

  /** Lower the state into the engine's filter algebra (boolean-like value
    * sets normalize per data_formatters.py:40–47). */
  def toFilters(s: QueryState): Seq[Filter] = {
    val cohort: Seq[Filter] =
      s.substudies.headOption.map(_ => Substudies(s.substudies)).toSeq ++
      s.sessions.headOption.map(_ => Sessions(s.sessions)).toSeq ++
      s.ageRange.map { case (lo, hi) => AgeRange(lo, hi) }.toSeq
    val phen: Seq[Filter] = s.phenotypic.flatMap { f =>
      f.filterType match {
        case "range" | "numeric" =>
          for (lo <- f.rangeMin; hi <- f.rangeMax)
            yield NumericRange(f.table, f.column, lo, hi)
        case "categorical" =>
          if (f.values.isEmpty) None
          else Filter.normalizeBoolean(f.values) match {
            case Some(bools) => Some(BooleanFilter(f.table, f.column, bools))
            case None => Some(Categorical(f.table, f.column, f.values))
          }
        case other => None
      }
    }
    cohort ++ phen
  }
}
