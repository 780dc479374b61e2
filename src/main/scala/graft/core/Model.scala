package graft.core

/** Core data model of the engine — the reference's fundamental abstractions
  * (SURVEY.md §1.1) as Scala case classes.
  */

/** Merge-key structure of a dataset (reference: data_handling/merge_strategy.py:23–54).
  *
  * @param primaryId      participant ID column (e.g. "ursi")
  * @param sessionId      session column for longitudinal data (e.g. "session_num")
  * @param compositeId    derived `primary + "_" + session` column (e.g. "customID")
  * @param isLongitudinal true iff hub table has both primary and session columns
  */
final case class MergeKeys(
    primaryId: String,
    sessionId: Option[String] = None,
    compositeId: Option[String] = None,
    isLongitudinal: Boolean = false) {

  /** Column used for joins and distinct-participant counts
    * (merge_strategy.py:31–35): composite when longitudinal, else primary. */
  def mergeColumn: String =
    if (isLongitudinal) compositeId.getOrElse(primaryId) else primaryId

  /** All ID-ish columns, excluded from selectable/statistics columns. */
  def idColumns: Set[String] =
    Set(primaryId) ++ sessionId ++ compositeId
}

/** Engine configuration (reference: core/config.py:19–69 `DataConfig`). */
final case class EngineConfig(
    dataDir: String,
    demographicsTable: String = "demographics",
    primaryIdColumn: String = "ursi",
    sessionColumn: String = "session_num",
    compositeIdColumn: String = "customID",
    ageColumn: String = "age",
    sexColumn: String = "sex",
    studySiteColumn: Option[String] = None,
    /** Preferred storage: "csv" matches the reference's data model; "parquet"
      * is the at-scale path (partitioned/bucketed). Catalog auto-detects. */
    format: String = "csv") {

  /** Reference `DataConfig.validate` (core/config.py:57–69). */
  def validate: Seq[String] = Seq(
    if (dataDir.isEmpty) Some("data_dir cannot be empty") else None,
    if (demographicsTable.isEmpty) Some("demographics_file cannot be empty") else None,
    if (primaryIdColumn.isEmpty) Some("primary_id_column cannot be empty") else None
  ).flatten
}

object EngineConfig {
  import graft.report.Toml

  /** Loads the reference's `config.toml` shape (core/config.py:132–233
    * `Config.load_config`): a `[data]` section with data_dir,
    * demographics_file, primary_id_column, session_column,
    * composite_id_column, age_column, sex_column, study_site_column —
    * absent keys keep the dataclass defaults, the demographics table name
    * is the file stem (config.py:47–49), and `[ui]`/`[state]` sections are
    * UI-runtime concerns a query engine ignores. */
  def fromToml(text: String): EngineConfig = {
    val doc = Toml.parse(text)
    val data: Map[String, Toml.Value] = doc.get("data") match {
      case Some(Toml.Tbl(m)) => m
      case _                 => Map.empty
    }
    def str(key: String, default: String): String = data.get(key) match {
      case Some(Toml.Str(s)) => s
      case _                 => default
    }
    val demographicsFile = str("demographics_file", "demographics.csv")
    val stem = demographicsFile.replaceAll("\\.[^.\\\\/]+$", "")
    EngineConfig(
      dataDir = str("data_dir", "data"),
      demographicsTable = stem,
      primaryIdColumn = str("primary_id_column", "ursi"),
      sessionColumn = str("session_column", "session_num"),
      compositeIdColumn = str("composite_id_column", "customID"),
      ageColumn = str("age_column", "age"),
      sexColumn = str("sex_column", "sex"),
      studySiteColumn = data.get("study_site_column") match {
        case Some(Toml.Str(s)) if s.nonEmpty => Some(s)
        case _                               => None
      },
      format = if (demographicsFile.endsWith(".parquet")) "parquet" else "csv")
  }

  /** [[fromToml]] over a file path; missing file → all defaults (the
    * reference creates a default config.toml in that case). */
  def fromTomlFile(path: String): EngineConfig = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      fromToml(java.nio.file.Files.readString(p))
    else EngineConfig(dataDir = "data")
  }
}

/** Filter algebra (reference: query/state/models.py:14–35 + the normalized
  * "behavioral filter" dicts of query/helpers/data_formatters.py:11–53).
  *
  * Canonical application order (query_secure.py:94–184):
  * substudies → sessions → age → phenotypic (in user order).
  */
sealed trait Filter
object Filter {
  /** Hub-table age range, inclusive both ends (query_secure.py:127–133). */
  final case class AgeRange(lo: Double, hi: Double) extends Filter

  /** Session membership on the hub table, longitudinal only
    * (query_secure.py:119–125). */
  final case class Sessions(values: Seq[String]) extends Filter

  /** Whole-word token match against the multi-valued study-site cell,
    * OR-ed across tokens (query_secure.py:104–117). */
  final case class Substudies(tokens: Seq[String]) extends Filter

  /** Numeric BETWEEN on any table (query_secure.py:154–157). */
  final case class NumericRange(table: String, column: String, lo: Double, hi: Double)
      extends Filter

  /** Categorical IN on any table (query_secure.py:174–177). */
  final case class Categorical(table: String, column: String, values: Seq[String])
      extends Filter

  /** Boolean equality (single value) or OR-chain (several) after Yes/No/1/0
    * normalization (query_secure.py:160–172; data_formatters.py:40–47). */
  final case class BooleanFilter(table: String, column: String, values: Seq[Boolean])
      extends Filter

  /** Reference boolean-token normalization (data_formatters.py:40–47):
    * a categorical value set drawn entirely from Yes/No/True/False/1/0 is
    * treated as boolean. Returns None when the values are not boolean-like. */
  def normalizeBoolean(values: Seq[String]): Option[Seq[Boolean]] = {
    val truthy = Set("yes", "true", "1")
    val falsy = Set("no", "false", "0")
    val lower = values.map(_.trim.toLowerCase)
    if (lower.nonEmpty && lower.forall(v => truthy(v) || falsy(v)))
      Some(lower.map(truthy))
    else None
  }

  /** Tables referenced by a phenotypic (table-scoped) filter — drives
    * join-set minimization (query/callbacks/export.py:73–87). */
  def referencedTable(f: Filter): Option[String] = f match {
    case NumericRange(t, _, _, _) => Some(t)
    case Categorical(t, _, _)     => Some(t)
    case BooleanFilter(t, _, _)   => Some(t)
    case _                        => None
  }
}
