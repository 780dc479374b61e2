package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-area [[QueryModule]]s; every entry with an
  * oracle is hash-compared against DuckDB running the same SQL on the same
  * parquet tables, so Spark plans and oracle SQL are written in pairs (see
  * [[Q]] for the exactness rules).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.queries.CoreQueries,
    graft.queries.FilterQueries,
    graft.queries.JoinQueries,
    graft.queries.PivotQueries,
    graft.queries.ExportQueries,
    graft.queries.CatalogQueries,
    graft.queries.LayoutQueries,
    graft.queries.StatsQueries,
    graft.queries.ProfileQueries,
    graft.queries.QualityQueries,
    graft.queries.TextQueries,
    graft.queries.UrlQueries,
    graft.queries.GraphQueries,
    graft.queries.SimQueries,
    graft.queries.EventQueries,
    graft.queries.SamplingQueries,
    graft.queries.PrivacyQueries,
    graft.queries.SketchQueries,
    graft.queries.ProjectionQueries,
    graft.queries.QuantizeQueries,
    graft.queries.EvalQueries)

  private lazy val bank: Seq[Q] = modules.flatMap(_.queries)

  /** Semantics-bearing runtime confs, pinned on whatever session the
    * grading driver hands us before any plan is built. Every OTHER
    * environment (GraftSession mains, build.sbt's forked test JVM)
    * already pins these; the driver's session is the one we don't
    * construct, and a drifted session timezone or reader flag there can
    * silently flip timestamp rendering or cast semantics in gates that
    * are value-correct locally. Values match what the whole suite is
    * verified under: UTC session zone, Spark 4 ANSI defaults, NTZ
    * inference on (Tables.tsNormalizer's contract), nanos-as-long
    * escape hatch for the NANOS-encoded events generation. */
  private def pinConfs(s: SparkSession): Unit = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  private def pinned(
      run: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => { pinConfs(s); run(s, dir) }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pinned(graft.queries.CoreQueries.q1PricingAgg.run)(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bank.map(q => q.name -> pinned(q.run)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    bank.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
