package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the expectations runner every
  * ingestion pipeline fronts its tables with (the Great Expectations /
  * dbt-test check families, public): each check declares a column
  * predicate and a tolerated violation fraction; the runner reports
  * exact violation counts and a pass/fail verdict per check.
  *
  * Scale shape: every ROW-PREDICATE check (not-null, range, set,
  * regex) compiles to one conditional-count aggregate, so the whole
  * suite rides ONE map-side-combined pass over the table regardless of
  * how many checks it carries. [[Unique]] adds one count-distinct per
  * checked key (its own aggregation), [[RefIntegrity]] one left-anti
  * count against the (broadcastable) dimension — both loudly separate
  * because they genuinely cost a shuffle each. Verdicts are integer
  * comparisons (violations · 10⁹ vs threshold·10⁹-scaled rows), so no
  * float boundary can flip a pass cross-engine; the reported fraction
  * rounds to 9 for display only.
  *
  * An empty table passes every fraction-tolerance check with 0
  * violations (nothing violated anything) — the convention that makes
  * a freshly-created partition validate before first load. */
object Expectations {

  sealed trait Check {
    def id: String
  }
  /** Null fraction of `column` must be ≤ maxFrac. */
  final case class NotNull(id: String, column: String,
      maxFrac: Double = 0.0) extends Check
  /** Fraction of non-null values outside [lo, hi] must be ≤ maxFrac. */
  final case class InRange(id: String, column: String, lo: Double,
      hi: Double, maxFrac: Double = 0.0) extends Check
  /** Fraction of non-null values not in `values` must be ≤ maxFrac. */
  final case class InSet(id: String, column: String, values: Seq[String],
      maxFrac: Double = 0.0) extends Check
  /** Fraction of non-null values NOT fully matching `regex` (RE2-safe
    * syntax for engine portability) must be ≤ maxFrac. */
  final case class MatchesRegex(id: String, column: String, regex: String,
      maxFrac: Double = 0.0) extends Check
  /** The column tuple must be unique: violations = rows − distinct. */
  final case class Unique(id: String, columns: Seq[String]) extends Check
  /** Fraction of non-null values absent from `dim`'s `dimColumn` must
    * be ≤ maxFrac (orphan foreign keys). */
  final case class RefIntegrity(id: String, column: String, dim: DataFrame,
      dimColumn: String, maxFrac: Double = 0.0) extends Check

  /** Run the suite: one row per check —
    * (check_id, kind, column, n_rows, n_violations, violation_frac,
    * passed), ordered by check_id. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.id).distinct.size == checks.size,
      "check ids must be unique")
    val spark = df.sparkSession
    import spark.implicits._

    def viol(pred: Column): Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

    val rowChecks = checks.collect {
      case c: NotNull =>
        (c.id, "not_null", c.column, c.maxFrac,
          viol(col(c.column).isNull))
      case c: InRange =>
        // a non-null value that doesn't even cast to a number IS a range
        // violation — try_cast (null, never throw, under any ANSI
        // setting) + isNull, where a plain cast would either null the
        // predicate and count zero (garbage column reports passed=true)
        // or abort the whole suite on the first bad cell
        (c.id, "in_range", c.column, c.maxFrac,
          viol(col(c.column).isNotNull &&
            (col(c.column).try_cast("double").isNull ||
              !col(c.column).try_cast("double").between(c.lo, c.hi))))
      case c: InSet =>
        (c.id, "in_set", c.column, c.maxFrac,
          viol(col(c.column).isNotNull &&
            !col(c.column).cast("string")
              .isin(c.values.map(_.asInstanceOf[Any]): _*)))
      case c: MatchesRegex =>
        (c.id, "matches_regex", c.column, c.maxFrac,
          viol(col(c.column).isNotNull &&
            !col(c.column).cast("string").rlike("^(?:" + c.regex + ")$")))
    }
    val aggs = count(lit(1)).as("__n") +:
      rowChecks.map { case (id, _, _, _, v) => v.as(s"__v_$id") }
    val oneRow = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = oneRow.getAs[Long]("__n")

    val rowResults = rowChecks.map { case (id, kind, column, maxFrac, _) =>
      (id, kind, column, n, oneRow.getAs[Long](s"__v_$id"), maxFrac)
    }
    val otherResults = checks.collect {
      case c: Unique =>
        val distinct = df.select(c.columns.map(col): _*).distinct().count()
        (c.id, "unique", c.columns.mkString(","), n, n - distinct, 0.0)
      case c: RefIntegrity =>
        val orphans = df.select(col(c.column)).filter(col(c.column).isNotNull)
          .join(c.dim.select(col(c.dimColumn).as(c.column)).distinct(),
            Seq(c.column), "left_anti")
          .count()
        (c.id, "ref_integrity", c.column, n, orphans, c.maxFrac)
    }

    (rowResults ++ otherResults)
      .map { case (id, kind, column, rows, v, maxFrac) =>
        // integer verdict: v·10⁹ ≤ maxFrac·10⁹·rows (exact at the declared
        // 9-decimal tolerance resolution — no float boundary flip).
        // BigInt: v·10⁹ overflows a long past ~9·10⁹ rows.
        val passed = BigInt(v) * 1000000000L <=
          BigInt(math.round(maxFrac * 1000000000L)) * BigInt(rows)
        val frac =
          if (rows == 0) 0.0
          else BigDecimal.valueOf(v.toDouble / rows)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, kind, column, rows, v, frac, passed)
      }
      .toDF("check_id", "kind", "column", "n_rows", "n_violations",
        "violation_frac", "passed")
      .orderBy("check_id")
  }
}
