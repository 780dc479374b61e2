package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.{Filter, MergeKeys}
import graft.core.Filter._
import graft.ingest.Ingest
import graft.query.CohortQuery
import graft.report.{PhenotypicFilterState, QueryState}
import org.apache.spark.sql.functions._

/** Driver-gate entries for the predicate/normalization operators that were
  * previously spec-only: P5 boolean predicate, P7 session IN, P9 filter
  * normalization, P10 identifier sanitization (SURVEY.md §2.2).
  *
  * Each entry lowers a [[graft.core.Filter]] through the SAME
  * [[CohortQuery.predicateFor]] the cohort engine uses — these are the
  * engine's code paths under oracle hashes, not re-derived SQL.
  */
object FilterQueries extends QueryModule {

  private val crossSectional = MergeKeys("c_custkey")
  private val longitudinalLi = MergeKeys(
    primaryId = "l_orderkey",
    sessionId = Some("l_linenumber"),
    compositeId = None,
    isLongitudinal = true)

  /** P5: boolean predicate after Yes/No normalization (query_secure.py:
    * 160–172 + data_formatters.py:40–47). The user-facing value set
    * ("Yes") normalizes to booleans, then lowers to `col = true` on a
    * boolean column. */
  val p5Boolean: Q = Q(
    "p5_boolean_filter",
    Some("""
      SELECT c_custkey, c_acctbal
      FROM customer
      WHERE (c_acctbal >= 0.0) = TRUE AND c_mktsegment = 'BUILDING'
      ORDER BY c_custkey"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "customer")
        .withColumn("has_credit", col("c_acctbal") >= 0.0)
      val values = Filter.normalizeBoolean(Seq("Yes")).get
      val f = BooleanFilter("customer", "has_credit", values)
      val pred = CohortQuery.predicateFor(f, "age", crossSectional, None)
      df.filter(pred && col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    })

  /** P7: session IN on longitudinal data (query_secure.py:119–125) —
    * string-cast membership, guarded by MergeKeys.isLongitudinal. */
  val p7SessionIn: Q = Q(
    "p7_session_in",
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      WHERE CAST(l_linenumber AS VARCHAR) IN ('1', '3')
      ORDER BY l_orderkey, l_linenumber, l_quantity"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "lineitem")
      val pred = CohortQuery.predicateFor(
        Sessions(Seq("1", "3")), "age", longitudinalLi, None)
      df.filter(pred)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    })

  /** P9: UI filter-state normalization (data_formatters.py:11–53 +
    * query_export.py validation): incomplete/disabled filters are dropped,
    * boolean-like categorical value sets normalize to BooleanFilter, the
    * survivors lower to predicates. The state below carries four phenotypic
    * filters of which only three are complete. */
  val p9FilterNormalization: Q = Q(
    "p9_filter_normalization",
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_acctbal BETWEEN 0.0 AND 5000.0
        AND c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND (c_nationkey < 10) = TRUE
      ORDER BY c_custkey"""),
    (s, dir) => {
      val state = QueryState(phenotypic = Seq(
        PhenotypicFilterState("customer", "c_acctbal", "range",
          rangeMin = Some(0.0), rangeMax = Some(5000.0)),
        PhenotypicFilterState("customer", "c_mktsegment", "categorical",
          values = Seq("BUILDING", "MACHINERY")),
        // boolean-like value set => BooleanFilter via normalizeBoolean
        PhenotypicFilterState("customer", "low_nation", "categorical",
          values = Seq("Yes")),
        // incomplete (range missing max) => dropped by normalization
        PhenotypicFilterState("customer", "c_acctbal", "range",
          rangeMin = Some(99.0), rangeMax = None)))
      val filters = QueryState.toFilters(state)
      require(filters.length == 3, s"normalization kept ${filters.length} of 4")
      val df = Tables.load(s, dir, "customer")
        .withColumn("low_nation", col("c_nationkey") < 10)
      filters.map(CohortQuery.predicateFor(_, "age", crossSectional, None))
        .foldLeft(df)(_ filter _)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    })

  /** P10: identifier sanitization on ingest (csv_utils.py:96–140 /
    * security_utils.py:8–116): dirty header names are scrubbed to safe
    * identifiers — schema-compared against the oracle's sanitized aliases,
    * values untouched. */
  val p10Sanitize: Q = Q(
    "p10_identifier_sanitization",
    Some("""
      SELECT c_custkey AS c_cust_key, c_name AS c_2name, c_acctbal AS acct_bal
      FROM customer
      ORDER BY c_cust_key"""),
    (s, dir) => {
      val dirty = Tables.load(s, dir, "customer")
        .select(
          col("c_custkey").as("c cust key!"),
          col("c_name").as("2name"),
          col("c_acctbal").as("acct bal%"))
      val clean = dirty.toDF(Ingest.sanitizeColumnNames(dirty.columns.toSeq): _*)
      clean.orderBy("c_cust_key")
    })

  override def queries: Seq[Q] =
    Seq(p5Boolean, p7SessionIn, p9FilterNormalization, p10Sanitize)
}
