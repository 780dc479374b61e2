package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.MergeKeys
import graft.stats.{CohortReports, DataQuality}
import org.apache.spark.sql.functions._

/** T3 data-quality and T5 final-summary operators with DuckDB oracles.
  * The T3 input is the hub⟕orders join so left-join nulls exercise the
  * missing-data detection on data that is otherwise null-free.
  */
object QualityQueries extends QueryModule {

  /** Hub ⟕ high-value orders: the filtered right side leaves ~13% of
    * customers unmatched, so the left join manufactures real nulls. */
  private val baseSql =
    """SELECT c.c_custkey AS k, c.c_acctbal, c.c_mktsegment, o.o_totalprice
      FROM customer c
      LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        ON c.c_custkey = o.o_custkey"""

  /** T3: per-column missing severities + duplicate-key rows of the joined
    * cohort frame (reference tiers: >50 high, >20 medium, else low). */
  val t3Quality: Q = Q(
    "t3_missing_and_dups",
    Some(s"""
      WITH base AS ($baseSql),
      m AS (
        SELECT 'o_totalprice' AS col_name,
          count(*) - count(o_totalprice) AS n_missing,
          ROUND((count(*) - count(o_totalprice)) * 1.0 / count(*) * 100.0, 4) AS pct
        FROM base),
      d AS (
        SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS dup_key_rows
        FROM (SELECT count(*) AS cnt FROM base GROUP BY k))
      SELECT m.col_name, m.n_missing, m.pct,
        CASE WHEN m.pct > 50 THEN 'high' WHEN m.pct > 20 THEN 'medium'
             ELSE 'low' END AS severity,
        d.dup_key_rows
      FROM m, d"""),
    (s, dir) => {
      import s.implicits._
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      val base = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(c("c_custkey").as("k"), c("c_acctbal"), c("c_mktsegment"), o("o_totalprice"))
      val report = DataQuality.report(base, MergeKeys("k"))
      val missing = report.missing.filter(_.column == "o_totalprice")
      missing.map(m => (m.column, m.missingCount,
          BigDecimal(m.missingPct).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          m.severity, report.primaryIdDuplicates))
        .toDF("col_name", "n_missing", "pct", "severity", "dup_key_rows")
    })

  /** T5: one-row-per-column final summary of the customer table. */
  val t5Summary: Q = Q(
    "t5_final_summary",
    Some("""
      SELECT 'c_acctbal' AS col_name, 'numeric' AS dtype,
        count(c_acctbal) AS n,
        ROUND(avg(c_acctbal), 6) AS mean,
        ROUND(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5), 4) AS median,
        ROUND(stddev(c_acctbal), 4) AS std,
        CAST(min(c_acctbal) AS DOUBLE) AS min_v,
        CAST(max(c_acctbal) AS DOUBLE) AS max_v,
        count(DISTINCT c_acctbal) AS n_distinct,
        CAST(NULL AS VARCHAR) AS top_value, CAST(NULL AS BIGINT) AS top_count
      FROM customer
      UNION ALL
      SELECT 'c_mktsegment', 'categorical', count(c_mktsegment),
        NULL, NULL, NULL, NULL, NULL,
        count(DISTINCT c_mktsegment),
        (SELECT c_mktsegment FROM customer
         WHERE c_mktsegment IS NOT NULL
         GROUP BY c_mktsegment ORDER BY count(*) DESC, c_mktsegment LIMIT 1),
        (SELECT count(*) FROM customer
         WHERE c_mktsegment IS NOT NULL
         GROUP BY c_mktsegment ORDER BY count(*) DESC, c_mktsegment LIMIT 1)
      FROM customer
      ORDER BY col_name"""),
    (s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      val summaries = CohortReports.finalSummary(cust, MergeKeys("c_custkey"))
      def r(v: Option[Double], scale: Int): Option[Double] =
        v.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
      summaries.map(cs => (cs.column, cs.dtype, cs.n,
          r(cs.mean, 6), r(cs.median, 4), r(cs.std, 4), cs.min, cs.max,
          cs.distinct, cs.topValue, cs.topCount))
        .toDF("col_name", "dtype", "n", "mean", "median", "std",
          "min_v", "max_v", "n_distinct", "top_value", "top_count")
        .orderBy("col_name")
    })

  /** Benford first-digit table over prices-in-cents: digit extraction is
    * integer-string substring (never the log10-floor ulp hazard), counts
    * exact, shares/χ² terms identical divisions. TPC-H prices are range-
    * bounded, NOT Benford — the screen must measure that deviation the
    * same way in both engines. */
  val dqBenfordDigits: Q = Q(
    "dq_benford_digits",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v FROM lineitem),
      g AS (
        SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
          count(*) AS n
        FROM b WHERE v IS NOT NULL AND v > 0
        GROUP BY 1),
      t AS (SELECT digit, n, SUM(n) OVER () AS total FROM g)
      SELECT digit, n,
        CAST(n AS DOUBLE) / total AS observed_share,
        log10(1.0 + 1.0 / digit) AS expected_share,
        round(pow(n - total * log10(1.0 + 1.0 / digit), 2)
          / (total * log10(1.0 + 1.0 / digit)), 9) AS chi2_term
      FROM t
      ORDER BY digit"""),
    (s, dir) =>
      DataQuality.benfordTable(Tables.load(s, dir, "lineitem"),
          col("l_extendedprice") * 100)
        .orderBy("digit"))

  /** The χ² / MAD / conformity one-row Benford verdict (decimal folds of
    * rounded per-digit terms; absent digits keep their expected mass). */
  val dqBenfordSummary: Q = Q(
    "dq_benford_summary",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v FROM lineitem),
      g AS (
        SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
          count(*) AS n
        FROM b WHERE v IS NOT NULL AND v > 0
        GROUP BY 1),
      d AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
      f AS (SELECT d.digit, COALESCE(g.n, 0) AS n
            FROM d LEFT JOIN g USING (digit)),
      t AS (SELECT digit, n, SUM(n) OVER () AS total,
              log10(1.0 + 1.0 / digit) AS e
            FROM f),
      terms AS (
        SELECT n,
          round(pow(n - total * e, 2) / (total * e), 9) AS t,
          round(abs(CAST(n AS DOUBLE) / total - e), 9) AS ad
        FROM t)
      SELECT CAST(SUM(n) AS BIGINT) AS n,
        CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE) AS chi2,
        CAST(SUM(CAST(ad AS DECIMAL(38,12))) AS DOUBLE) / 9.0 AS mad,
        (CAST(SUM(CAST(ad AS DECIMAL(38,12))) AS DOUBLE) / 9.0) <= 0.015
          AS conforms
      FROM terms"""),
    (s, dir) =>
      DataQuality.benfordSummary(Tables.load(s, dir, "lineitem"),
        col("l_extendedprice") * 100))

  private val ProfCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  /** Candidate-key screen over customer
    * ([[graft.stats.DataQuality.keyCandidates]]): custkey and the
    * synthetic unique names are keys, nationkey/mktsegment are not —
    * the oracle rebuilds counts, uniqueness, and the verdict per
    * column. */
  val dqKeyCandidates: Q = Q(
    "dq_key_candidates",
    Some(ProfCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null,
        round(CAST(count(DISTINCT $c) AS DOUBLE) / count(*), 6)
          AS uniqueness,
        (SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) = 0
          AND count(DISTINCT $c) = count(*)) AS is_key
      FROM customer"""
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    (s, dir) =>
      DataQuality.keyCandidates(Tables.load(s, dir, "customer"), ProfCols)
        .orderBy("col_name"))

  /** Single-column FD discovery over the same columns
    * ([[graft.stats.DataQuality.functionalDependencies]]): keys
    * determine everything; nationkey/mktsegment determine nothing. */
  val dqFdDiscovery: Q = Q(
    "dq_fd_discovery",
    Some(ProfCols.flatMap { lhs =>
      ProfCols.filterNot(_ == lhs).map { rhs =>
        s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
          CAST(max(k) AS BIGINT) AS max_rhs_per_lhs,
          (max(k) = 1) AS holds
        FROM (
          SELECT count(DISTINCT $rhs)
            + max(CASE WHEN $rhs IS NULL THEN 1 ELSE 0 END) AS k
          FROM customer WHERE $lhs IS NOT NULL GROUP BY $lhs)"""
      }
    }.mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")),
    (s, dir) => {
      val out = DataQuality.functionalDependencies(
        Tables.load(s, dir, "customer"), ProfCols)
      val holds = out.collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
          r.getAs[Boolean]("holds")).toMap
      require(holds(("c_custkey", "c_mktsegment")),
        "a key must determine every column")
      require(!holds(("c_nationkey", "c_mktsegment")),
        "a 25-value column cannot determine an independent segment")
      out.orderBy("lhs", "rhs")
    })

  /** Declarative expectations suite ([[graft.stats.Expectations]]) over
    * lineitem: two deliberately FAILING checks (linestatus 'O'-share
    * above its tolerance, a non-unique orderkey) prove the verdict
    * logic both ways; the fraction tolerances convert to integer
    * comparisons so no float boundary flips a pass cross-engine. The
    * oracle recomputes every violation count and verdict from scratch. */
  val dqExpectations: Q = Q(
    "dq_expectations",
    Some("""
      WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
      checks AS (
        SELECT 'fk_order' AS check_id, 'ref_integrity' AS kind,
          'l_orderkey' AS col_, 0.0 AS maxf,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
           WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL) AS v
        UNION ALL
        SELECT 'nn_qty', 'not_null', 'l_quantity', 0.0,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_quantity IS NULL)
        UNION ALL
        SELECT 'rng_disc', 'in_range', 'l_discount', 0.5,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_discount IS NOT NULL
             AND NOT (CAST(l_discount AS DOUBLE) BETWEEN 0.0 AND 0.05))
        UNION ALL
        SELECT 'rng_qty', 'in_range', 'l_quantity', 0.0,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_quantity IS NOT NULL
             AND NOT (CAST(l_quantity AS DOUBLE) BETWEEN 1.0 AND 50.0))
        UNION ALL
        SELECT 're_shipdate', 'matches_regex', 'l_shipdate', 0.0,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_shipdate IS NOT NULL AND NOT regexp_full_match(
             CAST(l_shipdate AS VARCHAR), '\d{4}-\d{2}-\d{2}'))
        UNION ALL
        SELECT 'set_flag', 'in_set', 'l_returnflag', 0.0,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_returnflag IS NOT NULL
             AND CAST(l_returnflag AS VARCHAR) NOT IN ('A', 'N', 'R'))
        UNION ALL
        SELECT 'set_ls_open', 'in_set', 'l_linestatus', 0.3,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           WHERE l_linestatus IS NOT NULL
             AND CAST(l_linestatus AS VARCHAR) NOT IN ('O'))
        UNION ALL
        SELECT 'uq_line', 'unique', 'l_orderkey,l_linenumber', 0.0,
          (SELECT n FROM n) - (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))),
      li AS (
        SELECT check_id, kind, col_, n.n AS n_rows, v, maxf
        FROM checks, n),
      ord AS (
        SELECT 'uq_orderkey' AS check_id, 'unique' AS kind,
          'o_orderkey' AS col_,
          (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
          (SELECT CAST(count(*) AS BIGINT) FROM orders)
            - (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
               FROM orders) AS v,
          0.0 AS maxf),
      allc AS (SELECT * FROM li UNION ALL SELECT * FROM ord)
      SELECT check_id, kind, col_ AS "column", n_rows,
        v AS n_violations,
        round(CASE WHEN n_rows = 0 THEN 0.0
          ELSE CAST(v AS DOUBLE) / n_rows END, 9) + 0.0 AS violation_frac,
        v * 1000000000 <=
          CAST(round(maxf * 1000000000) AS BIGINT) * n_rows AS passed
      FROM allc
      ORDER BY check_id"""),
    (s, dir) => {
      import graft.stats.Expectations._
      val li = Tables.load(s, dir, "lineitem")
      val orders = Tables.load(s, dir, "orders")
      val out = run(li, Seq(
        NotNull("nn_qty", "l_quantity"),
        InRange("rng_qty", "l_quantity", 1.0, 50.0),
        InRange("rng_disc", "l_discount", 0.0, 0.05, maxFrac = 0.5),
        InSet("set_flag", "l_returnflag", Seq("A", "N", "R")),
        InSet("set_ls_open", "l_linestatus", Seq("O"), maxFrac = 0.3),
        MatchesRegex("re_shipdate", "l_shipdate", "\\d{4}-\\d{2}-\\d{2}"),
        // the synthetic lineitem reuses (orderkey, linenumber) pairs —
        // a PLANTED unique failure beside the passing orders key below
        Unique("uq_line", Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("fk_order", "l_orderkey", orders, "o_orderkey")))
        .unionByName(run(orders, Seq(Unique("uq_orderkey", Seq("o_orderkey")))))
        .orderBy("check_id")
      val verdicts = out.collect()
        .map(r => r.getAs[String]("check_id") -> r.getAs[Boolean]("passed"))
        .toMap
      require(!verdicts("set_ls_open") && !verdicts("uq_line"),
        "the two planted failing checks must fail")
      require(verdicts("fk_order") && verdicts("uq_orderkey"),
        "the clean checks must pass")
      out
    })

  /** Referential-integrity orphan audit
    * ([[graft.stats.DataQuality.orphanKeys]]) over two relations: the
    * intact lineitem→orders FK (zero orphans) and a DELIBERATELY
    * broken orders→even-customers leg that plants ~half the rows as
    * orphans — the oracle replays both anti-join counts and rates. */
  val dqOrphanKeys: Q = Q(
    "dq_orphan_keys",
    Some("""
      WITH a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
          CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null
        FROM lineitem),
      ao AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
          (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
      b AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
          CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null
        FROM orders),
      bo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan FROM orders
        WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
          (SELECT c_custkey FROM customer
           WHERE c_custkey IS NOT NULL AND c_custkey % 2 = 0))
      SELECT 'lineitem.orders' AS relation, a.n_child,
        a.n_null AS n_null_key, ao.n_orphan,
        round(CAST(ao.n_orphan AS DOUBLE) / (a.n_child - a.n_null), 6)
          + 0.0 AS orphan_rate
      FROM a, ao
      UNION ALL
      SELECT 'orders.customer_even', b.n_child, b.n_null, bo.n_orphan,
        round(CAST(bo.n_orphan AS DOUBLE) / (b.n_child - b.n_null), 6)
          + 0.0
      FROM b, bo
      ORDER BY relation"""),
    (s, dir) => {
      val intact = DataQuality.orphanKeys(
        Tables.load(s, dir, "lineitem"), "l_orderkey",
        Tables.load(s, dir, "orders"), "o_orderkey", "lineitem.orders")
      val broken = DataQuality.orphanKeys(
        Tables.load(s, dir, "orders"), "o_custkey",
        Tables.load(s, dir, "customer")
          .filter(col("c_custkey") % 2 === 0),
        "c_custkey", "orders.customer_even")
      val out = intact.unionByName(broken).orderBy("relation")
      val rows = out.collect()
      require(rows(0).getAs[Long]("n_orphan") == 0L,
        s"the intact FK must have zero orphans: ${rows(0)}")
      require(rows(1).getAs[Long]("n_orphan") > 0L,
        s"the planted break must surface orphans: ${rows(1)}")
      out
    })

  override def queries: Seq[Q] =
    Seq(t3Quality, t5Summary, dqBenfordDigits, dqBenfordSummary,
      dqKeyCandidates, dqFdDiscovery, dqExpectations, dqOrphanKeys)
}
