package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.MergeKeys
import graft.stats._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics operators T1–T15 (SURVEY.md §2.5) exercised through the
  * graft.stats library with DuckDB oracles.
  *
  * Floating-point statistics are rounded on BOTH sides (see [[graft.Q]]):
  * the two engines traverse data in different orders, so raw doubles agree
  * only to ~1e-11 relative; rounding decimals are chosen per statistic so
  * the rounding boundary is ≥100× the expected FP jitter.
  */
object StatsQueries extends QueryModule {

  /** T1 column statistics on lineitem's numeric measures. */
  private val t1Cols = Seq("l_quantity", "l_extendedprice", "l_discount")

  private def t1OracleFor(c: String): String =
    s"""SELECT '$c' AS col_name, s.n, s.n_null, s.n_distinct, s.mean, s.std,
        s.min_v, s.max_v, s.q25, s.median, s.q75, s.skew, s.kurt, o.iqr_outliers
      FROM (
        SELECT count($c) AS n, count(*) - count($c) AS n_null,
          count(DISTINCT $c) AS n_distinct,
          ROUND(avg($c), 6) AS mean, ROUND(stddev($c), 4) AS std,
          CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
          ROUND(quantile_cont(CAST($c AS DOUBLE), 0.25), 4) AS q25,
          ROUND(quantile_cont(CAST($c AS DOUBLE), 0.5), 4) AS median,
          ROUND(quantile_cont(CAST($c AS DOUBLE), 0.75), 4) AS q75,
          ROUND(skewness($c), 6) AS skew, ROUND(kurtosis($c), 6) AS kurt
        FROM lineitem) s
      CROSS JOIN (
        SELECT count(*) AS iqr_outliers
        FROM lineitem, (
          SELECT quantile_cont(CAST($c AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST($c AS DOUBLE), 0.75) AS q3
          FROM lineitem) q
        WHERE $c < q.q1 - 1.5 * (q.q3 - q.q1)
           OR $c > q.q3 + 1.5 * (q.q3 - q.q1)) o"""

  val t1ColumnStats: Q = Q(
    "t1_column_stats",
    Some(t1Cols.map(t1OracleFor).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val stats = ColumnStats.describe(li, t1Cols)
      stats.map(st => (st.column, st.n, st.nulls, st.distinct, st.mean.get,
          st.std.get, st.min.get, st.max.get, st.q25.get, st.median.get,
          st.q75.get, st.skew.get, st.kurt.get, st.iqrOutliers.get))
        .toDF("col_name", "n", "n_null", "n_distinct", "mean", "std",
          "min_v", "max_v", "q25", "median", "q75", "skew", "kurt", "iqr_outliers")
        .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
          round(col("mean"), 6).as("mean"), round(col("std"), 4).as("std"),
          col("min_v"), col("max_v"),
          round(col("q25"), 4).as("q25"), round(col("median"), 4).as("median"),
          round(col("q75"), 4).as("q75"),
          round(col("skew"), 6).as("skew"), round(col("kurt"), 6).as("kurt"),
          col("iqr_outliers"))
        .orderBy("col_name")
    })

  /** The approximate-stats path (`percentile_approx` + HLL distinct) —
    * the DEFAULT at 100 TB, where exact quantiles would sort the column
    * ([[ColumnStats]] scaladoc). Rows-only: sketch outputs have no SQL
    * oracle. The algebraic stats (n, nulls, mean, std, min, max) are exact
    * in BOTH paths; the self-assert pins the sketch outputs to their exact
    * invariants — quantiles monotone and inside [min, max], distinct
    * positive — so a broken sketch cannot dump plausible noise. Benched as
    * its own headline line so the 100 TB default path gets its own
    * regression series (the exact path's host-window variance was
    * polluting round comparisons). */
  val t1ColumnStatsApprox: Q = Q(
    "t1_column_stats_approx",
    None,
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val stats = ColumnStats.describe(li, t1Cols, approxQuantiles = true)
      // differential vs the EXACT path (r13 verdict item 8): the sketch
      // outputs must land within pinned relative error of the exact
      // quantiles/distincts, not merely be monotone-plausible —
      // percentile_approx's rank error at the default accuracy is
      // ~1/10000, HLL's standard error ~2%; both budgets below carry
      // generous slack over those (value error vs rank error, small-SF
      // granularity) while still failing a sketch that drifts. Gate
      // (Verify) mode only: the exact twin must not ride into this
      // entry's TIMED bench window — the headline line exists precisely
      // to track the approx path on its own.
      val exact =
        if (Tables.gateMode)
          ColumnStats.describe(li, t1Cols).map(e => e.column -> e).toMap
        else Map.empty[String, ColumnStats.Stats]
      def relErr(a: Double, b: Double): Double =
        math.abs(a - b) / math.max(1e-12, math.abs(b))
      stats.foreach { st =>
        val (mn, q25, med, q75, mx) =
          (st.min.get, st.q25.get, st.median.get, st.q75.get, st.max.get)
        require(mn <= q25 && q25 <= med && med <= q75 && q75 <= mx,
          s"${st.column}: approx quantiles not monotone: $mn $q25 $med $q75 $mx")
        require(st.distinct > 0 && st.n > 0, s"${st.column}: degenerate sketch")
        exact.get(st.column).foreach { e =>
          require(st.n == e.n && st.nulls == e.nulls && mn == e.min.get &&
            mx == e.max.get,
            s"${st.column}: algebraic stats must be EXACT in the approx path")
          Seq(("q25", q25, e.q25.get), ("median", med, e.median.get),
            ("q75", q75, e.q75.get)).foreach { case (name, a, ex) =>
            require(relErr(a, ex) <= 0.05,
              s"${st.column}.$name: approx $a vs exact $ex — relative error " +
                f"${relErr(a, ex)}%.4f exceeds the 5%% budget")
          }
          require(relErr(st.distinct.toDouble, e.distinct.toDouble) <= 0.10,
            s"${st.column}: HLL distinct ${st.distinct} vs exact " +
              s"${e.distinct} exceeds the 10% budget")
        }
      }
      stats.map(st => (st.column, st.n, st.nulls, st.distinct,
          st.mean.get, st.std.get, st.min.get, st.max.get,
          st.q25.get, st.median.get, st.q75.get))
        .toDF("col_name", "n", "n_null", "n_distinct_approx", "mean", "std",
          "min_v", "max_v", "q25", "median", "q75")
        .select(col("col_name"), col("n"), col("n_null"),
          col("n_distinct_approx"),
          round(col("mean"), 6).as("mean"), round(col("std"), 4).as("std"),
          col("min_v"), col("max_v"),
          round(col("q25"), 4).as("q25"), round(col("median"), 4).as("median"),
          round(col("q75"), 4).as("q75"))
        .orderBy("col_name")
    })

  /** T2 pearson correlation pairs in one aggregate pass. */
  private val t2Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val t2Pearson: Q = Q(
    "t2_corr_pearson",
    Some {
      val pairs = for { i <- t2Cols.indices; j <- (i + 1) until t2Cols.length }
        yield (t2Cols(i), t2Cols(j))
      pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col1, '$b' AS col2, ROUND(corr($a, $b), 6) AS r,
            count(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 END) AS n
          FROM lineitem"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col1, col2")
    },
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val pairs = Correlation.pearson(li, t2Cols, minPeriods = 10)
      Correlation.toDF(s, pairs)
        .select(col("col1"), col("col2"), round(col("r"), 6).as("r"), col("n"))
        .orderBy("col1", "col2")
    })

  /** T2 spearman via average-rank transform + pearson on ranks. */
  val t2Spearman: Q = Q(
    "t2_corr_spearman",
    Some("""
      WITH nn AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      r AS (
        SELECT rank() OVER (ORDER BY x) + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
               rank() OVER (ORDER BY y) + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
        FROM nn)
      SELECT ROUND(corr(rx, ry), 6) AS rho, count(*) AS n FROM r"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val p = Correlation.spearmanPair(li, "l_quantity", "l_extendedprice")
      import s.implicits._
      Seq((p.r.get, p.n)).toDF("rho", "n")
        .select(round(col("rho"), 6).as("rho"), col("n"))
    })

  /** T6 demographics breakdown (long metric/value format) of a filtered
    * cohort — customer as the hub, acctbal as the age analog, mktsegment as
    * the sex analog. */
  val t6Breakdown: Q = Q(
    "t6_breakdown",
    Some("""
      WITH cohort AS (SELECT * FROM customer WHERE c_acctbal >= 0)
      SELECT 'age_max' AS metric, CAST(max(c_acctbal) AS DOUBLE) AS value FROM cohort
      UNION ALL
      SELECT 'age_min', CAST(min(c_acctbal) AS DOUBLE) FROM cohort
      UNION ALL
      SELECT 'n_participants', CAST(count(DISTINCT c_custkey) AS DOUBLE) FROM cohort
      UNION ALL
      SELECT 'c_mktsegment_' || c_mktsegment, CAST(count(DISTINCT c_custkey) AS DOUBLE)
      FROM cohort GROUP BY c_mktsegment
      ORDER BY metric"""),
    (s, dir) => {
      val cohort = Tables.load(s, dir, "customer").filter(col("c_acctbal") >= 0)
      val metrics = CohortReports.breakdown(
        cohort, MergeKeys("c_custkey"), ageCol = Some("c_acctbal"),
        categoryCol = Some("c_mktsegment"))
      CohortReports.breakdownDF(s, metrics).orderBy("metric")
    })

  /** T7 cumulative filter funnel: one conditional-count-distinct aggregate
    * instead of the reference's K full re-queries. */
  private val funnelBaseSql =
    """SELECT c.c_custkey AS k, c.c_acctbal, c.c_mktsegment, o.o_totalprice
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey"""

  val t7Funnel: Q = Q(
    "t7_filter_funnel",
    Some(s"""
      WITH base AS ($funnelBaseSql),
      c0 AS (SELECT count(DISTINCT k) AS n FROM base),
      c1 AS (SELECT count(DISTINCT CASE WHEN c_acctbal >= 0 THEN k END) AS n FROM base),
      c2 AS (SELECT count(DISTINCT CASE WHEN c_acctbal >= 0
                AND c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN k END) AS n FROM base),
      c3 AS (SELECT count(DISTINCT CASE WHEN c_acctbal >= 0
                AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
                AND o_totalprice > 150000.0 THEN k END) AS n FROM base)
      SELECT 0 AS step, 'baseline' AS label, c0.n AS n, 0 AS removed, 0.0 AS removal_pct FROM c0
      UNION ALL
      SELECT 1, 'acctbal_range', c1.n, c0.n - c1.n,
        ROUND((c0.n - c1.n) * 1.0 / c0.n * 100.0, 4) FROM c0, c1
      UNION ALL
      SELECT 2, 'segment_in', c2.n, c1.n - c2.n,
        ROUND((c1.n - c2.n) * 1.0 / c1.n * 100.0, 4) FROM c1, c2
      UNION ALL
      SELECT 3, 'order_value', c3.n, c2.n - c3.n,
        ROUND((c2.n - c3.n) * 1.0 / c2.n * 100.0, 4) FROM c2, c3
      ORDER BY step"""),
    (s, dir) => {
      val base = funnelBase(s, dir)
      val steps = FilterFunnel.funnel(base, "k", Seq(
        "acctbal_range" -> (col("c_acctbal") >= 0),
        "segment_in" -> col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
        "order_value" -> (col("o_totalprice") > 150000.0)))
      FilterFunnel.toDF(s, steps)
        .select(col("step"), col("label"), col("n"), col("removed"),
          round(col("removalPct"), 4).as("removal_pct"))
        .orderBy("step")
    })

  /** T8 per-filter impact vs baseline (each alone + combined). */
  val t8Impact: Q = Q(
    "t8_filter_impact",
    Some(s"""
      WITH base AS ($funnelBaseSql),
      c AS (SELECT count(DISTINCT k) AS n0,
        count(DISTINCT CASE WHEN c_acctbal >= 0 THEN k END) AS n1,
        count(DISTINCT CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN k END) AS n2,
        count(DISTINCT CASE WHEN o_totalprice > 150000.0 THEN k END) AS n3,
        count(DISTINCT CASE WHEN c_acctbal >= 0
          AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
          AND o_totalprice > 150000.0 THEN k END) AS n4
        FROM base)
      SELECT 0 AS step, 'baseline' AS label, n0 AS n, 0 AS removed, 0.0 AS removal_pct FROM c
      UNION ALL SELECT 1, 'acctbal_range', n1, n0 - n1,
        ROUND((n0 - n1) * 1.0 / n0 * 100.0, 4) FROM c
      UNION ALL SELECT 2, 'segment_in', n2, n0 - n2,
        ROUND((n0 - n2) * 1.0 / n0 * 100.0, 4) FROM c
      UNION ALL SELECT 3, 'order_value', n3, n0 - n3,
        ROUND((n0 - n3) * 1.0 / n0 * 100.0, 4) FROM c
      UNION ALL SELECT 4, 'all_filters', n4, n0 - n4,
        ROUND((n0 - n4) * 1.0 / n0 * 100.0, 4) FROM c
      ORDER BY step"""),
    (s, dir) => {
      val base = funnelBase(s, dir)
      val steps = FilterFunnel.impact(base, "k", Seq(
        "acctbal_range" -> (col("c_acctbal") >= 0),
        "segment_in" -> col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
        "order_value" -> (col("o_totalprice") > 150000.0)))
      FilterFunnel.toDF(s, steps)
        .select(col("step"), col("label"), col("n"), col("removed"),
          round(col("removalPct"), 4).as("removal_pct"))
        .orderBy("step")
    })

  private def funnelBase(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(c("c_custkey").as("k"), c("c_acctbal"), c("c_mktsegment"), o("o_totalprice"))
  }

  /** T9 OLS of extendedprice on quantity (p-value is library-only — DuckDB
    * has no t CDF; it is asserted in the ScalaTest spec instead). */
  val t9Ols: Q = Q(
    "t9_ols_regression",
    Some("""
      SELECT
        ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        ROUND(regr_intercept(l_extendedprice, l_quantity), 5) AS intercept,
        ROUND(corr(l_extendedprice, l_quantity), 6) AS r,
        ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        count(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL THEN 1 END) AS n,
        CAST(min(l_quantity) AS DOUBLE) AS x_min,
        CAST(max(l_quantity) AS DOUBLE) AS x_max
      FROM lineitem"""),
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val r = Regression.ols(li, "l_quantity", "l_extendedprice").get
      Seq((r.slope, r.intercept, r.r, r.r2, r.n, r.xMin, r.xMax))
        .toDF("slope", "intercept", "r", "r2", "n", "x_min", "x_max")
        .select(round(col("slope"), 6).as("slope"),
          round(col("intercept"), 5).as("intercept"),
          round(col("r"), 6).as("r"), round(col("r2"), 6).as("r2"),
          col("n"), col("x_min"), col("x_max"))
    })

  /** T12 one-way ANOVA of acctbal across market segments (p library-only).
    *
    * Driver-proofing (r1 shipped a hash mismatch that passed locally): both
    * engines now derive F/eta²/SS from EXACT decimal group sums (sum x,
    * sum x² as DECIMAL, cast to double after) instead of var_samp doubles,
    * and the rounding tiers are coarse (f 4, eta² 6, SS-millions 3) so the
    * residual ~ulp summation-order jitter sits ≥1e8× below the boundary.
    * The Anova library API (used by specs / library users) is unchanged.
    */
  val t12Anova: Q = Q(
    "t12_anova",
    Some("""
      WITH g AS (
        SELECT c_mktsegment AS grp, count(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                   * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s2
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY c_mktsegment),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS k,
          sum(s1) / sum(n) AS gm FROM g),
      ss AS (
        SELECT
          (SELECT sum(n * (s1 / n - gm) * (s1 / n - gm)) FROM g, tot) AS ssb,
          (SELECT sum(s2 - s1 * s1 / n) FROM g) AS ssw,
          (SELECT k - 1 FROM tot) AS dfb,
          (SELECT n_total - k FROM tot) AS dfw)
      SELECT
        ROUND((ssb / dfb) / (ssw / dfw), 4) AS f_stat,
        dfb AS df_between, dfw AS df_within,
        ROUND(ssb / 1000000.0, 3) AS ssb_millions,
        ROUND(ssw / 1000000.0, 3) AS ssw_millions,
        ROUND(ssb / (ssb + ssw), 6) AS eta_squared
      FROM ss"""),
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val cust = Tables.load(s, dir, "customer")
      val dec = col("c_acctbal").cast(DecimalType(18, 2))
      val g = cust
        .filter(col("c_mktsegment").isNotNull && col("c_acctbal").isNotNull)
        .groupBy(col("c_mktsegment").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(dec).cast("double").as("s1"),
          sum(dec * dec).cast("double").as("s2"))
      val tot = g.agg(sum(col("n")).as("n_total"), count(lit(1)).as("k"),
        (sum(col("s1")) / sum(col("n"))).as("gm"))
      val m = col("s1") / col("n")
      val ss = g.crossJoin(tot).agg(
        sum(col("n") * (m - col("gm")) * (m - col("gm"))).as("ssb"),
        sum(col("s2") - col("s1") * col("s1") / col("n")).as("ssw"),
        first(col("k")).as("k"), first(col("n_total")).as("n_total"))
      ss.select(
        round((col("ssb") / (col("k") - 1))
          / (col("ssw") / (col("n_total") - col("k"))), 4).as("f_stat"),
        (col("k") - 1).as("df_between"),
        (col("n_total") - col("k")).as("df_within"),
        round(col("ssb") / 1000000.0, 3).as("ssb_millions"),
        round(col("ssw") / 1000000.0, 3).as("ssw_millions"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_squared"))
    })

  /** T13 pairwise t-tests across market segments (p/Bonferroni library-only). */
  val t13TTests: Q = Q(
    "t13_pairwise_ttests",
    Some("""
      WITH g AS (
        SELECT c_mktsegment AS grp, count(*) AS n, avg(c_acctbal) AS m,
          var_samp(c_acctbal) AS v
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY c_mktsegment)
      SELECT a.grp AS group1, b.grp AS group2, a.n AS n1, b.n AS n2,
        ROUND(a.m - b.m, 4) AS mean_diff,
        ROUND((a.m - b.m) / sqrt((((a.n - 1) * a.v + (b.n - 1) * b.v)
          / (a.n + b.n - 2)) * (1.0 / a.n + 1.0 / b.n)), 6) AS t_stat,
        ROUND((a.m - b.m) / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
          / (a.n + b.n - 2)), 6) AS cohens_d
      FROM g a JOIN g b ON a.grp < b.grp
      ORDER BY group1, group2"""),
    (s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ts = Anova.pairwiseTTests(cust, "c_mktsegment", "c_acctbal")
      ts.map(t => (t.group1, t.group2, t.n1, t.n2, t.meanDiff, t.tStat, t.cohensD))
        .toDF("group1", "group2", "n1", "n2", "mean_diff", "t_stat", "cohens_d")
        .select(col("group1"), col("group2"), col("n1"), col("n2"),
          round(col("mean_diff"), 4).as("mean_diff"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("cohens_d"), 6).as("cohens_d"))
        .orderBy("group1", "group2")
    })

  /** T15 multi-valued cell token extraction (p_name as the packed cell). */
  val t15Sites: Q = Q(
    "t15_site_values",
    Some("""
      SELECT site FROM (
        SELECT DISTINCT trim(unnest(regexp_split_to_array(
          replace(replace(p_name, '{', ''), '}', ''), '[,;\s]+'))) AS site
        FROM part) t
      WHERE length(site) > 0
      ORDER BY site"""),
    (s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      SiteValues.distinctValues(part, "p_name").toDF("site").orderBy("site")
    })

  /** Incremental stats (SURVEY §7.4 #13): sketch lineitem per l_returnflag
    * partition, then MERGE the partition sketches — the oracle aggregates
    * the whole table in one pass, so a hash match proves the
    * partition-sketch→merge path loses nothing vs a full rescan. Derived
    * mean/var are double arithmetic over the exact decimal sums, written
    * identically on both sides (bit-equal; rounding is belt-and-braces).
    * The oracle widens ONE square operand to DECIMAL(19,6): DuckDB runs
    * (18,6)×(18,6) in int64 and overflows on large measures, while ≥19
    * digits forces int128 — the value is identical. The HLL distinct leg
    * has no DuckDB twin — its union-exactness and accuracy are pinned in
    * StatsSpec. */
  private val incCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  val incStatsMerge: Q = Q(
    "inc_stats_merge",
    Some {
      val legs = incCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n, count($c) AS n_value,
          CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
          CAST(SUM(CAST($c AS DECIMAL(18,6)) * CAST($c AS DECIMAL(19,6))) AS DOUBLE) AS sum_sq,
          CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
        FROM lineitem"""
      }
      s"""WITH s AS (${legs.mkString(" UNION ALL ")})
      SELECT col_name, n, n_value, sum_v, min_v, max_v,
        ROUND(sum_v / n_value, 6) AS mean_v,
        ROUND(sum_sq / n_value - (sum_v / n_value) * (sum_v / n_value), 4) AS var_pop
      FROM s
      ORDER BY col_name"""
    },
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sketches = IncrementalStats.sketch(li, incCols, col("l_returnflag"))
      IncrementalStats.merge(sketches)
        .select(col("col_name"), col("n"), col("n_value"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v"), col("max_v"),
          round(col("mean_v"), 6).as("mean_v"),
          round(col("var_pop"), 4).as("var_pop"))
        .orderBy("col_name")
    })

  /** Salted exact distinct ([[graft.ops.Skew]]): value-hash salting splits
    * a hot grouping key over many reducers; summing the disjoint per-bucket
    * distinct counts must equal the direct COUNT(DISTINCT). */
  val skwSaltedDistinct: Q = Q(
    "skw_salted_distinct",
    Some("""
      SELECT l_returnflag AS k, count(DISTINCT l_partkey) AS n_distinct
      FROM lineitem
      GROUP BY 1
      ORDER BY k"""),
    (s, dir) =>
      graft.ops.Skew.saltedCountDistinct(
          Tables.load(s, dir, "lineitem").withColumnRenamed("l_returnflag", "k"),
          Seq("k"), "l_partkey", buckets = 64)
        .orderBy("k"))

  /** Mergeable log-bucket quantile sketch ([[QuantileSketch]]) — PROMOTED
    * to oracle-checked (r15 verdict item 3, the t1-approx template): the
    * sketch estimates themselves have no SQL mirror (JVM `log` bucket
    * boundaries), so the gate emits per q the EXACT interpolated
    * percentile (Spark `percentile` ≡ DuckDB `quantile_cont`, the t17
    * parity) plus the COMPUTED rel-err verdict of the sketch against it
    * at the pinned 2.1% budget — DuckDB rebuilds the exact values and
    * pins the verdict TRUE, so a drifting sketch flips a hashed cell,
    * not just an in-gate assert. */
  val incQuantileSketch: Q = Q(
    "inc_quantile_sketch",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      e AS (SELECT round(quantile_cont(v, 0.25), 6) AS e25,
                   round(quantile_cont(v, 0.50), 6) AS e50,
                   round(quantile_cont(v, 0.75), 6) AS e75 FROM b)
      SELECT 0.25 AS q, e25 + 0.0 AS exact_v, TRUE AS within_budget FROM e
      UNION ALL SELECT 0.50, e50 + 0.0, TRUE FROM e
      UNION ALL SELECT 0.75, e75 + 0.0, TRUE FROM e
      ORDER BY q"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val merged = QuantileSketch.merge(
        QuantileSketch.sketch(li, Seq("l_extendedprice"), col("l_returnflag")))
      val qs = Seq(0.25, 0.5, 0.75)
      val est = QuantileSketch.quantiles(merged, "l_extendedprice", qs)
      val exactRow = li.agg(
        percentile(col("l_extendedprice"), lit(0.25)).as("e25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("e50"),
        percentile(col("l_extendedprice"), lit(0.75)).as("e75")).head()
      import s.implicits._
      qs.zipWithIndex.map { case (q, i) =>
        val ex = exactRow.getDouble(i)
        val rel = math.abs(est(q) - ex) / math.max(math.abs(ex), 1e-12)
        require(rel <= 0.021, // loud message first; the hash still
          // carries the verdict if this require is ever loosened
          s"quantile sketch q=$q drifted: est ${est(q)} vs exact $ex")
        (q, BigDecimal(ex).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0, rel <= 0.021)
      }.toDF("q", "exact_v", "within_budget").orderBy("q")
    })

  /** Exact grouped percentiles (p50/p95/p99): Spark's `percentile` and
    * DuckDB's `quantile_cont` share the (n−1)·p linear-interpolation
    * definition; ROUND(…,6) absorbs last-ulp interpolation differences.
    * Exact percentile sorts each group in one pass — the right call for
    * bounded groups; the mergeable-sketch path (inc_quantile_sketch) is
    * the unbounded-cardinality alternative. */
  val t17Percentiles: Q = Q(
    "t17_group_percentiles",
    Some("""
      SELECT l_returnflag,
        ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
        ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 6).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 6).as("p95"),
          round(percentile(col("l_extendedprice"), lit(0.99)), 6).as("p99"))
        .orderBy("l_returnflag"))

  /** Chi-square contingency cells ([[graft.stats.Contingency]]): observed
    * vs expected counts and per-cell χ² contributions for flag × status
    * over the FULL observed-levels grid — a structurally-empty cell
    * appears with observed = 0 and contrib = expected (dropping those
    * terms understates χ² exactly when association is strongest).
    * Expected counts derive from exact integer margins, so the table
    * mirrors bit-for-bit before the shared ROUND; the χ² statistic/p-value
    * (their sum + commons-math3 CDF) is spec-pinned against an
    * independent implementation. */
  val t18Contingency: Q = Q(
    "t18_contingency_chi2",
    Some("""
      WITH cts AS (
        SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS cnt
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        GROUP BY 1, 2),
      ga AS (SELECT a, SUM(cnt) AS ra FROM cts GROUP BY a),
      gb AS (SELECT b, SUM(cnt) AS cb FROM cts GROUP BY b),
      nn AS (SELECT SUM(cnt) AS n FROM cts),
      w AS (
        SELECT ga.a, gb.b, CAST(COALESCE(cts.cnt, 0) AS BIGINT) AS observed,
          ra, cb, n
        FROM ga CROSS JOIN gb CROSS JOIN nn
        LEFT JOIN cts ON ga.a = cts.a AND gb.b = cts.b)
      SELECT a, b, observed,
        ROUND(CAST(ra AS DOUBLE) * cb / n, 6) AS expected,
        ROUND((observed - CAST(ra AS DOUBLE) * cb / n)
              * (observed - CAST(ra AS DOUBLE) * cb / n)
              / (CAST(ra AS DOUBLE) * cb / n), 6) AS contrib
      FROM w
      ORDER BY a, b"""),
    (s, dir) =>
      graft.stats.Contingency
        .cells(Tables.load(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
        .select(col("a"), col("b"), col("observed"),
          round(col("expected"), 6).as("expected"),
          round(col("contrib"), 6).as("contrib"))
        .orderBy("a", "b"))

  /** Winsorization ([[graft.transform.Winsorize]]): every row's price
    * clipped to the corpus [p1, p99] — bounds from one exact-percentile
    * aggregate (rounded so both engines clip at the same line), then a
    * narrow map. Unclipped values pass through bit-for-bit, so the gate
    * compares all 60k rows. */
  val t19Winsorize: Q = Q(
    "t19_winsorize_clip",
    Some("""
      WITH b AS (
        SELECT ROUND(quantile_cont(l_extendedprice, 0.01), 6) AS lo,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS hi
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        least(greatest(l_extendedprice, lo), hi) AS price_w
      FROM lineitem, b
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) =>
      graft.transform.Winsorize
        .clip(Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price_w"))
        .orderBy("l_orderkey", "l_linenumber"))

  /** PSI drift between the first and second half-month of events
    * ([[graft.stats.Drift]]): decile bins from the reference side's exact
    * quantiles (rounded — the proven percentile-parity class), static
    * unrolled binning, shares floored at 1e-6. The oracle rebuilds the
    * whole per-bin table; PSI is the term sum. */
  val t20PsiDrift: Q = Q(
    "t20_psi_drift",
    Some("""
      WITH refs AS (
        SELECT value FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
      curs AS (
        SELECT value FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
      e AS (
        SELECT list_transform(
          quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
          t -> round(t, 6)) AS edges
        FROM refs),
      rb AS (
        SELECT list_sum(list_transform(e.edges,
          t -> CASE WHEN r.value >= t THEN 1 ELSE 0 END)) AS bin
        FROM refs r, e),
      rc AS (SELECT bin, count(*) AS ref_cnt FROM rb GROUP BY 1),
      cb AS (
        SELECT list_sum(list_transform(e.edges,
          t -> CASE WHEN c.value >= t THEN 1 ELSE 0 END)) AS bin
        FROM curs c, e),
      cc AS (SELECT bin, count(*) AS cur_cnt FROM cb GROUP BY 1),
      j AS (
        SELECT COALESCE(rc.bin, cc.bin) AS bin,
          COALESCE(ref_cnt, 0) AS ref_cnt, COALESCE(cur_cnt, 0) AS cur_cnt
        FROM rc FULL JOIN cc ON rc.bin = cc.bin),
      t AS (
        SELECT bin, ref_cnt, cur_cnt,
          greatest(CAST(ref_cnt AS DOUBLE)
            / CAST((SELECT sum(ref_cnt) FROM j) AS DOUBLE), 1e-6) AS p,
          greatest(CAST(cur_cnt AS DOUBLE)
            / CAST((SELECT sum(cur_cnt) FROM j) AS DOUBLE), 1e-6) AS q
        FROM j)
      SELECT CAST(bin AS INT) AS bin, ref_cnt, cur_cnt,
        ROUND((q - p) * ln(q / p), 6) AS term
      FROM t
      ORDER BY bin"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-15 00:00:00"))
      graft.stats.Drift
        .psiTable(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value")
        .select(col("bin").cast("int").as("bin"), col("ref_cnt"),
          col("cur_cnt"), round(col("term"), 6).as("term"))
        .orderBy("bin")
    })

  /** Z-score standardization ([[graft.transform.Standardize]]): every
    * row's price standardized against decimal-exact corpus moments — the
    * mean/stddev derivation is the identical double sequence in both
    * engines because the sums are exact. All 60k rows compared. */
  val t21Standardize: Q = Q(
    "t21_standardize_zscore",
    Some("""
      WITH s AS (
        SELECT count(l_extendedprice) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        ROUND((l_extendedprice - sm / n)
              / sqrt((sq - sm * sm / n) / (n - 1)), 6) AS price_z
      FROM lineitem, s
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) =>
      graft.transform.Standardize
        .zscore(Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price_z"))
        .orderBy("l_orderkey", "l_linenumber"))

  /** Group-wise z-score ([[graft.transform.Standardize.zscoreByGroup]]):
    * each row standardized against its return-flag group's decimal-exact
    * moments via a broadcast moment table (data never shuffles). */
  val t22GroupZscore: Q = Q(
    "t22_group_zscore",
    Some("""
      WITH m AS (
        SELECT l_returnflag, count(l_extendedprice) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
        FROM lineitem GROUP BY 1)
      SELECT l.l_orderkey, l.l_linenumber,
        ROUND((l.l_extendedprice - sm / n)
              / sqrt((sq - sm * sm / n) / (n - 1)), 6) AS price_z
      FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
      ORDER BY l.l_orderkey, l.l_linenumber"""),
    (s, dir) =>
      graft.transform.Standardize
        .zscoreByGroup(Tables.load(s, dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber",
              "l_extendedprice"),
          "l_returnflag", "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price_z"))
        .orderBy("l_orderkey", "l_linenumber"))

  /** Robust (median/MAD) group standardization
    * ([[graft.transform.Standardize.robustZByGroup]]): both engines round
    * the two quantiles at 6 decimals BEFORE the ratio, so every per-row z
    * derives from identical doubles — quantile interpolation parity is
    * the same claim t17_group_percentiles pins. */
  val t26RobustZ: Q = Q(
    "t26_robust_zscore",
    Some("""
      WITH med AS (
        SELECT l_returnflag,
          ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS med
        FROM lineitem GROUP BY 1),
      mad AS (
        SELECT l.l_returnflag,
          ROUND(quantile_cont(abs(l.l_extendedprice - m.med), 0.5), 6) AS mad
        FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        GROUP BY 1)
      SELECT l.l_orderkey, l.l_linenumber,
        CASE WHEN d.mad > 0
          THEN ROUND((l.l_extendedprice - m.med) / (1.4826 * d.mad), 6)
        END AS robust_z
      FROM lineitem l
      JOIN med m ON l.l_returnflag = m.l_returnflag
      JOIN mad d ON l.l_returnflag = d.l_returnflag
      ORDER BY l.l_orderkey, l.l_linenumber, robust_z NULLS FIRST"""),
    (s, dir) =>
      graft.transform.Standardize
        .robustZByGroup(Tables.load(s, dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber",
              "l_extendedprice"),
          "l_returnflag", "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("robust_z"))
        // (orderkey, linenumber) is NOT unique in the synthetic lineitem —
        // the z value itself breaks the tie on both sides
        .orderBy("l_orderkey", "l_linenumber", "robust_z"))

  /** Frequency-rank category indexing ([[graft.transform.Encode]]): a
    * deterministic broadcast dictionary (most frequent = 0, value
    * tie-break) applied per row — no hashing, no drift. */
  val t23CategoryIndex: Q = Q(
    "t23_category_index",
    Some("""
      WITH d AS (
        SELECT o_orderpriority AS p, count(*) AS cnt
        FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
      x AS (
        SELECT p, row_number() OVER (ORDER BY cnt DESC, p) - 1 AS idx
        FROM d)
      SELECT o.o_orderkey, CAST(x.idx AS BIGINT) AS idx
      FROM orders o JOIN x ON o.o_orderpriority = x.p
      ORDER BY o_orderkey"""),
    (s, dir) =>
      graft.transform.Encode
        .categoryIndex(Tables.load(s, dir, "orders"), "o_orderpriority",
          "idx")
        .select(col("o_orderkey"), col("idx").cast("long").as("idx"))
        .orderBy("o_orderkey"))

  /** Leave-one-out target encoding ([[graft.transform.Encode]]): each
    * event's type replaced by the mean value of the OTHER events of that
    * type — decimal-exact sums make the per-row encodings mirror. */
  val t24TargetEncode: Q = Q(
    "t24_target_encode_loo",
    Some("""
      WITH m AS (
        SELECT event_type, count(value) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sm
        FROM events GROUP BY 1)
      SELECT e.event_id, ROUND((sm - e.value) / (n - 1), 6) AS te
      FROM events e JOIN m ON e.event_type = m.event_type
      ORDER BY event_id"""),
    (s, dir) =>
      graft.transform.Encode
        .targetEncodeLoo(Tables.load(s, dir, "events"), "event_type",
          "value", "te")
        .select(col("event_id"), col("te"))
        .orderBy("event_id"))

  /** Per-domain PSI ([[graft.stats.Drift.psiByGroup]]): drift between the
    * half-months scored per event type against that type's OWN reference
    * deciles, one distributed pass. PSI terms are non-negative, so the
    * per-group sum is same-sign and ROUND(…,6) absorbs reorder noise. */
  val t25PsiByDomain: Q = Q(
    "t25_psi_by_domain",
    Some("""
      WITH refs AS (
        SELECT event_type AS g, value AS v FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
      curs AS (
        SELECT event_type AS g, value AS v FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
      e AS (
        SELECT g, list_transform(
          quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
          t -> round(t, 6)) AS edges
        FROM refs GROUP BY g),
      rb AS (
        SELECT refs.g, list_sum(list_transform(e.edges,
          t -> CASE WHEN refs.v >= t THEN 1 ELSE 0 END)) AS bin
        FROM refs JOIN e ON refs.g = e.g),
      rc AS (SELECT g, bin, count(*) AS rn FROM rb GROUP BY 1, 2),
      cb AS (
        SELECT curs.g, list_sum(list_transform(e.edges,
          t -> CASE WHEN curs.v >= t THEN 1 ELSE 0 END)) AS bin
        FROM curs JOIN e ON curs.g = e.g),
      cc AS (SELECT g, bin, count(*) AS cn FROM cb GROUP BY 1, 2),
      j AS (
        SELECT COALESCE(rc.g, cc.g) AS g, COALESCE(rc.bin, cc.bin) AS bin,
          COALESCE(rn, 0) AS rn, COALESCE(cn, 0) AS cn
        FROM rc FULL JOIN cc ON rc.g = cc.g AND rc.bin = cc.bin),
      t AS (
        SELECT g, bin, rn, cn,
          greatest(CAST(rn AS DOUBLE)
            / CAST(sum(rn) OVER (PARTITION BY g) AS DOUBLE), 1e-6) AS p,
          greatest(CAST(cn AS DOUBLE)
            / CAST(sum(cn) OVER (PARTITION BY g) AS DOUBLE), 1e-6) AS q
        FROM j)
      SELECT g AS event_type, ROUND(sum((q - p) * ln(q / p)), 6) AS psi
      FROM t
      GROUP BY g
      ORDER BY event_type"""),
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-15 00:00:00"))
      graft.stats.Drift
        .psiByGroup(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "event_type", "value")
    })

  /** Categorical PSI ([[graft.stats.Drift.psiCategoricalTable]]): share
    * drift over market segments between the full reference population and
    * a current slice that drops a third of every non-BUILDING segment —
    * the label/language/cluster-mix monitor (no quantile pass; categories
    * are their own bins; NULL would be a real category via the sentinel).
    * Same 1e-6 floor and (q−p)·ln(q/p) terms as t20. */
  val t27PsiCategorical: Q = Q(
    "t27_psi_categorical",
    Some("""
      WITH r AS (
        SELECT COALESCE(CAST(c_mktsegment AS VARCHAR), '<null>') AS category,
          count(*) AS ref_cnt
        FROM customer GROUP BY 1),
      c AS (
        SELECT COALESCE(CAST(c_mktsegment AS VARCHAR), '<null>') AS category,
          count(*) AS cur_cnt
        FROM customer
        WHERE c_custkey % 3 <> 0 OR c_mktsegment = 'BUILDING'
        GROUP BY 1),
      j AS (
        SELECT COALESCE(r.category, c.category) AS category,
          COALESCE(ref_cnt, 0) AS ref_cnt, COALESCE(cur_cnt, 0) AS cur_cnt
        FROM r FULL JOIN c ON r.category = c.category),
      t AS (
        SELECT category, ref_cnt, cur_cnt,
          greatest(CAST(ref_cnt AS DOUBLE)
            / CAST((SELECT sum(ref_cnt) FROM j) AS DOUBLE), 1e-6) AS p,
          greatest(CAST(cur_cnt AS DOUBLE)
            / CAST((SELECT sum(cur_cnt) FROM j) AS DOUBLE), 1e-6) AS q
        FROM j)
      SELECT category, ref_cnt, cur_cnt,
        ROUND((q - p) * ln(q / p), 6) AS term
      FROM t
      ORDER BY category"""),
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val cur = cust.filter(
        col("c_custkey") % 3 =!= 0 || col("c_mktsegment") === "BUILDING")
      graft.stats.Drift.psiCategoricalTable(cust, cur, "c_mktsegment")
        .select(col("category"), col("ref_cnt"), col("cur_cnt"),
          round(col("term"), 6).as("term"))
        .orderBy("category")
    })

  /** Shared CTEs for the MI gates: a dependent categorical pair (b copies
    * a on low discounts, so I(A;B) > 0 by construction) with marginals. */
  private val miCte = """
      src AS (
        SELECT l_returnflag AS a,
          CASE WHEN l_discount <= 0.05 THEN l_returnflag
               ELSE l_linestatus END AS b
        FROM lineitem),
      c AS (SELECT a, b, count(*) AS observed FROM src GROUP BY a, b),
      m AS (
        SELECT a, b, observed,
          SUM(observed) OVER () AS n,
          SUM(observed) OVER (PARTITION BY a) AS ra,
          SUM(observed) OVER (PARTITION BY b) AS cb
        FROM c),
      t AS (
        SELECT a, b, observed, n, ra, cb,
          round((CAST(observed AS DOUBLE) / n) *
            ln((CAST(observed AS DOUBLE) * n) /
               (CAST(ra AS DOUBLE) * cb)), 9) AS term
        FROM m)"""

  private def miPair(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = Tables.load(s, dir, "lineitem")
    li.select(col("l_returnflag").as("a"),
      when(col("l_discount") <= 0.05, col("l_returnflag"))
        .otherwise(col("l_linestatus")).as("b"))
  }

  /** Per-cell MI terms ([[graft.stats.Contingency.miTerms]]): every
    * (o/n)·ln(o·n/(ra·cb)) cell hash-compared at 9 decimals. */
  val t28MiTerms: Q = Q(
    "t28_mi_terms",
    Some(s"""
      WITH $miCte
      SELECT a, b, observed, term
      FROM t
      ORDER BY a, b"""),
    (s, dir) =>
      graft.stats.Contingency.miTerms(miPair(s, dir), "a", "b")
        .select("a", "b", "observed", "term")
        .orderBy("a", "b"))

  /** The MI / entropy / NMI scalar row ([[graft.stats.Contingency
    * .mutualInformation]]): decimal folds of the rounded per-cell terms,
    * so the scalars are engine-exact. */
  val t28MutualInformation: Q = Q(
    "t28_mutual_information",
    Some(s"""
      WITH $miCte,
      s AS (
        SELECT
          CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS mi,
          CAST(MAX(n) AS BIGINT) AS n
        FROM t),
      ea AS (
        SELECT CAST(SUM(CAST(round(-(CAST(ra AS DOUBLE) / n) *
            ln(CAST(ra AS DOUBLE) / n), 9) AS DECIMAL(38,12))) AS DOUBLE)
          AS h_a
        FROM (SELECT DISTINCT a, ra, n FROM m)),
      eb AS (
        SELECT CAST(SUM(CAST(round(-(CAST(cb AS DOUBLE) / n) *
            ln(CAST(cb AS DOUBLE) / n), 9) AS DECIMAL(38,12))) AS DOUBLE)
          AS h_b
        FROM (SELECT DISTINCT b, cb, n FROM m))
      SELECT mi, h_a, h_b,
        CASE WHEN LEAST(h_a, h_b) > 0 THEN mi / LEAST(h_a, h_b) END AS nmi,
        n
      FROM s, ea, eb"""),
    (s, dir) =>
      graft.stats.Contingency.mutualInformation(miPair(s, dir), "a", "b"))

  private val BootB = 200; private val BootSeed = "graft-boot"

  /** Shared resample-means CTEs: Poisson(1) counts from the identity-hash
    * fraction of (seed, b, c_custkey) through the inverse-CDF threshold
    * literals [[graft.stats.Bootstrap.thresholds]] — the SAME Scala
    * doubles are inlined into both engines, so every draw is
    * bit-identical. */
  private val bootCte: String = {
    val u = s"""CAST(concat('0x', substr(md5(concat_ws('|', '$BootSeed',
        CAST(bs.b AS VARCHAR), CAST(c_custkey AS VARCHAR))), 1, 8))
        AS BIGINT) / 4294967296.0"""
    s"""
      bs AS (SELECT CAST(unnest(range(0, $BootB)) AS INT) AS b),
      rws AS (
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,6)) AS v
        FROM customer WHERE c_acctbal IS NOT NULL),
      drawn AS (
        SELECT bs.b, rws.v, $u AS u
        FROM rws, bs),
      cnts AS (
        SELECT b, v, ${graft.stats.Bootstrap.poissonCountSql("u")} AS cnt
        FROM drawn),
      bmeans AS (
        SELECT b, CAST(SUM(cnt) AS BIGINT) AS n_eff,
          CASE WHEN SUM(cnt) > 0
            THEN round(CAST(SUM(cnt * v) AS DOUBLE) / SUM(cnt), 6)
          END AS boot_mean
        FROM cnts GROUP BY b)"""
  }

  /** All 200 Poisson-bootstrap resample means of customer.c_acctbal —
    * the oracle rebuilds every draw, effective count, and mean
    * ([[graft.stats.Bootstrap.resampleMeans]]). */
  val bsResampleMeans: Q = Q(
    "bs_resample_means",
    Some(s"""
      WITH $bootCte
      SELECT b, n_eff, boot_mean FROM bmeans ORDER BY b"""),
    (s, dir) =>
      Bootstrap.resampleMeans(Tables.load(s, dir, "customer"),
          Seq("c_custkey"), col("c_acctbal"), BootB, BootSeed)
        .orderBy("b"))

  /** The one-row percentile-bootstrap CI: nearest-rank bounds over the
    * deterministic (boot_mean, b) order plus the exact-decimal bootstrap
    * standard error ([[graft.stats.Bootstrap.ci]]); the gate also
    * asserts the interval actually brackets the full-sample mean. */
  val bsBootstrapCi: Q = {
    val (loRank, hiRank) = Bootstrap.ranks(BootB, 0.95)
    Q(
      "bs_bootstrap_ci",
      Some(s"""
        WITH $bootCte,
        ranked AS (
          SELECT boot_mean, b,
            row_number() OVER (ORDER BY boot_mean ASC NULLS FIRST, b) AS rn
          FROM bmeans),
        summ AS (
          SELECT CAST(count(*) AS BIGINT) AS b,
            CAST(SUM(CAST(round(boot_mean * 1e6) AS HUGEINT)) AS DOUBLE)
              AS s,
            CAST(SUM(CAST(round(boot_mean * 1e6) AS HUGEINT) *
                CAST(round(boot_mean * 1e6) AS HUGEINT)) AS DOUBLE) AS s2,
            max(CASE WHEN rn = $loRank THEN boot_mean END) AS ci_lo,
            max(CASE WHEN rn = $hiRank THEN boot_mean END) AS ci_hi
          FROM ranked),
        fullm AS (
          SELECT round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
              AS DOUBLE) / count(*), 6) AS mean
          FROM customer WHERE c_acctbal IS NOT NULL)
        SELECT mean, b,
          round(sqrt((s2 - s * s / b) / (b - 1)) / 1e6, 6) AS boot_se,
          ci_lo, ci_hi
        FROM fullm, summ"""),
      (s, dir) => {
        val out = Bootstrap.ci(Tables.load(s, dir, "customer"),
          Seq("c_custkey"), col("c_acctbal"), BootB, BootSeed)
        val r = out.collect().head
        val (mean, lo, hi) = (r.getAs[Double]("mean"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
        require(lo <= mean && mean <= hi,
          s"bootstrap CI [$lo, $hi] does not bracket the mean $mean")
        require(r.getAs[Double]("boot_se") > 0, "degenerate bootstrap SE")
        out
      })
  }

  /** Cross-group quantile normalization
    * ([[graft.transform.Standardize.quantileNormalizeByGroup]]): each
    * return-flag group's price lands on the pooled distribution's value
    * at the same midrank quantile; the target position is pure integer
    * arithmetic in both engines. Output collapsed to (group, value,
    * normalized, n_rows) — duplicates of identical inputs normalize
    * identically by the rank() tie rule, so the collapsed form is
    * deterministic. */
  val t29QuantileNormalize: Q = Q(
    "t29_quantile_normalize",
    Some("""
      WITH base AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS val
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      rk AS (
        SELECT g, val,
          rank() OVER (PARTITION BY g ORDER BY val) AS r,
          count(*) OVER (PARTITION BY g) AS n,
          count(*) OVER () AS nt
        FROM base),
      kq AS (
        SELECT g, val,
          ((2 * r - 1) * nt + 2 * n - 1) // (2 * n) AS k
        FROM rk),
      pooled AS (
        SELECT val AS pv, row_number() OVER (ORDER BY val) AS k
        FROM base)
      SELECT g AS l_returnflag, val AS value, pv AS normalized,
        count(*) AS n_rows
      FROM kq JOIN pooled USING (k)
      GROUP BY 1, 2, 3
      ORDER BY l_returnflag, value, normalized"""),
    (s, dir) =>
      graft.transform.Standardize.quantileNormalizeByGroup(
          Tables.load(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", "l_extendedprice")
        .groupBy(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("value"),
          col("normalized"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "value", "normalized"))

  /** Theil–Sen robust trend over the daily event-count series
    * ([[graft.stats.Regression.theilSen]]): the oracle rebuilds all
    * n(n−1)/2 pairwise slopes, both nearest-rank medians, and the
    * residual intercept — rank selection is deterministic under ties
    * because the VALUE at a rank is. */
  val t30TheilSen: Q = Q(
    "t30_theil_sen",
    Some("""
      WITH pts AS (
        SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) // 86400
          AS DOUBLE) AS x, CAST(count(*) AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      idx AS (
        SELECT x, y, row_number() OVER (ORDER BY x, y) AS i FROM pts),
      pr AS (
        SELECT round((b.y - a.y) / (b.x - a.x), 9) AS s
        FROM idx a JOIN idx b ON a.i < b.i AND a.x <> b.x),
      rs AS (
        SELECT s, row_number() OVER (ORDER BY s) AS r,
          count(*) OVER () AS np
        FROM pr),
      sl AS (SELECT s FROM rs WHERE r = (np + 1) // 2),
      res AS (
        SELECT round(y - (SELECT s FROM sl) * x, 9) AS e FROM idx),
      rr AS (
        SELECT e, row_number() OVER (ORDER BY e) AS r,
          count(*) OVER () AS n
        FROM res)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n,
        (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_pairs,
        round((SELECT s FROM sl), 6) AS slope,
        round((SELECT e FROM rr WHERE r = (n + 1) // 2), 6) AS intercept"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .filter(col("ts").isNotNull)
        .groupBy(floor(unix_timestamp(date_trunc("DAY", col("ts")))
          / 86400).cast("double").as("x"))
        .agg(count(lit(1)).cast("double").as("y"))
      Regression.theilSen(daily, "x", "y")
    })

  /** Two-sample 1-Wasserstein distance ([[graft.stats.Drift
    * .wasserstein1]]): a planted +2 location shift between the A and N
    * quantity distributions must report a drift MAGNITUDE near 2 (the
    * units-of-the-metric number a drift alarm thresholds on, where KS
    * only detects). The oracle replays the merged distinct-value CDF
    * walk, the exact integer numerators, and the round-12 width-term
    * folds. */
  val dqWasserstein: Q = Q(
    "dq_wasserstein1",
    Some("""
      WITH av AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                  WHERE l_returnflag = 'A' AND l_quantity IS NOT NULL),
      bv AS (SELECT CAST(l_quantity + 2 AS DOUBLE) AS v FROM lineitem
             WHERE l_returnflag = 'N' AND l_quantity IS NOT NULL),
      ac AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
      bc AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
      c AS (SELECT COALESCE(ac.v, bc.v) AS v, COALESCE(ca, 0) AS ca,
              COALESCE(cb, 0) AS cb
            FROM ac FULL JOIN bc ON ac.v = bc.v),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                CAST(SUM(cb) AS BIGINT) AS nb,
                CAST(count(*) AS BIGINT) AS nvals FROM c),
      cum AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cuma,
                SUM(cb) OVER (ORDER BY v) AS cumb,
                lead(v) OVER (ORDER BY v) AS nv FROM c),
      s AS (SELECT CAST(SUM(CAST(round(
              CAST(abs(cuma * nb - cumb * na) AS DOUBLE) * (nv - v), 12)
              AS DECIMAL(38,12))) AS DOUBLE) AS acc
            FROM cum, tot WHERE nv IS NOT NULL)
      SELECT na AS n_a, nb AS n_b, nvals AS n_values,
        round(acc / (CAST(na AS DOUBLE) * nb), 6) + 0.0 AS w1
      FROM s, tot"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull)
      val out = graft.stats.Drift.wasserstein1(
        li.filter(col("l_returnflag") === "A")
          .select(col("l_quantity").as("v")),
        li.filter(col("l_returnflag") === "N")
          .select((col("l_quantity") + 2).as("v")),
        col("v"))
      val r = out.head()
      require(r.getAs[Double]("w1") > 1.5 && r.getAs[Double]("w1") < 2.5,
        s"a planted +2 shift must report ~2 units of drift: $r")
      out
    })

  /** Brunner–Munzel test ([[graft.stats.RankTests.brunnerMunzel]]) on
    * the planted +5 shift (A vs R+5 quantities): the oracle rebuilds
    * the merged distinct-value table, the DOUBLED-midrank placement
    * sums (exact integers in DECIMAL(38,0)), and the studentized
    * statistic with its Welch-type df. In-gate: the planted shift fires
    * (p̂ well above ½, W ≫ 2). */
  val t75BrunnerMunzel: Q = Q(
    "t75_brunner_munzel",
    Some("""
      WITH av AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                  WHERE l_returnflag = 'A' AND l_quantity IS NOT NULL),
      bv AS (SELECT CAST(l_quantity + 5 AS DOUBLE) AS v FROM lineitem
             WHERE l_returnflag = 'R' AND l_quantity IS NOT NULL),
      ac AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
      bc AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
      c AS (SELECT COALESCE(ac.v, bc.v) AS v, COALESCE(ca, 0) AS ca,
              COALESCE(cb, 0) AS cb
            FROM ac FULL JOIN bc ON ac.v = bc.v),
      t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
              CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      cum AS (
        SELECT v, ca, cb,
          COALESCE(SUM(ca + cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bt,
          COALESCE(SUM(ca) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ba,
          COALESCE(SUM(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bb
        FROM c),
      pl AS (
        SELECT
          CAST(SUM(CASE WHEN ca > 0 THEN CAST(ca AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * ba + ca + 1)
              AS DECIMAL(38,0)) END) AS DOUBLE) AS s2pa,
          CAST(SUM(CASE WHEN ca > 0 THEN CAST(ca AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * ba + ca + 1)
              AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * ba + ca + 1)
              AS DECIMAL(38,0)) END) AS DOUBLE) AS s4pa,
          CAST(SUM(CASE WHEN cb > 0 THEN CAST(cb AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * bb + cb + 1)
              AS DECIMAL(38,0)) END) AS DOUBLE) AS s2pb,
          CAST(SUM(CASE WHEN cb > 0 THEN CAST(cb AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * bb + cb + 1)
              AS DECIMAL(38,0))
            * CAST((2 * bt + ca + cb + 1) - (2 * bb + cb + 1)
              AS DECIMAL(38,0)) END) AS DOUBLE) AS s4pb
        FROM cum),
      m AS (
        SELECT na, nb,
          s2pa / (2.0 * na) AS pbara, s2pb / (2.0 * nb) AS pbarb,
          s4pa, s4pb
        FROM pl, t),
      st AS (
        SELECT na, nb, pbarb / na AS phat,
          (s4pa / 4.0 - na * pbara * pbara) / (na - 1)
            / (CAST(na AS DOUBLE) * nb * nb) AS u1,
          (s4pb / 4.0 - nb * pbarb * pbarb) / (nb - 1)
            / (CAST(nb AS DOUBLE) * na * na) AS u2
        FROM m)
      SELECT na AS n_a, nb AS n_b, round(phat, 6) + 0.0 AS p_hat,
        CASE WHEN u1 + u2 > 0 THEN
          round((phat - 0.5) / sqrt(u1 + u2), 6) + 0.0 END AS w_stat,
        CASE WHEN u1 + u2 > 0 THEN
          round((u1 + u2) * (u1 + u2)
            / (u1 * u1 / (na - 1) + u2 * u2 / (nb - 1)), 6) + 0.0 END
          AS df
      FROM st"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull)
      val out = graft.stats.RankTests.brunnerMunzel(
        li.filter(col("l_returnflag") === "A")
          .select(col("l_quantity").as("v")),
        li.filter(col("l_returnflag") === "R")
          .select((col("l_quantity") + 5).as("v")),
        col("v"))
      val r = out.head()
      require(r.getAs[Double]("p_hat") > 0.55 &&
        r.getAs[Double]("w_stat") > 2.0,
        s"the planted +5 shift must fire: $r")
      out
    })

  /** Chatterjee's ξ rank correlation ([[graft.stats.Correlation
    * .xicor]]): is price a FUNCTION of quantity? Rows aggregate to one
    * per (orderkey, linenumber) so the tie-break id is genuinely unique
    * (the deterministic-order contract). The oracle replays the
    * cumulative y-rank table, the (x, tie)-ordered adjacent-difference
    * sum, and the exact integer denominator. In-gate: ξ(x, x²) — a
    * planted deterministic function — must dominate ξ(x, price), and
    * both stay in the coefficient's range. */
  val t77Xicor: Q = Q(
    "t77_xicor",
    Some("""
      WITH b AS (
        SELECT l_orderkey * 10 + l_linenumber AS t,
          CAST(max(l_quantity) AS DOUBLE) AS x,
          CAST(max(l_extendedprice) AS DOUBLE) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        GROUP BY 1),
      tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      yr AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY y),
      yc AS (SELECT y, SUM(c) OVER (ORDER BY y) AS cumle, c FROM yr),
      j AS (SELECT b.x, b.t, yc.cumle AS r,
              (tt.n - yc.cumle + yc.c) AS ge
            FROM b JOIN yc USING (y), tt),
      o AS (SELECT r, lead(r) OVER (ORDER BY x, t) AS nr FROM j),
      nm AS (SELECT CAST(SUM(abs(nr - r)) AS BIGINT) AS num
             FROM o WHERE nr IS NOT NULL),
      dn AS (SELECT SUM(CAST(ge AS DECIMAL(38,0))
               * CAST(tt.n - ge AS DECIMAL(38,0))) AS den
             FROM j, tt)
      SELECT tt.n,
        (SELECT CAST(count(*) AS BIGINT) FROM yr) AS n_distinct_y,
        round(1.0 - CAST(tt.n AS DOUBLE) * num
          / (2.0 * CAST(den AS DOUBLE)), 6) + 0.0 AS xi
      FROM tt, nm, dn"""),
    (s, dir) => {
      val b = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull &&
          col("l_extendedprice").isNotNull)
        .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("t"))
        .agg(max(col("l_quantity")).cast("double").as("x"),
          max(col("l_extendedprice")).cast("double").as("y"))
      val out = graft.stats.Correlation.xicor(b, col("x"), col("y"),
        col("t"))
      if (Tables.gateMode) {
        val xiPrice = out.head().getAs[Double]("xi")
        require(xiPrice > -0.5 && xiPrice <= 1.0,
          s"xi out of range: $xiPrice")
        // a planted deterministic function must dominate the noisy pair
        val xiFn = graft.stats.Correlation.xicor(
          b.withColumn("y2", col("x") * col("x")),
          col("x"), col("y2"), col("t")).head().getAs[Double]("xi")
        require(xiFn > xiPrice && xiFn > 0.5,
          s"planted y=x^2 must dominate: fn=$xiFn price=$xiPrice")
      }
      out
    })

  /** Ansari–Bradley scale test ([[graft.stats.RankTests
    * .ansariBradley]]): A quantities vs R quantities stretched 3×
    * around their center (a pure planted SCALE difference) — the
    * oracle rebuilds the both-ends block-score closed form (arithmetic
    * series with the (N+1)/2 kink, exact integers), the round-9
    * AB/S₂ folds, and the tie-robust moments. In-gate: the planted
    * stretch fires with z ≫ 0 (first sample less dispersed). */
  val t76AnsariBradley: Q = Q(
    "t76_ansari_bradley",
    Some("""
      WITH av AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                  WHERE l_returnflag = 'A' AND l_quantity IS NOT NULL),
      bv AS (SELECT CAST(25.5 + 3.0 * (l_quantity - 25.5) AS DOUBLE) AS v
             FROM lineitem
             WHERE l_returnflag = 'R' AND l_quantity IS NOT NULL),
      ac AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
      bc AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
      c AS (SELECT COALESCE(ac.v, bc.v) AS v, COALESCE(ca, 0) AS ca,
              COALESCE(cb, 0) AS cb
            FROM ac FULL JOIN bc ON ac.v = bc.v),
      t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
              CAST(SUM(cb) AS BIGINT) AS nb,
              CAST(SUM(ca + cb) AS BIGINT) AS nn,
              (CAST(SUM(ca + cb) AS BIGINT) + 1) // 2 AS k
            FROM c),
      cum AS (
        SELECT v, ca, cb, ca + cb AS c,
          COALESCE(SUM(ca + cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bt
        FROM c),
      bs AS (
        SELECT ca, cb, c,
          (CASE WHEN bt + 1 <= k THEN
            ((bt + 1) + least(bt + c, k))
              * (least(bt + c, k) - (bt + 1) + 1) // 2 ELSE 0 END)
          + (CASE WHEN bt + c > k THEN
            ((nn + 1 - (bt + c)) + (nn + 1 - greatest(bt + 1, k + 1)))
              * ((nn + 1 - greatest(bt + 1, k + 1))
                 - (nn + 1 - (bt + c)) + 1) // 2 ELSE 0 END) AS bsum
        FROM cum, t),
      agg AS (
        SELECT
          CAST(SUM(CASE WHEN ca > 0 THEN
            CAST(round(CAST(ca AS DOUBLE) * (CAST(bsum AS DOUBLE) / c), 9)
              AS DECIMAL(38,12)) END) AS DOUBLE) AS ab,
          CAST(SUM(bsum) AS BIGINT) AS s,
          CAST(SUM(CAST(round(CAST(bsum AS DOUBLE)
            * (CAST(bsum AS DOUBLE) / c), 9) AS DECIMAL(38,12)))
            AS DOUBLE) AS s2
        FROM bs)
      SELECT na AS n_a, nb AS n_b,
        round(ab, 6) + 0.0 AS ab_stat,
        round(CAST(na AS DOUBLE) * s / nn, 6) + 0.0 AS expected,
        CASE WHEN CAST(na AS DOUBLE) * nb * (nn * s2
            - CAST(s AS DOUBLE) * s)
            / (CAST(nn AS DOUBLE) * nn * (nn - 1)) > 0 THEN
          round((ab - CAST(na AS DOUBLE) * s / nn)
            / sqrt(CAST(na AS DOUBLE) * nb * (nn * s2
              - CAST(s AS DOUBLE) * s)
              / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6) + 0.0 END AS z
      FROM agg, t"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull)
      val out = graft.stats.RankTests.ansariBradley(
        li.filter(col("l_returnflag") === "A")
          .select(col("l_quantity").cast("double").as("v")),
        li.filter(col("l_returnflag") === "R")
          .select((lit(25.5) + lit(3.0) * (col("l_quantity") - 25.5))
            .cast("double").as("v")),
        col("v"))
      val r = out.head()
      require(r.getAs[Double]("z") > 3.0,
        s"the planted 3x stretch must fire (first sample tighter): $r")
      out
    })

  /** Conover's squared-ranks variance test ([[graft.stats.RankTests
    * .squaredRanks]]): a 2× stretch planted in the N group's quantities
    * — the oracle replays the round-12 group means, the combined
    * doubled-midrank table over the deviations, the exact-decimal
    * Σc(2R)²/Σc(2R)⁴ folds, and T with its k=3 closed-form p. In-gate:
    * the stretched group carries the largest squared-rank sum and the
    * test fires. */
  val t79SquaredRanks: Q = Q(
    "t79_squared_ranks",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS g,
          CAST(CASE WHEN l_returnflag = 'N'
            THEN 25.5 + 2.0 * (l_quantity - 25.5)
            ELSE l_quantity END AS DOUBLE) AS v
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      m AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
          round(CAST(SUM(CAST(round(v, 12) AS DECIMAL(38,12)))
            AS DOUBLE) / count(*), 12) AS mu
        FROM b GROUP BY g),
      d AS (SELECT b.g, abs(b.v - m.mu) AS u FROM b JOIN m USING (g)),
      uc AS (SELECT u, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY u),
      r AS (
        SELECT u,
          2 * COALESCE(SUM(c) OVER (ORDER BY u
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + c + 1 AS r2
        FROM uc),
      cells AS (SELECT g, u, CAST(count(*) AS BIGINT) AS c
                FROM d GROUP BY g, u),
      jc AS (SELECT g, c, r2 FROM cells JOIN r USING (u)),
      pg AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n,
          SUM(CAST(c * r2 * r2 AS DECIMAL(38,0))) AS s4
        FROM jc GROUP BY g),
      tt AS (
        SELECT SUM(CAST(c * r2 * r2 AS DECIMAL(38,0))) AS t2,
          SUM(CAST(c AS DECIMAL(38,0)) * CAST(r2 AS DECIMAL(38,0))
            * r2 * r2 * r2) AS t4,
          CAST(SUM(c) AS BIGINT) AS n
        FROM jc),
      st AS (
        SELECT n, CAST(t2 AS DOUBLE) / 4.0 AS sumr2,
          CAST(t4 AS DOUBLE) / 16.0 AS sumr4
        FROM tt),
      st2 AS (
        SELECT n, sumr2 / n AS sbar,
          (sumr4 - n * (sumr2 / n) * (sumr2 / n)) / (n - 1) AS d2
        FROM st),
      sg AS (
        SELECT CAST(SUM((CAST(s4 AS DOUBLE) / 4.0)
          * (CAST(s4 AS DOUBLE) / 4.0) / n) AS DOUBLE) AS sgsum
        FROM pg),
      f AS (
        SELECT (sgsum - st2.n * sbar * sbar) / d2 AS t
        FROM st2, sg WHERE d2 > 0)
      SELECT g AS grp, pg.n,
        round(CAST(s4 AS DOUBLE) / 4.0, 6) + 0.0 AS s_sum,
        round(t, 6) + 0.0 AS t_stat,
        round(exp(-t / 2), 6) + 0.0 AS p_value
      FROM pg, f ORDER BY grp"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
      val v = when(col("l_returnflag") === "N",
        lit(25.5) + lit(2.0) * (col("l_quantity") - 25.5))
        .otherwise(col("l_quantity")).cast("double")
      val out = graft.stats.RankTests.squaredRanks(li,
        col("l_returnflag"), v)
      val rows = out.collect()
      require(rows.head.getAs[Double]("p_value") < 0.01,
        s"the planted 2x stretch must fire: ${rows.mkString(";")}")
      val sMax = rows.maxBy(_.getAs[Double]("s_sum"))
      require(sMax.getString(0) == "N",
        s"the stretched group must carry the largest rank mass: $sMax")
      out
    })

  /** Two-sample KS ([[graft.stats.Drift.ksTwoSample]]): returned vs
    * never-returned lineitem quantities — 50 heavy-tie distinct values
    * exercise the exact integer-numerator argmax; p through the
    * Kolmogorov series with rounded-12 decimal-folded terms. */
  val dqKsTwoSample: Q = Q(
    "dq_ks_two_sample",
    Some("""
      WITH av AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                  WHERE l_returnflag = 'R' AND l_quantity IS NOT NULL),
      bv AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
             WHERE l_returnflag = 'N' AND l_quantity IS NOT NULL),
      ac AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
      bc AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
      c AS (SELECT COALESCE(ac.v, bc.v) AS v, COALESCE(ca, 0) AS ca,
              COALESCE(cb, 0) AS cb
            FROM ac FULL JOIN bc ON ac.v = bc.v),
      cum AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cuma,
                SUM(cb) OVER (ORDER BY v) AS cumb FROM c),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      mx AS (SELECT MAX(abs(CAST(cuma AS DECIMAL(38,0)) * nb
               - CAST(cumb AS DECIMAL(38,0)) * na)) AS mnum
             FROM cum, tot),
      dd AS (SELECT na, nb,
               CAST(mnum AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d
             FROM mx, tot),
      lam AS (SELECT na, nb, d,
                (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d AS l
              FROM (SELECT na, nb, d,
                      CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS ne
                    FROM dd)),
      ps AS (SELECT l, SUM(CAST(round(
               2 * (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
                 * exp(-2 * k * k * l * l), 12) AS DECIMAL(38,12))) AS s
             FROM lam, generate_series(1, 100) t(k) GROUP BY l)
      SELECT na AS n_a, nb AS n_b, round(d, 6) AS d_stat,
        CASE WHEN lam.l < 0.1 THEN 1.0
          ELSE round(least(1.0, greatest(0.0, CAST(s AS DOUBLE))), 6)
        END AS p_value
      FROM lam, ps"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      graft.stats.Drift.ksTwoSample(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"),
        col("l_quantity"))
    })

  /** Arm-parameterized resample CTEs (suffix distinguishes the two
    * blocks in one WITH): same inverse-CDF draw machinery as [[bootCte]]
    * but over one hash-assigned experiment arm with a per-arm seed —
    * independent resampling, exactly [[graft.stats.Bootstrap.upliftCi]]. */
  private def bootArmCte(sfx: String, seed: String, armPred: String): String = {
    val u = s"""CAST(concat('0x', substr(md5(concat_ws('|', '$seed',
        CAST(bs.b AS VARCHAR), CAST(c_custkey AS VARCHAR))), 1, 8))
        AS BIGINT) / 4294967296.0"""
    s"""
      rws$sfx AS (
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,6)) AS v
        FROM customer WHERE c_acctbal IS NOT NULL AND ($armPred)),
      drawn$sfx AS (
        SELECT bs.b, rws$sfx.v, $u AS u
        FROM rws$sfx, bs),
      cnts$sfx AS (
        SELECT b, v, ${graft.stats.Bootstrap.poissonCountSql("u")} AS cnt
        FROM drawn$sfx),
      bmeans$sfx AS (
        SELECT b,
          CASE WHEN SUM(cnt) > 0
            THEN round(CAST(SUM(cnt * v) AS DOUBLE) / SUM(cnt), 6)
          END AS boot_mean
        FROM cnts$sfx GROUP BY b)"""
  }

  /** Two-arm bootstrap uplift CI ([[graft.stats.Bootstrap.upliftCi]]):
    * customers hash-split into arms, each arm independently resampled,
    * nearest-rank percentile interval on the per-draw mean difference —
    * the oracle replays both arms' 200 draws, the pairing, the ranks,
    * and the micro-unit SE. The gate asserts the interval brackets the
    * observed uplift (it must, for a percentile CI at this B). */
  val bsUpliftCi: Q = {
    val (loRank, hiRank) = Bootstrap.ranks(BootB, 0.95)
    val armPred = s"""CAST(concat('0x', substr(md5(concat_ws('|',
        'graft-arm', CAST(c_custkey AS VARCHAR))), 1, 8))
        AS BIGINT) / 4294967296.0 < 0.5"""
    Q(
      "bs_uplift_ci",
      Some(s"""
        WITH bs AS (SELECT CAST(unnest(range(0, $BootB)) AS INT) AS b),
        ${bootArmCte("_t", s"$BootSeed/t", armPred)},
        ${bootArmCte("_c", s"$BootSeed/c", s"NOT ($armPred)")},
        diffs AS (
          SELECT t.b, t.boot_mean - c.boot_mean AS u
          FROM bmeans_t t JOIN bmeans_c c USING (b)
          WHERE t.boot_mean IS NOT NULL AND c.boot_mean IS NOT NULL),
        ranked AS (
          SELECT b, u, row_number() OVER (ORDER BY u ASC, b) AS rn
          FROM diffs),
        summ AS (
          SELECT CAST(count(*) AS BIGINT) AS b,
            CAST(SUM(CAST(round(u * 1e6) AS HUGEINT)) AS DOUBLE) AS s,
            CAST(SUM(CAST(round(u * 1e6) AS HUGEINT) *
                CAST(round(u * 1e6) AS HUGEINT)) AS DOUBLE) AS s2,
            max(CASE WHEN rn = $loRank THEN u END) AS ci_lo,
            max(CASE WHEN rn = $hiRank THEN u END) AS ci_hi
          FROM ranked),
        mt AS (SELECT round(CAST(SUM(v) AS DOUBLE) / count(*), 6) AS mean_t
               FROM rws_t),
        mc AS (SELECT round(CAST(SUM(v) AS DOUBLE) / count(*), 6) AS mean_c
               FROM rws_c)
        SELECT mean_t, mean_c, mean_t - mean_c AS uplift, b,
          round(sqrt((s2 - s * s / b) / (b - 1)) / 1e6, 6) AS boot_se,
          ci_lo, ci_hi
        FROM mt, mc, summ"""),
      (s, dir) => {
        val arm = graft.ops.Sampling.hashFraction("graft-arm",
          Seq(col("c_custkey"))) < 0.5
        val out = Bootstrap.upliftCi(Tables.load(s, dir, "customer"),
          Seq("c_custkey"), arm, col("c_acctbal"), BootB, BootSeed)
        val r = out.collect().head
        require(r.getAs[Long]("b") == BootB,
          s"expected $BootB paired draws, got ${r.getAs[Long]("b")} — " +
            "the fixed-rank oracle assumption broke")
        val (u, lo, hi) = (r.getAs[Double]("uplift"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
        require(lo <= u && u <= hi,
          s"uplift CI [$lo, $hi] does not bracket the estimate $u")
        out
      })
  }

  /** Equal-frequency discretization
    * ([[graft.transform.Standardize.discretizeEqualFreq]], k = 8) of
    * lineitem prices: bin(v) = ⌊below(v)·k/n⌋ over exact
    * smaller-value counts — pure integers, ties share a bin. The gate
    * emits the per-bin profile (count + value range) and asserts bins
    * are contiguous from 0 and near-equal up to tie mass; Spark
    * computes ranks with the partition-offset pass (no unpartitioned
    * window), the oracle with a plain window. */
  val t31EqualFreqBins: Q = Q(
    "t31_equal_freq_bins",
    Some("""
      WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                 FROM lineitem WHERE l_extendedprice IS NOT NULL),
      c AS (SELECT x, count(*) AS cnt FROM v GROUP BY x),
      r AS (SELECT x, cnt,
              SUM(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - cnt
                AS below
            FROM c),
      t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
      b AS (SELECT x, cnt,
              CAST((below * 8) // (SELECT n FROM t) AS BIGINT) AS bin
            FROM r)
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        min(x) AS lo, max(x) AS hi
      FROM b GROUP BY bin
      ORDER BY bin"""),
    (s, dir) => {
      val k = 8
      val binned = graft.transform.Standardize.discretizeEqualFreq(
        Tables.load(s, dir, "lineitem"), "l_extendedprice", k)
      val out = binned.filter(col("bin").isNotNull)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_extendedprice").cast("double")).as("lo"),
          max(col("l_extendedprice").cast("double")).as("hi"))
        .orderBy("bin")
      val rows = out.collect()
      require(rows.map(_.getAs[Long]("bin")).toSeq == (0L until k),
        "bins must be contiguous 0..k-1 on this data")
      val cnts = rows.map(_.getAs[Long]("n_rows"))
      require(cnts.max - cnts.min <= cnts.sum / k,
        s"bin counts ${cnts.mkString(",")} wildly unequal — binning broken")
      out
    })

  /** Normalized categorical association
    * ([[graft.stats.Contingency.association]]): Cramér's V + both
    * Theil's U directions over the same correlated pair the MI gates
    * use. The oracle rebuilds the contingency cells, the rounded χ² and
    * MI decimal folds, both entropies, and every normalization. The
    * b-side is built to DEPEND on a (discount-conditional copy), so the
    * asymmetry is real: U(a|b) must exceed U(b|a). */
  val t32Association: Q = Q(
    "t32_association",
    Some(s"""
      WITH $miCte,
      ga AS (SELECT a, SUM(observed) AS ra FROM c GROUP BY a),
      gb AS (SELECT b, SUM(observed) AS cb FROM c GROUP BY b),
      nn AS (SELECT SUM(observed) AS n FROM c),
      g AS (
        SELECT ga.a, gb.b, COALESCE(c2.observed, 0) AS observed,
          ra, cb, n
        FROM ga CROSS JOIN gb CROSS JOIN nn
        LEFT JOIN c c2 ON ga.a = c2.a AND gb.b = c2.b),
      chi AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_tot,
          CAST(count(DISTINCT a) AS BIGINT) AS levels_a,
          CAST(count(DISTINCT b) AS BIGINT) AS levels_b,
          CAST(SUM(CAST(round(
            (observed - CAST(ra AS DOUBLE) * cb / n)
              * (observed - CAST(ra AS DOUBLE) * cb / n)
              / (CAST(ra AS DOUBLE) * cb / n), 9) AS DECIMAL(38,12)))
            AS DOUBLE) AS chi2r
        FROM g),
      s AS (
        SELECT CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS mi
        FROM t),
      ea AS (
        SELECT CAST(SUM(CAST(round(-(CAST(ra AS DOUBLE) / n) *
            ln(CAST(ra AS DOUBLE) / n), 9) AS DECIMAL(38,12))) AS DOUBLE)
          AS h_a
        FROM (SELECT DISTINCT a, ra, n FROM m)),
      eb AS (
        SELECT CAST(SUM(CAST(round(-(CAST(cb AS DOUBLE) / n) *
            ln(CAST(cb AS DOUBLE) / n), 9) AS DECIMAL(38,12))) AS DOUBLE)
          AS h_b
        FROM (SELECT DISTINCT b, cb, n FROM m))
      SELECT n_tot AS n, levels_a, levels_b,
        round(chi2r, 6) AS chi2,
        CASE WHEN n_tot > 0 AND LEAST(levels_a, levels_b) > 1
          THEN round(sqrt(chi2r / (n_tot * (LEAST(levels_a, levels_b) - 1))), 6)
          END AS cramers_v,
        CASE WHEN h_a > 0 THEN round(mi / h_a, 6) END AS u_a_given_b,
        CASE WHEN h_b > 0 THEN round(mi / h_b, 6) END AS u_b_given_a
      FROM chi, s, ea, eb"""),
    (s, dir) => {
      val out = graft.stats.Contingency.association(miPair(s, dir), "a", "b")
      val r = out.head()
      require(r.getAs[Double]("u_a_given_b") > r.getAs[Double]("u_b_given_a"),
        "b is a conditional copy of a, so b must explain more of a's " +
          "entropy than the reverse")
      out
    })

  /** Squared Mahalanobis distance, 2-D closed-form path
    * ([[graft.stats.Mahalanobis.distances]]): quantity×price outlier
    * scores for every complete lineitem row. The oracle recomputes the
    * decimal moment folds, the round-6 means/covariances, the adjugate
    * precision entries and the quadratic form — identical double
    * arithmetic end to end, all 60k distances hash-checked. */
  val t33Mahalanobis: Q = Q(
    "t33_mahalanobis_2d",
    Some("""
      WITH b AS (
        SELECT l_orderkey, l_linenumber, l_quantity AS x,
          l_extendedprice AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      mm AS (
        SELECT count(*) AS n,
          round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) + 0.0 AS mx,
          round(CAST(SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) + 0.0 AS my,
          CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*) AS sxx,
          CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*) AS sxy,
          CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*) AS syy
        FROM b),
      c AS (
        SELECT mx, my,
          round(sxx - mx * mx, 6) + 0.0 AS vxx,
          round(sxy - mx * my, 6) + 0.0 AS vxy,
          round(syy - my * my, 6) + 0.0 AS vyy
        FROM mm),
      p AS (
        SELECT mx, my,
          vyy / (vxx * vyy - vxy * vxy) AS p11,
          -vxy / (vxx * vyy - vxy * vxy) AS p12,
          vxx / (vxx * vyy - vxy * vxy) AS p22
        FROM c)
      SELECT l_orderkey, l_linenumber,
        round((x - mx) * (x - mx) * p11 + (x - mx) * (y - my) * p12
          + (y - my) * (x - mx) * p12 + (y - my) * (y - my) * p22, 6) + 0.0
          AS md2
      FROM b, p
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => {
      val out = graft.stats.Mahalanobis.distances(
        Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice"),
        Seq("l_quantity", "l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"), col("md2"))
      // distances are a squared form under a positive-definite precision:
      // none may be negative (a planted-negative would mean the inverse
      // or the fold broke)
      require(out.filter(col("md2") < 0).isEmpty,
        "squared Mahalanobis distances must be non-negative")
      out.orderBy("l_orderkey", "l_linenumber")
    })

  /** Benjamini–Hochberg FDR adjustment
    * ([[graft.stats.MultipleTesting.benjaminiHochberg]]): q-values for
    * one hypothesis per customer — p from the shared md5 recipe (both
    * engines draw bit-identical uniforms), every 97th planted 1000×
    * smaller so the step-up rule has real discoveries to make. The
    * oracle replays rank, raw term and suffix-min per row; the gate
    * additionally asserts p ≤ q ≤ 1 everywhere and that discoveries at
    * α = 0.05 are dominated by planted hypotheses. */
  val t34BhFdr: Q = Q(
    "t34_bh_fdr",
    Some("""
      WITH h AS (
        SELECT c_custkey,
          round(CASE WHEN c_custkey % 97 = 0
            THEN CAST(concat('0x', substr(md5(concat_ws('|', 'graft-p',
              CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT)
              / 4294967296.0 / 1000.0
            ELSE CAST(concat('0x', substr(md5(concat_ws('|', 'graft-p',
              CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT)
              / 4294967296.0 END, 9) AS p
        FROM customer),
      m AS (SELECT count(*) AS m FROM h),
      r AS (
        SELECT c_custkey, p, m,
          ROW_NUMBER() OVER (ORDER BY p, c_custkey) AS rk
        FROM h, m)
      SELECT c_custkey, p AS p_value,
        round(LEAST(MIN(p * m / rk) OVER
          (ORDER BY rk DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0), 9)
          AS q_value
      FROM r
      ORDER BY c_custkey"""),
    (s, dir) => {
      val hyp = Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          round(when(col("c_custkey") % 97 === 0,
            graft.ops.Sampling.hashFraction("graft-p", Seq(col("c_custkey")))
              / 1000.0)
            .otherwise(graft.ops.Sampling.hashFraction("graft-p",
              Seq(col("c_custkey")))), 9).as("p_value"))
      val out = graft.stats.MultipleTesting
        .benjaminiHochberg(hyp, "p_value", "c_custkey")
      // q brackets p: q_i = min_{j>=i} p_j*m/j >= p_i*m/m = p_i
      require(out.filter(col("q_value") < col("p_value") ||
        col("q_value") > 1.0).isEmpty, "q must satisfy p <= q <= 1")
      val rej = out.filter(col("q_value") <= 0.05)
        .agg(sum(when(col("c_custkey") % 97 === 0, 1L).otherwise(0L)),
          count(lit(1))).head()
      require(rej.getLong(1) > 0 && rej.getLong(0) * 2 > rej.getLong(1),
        s"planted hypotheses must dominate the alpha=.05 discoveries, " +
          s"got ${rej.getLong(0)}/${rej.getLong(1)}")
      out.select(col("c_custkey"), col("p_value"), col("q_value"))
        .orderBy("c_custkey")
    })

  /** Mann–Whitney U ([[graft.stats.RankTests.mannWhitneyU]]):
    * hash-split arms with a planted +3 location shift on integer
    * quantities (the ev_segmented_trend planted-effect convention;
    * the raw columns are independent by construction in the synthetic
    * data) — 50-level integer values make the ties massive, exercising
    * the tie-corrected variance for real. 2·U folds as exact integers;
    * z is fixed double arithmetic the oracle replays; the normal p is
    * library-only (asserted, excluded — the ev_proportion_ztest
    * convention). */
  val t35MannWhitney: Q = Q(
    "t35_mann_whitney",
    Some("""
      WITH b0 AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|', 'graft-mw',
            CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
            1, 8)) AS BIGINT) / 4294967296.0 < 0.5 AS arm,
          l_quantity
        FROM lineitem
        WHERE l_quantity IS NOT NULL),
      b AS (
        SELECT arm, CAST(l_quantity +
          CASE WHEN arm THEN 0 ELSE 3 END AS DOUBLE) AS v
        FROM b0),
      c AS (
        SELECT v,
          SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS ca,
          SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS cb
        FROM b GROUP BY v),
      w AS (
        SELECT ca, cb,
          COALESCE(SUM(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cb_below
        FROM c),
      s AS (
        SELECT
          CAST(SUM(ca) AS BIGINT) AS na,
          CAST(SUM(cb) AS BIGINT) AS nb,
          CAST(SUM(ca * (2 * cb_below + cb)) AS DOUBLE) / 2.0 AS ua,
          CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
            AS DOUBLE) AS tie3
        FROM w),
      f AS (
        SELECT na, nb, ua, tie3,
          CAST(na AS DOUBLE) * nb AS prod, na + nb AS n
        FROM s)
      SELECT na AS n_a, nb AS n_b, ua AS u_a, prod - ua AS u_b,
        round((ua - prod / 2.0 -
            (CASE WHEN ua > prod / 2.0 THEN 0.5
                  WHEN ua < prod / 2.0 THEN -0.5 ELSE 0.0 END))
          / sqrt(prod / 12.0 *
            ((n + 1) - tie3 / (CAST(n AS DOUBLE) * (n - 1)))), 6) + 0.0
          AS z
      FROM f"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "lineitem")
        .withColumn("__arm", graft.ops.Sampling.hashFraction("graft-mw",
          Seq(col("l_orderkey"), col("l_linenumber"))) < 0.5)
        .withColumn("__v", col("l_quantity") +
          when(col("__arm"), 0).otherwise(3))
      val out = graft.stats.RankTests.mannWhitneyU(
        base, col("__arm"), col("__v"))
      val r = out.head()
      require(r.getAs[Double]("z") < 0,
        s"the unshifted arm must rank below, z=${r.getAs[Double]("z")}")
      require(r.getAs[Double]("p_value") < 1e-6,
        "the planted +3 shift must be overwhelming")
      out.drop("p_value")
    })

  /** Welch's unequal-variance pairwise t-tests
    * ([[graft.stats.Anova.welchTTests]]) — the scipy-default companion
    * to t13's pooled tests: t and the Welch–Satterthwaite dof are fixed
    * double arithmetic over one groupBy's moments (ratio statistics, so
    * ulp summation jitter sits ~1e-9 below the rounding line — the t13
    * argument); the t-CDF p is library-only, asserted in-gate and
    * excluded. */
  val t36WelchTTests: Q = Q(
    "t36_welch_ttests",
    Some("""
      WITH g AS (
        SELECT c_mktsegment AS grp, count(*) AS n, avg(c_acctbal) AS m,
          var_samp(c_acctbal) AS v
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY c_mktsegment)
      SELECT a.grp AS group1, b.grp AS group2, a.n AS n1, b.n AS n2,
        ROUND(a.m - b.m, 4) AS mean_diff,
        ROUND((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
        ROUND((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n)
          / ((a.v / a.n) * (a.v / a.n) / (a.n - 1)
             + (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 4) AS dof
      FROM g a JOIN g b ON a.grp < b.grp
      ORDER BY group1, group2"""),
    (s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ts = Anova.welchTTests(cust, "c_mktsegment", "c_acctbal")
      require(ts.nonEmpty && ts.forall(t => t.pValue >= 0 && t.pValue <= 1),
        "Welch p-values out of range")
      ts.map(t => (t.group1, t.group2, t.n1, t.n2, t.meanDiff, t.tStat,
          t.dof))
        .toDF("group1", "group2", "n1", "n2", "mean_diff", "t_stat", "dof")
        .select(col("group1"), col("group2"), col("n1"), col("n2"),
          round(col("mean_diff"), 4).as("mean_diff"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("dof"), 4).as("dof"))
        .orderBy("group1", "group2")
    })

  /** Brown–Forsythe homogeneity of variance
    * ([[graft.stats.Anova.brownForsythe]]) — Levene's W with median
    * centers, the precondition check for t12/t13's pooled variance.
    * Gate arithmetic follows the t12 driver-proofing recipe: medians
    * round to 6 so both engines center identically, the |y − med|
    * deviations and their squares fold as round-12 decimals (the
    * covariance round-before-cast recipe — a plain DECIMAL(18,6)
    * product overflows DuckDB's multiply width), and W derives from
    * those exact group sums; the library API (double moments) is
    * asserted against the decimal fold in-gate at 1e-4. */
  val t37BrownForsythe: Q = Q(
    "t37_brown_forsythe",
    Some("""
      WITH med AS (
        SELECT c_mktsegment AS grp,
          ROUND(quantile_cont(c_acctbal, 0.5), 6) AS md
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY 1),
      z AS (
        SELECT m.grp, abs(CAST(c_acctbal AS DOUBLE) - md) AS z
        FROM customer c JOIN med m ON c.c_mktsegment = m.grp
        WHERE c.c_acctbal IS NOT NULL),
      g AS (
        SELECT grp, count(*) AS n,
          CAST(SUM(CAST(round(z, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(round(z * z, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2
        FROM z GROUP BY grp),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS k,
          sum(s1) / sum(n) AS gm FROM g),
      ss AS (
        SELECT
          (SELECT sum(n * (s1 / n - gm) * (s1 / n - gm)) FROM g, tot) AS ssb,
          (SELECT sum(s2 - s1 * s1 / n) FROM g) AS ssw,
          (SELECT k - 1 FROM tot) AS dfb,
          (SELECT n_total - k FROM tot) AS dfw)
      SELECT ROUND((ssb / dfb) / (ssw / dfw), 4) AS w_stat,
        dfb AS df1, dfw AS df2
      FROM ss"""),
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val cust = Tables.load(s, dir, "customer")
      val base = cust.filter(col("c_mktsegment").isNotNull &&
        col("c_acctbal").isNotNull)
      val med = base.groupBy(col("c_mktsegment").as("grp"))
        .agg(round(percentile(col("c_acctbal").cast("double"), lit(0.5)), 6)
          .as("md"))
      val z = base.join(med, col("c_mktsegment") === col("grp"))
        .select(col("grp"),
          abs(col("c_acctbal").cast("double") - col("md")).as("z"))
      val g = z.groupBy("grp").agg(count(lit(1)).as("n"),
        sum(round(col("z"), 12).cast(DecimalType(38, 12)))
          .cast("double").as("s1"),
        sum(round(col("z") * col("z"), 12).cast(DecimalType(38, 12)))
          .cast("double").as("s2"))
      val tot = g.agg(sum(col("n")).as("n_total"), count(lit(1)).as("k"),
        (sum(col("s1")) / sum(col("n"))).as("gm"))
      val m = col("s1") / col("n")
      val ss = g.crossJoin(tot).agg(
        sum(col("n") * (m - col("gm")) * (m - col("gm"))).as("ssb"),
        sum(col("s2") - col("s1") * col("s1") / col("n")).as("ssw"),
        first(col("k")).as("k"), first(col("n_total")).as("n_total"))
      val out = ss.select(
        round((col("ssb") / (col("k") - 1))
          / (col("ssw") / (col("n_total") - col("k"))), 4).as("w_stat"),
        (col("k") - 1).as("df1"),
        (col("n_total") - col("k")).as("df2"))
      val lib = Anova.brownForsythe(cust, "c_mktsegment", "c_acctbal").get
      val w = out.head().getAs[Double]("w_stat")
      require(math.abs(lib.fStat - w) < 1e-4,
        s"library W ${lib.fStat} disagrees with the decimal fold $w")
      require(lib.pValue >= 0 && lib.pValue <= 1, "p out of range")
      out
    })

  /** Kruskal–Wallis H ([[graft.stats.RankTests.kruskalWallis]]): the
    * k-group rank test on quantities with a planted per-group location
    * shift (A +0, N +2, R +5 — the t35 planted-effect convention over
    * independent synthetic columns). 2·avgRank and 2·rankSum fold as
    * exact integers both sides; H is fixed double arithmetic the oracle
    * replays; the χ²(k−1) p is library-only (asserted in-gate,
    * excluded — the t35 convention). */
  val t38KruskalWallis: Q = Q(
    "t38_kruskal_wallis",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS g,
          CAST(l_quantity + CASE l_returnflag WHEN 'A' THEN 0
            WHEN 'N' THEN 2 ELSE 5 END AS DOUBLE) AS v
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      c AS (SELECT v, g, COUNT(*) AS c FROM b GROUP BY v, g),
      t AS (SELECT v, SUM(c) AS t FROM c GROUP BY v),
      w AS (
        SELECT v, t, COALESCE(SUM(t) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        FROM t),
      r AS (SELECT v, 2 * below + t + 1 AS two_rank, t FROM w),
      pg AS (
        SELECT c.g, CAST(SUM(c.c) AS BIGINT) AS n_g,
          CAST(SUM(CAST(c.c AS HUGEINT) * r.two_rank) AS DOUBLE) AS trs
        FROM c JOIN r USING (v) GROUP BY c.g),
      hs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
          SUM((trs / 2.0) * (trs / 2.0) / n_g) AS s
        FROM pg),
      ties AS (
        SELECT CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS DOUBLE) AS tie3
        FROM t)
      SELECT k AS k_groups, n AS n_total,
        round(12.0 / (CAST(n AS DOUBLE) * (n + 1.0)) * s
          - 3.0 * (n + 1.0), 6) AS h,
        round((12.0 / (CAST(n AS DOUBLE) * (n + 1.0)) * s - 3.0 * (n + 1.0))
          / (1.0 - tie3 / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_tied
      FROM hs, ties"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "lineitem")
        .withColumn("__v", col("l_quantity") +
          when(col("l_returnflag") === "A", 0)
            .when(col("l_returnflag") === "N", 2).otherwise(5))
      val out = graft.stats.RankTests.kruskalWallis(
        base, col("l_returnflag"), col("__v"))
      val r = out.head()
      require(r.getAs[Double]("h") > 0 &&
        r.getAs[Double]("h_tied") >= r.getAs[Double]("h"),
        "tie correction must not shrink H")
      require(r.getAs[Double]("p_value") < 1e-6,
        "the planted per-group shifts must be overwhelming")
      out.drop("p_value")
    })

  /** Fisher's exact test ([[graft.stats.Contingency.fisherExact]]) on
    * the priority×status 2×2 of orders: one aggregation makes the four
    * cells; the hypergeometric tail sum is exp(Σ lgamma) driver-side —
    * the IDENTICAL formula the oracle replays with DuckDB's own lgamma
    * over the same unnest-generated support, a genuine
    * cross-implementation differential (commons-math3 logGamma vs
    * DuckDB's C lgamma) that agrees far inside the round-6 line. */
  val t39FisherExact: Q = Q(
    "t39_fisher_exact",
    Some("""
      WITH flags AS (
        SELECT o_orderpriority LIKE '1%' AS fa, o_orderstatus = 'F' AS fb
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
      par AS (
        SELECT
          CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
            AS b,
          CAST(SUM(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
            AS c,
          CAST(SUM(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
            AS d,
          CAST(SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS r1,
          CAST(SUM(CASE WHEN NOT fa THEN 1 ELSE 0 END) AS BIGINT) AS r2,
          CAST(SUM(CASE WHEN fb THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM flags),
      ks AS (
        SELECT a, b, c, d, r1, r2, c1, n,
          unnest(generate_series(GREATEST(0, c1 - r2), LEAST(r1, c1))) AS k
        FROM par),
      pm AS (
        SELECT a, b, c, d, k,
          exp(lgamma(r1 + 1.0) - lgamma(k + 1.0) - lgamma(r1 - k + 1.0)
            + lgamma(r2 + 1.0) - lgamma(c1 - k + 1.0)
            - lgamma(r2 - c1 + k + 1.0)
            - (lgamma(n + 1.0) - lgamma(c1 + 1.0) - lgamma(n - c1 + 1.0)))
            AS p
        FROM ks)
      SELECT a AS n_tt, b AS n_tf, c AS n_ft, d AS n_ff,
        round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
          AS odds_ratio,
        round(LEAST(SUM(CASE WHEN p <=
            (SELECT p FROM pm WHERE k = a) * (1 + 1e-7)
          THEN p ELSE 0 END), 1.0), 6) AS p_two_sided
      FROM pm GROUP BY 1, 2, 3, 4, 5"""),
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val out = graft.stats.Contingency.fisherExact(orders,
        col("o_orderpriority").startsWith("1"),
        col("o_orderstatus") === "F")
      val r = out.head()
      require(r.getAs[Long]("n_tt") > 0 && r.getAs[Long]("n_ff") > 0,
        "degenerate 2x2 — the gate columns moved under us")
      val p = r.getAs[Double]("p_two_sided")
      require(p > 0.0 && p <= 1.0, s"p out of range: $p")
      out
    })

  /** MI feature screen ([[graft.stats.FeatureScreen.screen]]): three
    * categorical features — market segment, a nation hash-bucket, and
    * a DELIBERATELY LEAKY balance bucket — ranked against a
    * high-balance label in one melted pass. The oracle replays the
    * per-cell MI/entropy terms per feature; the in-gate assert pins
    * that the leaky feature tops U(label|feature) — the screen's whole
    * point. */
  val t40FeatureScreen: Q = Q(
    "t40_feature_screen",
    Some("""
      WITH base AS (
        SELECT CAST(c_acctbal >= 6000 AS VARCHAR) AS y,
          CAST(c_mktsegment AS VARCHAR) AS mkt,
          CAST(c_nationkey % 5 AS VARCHAR) AS nat5,
          CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) AS VARCHAR) AS balb
        FROM customer
        WHERE c_acctbal IS NOT NULL),
      m AS (
        SELECT 'mkt' AS f, mkt AS v, y FROM base WHERE mkt IS NOT NULL
        UNION ALL
        SELECT 'nat5', nat5, y FROM base WHERE nat5 IS NOT NULL
        UNION ALL
        SELECT 'balb', balb, y FROM base WHERE balb IS NOT NULL),
      c AS (SELECT f, v, y, count(*) AS c FROM m GROUP BY 1, 2, 3),
      cells AS (
        SELECT f, v, y, c,
          SUM(c) OVER (PARTITION BY f) AS n,
          SUM(c) OVER (PARTITION BY f, v) AS rv,
          SUM(c) OVER (PARTITION BY f, y) AS ry
        FROM c),
      t AS (
        SELECT f, v, y, c, n, rv, ry,
          round((CAST(c AS DOUBLE) / n) *
            ln((CAST(c AS DOUBLE) * n) /
              (CAST(rv AS DOUBLE) * ry)), 9) AS term
        FROM cells),
      mi AS (
        SELECT f, CAST(MAX(n) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT v) AS BIGINT) AS levels,
          round(CAST(COALESCE(SUM(CAST(term AS DECIMAL(38,12))), 0)
            AS DOUBLE), 9) AS mi
        FROM t GROUP BY f),
      hv AS (
        SELECT f, CAST(COALESCE(SUM(CAST(tt AS DECIMAL(38,12))), 0)
          AS DOUBLE) AS h
        FROM (
          SELECT f, v,
            round(-(CAST(MAX(rv) AS DOUBLE) / MAX(n)) *
              ln(CAST(MAX(rv) AS DOUBLE) / MAX(n)), 9) AS tt
          FROM t GROUP BY f, v)
        GROUP BY f),
      hy AS (
        SELECT f, CAST(COALESCE(SUM(CAST(tt AS DECIMAL(38,12))), 0)
          AS DOUBLE) AS h
        FROM (
          SELECT f, y,
            round(-(CAST(MAX(ry) AS DOUBLE) / MAX(n)) *
              ln(CAST(MAX(ry) AS DOUBLE) / MAX(n)), 9) AS tt
          FROM t GROUP BY f, y)
        GROUP BY f)
      SELECT mi.f AS feature, mi.n, mi.levels, mi.mi,
        round(hv.h, 9) AS h_feature, round(hy.h, 9) AS h_label,
        CASE WHEN hy.h > 0 THEN round(mi.mi / hy.h, 6) END AS u_label
      FROM mi JOIN hv ON mi.f = hv.f JOIN hy ON mi.f = hy.f
      ORDER BY feature"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal").isNotNull)
        .withColumn("mkt", col("c_mktsegment"))
        .withColumn("nat5", col("c_nationkey") % 5)
        .withColumn("balb",
          floor(col("c_acctbal") / 2000).cast("long"))
        .withColumn("__label", col("c_acctbal") >= 6000)
      val out = graft.stats.FeatureScreen.screen(
        base, "__label", Seq("balb", "mkt", "nat5"))
      val byU = out.collect()
        .map(r => r.getString(0) -> r.getAs[Double]("u_label")).toMap
      require(byU("balb") > byU("mkt") && byU("balb") > byU("nat5"),
        s"the leaky balance bucket must top the U ranking, got $byU")
      require(byU("balb") > 0.9,
        s"a label-determining feature must score U near 1, got " +
          s"${byU("balb")}")
      out
    })

  /** Welch's heteroscedastic one-way ANOVA
    * ([[graft.stats.Anova.welchAnova]]): the k-group companion to
    * t36's pairwise Welch tests — F* and the Welch df₂ are fixed
    * double arithmetic over one groupBy's moments, replayed by the
    * oracle; the F-CDF p is library-only (asserted in-gate,
    * excluded). */
  val t41WelchAnova: Q = Q(
    "t41_welch_anova",
    Some("""
      WITH g AS (
        SELECT c_mktsegment AS grp, CAST(count(*) AS BIGINT) AS n,
          avg(c_acctbal) AS m, var_samp(c_acctbal) AS v
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY 1 HAVING count(*) >= 2),
      w AS (SELECT grp, n, m, n / (sqrt(v) * sqrt(v)) AS w FROM g),
      sw AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(n) AS BIGINT) AS ntot, SUM(w) AS sw, SUM(w * m) AS swm
        FROM w),
      parts AS (
        SELECT sw.k, sw.ntot,
          SUM(w.w * (w.m - sw.swm / sw.sw) * (w.m - sw.swm / sw.sw))
            / (sw.k - 1) AS num,
          SUM((1.0 - w.w / sw.sw) * (1.0 - w.w / sw.sw) / (w.n - 1))
            AS hsum
        FROM w, sw GROUP BY sw.k, sw.ntot, sw.sw)
      SELECT k AS k_groups, ntot AS n_total,
        round(num / (1.0 + 2.0 * (k - 2)
          / (CAST(k AS DOUBLE) * k - 1) * hsum), 6) AS f_stat,
        CAST(k - 1 AS BIGINT) AS df1,
        round((CAST(k AS DOUBLE) * k - 1) / (3.0 * hsum), 4) AS df2
      FROM parts"""),
    (s, dir) => {
      import s.implicits._
      val r = Anova.welchAnova(
        Tables.load(s, dir, "customer"), "c_mktsegment", "c_acctbal").get
      require(r.pValue >= 0 && r.pValue <= 1, s"p out of range: ${r.pValue}")
      require(r.df2 > 0 && r.df2 < r.n,
        s"Welch df2 ${r.df2} outside (0, n) — weight arithmetic is off")
      Seq((r.k.toLong, r.n, r.fStat, r.df1, r.df2))
        .toDF("k_groups", "n_total", "f_stat", "df1", "df2")
        .select(col("k_groups"), col("n_total"),
          round(col("f_stat"), 6).as("f_stat"), col("df1"),
          round(col("df2"), 4).as("df2"))
    })

  /** Cochran–Mantel–Haenszel stratified 2×2 test
    * ([[graft.stats.Contingency.cmh]]) of priority×status controlling
    * for order YEAR: per-stratum terms fold as round-12 decimals both
    * sides; χ²(1) p library-only (asserted, excluded). The in-gate
    * assert pins the confounder-adjustment direction against the
    * marginal (unstratified) χ² from the same cells. */
  val t42Cmh: Q = Q(
    "t42_cmh",
    Some("""
      WITH f AS (
        SELECT CAST(year(o_orderdate) AS VARCHAR) AS s,
          o_orderpriority LIKE '2%' AS fa, o_orderstatus = 'F' AS fb
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
          AND o_orderstatus IS NOT NULL),
      cells AS (
        SELECT s,
          CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
            AS a,
          CAST(SUM(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
            AS b,
          CAST(SUM(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
            AS c,
          CAST(SUM(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END)
            AS BIGINT) AS d
        FROM f GROUP BY s),
      t AS (
        SELECT a, b, c, d, a + b + c + d AS n,
          CAST(a + b AS DOUBLE) AS r1, CAST(c + d AS DOUBLE) AS r2,
          CAST(a + c AS DOUBLE) AS c1, CAST(b + d AS DOUBLE) AS c2
        FROM cells WHERE a + b + c + d >= 2),
      folds AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(n) AS BIGINT) AS n_total,
          CAST(SUM(CAST(round(a - r1 * c1 / n, 12) AS DECIMAL(38,14)))
            AS DOUBLE) AS num,
          CAST(SUM(CAST(round(r1 * r2 * c1 * c2
            / (CAST(n AS DOUBLE) * n * (n - 1)), 12) AS DECIMAL(38,14)))
            AS DOUBLE) AS den,
          CAST(SUM(CAST(round(CAST(a AS DOUBLE) * d / n, 12)
            AS DECIMAL(38,14))) AS DOUBLE) AS orn,
          CAST(SUM(CAST(round(CAST(b AS DOUBLE) * c / n, 12)
            AS DECIMAL(38,14))) AS DOUBLE) AS ord
        FROM t)
      SELECT k AS k_strata, n_total,
        round(num * num / den, 6) AS chi2_cmh,
        CASE WHEN ord > 0 THEN round(orn / ord, 6) END AS or_mh
      FROM folds"""),
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val out = graft.stats.Contingency.cmh(orders,
        year(col("o_orderdate")),
        col("o_orderpriority").startsWith("2"),
        col("o_orderstatus") === "F")
      val r = out.head()
      val p = r.getAs[Double]("p_value")
      require(p >= 0 && p <= 1, s"p out of range: $p")
      require(r.getAs[Long]("k_strata") >= 2,
        "expected multiple year strata")
      out.drop("p_value")
    })

  /** First-order partial correlation
    * ([[graft.stats.Correlation.partialPearson]]): revenue vs discount
    * CONTROLLING for the gross price. Raw corr(revenue, discount) is
    * diluted by price variation; holding extendedprice fixed, revenue =
    * price·(1−d) is exactly linear in d, so the partial r collapses
    * toward −1 — the confounder-revealed shape the operator exists for,
    * asserted in-gate. The oracle replays the three round-6 corr() cells
    * and the identical partial combine. */
  val t43PartialCorr: Q = Q(
    "t43_partial_correlation",
    Some("""
      WITH b AS (
        SELECT round(l_extendedprice * (1 - l_discount), 2) AS x,
          l_discount AS y, l_extendedprice AS z
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
      r AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          round(corr(x, y), 6) AS r_xy,
          round(corr(x, z), 6) AS r_xz,
          round(corr(y, z), 6) AS r_yz
        FROM b)
      SELECT n, r_xy + 0.0 AS r_xy, r_xz + 0.0 AS r_xz, r_yz + 0.0 AS r_yz,
        CASE WHEN (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 0
          THEN round((r_xy - r_xz * r_yz)
            / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) + 0.0
        END AS r_partial
      FROM r"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2)
            .as("x"),
          col("l_discount").as("y"), col("l_extendedprice").as("z"))
      val out = Correlation.partialPearson(li, "x", "y", "z")
      val r = out.head()
      val raw = r.getAs[Double]("r_xy")
      val part = r.getAs[Double]("r_partial")
      require(part < -0.8 && part < raw - 0.5,
        s"controlling for price must reveal the discount effect: " +
          s"raw=$raw partial=$part")
      out
    })

  /** Durbin–Watson serial-correlation diagnostic
    * ([[graft.stats.Regression.durbinWatson]]) on the OLS trend of the
    * daily lineitem shipment-count series — the calendar-bounded grain
    * that keeps the op scale-safe (the oracle replays the moment folds,
    * the double slope/intercept combine, the round-6 residuals and both
    * squared folds term-for-term; consecutive-day pairs only, gaps
    * reported via n_pairs). */
  val t44DurbinWatson: Q = Q(
    "t44_durbin_watson",
    Some("""
      WITH d AS (
        SELECT epoch_us(l_shipdate) // 86400000000 AS t,
          CAST(count(*) AS DOUBLE) AS y
        FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(t) AS DOUBLE) AS st,
          CAST(sum(t * t) AS DOUBLE) AS stt,
          CAST(SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(t * y, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sty
        FROM d),
      co AS (
        SELECT n, st, sy,
          (n * sty - st * sy) / (n * stt - st * st) AS slope
        FROM m),
      co2 AS (SELECT n, slope, (sy - slope * st) / n AS intercept FROM co),
      e AS (
        SELECT d.t, round(d.y - (co2.intercept + co2.slope * d.t), 6) AS e
        FROM d, co2),
      ess AS (
        SELECT CAST(SUM(CAST(round(e * e, 12) AS DECIMAL(38,12)))
          AS DOUBLE) AS ess FROM e),
      pr AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CAST(round((a.e - b.e) * (a.e - b.e), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS num
        FROM e a, e b WHERE a.t = b.t + 1)
      SELECT co2.n AS n, pr.n_pairs,
        round(co2.slope, 9) + 0.0 AS slope,
        round(co2.intercept, 6) + 0.0 AS intercept,
        CASE WHEN ess.ess > 0 THEN round(pr.num / ess.ess, 6) + 0.0 END AS dw
      FROM co2, pr, ess"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(expr(
          s"unix_micros(cast(l_shipdate as timestamp)) div ${86400L * 1000000L}")
          .as("t"))
        .groupBy("t").agg(count(lit(1)).cast("double").as("y"))
      val out = Regression.durbinWatson(daily, "t", "y")
      val dw = out.head().getAs[Double]("dw")
      require(dw > 0.0 && dw < 4.0, s"DW must land in (0, 4), got $dw")
      out
    })

  /** Breusch–Pagan heteroscedasticity LM test
    * ([[graft.stats.Regression.breuschPagan]]) on y = quantity·tax vs
    * x = quantity: y = x·t with t an independent rate, so the residual
    * is ≈ x·(t − t̄) and its variance grows as x² BY CONSTRUCTION — the
    * gate asserts the test actually fires (LM ≫ χ²₁ critical; the raw
    * extendedprice~quantity fit measured LM ≈ 0.2, the two columns are
    * independent in this data — useless as a firing check). The oracle
    * replays both moment passes, the double slope/intercept combine,
    * the round-6 residuals, and the auxiliary R² term-for-term; the
    * χ²(1) p is library-only ([[graft.stats.Regression.breuschPaganP]],
    * asserted in-gate). */
  val t45BreuschPagan: Q = Q(
    "t45_breusch_pagan",
    Some("""
      WITH b AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
          round(l_quantity * l_tax, 4) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_tax IS NOT NULL),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        FROM b),
      co AS (
        SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM m),
      co2 AS (SELECT *, (sy - slope * sx) / n AS intercept FROM co),
      e AS (
        SELECT b.x, round(b.y - (co2.intercept + co2.slope * b.x), 6) AS e
        FROM b, co2),
      g AS (SELECT x, e * e AS g FROM e),
      a AS (
        SELECT
          CAST(SUM(CAST(round(g, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sg,
          CAST(SUM(CAST(round(g * g, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sgg,
          CAST(SUM(CAST(round(x * g, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sxg
        FROM g)
      SELECT co2.n AS n,
        round(co2.slope, 9) + 0.0 AS slope,
        round(co2.intercept, 6) + 0.0 AS intercept,
        CASE WHEN co2.n * a.sgg - a.sg * a.sg > 0
          THEN round((co2.n * a.sxg - co2.sx * a.sg)
            * (co2.n * a.sxg - co2.sx * a.sg)
            / ((co2.n * co2.sxx - co2.sx * co2.sx)
              * (co2.n * a.sgg - a.sg * a.sg)), 9) + 0.0 END AS r2_aux,
        CASE WHEN co2.n * a.sgg - a.sg * a.sg > 0
          THEN round(co2.n * ((co2.n * a.sxg - co2.sx * a.sg)
            * (co2.n * a.sxg - co2.sx * a.sg)
            / ((co2.n * co2.sxx - co2.sx * co2.sx)
              * (co2.n * a.sgg - a.sg * a.sg))), 6) + 0.0 END AS lm
      FROM co2, a"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull && col("l_tax").isNotNull)
        .select(col("l_quantity").cast("double").as("x"),
          round(col("l_quantity") * col("l_tax"), 4).as("y"))
      val out = Regression.breuschPagan(base, "x", "y")
      val r = out.head()
      val lm = r.getAs[Double]("lm")
      require(lm > 100.0,
        s"quantity*tax ~ quantity is heteroscedastic by construction; LM=$lm")
      val p = Regression.breuschPaganP(lm)
      require(p >= 0.0 && p < 0.001, s"LM that large must reject: p=$p")
      out
    })

  /** Wald–Wolfowitz runs test ([[graft.stats.RankTests.runsTest]]) on
    * the daily lineitem shipment-count series — the randomness screen
    * beside t44's model-based Durbin–Watson. The oracle replays the
    * round-6 median split, the lag-based run count over the sorted
    * days, and the exact run-count moments; the normal p is
    * library-only (asserted in-gate, excluded). */
  val t46RunsTest: Q = Q(
    "t46_runs_test",
    Some("""
      WITH d AS (
        SELECT epoch_us(l_shipdate) // 86400000000 AS t,
          CAST(count(*) AS DOUBLE) AS y
        FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
      md AS (SELECT round(quantile_cont(y, 0.5), 6) AS med FROM d),
      s AS (SELECT t, (y > med) AS up FROM d, md WHERE y <> med),
      o AS (SELECT up, lag(up) OVER (ORDER BY t) AS pu FROM s),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(sum(CASE WHEN pu IS NOT NULL AND up <> pu THEN 1 ELSE 0 END)
            AS BIGINT) + 1 AS r
        FROM o)
      SELECT n, n1 AS n_above, n - n1 AS n_below, r AS n_runs,
        CASE WHEN n1 > 0 AND n - n1 > 0 AND n > 1
          THEN round(1 + 2.0 * n1 * (n - n1) / n, 6) + 0.0
        END AS expected_runs,
        CASE WHEN n1 > 0 AND n - n1 > 0 AND n > 1
          AND 2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n) > 0
          THEN round((r - (1 + 2.0 * n1 * (n - n1) / n))
            / sqrt(2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n)
              / (CAST(n AS DOUBLE) * n * (n - 1))), 6) + 0.0
        END AS z
      FROM agg"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(expr(
          s"unix_micros(cast(l_shipdate as timestamp)) div ${86400L * 1000000L}")
          .as("t"))
        .groupBy("t").agg(count(lit(1)).cast("double").as("y"))
      val out = graft.stats.RankTests.runsTest(daily, col("t"), col("y"))
      val r = out.head()
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"normal p must be a probability: $p")
      require(r.getAs[Long]("n_runs") >= 1L)
      out.drop("p_value")
    })

  /** Grubbs' single-outlier test ([[graft.stats.Distribution.grubbs]])
    * on extendedprice: the oracle replays the decimal moment folds, the
    * deterministic (round-6 deviation, value) struct argmax, and
    * G = dev/s; the t-quantile critical value is library-only
    * ([[graft.stats.Distribution.grubbsCritical]], compared in-gate). */
  val t47Grubbs: Q = Q(
    "t47_grubbs",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,12))) AS DOUBLE) AS syy
        FROM b),
      c AS (
        SELECT n, sy / n AS mean,
          sqrt((syy - sy * sy / n) / (n - 1)) AS sd
        FROM m),
      d AS (SELECT b.y, round(abs(b.y - c.mean), 6) AS dev FROM b, c),
      top AS (SELECT y, dev FROM d ORDER BY dev DESC, y DESC LIMIT 1)
      SELECT c.n, round(c.mean, 6) + 0.0 AS mean_v,
        round(c.sd, 6) + 0.0 AS sd,
        top.y AS outlier_value,
        round(top.dev / c.sd, 6) + 0.0 AS g_stat
      FROM c, top"""),
    (s, dir) => {
      val out = graft.stats.Distribution.grubbs(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"))
      val r = out.head()
      val g = r.getAs[Double]("g_stat")
      val crit = graft.stats.Distribution.grubbsCritical(r.getAs[Long]("n"))
      require(g > 0.0 && crit > 0.0,
        s"statistic and critical value must be positive: g=$g crit=$crit")
      out
    })

  /** Hill power-law tail index
    * ([[graft.stats.Distribution.hillTailIndex]]) over the top 1000
    * extendedprice values: one distributed top-(k+1), per-term round-9
    * ln folds, α = k/Σ. The synthetic price tail is bounded (not
    * power-law), so the gate checks the estimator's arithmetic and
    * expects a LARGE α — asserted in-gate. */
  val t48HillTail: Q = Q(
    "t48_hill_tail",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
      t AS (SELECT y FROM b ORDER BY y DESC LIMIT 1001),
      xk AS (SELECT min(y) AS xk FROM t),
      s AS (
        SELECT CAST(SUM(CAST(round(ln(y / xk.xk), 9) AS DECIMAL(38,12)))
          AS DOUBLE) AS sum_log
        FROM t, xk)
      SELECT CAST(1000 AS BIGINT) AS k_used, xk.xk AS threshold,
        s.sum_log + 0.0 AS sum_log,
        CASE WHEN s.sum_log > 0
          THEN round(1000.0 / s.sum_log, 6) + 0.0 END AS alpha
      FROM xk, s"""),
    (s, dir) => {
      val out = graft.stats.Distribution.hillTailIndex(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"), 1000)
      val a = out.head().getAs[Double]("alpha")
      require(a > 3.0,
        s"a bounded-support tail must read as thin (alpha large): $a")
      out
    })

  /** Dunn's post-hoc mean-rank comparisons
    * ([[graft.stats.RankTests.dunnTest]]) on the t38 Kruskal–Wallis
    * fixture (planted A +0 / N +2 / R +5 shifts): the oracle replays
    * the shared average-rank scan, per-group exact 2·rankSums, the
    * tie-corrected rank variance, and every pairwise z; the normal p's
    * are library-only (asserted in-gate, excluded). In-gate: the
    * planted ordering A < N < R must show as negative z for every
    * (lower, higher) pair. */
  val t49Dunn: Q = Q(
    "t49_dunn_posthoc",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS g,
          CAST(l_quantity + CASE l_returnflag WHEN 'A' THEN 0
            WHEN 'N' THEN 2 ELSE 5 END AS DOUBLE) AS v
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      c AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
      t AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY 1),
      w AS (
        SELECT v, t, 2 * COALESCE(SUM(t) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
          AS two_rank
        FROM t),
      pg AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
          SUM(CAST(c AS DECIMAL(38,0)) * two_rank) AS trs
        FROM c JOIN w USING (v) GROUP BY 1),
      nn AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM t),
      tie AS (
        SELECT SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tie3 FROM t),
      sg AS (
        SELECT n * (n + 1.0) / 12.0
          - CAST(tie3 AS DOUBLE) / (12.0 * (n - 1)) AS s2
        FROM nn, tie),
      pr AS (
        SELECT a.g AS group_a, b.g AS group_b, a.n_g AS n_a, b.n_g AS n_b,
          CAST(a.trs AS DOUBLE) / 2.0 / a.n_g AS ra,
          CAST(b.trs AS DOUBLE) / 2.0 / b.n_g AS rb
        FROM pg a, pg b WHERE a.g < b.g)
      SELECT group_a, group_b, n_a, n_b,
        round(ra, 6) + 0.0 AS mean_rank_a, round(rb, 6) + 0.0 AS mean_rank_b,
        round((ra - rb) / sqrt(sg.s2 * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0
          AS z
      FROM pr, sg ORDER BY group_a, group_b"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .select(col("l_returnflag").as("g"),
          (col("l_quantity") +
            when(col("l_returnflag") === "A", 0)
              .when(col("l_returnflag") === "N", 2).otherwise(5))
            .cast("double").as("v"))
      val out = graft.stats.RankTests.dunnTest(li, col("g"), col("v"))
      val rows = out.collect()
      rows.foreach { r =>
        val p = r.getAs[Double]("p_value")
        require(p >= 0.0 && p <= 1.0, s"normal p out of range: $r")
        require(r.getAs[Double]("z") < 0.0,
          s"planted shifts order A < N < R; z must be negative: $r")
      }
      out.drop("p_value")
    })

  /** Weight of Evidence / Information Value scorecard table
    * ([[graft.stats.FeatureScreen.woeTable]]) for order priority vs
    * failed status: the oracle replays the cells, the 0.5 zero-cell
    * adjustment, and every ln term; in-gate, the IV ≥ 0 invariant is
    * asserted on every term (distributed). */
  val t50Woe: Q = Q(
    "t50_woe_iv",
    Some("""
      WITH cells AS (
        SELECT CAST(o_orderpriority AS VARCHAR) AS category,
          CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_event
        FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(n_event) AS BIGINT) AS te,
          CAST(SUM(n - n_event) AS BIGINT) AS tn
        FROM cells)
      SELECT category, n, n_event,
        round(ln((CASE WHEN n - n_event = 0 THEN 0.5
            ELSE CAST(n - n_event AS DOUBLE) END / tn)
          / (CASE WHEN n_event = 0 THEN 0.5
            ELSE CAST(n_event AS DOUBLE) END / te)), 6) + 0.0 AS woe,
        round(((CASE WHEN n - n_event = 0 THEN 0.5
            ELSE CAST(n - n_event AS DOUBLE) END / tn)
          - (CASE WHEN n_event = 0 THEN 0.5
            ELSE CAST(n_event AS DOUBLE) END / te))
          * ln((CASE WHEN n - n_event = 0 THEN 0.5
            ELSE CAST(n - n_event AS DOUBLE) END / tn)
          / (CASE WHEN n_event = 0 THEN 0.5
            ELSE CAST(n_event AS DOUBLE) END / te)), 9) + 0.0 AS iv_term
      FROM cells, tot ORDER BY category NULLS FIRST"""),
    (s, dir) => {
      val out = graft.stats.FeatureScreen.woeTable(
        Tables.load(s, dir, "orders"), "o_orderpriority",
        col("o_orderstatus") === "F")
      if (Tables.gateMode) {
        val neg = out.filter(col("iv_term") < 0.0).count()
        require(neg == 0L, s"IV terms are nonnegative by identity: $neg < 0")
      }
      out
    })

  /** Trimmed mean ([[graft.transform.Winsorize.trimmedMean]]) of
    * extendedprice at 5/95: the oracle replays the round-6 bounds, the
    * inclusive trim filter, and the round-9 decimal fold. */
  val t51TrimmedMean: Q = Q(
    "t51_trimmed_mean",
    Some("""
      WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
      bd AS (
        SELECT CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
          AS n_total,
          round(quantile_cont(v, 0.05), 6) AS lo,
          round(quantile_cont(v, 0.95), 6) AS hi
        FROM b)
      SELECT n_total,
        CAST(count(CASE WHEN v >= lo AND v <= hi THEN 1 END) AS BIGINT)
          AS n_used,
        lo, hi,
        round(CAST(SUM(CASE WHEN v >= lo AND v <= hi
            THEN CAST(round(v, 9) AS DECIMAL(38,12)) END) AS DOUBLE)
          / count(CASE WHEN v >= lo AND v <= hi THEN 1 END), 6)
          AS trimmed_mean
      FROM b, bd GROUP BY n_total, lo, hi"""),
    (s, dir) => {
      val out = graft.transform.Winsorize.trimmedMean(
        Tables.load(s, dir, "lineitem"), "l_extendedprice")
      val r = out.head()
      require(r.getAs[Long]("n_used") <= r.getAs[Long]("n_total") &&
        r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      out
    })

  /** Jonckheere–Terpstra ordered-alternative test
    * ([[graft.stats.RankTests.jonckheereTerpstra]]) on the t38 fixture
    * with the PLANTED ascending order A < N < R: the oracle replays the
    * per-value group vectors, the below-count accumulation of 2·JT, the
    * exact mean, and the tie-corrected Hollander–Wolfe variance (HUGEINT
    * products — the g₃·t₃ term overflows BIGINT at this n); the normal p
    * is library-only. In-gate: the planted trend must fire (z ≫ 0). */
  val t52Jonckheere: Q = Q(
    "t52_jonckheere",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS g,
          CAST(l_quantity + CASE l_returnflag WHEN 'A' THEN 0
            WHEN 'N' THEN 2 ELSE 5 END AS DOUBLE) AS v
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      cells AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
        FROM b GROUP BY 1, 2),
      p AS (
        SELECT v,
          CAST(SUM(CASE WHEN g = 'A' THEN c ELSE 0 END) AS BIGINT) AS ca,
          CAST(SUM(CASE WHEN g = 'N' THEN c ELSE 0 END) AS BIGINT) AS cn,
          CAST(SUM(CASE WHEN g = 'R' THEN c ELSE 0 END) AS BIGINT) AS cr
        FROM cells GROUP BY v),
      w AS (
        SELECT *,
          COALESCE(SUM(ca) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ba,
          COALESCE(SUM(cn) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bn
        FROM p),
      jt AS (
        SELECT CAST(SUM(CAST(2 AS HUGEINT) * (ba * cn + ba * cr + bn * cr)
          + (ca * cn + ca * cr + cn * cr)) AS BIGINT) AS jt2
        FROM w),
      gs AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM cells GROUP BY g),
      nn AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
          SUM(CAST(ng AS HUGEINT) * ng) AS sq,
          SUM(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5)) AS g25,
          SUM(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2)) AS g3,
          SUM(CAST(ng AS HUGEINT) * (ng - 1)) AS g2
        FROM gs),
      ties AS (
        SELECT SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS t25,
          SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS t3,
          SUM(CAST(t AS HUGEINT) * (t - 1)) AS t2
        FROM (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY v)),
      f AS (
        SELECT n,
          CAST((CAST(n AS HUGEINT) * n - sq) // 2 AS BIGINT) AS mean2,
          CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - g25 - t25
            AS DOUBLE) / 72.0
          + CAST(g3 * t3 AS DOUBLE) / (36.0 * n * (n - 1) * (n - 2))
          + CAST(g2 * t2 AS DOUBLE) / (8.0 * n * (n - 1)) AS var_jt
        FROM nn, ties)
      SELECT CAST(3 AS BIGINT) AS k_groups, f.n AS n_total, jt.jt2,
        f.mean2,
        CASE WHEN f.var_jt > 0
          THEN round(CAST(jt.jt2 - f.mean2 AS DOUBLE) / 2.0
            / sqrt(f.var_jt), 6) + 0.0 END AS z
      FROM jt, f"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .select(col("l_returnflag").as("g"),
          (col("l_quantity") +
            when(col("l_returnflag") === "A", 0)
              .when(col("l_returnflag") === "N", 2).otherwise(5))
            .cast("double").as("v"))
      val out = graft.stats.RankTests.jonckheereTerpstra(
        li, col("g"), col("v"), Seq("A", "N", "R"))
      val r = out.head()
      require(r.getAs[Double]("z") > 5.0,
        s"planted ascending shifts must fire the ordered test: $r")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0)
      out.drop("p_value")
    })

  /** Newey–West HAC slope SE ([[graft.stats.Regression.neweyWestSlope]])
    * over the t44 daily series at L = 7 (eighth weights are exact binary
    * fractions — both engines fold the identical literals): the oracle
    * replays the fit, the round-6 residual scores, γ₀…γ₇, and the
    * Bartlett sum left-to-right. */
  val t53NeweyWest: Q = Q(
    "t53_newey_west",
    Some("""
      WITH d AS (
        SELECT epoch_us(l_shipdate) // 86400000000 AS t,
          CAST(count(*) AS DOUBLE) AS y
        FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(t) AS DOUBLE) AS st,
          CAST(sum(t * t) AS DOUBLE) AS stt,
          CAST(SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(t * y, 6) AS DECIMAL(38,12))) AS DOUBLE) AS sty
        FROM d),
      co AS (
        SELECT *, (n * sty - st * sy) / (n * stt - st * st) AS slope FROM m),
      co2 AS (
        SELECT *, (sy - slope * st) / n AS intercept, st / n AS tbar
        FROM co),
      sc AS (
        SELECT d.t,
          round(d.y - (co2.intercept + co2.slope * d.t), 6)
            * (d.t - co2.tbar) AS u,
          (d.t - co2.tbar) * (d.t - co2.tbar) AS d2,
          round(d.y - (co2.intercept + co2.slope * d.t), 6) AS e
        FROM d, co2),
      base AS (
        SELECT
          CAST(SUM(round(u * u, 12)::DECIMAL(38,14)) AS DOUBLE) AS g0,
          CAST(SUM(CAST(d2 AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
          CAST(SUM(round(e * e, 12)::DECIMAL(38,14)) AS DOUBLE) AS ess
        FROM sc),
      gam AS (
        SELECT l.l,
          CAST(SUM(round(a.u * b.u, 12)::DECIMAL(38,14)) AS DOUBLE) AS g
        FROM (SELECT unnest(generate_series(1, 7)) AS l) l, sc a, sc b
        WHERE b.t = a.t + l.l
        GROUP BY l.l),
      gp AS (
        SELECT
          COALESCE(MAX(CASE WHEN l = 1 THEN g END), 0) AS g1,
          COALESCE(MAX(CASE WHEN l = 2 THEN g END), 0) AS g2,
          COALESCE(MAX(CASE WHEN l = 3 THEN g END), 0) AS g3,
          COALESCE(MAX(CASE WHEN l = 4 THEN g END), 0) AS g4,
          COALESCE(MAX(CASE WHEN l = 5 THEN g END), 0) AS g5,
          COALESCE(MAX(CASE WHEN l = 6 THEN g END), 0) AS g6,
          COALESCE(MAX(CASE WHEN l = 7 THEN g END), 0) AS g7
        FROM gam),
      fin AS (
        SELECT co2.n, co2.slope, base.sxx, base.ess,
          base.g0 + 2.0 * (1 - 1.0 / 8.0) * gp.g1
            + 2.0 * (1 - 2.0 / 8.0) * gp.g2
            + 2.0 * (1 - 3.0 / 8.0) * gp.g3
            + 2.0 * (1 - 4.0 / 8.0) * gp.g4
            + 2.0 * (1 - 5.0 / 8.0) * gp.g5
            + 2.0 * (1 - 6.0 / 8.0) * gp.g6
            + 2.0 * (1 - 7.0 / 8.0) * gp.g7 AS s
        FROM co2, base, gp)
      SELECT n, round(slope, 9) + 0.0 AS slope,
        round(sqrt((ess / (n - 2)) / sxx), 9) + 0.0 AS se_ols,
        round(CASE WHEN s <= 0 THEN 0.0
          ELSE sqrt(s / (sxx * sxx)) END, 9) + 0.0 AS se_nw,
        round(CASE WHEN s <= 0 THEN 0.0
          ELSE sqrt(s / (sxx * sxx)) END
          / sqrt((ess / (n - 2)) / sxx), 6) + 0.0 AS ratio
      FROM fin"""),
    (s, dir) => {
      val daily = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(expr(
          s"unix_micros(cast(l_shipdate as timestamp)) div ${86400L * 1000000L}")
          .as("t"))
        .groupBy("t").agg(count(lit(1)).cast("double").as("y"))
      val out = Regression.neweyWestSlope(daily, "t", "y", maxLag = 7)
      val r = out.head()
      require(r.getAs[Double]("ratio") > 0.0, s"degenerate HAC: $r")
      out
    })

  /** Pythagorean means per return flag
    * ([[graft.stats.Distribution.pythagoreanMeans]]): AM/GM/HM of
    * quantity with the AM ≥ GM ≥ HM inequality asserted distributed
    * in-gate (free invariant of the estimator). */
  val t54Means: Q = Q(
    "t54_pythagorean_means",
    Some("""
      SELECT l_returnflag AS key,
        CAST(count(CASE WHEN l_quantity > 0 THEN 1 END) AS BIGINT)
          AS n_pos,
        CAST(count(CASE WHEN l_quantity IS NOT NULL AND l_quantity <= 0
          THEN 1 END) AS BIGINT) AS n_nonpos,
        round(CAST(SUM(CASE WHEN l_quantity > 0
            THEN CAST(round(l_quantity, 9) AS DECIMAL(38,12)) END)
          AS DOUBLE) / count(CASE WHEN l_quantity > 0 THEN 1 END), 6)
          AS am,
        round(exp(CAST(SUM(CASE WHEN l_quantity > 0
            THEN CAST(round(ln(l_quantity), 9) AS DECIMAL(38,12)) END)
          AS DOUBLE) / count(CASE WHEN l_quantity > 0 THEN 1 END)), 6)
          AS gm,
        round(count(CASE WHEN l_quantity > 0 THEN 1 END)
          / CAST(SUM(CASE WHEN l_quantity > 0
            THEN CAST(round(1.0 / l_quantity, 12) AS DECIMAL(38,14)) END)
          AS DOUBLE), 6) AS hm
      FROM lineitem GROUP BY 1 ORDER BY key NULLS FIRST"""),
    (s, dir) => {
      val out = graft.stats.Distribution.pythagoreanMeans(
        Tables.load(s, dir, "lineitem"), col("l_returnflag"),
        col("l_quantity"))
      if (Tables.gateMode) {
        val bad = out.filter(col("am") < col("gm") ||
          col("gm") < col("hm")).count()
        require(bad == 0L, s"AM >= GM >= HM violated on $bad groups")
      }
      out
    })

  /** Distribution-free median CI ([[graft.stats.Distribution.medianCI]])
    * on extendedprice: the oracle replays the normal-approximation rank
    * formula (floor of the identical double) and reads the order
    * statistics via row_number (Spark reads them via degenerate-index
    * exact percentile — the two selections agree at round-6 by
    * construction). In-gate: the interval must bracket the median. */
  val t55MedianCi: Q = Q(
    "t55_median_ci",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      r AS (
        SELECT n, GREATEST(1, CAST(floor((n - 1.959963984540054
          * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS lo_rank
        FROM c),
      r2 AS (SELECT *, n + 1 - lo_rank AS hi_rank FROM r),
      rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM b)
      SELECT r2.n, r2.lo_rank, r2.hi_rank,
        (SELECT round(quantile_cont(v, 0.5), 6) FROM b) AS median,
        (SELECT round(v, 6) FROM rk, r2 WHERE rk.rn = r2.lo_rank) AS ci_lo,
        (SELECT round(v, 6) FROM rk, r2 WHERE rk.rn = r2.hi_rank) AS ci_hi
      FROM r2"""),
    (s, dir) => {
      val out = graft.stats.Distribution.medianCI(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"))
      val r = out.head()
      require(r.getAs[Double]("ci_lo") <= r.getAs[Double]("median") &&
        r.getAs[Double]("median") <= r.getAs[Double]("ci_hi"),
        s"the interval must bracket the median: $r")
      out
    })

  /** Two-sample Cramér–von Mises ([[graft.stats.Drift.cramerVonMises]])
    * on the dq_ks arms: KS's max becomes an exact-BigInteger SUM of
    * squared CDF-difference numerators, divided once — the oracle
    * replays the same cumulative table with HUGEINT products (num²
    * passes BIGINT at these n) and the identical denominator tree. */
  val dqCvm: Q = Q(
    "dq_cvm_two_sample",
    Some("""
      WITH av AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                  WHERE l_returnflag = 'R' AND l_quantity IS NOT NULL),
      bv AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
             WHERE l_returnflag = 'N' AND l_quantity IS NOT NULL),
      ac AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
      bc AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
      c AS (SELECT COALESCE(ac.v, bc.v) AS v, COALESCE(ca, 0) AS ca,
              COALESCE(cb, 0) AS cb
            FROM ac FULL JOIN bc ON ac.v = bc.v),
      cum AS (SELECT v, ca, cb, SUM(ca) OVER (ORDER BY v) AS cuma,
                SUM(cb) OVER (ORDER BY v) AS cumb FROM c),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      sm AS (SELECT SUM(
               (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
               * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
               * (ca + cb)) AS s
             FROM cum, tot)
      SELECT na AS n_a, nb AS n_b,
        round(CAST(s AS DOUBLE) / (CAST(na + nb AS DOUBLE) * (na + nb)
          * na * nb), 6) + 0.0 AS cvm_t,
        round(CAST(s AS DOUBLE) / (CAST(na + nb AS DOUBLE) * (na + nb)
          * na * nb), 6) > 0.461 AS reject_5pct
      FROM sm, tot"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val out = graft.stats.Drift.cramerVonMises(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"),
        col("l_quantity"))
      val r = out.head()
      require(r.getAs[Double]("cvm_t") >= 0.0)
      out
    })

  /** Log₂-spaced histogram ([[graft.stats.Distribution.log2Histogram]])
    * of extendedprice: exact-integer buckets via the bit length of ⌊v⌋
    * (never floor(log2) — IEEE boundary rounding is engine-specific);
    * the oracle replays the same bit-length trick with printf('%b'). */
  val t56Log2Hist: Q = Q(
    "t56_log2_histogram",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0)
      SELECT bucket,
        CASE WHEN bucket >= 0 THEN pow(2.0, bucket) ELSE 0.0 END AS lo_edge,
        pow(2.0, bucket + 1) AS hi_edge,
        CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT CASE WHEN v >= 1.0
          THEN CAST(length(printf('%b', CAST(floor(v) AS BIGINT))) - 1
            AS BIGINT)
          ELSE CAST(-1 AS BIGINT) END AS bucket
        FROM b)
      GROUP BY bucket ORDER BY bucket"""),
    (s, dir) => {
      val out = graft.stats.Distribution.log2Histogram(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"))
      if (Tables.gateMode) {
        val bad = out.filter(col("bucket") >= 0L &&
          col("lo_edge") * 2.0 =!= col("hi_edge")).count()
        require(bad == 0L, s"doubling edges must double: $bad bad buckets")
      }
      out
    })

  /** Lower-tail VaR + expected shortfall
    * ([[graft.stats.Distribution.expectedShortfall]]) of extendedprice
    * at α = 0.05: the oracle replays the round-6 fence and the
    * inclusive-tail round-9 decimal fold. In-gate: ES ≤ VaR (the tail
    * mean cannot exceed its own fence). */
  val t58ExpectedShortfall: Q = Q(
    "t58_expected_shortfall",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      q AS (SELECT round(quantile_cont(v, 0.05), 6) AS fence FROM b)
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(count(CASE WHEN v <= fence THEN 1 END) AS BIGINT) AS tail_n,
        fence AS var_q,
        round(CAST(SUM(CASE WHEN v <= fence
            THEN CAST(round(v, 9) AS DECIMAL(38,12)) END) AS DOUBLE)
          / count(CASE WHEN v <= fence THEN 1 END), 6) AS es
      FROM b, q GROUP BY fence"""),
    (s, dir) => {
      val out = graft.stats.Distribution.expectedShortfall(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"))
      val r = out.head()
      require(r.getAs[Double]("es") <= r.getAs[Double]("var_q"),
        s"the tail mean cannot exceed its own fence: $r")
      out
    })

  /** Per-group trimmed means
    * ([[graft.transform.Winsorize.trimmedMeanByGroup]]) of
    * extendedprice by return flag at 5/95 — the grouped robust-location
    * table beside t51's global one. The oracle replays the per-group
    * round-6 fences, the inclusive trim, and the round-9 decimal
    * folds. */
  val t59TrimmedByGroup: Q = Q(
    "t59_trimmed_mean_by_group",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS key,
          CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem),
      f AS (
        SELECT key, round(quantile_cont(v, 0.05), 6) AS lo,
          round(quantile_cont(v, 0.95), 6) AS hi
        FROM b GROUP BY key)
      SELECT b.key,
        CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
          AS n_total,
        CAST(count(CASE WHEN v >= lo AND v <= hi THEN 1 END) AS BIGINT)
          AS n_used,
        MAX(lo) AS lo, MAX(hi) AS hi,
        round(CAST(SUM(CASE WHEN v >= lo AND v <= hi
            THEN CAST(round(v, 9) AS DECIMAL(38,12)) END) AS DOUBLE)
          / count(CASE WHEN v >= lo AND v <= hi THEN 1 END), 6)
          AS trimmed_mean
      FROM b JOIN f USING (key)
      GROUP BY b.key ORDER BY b.key"""),
    (s, dir) => {
      val out = graft.transform.Winsorize.trimmedMeanByGroup(
        Tables.load(s, dir, "lineitem"), col("l_returnflag"),
        "l_extendedprice")
      if (Tables.gateMode) {
        val bad = out.filter(col("trimmed_mean") < col("lo") ||
          col("trimmed_mean") > col("hi")).count()
        require(bad == 0L, s"a trimmed mean escaped its fences: $bad")
      }
      out
    })

  /** One-sample KS against U(0,1) ([[graft.stats.Drift.ksUniform]]) on
    * the engine's own hash-fraction splitter — the uniformity QC every
    * deterministic randomizer must pass (and here must NOT reject,
    * asserted in-gate). The oracle replays both one-sided gaps at every
    * jump via windows and the same Kolmogorov p series. */
  val dqKsUniform: Q = Q(
    "dq_ks_uniform",
    Some("""
      WITH b AS (
        SELECT (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-arm',
          CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
          / 4294967296.0) AS v
        FROM orders),
      c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v),
      nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
      w AS (
        SELECT v, c,
          COALESCE(SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
          SUM(c) OVER (ORDER BY v) AS ca
        FROM c),
      dd AS (
        SELECT MAX(GREATEST(abs(cb / CAST(nn.n AS DOUBLE) - v),
          abs(ca / CAST(nn.n AS DOUBLE) - v))) AS d
        FROM w, nn),
      lam AS (
        SELECT d, (sqrt(CAST(nn.n AS DOUBLE)) + 0.12
          + 0.11 / sqrt(CAST(nn.n AS DOUBLE))) * d AS l
        FROM dd, nn),
      ps AS (
        SELECT l, SUM(CAST(round(
          2 * (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
            * exp(-2 * k * k * l * l), 12) AS DECIMAL(38,12))) AS s
        FROM lam, generate_series(1, 100) t(k) GROUP BY l)
      SELECT nn.n, round(lam.d, 6) + 0.0 AS d_stat,
        CASE WHEN lam.l < 0.1 THEN 1.0
          ELSE round(least(1.0, greatest(0.0, CAST(s AS DOUBLE))), 6)
        END AS p_value
      FROM nn, lam, ps"""),
    (s, dir) => {
      val hf = graft.ops.Sampling.hashFraction("graft-arm",
        Seq(col("o_orderkey")))
      val out = graft.stats.Drift.ksUniform(
        Tables.load(s, dir, "orders").select(hf.as("v")), col("v"))
      val r = out.head()
      require(r.getAs[Double]("p_value") > 1e-4,
        s"the hash splitter must pass its own uniformity QC: $r")
      out
    })

  /** Wilcoxon signed-rank ([[graft.stats.RankTests.wilcoxonSignedRank]])
    * on the PAIRED (l_discount, l_tax) measurements per lineitem row —
    * "is the median discount−tax difference zero". The oracle replays
    * the distinct-|d| average-rank scan as a window over the bounded
    * grid (≤ ~19 distinct |d| on the synthetic 0.01-step columns) and
    * the tie-corrected z from the same exact integers. The normal p is
    * library-only (asserted in [0,1] in-gate, dropped from the hash). */
  val t60Wilcoxon: Q = Q(
    "t60_wilcoxon_signed",
    Some("""
      WITH b AS (
        SELECT CAST(l_discount AS DOUBLE) - CAST(l_tax AS DOUBLE) AS d
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
      nz AS (SELECT d, abs(d) AS ad FROM b WHERE d <> 0),
      c AS (
        SELECT ad,
          SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos,
          COUNT(*) AS t
        FROM nz GROUP BY ad),
      w AS (
        SELECT cpos, t,
          COALESCE(SUM(t) OVER (ORDER BY ad
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        FROM c),
      s AS (
        SELECT CAST(SUM(t) AS BIGINT) AS n,
          CAST(SUM(cpos * (2 * below + t + 1)) AS DOUBLE) / 2.0 AS wp,
          CAST(SUM(t * t * t - t) AS DOUBLE) AS tie3
        FROM w)
      SELECT n AS n_nonzero, wp AS w_plus,
        CAST(n AS DOUBLE) * (n + 1) / 2.0 - wp AS w_minus,
        round((wp - CAST(n AS DOUBLE) * (n + 1) / 2.0 / 2.0 -
            (CASE WHEN wp > CAST(n AS DOUBLE) * (n + 1) / 2.0 / 2.0 THEN 0.5
                  WHEN wp < CAST(n AS DOUBLE) * (n + 1) / 2.0 / 2.0 THEN -0.5
                  ELSE 0.0 END))
          / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
            - tie3 / 48.0), 6) + 0.0 AS z
      FROM s"""),
    (s, dir) => {
      val out = RankTests.wilcoxonSignedRank(
        Tables.load(s, dir, "lineitem"), col("l_discount"), col("l_tax"))
      val r = out.head()
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"normal p must be a probability: $p")
      require(r.getAs[Double]("w_plus") + r.getAs[Double]("w_minus") ==
        r.getAs[Long]("n_nonzero").toDouble *
          (r.getAs[Long]("n_nonzero") + 1) / 2.0,
        "rank mass must partition: W+ + W- = n(n+1)/2")
      out.drop("p_value")
    })

  /** Cliff's delta ([[graft.stats.RankTests.cliffsDelta]]) between a
    * hash-split arm and the same arm shifted +10 — the effect-size
    * companion of t35's U test; the oracle derives δ and the Romano
    * magnitude label from the identical pair count. */
  val t61CliffsDelta: Q = Q(
    "t61_cliffs_delta",
    Some("""
      WITH b0 AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|', 'graft-cd',
            CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
            1, 8)) AS BIGINT) / 4294967296.0 < 0.5 AS arm,
          l_quantity
        FROM lineitem
        WHERE l_quantity IS NOT NULL),
      b AS (
        SELECT arm, CAST(l_quantity +
          CASE WHEN arm THEN 0 ELSE 10 END AS DOUBLE) AS v
        FROM b0),
      c AS (
        SELECT v,
          SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS ca,
          SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS cb
        FROM b GROUP BY v),
      w AS (
        SELECT ca, cb,
          COALESCE(SUM(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cb_below
        FROM c),
      s AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na,
          CAST(SUM(cb) AS BIGINT) AS nb,
          CAST(SUM(ca * (2 * cb_below + cb)) AS DOUBLE) / 2.0 AS ua
        FROM w),
      d AS (
        SELECT na, nb,
          round(2.0 * ua / (CAST(na AS DOUBLE) * nb) - 1.0, 6) + 0.0
            AS delta
        FROM s)
      SELECT na AS n_a, nb AS n_b, delta,
        CASE WHEN abs(delta) < 0.147 THEN 'negligible'
             WHEN abs(delta) < 0.33 THEN 'small'
             WHEN abs(delta) < 0.474 THEN 'medium'
             ELSE 'large' END AS magnitude
      FROM d"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull)
        .withColumn("__arm", graft.ops.Sampling.hashFraction("graft-cd",
          Seq(col("l_orderkey"), col("l_linenumber"))) < 0.5)
        .withColumn("__v", col("l_quantity") +
          when(col("__arm"), 0).otherwise(10))
      val out = RankTests.cliffsDelta(base, col("__arm"), col("__v"))
      val r = out.head()
      require(r.getAs[Double]("delta") < -0.2,
        s"the planted +10 shift must push delta well negative: $r")
      out
    })

  /** Hodges–Lehmann shift ([[graft.stats.RankTests.hodgesLehmannShift]])
    * between a hash-split arm and the same arm shifted +3 — the robust
    * location-shift estimate should land at the planted −3. The oracle
    * replays the distinct-value cross, the exact HUGEINT pair weights,
    * and the weighted-median sweep. */
  val t62HodgesLehmann: Q = Q(
    "t62_hodges_lehmann",
    Some("""
      WITH b0 AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|', 'graft-hl',
            CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
            1, 8)) AS BIGINT) / 4294967296.0 < 0.5 AS arm,
          l_quantity
        FROM lineitem
        WHERE l_quantity IS NOT NULL),
      b AS (
        SELECT arm, CAST(l_quantity +
          CASE WHEN arm THEN 0 ELSE 3 END AS DOUBLE) AS v
        FROM b0),
      da AS (SELECT v AS va, COUNT(*) AS ca FROM b WHERE arm GROUP BY v),
      db AS (SELECT v AS vb, COUNT(*) AS cb FROM b WHERE NOT arm GROUP BY v),
      cells AS (
        SELECT va - vb AS diff,
          CAST(SUM(CAST(ca AS HUGEINT) * cb) AS HUGEINT) AS w
        FROM da, db GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(w) AS HUGEINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cells),
      sw AS (
        SELECT diff, SUM(w) OVER (ORDER BY diff
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM cells),
      sel AS (
        SELECT
          MIN(CASE WHEN cum >= (t + 1) // 2 THEN diff END) AS lo,
          MIN(CASE WHEN cum >= t // 2 + 1 THEN diff END) AS hi,
          MAX(n_cells) AS n_diff_cells
        FROM sw, tot),
      na AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a FROM da),
      nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS n_b FROM db)
      SELECT n_a, n_b, n_diff_cells,
        round((lo + hi) / 2.0, 6) + 0.0 AS hl_shift
      FROM sel, na, nb"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull)
        .withColumn("__arm", graft.ops.Sampling.hashFraction("graft-hl",
          Seq(col("l_orderkey"), col("l_linenumber"))) < 0.5)
        .withColumn("__v", col("l_quantity") +
          when(col("__arm"), 0).otherwise(3))
      val out = RankTests.hodgesLehmannShift(base, col("__arm"), col("__v"))
      val r = out.head()
      val hl = r.getAs[Double]("hl_shift")
      require(hl >= -4.0 && hl <= -2.0,
        s"the planted +3 shift must surface as HL about -3, got $hl")
      out
    })

  /** Cochran–Armitage trend ([[graft.stats.Contingency.cochranArmitage]]):
    * does the return-flag rate trend across line numbers 1..7? The
    * synthetic columns are independent, so the gate exercises the
    * estimator's exact sums (z should hover near 0), not a discovery;
    * the oracle replays the five integer sums and the z arithmetic. */
  val t63CochranArmitage: Q = Q(
    "t63_cochran_armitage",
    Some("""
      WITH b AS (
        SELECT (l_returnflag = 'R') AS f, CAST(l_linenumber AS BIGINT) AS s
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_linenumber IS NOT NULL),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(COUNT(DISTINCT s) AS BIGINT) AS k,
          CAST(SUM(s) AS DOUBLE) AS sn,
          CAST(SUM(CASE WHEN f THEN s ELSE 0 END) AS DOUBLE) AS sa,
          CAST(SUM(s * s) AS DOUBLE) AS s2n
        FROM b)
      SELECT k AS k_levels, n, a AS n_pos,
        round((sa - (CAST(a AS DOUBLE) / n) * sn)
          / sqrt((CAST(a AS DOUBLE) / n) * (1.0 - CAST(a AS DOUBLE) / n)
            * (s2n - sn * sn / n)), 6) + 0.0 AS z
      FROM m"""),
    (s, dir) => {
      val out = Contingency.cochranArmitage(
        Tables.load(s, dir, "lineitem")
          .filter(col("l_linenumber").isNotNull),
        col("l_returnflag") === "R", col("l_linenumber"))
      val r = out.head()
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"normal p must be a probability: $p")
      require(math.abs(r.getAs[Double]("z")) < 6.0,
        s"independent columns must not show a huge trend: $r")
      out.drop("p_value")
    })

  /** G-test of independence ([[graft.stats.Contingency.gTest]]) on
    * returnflag × linestatus — the likelihood-ratio twin of t18's χ²
    * with the Williams correction; the oracle replays the per-cell
    * O·ln(O/E) terms (round-9 decimal fold) and the margin-reciprocal
    * q factor. */
  val t64GTest: Q = Q(
    "t64_g_test",
    Some("""
      WITH b AS (
        SELECT l_returnflag AS a, l_linestatus AS bb FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL),
      cnt AS (
        SELECT a, bb, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY a, bb),
      ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cnt GROUP BY a),
      cb AS (SELECT bb, CAST(SUM(o) AS BIGINT) AS cb FROM cnt GROUP BY bb),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cnt),
      terms AS (
        SELECT round(CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE)
          / (CAST(ra.ra AS DOUBLE) * cb.cb / nn.n)), 9) AS term
        FROM cnt JOIN ra USING (a) JOIN cb USING (bb), nn
        WHERE o > 0),
      gsum AS (
        SELECT CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS ghalf
        FROM terms),
      mr AS (
        SELECT CAST(SUM(CAST(round(1.0 / ra, 12) AS DECIMAL(38,12)))
          AS DOUBLE) AS rs, CAST(COUNT(*) AS BIGINT) AS nr FROM ra),
      mc AS (
        SELECT CAST(SUM(CAST(round(1.0 / cb, 12) AS DECIMAL(38,12)))
          AS DOUBLE) AS cs, CAST(COUNT(*) AS BIGINT) AS nc FROM cb),
      f AS (
        SELECT n, nr, nc, 2.0 * ghalf AS g,
          1.0 + (CAST(n AS DOUBLE) * rs - 1.0)
            * (CAST(n AS DOUBLE) * cs - 1.0)
            / (6.0 * n * (nr - 1) * (nc - 1)) AS q
        FROM gsum, mr, mc, nn)
      SELECT n, nr AS levels_a, nc AS levels_b,
        CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        round(g, 6) + 0.0 AS g, round(g / q, 6) + 0.0 AS g_williams
      FROM f"""),
    (s, dir) => {
      val out = Contingency.gTest(
        Tables.load(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
      val r = out.head()
      require(r.getAs[Double]("g") > 0.0 &&
        r.getAs[Double]("g_williams") <= r.getAs[Double]("g"),
        s"Williams correction must shrink G: $r")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"chi2 p must be a probability: $p")
      out.drop("p_value")
    })

  /** Bartlett's equal-variance test ([[graft.stats.Anova.bartlett]]) on
    * customer account balance across market segments — the likelihood-
    * ratio companion of t37's Brown–Forsythe; the oracle replays the
    * per-group exact moments and the round-12 decimal folds of the
    * ln-variance and reciprocal sums. */
  val t65Bartlett: Q = Q(
    "t65_bartlett",
    Some("""
      WITH b AS (
        SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS y
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
      gm AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s2
        FROM b GROUP BY g),
      t AS (
        SELECT
          CAST(SUM(n) AS BIGINT) AS n_total,
          CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(CAST(round((n - 1) * ((s2 - s1 * s1 / n) / (n - 1)), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS ssw,
          CAST(SUM(CAST(round((n - 1) * ln((s2 - s1 * s1 / n) / (n - 1)),
            12) AS DECIMAL(38,12))) AS DOUBLE) AS lnsum,
          CAST(SUM(CAST(round(1.0 / (n - 1), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS recip
        FROM gm),
      f AS (
        SELECT k, n_total, n_total - k AS dfw,
          ssw / (n_total - k) AS sp2, lnsum, recip
        FROM t)
      SELECT k AS k_groups, n_total,
        round((dfw * ln(sp2) - lnsum)
          / (1.0 + (recip - 1.0 / dfw) / (3.0 * (k - 1))), 6) + 0.0
          AS t_stat,
        round(1.0 + (recip - 1.0 / dfw) / (3.0 * (k - 1)), 6) + 0.0
          AS c_factor
      FROM f"""),
    (s, dir) => {
      val out = Anova.bartlett(
        Tables.load(s, dir, "customer"), "c_mktsegment", "c_acctbal")
      val r = out.head()
      require(r.getAs[Double]("c_factor") > 1.0,
        s"the Bartlett correction factor is > 1 by construction: $r")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"chi2 p must be a probability: $p")
      out.drop("p_value")
    })

  /** Box–Cox λ scan ([[graft.transform.Standardize.boxCoxScan]]) on
    * extended price over the pow()-free canonical grid — the oracle
    * replays all fifteen round-12 moment folds and the seven profile
    * log-likelihoods. */
  val t66BoxCox: Q = Q(
    "t66_boxcox_lambda",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(ln(x), 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS slnx,
          CAST(SUM(CAST(round(1.0 / (x * x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS a1,
          CAST(SUM(CAST(round((1.0 / (x * x)) * (1.0 / (x * x)), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS a2,
          CAST(SUM(CAST(round(1.0 / x, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS b1,
          CAST(SUM(CAST(round((1.0 / x) * (1.0 / x), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS b2,
          CAST(SUM(CAST(round(1.0 / sqrt(x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS c1,
          CAST(SUM(CAST(round((1.0 / sqrt(x)) * (1.0 / sqrt(x)), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS c2,
          CAST(SUM(CAST(round(ln(x), 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS d1,
          CAST(SUM(CAST(round(ln(x) * ln(x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS d2,
          CAST(SUM(CAST(round(sqrt(x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS e1,
          CAST(SUM(CAST(round(sqrt(x) * sqrt(x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS e2,
          CAST(SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS f1,
          CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS f2,
          CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS g1,
          CAST(SUM(CAST(round((x * x) * (x * x), 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS g2
        FROM b),
      lls AS (
        SELECT -2.0 AS lambda, round((-n / 2.0)
          * ln(a2 / n - (a1 / n) * (a1 / n)) + n * ln(2.0)
          + (-3.0) * slnx, 6) + 0.0
          AS loglik FROM m
        UNION ALL SELECT -1.0, round((-n / 2.0)
          * ln(b2 / n - (b1 / n) * (b1 / n)) + n * ln(1.0)
          + (-2.0) * slnx, 6) + 0.0
          FROM m
        UNION ALL SELECT -0.5, round((-n / 2.0)
          * ln(c2 / n - (c1 / n) * (c1 / n)) + n * ln(0.5)
          + (-1.5) * slnx, 6) + 0.0
          FROM m
        UNION ALL SELECT 0.0, round((-n / 2.0)
          * ln(d2 / n - (d1 / n) * (d1 / n)) + (-1.0) * slnx, 6) + 0.0
          FROM m
        UNION ALL SELECT 0.5, round((-n / 2.0)
          * ln(e2 / n - (e1 / n) * (e1 / n)) + n * ln(0.5)
          + (-0.5) * slnx, 6) + 0.0
          FROM m
        UNION ALL SELECT 1.0, round((-n / 2.0)
          * ln(f2 / n - (f1 / n) * (f1 / n)) + n * ln(1.0)
          + 0.0 * slnx, 6) + 0.0
          FROM m
        UNION ALL SELECT 2.0, round((-n / 2.0)
          * ln(g2 / n - (g1 / n) * (g1 / n)) + n * ln(2.0)
          + 1.0 * slnx, 6) + 0.0
          FROM m),
      bst AS (
        SELECT MIN(lambda) AS bl FROM lls
        WHERE loglik = (SELECT MAX(loglik) FROM lls))
      SELECT lambda, loglik, lambda = bl AS is_best
      FROM lls, bst ORDER BY lambda"""),
    (s, dir) => {
      val out = graft.transform.Standardize.boxCoxScan(
        Tables.load(s, dir, "lineitem"), "l_extendedprice")
      val rows = out.collect()
      require(rows.length == 7 && rows.count(_.getAs[Boolean]("is_best")) == 1,
        s"one winner over the 7-point grid: ${rows.mkString(";")}")
      out
    })

  /** Variance inflation factors ([[graft.stats.Regression.vif3]]) for
    * the (quantity, price, discount) design — the oracle replays the
    * nine moment folds, the round-9 correlations, and the closed-form
    * 3×3 inverse. */
  val t67Vif: Q = Q(
    "t67_vif",
    Some("""
      WITH b AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x1,
          CAST(l_extendedprice AS DOUBLE) AS x2,
          CAST(l_discount AS DOUBLE) AS x3
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(round(x2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2,
          CAST(SUM(CAST(round(x3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s3,
          CAST(SUM(CAST(round(x1 * x1, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s11,
          CAST(SUM(CAST(round(x2 * x2, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s22,
          CAST(SUM(CAST(round(x3 * x3, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s33,
          CAST(SUM(CAST(round(x1 * x2, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s12,
          CAST(SUM(CAST(round(x1 * x3, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s13,
          CAST(SUM(CAST(round(x2 * x3, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s23
        FROM b),
      c AS (
        SELECT
          round((s12 - s1 * s2 / n)
            / sqrt((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)), 9) AS r12,
          round((s13 - s1 * s3 / n)
            / sqrt((s11 - s1 * s1 / n) * (s33 - s3 * s3 / n)), 9) AS r13,
          round((s23 - s2 * s3 / n)
            / sqrt((s22 - s2 * s2 / n) * (s33 - s3 * s3 / n)), 9) AS r23
        FROM m),
      d AS (
        SELECT r12, r13, r23,
          1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23
            AS det
        FROM c),
      v AS (
        SELECT 'l_quantity' AS feature, (1.0 - r23 * r23) / det AS vf
          FROM d
        UNION ALL SELECT 'l_extendedprice', (1.0 - r13 * r13) / det
          FROM d
        UNION ALL SELECT 'l_discount', (1.0 - r12 * r12) / det FROM d)
      SELECT feature, round(1.0 - 1.0 / vf, 6) + 0.0 AS r_squared,
        round(vf, 6) + 0.0 AS vif
      FROM v ORDER BY feature"""),
    (s, dir) => {
      val out = Regression.vif3(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      val rows = out.collect()
      require(rows.forall(_.getAs[Double]("vif") >= 1.0),
        s"VIF is bounded below by 1: ${rows.mkString(";")}")
      out
    })

  /** OLS influence top-10 ([[graft.stats.Regression.influenceTopK]])
    * for price ~ quantity — the oracle replays the moment-sum fit, the
    * per-row leverage/residual algebra, and the (Cook's D, id) cut. */
  val t68Influence: Q = Q(
    "t68_influence",
    Some("""
      WITH b AS (
        SELECT l_orderkey * 10 + l_linenumber AS id,
          CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
          AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx,
          CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS syy,
          CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy
        FROM b),
      f1 AS (
        SELECT n, sx / n AS mx, sxx - sx * sx / n AS ssx,
          (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
          sy, sxy, sx, syy
        FROM m),
      f2 AS (
        SELECT n, mx, ssx, slope,
          sy / n - slope * mx AS icept,
          (syy - sy * sy / n - slope * (sxy - sx * sy / n)) / (n - 2)
            AS s2
        FROM f1),
      r AS (
        SELECT id, x, y,
          1.0 / n + (x - mx) * (x - mx) / ssx AS h,
          y - (icept + slope * x) AS e
        FROM b, f2),
      d AS (
        SELECT id, x, y, h,
          round(e * e / (2.0 * (SELECT s2 FROM f2)) * h
            / ((1.0 - h) * (1.0 - h)), 9) AS cd
        FROM r)
      SELECT id, x, y, round(h, 6) + 0.0 AS leverage,
        round(cd, 6) + 0.0 AS cooks_d
      FROM d ORDER BY cd DESC, id LIMIT 10"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("__id", col("l_orderkey") * 10 + col("l_linenumber"))
      val out = Regression.influenceTopK(li, "__id", "l_quantity",
        "l_extendedprice")
      val rows = out.collect()
      require(rows.length == 10 &&
        rows.forall(_.getAs[Double]("leverage") > 0.0),
        s"ten diagnosable rows with positive leverage")
      out
    })

  /** Levene's mean-centered variance test ([[graft.stats.Anova.levene]]
    * is the API; the gate inlines the deterministic t37 recipe with
    * round-6 decimal-fold mean centers) — completing the
    * Bartlett / Brown–Forsythe / Levene variance-homogeneity family. */
  val t69Levene: Q = Q(
    "t69_levene",
    Some("""
      WITH mu AS (
        SELECT c_mktsegment AS grp,
          round(CAST(SUM(CAST(round(CAST(c_acctbal AS DOUBLE), 12)
            AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mu
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        GROUP BY 1),
      z AS (
        SELECT m.grp, abs(CAST(c_acctbal AS DOUBLE) - mu) AS z
        FROM customer c JOIN mu m ON c.c_mktsegment = m.grp
        WHERE c.c_acctbal IS NOT NULL),
      g AS (
        SELECT grp, count(*) AS n,
          CAST(SUM(CAST(round(z, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(round(z * z, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS s2
        FROM z GROUP BY grp),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS k,
          sum(s1) / sum(n) AS gm FROM g),
      ss AS (
        SELECT
          (SELECT sum(n * (s1 / n - gm) * (s1 / n - gm)) FROM g, tot)
            AS ssb,
          (SELECT sum(s2 - s1 * s1 / n) FROM g) AS ssw,
          (SELECT k - 1 FROM tot) AS dfb,
          (SELECT n_total - k FROM tot) AS dfw)
      SELECT ROUND((ssb / dfb) / (ssw / dfw), 4) AS w_stat,
        dfb AS df1, dfw AS df2
      FROM ss"""),
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val cust = Tables.load(s, dir, "customer")
      val base = cust.filter(col("c_mktsegment").isNotNull &&
        col("c_acctbal").isNotNull)
      val mu = base.groupBy(col("c_mktsegment").as("grp"))
        .agg(round(
          sum(round(col("c_acctbal").cast("double"), 12)
            .cast(DecimalType(38, 12))).cast("double") / count(lit(1)), 6)
          .as("mu"))
      val z = base.join(mu, col("c_mktsegment") === col("grp"))
        .select(col("grp"),
          abs(col("c_acctbal").cast("double") - col("mu")).as("z"))
      val g = z.groupBy("grp").agg(count(lit(1)).as("n"),
        sum(round(col("z"), 12).cast(DecimalType(38, 12)))
          .cast("double").as("s1"),
        sum(round(col("z") * col("z"), 12).cast(DecimalType(38, 12)))
          .cast("double").as("s2"))
      val tot = g.agg(sum(col("n")).as("n_total"), count(lit(1)).as("k"),
        (sum(col("s1")) / sum(col("n"))).as("gm"))
      val m = col("s1") / col("n")
      val ss = g.crossJoin(tot).agg(
        sum(col("n") * (m - col("gm")) * (m - col("gm"))).as("ssb"),
        sum(col("s2") - col("s1") * col("s1") / col("n")).as("ssw"),
        max(col("k") - 1).as("dfb"),
        max(col("n_total") - col("k")).as("dfw"))
      val out = ss.select(
        round((col("ssb") / col("dfb")) / (col("ssw") / col("dfw")), 4)
          .as("w_stat"),
        col("dfb").as("df1"), col("dfw").as("df2"))
      val r = out.head()
      require(r.getAs[Double]("w_stat") >= 0.0, s"F is non-negative: $r")
      out
    })

  /** Lin's concordance ([[graft.stats.Correlation.linsCCC]]) between
    * the gross and discounted price — a perfectly-correlated pair
    * (r ≈ 1) that does NOT agree on the 45° line, exactly the gap CCC
    * exists to expose. The oracle replays the five moment folds and
    * both coefficients. */
  val t70LinsCcc: Q = Q(
    "t70_lins_ccc",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) * (1.0 - l_discount) AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx,
          CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS syy,
          CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy
        FROM b),
      f AS (
        SELECT n, sx / n AS mx, sy / n AS my,
          sxx / n - (sx / n) * (sx / n) AS vx,
          syy / n - (sy / n) * (sy / n) AS vy,
          sxy / n - (sx / n) * (sy / n) AS cxy
        FROM m)
      SELECT n, round(mx, 6) + 0.0 AS mean_x, round(my, 6) + 0.0
          AS mean_y,
        round(cxy / sqrt(vx * vy), 6) + 0.0 AS pearson_r,
        round(2.0 * cxy / (vx + vy + (mx - my) * (mx - my)), 6) + 0.0
          AS ccc
      FROM f"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val out = Correlation.linsCCC(li,
        col("l_extendedprice").cast("double"),
        col("l_extendedprice").cast("double") *
          (lit(1.0) - col("l_discount")))
      val r = out.head()
      require(r.getAs[Double]("pearson_r") > 0.99 &&
        r.getAs[Double]("ccc") < r.getAs[Double]("pearson_r"),
        s"high r with a scale drift must pull CCC below r: $r")
      out
    })

  /** Odds ratio + Woolf CI ([[graft.stats.Contingency.oddsRatioCI]])
    * for return-flag vs deep-discount — the oracle replays the four
    * cells, the Haldane branch, and the logit CI with the shared z
    * literal. */
  val t71OddsRatio: Q = Q(
    "t71_odds_ratio_ci",
    Some("""
      WITH m AS (
        SELECT
          CAST(SUM(CASE WHEN (l_returnflag = 'R') AND (l_discount > 0.05)
            THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN (l_returnflag = 'R')
            AND NOT (l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT)
            AS b,
          CAST(SUM(CASE WHEN NOT (l_returnflag = 'R')
            AND (l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN NOT (l_returnflag = 'R')
            AND NOT (l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT)
            AS d
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL),
      f AS (
        SELECT a, b, c, d,
          (a = 0 OR b = 0 OR c = 0 OR d = 0) AS haldane,
          CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
            THEN 0.5 ELSE 0.0 END AS h
        FROM m),
      g AS (
        SELECT a, b, c, d, haldane,
          (a + h) * (d + h) / ((b + h) * (c + h)) AS orr,
          sqrt(1.0 / (a + h) + 1.0 / (b + h) + 1.0 / (c + h)
            + 1.0 / (d + h)) AS se
        FROM f)
      SELECT a AS n_tt, b AS n_tf, c AS n_ft, d AS n_ff, haldane,
        round(orr, 6) + 0.0 AS odds_ratio,
        round(exp(ln(orr) - 1.959963984540054 * se), 6) + 0.0 AS ci_low,
        round(exp(ln(orr) + 1.959963984540054 * se), 6) + 0.0 AS ci_high
      FROM g"""),
    (s, dir) => {
      val out = Contingency.oddsRatioCI(Tables.load(s, dir, "lineitem"),
        col("l_returnflag") === "R", col("l_discount") > 0.05)
      val r = out.head()
      require(r.getAs[Double]("ci_low") <= r.getAs[Double]("odds_ratio")
        && r.getAs[Double]("odds_ratio") <= r.getAs[Double]("ci_high"),
        s"the CI must bracket the point estimate: $r")
      out
    })

  /** D'Agostino K² + Jarque–Bera
    * ([[graft.stats.Normality.dagostinoK2]]): the distributed normality
    * pair over line-item prices — the oracle replays the round-6
    * centering mean, the three round-12 central-moment folds, the
    * D'Agostino/Anscombe–Glynn transforms (sqrt/ln/cbrt only — no pow),
    * K², JB, and both χ²(2) p-values via exp(−x/2). In-gate: prices are
    * decisively non-normal (flat-tailed: z_kurt < 0, both p < 0.05). */
  val t72DagostinoK2: Q = Q(
    "t72_dagostino_k2",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      m0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 6) AS mu
        FROM b),
      mm AS (
        SELECT n,
          CAST(SUM(CAST(round((x - mu) * (x - mu), 12)
            AS DECIMAL(38,12))) AS DOUBLE) / n AS m2,
          CAST(SUM(CAST(round((x - mu) * (x - mu) * (x - mu), 12)
            AS DECIMAL(38,12))) AS DOUBLE) / n AS m3,
          CAST(SUM(CAST(round((x - mu) * (x - mu) * (x - mu) * (x - mu),
            12) AS DECIMAL(38,12))) AS DOUBLE) / n AS m4
        FROM b, m0 GROUP BY n),
      g AS (
        SELECT n, CAST(n AS DOUBLE) AS nd,
          m3 / (m2 * sqrt(m2)) AS g1,
          m4 / (m2 * m2) AS b2,
          m4 / (m2 * m2) - 3.0 AS g2
        FROM mm),
      sk AS (
        SELECT *,
          g1 * sqrt((nd + 1) * (nd + 3) / (6 * (nd - 2))) AS y,
          -1.0 + sqrt(2 * (3.0 * (nd * nd + 27 * nd - 70) * (nd + 1)
            * (nd + 3) / ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9))
            - 1)) AS w2
        FROM g),
      sk2 AS (
        SELECT *,
          (1.0 / sqrt(ln(sqrt(w2)))) * ln(y / sqrt(2.0 / (w2 - 1))
            + sqrt((y / sqrt(2.0 / (w2 - 1)))
                   * (y / sqrt(2.0 / (w2 - 1))) + 1)) AS z_skew
        FROM sk),
      ku AS (
        SELECT *,
          (b2 - 3.0 * (nd - 1) / (nd + 1))
            / sqrt(24.0 * nd * (nd - 2) * (nd - 3)
              / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5))) AS xs,
          6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9))
            * sqrt(6.0 * (nd + 3) * (nd + 5)
              / (nd * (nd - 2) * (nd - 3))) AS sb1
        FROM sk2),
      ku2 AS (
        SELECT *, 6.0 + 8.0 / sb1
          * (2.0 / sb1 + sqrt(1 + 4.0 / (sb1 * sb1))) AS a
        FROM ku),
      ku3 AS (
        SELECT *,
          ((1 - 2.0 / (9 * a)) - cbrt((1 - 2.0 / a)
            / (1 + xs * sqrt(2.0 / (a - 4))))) / sqrt(2.0 / (9 * a))
            AS z_kurt
        FROM ku2),
      f AS (
        SELECT n, g1, g2, z_skew, z_kurt,
          z_skew * z_skew + z_kurt * z_kurt AS k2,
          nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0) AS jb
        FROM ku3)
      SELECT n, round(g1, 6) + 0.0 AS g1, round(g2, 6) + 0.0 AS g2,
        round(z_skew, 6) + 0.0 AS z_skew,
        round(z_kurt, 6) + 0.0 AS z_kurt,
        round(k2, 6) + 0.0 AS k2,
        round(exp(-k2 / 2), 6) + 0.0 AS k2_p,
        round(jb, 6) + 0.0 AS jb,
        round(exp(-jb / 2), 6) + 0.0 AS jb_p
      FROM f"""),
    (s, dir) => {
      val out = graft.stats.Normality.dagostinoK2(
        Tables.load(s, dir, "lineitem"), col("l_extendedprice"))
      val r = out.head()
      require(r.getAs[Double]("z_kurt") < 0.0 &&
        r.getAs[Double]("k2_p") < 0.05 && r.getAs[Double]("jb_p") < 0.05,
        s"flat-tailed prices must reject normality decisively: $r")
      out
    })

  /** Friedman repeated-measures test ([[graft.stats.RankTests
    * .friedman]]): orders with line numbers 1–3 as complete blocks, a
    * planted +2·linenumber treatment effect on quantity. Ranks travel
    * DOUBLED (exact integers end to end), so the oracle replays the
    * within-block rank windows, the per-treatment sums, Conover's
    * tie-exact Q, and the k=3 closed-form χ²(2) p = exp(−Q/2). In-gate:
    * the planted order fires (mean ranks increase with the line number,
    * p ≪ 0.01). */
  val t73Friedman: Q = Q(
    "t73_friedman",
    Some("""
      WITH b AS (
        SELECT l_orderkey AS blk, CAST(l_linenumber AS VARCHAR) AS g,
          CAST(l_quantity + 2 * l_linenumber AS DOUBLE) AS v
        FROM lineitem
        WHERE l_linenumber <= 3 AND l_quantity IS NOT NULL),
      ok AS (SELECT blk FROM b GROUP BY blk
             HAVING count(*) = 3 AND count(DISTINCT g) = 3),
      c AS (SELECT b.* FROM b JOIN ok USING (blk)),
      r AS (
        SELECT g,
          CAST(2 * rank() OVER (PARTITION BY blk ORDER BY v)
            + count(*) OVER (PARTITION BY blk, v) - 1 AS BIGINT) AS r2
        FROM c),
      agg AS (SELECT g, CAST(SUM(r2) AS BIGINT) AS r2sum
              FROM r GROUP BY g),
      tot AS (SELECT CAST(SUM(r2 * r2) AS BIGINT) AS a2 FROM r),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM ok),
      st AS (
        SELECT CAST(SUM((r2sum / 2.0 - nb * 2.0)
          * (r2sum / 2.0 - nb * 2.0)) AS DOUBLE) AS ssq
        FROM agg, nn),
      qq AS (
        SELECT 2 * ssq / (a2 / 4.0 - nb * 3.0 * 16.0 / 4.0) AS q
        FROM st, tot, nn)
      SELECT g AS treatment, nb AS n_blocks,
        round(r2sum / 2.0 / nb, 6) + 0.0 AS mean_rank,
        round(q, 6) + 0.0 AS q_stat,
        round(exp(-q / 2), 6) + 0.0 AS p_value
      FROM agg, nn, qq ORDER BY treatment"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 3 && col("l_quantity").isNotNull)
        .select(col("l_orderkey").as("blk"),
          col("l_linenumber").cast("string").as("g"),
          (col("l_quantity") + lit(2) * col("l_linenumber"))
            .cast("double").as("v"))
      // the synthetic lineitem REUSES line numbers within an order, so a
      // complete block needs both three rows AND three distinct labels
      val ok = li.groupBy("blk")
        .agg(count(lit(1)).as("c"), count_distinct(col("g")).as("kg"))
        .filter(col("c") === 3 && col("kg") === 3).select("blk")
      val out = graft.stats.RankTests.friedman(
        li.join(ok, "blk"), col("blk"), col("g"), col("v"))
      val rows = out.collect()
      require(rows.length == 3 && rows.head.getAs[Double]("p_value") < 0.01,
        s"planted treatment effect must fire: ${rows.mkString(";")}")
      val ranks = rows.map(r =>
        r.getString(0) -> r.getAs[Double]("mean_rank")).toMap
      require(ranks("1") < ranks("2") && ranks("2") < ranks("3"),
        s"mean ranks must follow the planted +2/linenumber order: $ranks")
      out
    })

  /** Quade test ([[graft.stats.RankTests.quade]]) on the t73 fixture:
    * range-weighted within-block ranks, so wide blocks vote loudest.
    * The oracle replays BOTH doubled-midrank layers (within-block and
    * across block ranges), the exact-integer 4·S scores, and T₃ from
    * the exact decimal A/B sums. In-gate: the planted +2·linenumber
    * order shows in the treatment sums and T₃ fires. */
  val t78Quade: Q = Q(
    "t78_quade",
    Some("""
      WITH b AS (
        SELECT l_orderkey AS blk, CAST(l_linenumber AS VARCHAR) AS g,
          CAST(l_quantity + 2 * l_linenumber AS DOUBLE) AS v
        FROM lineitem
        WHERE l_linenumber <= 3 AND l_quantity IS NOT NULL),
      ok AS (SELECT blk FROM b GROUP BY blk
             HAVING count(*) = 3 AND count(DISTINCT g) = 3),
      c AS (SELECT b.* FROM b JOIN ok USING (blk)),
      r AS (
        SELECT blk, g,
          CAST(2 * rank() OVER (PARTITION BY blk ORDER BY v)
            + count(*) OVER (PARTITION BY blk, v) - 1 AS BIGINT) AS r2
        FROM c),
      rg AS (SELECT blk, max(v) - min(v) AS rng FROM c GROUP BY blk),
      rc AS (SELECT rng, CAST(count(*) AS BIGINT) AS cnt
             FROM rg GROUP BY rng),
      rq AS (
        SELECT rng,
          2 * COALESCE(SUM(cnt) OVER (ORDER BY rng
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + cnt + 1 AS q2
        FROM rc),
      bq AS (SELECT blk, q2 FROM rg JOIN rq USING (rng)),
      s AS (SELECT g, CAST(q2 * (r2 - 4) AS BIGINT) AS s4
            FROM r JOIN bq USING (blk)),
      agg AS (SELECT g, SUM(CAST(s4 AS DECIMAL(38,0))) AS s4sum
              FROM s GROUP BY g),
      aa AS (SELECT SUM(CAST(s4 AS DECIMAL(38,0))
               * CAST(s4 AS DECIMAL(38,0))) AS a16 FROM s),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM ok),
      bb AS (SELECT SUM(s4sum * s4sum) AS b16num FROM agg),
      f AS (SELECT nb, CAST(a16 AS DOUBLE) AS a16d,
              CAST(b16num AS DOUBLE) / nb AS b16d
            FROM aa, bb, nn)
      SELECT g AS treatment, nb AS n_blocks,
        round(CAST(s4sum AS DOUBLE) / 4.0, 6) + 0.0 AS s_sum,
        CASE WHEN a16d > b16d THEN
          round((nb - 1) * b16d / (a16d - b16d), 6) + 0.0 END AS t3_stat
      FROM agg, f ORDER BY treatment"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 3 && col("l_quantity").isNotNull)
        .select(col("l_orderkey").as("blk"),
          col("l_linenumber").cast("string").as("g"),
          (col("l_quantity") + lit(2) * col("l_linenumber"))
            .cast("double").as("v"))
      val ok = li.groupBy("blk")
        .agg(count(lit(1)).as("c"), count_distinct(col("g")).as("kg"))
        .filter(col("c") === 3 && col("kg") === 3).select("blk")
      val out = graft.stats.RankTests.quade(
        li.join(ok, "blk"), col("blk"), col("g"), col("v"))
      val rows = out.collect()
      val sums = rows.map(r =>
        r.getString(0) -> r.getAs[Double]("s_sum")).toMap
      require(sums("1") < sums("2") && sums("2") < sums("3"),
        s"treatment sums must follow the planted order: $sums")
      // F(2, ~1000) at alpha 0.001 is ~7; the planted effect measures
      // T3 ~ 8.6 on this fixture (range-weighting discounts many of
      // the +2-shift blocks, unlike Friedman's raw Q)
      require(rows.head.getAs[Double]("t3_stat") > 7.0,
        s"planted effect must fire: ${rows.mkString(";")}")
      out
    })

  /** Mood's median test ([[graft.stats.RankTests.moodMedian]]) on the
    * t52 planted-shift fixture (A +0, N +2, R +5): the oracle replays
    * the round-6 interpolated grand median (the shared classification
    * constant), the exact above/below cells, χ² term-for-term, and the
    * k=3 closed-form p. In-gate: the planted shifts fire (R sits above
    * its expectation, p ≪ 0.01). */
  val t74MoodMedian: Q = Q(
    "t74_mood_median",
    Some("""
      WITH b AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS g,
          CAST(l_quantity + CASE l_returnflag WHEN 'A' THEN 0
            WHEN 'N' THEN 2 ELSE 5 END AS DOUBLE) AS v
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      m AS (SELECT round(quantile_cont(v, 0.5), 6) AS med FROM b),
      cells AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT) AS na
        FROM b, m GROUP BY g),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                CAST(SUM(na) AS BIGINT) AS ab FROM cells),
      ch AS (
        SELECT CAST(SUM(
          (na - CAST(n AS DOUBLE) * ab / nt)
            * (na - CAST(n AS DOUBLE) * ab / nt)
            / (CAST(n AS DOUBLE) * ab / nt)
          + ((n - na) - CAST(n AS DOUBLE) * (nt - ab) / nt)
            * ((n - na) - CAST(n AS DOUBLE) * (nt - ab) / nt)
            / (CAST(n AS DOUBLE) * (nt - ab) / nt)) AS DOUBLE) AS chi2
        FROM cells, tot)
      SELECT g AS grp, n, na AS n_above,
        round(CAST(n AS DOUBLE) * ab / nt, 6) + 0.0 AS expected_above,
        round(chi2, 6) + 0.0 AS chi2,
        round(exp(-chi2 / 2), 6) + 0.0 AS p_value
      FROM cells, tot, ch ORDER BY grp"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
      val v = (col("l_quantity") +
        when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 2).otherwise(5))
        .cast("double")
      val out = graft.stats.RankTests.moodMedian(li, col("l_returnflag"), v)
      val rows = out.collect()
      require(rows.head.getAs[Double]("p_value") < 0.01,
        s"planted median shifts must fire: ${rows.mkString(";")}")
      val r = rows.find(_.getString(0) == "R").get
      require(r.getAs[Long]("n_above").toDouble >
        r.getAs[Double]("expected_above"),
        s"the +5 group must sit above its expectation: $r")
      out
    })

  override def queries: Seq[Q] = Seq(
    t72DagostinoK2, t73Friedman, t74MoodMedian, t75BrunnerMunzel,
    t76AnsariBradley, t77Xicor, t78Quade, t79SquaredRanks,
    t60Wilcoxon, t61CliffsDelta, t62HodgesLehmann,
    t63CochranArmitage, t64GTest, t65Bartlett,
    t66BoxCox, t67Vif, t68Influence, t69Levene, t70LinsCcc,
    t71OddsRatio,
    t40FeatureScreen, t41WelchAnova, t42Cmh, t43PartialCorr, t44DurbinWatson,
    t45BreuschPagan, t46RunsTest, t47Grubbs, t48HillTail, t49Dunn, t50Woe,
    t51TrimmedMean, t52Jonckheere, t53NeweyWest, t54Means, t55MedianCi,
    dqCvm, t56Log2Hist, t58ExpectedShortfall, dqKsUniform,
    t59TrimmedByGroup,
    t1ColumnStats, t1ColumnStatsApprox, t2Pearson, t2Spearman, t6Breakdown,
    t7Funnel, t8Impact,
    t9Ols, t12Anova, t13TTests, t15Sites, incStatsMerge, skwSaltedDistinct,
    incQuantileSketch, t17Percentiles, t18Contingency, t19Winsorize,
    t20PsiDrift, t21Standardize, t22GroupZscore, t23CategoryIndex,
    t24TargetEncode, t25PsiByDomain, t26RobustZ, t27PsiCategorical,
    t28MiTerms, t28MutualInformation, bsResampleMeans, bsBootstrapCi,
    bsUpliftCi, t29QuantileNormalize, t30TheilSen, dqKsTwoSample,
    t31EqualFreqBins, t32Association, t33Mahalanobis, t34BhFdr,
    dqWasserstein,
    t35MannWhitney, t36WelchTTests, t37BrownForsythe, t38KruskalWallis,
    t39FisherExact)
}
