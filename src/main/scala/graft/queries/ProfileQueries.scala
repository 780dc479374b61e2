package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.MergeKeys
import graft.report.Sinks
import graft.stats.{Correlation, Distribution, KDE, SiteValues}
import org.apache.spark.sql.functions._

/** Driver-gate entries for the profiling/analysis operators previously
  * spec-only: T4 composed profile, T10 distribution analysis, T11 KDE, T16
  * multisite detection, and T2's kendall leg (SURVEY.md §2.5).
  */
object ProfileQueries extends QueryModule {

  private val custKeys = MergeKeys("c_custkey")

  /** T4: the composed data profile (statistics.py:409–492) — row/column
    * counts, per-column stats, the correlation pair, and quality counters
    * flattened to (metric, value) and hash-checked against DuckDB computing
    * the same composition. */
  val t4Profile: Q = Q(
    "t4_profile",
    Some("""
      WITH base AS (
        SELECT c_custkey, c_acctbal, c_nationkey, c_mktsegment FROM customer),
      iqr AS (
        SELECT quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25) AS q1,
               quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75) AS q3
        FROM base)
      SELECT 'acctbal_distinct' AS metric,
             CAST(count(DISTINCT c_acctbal) AS DOUBLE) AS value FROM base
      UNION ALL
      SELECT 'acctbal_iqr_outliers', CAST(count(*) AS DOUBLE)
      FROM base, iqr
      WHERE c_acctbal < iqr.q1 - 1.5 * (iqr.q3 - iqr.q1)
         OR c_acctbal > iqr.q3 + 1.5 * (iqr.q3 - iqr.q1)
      UNION ALL
      SELECT 'acctbal_mean', ROUND(avg(c_acctbal), 6) FROM base
      UNION ALL
      SELECT 'acctbal_std', ROUND(stddev(c_acctbal), 4) FROM base
      UNION ALL
      SELECT 'column_count', 4.0
      UNION ALL
      SELECT 'corr_acctbal_nationkey', ROUND(corr(c_acctbal, c_nationkey), 6) FROM base
      UNION ALL
      SELECT 'duplicate_rows',
             CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM base) AS d) AS DOUBLE)
      FROM base
      UNION ALL
      SELECT 'missing_issue_columns', CAST(
        (CASE WHEN count(*) > count(c_custkey) THEN 1 ELSE 0 END) +
        (CASE WHEN count(*) > count(c_acctbal) THEN 1 ELSE 0 END) +
        (CASE WHEN count(*) > count(c_nationkey) THEN 1 ELSE 0 END) +
        (CASE WHEN count(*) > count(c_mktsegment) THEN 1 ELSE 0 END) AS DOUBLE)
      FROM base
      UNION ALL
      SELECT 'nationkey_mean', ROUND(avg(c_nationkey), 6) FROM base
      UNION ALL
      SELECT 'pid_duplicates',
             CAST(count(*) - count(DISTINCT c_custkey) AS DOUBLE) FROM base
      UNION ALL
      SELECT 'row_count', CAST(count(*) AS DOUBLE) FROM base
      ORDER BY metric"""),
    (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey", "c_mktsegment")
      val p = Sinks.profile(base, custKeys, Seq("c_acctbal", "c_nationkey"))
      val acct = p.columns.find(_.column == "c_acctbal").get
      val nat = p.columns.find(_.column == "c_nationkey").get
      val corrPair = p.correlations.head
      def r(v: Double, d: Int): Double =
        BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq(
        "acctbal_distinct" -> acct.distinct.toDouble,
        "acctbal_iqr_outliers" -> acct.iqrOutliers.get.toDouble,
        "acctbal_mean" -> r(acct.mean.get, 6),
        "acctbal_std" -> r(acct.std.get, 4),
        "column_count" -> p.columnCount.toDouble,
        "corr_acctbal_nationkey" -> r(corrPair.r.get, 6),
        "duplicate_rows" -> p.quality.duplicateRows.toDouble,
        "missing_issue_columns" -> p.quality.missing.size.toDouble,
        "nationkey_mean" -> r(nat.mean.get, 6),
        "pid_duplicates" -> p.quality.primaryIdDuplicates.toDouble,
        "row_count" -> p.rowCount.toDouble)
        .toDF("metric", "value").orderBy("metric")
    })

  /** T4 explorative leg: the interactions pane — a 2-D equal-width
    * histogram between two numeric columns (reference pages/profiling.py:
    * 74–77, `explorative=True` → ydata interaction plots). Fully
    * distributed: the shuffle carries ≤ nBins² rows; the oracle reproduces
    * the bin arithmetic bit-for-bit (floor of the same IEEE division). */
  val t4Interactions: Q = Q(
    "t4_interactions",
    Some("""
      WITH r AS (
        SELECT CAST(min(c_acctbal) AS DOUBLE) AS xmn,
               CAST(max(c_acctbal) AS DOUBLE) AS xmx,
               CAST(min(c_nationkey) AS DOUBLE) AS ymn,
               CAST(max(c_nationkey) AS DOUBLE) AS ymx
        FROM customer)
      SELECT
        LEAST(11, GREATEST(0, CAST(FLOOR(
          (CAST(c_acctbal AS DOUBLE) - xmn) / ((xmx - xmn) / 12)) AS INT))) AS bin_x,
        LEAST(11, GREATEST(0, CAST(FLOOR(
          (CAST(c_nationkey AS DOUBLE) - ymn) / ((ymx - ymn) / 12)) AS INT))) AS bin_y,
        count(*) AS n
      FROM customer, r
      WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "customer")
      val r = base.agg(
        min(col("c_acctbal").cast("double")).as("xmn"),
        max(col("c_acctbal").cast("double")).as("xmx"),
        min(col("c_nationkey").cast("double")).as("ymn"),
        max(col("c_nationkey").cast("double")).as("ymx")).head()
      graft.stats.ColumnStats.interactionBins(
          base, "c_acctbal", "c_nationkey",
          r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        .orderBy("bin_x", "bin_y")
    })

  /** T4 categorical leg: the profile's per-variable value tables
    * (ydata-profiling's categorical panes) through the ONE-pass multi-column
    * [[graft.stats.ColumnStats.categoricalFrequencies]] — both columns read
    * in a single explode+groupBy; ties break by value ascending, matching
    * the oracle's ORDER BY n DESC, value. */
  val t4Categories: Q = Q(
    "t4_categories",
    Some("""
      WITH u AS (
        SELECT 'c_mktsegment' AS col, CAST(c_mktsegment AS VARCHAR) AS value,
               count(*) AS n
        FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 2
        UNION ALL
        SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR), count(*)
        FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 2),
      r AS (
        SELECT col, value, n,
               row_number() OVER (PARTITION BY col ORDER BY n DESC, value) AS rk
        FROM u)
      SELECT col, value, n FROM r WHERE rk <= 10
      ORDER BY col, n DESC, value"""),
    (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "customer")
      val (tables, _) = graft.stats.ColumnStats.categoricalFrequencies(
        base, Seq("c_mktsegment", "c_nationkey"))
      tables.toSeq.flatMap { case (c, vs) => vs.map(v => (c, v._1, v._2)) }
        .toDF("col", "value", "n")
        .orderBy(col("col"), col("n").desc, col("value"))
    })

  /** T10: distribution analysis (plotting.py:1257–1346) — population
    * moments (scipy bias=True), exact quantiles, range/IQR. DuckDB's
    * skewness/kurtosis are bias-corrected G1/G2, so the oracle converts
    * them back to population g1/g2. */
  val t10Distribution: Q = Q(
    "t10_distribution",
    Some("""
      WITH s AS (
        SELECT count(c_acctbal) AS n,
          avg(c_acctbal) AS mean, stddev(c_acctbal) AS sd,
          skewness(c_acctbal) AS sk_g, kurtosis(c_acctbal) AS ku_g,
          CAST(min(c_acctbal) AS DOUBLE) AS min_v,
          CAST(max(c_acctbal) AS DOUBLE) AS max_v,
          quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25) AS q25,
          quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5) AS median,
          quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75) AS q75
        FROM customer)
      SELECT n, ROUND(mean, 6) AS mean, ROUND(median, 4) AS median,
        ROUND(sd, 4) AS std, ROUND(sd * sd, 2) AS variance,
        ROUND(sk_g * (n - 2) / sqrt(n * (n - 1.0)), 6) AS skew,
        ROUND((ku_g * (n - 2.0) * (n - 3) / (n - 1) - 6) / (n + 1), 6) AS kurt,
        min_v, max_v, max_v - min_v AS range_v,
        ROUND(q25, 4) AS q25, ROUND(q75, 4) AS q75,
        ROUND(q75 - q25, 4) AS iqr
      FROM s"""),
    (s, dir) => {
      import s.implicits._
      val a = Distribution.analyze(
        Tables.load(s, dir, "customer"), "c_acctbal").get
      Seq((a.n, a.mean, a.median, a.std, a.variance, a.skew.get, a.kurt.get,
          a.min, a.max, a.range, a.q25, a.q75, a.iqr))
        .toDF("n", "mean", "median", "std", "variance", "skew", "kurt",
          "min_v", "max_v", "range_v", "q25", "q75", "iqr")
        .select(col("n"), round(col("mean"), 6).as("mean"),
          round(col("median"), 4).as("median"),
          round(col("std"), 4).as("std"),
          round(col("variance"), 2).as("variance"),
          round(col("skew"), 6).as("skew"), round(col("kurt"), 6).as("kurt"),
          col("min_v"), col("max_v"), col("range_v"),
          round(col("q25"), 4).as("q25"), round(col("q75"), 4).as("q75"),
          round(col("iqr"), 4).as("iqr"))
    })

  /** T10's normality tests (Shapiro–Wilk via Royston AS R94,
    * Anderson–Darling) — no SQL oracle exists for these; the driver records
    * the rows-only check and the ScalaTest spec pins values against an
    * independent implementation. */
  val t10Normality: Q = Q(
    "t10_normality_tests",
    None,
    (s, dir) => {
      import s.implicits._
      val a = Distribution.analyze(
        Tables.load(s, dir, "customer"), "c_acctbal").get
      val sw = a.shapiroWilk.get
      val ad = a.andersonDarling.get
      Seq(
        ("anderson_darling", ad.statistic, ad.pValue.getOrElse(-1.0),
          ad.criticalValue.getOrElse(-1.0), ad.isNormal),
        ("shapiro_wilk", sw.statistic, sw.pValue.getOrElse(-1.0),
          sw.criticalValue.getOrElse(-1.0), sw.isNormal))
        .toDF("test", "statistic", "p_value", "critical_value", "is_normal")
        .orderBy("test")
    })

  /** T11: gaussian KDE curve (plotting.py:1117–1179, scott bandwidth). The
    * oracle mirrors the arithmetic exactly — grid = lo−10%pad …
    * hi+10%pad over 300 points, h = n^(−1/5)·sample-std — and the density
    * sum is rounded where FP association order differs. */
  val t11Kde: Q = Q(
    "t11_kde",
    Some("""
      WITH v AS (
        SELECT CAST(c_acctbal AS DOUBLE) AS x FROM customer
        WHERE c_acctbal IS NOT NULL),
      s AS (
        SELECT count(*) AS n, avg(x) AS mu, stddev_samp(x) AS sd,
               min(x) AS lo, max(x) AS hi
        FROM v),
      p AS (
        SELECT n, pow(CAST(n AS DOUBLE), -0.2) * sd AS h,
               lo - (hi - lo) * 0.10 AS x0, hi + (hi - lo) * 0.10 AS x1
        FROM s),
      grid AS (
        SELECT i, x0 + (x1 - x0) * i / 299.0 AS gx, h, n
        FROM p, generate_series(0, 299) AS t(i))
      SELECT i, ROUND(gx, 4) AS x,
        ROUND(SUM(exp(-0.5 * ((gx - v.x) / h) * ((gx - v.x) / h)))
          / (n * h * sqrt(2 * pi())), 9) AS density
      FROM grid, v
      GROUP BY i, gx, h, n
      ORDER BY i"""),
    (s, dir) => {
      import s.implicits._
      val c = KDE.curve(
        Tables.load(s, dir, "customer"), "c_acctbal", KDE.Scott).get
      c.x.zip(c.density).zipWithIndex
        .map { case ((x, d), i) => (i.toLong, x, d) }
        .toSeq.toDF("i", "x", "density")
        .select(col("i"), round(col("x"), 4).as("x"),
          round(col("density"), 9).as("density"))
        .orderBy("i")
    })

  /** T16: multisite/site-column detection (demographics.py:255–319) — the
    * name-pattern heuristic over two schema shapes; constant expected
    * values, but the Spark side must reach them through the real
    * detector. */
  val t16Multisite: Q = Q(
    "t16_multisite_detection",
    Some("""
      SELECT 'customer_raw' AS scenario, 'none' AS detected_column,
             FALSE AS rockland_like
      UNION ALL
      SELECT 'renamed_site', 'study_site', FALSE
      ORDER BY scenario"""),
    (s, dir) => {
      import s.implicits._
      val raw = Tables.load(s, dir, "customer")
      val renamed = raw.withColumnRenamed("c_mktsegment", "study_site")
      def detect(cols: Seq[String]): (String, Boolean) = (
        SiteValues.detectSiteColumn(cols, None).getOrElse("none"),
        SiteValues.isRocklandLike(cols))
      val a = detect(raw.columns.toSeq)
      val b = detect(renamed.columns.toSeq)
      Seq(("customer_raw", a._1, a._2), ("renamed_site", b._1, b._2))
        .toDF("scenario", "detected_column", "rockland_like")
        .orderBy("scenario")
    })

  /** T2 kendall leg: τ-b with tie correction (statistics.py:190–260,
    * pandas `corr(method='kendall')`). The engine computes it driver-side
    * on a bounded sample (full data at gate scale); the oracle counts
    * concordant/discordant/tied pairs via an O(n²) self-join. */
  val t2Kendall: Q = Q(
    "t2_corr_kendall",
    Some("""
      WITH v AS (
        SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS x,
               CAST(c_nationkey AS DOUBLE) AS y
        FROM customer
        WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL),
      p AS (
        SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
        FROM v a JOIN v b ON a.k < b.k),
      c AS (
        SELECT
          SUM(CASE WHEN (ax < bx AND ay < by) OR (ax > bx AND ay > by)
              THEN 1 ELSE 0 END) AS conc,
          SUM(CASE WHEN (ax < bx AND ay > by) OR (ax > bx AND ay < by)
              THEN 1 ELSE 0 END) AS disc,
          SUM(CASE WHEN ax = bx THEN 1 ELSE 0 END) AS ta,
          SUM(CASE WHEN ay = by THEN 1 ELSE 0 END) AS tb,
          COUNT(*) AS n0
        FROM p)
      SELECT 'c_acctbal' AS col1, 'c_nationkey' AS col2,
        ROUND((conc - disc) / sqrt((n0 - ta) * (n0 - tb) * 1.0), 6) AS tau,
        (SELECT count(*) FROM v) AS n
      FROM c"""),
    (s, dir) => {
      import s.implicits._
      val p = Correlation.kendallPair(
        Tables.load(s, dir, "customer"), "c_acctbal", "c_nationkey")
      Seq((p.col1, p.col2, p.r.get, p.n))
        .toDF("col1", "col2", "tau", "n")
        .select(col("col1"), col("col2"),
          round(col("tau"), 6).as("tau"), col("n"))
    })

  /** T2 kendall EXACT leg: same τ-b and same O(n²) self-join oracle, but
    * computed by [[Correlation.kendallPairExact]] — the contingency-table +
    * Fenwick concordance count that stays exact at any row count (one
    * distributed groupBy, cell-sized driver finish). Gate-proves the scale
    * path agrees with the quadratic pair definition. */
  val t2KendallExact: Q = Q(
    "t2_corr_kendall_exact",
    t2Kendall.oracle,
    (s, dir) => {
      import s.implicits._
      val p = Correlation.kendallPairExact(
        Tables.load(s, dir, "customer"), "c_acctbal", "c_nationkey")
      Seq((p.col1, p.col2, p.r.get, p.n))
        .toDF("col1", "col2", "tau", "n")
        .select(col("col1"), col("col2"),
          round(col("tau"), 6).as("tau"), col("n"))
    })

  override def queries: Seq[Q] = Seq(
    t4Profile, t4Interactions, t4Categories, t10Distribution, t10Normality,
    t11Kde, t16Multisite, t2Kendall, t2KendallExact)
}
