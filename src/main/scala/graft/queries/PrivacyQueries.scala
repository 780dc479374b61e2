package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.Privacy
import org.apache.spark.sql.functions._

/** Re-identification-risk audits ([[graft.ops.Privacy]]) over the
  * customer demographics table — the k-anonymity / l-diversity gate a
  * cohort export (reference's CSV/ZIP release path) runs before data
  * leaves the enclave. Quasi-identifier choices mirror a demographics
  * release: nation + market segment + a generalized balance band. */
object PrivacyQueries extends QueryModule {

  /** k-anonymity report at k=5 over (nation, segment, 1000-wide balance
    * band): the fine-grained release that FAILS the audit (min class
    * size 1) — the gate pins the full risk rollup. */
  val privKAnonymity: Q = Q(
    "priv_k_anonymity",
    Some("""
      WITH cls AS (
        SELECT count(*) AS class_size
        FROM customer
        GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000) * 1000)
      SELECT count(*) AS n_classes,
        CAST(sum(class_size) AS BIGINT) AS n_rows,
        min(class_size) AS min_class_size,
        CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k,
        CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS rows_below_k,
        5 AS k,
        min(class_size) >= 5 AS anonymous
      FROM cls"""),
    (s, dir) =>
      Privacy.kAnonymityReport(
        Tables.load(s, dir, "customer")
          .withColumn("bal_band", Privacy.generalizeNumeric(col("c_acctbal"), 1000.0)),
        quasiCols = Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5L)
        .withColumn("k", col("k").cast("int")))

  /** Distinct-l-diversity of the market segment within (nation, 2000-wide
    * balance band) classes at l=3: some classes collapse to a single
    * segment (min_l = 1), which k-anonymity alone would miss. Every 10th
    * customer's segment is NULLed so the NULL-as-one-extra-value sentinel
    * semantics ([[Privacy.lDiversity]]) are exercised cross-engine, not
    * just documented — the oracle mirrors the sentinel as
    * count(DISTINCT seg) + (1 if the class has any NULL). */
  val privLDiversity: Q = Q(
    "priv_l_diversity",
    Some("""
      WITH base AS (
        SELECT c_nationkey, floor(c_acctbal / 2000) * 2000 AS bal_band,
          CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_mktsegment END AS seg
        FROM customer),
      cls AS (
        SELECT count(*) AS class_size,
          count(DISTINCT seg)
            + MAX(CASE WHEN seg IS NULL THEN 1 ELSE 0 END) AS l
        FROM base
        GROUP BY c_nationkey, bal_band)
      SELECT count(*) AS n_classes,
        min(l) AS min_l,
        CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_l,
        CAST(sum(CASE WHEN l < 3 THEN class_size ELSE 0 END) AS BIGINT) AS rows_below_l,
        3 AS l,
        min(l) >= 3 AS diverse
      FROM cls"""),
    (s, dir) =>
      Privacy.lDiversityReport(
        Tables.load(s, dir, "customer")
          .withColumn("bal_band", Privacy.generalizeNumeric(col("c_acctbal"), 2000.0))
          .withColumn("seg",
            when(col("c_custkey") % 10 === 0, lit(null).cast("string"))
              .otherwise(col("c_mktsegment"))),
        quasiCols = Seq("c_nationkey", "bal_band"),
        sensitiveCol = "seg", l = 3L)
        .withColumn("l", col("l").cast("int")))

  /** Suppression to k=12 over (nation, segment): the gate compares the
    * EXACT released row set (every keep/drop decision), not just counts —
    * both engines must agree on every class size. */
  val privSuppress: Q = Q(
    "priv_suppress_k",
    Some("""
      WITH cls AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        FROM customer
        GROUP BY c_nationkey, c_mktsegment)
      SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
      FROM customer c
      JOIN cls USING (c_nationkey, c_mktsegment)
      WHERE cls.class_size >= 12
      ORDER BY c.c_custkey"""),
    (s, dir) =>
      Privacy.suppressToK(Tables.load(s, dir, "customer"),
          quasiCols = Seq("c_nationkey", "c_mktsegment"), k = 12L)
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey"))

  /** Release-pipeline INTEGRATION gate: generalize the balance to
    * 2000-wide bands, suppress to k=10 over (nation, band), then audit
    * the remainder — one hash match proves generalization, suppression,
    * and the k-anonymity audit compose identically across engines, and
    * the audit must come back `anonymous = true` BY CONSTRUCTION (the
    * gate requires it before returning). */
  val privReleasePipeline: Q = Q(
    "priv_release_pipeline",
    Some("""
      WITH rel AS (
        SELECT c_nationkey, floor(c_acctbal / 2000) * 2000 AS bal_band
        FROM customer),
      cls AS (
        SELECT c_nationkey, bal_band, count(*) AS class_size
        FROM rel GROUP BY 1, 2),
      kept AS (
        SELECT r.c_nationkey, r.bal_band
        FROM rel r JOIN cls USING (c_nationkey, bal_band)
        WHERE cls.class_size >= 10),
      audit AS (
        SELECT count(*) AS class_size FROM kept GROUP BY c_nationkey, bal_band)
      SELECT count(*) AS n_classes,
        CAST(sum(class_size) AS BIGINT) AS n_rows,
        min(class_size) AS min_class_size,
        CAST(sum(CASE WHEN class_size < 10 THEN 1 ELSE 0 END) AS BIGINT)
          AS classes_below_k,
        CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
          AS BIGINT) AS rows_below_k,
        10 AS k,
        min(class_size) >= 10 AS anonymous
      FROM audit"""),
    (s, dir) => {
      val released = Privacy.suppressToK(
        Tables.load(s, dir, "customer")
          .withColumn("bal_band",
            Privacy.generalizeNumeric(col("c_acctbal"), 2000.0)),
        quasiCols = Seq("c_nationkey", "bal_band"), k = 10L)
      val audit = Privacy.kAnonymityReport(released,
          Seq("c_nationkey", "bal_band"), k = 10L)
        .withColumn("k", col("k").cast("int"))
      require(audit.head().getAs[Boolean]("anonymous"),
        "suppressed release failed its own k-anonymity audit")
      audit
    })

  /** Keyed pseudonymization ([[Privacy.pseudonymize]]): the gate compares
    * EVERY pseudonym (row-level), so both engines must agree on the
    * salted-hash construction byte for byte; the join key property
    * (same input → same pseudonym) is what makes the released table
    * still joinable. */
  val privPseudonymize: Q = Q(
    "priv_pseudonymize",
    Some("""
      SELECT c_custkey,
        sha256('graft-release-1:' || CAST(c_custkey AS VARCHAR)) AS pseud_id,
        c_mktsegment
      FROM customer
      ORDER BY c_custkey"""),
    (s, dir) =>
      Privacy.pseudonymize(
          Tables.load(s, dir, "customer")
            .select(col("c_custkey"), col("c_custkey").as("pseud_id"),
              col("c_mktsegment")),
          Seq("pseud_id"), secret = "graft-release-1")
        .orderBy("c_custkey"))

  /** ε-DP noisy counts (Laplace 1/ε) per market segment — the oracle
    * redraws the SAME inverse-CDF noise from the engine-portable md5
    * identity hash of the group key, checking the mechanism algebra
    * term-for-term. ε = 0.5 exactly (binary-exact literal both sides). */
  val privDpCounts: Q = Q(
    "priv_dp_counts",
    Some("""
      WITH g AS (
        SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1),
      u AS (
        SELECT c_mktsegment, n,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-dp',
              c_mktsegment)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 - 0.5
            AS uu
        FROM g)
      SELECT c_mktsegment,
        round(n + (-2.0) * sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6)
          AS released
      FROM u ORDER BY c_mktsegment"""),
    (s, dir) =>
      Privacy.dpCountRelease(Tables.load(s, dir, "customer"),
          Seq("c_mktsegment"), epsilon = 0.5, seed = "graft-dp")
        .orderBy("c_mktsegment"))

  /** ε-DP noisy sums of account balances clipped to ±1000 per nation —
    * sensitivity = clip, Laplace(clip/ε) with ε = 0.5 → scale 2000
    * exactly; the clipped values sum as exact decimals so only the
    * mechanism itself is floating-point. */
  val privDpSum: Q = Q(
    "priv_dp_sum",
    Some("""
      WITH g AS (
        SELECT c_nationkey,
          COALESCE(SUM(CAST(round(greatest(least(CAST(c_acctbal AS DOUBLE),
              1000.0), -1000.0), 6) AS DECIMAL(38,6))),
            CAST(0 AS DECIMAL(38,6))) AS s
        FROM customer GROUP BY 1),
      u AS (
        SELECT c_nationkey, s,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-dp',
              CAST(c_nationkey AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0 - 0.5 AS uu
        FROM g)
      SELECT c_nationkey,
        round(CAST(s AS DOUBLE)
          + (-2000.0) * sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6) AS released
      FROM u ORDER BY c_nationkey"""),
    (s, dir) =>
      Privacy.dpSumRelease(Tables.load(s, dir, "customer"),
          Seq("c_nationkey"), "c_acctbal", clip = 1000.0, epsilon = 0.5,
          seed = "graft-dp")
        .orderBy("c_nationkey"))

  /** Shared randomized-response replay: the sorted category list, both
    * portable-hash coin flips, and the perturbed column — the oracle
    * re-derives every report. p = 0.75 (binary-exact both sides). */
  private val rrReleaseSql: String = """
      WITH cats AS (
        SELECT (SELECT list(s ORDER BY s) FROM (
          SELECT DISTINCT c_mktsegment AS s FROM customer
          WHERE c_mktsegment IS NOT NULL)) AS cl),
      r AS (
        SELECT c_custkey, c_mktsegment,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-rr',
              CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0 AS u1,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-rr#pick',
              CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0 AS u2
        FROM customer),
      rel AS (
        SELECT c_custkey,
          CASE WHEN c_mktsegment IS NULL THEN NULL
               WHEN u1 < 0.75 THEN c_mktsegment
               ELSE cl[CAST(floor(u2 * len(cl)) AS INT) + 1] END AS reported
        FROM r, cats)"""

  /** Row-level k-ary randomized response over market segments
    * ([[graft.ops.Privacy.randomizedResponse]], p = 0.75) — every
    * perturbed report re-derived by the oracle. */
  val privRrRelease: Q = Q(
    "priv_rr_release",
    Some(rrReleaseSql + """
      SELECT c_custkey, reported FROM rel ORDER BY c_custkey"""),
    (s, dir) =>
      Privacy.randomizedResponse(Tables.load(s, dir, "customer"),
          "c_mktsegment", p = 0.75, seed = "graft-rr", Seq("c_custkey"))
        .select(col("c_custkey"), col("reported"))
        .orderBy("c_custkey"))

  /** Debiased frequency estimates from the same release
    * ([[graft.ops.Privacy.rrFrequencyEstimate]]) — estimator algebra
    * mirrored term-for-term; the gate additionally pins each estimate
    * near its true count (the estimator works, not just computes). */
  val privRrEstimate: Q = Q(
    "priv_rr_estimate",
    Some(rrReleaseSql + """,
      obs AS (SELECT reported AS category, count(*) AS observed
              FROM rel WHERE reported IS NOT NULL GROUP BY 1),
      nn AS (SELECT CAST(COALESCE(sum(observed), 0) AS BIGINT) AS n
             FROM obs)
      SELECT category, observed,
        round((observed - n * 0.25 / 5.0) / 0.75, 6) AS estimate
      FROM obs, nn ORDER BY category"""),
    (s, dir) => {
      val customers = Tables.load(s, dir, "customer")
      val k = customers.filter(col("c_mktsegment").isNotNull)
        .select(col("c_mktsegment")).distinct().count().toInt
      require(k == 5, s"fixture drift: expected 5 segments, got $k")
      val released = Privacy.randomizedResponse(customers, "c_mktsegment",
        p = 0.75, seed = "graft-rr", Seq("c_custkey"))
      val est = Privacy.rrFrequencyEstimate(released, "reported",
        p = 0.75, k = k)
      // estimator sanity: every debiased estimate within 4·sqrt(n) of the
      // true count (loose but real — catches sign/denominator bugs)
      val truth = customers.filter(col("c_mktsegment").isNotNull)
        .groupBy(col("c_mktsegment").as("category"))
        .agg(count(lit(1)).as("true_n"))
      val n = customers.filter(col("c_mktsegment").isNotNull).count()
      val off = est.join(truth, "category")
        .filter(abs(col("estimate") - col("true_n")) >
          lit(4.0 * math.sqrt(n.toDouble))).count()
      require(off == 0L, s"RR estimate off the 4*sqrt(n) band on $off categories")
      est.orderBy("category")
    })

  /** t-closeness audit ([[graft.ops.Privacy.tCloseness]]) of the
    * account-balance distribution (binned to 2000-wide buckets — the
    * documented pre-binning contract) within each market-segment
    * class: the EMD cumulative folds as the exact integer
    * Σ(c·N − g·n) both sides, so every t is engine-exact after one
    * round-9 division. */
  val privTCloseness: Q = Q(
    "priv_t_closeness",
    Some("""
      WITH base AS (
        SELECT c_mktsegment AS seg,
          CAST(floor(c_acctbal / 2000) AS DOUBLE) AS s
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
      cells AS (SELECT seg, s, count(*) AS c FROM base GROUP BY 1, 2),
      dom AS (SELECT s, SUM(c) AS g FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(g) AS BIGINT) AS nn,
        CAST(COUNT(*) AS BIGINT) AS m FROM dom),
      cls AS (SELECT seg, CAST(SUM(c) AS BIGINT) AS n
              FROM cells GROUP BY 1),
      grid AS (
        SELECT cls.seg, cls.n, dom.s, dom.g, COALESCE(cells.c, 0) AS c
        FROM cls CROSS JOIN dom
        LEFT JOIN cells ON cells.seg = cls.seg AND cells.s = dom.s),
      cum AS (
        SELECT seg, n,
          SUM(CAST(c AS HUGEINT) * (SELECT nn FROM tot)
              - CAST(g AS HUGEINT) * n)
            OVER (PARTITION BY seg ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
        FROM grid),
      emd AS (SELECT seg, n, SUM(ABS(cu)) AS e FROM cum GROUP BY 1, 2)
      SELECT seg AS c_mktsegment, n,
        round(CAST(e AS DOUBLE) / (CAST((SELECT nn FROM tot) AS DOUBLE)
          * n * ((SELECT m FROM tot) - 1.0)), 9) AS t_emd,
        round(CAST(e AS DOUBLE) / (CAST((SELECT nn FROM tot) AS DOUBLE)
          * n * ((SELECT m FROM tot) - 1.0)), 9) <= 0.05 AS passed
      FROM emd
      ORDER BY 1"""),
    (s, dir) => {
      val out = graft.ops.Privacy.tCloseness(
        Tables.load(s, dir, "customer"), Seq("c_mktsegment"),
        floor(col("c_acctbal") / 2000), t = 0.05)
      val rows = out.collect()
      require(rows.length >= 2, "expected multiple quasi classes")
      require(rows.forall { r =>
        val t = r.getAs[Double]("t_emd"); t >= 0.0 && t <= 1.0
      }, "EMD must sit in [0,1] under the ordered ground metric")
      out
    })

  override def queries: Seq[Q] =
    Seq(privKAnonymity, privLDiversity, privSuppress, privReleasePipeline,
      privPseudonymize, privDpCounts, privDpSum, privRrRelease,
      privRrEstimate, privTCloseness)
}
