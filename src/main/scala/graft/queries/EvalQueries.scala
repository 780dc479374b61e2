package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.Sampling
import graft.stats.{Eval, Logistic}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classifier-evaluation gates ([[graft.stats.Eval]]). The metrics stay
  * exact longs until one final division, so the oracles hash-match raw
  * doubles; the deterministic "model scores" are either real TPC-H columns
  * (heavy ties — exercising the tie-aware AUC identity) or the
  * engine-portable md5 hash fraction (near-unique scores, and a synthetic
  * perfectly-calibrated probability for the reliability bins). */
object EvalQueries extends QueryModule {

  /** Shared md5-fraction SQL mirror ([[Sampling.hashFraction]]). */
  private def hfSql(seed: String, key: String): String =
    s"""(CAST(concat('0x', substr(md5(concat_ws('|', '$seed',
        CAST($key AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)"""

  /** Tie-heavy AUC: order priority digit (5 distinct scores) predicting
    * finished status — the tie term 0.5·pos_s·neg_s dominates, so both
    * engines must implement the same tie-aware identity. */
  val aucTies: Q = Q(
    "ml_auc_ties",
    Some("""
      WITH b AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (
        SELECT s,
          SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM b GROUP BY s),
      c AS (
        SELECT pos, neg,
          COALESCE(SUM(neg) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g)
      SELECT
        CAST(SUM(pos * (2 * nb + neg)) AS DOUBLE)
          / (2.0 * CAST(SUM(pos) AS BIGINT) * CAST(SUM(neg) AS BIGINT)) AS auc,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg
      FROM c"""),
    (s, dir) =>
      Eval.auc(Tables.load(s, dir, "orders"),
        substring(col("o_orderpriority"), 1, 1).cast("int"),
        when(col("o_orderstatus") === "F", 1).otherwise(0)))

  /** Near-unique scores with planted separation: score = 0.8·hash + 0.2·y,
    * so positives shift up by 0.2 and the true AUC is a data-determined
    * constant both engines must reproduce through thousands of distinct
    * score groups. */
  val aucSeparable: Q = Q(
    "ml_auc_separable",
    Some(s"""
      WITH b AS (
        SELECT
          0.8 * ${hfSql("graft-eval", "o_orderkey")}
            + 0.2 * (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (
        SELECT s,
          SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM b GROUP BY s),
      c AS (
        SELECT pos, neg,
          COALESCE(SUM(neg) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g)
      SELECT
        CAST(SUM(pos * (2 * nb + neg)) AS DOUBLE)
          / (2.0 * CAST(SUM(pos) AS BIGINT) * CAST(SUM(neg) AS BIGINT)) AS auc,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg
      FROM c"""),
    (s, dir) => {
      val y = when(col("o_orderstatus") === "F", 1).otherwise(0)
      Eval.auc(Tables.load(s, dir, "orders"),
        lit(0.8) * Sampling.hashFraction("graft-eval", Seq(col("o_orderkey")))
          + lit(0.2) * y,
        y)
    })

  /** Average precision ([[graft.stats.Eval.averagePrecision]]) on the
    * separable hash-score construction — the PR-curve companion of
    * ml_auc_separable; the oracle replays the descending distinct-score
    * sweep with the round-9 decimal term fold. The planted +0.2 shift
    * must push AP well above the positive base rate. */
  val averagePrecisionGate: Q = Q(
    "ml_average_precision",
    Some(s"""
      WITH b AS (
        SELECT
          0.8 * ${hfSql("graft-eval", "o_orderkey")}
            + 0.2 * (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (
        SELECT s,
          SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM b GROUP BY s),
      c AS (
        SELECT pos, neg,
          SUM(pos) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          SUM(neg) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fpc
        FROM g),
      f AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
          CAST(SUM(neg) AS BIGINT) AS n_neg,
          CAST(COUNT(*) AS BIGINT) AS n_thresholds,
          CAST(SUM(CAST(CASE WHEN pos > 0
            THEN round(CAST(pos AS DOUBLE)
              * (CAST(tp AS DOUBLE) / (tp + fpc)), 9)
            ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS terms
        FROM c)
      SELECT n_pos, n_neg, n_thresholds,
        round(terms / n_pos, 6) + 0.0 AS average_precision
      FROM f"""),
    (s, dir) => {
      val y = when(col("o_orderstatus") === "F", 1).otherwise(0)
      val out = Eval.averagePrecision(Tables.load(s, dir, "orders"),
        lit(0.8) * Sampling.hashFraction("graft-eval", Seq(col("o_orderkey")))
          + lit(0.2) * y,
        y)
      val r = out.head()
      val base = r.getAs[Long]("n_pos").toDouble /
        (r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
      require(r.getAs[Double]("average_precision") > base + 0.1,
        s"the planted shift must lift AP over the base rate $base: $r")
      out
    })

  /** ROC confusion table over the 11 discount levels predicting returns —
    * every count is an exact conditional sum, every rate an identical
    * division, nulls where undefined (threshold above every score). */
  val rocPoints: Q = Q(
    "ml_roc_points",
    Some("""
      WITH t AS (SELECT unnest([0.0, 0.02, 0.04, 0.06, 0.08, 0.10, 0.12]) AS th),
      b AS (
        SELECT CAST(l_discount AS DOUBLE) AS s,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      a AS (
        SELECT CAST(th AS DOUBLE) AS threshold,
          CAST(SUM(CASE WHEN s >= th AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN s >= th AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
          CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM t, b GROUP BY th)
      SELECT threshold, tp, fp, p - tp AS fn, n - fp AS tn,
        CASE WHEN tp + fp = 0 THEN NULL
             ELSE tp / CAST(tp + fp AS DOUBLE) END AS precision,
        CASE WHEN p = 0 THEN NULL ELSE tp / CAST(p AS DOUBLE) END AS recall,
        CASE WHEN n = 0 THEN NULL ELSE fp / CAST(n AS DOUBLE) END AS fpr,
        CASE WHEN tp + fp = 0 OR p = 0
               OR (tp / CAST(tp + fp AS DOUBLE)) + (tp / CAST(p AS DOUBLE)) = 0
             THEN NULL
             ELSE 2.0 * (tp / CAST(tp + fp AS DOUBLE)) * (tp / CAST(p AS DOUBLE))
                  / ((tp / CAST(tp + fp AS DOUBLE)) + (tp / CAST(p AS DOUBLE)))
        END AS f1
      FROM a
      ORDER BY threshold"""),
    (s, dir) =>
      Eval.rocPoints(Tables.load(s, dir, "lineitem"),
          col("l_discount"), when(col("l_returnflag") === "R", 1).otherwise(0),
          Seq(0.0, 0.02, 0.04, 0.06, 0.08, 0.10, 0.12))
        .orderBy("threshold"))

  /** Reliability bins of a synthetic PERFECTLY-calibrated probability:
    * score = hash1, label = (hash2 < hash1) — P(y=1 | score) = score by
    * construction, so frac_pos tracks the bin center and both engines
    * rebuild identical counts from the portable hashes. */
  val calibration: Q = Q(
    "ml_calibration",
    Some(s"""
      WITH b AS (
        SELECT ${hfSql("graft-cal", "o_orderkey")} AS s,
          CASE WHEN ${hfSql("graft-cal2", "o_orderkey")}
            < ${hfSql("graft-cal", "o_orderkey")} THEN 1 ELSE 0 END AS y
        FROM orders)
      SELECT
        CAST(LEAST(FLOOR(s * 10), 9) AS INT) AS bin,
        CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
          / CAST(count(*) AS DOUBLE) AS frac_pos,
        round(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
          AS mean_score
      FROM b
      GROUP BY 1
      ORDER BY bin"""),
    (s, dir) => {
      val h1 = Sampling.hashFraction("graft-cal", Seq(col("o_orderkey")))
      val h2 = Sampling.hashFraction("graft-cal2", Seq(col("o_orderkey")))
      Eval.calibrationBins(Tables.load(s, dir, "orders"),
          h1, when(h2 < h1, 1).otherwise(0), bins = 10)
        .select(col("bin"), col("n"),
          (col("frac_pos")).as("frac_pos"), col("mean_score"))
        .orderBy("bin")
    })

  /** One-number miscalibration summary of the same synthetic probability:
    * decimal-weighted |frac_pos − mean_score| over the reliability bins —
    * small but nonzero on a finite sample, and exactly reproducible. */
  val ece: Q = Q(
    "ml_ece",
    Some(s"""
      WITH b AS (
        SELECT ${hfSql("graft-cal", "o_orderkey")} AS s,
          CASE WHEN ${hfSql("graft-cal2", "o_orderkey")}
            < ${hfSql("graft-cal", "o_orderkey")} THEN 1 ELSE 0 END AS y
        FROM orders),
      bins AS (
        SELECT
          CAST(LEAST(FLOOR(s * 10), 9) AS INT) AS bin,
          CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
            / CAST(count(*) AS DOUBLE) AS frac_pos,
          round(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
            AS mean_score
        FROM b GROUP BY 1)
      SELECT
        CAST(SUM(CAST(n * ABS(frac_pos - mean_score) AS DECIMAL(38,12)))
          AS DOUBLE) / CAST(SUM(n) AS BIGINT) AS ece,
        CAST(SUM(n) AS BIGINT) AS n
      FROM bins"""),
    (s, dir) => {
      val h1 = Sampling.hashFraction("graft-cal", Seq(col("o_orderkey")))
      val h2 = Sampling.hashFraction("graft-cal2", Seq(col("o_orderkey")))
      Eval.expectedCalibrationError(Tables.load(s, dir, "orders"),
        h1, when(h2 < h1, 1).otherwise(0), bins = 10)
    })

  /** Integration: plant a known logistic generative model on the
    * portable hashes (x ~ U[0,1], P(y=1|x) = σ(−2 + 4x)), fit the
    * in-engine logistic regression, and close the loop with
    * [[Eval.auc]] — the fit must recover the planted weights and the
    * train-score-evaluate pipeline must discriminate at the level the
    * model implies.
    *
    * PROMOTED to oracle-checked (r15 verdict item 3): IRLS itself has
    * no SQL mirror, but the fitted score σ(b + w·x) with the RECOVERED
    * w > 0 (pinned in-gate) is strictly increasing in x, and AUC
    * depends only on the score's ordering and ties — so AUC(score) =
    * AUC(x) exactly, and DuckDB replays the whole emitted row (tie-aware
    * AUC over x, label counts, convergence pinned TRUE) from the planted
    * generative model. The oracle's exp() and the JVM's agree here
    * because no u lands within cross-libm ulp of its σ boundary (hash
    * granularity 2⁻³² vs disagreement windows ~2⁻⁵²; the ln-parity
    * argument Box–Cox documents). */
  val classifierEval: Q = Q(
    "ml_classifier_eval",
    Some(s"""
      WITH b AS (
        SELECT ${hfSql("graft-lgr-x", "o_orderkey")} AS x,
          ${hfSql("graft-lgr-u", "o_orderkey")} AS u
        FROM orders),
      l AS (
        SELECT x, CASE WHEN u < 1.0 / (1.0 + exp(-(-2.0 + 4.0 * x)))
          THEN 1 ELSE 0 END AS y
        FROM b),
      g AS (
        SELECT x, SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM l GROUP BY x),
      c AS (
        SELECT pos, neg,
          COALESCE(SUM(neg) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g)
      SELECT round(CAST(SUM(CAST(pos AS DECIMAL(38,0))
            * CAST(2 * nb + neg AS DECIMAL(38,0))) AS DOUBLE)
          / (2.0 * CAST(SUM(pos) AS BIGINT) * CAST(SUM(neg) AS BIGINT)), 6)
          + 0.0 AS auc,
        TRUE AS converged,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg
      FROM c"""),
    (s, dir) => {
      val base = Tables.load(s, dir, "orders")
      val x = Sampling.hashFraction("graft-lgr-x", Seq(col("o_orderkey")))
      val u = Sampling.hashFraction("graft-lgr-u", Seq(col("o_orderkey")))
      val pTrue = lit(1.0) / (lit(1.0) + exp(-(lit(-2.0) + lit(4.0) * x)))
      val y = when(u < pTrue, 1).otherwise(0)
      val fit = Logistic.fit(base, Seq("x" -> x), y)
        .getOrElse(sys.error("logistic fit degenerate on planted data"))
      require(fit.converged, "IRLS failed to converge on planted data")
      require(math.abs(fit.weights(0) - 4.0) < 0.5 &&
        math.abs(fit.intercept + 2.0) < 0.3,
        s"planted (−2, 4) not recovered: " +
          s"(${fit.intercept}, ${fit.weights(0)})")
      // w > 0 is what makes AUC(score) = AUC(x) (strictly increasing
      // score), which is what lets the oracle replay the AUC over x
      require(fit.weights(0) > 0.0, "recovered weight must be positive")
      val scored = base.select(fit.score(Seq(x)).as("score"), y.as("y"))
      val a = Eval.auc(scored, col("score"), col("y")).collect().head
      val aucV = a.getAs[Double]("auc")
      // AUC of a planted σ(−2+4x) model over U[0,1] features sits near
      // 0.78 (the score is monotone in x, so AUC = P(x⁺ > x⁻) under the
      // planted conditional — measured 0.781 on this corpus)
      require(aucV > 0.70 && aucV < 0.85,
        s"AUC off the planted model's band: $aucV")
      import s.implicits._
      // HALF_UP round-6, the oracle-pairing convention (rint's HALF_EVEN
      // could straddle a midpoint differently than DuckDB's round)
      Seq((BigDecimal(aucV).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0, fit.converged,
        a.getAs[Long]("n_pos"), a.getAs[Long]("n_neg")))
        .toDF("auc", "converged", "n_pos", "n_neg")
    })

  /** Per-slice AUC (the no-global-window form): the separable synthetic
    * score evaluated within each order priority — five independent AUCs
    * whose cumulative windows partition on the slice, shuffled once. */
  val aucByGroup: Q = Q(
    "ml_auc_by_group",
    Some(s"""
      WITH b AS (
        SELECT o_orderpriority AS grp,
          0.8 * ${hfSql("graft-eval", "o_orderkey")}
            + 0.2 * (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (
        SELECT grp, s,
          SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM b GROUP BY grp, s),
      c AS (
        SELECT grp, pos, neg,
          COALESCE(SUM(neg) OVER (PARTITION BY grp ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g)
      SELECT grp,
        CAST(SUM(pos * (2 * nb + neg)) AS DOUBLE)
          / (2.0 * CAST(SUM(pos) AS BIGINT) * CAST(SUM(neg) AS BIGINT)) AS auc,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg
      FROM c
      GROUP BY grp
      ORDER BY grp"""),
    (s, dir) => {
      val y = when(col("o_orderstatus") === "F", 1).otherwise(0)
      Eval.aucByGroup(
          Tables.load(s, dir, "orders")
            .withColumn("grp", col("o_orderpriority")),
          Seq("grp"),
          lit(0.8) * Sampling.hashFraction("graft-eval", Seq(col("o_orderkey")))
            + lit(0.2) * y,
          y)
        .orderBy("grp")
    })

  /** Deterministic calibration workload CTEs: 25 score levels from
    * o_totalprice, binary labels whose true positive rate rises with the
    * level (drawn from the portable hash fraction), and the isotonic fit
    * rebuilt INDEPENDENTLY via the minimax characterization
    * fitted_i = max_{j≤i} min_{k≥i} avg(y over levels j..k) — a
    * different algorithm (prefix-sum minimax) than the Spark side's PAV
    * pooling, agreeing exactly because binary-label means are integer
    * ratios. */
  private val isoCte = s"""
      b AS (
        SELECT o_orderkey,
          CAST(floor(o_totalprice / 20000) AS INT) AS s,
          CASE WHEN ${hfSql("graft-cal", "o_orderkey")}
            < (CAST(floor(o_totalprice / 20000) AS INT) + 1) / 27.0
            THEN 1 ELSE 0 END AS y
        FROM orders),
      lev AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS sy,
          row_number() OVER (ORDER BY s) AS i
        FROM b GROUP BY s),
      pre AS (
        SELECT i, s, n, sy,
          SUM(n) OVER (ORDER BY i) AS cn,
          SUM(sy) OVER (ORDER BY i) AS cy
        FROM lev),
      triple AS (
        SELECT m.i, j.i AS j, k.i AS k,
          CAST(k.cy - (j.cy - j.sy) AS DOUBLE)
            / (k.cn - (j.cn - j.n)) AS a
        FROM pre m JOIN pre j ON j.i <= m.i JOIN pre k ON k.i >= m.i),
      mm AS (
        SELECT i, j, min(a) AS inner_min FROM triple GROUP BY i, j),
      fit AS (
        SELECT i, max(inner_min) AS fitted FROM mm GROUP BY i)
      """

  /** The fitted isotonic level table: PAV on the Spark side vs the
    * minimax formula in DuckDB — two independent algorithms, one exact
    * answer ([[graft.stats.Isotonic.fit]]). */
  val isoFit: Q = Q(
    "iso_fit_levels",
    Some(s"""
      WITH $isoCte
      SELECT lev.s AS score, lev.n, lev.sy,
        round(fit.fitted, 9) AS fitted
      FROM lev JOIN fit ON lev.i = fit.i
      ORDER BY score"""),
    (s, dir) => {
      import s.implicits._
      val base = isoBase(s, dir)
      val model = graft.stats.Isotonic.fit(base, col("s"), col("y"))
      // the complete isotonic contract, asserted in-gate: monotone,
      // and every maximal constant run's mean equals its fitted value
      val f = model.fitted
      require(f.zip(f.tail).forall { case (a, b) => a <= b },
        "isotonic fit must be non-decreasing")
      var i = 0
      while (i < f.length) {
        var j = i
        var (nn, ss) = (0L, 0.0)
        while (j < f.length && f(j) == f(i)) {
          nn += model.n(j); ss += model.sumY(j); j += 1
        }
        require(math.abs(ss / nn - f(i)) < 1e-12,
          s"block mean ${ss / nn} != fitted ${f(i)}")
        i = j
      }
      model.scores.indices.map(ix => (model.scores(ix).toInt,
          model.n(ix), model.sumY(ix).toLong,
          // HALF_UP to mirror SQL round(), not rint's HALF_EVEN
          java.math.BigDecimal.valueOf(model.fitted(ix))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()))
        .toDF("score", "n", "sy", "fitted")
        .orderBy("score")
    })

  /** Step-function calibration of a probe grid that includes UNSEEN
    * scores (level midpoints and out-of-range points): the oracle walks
    * the same largest-level-≤-x rule over its minimax fit
    * ([[graft.stats.Isotonic.calibrateStep]]). */
  val isoApply: Q = Q(
    "iso_calibrate_apply",
    Some(s"""
      WITH $isoCte,
      levfit AS (
        SELECT lev.s, round(fit.fitted, 9) AS fitted
        FROM lev JOIN fit ON lev.i = fit.i),
      probe AS (
        SELECT CAST(unnest(range(-2, 52)) AS DOUBLE) / 2.0 AS x),
      bounds AS (SELECT min(s) AS lo FROM levfit)
      SELECT probe.x,
        COALESCE(
          (SELECT lf.fitted FROM levfit lf WHERE lf.s <= probe.x
           ORDER BY lf.s DESC LIMIT 1),
          (SELECT lf.fitted FROM levfit lf ORDER BY lf.s LIMIT 1))
          AS calibrated
      FROM probe, bounds
      ORDER BY x"""),
    (s, dir) => {
      import s.implicits._
      val model = graft.stats.Isotonic.fit(isoBase(s, dir), col("s"),
        col("y"))
      val probes = (-2 to 51).map(_ / 2.0).toDF("x")
      graft.stats.Isotonic.calibrateStep(probes, col("x"), model)
        .withColumn("calibrated", round(col("calibrated"), 9))
        .orderBy("x")
    })

  private def isoBase(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val lvl = floor(col("o_totalprice") / 20000).cast("int")
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), lvl.as("s"),
        when(Sampling.hashFraction("graft-cal", Seq(col("o_orderkey")))
          < (lvl + 1) / lit(27.0), 1).otherwise(0).as("y"))
  }

  /** Split conformal intervals around a train-slice group-mean
    * predictor ([[graft.stats.Conformal]]): 40/30/30 hash split of
    * orders into train/calibration/test, ŷ = the train slice's mean
    * total price per priority, qhat = the ⌈(n+1)·0.9⌉-th smallest
    * calibration residual — the rank via the INTEGER formula
    * (9(n+1)+9)/10 in both engines, because ceil(0.9·(n+1)) through
    * binary doubles drifts a whole rank whenever n+1 is a multiple of
    * 10. Output: fit scalars + test coverage; the gate also asserts
    * the ≥ 1−α−slack coverage guarantee. */
  val conformalSplit: Q = Q(
    "ml_conformal_split",
    Some(s"""
      WITH f AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
          ${hfSql("graft-cp", "o_orderkey")} AS u
        FROM orders),
      pred AS (
        SELECT o_orderpriority,
          round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            / count(*), 6) AS yhat
        FROM f WHERE u < 0.4 GROUP BY 1),
      calr AS (
        SELECT round(abs(f.o_totalprice - pred.yhat), 9) AS r
        FROM f JOIN pred USING (o_orderpriority)
        WHERE u >= 0.4 AND u < 0.7),
      ranked AS (
        SELECT r, row_number() OVER (ORDER BY r) AS rn FROM calr),
      q AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cal,
          (9 * (count(*) + 1) + 9) // 10 AS q_rank
        FROM calr),
      qh AS (
        SELECT q.n_cal, q.q_rank,
          (SELECT max(CASE WHEN rn = q.q_rank THEN r END) FROM ranked)
            AS qhat
        FROM q),
      cov AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
          CAST(SUM(CASE WHEN abs(f.o_totalprice - pred.yhat)
              <= (SELECT qhat FROM qh) THEN 1 ELSE 0 END) AS BIGINT)
            AS covered
        FROM f JOIN pred USING (o_orderpriority)
        WHERE u >= 0.7)
      SELECT qh.n_cal, qh.q_rank, qh.qhat, cov.n_test, cov.covered,
        round(CAST(cov.covered AS DOUBLE) / cov.n_test, 6) AS coverage
      FROM qh, cov"""),
    (s, dir) => {
      import graft.stats.Conformal
      val f = Tables.load(s, dir, "orders")
        .withColumn("u",
          Sampling.hashFraction("graft-cp", Seq(col("o_orderkey"))))
      val pred = f.filter(col("u") < 0.4)
        .groupBy("o_orderpriority")
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double") / count(lit(1)), 6).as("yhat"))
      val calP = f.filter(col("u") >= 0.4 && col("u") < 0.7)
        .join(broadcast(pred), Seq("o_orderpriority"))
      val fitRow = Conformal.fit(calP, col("o_totalprice"), col("yhat"),
        alpha = 0.1).collect().head
      val qhat = fitRow.getAs[Double]("qhat")
      val testP = f.filter(col("u") >= 0.7)
        .join(broadcast(pred), Seq("o_orderpriority"))
      val cov = Conformal.coverage(testP, col("o_totalprice"),
        col("yhat"), qhat).collect().head
      val coverage = cov.getAs[Double]("coverage")
      require(coverage >= 0.87,
        s"conformal coverage $coverage below the 1-alpha-slack floor")
      import s.implicits._
      Seq((fitRow.getAs[Long]("n_cal"), fitRow.getAs[Long]("q_rank"),
          qhat, cov.getAs[Long]("n_test"), cov.getAs[Long]("covered"),
          coverage))
        .toDF("n_cal", "q_rank", "qhat", "n_test", "covered", "coverage")
    })

  /** Shared base + per-query ranking SQL ([[graft.stats.Ranking]]):
    * queries = (lang, source) groups over documents, system score =
    * n_chars (real ties + spread), graded relevance planted from doc_id
    * residues (2 for %7, 1 for %3). Both engines rank with the same
    * doc-id tie-break and fold rounded-12 DCG terms in decimal. */
  private val rankingPerQuerySql: String = """
      WITH base AS (
        SELECT lang || '|' || source AS q, doc_id AS d,
          CAST(n_chars AS DOUBLE) AS s,
          CASE WHEN doc_id % 7 = 0 THEN 2
               WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS rel
        FROM documents WHERE n_chars IS NOT NULL),
      rk AS (
        SELECT q, d, rel,
          row_number() OVER (PARTITION BY q ORDER BY s DESC, d) AS r,
          row_number() OVER (PARTITION BY q ORDER BY rel DESC, d) AS ri
        FROM base),
      agg AS (
        SELECT q,
          count(*) AS n_docs,
          CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
          SUM(CASE WHEN r <= 10 THEN
              CAST(round((pow(2, rel) - 1) / (ln(r + 1) / ln(2)), 12)
                AS DECIMAL(38,12))
            ELSE CAST(0 AS DECIMAL(38,12)) END) AS dcg,
          SUM(CASE WHEN ri <= 10 THEN
              CAST(round((pow(2, rel) - 1) / (ln(ri + 1) / ln(2)), 12)
                AS DECIMAL(38,12))
            ELSE CAST(0 AS DECIMAL(38,12)) END) AS idcg,
          MIN(CASE WHEN rel > 0 THEN r END) AS fr,
          CAST(SUM(CASE WHEN r <= 10 AND rel > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS rel_at_k
        FROM rk GROUP BY q)
      SELECT q AS query, n_docs, n_rel,
        CASE WHEN idcg > 0
          THEN round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
        END AS ndcg_at_k,
        COALESCE(round(1.0 / fr, 6), 0.0) AS mrr,
        round(rel_at_k / 10.0, 6) AS precision_at_k,
        CASE WHEN n_rel > 0
          THEN round(rel_at_k / CAST(n_rel AS DOUBLE), 6)
        END AS recall_at_k
      FROM agg"""

  private def rankingPerQuery(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.stats.Ranking.rankingMetrics(
      Tables.load(s, dir, "documents")
        .filter(col("n_chars").isNotNull)
        .select(concat_ws("|", col("lang"), col("source")).as("query"),
          col("doc_id"), col("n_chars"),
          when(col("doc_id") % 7 === 0, 2)
            .when(col("doc_id") % 3 === 0, 1).otherwise(0).as("rel")),
      "query", "doc_id", col("n_chars"), col("rel"), k = 10)

  /** Per-query nDCG@10 / MRR / precision@10 / recall@10 over the
    * documents retrieval fixture — every query's metrics hash-checked. */
  val rankingMetricsGate: Q = Q(
    "ml_ranking_metrics",
    Some(rankingPerQuerySql + "\n      ORDER BY query"),
    (s, dir) => rankingPerQuery(s, dir).orderBy("query"))

  /** Macro averages of the per-query table ([[graft.stats.Ranking
    * .macroMetrics]]): defined-only means via decimal folds — one row
    * both engines must agree on to 6 decimals. */
  val rankingMacroGate: Q = Q(
    "ml_ranking_macro",
    Some(s"""
      WITH pq AS ($rankingPerQuerySql)
      SELECT count(*) AS n_queries,
        round(CAST(SUM(CAST(ndcg_at_k AS DECIMAL(38,12))) AS DOUBLE)
          / count(ndcg_at_k), 6) AS macro_ndcg,
        round(CAST(SUM(CAST(mrr AS DECIMAL(38,12))) AS DOUBLE)
          / count(mrr), 6) AS macro_mrr,
        round(CAST(SUM(CAST(precision_at_k AS DECIMAL(38,12))) AS DOUBLE)
          / count(precision_at_k), 6) AS macro_precision,
        round(CAST(SUM(CAST(recall_at_k AS DECIMAL(38,12))) AS DOUBLE)
          / count(recall_at_k), 6) AS macro_recall
      FROM pq"""),
    (s, dir) =>
      graft.stats.Ranking.macroMetrics(rankingPerQuery(s, dir)))

  /** Rank-biased overlap between two real rankers over orders — per
    * priority, customers ranked by revenue vs by order count
    * ([[graft.stats.Ranking.rbo]], p = 0.9, depth 20). The oracle
    * rebuilds both rankings, the k-row weight table (decimal folds of
    * 12-rounded pow terms), and the co-rank join; (1−p) is written as
    * the SUBTRACTION both sides (1.0 − 0.9 is not the double 0.1). */
  val rboGate: Q = Q(
    "ml_rbo",
    Some("""
      WITH agg AS (
        SELECT o_orderpriority AS query, o_custkey AS doc,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v,
          count(*) AS c
        FROM orders GROUP BY 1, 2),
      ra AS (SELECT query, doc, row_number() OVER (PARTITION BY query
               ORDER BY v DESC, doc) AS r1 FROM agg),
      rb AS (SELECT query, doc, row_number() OVER (PARTITION BY query
               ORDER BY c DESC, doc) AS r2 FROM agg),
      wt AS (
        SELECT m, SUM(CAST(round(pow(0.9, d - 1) / d, 12)
            AS DECIMAL(38,12))) AS w
        FROM (SELECT unnest(generate_series(1, 20)) AS m) mm,
             (SELECT unnest(generate_series(1, 20)) AS d) dd
        WHERE d >= m GROUP BY m),
      co AS (
        SELECT ra.query, greatest(r1, r2) AS m
        FROM ra JOIN rb USING (query, doc)
        WHERE greatest(r1, r2) <= 20),
      s AS (SELECT query, count(*) AS overlap_at_depth, SUM(w) AS ws
            FROM co JOIN wt USING (m) GROUP BY 1)
      SELECT q.query, COALESCE(s.overlap_at_depth, 0) AS overlap_at_depth,
        round((1.0 - 0.9)
          * CAST(COALESCE(s.ws, CAST(0 AS DECIMAL(38,12))) AS DOUBLE), 6)
          AS rbo
      FROM (SELECT DISTINCT query FROM agg) q LEFT JOIN s USING (query)
      ORDER BY query"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val agg = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("query"),
          col("o_custkey").as("doc"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("v"), count(lit(1)).as("c"))
      val wa = Window.partitionBy(col("query"))
        .orderBy(col("v").desc, col("doc"))
      val wb = Window.partitionBy(col("query"))
        .orderBy(col("c").desc, col("doc"))
      val ra = agg.select(col("query"), col("doc"),
        row_number().over(wa).as("rank"))
      val rb = agg.select(col("query"), col("doc"),
        row_number().over(wb).as("rank"))
      graft.stats.Ranking.rbo(ra, rb, "query", "doc", "rank",
        p = 0.9, depth = 20).orderBy("query")
    })

  /** Cohen's kappa ([[graft.stats.Agreement.cohenKappa]]): two synthetic
    * raters over documents — rater A labels doc_id%4, rater B agrees
    * except every 3rd doc (off-by-one category). Integer-cleared kappa:
    * both engines compute (n·Σagree − Σ r1·r2)/(n² − Σ r1·r2) with exact
    * numerators and ONE double division. */
  val cohenKappaGate: Q = Q(
    "lbl_cohen_kappa",
    Some("""
      WITH b AS (
        SELECT CAST(doc_id % 4 AS VARCHAR) AS a,
          CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 4 + 1) % 4
               ELSE doc_id % 4 END AS VARCHAR) AS bb
        FROM documents),
      cells AS (SELECT a, bb, count(*) AS c FROM b GROUP BY a, bb),
      tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN a = bb THEN c ELSE 0 END) AS BIGINT) AS agree
        FROM cells),
      e AS (
        SELECT COALESCE(SUM(CAST(ma.ca AS DECIMAL(38,0))
            * CAST(mb.cb AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS ee
        FROM (SELECT a, SUM(c) AS ca FROM cells GROUP BY a) ma
        JOIN (SELECT bb, SUM(c) AS cb FROM cells GROUP BY bb) mb
          ON ma.a = mb.bb)
      SELECT n AS n_items,
        round(agree / CAST(n AS DOUBLE), 6) AS p_observed,
        round(CAST(ee AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_expected,
        CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) <> ee
          THEN round(
            CAST(CAST(n AS DECIMAL(38,0)) * CAST(agree AS DECIMAL(38,0))
              - ee AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
              - ee AS DOUBLE), 6)
        END AS kappa
      FROM tot, e"""),
    (s, dir) =>
      graft.stats.Agreement.cohenKappa(
        Tables.load(s, dir, "documents"),
        (col("doc_id") % 4).cast("string"),
        when(col("doc_id") % 3 === 0, (col("doc_id") % 4 + 1) % 4)
          .otherwise(col("doc_id") % 4).cast("string")))

  /** Fleiss' kappa ([[graft.stats.Agreement.fleissKappa]]): three
    * synthetic raters in long format — rater r deviates from the shared
    * doc_id%4 label by +r on every (2+r)-th doc, so the panel carries a
    * planted mixture of full and partial agreement. Cleared-fraction
    * kappa over exact decimal S2/T2 folds. */
  /** ICC(1,1) one-way intraclass correlation ([[graft.stats.Agreement
    * .icc]]): numeric-rating reliability over a planted 3-rater design
    * (item effect doc_id%50 ≫ rater noise (doc_id·r)%7, so the score is
    * the item's, not the rater's). The oracle replays both fold layers,
    * the ANOVA decomposition, F, and the ICC. In-gate: the planted
    * separation registers (icc1 > 0.9). */
  val iccGate: Q = Q(
    "lbl_icc",
    Some("""
      WITH rt AS (SELECT unnest([1, 2, 3]) AS r),
      b AS (
        SELECT doc_id AS i,
          CAST(doc_id % 50 + (doc_id * rt.r) % 7 AS DOUBLE) AS y
        FROM documents, rt),
      pi AS (
        SELECT i, CAST(count(*) AS BIGINT) AS k,
          CAST(SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s,
          CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS ss
        FROM b GROUP BY i),
      g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(s, 12) AS DECIMAL(38,12))) AS DOUBLE) AS gs,
          CAST(SUM(CAST(round(ss, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS gss,
          CAST(SUM(CAST(round(s * s / 3, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS sbk
        FROM pi),
      f AS (
        SELECT n,
          (sbk - gs * gs / (n * 3.0)) / (n - 1) AS msb,
          (gss - sbk) / (n * 2.0) AS msw
        FROM g)
      SELECT n AS n_items, CAST(3 AS BIGINT) AS k_raters,
        round(msb, 6) + 0.0 AS msb, round(msw, 6) + 0.0 AS msw,
        CASE WHEN msw > 0 THEN round(msb / msw, 6) + 0.0 END AS f_stat,
        CASE WHEN msw > 0
          THEN round((msb - msw) / (msb + 2 * msw), 6) + 0.0 END AS icc1
      FROM f"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val rated = (1 to 3).map { r =>
        docs.select(col("doc_id").as("i"),
          (col("doc_id") % 50 + (col("doc_id") * r) % 7)
            .cast("double").as("y"))
      }.reduce(_ unionByName _)
      val out = graft.stats.Agreement.icc(rated, col("i"), col("y"))
      val r = out.head()
      require(r.getAs[Double]("icc1") > 0.9,
        s"planted item separation must register: $r")
      out
    })

  val fleissKappaGate: Q = Q(
    "lbl_fleiss_kappa",
    Some("""
      WITH rt AS (SELECT unnest([1, 2, 3]) AS r),
      b AS (
        SELECT doc_id AS i,
          CAST((doc_id % 4 + CASE WHEN doc_id % (2 + rt.r) = 0
            THEN rt.r ELSE 0 END) % 4 AS VARCHAR) AS l
        FROM documents, rt),
      cells AS (SELECT i, l, count(*) AS c FROM b GROUP BY i, l),
      s AS (
        SELECT CAST(count(DISTINCT i) AS BIGINT) AS nitems,
          SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS s2
        FROM cells),
      t AS (
        SELECT SUM(CAST(tk AS DECIMAL(38,0)) * CAST(tk AS DECIMAL(38,0)))
          AS t2
        FROM (SELECT l, SUM(c) AS tk FROM cells GROUP BY l)),
      f AS (
        SELECT nitems, CAST(3 AS BIGINT) AS nraters,
          s2, t2, CAST(nitems AS DECIMAL(38,0)) * 3 AS nn
        FROM s, t)
      SELECT nitems AS n_items, nraters AS n_raters,
        round(CAST(s2 - nn AS DOUBLE)
          / CAST(nn * 2 AS DOUBLE), 6) AS p_bar,
        round(CAST(t2 AS DOUBLE) / CAST(nn * nn AS DOUBLE), 6)
          AS p_expected,
        CASE WHEN nn * nn <> t2 THEN
          round(CAST((s2 - nn) * nn - t2 * 2 AS DOUBLE)
            / CAST((nn * nn - t2) * 2 AS DOUBLE), 6)
        END AS kappa
      FROM f"""),
    (s, dir) =>
      graft.stats.Agreement.fleissKappa(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(array(lit(1), lit(2), lit(3))).as("r"))
          .select(col("doc_id"),
            ((col("doc_id") % 4 +
              when(col("doc_id") % (col("r") + 2) === 0, col("r"))
                .otherwise(0)) % 4).cast("string").as("l")),
        col("doc_id"), col("l")))

  /** Filter yield curve ([[graft.stats.Eval.yieldCurve]]): hash-fraction
    * score over documents, token-ish weight = n_chars — per threshold,
    * rows kept, kept fraction, kept character mass and its fraction.
    * One conditional-aggregate scan, decimal weight folds. */
  val yieldCurveGate: Q = Q(
    "ml_yield_curve",
    Some(s"""
      WITH b AS (
        SELECT ${hfSql("graft-yield", "doc_id")} AS s,
          CAST(n_chars AS DECIMAL(38,6)) AS w
        FROM documents WHERE n_chars IS NOT NULL),
      t AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS threshold),
      tot AS (SELECT count(*) AS total, SUM(w) AS wt FROM b)
      SELECT t.threshold,
        CAST(SUM(CASE WHEN b.s >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        round(SUM(CASE WHEN b.s >= t.threshold THEN 1 ELSE 0 END)
          / CAST(tot.total AS DOUBLE), 6) AS frac_kept,
        CAST(SUM(CASE WHEN b.s >= t.threshold THEN b.w
          ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS weight_kept,
        round(CAST(SUM(CASE WHEN b.s >= t.threshold THEN b.w
            ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
          / CAST(tot.wt AS DOUBLE), 6) AS frac_weight
      FROM b, t, tot
      GROUP BY t.threshold, tot.total, tot.wt
      ORDER BY t.threshold"""),
    (s, dir) =>
      Eval.yieldCurve(
        Tables.load(s, dir, "documents").filter(col("n_chars").isNotNull),
        Sampling.hashFraction("graft-yield", Seq(col("doc_id"))),
        col("n_chars"),
        Seq(0.1, 0.25, 0.5, 0.75, 0.9)))

  /** Shared confident-learning fixture + SQL ([[graft.stats.LabelNoise]]):
    * latent class = doc_id%4, every 11th doc mislabeled +1; the "model"
    * is a peaked deterministic distribution p_latent = 0.55 + 0.3·hash
    * with the remainder split evenly — so per-class thresholds are
    * nontrivial and mislabeled docs suggest their latent class. */
  private val clBaseSql: String = s"""
      WITH b AS (
        SELECT doc_id, CAST(doc_id % 4 AS INT) AS latent,
          CAST(CASE WHEN doc_id % 11 = 0 THEN (doc_id % 4 + 1) % 4
               ELSE doc_id % 4 END AS INT) AS given,
          0.55 + 0.3 * ${hfSql("graft-cl-noise", "doc_id")} AS pl
        FROM documents),
      e AS (
        SELECT doc_id, given, latent, t.j,
          CASE WHEN t.j = latent THEN pl ELSE (1 - pl) / 3 END AS p
        FROM b, (SELECT CAST(unnest([0, 1, 2, 3]) AS INT) AS j) t),
      th AS (
        SELECT given AS j,
          round(CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DOUBLE)
            / count(*), 12) AS t
        FROM e WHERE e.j = e.given GROUP BY given),
      cand AS (
        SELECT e.doc_id, e.given, e.j, e.p,
          row_number() OVER (PARTITION BY e.doc_id
            ORDER BY e.p DESC, e.j) AS r
        FROM e JOIN th ON th.j = e.j AND e.p >= th.t),
      s AS (
        SELECT cand.doc_id, cand.given, cand.j AS suggested,
          cand.p AS p_suggested, pg.p AS p_given
        FROM cand
        JOIN (SELECT doc_id, p FROM e WHERE j = given) pg
          ON pg.doc_id = cand.doc_id
        WHERE r = 1)"""

  private def clInput(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val latent = (col("doc_id") % 4).cast("int")
    val pl = lit(0.55) + lit(0.3) *
      Sampling.hashFraction("graft-cl-noise", Seq(col("doc_id")))
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 11 === 0, (col("doc_id") % 4 + 1) % 4)
        .otherwise(col("doc_id") % 4).cast("int").as("given"),
      transform(sequence(lit(0), lit(3)),
        j => when(j === latent, pl).otherwise((lit(1.0) - pl) / 3))
        .as("probs"))
  }

  /** Confident joint C[given][suggested] with cell shares. */
  val confidentJointGate: Q = Q(
    "lbl_confident_joint",
    Some(clBaseSql + """
      SELECT given, suggested, CAST(count(*) AS BIGINT) AS n,
        round(count(*) / CAST((SELECT count(*) FROM s) AS DOUBLE), 6)
          AS share
      FROM s GROUP BY given, suggested
      ORDER BY given, suggested"""),
    (s, dir) => {
      val joint = graft.stats.LabelNoise.confidentJoint(
        clInput(s, dir), "doc_id", col("given"), col("probs"), k = 4)
      // the planted noise must surface: off-diagonal mass exists and the
      // diagonal dominates (the model is right far more often than not)
      val offDiag = joint.filter(col("given") =!= col("suggested"))
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      val diag = joint.filter(col("given") === col("suggested"))
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      require(offDiag > 0, "planted label noise left no off-diagonal mass")
      require(diag > offDiag * 3,
        s"diagonal $diag should dominate off-diagonal $offDiag")
      joint.orderBy("given", "suggested")
    })

  /** The relabel queue: examples whose confident suggestion differs from
    * the given label — the mislabeled 11ths (when counted). */
  val labelIssuesGate: Q = Q(
    "lbl_label_issues",
    Some(clBaseSql + """
      SELECT doc_id, given, suggested, p_given, p_suggested
      FROM s WHERE suggested <> given
      ORDER BY doc_id"""),
    (s, dir) => {
      val issues = graft.stats.LabelNoise.labelIssues(
        clInput(s, dir), "doc_id", col("given"), col("probs"), k = 4)
      // every flagged doc should be one of the planted mislabels
      val falseAlarms = issues.filter(col("doc_id") % 11 =!= 0).count()
      require(falseAlarms == 0,
        s"$falseAlarms correctly-labeled docs were flagged")
      issues.orderBy("doc_id")
    })

  /** Kendall's W ([[graft.stats.Agreement.kendallW]]): three synthetic
    * raters score every document on a 10-point scale (doc_id%10 with a
    * per-rater deterministic bump), so the panel carries heavy ties —
    * exercising the tie-corrected denominator. Exact integer S4/ΣT
    * algebra re-derived in DuckDB, one double division per statistic. */
  val kendallWGate: Q = Q(
    "lbl_kendall_w",
    Some("""
      WITH rt AS (SELECT unnest([1, 2, 3]) AS r),
      b AS (
        SELECT doc_id AS i, rt.r,
          CAST(doc_id % 10 + CASE WHEN doc_id % (3 + rt.r) = 0
            THEN rt.r ELSE 0 END AS DOUBLE) AS s
        FROM documents, rt),
      rk AS (
        SELECT i, r,
          2 * rank() OVER (PARTITION BY r ORDER BY s)
            + count(*) OVER (PARTITION BY r, s) - 1 AS r2
        FROM b),
      nm AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n,
                    CAST(count(DISTINCT r) AS BIGINT) AS m FROM b),
      rs AS (SELECT i, CAST(sum(r2) AS BIGINT) AS r2sum FROM rk GROUP BY 1),
      s4 AS (
        SELECT COALESCE(SUM(
            CAST(r2sum - m * (n + 1) AS DECIMAL(38,0))
            * CAST(r2sum - m * (n + 1) AS DECIMAL(38,0))),
          CAST(0 AS DECIMAL(38,0))) AS s4
        FROM rs, nm),
      tt AS (
        SELECT COALESCE(SUM(CAST(t AS DECIMAL(38,0))
            * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
            - CAST(t AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS st
        FROM (SELECT r, s, count(*) AS t FROM b GROUP BY 1, 2)),
      dn AS (
        SELECT CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
            * (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
               * CAST(n AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0)))
          - CAST(m AS DECIMAL(38,0)) * st AS den
        FROM nm, tt)
      SELECT n AS n_items, m AS n_raters,
        CASE WHEN den <> 0 THEN
          round(CAST(CAST(3 AS DECIMAL(38,0)) * s4 AS DOUBLE)
            / CAST(den AS DOUBLE), 6) END AS w,
        CASE WHEN den <> 0 THEN
          round(CAST(m * (n - 1) AS DOUBLE)
            * (CAST(CAST(3 AS DECIMAL(38,0)) * s4 AS DOUBLE)
               / CAST(den AS DOUBLE)), 6) END AS chi2
      FROM nm, s4, dn"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val panel = docs.select(col("doc_id").as("i"),
          explode(array(lit(1), lit(2), lit(3))).as("r"))
        .select(col("i"), col("r"),
          (col("i") % 10 + when(col("i") % (lit(3) + col("r")) === 0,
            col("r")).otherwise(lit(0))).cast("double").as("s"))
      graft.stats.Agreement.kendallW(panel, col("i"), col("r"), col("s"))
    })

  /** Krippendorff's alpha ([[graft.stats.Agreement.krippendorffAlpha]])
    * over a deliberately RAGGED panel — the shape Cohen/Fleiss reject:
    * items get 2–4 raters by doc_id%3, every 11th doc is a singleton
    * (excluded from pairable ratings), rater r deviates from the shared
    * doc_id%4 label on every (2+r)-th doc. Per-item disagreement
    * numerators are exact integers; the 1/(m_u−1) fractions are
    * rounded-12 decimal folds; D_e stays an integer ratio until one
    * double division. The oracle's `+ 0.0` is the negative-zero
    * canonicalizer. */
  val krippendorffGate: Q = Q(
    "lbl_krippendorff_alpha",
    Some("""
      WITH rt AS (SELECT unnest([1, 2, 3, 4]) AS r),
      b AS (
        SELECT doc_id AS i,
          CAST((doc_id % 4 + CASE WHEN doc_id % (2 + rt.r) = 0
            THEN rt.r ELSE 0 END) % 4 AS VARCHAR) AS l
        FROM documents, rt
        WHERE rt.r <= CASE WHEN doc_id % 11 = 0 THEN 1
                           ELSE 2 + doc_id % 3 END),
      cells AS (SELECT i, l, count(*) AS c FROM b GROUP BY i, l),
      items AS (
        SELECT i, SUM(c) AS mu,
          CAST(SUM(c) AS DECIMAL(38,0)) * CAST(SUM(c) AS DECIMAL(38,0))
            - SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS au
        FROM cells GROUP BY i HAVING SUM(c) >= 2),
      dof AS (
        SELECT CAST(count(*) AS BIGINT) AS n_items,
          CAST(SUM(mu) AS BIGINT) AS n,
          SUM(CAST(round(CAST(au AS DOUBLE) / (mu - 1), 12)
            AS DECIMAL(38,14))) AS do_sum
        FROM items),
      nc AS (SELECT l, SUM(c) AS nc
             FROM cells JOIN items USING (i) GROUP BY l),
      def AS (
        SELECT CAST(count(*) AS BIGINT) AS n_categories,
          SUM(CAST(nc AS DECIMAL(38,0)) *
            (CAST((SELECT n FROM dof) AS DECIMAL(38,0))
             - CAST(nc AS DECIMAL(38,0)))) AS de_num
        FROM nc)
      SELECT n_items, n AS n_ratings, n_categories,
        round(CAST(do_sum AS DOUBLE) / n, 9) + 0.0 AS do_rate,
        round(CAST(de_num AS DOUBLE)
          / CAST(CAST(n AS DECIMAL(38,0))
                 * (CAST(n AS DECIMAL(38,0)) - 1) AS DOUBLE), 9)
          + 0.0 AS de_rate,
        CASE WHEN de_num <> 0 THEN
          round(1.0 - CAST(n - 1 AS DOUBLE) * CAST(do_sum AS DOUBLE)
            / CAST(de_num AS DOUBLE), 9) + 0.0 END AS alpha
      FROM dof, def"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val ratings = docs.select(col("doc_id"),
          explode(sequence(lit(1), when(col("doc_id") % 11 === 0, 1)
            .otherwise((lit(2) + col("doc_id") % 3).cast("int")))).as("r"))
        .select(col("doc_id").as("i"),
          ((col("doc_id") % 4 + when(col("doc_id") % (lit(2) + col("r")) === 0,
            col("r")).otherwise(lit(0))) % 4).cast("string").as("l"))
      graft.stats.Agreement.krippendorffAlpha(ratings, col("i"), col("l"))
    })

  /** Operating-point selection ([[graft.stats.Eval.bestThreshold]]):
    * max-F1 and max-Youden-J cuts over the full distinct-score sweep of
    * the discount/returnflag classifier — argmaxes are struct-max total
    * orders on doubles both engines derive from exact integer counts. */
  val bestThresholdGate: Q = Q(
    "ml_best_threshold",
    Some("""
      WITH b AS (
        SELECT CAST(l_discount AS DOUBLE) AS s,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      g AS (
        SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
          CAST(SUM(1 - y) AS BIGINT) AS neg
        FROM b GROUP BY s),
      tot AS (SELECT SUM(pos) AS p, SUM(neg) AS n FROM g),
      cum AS (
        SELECT s,
          SUM(pos) OVER (ORDER BY s DESC
            ROWS UNBOUNDED PRECEDING) AS tp,
          SUM(neg) OVER (ORDER BY s DESC
            ROWS UNBOUNDED PRECEDING) AS fp
        FROM g),
      m AS (
        SELECT s,
          2.0 * tp / CAST(tp + fp + (SELECT p FROM tot) AS DOUBLE) AS f1,
          tp / CAST(tp + fp AS DOUBLE) AS prec,
          tp / CAST((SELECT p FROM tot) AS DOUBLE) AS tpr,
          fp / CAST((SELECT n FROM tot) AS DOUBLE) AS fpr
        FROM cum),
      bf AS (SELECT max({'m': f1, 't': s, 'p': prec, 'r': tpr}) AS x FROM m),
      bj AS (SELECT max({'m': tpr - fpr, 't': s, 'r': tpr, 'f': fpr}) AS x
             FROM m)
      SELECT bf.x.t AS threshold_f1, round(bf.x.m, 9) AS f1,
        round(bf.x.p, 9) AS precision_at_f1,
        round(bf.x.r, 9) AS recall_at_f1,
        bj.x.t AS threshold_j, round(bj.x.m, 9) + 0.0 AS youden_j,
        round(bj.x.r, 9) AS tpr_at_j, round(bj.x.f, 9) AS fpr_at_j
      FROM bf, bj"""),
    (s, dir) => {
      val out = Eval.bestThreshold(Tables.load(s, dir, "lineitem"),
        col("l_discount"), (col("l_returnflag") === "R").cast("int"))
      val r = out.collect().head
      require(r.getAs[Double]("f1") > 0 && r.getAs[Double]("youden_j") >= 0,
        "degenerate operating points")
      out
    })

  /** Per-group isotonic calibration
    * ([[graft.stats.Isotonic.fitByGroup]]): the same score/label fixture
    * split into two domains (orderkey parity), each fitted its own
    * monotone map — one (group, score) aggregation, driver PAV per
    * group. The oracle runs the INDEPENDENT minimax formula
    * group-partitioned; per-group fits must also equal what
    * single-group [[Isotonic.fit]] computes on each slice (asserted
    * in-gate — the per-group path must be exactly the grouped
    * composition of the single path). */
  val isoFitByGroup: Q = Q(
    "iso_fit_by_group",
    Some(s"""
      WITH b AS (
        SELECT o_orderkey % 2 AS g,
          CAST(floor(o_totalprice / 20000) AS INT) AS s,
          CASE WHEN ${hfSql("graft-cal", "o_orderkey")}
            < (CAST(floor(o_totalprice / 20000) AS INT) + 1) / 27.0
            THEN 1 ELSE 0 END AS y
        FROM orders),
      lev AS (
        SELECT g, s, CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS sy,
          row_number() OVER (PARTITION BY g ORDER BY s) AS i
        FROM b GROUP BY g, s),
      pre AS (
        SELECT g, i, s, n, sy,
          SUM(n) OVER (PARTITION BY g ORDER BY i) AS cn,
          SUM(sy) OVER (PARTITION BY g ORDER BY i) AS cy
        FROM lev),
      triple AS (
        SELECT m.g, m.i, j.i AS j, k.i AS k,
          CAST(k.cy - (j.cy - j.sy) AS DOUBLE)
            / (k.cn - (j.cn - j.n)) AS a
        FROM pre m
        JOIN pre j ON j.g = m.g AND j.i <= m.i
        JOIN pre k ON k.g = m.g AND k.i >= m.i),
      mm AS (SELECT g, i, j, min(a) AS inner_min
             FROM triple GROUP BY g, i, j),
      fit AS (SELECT g, i, max(inner_min) AS fitted
              FROM mm GROUP BY g, i)
      SELECT lev.g AS g, lev.s AS score, lev.n, lev.sy,
        round(fit.fitted, 9) AS fitted
      FROM lev JOIN fit ON lev.g = fit.g AND lev.i = fit.i
      ORDER BY lev.g, score"""),
    (s, dir) => {
      import s.implicits._
      import graft.stats.Isotonic
      val base = isoBase(s, dir)
        .withColumn("g", col("o_orderkey") % 2)
      val models = Isotonic.fitByGroup(base, col("g"), col("s"), col("y"))
      require(models.keySet == Set("0", "1"), s"groups: ${models.keySet}")
      // per-group == grouped composition of the single-group fit
      for ((g, m) <- models) {
        val single = Isotonic.fit(base.filter(col("g") === g.toLong),
          col("s"), col("y"))
        require(m.scores.sameElements(single.scores) &&
          m.fitted.sameElements(single.fitted),
          s"group $g: fitByGroup differs from fit() on the slice")
      }
      models.toSeq.flatMap { case (g, m) =>
        m.scores.indices.map(ix => (g.toLong, m.scores(ix).toInt,
          m.n(ix), m.sumY(ix).toLong,
          java.math.BigDecimal.valueOf(m.fitted(ix))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()))
      }.toDF("g", "score", "n", "sy", "fitted")
        .orderBy("g", "score")
    })

  /** Cronbach's alpha ([[graft.stats.Agreement.cronbachAlpha]]): three
    * constructed "rating" items sharing the quantity construct (r2/r3
    * add independent per-row noise), so internal consistency is high by
    * construction — the oracle replays the round-12 decimal moment
    * folds, all four sample variances, and the α formula term-for-term.
    * In-gate: α > 0.9 on the shared-construct fixture. */
  val cronbachAlphaGate: Q = Q(
    "lbl_cronbach_alpha",
    Some("""
      WITH b AS (
        SELECT CAST(l_quantity AS DOUBLE) AS r1,
          CAST(l_quantity + l_linenumber AS DOUBLE) AS r2,
          CAST(l_quantity + l_orderkey % 5 AS DOUBLE) AS r3
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
          AND l_orderkey IS NOT NULL),
      m AS (
        SELECT count(*) AS n,
          CAST(SUM(CAST(round(r1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s0,
          CAST(SUM(CAST(round(r1 * r1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS q0,
          CAST(SUM(CAST(round(r2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(round(r2 * r2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS q1,
          CAST(SUM(CAST(round(r3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2,
          CAST(SUM(CAST(round(r3 * r3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS q2,
          CAST(SUM(CAST(round(r1 + r2 + r3, 12) AS DECIMAL(38,12)))
            AS DOUBLE) AS st,
          CAST(SUM(CAST(round((r1 + r2 + r3) * (r1 + r2 + r3), 12)
            AS DECIMAL(38,12))) AS DOUBLE) AS qt
        FROM b),
      v AS (
        SELECT n,
          (q0 - s0 * s0 / n) / (n - 1) AS v0,
          (q1 - s1 * s1 / n) / (n - 1) AS v1,
          (q2 - s2 * s2 / n) / (n - 1) AS v2,
          (qt - st * st / n) / (n - 1) AS vt
        FROM m)
      SELECT CAST(n AS BIGINT) AS n_rows, 3 AS k,
        round(v0 + v1 + v2, 6) + 0.0 AS sum_item_var,
        round(vt, 6) + 0.0 AS total_var,
        CASE WHEN vt <> 0
          THEN round(CAST(3 AS DOUBLE) / (3 - 1)
            * (1.0 - (v0 + v1 + v2) / vt), 6) + 0.0 END AS alpha
      FROM v"""),
    (s, dir) => {
      val items = Tables.load(s, dir, "lineitem")
        .select(col("l_quantity").cast("double").as("r1"),
          (col("l_quantity") + col("l_linenumber")).cast("double").as("r2"),
          (col("l_quantity") + col("l_orderkey") % 5).cast("double").as("r3"))
      val out = graft.stats.Agreement.cronbachAlpha(items,
        Seq("r1", "r2", "r3"))
      val a = out.head().getAs[Double]("alpha")
      require(a > 0.9,
        s"items share the quantity construct; alpha must be high, got $a")
      out
    })

  /** McNemar's paired test ([[graft.stats.Contingency.mcnemar]]) between
    * two rule "classifiers" of the return flag on the SAME lineitem rows
    * (discount-based vs tax-based). The synthetic columns are independent
    * of the flag, so the gate exercises the estimator's arithmetic, not a
    * discovery; the oracle replays all four paired cells and the
    * continuity-corrected χ² as an exact integer ratio. The χ²(1) p is
    * library-only (asserted in [0,1] in-gate, excluded from the compare
    * per the ev_proportion_ztest convention). */
  val mcnemarGate: Q = Q(
    "ml_mcnemar",
    Some("""
      WITH b AS (
        SELECT (l_returnflag = 'R') AS truth,
          (l_discount > 0.05) AS pa, (l_tax >= 0.04) AS pb
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
          AND l_tax IS NOT NULL),
      m AS (
        SELECT
          CAST(count(*) FILTER ((pa = truth) AND (pb = truth)) AS BIGINT)
            AS n_both_right,
          CAST(count(*) FILTER ((pa = truth) AND (pb <> truth)) AS BIGINT)
            AS n_only_a,
          CAST(count(*) FILTER ((pa <> truth) AND (pb = truth)) AS BIGINT)
            AS n_only_b,
          CAST(count(*) FILTER ((pa <> truth) AND (pb <> truth)) AS BIGINT)
            AS n_both_wrong
        FROM b)
      SELECT n_both_right + n_only_a + n_only_b + n_both_wrong AS n,
        n_both_right, n_only_a, n_only_b, n_both_wrong,
        CASE WHEN n_only_a + n_only_b > 0
          THEN round(CAST(GREATEST(abs(n_only_a - n_only_b) - 1, 0) AS DOUBLE)
            * GREATEST(abs(n_only_a - n_only_b) - 1, 0)
            / (n_only_a + n_only_b), 9) + 0.0 END AS chi2_cc
      FROM m"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_discount").isNotNull
          && col("l_tax").isNotNull)
      val out = graft.stats.Contingency.mcnemar(li,
        col("l_returnflag") === "R",
        col("l_discount") > 0.05, col("l_tax") >= 0.04)
      val r = out.head()
      require(r.getAs[Long]("n_only_a") + r.getAs[Long]("n_only_b") > 0,
        "gate construction must produce discordant pairs")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"chi2(1) p must be a probability: $p")
      out.drop("p_value")
    })

  /** Decile lift & cumulative-gains table
    * ([[graft.stats.Eval.liftTable]]): extendedprice as the "score",
    * return flag as the label. The columns are independent by
    * construction, so every decile's lift ≈ 1 — the gate verifies the
    * bucketing/cumulative arithmetic row-for-row (thresholds, merged-tie
    * buckets, capture fractions), not a discovery; the oracle replays
    * the round-6 quantile thresholds, the bucket assignment, and the
    * window cumulative sweep. */
  val liftGainsGate: Q = Q(
    "ml_lift_gains",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS s,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
      t AS (SELECT
          round(quantile_cont(s, 0.1), 6) AS t1,
          round(quantile_cont(s, 0.2), 6) AS t2,
          round(quantile_cont(s, 0.3), 6) AS t3,
          round(quantile_cont(s, 0.4), 6) AS t4,
          round(quantile_cont(s, 0.5), 6) AS t5,
          round(quantile_cont(s, 0.6), 6) AS t6,
          round(quantile_cont(s, 0.7), 6) AS t7,
          round(quantile_cont(s, 0.8), 6) AS t8,
          round(quantile_cont(s, 0.9), 6) AS t9,
          CAST(count(*) AS BIGINT) AS tn, CAST(sum(y) AS BIGINT) AS tp
        FROM b),
      bk AS (
        SELECT 10 - ((b.s > t.t1)::INT + (b.s > t.t2)::INT
          + (b.s > t.t3)::INT + (b.s > t.t4)::INT + (b.s > t.t5)::INT
          + (b.s > t.t6)::INT + (b.s > t.t7)::INT + (b.s > t.t8)::INT
          + (b.s > t.t9)::INT) AS bucket, b.y
        FROM b, t),
      pb AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(y) AS BIGINT) AS n_pos
        FROM bk GROUP BY 1),
      cum AS (
        SELECT *, sum(n) OVER (ORDER BY bucket) AS cum_n,
          sum(n_pos) OVER (ORDER BY bucket) AS cum_pos
        FROM pb)
      SELECT bucket, n, n_pos,
        round(CAST(n_pos AS DOUBLE) / n, 9) AS pos_rate,
        round((CAST(n_pos AS DOUBLE) / n)
          / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 9) AS lift,
        round(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE), 9)
          AS cum_capture,
        round(CAST(cum_n AS DOUBLE) / CAST(tn AS DOUBLE), 9) AS cum_frac
      FROM cum, t ORDER BY bucket"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull &&
          col("l_returnflag").isNotNull)
      val out = graft.stats.Eval.liftTable(li, col("l_extendedprice"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      val rows = out.collect()
      val last = rows.maxBy(_.getAs[Int]("bucket"))
      require(last.getAs[Double]("cum_capture") == 1.0 &&
        last.getAs[Double]("cum_frac") == 1.0,
        s"the final bucket must capture everything: $last")
      out
    })

  /** Cochran's Q across three paired rule "raters" of the same lineitem
    * rows ([[graft.stats.Agreement.cochranQ]]): the k-treatment
    * generalization of ml_mcnemar, exact-integer end-to-end. The oracle
    * replays the per-rater totals and per-row success counts and the
    * integer-cleared Q; the χ²(k−1) p is library-only (asserted
    * in-gate, excluded). */
  val cochranQGate: Q = Q(
    "lbl_cochran_q",
    Some("""
      WITH b AS (
        SELECT (l_discount > 0.05) AS f0, (l_tax >= 0.04) AS f1,
          (l_quantity > 25) AS f2
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
          AND l_quantity IS NOT NULL),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f0::INT) AS BIGINT) AS c0,
          CAST(sum(f1::INT) AS BIGINT) AS c1,
          CAST(sum(f2::INT) AS BIGINT) AS c2,
          CAST(sum(f0::INT + f1::INT + f2::INT) AS BIGINT) AS sr,
          CAST(sum((f0::INT + f1::INT + f2::INT)
            * (f0::INT + f1::INT + f2::INT)) AS BIGINT) AS srr
        FROM b)
      SELECT n, 3 AS k,
        CASE WHEN 3 * sr - srr > 0
          THEN round(CAST(2 * (3 * (c0 * c0 + c1 * c1 + c2 * c2)
            - (c0 + c1 + c2) * (c0 + c1 + c2)) AS DOUBLE)
            / CAST(3 * sr - srr AS DOUBLE), 9) + 0.0 END AS q_stat
      FROM m"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_discount").isNotNull && col("l_tax").isNotNull &&
          col("l_quantity").isNotNull)
        .select((col("l_discount") > 0.05).as("f0"),
          (col("l_tax") >= 0.04).as("f1"),
          (col("l_quantity") > 25).as("f2"))
      val out = graft.stats.Agreement.cochranQ(li, Seq("f0", "f1", "f2"))
      val r = out.head()
      require(r.getAs[Double]("q_stat") > 0.0, s"degenerate gate: $r")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0, s"chi2 p must be a probability: $p")
      out.drop("p_value")
    })

  /** Brier score + Murphy decomposition
    * ([[graft.stats.Eval.brierDecomposition]]) with the discount level
    * (×10, 11 distinct values) as the "forecast": the oracle replays the
    * per-score cells, all three decimal term folds, and the base rate;
    * in-gate the EXACT identity BS = REL − RES + UNC is asserted to the
    * rounding floor. */
  val brierGate: Q = Q(
    "ml_brier_decomposition",
    Some("""
      WITH b AS (
        SELECT round(l_discount * 10, 2) AS p,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
      g AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n_p,
          CAST(sum(y) AS BIGINT) AS s_p
        FROM b GROUP BY 1),
      t AS (
        SELECT CAST(SUM(n_p) AS BIGINT) AS n, CAST(SUM(s_p) AS BIGINT) AS s
        FROM g),
      yb AS (SELECT n, CAST(s AS DOUBLE) / n AS ybar FROM t),
      f AS (
        SELECT
          CAST(SUM(round(p * p * n_p - 2.0 * p * s_p + s_p,
            12)::DECIMAL(38,14)) AS DOUBLE) AS bs,
          CAST(SUM(round((p - CAST(s_p AS DOUBLE) / n_p)
            * (p - CAST(s_p AS DOUBLE) / n_p) * n_p,
            12)::DECIMAL(38,14)) AS DOUBLE) AS rel,
          CAST(SUM(round((CAST(s_p AS DOUBLE) / n_p - yb.ybar)
            * (CAST(s_p AS DOUBLE) / n_p - yb.ybar) * n_p,
            12)::DECIMAL(38,14)) AS DOUBLE) AS res
        FROM g, yb)
      SELECT yb.n, round(f.bs / yb.n, 9) AS brier,
        round(f.rel / yb.n, 9) AS reliability,
        round(f.res / yb.n, 9) AS resolution,
        round(yb.ybar * (1 - yb.ybar), 9) AS uncertainty
      FROM f, yb"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_discount").isNotNull && col("l_returnflag").isNotNull)
      val out = graft.stats.Eval.brierDecomposition(li,
        round(col("l_discount") * 10, 2),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      val r = out.head()
      val identity = r.getAs[Double]("reliability") -
        r.getAs[Double]("resolution") + r.getAs[Double]("uncertainty")
      require(math.abs(r.getAs[Double]("brier") - identity) < 3e-9,
        s"Murphy identity must hold exactly at the rounding floor: $r")
      out
    })

  /** Matthews correlation at a fixed price threshold
    * ([[graft.stats.Eval.mccAt]]): independent columns, so the gate is
    * the confusion/MCC arithmetic (|mcc| small asserted), not a
    * discovery; the oracle replays the four cells and the double
    * product tree. */
  val mccGate: Q = Q(
    "ml_mcc",
    Some("""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS s,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
      c AS (
        SELECT
          CAST(SUM(CASE WHEN s > 30000.0 AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN s > 30000.0 AND y = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN s <= 30000.0 AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN s <= 30000.0 AND y = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS tn
        FROM b)
      SELECT tp, fp, fn, tn,
        CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
            AND tn + fn > 0
          THEN round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
            / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp)
              * (tn + fn)), 6) + 0.0 END AS mcc
      FROM c"""),
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull &&
          col("l_returnflag").isNotNull)
      val out = graft.stats.Eval.mccAt(li, col("l_extendedprice"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L), 30000.0)
      val m = out.head().getAs[Double]("mcc")
      require(math.abs(m) < 0.05,
        s"price and flag are independent; MCC must be near 0: $m")
      out
    })

  /** Two synthetic ordinal raters over lineitem: a = capped quantity
    * decile (0..5), b = a pushed up one level on every fifth order key —
    * mostly agreeing, with a deliberate UPWARD drift (the asymmetry
    * Bowker exists to catch, invisible to kappa). */
  private def ordinalRaters(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_quantity").isNotNull && col("l_orderkey").isNotNull)
    val a = least(lit(5L), floor(col("l_quantity") / 10))
    li.select(a.as("a"),
      least(lit(5L), a + when(col("l_orderkey") % 5 === 0, 1L)
        .otherwise(0L)).as("b"))
  }

  private val ordinalRatersSql = """
    SELECT a, LEAST(5, a + CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE 0 END)
      AS b
    FROM (SELECT LEAST(5, CAST(floor(l_quantity / 10) AS BIGINT)) AS a,
        l_orderkey
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_orderkey IS NOT NULL)"""

  /** Quadratic-weighted kappa ([[graft.stats.Agreement.weightedKappa]])
    * on the ordinal-rater fixture: the oracle replays the integer-cleared
    * κ_w = 1 − n·Σ(i−j)²o / Σ(i−j)²·r·c with HUGEINT products. In-gate:
    * the near-agreeing raters must score high, and ABOVE unweighted
    * kappa (the drift is all one-step — quadratic weights forgive it). */
  val weightedKappaGate: Q = Q(
    "lbl_weighted_kappa",
    Some(s"""
      WITH p AS ($ordinalRatersSql),
      cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
        FROM p GROUP BY 1, 2),
      rm AS (SELECT a, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY a),
      cm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cc FROM cells GROUP BY b),
      nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
      ob AS (
        SELECT SUM(CAST((a - b) * (a - b) AS HUGEINT) * c) AS obs
        FROM cells),
      ex AS (
        SELECT SUM(CAST((rm.a - cm.b) * (rm.a - cm.b) AS HUGEINT)
          * rm.r * cm.cc) AS expd
        FROM rm, cm),
      lv AS (
        SELECT CAST(count(*) AS INTEGER) AS levels
        FROM (SELECT a AS l FROM rm UNION SELECT b FROM cm))
      SELECT nn.n, lv.levels,
        CASE WHEN ex.expd <> 0
          THEN round(1.0 - CAST(nn.n * ob.obs AS DOUBLE)
            / CAST(ex.expd AS DOUBLE), 6) + 0.0 END AS kappa_w
      FROM nn, ob, ex, lv"""),
    (s, dir) => {
      val raters = ordinalRaters(s, dir)
      val out = graft.stats.Agreement.weightedKappa(raters,
        col("a"), col("b"))
      val kw = out.head().getAs[Double]("kappa_w")
      require(kw > 0.7, s"near-agreeing raters must score high: $kw")
      if (Tables.gateMode) {
        val plain = graft.stats.Agreement.cohenKappa(raters,
          col("a"), col("b")).head().getAs[Double]("kappa")
        require(kw > plain,
          s"one-step drift: quadratic weights must forgive (kw=$kw k=$plain)")
      }
      out
    })

  /** Bowker's symmetry test ([[graft.stats.Agreement.bowker]]) on the
    * same fixture: the planted one-direction drift must FIRE (χ² huge —
    * every discordant pair moves up, never down); the oracle replays
    * the pair rollup and the round-9 term fold; the χ²(df) p is
    * library-only (asserted ≈ 0 in-gate, excluded). */
  val bowkerGate: Q = Q(
    "lbl_bowker",
    Some(s"""
      WITH p AS ($ordinalRatersSql),
      cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
        FROM p GROUP BY 1, 2),
      nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
      pr AS (
        SELECT LEAST(a, b) AS i, GREATEST(a, b) AS j,
          CAST(SUM(CASE WHEN a < b THEN c ELSE 0 END) AS BIGINT) AS nij,
          CAST(SUM(CASE WHEN a > b THEN c ELSE 0 END) AS BIGINT) AS nji
        FROM cells WHERE a <> b GROUP BY 1, 2),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS dof,
          CAST(SUM(CAST(round(CAST(nij - nji AS DOUBLE) * (nij - nji)
            / (nij + nji), 9) AS DECIMAL(38,12))) AS DOUBLE) AS chi2
        FROM pr)
      SELECT nn.n, agg.dof AS n_pairs_tested,
        round(agg.chi2, 6) + 0.0 AS chi2
      FROM nn, agg"""),
    (s, dir) => {
      val out = graft.stats.Agreement.bowker(ordinalRaters(s, dir),
        col("a"), col("b"))
      val r = out.head()
      require(r.getAs[Double]("chi2") > 100.0,
        s"one-direction drift must fire the symmetry test: $r")
      require(r.getAs[Double]("p_value") < 1e-9)
      out.drop("p_value")
    })

  /** Spiegelhalter's calibration z ([[graft.stats.Eval.spiegelhalterZ]])
    * on the perfectly-calibrated synthetic probability (the
    * ml_calibration fixture): a well-calibrated forecaster must NOT
    * reject — |z| small asserted in-gate; the oracle replays both
    * round-12 term folds and the division; the normal p is library-only
    * (asserted, excluded). */
  val spiegelhalterGate: Q = Q(
    "ml_spiegelhalter",
    Some(s"""
      WITH b AS (
        SELECT ${hfSql("graft-cal", "o_orderkey")} AS p,
          CASE WHEN ${hfSql("graft-cal2", "o_orderkey")}
            < ${hfSql("graft-cal", "o_orderkey")} THEN 1.0 ELSE 0.0 END AS y
        FROM orders),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round((y - p) * (1.0 - 2.0 * p), 12)
            AS DECIMAL(38,14))) AS DOUBLE) AS num,
          CAST(SUM(CAST(round((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p
            * (1.0 - p), 12) AS DECIMAL(38,14))) AS DOUBLE) AS den2
        FROM b)
      SELECT n, CASE WHEN den2 > 0
        THEN round(num / sqrt(den2), 6) + 0.0 END AS z
      FROM a"""),
    (s, dir) => {
      val h1 = Sampling.hashFraction("graft-cal", Seq(col("o_orderkey")))
      val h2 = Sampling.hashFraction("graft-cal2", Seq(col("o_orderkey")))
      val out = Eval.spiegelhalterZ(Tables.load(s, dir, "orders"),
        h1, when(h2 < h1, 1.0).otherwise(0.0))
      val r = out.head()
      require(math.abs(r.getAs[Double]("z")) < 4.0,
        s"a calibrated forecaster must not reject: $r")
      val p = r.getAs[Double]("p_value")
      require(p >= 0.0 && p <= 1.0)
      out.drop("p_value")
    })

  override def queries: Seq[Q] =
    Seq(spiegelhalterGate,
      aucTies, aucSeparable, rocPoints, calibration, ece, classifierEval,
      aucByGroup, isoFit, isoApply, conformalSplit,
      rankingMetricsGate, rankingMacroGate, rboGate, cohenKappaGate,
      fleissKappaGate, iccGate,
      kendallWGate, yieldCurveGate, confidentJointGate, labelIssuesGate,
      krippendorffGate, bestThresholdGate, isoFitByGroup, cronbachAlphaGate,
      averagePrecisionGate,
      mcnemarGate, liftGainsGate, cochranQGate, brierGate, mccGate,
      weightedKappaGate, bowkerGate)
}
