package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation over scored rows — the acceptance gate of
  * every model-driven filter in a training-data pipeline (quality
  * classifiers, langid, contamination scorers): AUC, ROC/PR points at
  * fixed thresholds, and calibration bins.
  *
  * All three are engineered to stay exact until one final division so the
  * DuckDB oracles hash-match without rounding games:
  *
  *  - AUC uses the tie-aware Mann–Whitney identity over score GROUPS:
  *    AUC = Σ_s pos_s·(2·negBelow_s + neg_s) / (2·P·N). Numerator and
  *    denominator are exact longs; the single double division is
  *    bit-identical across engines.
  *  - ROC points are conditional integer sums per threshold — ONE scan,
  *    no explode (k thresholds = 4k aggregate columns folded map-side).
  *  - Calibration bins are integer counts + decimal(38,12) score sums.
  *
  * Scale shape: AUC is one groupBy(score) shuffle, then a window over the
  * DISTINCT-score frame — fine whenever scores are quantized or bounded
  * (classifier outputs, discretized probabilities). With genuinely unique
  * scores on 10¹¹ rows, pre-quantize (e.g. `round(score, 6)`) to bound the
  * window input; the AUC of the quantized score is the trapezoid
  * approximation with ≤ one-bin error. ROC/calibration never shuffle more
  * than a constant number of aggregate cells per partition.
  */
object Eval {

  /** Tie-aware AUC of `scoreCol` against binary `labelCol` (values must
    * be 0/1; anything else fails loudly — a silently coerced label would
    * produce a plausible-but-wrong AUC). Rows with a null score or label
    * are excluded. Returns one row (auc, n_pos, n_neg); `auc` is null
    * when either class is empty (undefined, not 0.5-by-fiat). */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val base = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
    val grouped = base.groupBy("__s").agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("pos"),
      sum(when(col("__y") === 0, 1L).otherwise(0L)).as("neg"),
      sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("bad"))
    // window over DISTINCT scores only (see scaladoc for the contract)
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grouped
      .withColumn("nb", coalesce(sum(col("neg")).over(w), lit(0L)))
    val out = cum.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("neg")).as("n_neg"),
      sum(col("bad")).as("n_bad"),
      // decimal terms: pos·(2·nb+neg) summed over 10¹¹-row classes
      // overflows a long (ANSI would throw); decimal(38,0) holds ~2e22
      sum(col("pos").cast("decimal(38,0)") *
        (lit(2L) * col("nb") + col("neg")).cast("decimal(38,0)"))
        .as("num2"))
    out.select(
        when(col("n_bad") > 0,
          raise_error(concat(lit("labels outside {0,1}: "),
            col("n_bad").cast("string"))))
          .otherwise(
            when(col("n_pos") > 0 && col("n_neg") > 0,
              col("num2").cast("double") /
                (lit(2.0) * col("n_pos") * col("n_neg")))).as("auc"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"))
  }

  /** Per-group tie-aware AUC — model evaluation sliced by domain/source/
    * language, the form that matters when a quality filter must work on
    * every slice, not just in aggregate. Same exact identity as [[auc]],
    * but the cumulative window partitions on the group columns, so score
    * groups shuffle ONCE on (group, score) and no global ordering
    * bottleneck exists — this is the variant to reach for at 10¹¹ rows
    * even for one overall number (add a constant group). Groups with a
    * single class report a null AUC. */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      labelCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "no group columns")
    val base = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select((groupCols.map(col) :+ scoreCol.cast("double").as("__s") :+
        labelCol.cast("int").as("__y")): _*)
    val grouped = base.groupBy((groupCols :+ "__s").map(col): _*).agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("pos"),
      sum(when(col("__y") === 0, 1L).otherwise(0L)).as("neg"),
      sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("bad"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grouped
      .withColumn("nb", coalesce(sum(col("neg")).over(w), lit(0L)))
    cum.groupBy(groupCols.map(col): _*).agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        sum(col("bad")).as("n_bad"),
        sum(col("pos").cast("decimal(38,0)") *
          (lit(2L) * col("nb") + col("neg")).cast("decimal(38,0)"))
          .as("num2"))
      .select((groupCols.map(col) :+
        when(col("n_bad") > 0,
          raise_error(concat(lit("labels outside {0,1}: "),
            col("n_bad").cast("string"))))
          .otherwise(
            when(col("n_pos") > 0 && col("n_neg") > 0,
              col("num2").cast("double") /
                (lit(2.0) * col("n_pos") * col("n_neg")))).as("auc") :+
        col("n_pos") :+ col("n_neg")): _*)
  }

  /** Confusion counts and derived rates at each threshold (score ≥ t ⇒
    * predicted positive): ONE aggregation pass producing 2 conditional
    * sums per threshold; fn/tn derive from the class totals. Precision is
    * null when nothing is predicted positive; F1 is null when precision
    * is null or precision+recall is 0. Returns one row per threshold in
    * input order. */
  /** Average precision (the area under the precision–recall curve by
    * the step interpolation, i.e. the ranking metric sklearn calls
    * `average_precision_score` — public): AP = Σ_k (R_k − R_{k−1})·P_k
    * over distinct score thresholds DESCENDING. The PR companion of
    * [[auc]] for the imbalanced case (rare positives — near-dup hits,
    * contamination, policy violations) where ROC-AUC saturates: AP is
    * dominated by how early the positives rank.
    *
    * Same scale contract as [[auc]]: one groupBy(score) shuffle, then a
    * window over the DISTINCT-score frame (pre-quantize genuinely
    * unique scores to bound it). Ties collapse into one threshold (the
    * sklearn semantics). Cumulative TP/FP are exact longs; per-
    * threshold terms pos·(TP/(TP+FP)) round to 9 and fold as decimals
    * (order-invariant), and AP is one final division rounded to 6 — a
    * SQL oracle replays everything. Returns one row (n_pos, n_neg,
    * n_thresholds, average_precision); AP null when no positives. */
  def averagePrecision(
      df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val base = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
    val grouped = base.groupBy("__s").agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("pos"),
      sum(when(col("__y") === 0, 1L).otherwise(0L)).as("neg"),
      sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("bad"))
    // window over DISTINCT scores only (the auc contract), descending:
    // tp/fp accumulate from the highest threshold down
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grouped
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fpc", sum(col("neg")).over(w))
    val out = cum.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("neg")).as("n_neg"),
      sum(col("bad")).as("n_bad"),
      count(lit(1)).as("n_thresholds"),
      sum(when(col("pos") > 0,
        round(col("pos").cast("double") *
          (col("tp").cast("double") / (col("tp") + col("fpc"))), 9))
        .otherwise(0.0).cast("decimal(38,12)")).as("terms"))
    out.select(
      coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      col("n_thresholds"),
      when(col("n_bad") > 0,
        raise_error(concat(lit("labels outside {0,1}: "),
          col("n_bad").cast("string"))))
        .otherwise(when(col("n_pos") > 0,
          round(col("terms").cast("double") / col("n_pos"), 6)))
        .as("average_precision"))
  }

  def rocPoints(df: DataFrame, scoreCol: Column, labelCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds")
    require(thresholds.distinct.size == thresholds.size,
      "duplicate thresholds")
    val spark = df.sparkSession
    val base = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
    val aggs =
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__s") >= t && col("__y") === 1, 1L).otherwise(0L))
          .as(s"tp_$i"),
        sum(when(col("__s") >= t && col("__y") === 0, 1L).otherwise(0L))
          .as(s"fp_$i"))
      } ++ Seq(
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col("__y") === 0, 1L).otherwise(0L)).as("n"),
        sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("bad"))
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    require(r.getAs[Long]("bad") == 0L,
      s"labels outside {0,1}: ${r.getAs[Long]("bad")}")
    val p = r.getAs[Long]("p"); val n = r.getAs[Long]("n")
    import spark.implicits._
    thresholds.zipWithIndex.map { case (t, i) =>
      val tp = r.getAs[Long](s"tp_$i"); val fp = r.getAs[Long](s"fp_$i")
      val precision =
        if (tp + fp == 0) None else Some(tp.toDouble / (tp + fp))
      val recall = if (p == 0) None else Some(tp.toDouble / p)
      val fpr = if (n == 0) None else Some(fp.toDouble / n)
      val f1 = (precision, recall) match {
        case (Some(pr), Some(rc)) if pr + rc > 0 =>
          Some(2.0 * pr * rc / (pr + rc))
        case _ => None
      }
      (t, tp, fp, p - tp, n - fp, precision, recall, fpr, f1)
    }.toDF("threshold", "tp", "fp", "fn", "tn",
      "precision", "recall", "fpr", "f1")
  }

  /** Reliability diagram data: scores (must be probabilities in [0,1];
    * out-of-range rows fail loudly) bucketed into `bins` equal-width bins
    * (1.0 lands in the last bin), each with its count, exact positive
    * fraction, and decimal-exact mean score. One groupBy over ≤ bins
    * groups. */
  /** Expected calibration error: Σ_b (n_b/N)·|frac_pos_b − mean_score_b|
    * over the [[calibrationBins]] — the one-number miscalibration summary.
    * The weighted sum goes through decimal so bin order cannot perturb
    * the double; returns one row (ece, n). */
  def expectedCalibrationError(df: DataFrame, scoreCol: Column,
      labelCol: Column, bins: Int = 10): DataFrame =
    calibrationBins(df, scoreCol, labelCol, bins)
      .agg(
        (sum((col("n") * abs(col("frac_pos") - col("mean_score")))
          .cast("decimal(38,12)")).cast("double") /
          sum(col("n"))).as("ece"),
        sum(col("n")).as("n"))

  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val base = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
      .select(
        when(col("__s") < 0.0 || col("__s") > 1.0,
          raise_error(concat(lit("score outside [0,1]: "),
            col("__s").cast("string"))))
          .otherwise(least(floor(col("__s") * bins).cast("int"),
            lit(bins - 1))).as("bin"),
        col("__s"), col("__y"))
    base.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("pos"),
        sum(col("__s").cast("decimal(38,12)")).as("__ssum"),
        sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("__bad"))
      .select(
        when(col("__bad") > 0,
          raise_error(lit("labels outside {0,1}"))).otherwise(col("bin"))
          .as("bin"),
        col("n"),
        (col("pos").cast("double") / col("n")).as("frac_pos"),
        round(col("__ssum").cast("double") / col("n"), 6).as("mean_score"))
  }

  /** Filter yield curve: what each candidate threshold on `scoreCol`
    * costs in data volume — per threshold, rows kept (score ≥ t), kept
    * fraction, kept weight (e.g. token counts — what a training-data
    * budget is actually denominated in) and kept-weight fraction. The
    * tuning table behind every quality/langid/contamination cut: pick
    * the knee, not a folk threshold.
    *
    * Same shape as [[rocPoints]]: ONE scan, 2k conditional aggregates
    * folded map-side (counts as longs, weights as exact decimal sums),
    * then a driver-built k-row table — no shuffle beyond the scalar
    * aggregate, no per-threshold rescans. Null scores are excluded; a
    * null weight on a kept row fails loudly (a silently skipped weight
    * would understate the kept mass). Fractions are single double
    * divisions rounded to 6. */
  def yieldCurve(df: DataFrame, scoreCol: Column, weightCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds")
    require(thresholds.distinct.size == thresholds.size,
      "duplicate thresholds")
    val spark = df.sparkSession
    val base = df
      .filter(scoreCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        when(weightCol.isNull,
          raise_error(lit("yieldCurve: null weight on a scored row")))
          .otherwise(weightCol.cast("decimal(38,6)")).as("__w"))
    val aggs =
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__s") >= t, 1L).otherwise(0L)).as(s"n_$i"),
        sum(when(col("__s") >= t, col("__w"))
          .otherwise(lit(0).cast("decimal(38,6)"))).as(s"w_$i"))
      } ++ Seq(
        count(lit(1)).as("total"),
        sum(col("__w")).as("wtotal"))
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    val total = r.getAs[Long]("total")
    val wtotal = Option(r.getAs[java.math.BigDecimal]("wtotal"))
    import spark.implicits._
    thresholds.zipWithIndex.map { case (t, i) =>
      val n = r.getAs[Long](s"n_$i")
      val w = Option(r.getAs[java.math.BigDecimal](s"w_$i"))
        .getOrElse(java.math.BigDecimal.ZERO)
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      (t, n,
        if (total == 0) None else Some(r6(n.toDouble / total)),
        w.doubleValue,
        wtotal.filter(_.signum != 0)
          .map(wt => r6(w.doubleValue / wt.doubleValue)))
    }.toDF("threshold", "n_kept", "frac_kept", "weight_kept", "frac_weight")
      .orderBy("threshold")
  }

  /** Operating-point selection over the FULL distinct-score sweep: the
    * classification threshold maximizing F1 and the one maximizing
    * Youden's J = TPR − FPR (the two standard cut choices after a
    * quality-classifier fit). Candidate thresholds are the distinct
    * scores (a classifier's decision only changes there); cumulative
    * TP/FP per candidate come from ONE window over the distinct-score
    * table — the [[auc]] discipline: bounded by distinct scores, never
    * row count. Argmaxes are struct-max total orders (metric DESC, then
    * threshold DESC — ties take the more conservative cut), computed on
    * doubles both engines derive identically from exact integer counts.
    * One row: (threshold_f1, f1, precision_at_f1, recall_at_f1,
    * threshold_j, youden_j, tpr_at_j, fpr_at_j), metrics rounded to 9.
    * Fails loudly on labels outside {0,1} or single-class data. */
  def bestThreshold(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
    val g = base.groupBy("__s").agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__pos"),
      sum(when(col("__y") === 0, 1L).otherwise(0L)).as("__neg"),
      sum(when(col("__y").isin(0, 1), 0L).otherwise(1L)).as("__bad"))
    val totals = g.agg(sum("__pos").as("__p"), sum("__neg").as("__n"),
      sum("__bad").as("__b")).head()
    require(totals.getAs[Long]("__b") == 0L,
      s"labels outside {0,1}: ${totals.getAs[Long]("__b")}")
    val p = totals.getAs[Long]("__p"); val n = totals.getAs[Long]("__n")
    require(p > 0 && n > 0,
      s"threshold selection needs both classes (P=$p, N=$n)")
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("__tp", sum(col("__pos")).over(w))
      .withColumn("__fp", sum(col("__neg")).over(w))
    val f1 = lit(2.0) * col("__tp") /
      (col("__tp") + col("__fp") + lit(p)).cast("double")
    val tpr = col("__tp") / lit(p.toDouble)
    val fpr = col("__fp") / lit(n.toDouble)
    val prec = col("__tp") / (col("__tp") + col("__fp")).cast("double")
    cum.agg(
        max(struct(f1.as("m"), col("__s").as("t"), prec.as("p"),
          tpr.as("r"))).as("__bf"),
        max(struct((tpr - fpr).as("m"), col("__s").as("t"),
          tpr.as("r"), fpr.as("f"))).as("__bj"))
      .select(
        col("__bf.t").as("threshold_f1"),
        round(col("__bf.m"), 9).as("f1"),
        round(col("__bf.p"), 9).as("precision_at_f1"),
        round(col("__bf.r"), 9).as("recall_at_f1"),
        col("__bj.t").as("threshold_j"),
        round(col("__bj.m"), 9).as("youden_j"),
        round(col("__bj.r"), 9).as("tpr_at_j"),
        round(col("__bj.f"), 9).as("fpr_at_j"))
  }

  /** Brier score with the Murphy (1973, public) decomposition over
    * distinct forecast values: BS = REL − RES + UNC, where
    * REL = Σ n_p(p − ȳ_p)²/N punishes miscalibration,
    * RES = Σ n_p(ȳ_p − ȳ)²/N rewards discrimination, and
    * UNC = ȳ(1−ȳ) is the base-rate floor. The identity is EXACT when
    * grouped by the forecast value itself (binary y ⇒
    * Σ(p−y)² = Σ_p [n_p p² − 2p·s_p + s_p]) — gates assert it as a free
    * invariant. The score-level companion to [[calibrationBins]]: one
    * number for "how good", three for "why".
    *
    * Scale shape: one groupBy(score) with map-side combine (bounded by
    * distinct forecast values — quantize first on continuous scores,
    * the [[auc]] contract), one broadcast total, decimal term folds.
    * Labels must be 0/1 (loud); null rows excluded. Returns one row
    * (n, brier, reliability, resolution, uncertainty), round-9. */
  def brierDecomposition(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val rows = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__p"),
        labelCol.cast("long").as("__y"))
    val g = rows.groupBy("__p").agg(
      count(lit(1)).as("n_p"), sum(col("__y")).as("s_p"))
    val tot = g.agg(sum(col("n_p")).as("n"), sum(col("s_p")).as("s"),
        min(col("__p")).as("__pmin"), max(col("__p")).as("__pmax"))
      .head()
    val n = tot.getAs[Long]("n")
    require(n > 0, "Brier needs scored rows")
    require(tot.getAs[Double]("__pmin") >= 0.0 &&
      tot.getAs[Double]("__pmax") <= 1.0, "forecasts must sit in [0,1]")
    val yBar = tot.getAs[Long]("s").toDouble / n
    def fold(c: Column) = sum(round(c, 12).cast("decimal(38,14)"))
      .cast("double")
    val ybp = col("s_p").cast("double") / col("n_p")
    g.agg(
        fold(col("__p") * col("__p") * col("n_p")
          - lit(2.0) * col("__p") * col("s_p") + col("s_p")).as("__bs"),
        fold((col("__p") - ybp) * (col("__p") - ybp) * col("n_p"))
          .as("__rel"),
        fold((ybp - lit(yBar)) * (ybp - lit(yBar)) * col("n_p"))
          .as("__res"))
      .select(lit(n).as("n"),
        round(col("__bs") / n, 9).as("brier"),
        round(col("__rel") / n, 9).as("reliability"),
        round(col("__res") / n, 9).as("resolution"),
        lit(java.math.BigDecimal.valueOf(yBar * (1.0 - yBar))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
          .as("uncertainty"))
  }

  /** Spiegelhalter's calibration z-test (Spiegelhalter 1986, public):
    * the SIGNIFICANCE companion to [[expectedCalibrationError]]'s
    * magnitude — under perfect calibration Σ(y−p)(1−2p) has mean 0 and
    * variance Σ(1−2p)²p(1−p), so z = num/√var is a proper test, no
    * binning choices to argue about. ECE says how big the gap is,
    * Spiegelhalter says whether it's distinguishable from sampling
    * noise.
    *
    * ONE aggregation (two round-12 decimal term folds + bounds checks);
    * z is one double division, round-6. Forecasts must sit in [0,1] and
    * labels in {0,1} (loud). Returns (n, z, p_value); z is null when
    * every forecast is 0 or 1 exactly (zero variance — nothing to
    * test); the two-sided normal p is library-only. */
  def spiegelhalterZ(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val rows = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("p"),
        labelCol.cast("double").as("y"))
    def fold12(c: Column) =
      sum(round(c, 12).cast("decimal(38,14)")).cast("double")
    val r = rows.agg(
        count(lit(1)).as("n"),
        min(col("p")).as("pmin"), max(col("p")).as("pmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"),
        fold12((col("y") - col("p")) * (lit(1.0) - lit(2.0) * col("p")))
          .as("num"),
        fold12((lit(1.0) - lit(2.0) * col("p"))
          * (lit(1.0) - lit(2.0) * col("p")) * col("p")
          * (lit(1.0) - col("p"))).as("den2"))
      .head()
    val n = r.getAs[Long]("n")
    require(n > 0, "Spiegelhalter needs scored rows")
    require(r.getAs[Double]("pmin") >= 0.0 && r.getAs[Double]("pmax") <= 1.0,
      "forecasts must sit in [0,1]")
    require(r.getAs[Double]("ymin") >= 0.0 && r.getAs[Double]("ymax") <= 1.0
      && r.getAs[Double]("ymin") % 1.0 == 0.0
      && r.getAs[Double]("ymax") % 1.0 == 0.0, "labels must be 0/1")
    val den2 = r.getAs[Double]("den2")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    if (den2 <= 0.0) {
      Seq((n, Option.empty[Double], Option.empty[Double]))
        .toDF("n", "z", "p_value")
    } else {
      val z = r.getAs[Double]("num") / math.sqrt(den2)
      val p = 2.0 * (1.0 -
        new org.apache.commons.math3.distribution.NormalDistribution(0, 1)
          .cumulativeProbability(math.abs(z)))
      Seq((n, Some(r6(z)), Some(r6(p)))).toDF("n", "z", "p_value")
    }
  }

  /** Matthews correlation coefficient at a fixed threshold (Matthews
    * 1975, public) — the single-number confusion summary that stays
    * honest under class imbalance where accuracy and even F1 mislead:
    * MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn)).
    * Predicted positive ⇔ score > threshold.
    *
    * One four-cell aggregation; the products run in double (each cell ≤
    * n, so tp·tn reaches n² — past any integer at corpus scale, and the
    * oracle's CAST-then-multiply matches the same rounding). Returns one
    * row (tp, fp, fn, tn, mcc) with mcc round-6, null when any marginal
    * is zero (the statistic is undefined — a degenerate classifier). */
  def mccAt(df: DataFrame, scoreCol: Column, labelCol: Column,
      threshold: Double): DataFrame = {
    val pred = scoreCol > lit(threshold)
    val y = labelCol.cast("long")
    val r = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .agg(
        sum(when(pred && y === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && y === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && y === 1L, 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && y === 0L, 1L).otherwise(0L)).as("tn"),
        min(y).as("__ymin"), max(y).as("__ymax"))
      .head()
    require(r.getAs[Long]("__ymin") >= 0L && r.getAs[Long]("__ymax") <= 1L,
      "labels must be 0/1")
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val den = (tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn)
    val mcc: Option[Double] =
      if (den <= 0.0) None
      else Some(java.math.BigDecimal.valueOf(
          (tp.toDouble * tn - fp.toDouble * fn) / math.sqrt(den))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    val spark = df.sparkSession
    import spark.implicits._
    Seq((tp, fp, fn, tn, mcc)).toDF("tp", "fp", "fn", "tn", "mcc")
  }

  /** Decile lift & cumulative-gains table — the marketing/model-triage
    * view of a scored population: bucket rows by score quantile (bucket
    * 1 = highest scores), and per bucket report the positive rate, the
    * lift over the base rate, and the cumulative capture ("the top 20%
    * of scores holds X% of all positives"). The business-facing
    * companion to [[auc]]: AUC says *whether* the score ranks, the
    * gains table says *how much of the tail you can skip*.
    *
    * Bucket boundaries are the (k/bins)-quantile thresholds (round-6,
    * the t17 parity recipe) broadcast back — bucket =
    * bins − Σ(score > t_k), so heavy score ties MERGE buckets (a bucket
    * with no rows between two thresholds simply doesn't appear) rather
    * than splitting a tied value across buckets nondeterministically.
    *
    * Scale shape: one quantile aggregate + one groupBy(bucket) with
    * map-side combine; the cumulative sweep is a window over the
    * ≤`bins`-row bucket table (bounded by contract). Labels must be
    * 0/1 (loud otherwise, same contract as [[auc]]); null score or
    * label rows are excluded. All ratios are single double divisions
    * of exact longs, rounded to 9. */
  def liftTable(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000]: $bins")
    val rows = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("long").as("__y"))
    val thAggs = (1 until bins).map(k =>
      round(percentile(col("__s"), lit(k.toDouble / bins)), 6)
        .as(s"__t$k")) ++ Seq(
      min(col("__y")).as("__ymin"), max(col("__y")).as("__ymax"),
      count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    val th = rows.agg(thAggs.head, thAggs.tail: _*).head()
    require(th.getAs[Long]("__n") > 0, "liftTable needs scored rows")
    require(th.getAs[Long]("__ymin") >= 0L && th.getAs[Long]("__ymax") <= 1L,
      "labels must be 0/1")
    val totalN = th.getAs[Long]("__n")
    val totalPos = th.getAs[Long]("__pos")
    require(totalPos > 0L, "liftTable needs at least one positive label")
    val bucket = (1 until bins)
      .map(k => (col("__s") > lit(th.getAs[Double](s"__t$k"))).cast("int"))
      .reduce(_ + _)
    val perBucket = rows
      .select((lit(bins) - bucket).as("bucket"), col("__y"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    perBucket
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 9).as("pos_rate"),
        round((col("n_pos").cast("double") / col("n")) /
          (lit(totalPos.toDouble) / lit(totalN.toDouble)), 9).as("lift"),
        round(col("cum_pos").cast("double") / lit(totalPos.toDouble), 9)
          .as("cum_capture"),
        round(col("cum_n").cast("double") / lit(totalN.toDouble), 9)
          .as("cum_frac"))
      .orderBy("bucket")
  }
}
