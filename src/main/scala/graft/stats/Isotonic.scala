package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic regression by pool-adjacent-violators (Ayer et al. 1955;
  * Barlow, Bartholomew, Bremner & Brunk 1972 — public), the standard
  * monotone calibration of classifier scores into probabilities
  * (Zadrozny & Elkan 2002): fit the least-squares NON-DECREASING step
  * function of label on score. Complements [[Eval.calibrationBins]]'
  * fixed-width diagnosis with an actual calibration map.
  *
  * Distributed shape: the data pass is ONE hash aggregation to the
  * DISTINCT-SCORE level table (score, n, Σy) — map-side combined, the
  * shuffle is level-count-sized, label sums folded in decimal so the
  * collected table is exact and order-invariant. PAV itself is
  * inherently sequential, so it runs on the driver over the level table
  * under the same loud bounded-collect contract as `Bpe.trainOn`
  * (`maxLevels`, with the fix spelled out in the error: round the score
  * column). Calibration then rides back as a broadcast level→fitted
  * join (seen scores) or an inlined step function (unseen scores) — a
  * narrow map either way, streaming-safe.
  */
object Isotonic {

  /** Fitted monotone step function over the observed score levels.
    * `scores` ascending; `fitted(i)` is the calibrated value for
    * `scores(i)`; `n(i)`/`sumY(i)` the level's support (exact). */
  final case class Model(scores: Array[Double], fitted: Array[Double],
      n: Array[Long], sumY: Array[Double]) {
    require(scores.length == fitted.length)
    /** Step lookup for arbitrary x: the fitted value of the largest
      * level ≤ x (clamped to the first level below the range). */
    def at(x: Double): Double = {
      var lo = 0; var hi = scores.length - 1
      if (x <= scores(0)) return fitted(0)
      if (x >= scores(hi)) return fitted(hi)
      while (lo + 1 < hi) {
        val mid = (lo + hi) >>> 1
        if (scores(mid) <= x) lo = mid else hi = mid
      }
      fitted(lo)
    }
  }

  /** Fit label (0/1 or any bounded numeric) monotone in score. One
    * distributed aggregation; driver PAV over ≤ `maxLevels` distinct
    * scores. Null scores/labels are excluded. */
  def fit(df: DataFrame, scoreCol: Column, labelCol: Column,
      maxLevels: Int = 100000): Model = {
    val levels = df
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("double").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__y"), 9).cast("decimal(38,12)")).as("__sy"))
      .orderBy("__s")
      .limit(maxLevels + 1)
      .collect()
    require(levels.nonEmpty, "cannot fit isotonic regression on no data")
    require(levels.length <= maxLevels,
      s"more than $maxLevels distinct score levels — round the score " +
        "column (calibration needs level statistics, not raw floats) or " +
        "raise maxLevels")
    val s = levels.map(_.getAs[Double]("__s"))
    val n = levels.map(_.getAs[Long]("__n"))
    val sy = levels.map(_.getAs[java.math.BigDecimal]("__sy").doubleValue())
    pav(s, n, sy)
  }

  /** The model as a tiny (score, fitted) DataFrame for broadcast. */
  def levelTable(df: DataFrame, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    model.scores.zip(model.fitted).toSeq.toDF("__cal_s", "__cal_fitted")
  }

  /** Calibrate rows whose scores appeared in the fit: broadcast join on
    * the exact level. Unseen scores get null — use [[calibrateStep]]
    * when the serving distribution can drift off the fit grid. */
  def calibrate(df: DataFrame, scoreCol: Column, model: Model,
      outCol: String = "calibrated"): DataFrame =
    df.join(broadcast(levelTable(df, model)),
        scoreCol.cast("double") === col("__cal_s"), "left")
      .withColumn(outCol, col("__cal_fitted"))
      .drop("__cal_s", "__cal_fitted")

  /** Calibrate arbitrary scores through the inlined step function: the
    * fitted value of the largest level ≤ x (clamped at the ends), as a
    * filter-over-literal-array expression — O(blocks) per row after PAV
    * pooling, which collapses levels sharply on real data; for a model
    * that stayed near `maxLevels` blocks prefer [[calibrate]]'s join. */
  def calibrateStep(df: DataFrame, scoreCol: Column, model: Model,
      outCol: String = "calibrated"): DataFrame = {
    // one literal per block boundary, not per level
    val blocks = model.scores.zip(model.fitted)
      .foldLeft(List.empty[(Double, Double)]) {
        case (acc, (s, f)) =>
          if (acc.nonEmpty && acc.head._2 == f) acc else (s, f) :: acc
      }.reverse
    val arr = array(blocks.map { case (s, f) =>
      struct(lit(s).as("s"), lit(f).as("f"))
    }: _*)
    val x = scoreCol.cast("double")
    val le = filter(arr, b => b.getField("s") <= x)
    val fitted = when(x.isNull, lit(null).cast("double"))
      .when(size(le) === 0, lit(blocks.head._2))
      .otherwise(element_at(le, -1).getField("f"))
    df.withColumn(outCol, fitted)
  }

  /** Per-group PAV — one monotone calibration map PER DOMAIN, the
    * standard fix when a shared scorer runs hot on some sources (a
    * single global map would let the hot domain's bias leak into every
    * other domain's probabilities). ONE distributed aggregation to the
    * (group, score) level table, then driver PAV per group over the
    * collected levels — bounded by `maxTotalLevels` ACROSS groups (the
    * loud contract names the fix: round scores, or calibrate the fat
    * groups individually via [[fit]]). Returns group → [[Model]];
    * groups with a null key are excluded (no domain, no map). */
  def fitByGroup(df: DataFrame, groupCol: Column, scoreCol: Column,
      labelCol: Column, maxTotalLevels: Int = 200000): Map[String, Model] = {
    val levels = df
      .select(groupCol.cast("string").as("__g"),
        scoreCol.cast("double").as("__s"),
        labelCol.cast("double").as("__y"))
      .filter(col("__g").isNotNull && col("__s").isNotNull &&
        col("__y").isNotNull)
      .groupBy("__g", "__s")
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__y"), 9).cast("decimal(38,12)")).as("__sy"))
      .limit(maxTotalLevels + 1)
      .collect()
    require(levels.nonEmpty, "no (group, score) levels to fit")
    require(levels.length <= maxTotalLevels,
      s"more than $maxTotalLevels (group, score) levels — round the " +
        "score column, or fit fat groups individually via fit()")
    levels.groupBy(_.getAs[String]("__g")).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getAs[Double]("__s"))
      val s = sorted.map(_.getAs[Double]("__s"))
      val n = sorted.map(_.getAs[Long]("__n"))
      val sy = sorted.map(
        _.getAs[java.math.BigDecimal]("__sy").doubleValue())
      g -> pav(s, n, sy)
    }
  }

  /** The PAV core shared by [[fit]] and [[fitByGroup]]: block-stack
    * pooling with cross-multiplied mean comparisons (no division until
    * the final block means). */
  private def pav(s: Array[Double], n: Array[Long],
      sy: Array[Double]): Model = {
    val bw = new Array[Double](s.length)
    val bs = new Array[Double](s.length)
    val bEnd = new Array[Int](s.length)
    var top = -1
    var i = 0
    while (i < s.length) {
      top += 1; bw(top) = n(i).toDouble; bs(top) = sy(i); bEnd(top) = i
      while (top > 0 &&
          bs(top - 1) * bw(top) >= bs(top) * bw(top - 1)) {
        bw(top - 1) += bw(top); bs(top - 1) += bs(top)
        bEnd(top - 1) = bEnd(top); top -= 1
      }
      i += 1
    }
    val fitted = new Array[Double](s.length)
    var b = 0; var from = 0
    while (b <= top) {
      val v = bs(b) / bw(b)
      var j = from
      while (j <= bEnd(b)) { fitted(j) = v; j += 1 }
      from = bEnd(b) + 1; b += 1
    }
    Model(s, fitted, n, sy)
  }
}
