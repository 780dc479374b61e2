package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus concentration report — is the corpus dominated by a handful of
  * domains/sources? One row of the standard inequality measures over a
  * key's weight shares (weight = rows, tokens, bytes — whatever the
  * budget is denominated in): top-1 and top-k shares, the Herfindahl–
  * Hirschman index Σ sᵢ², Shannon entropy −Σ sᵢ ln sᵢ (plus its
  * normalized form entropy/ln n), and the Gini coefficient
  * 2·Σ i·w₍ᵢ₎/(n·W) − (n+1)/n over ascending weights. The curation
  * screen next to [[graft.ops.Mixture]]'s reweighting: a crawl where one
  * registrar is half the mass needs capping before any mixing math.
  *
  * Scale shape: one groupBy to the key table, then (a) one aggregate for
  * HHI/entropy with the total broadcast, (b) a top-k driver take, and
  * (c) the Gini rank-weight sum via the distributed ascending sort +
  * per-partition BigDecimal partial sums with broadcast offsets (the
  * partition-offset parallel scan — key tables are web-scale too; no
  * global window). Tie order cannot perturb anything: a tie group's
  * Σ i·w is permutation-invariant because the w's are equal, and a
  * boundary tie swaps equal weights in and out of the top-k share.
  *
  * Engine-parity: shares and their entropy/HHI terms round to 12 and
  * fold in decimal; the rank-weight sum is exact integer·integer in
  * BigDecimal; outputs round to 6.
  */
object Concentration {

  /** One-row report: (n_keys, total_weight, top1_share, topk_share,
    * hhi, entropy, entropy_norm, gini) for non-null keys with positive
    * weight totals. Fails loudly on an empty or non-positive-weight
    * input. */
  def report(df: DataFrame, keyCols: Seq[String], weightCol: Column,
      topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .filter(keyCols.map(c => col(c).isNotNull).reduce(_ && _) &&
        weightCol.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(weightCol.cast("long")).as("w"))
      .filter(col("w") > 0)
      .select(col("w")).as[Long].rdd
      .sortBy(identity)
    keyed.cache()
    try {
      val partStats = keyed.mapPartitionsWithIndex { (i, it) =>
        var n = 0L; var s = java.math.BigDecimal.ZERO
        it.foreach { w =>
          n += 1
          s = s.add(java.math.BigDecimal.valueOf(w))
        }
        Iterator((i, n, s))
      }.collect().sortBy(_._1)
      val nKeys = partStats.map(_._2).sum
      require(nKeys > 0, "concentration report over an empty key set")
      val total = partStats.map(_._3)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val offsets = partStats.map(_._2).scanLeft(0L)(_ + _)
      // Σ (ascending rank · weight), exact
      val rankWeight = keyed.mapPartitionsWithIndex { (i, it) =>
        var rank = offsets(i)
        var s = java.math.BigDecimal.ZERO
        it.foreach { w =>
          rank += 1
          s = s.add(java.math.BigDecimal.valueOf(rank)
            .multiply(java.math.BigDecimal.valueOf(w)))
        }
        Iterator(s)
      }.collect().foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val topW = keyed.top(topK).map(java.math.BigDecimal.valueOf)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val top1 = keyed.top(1).headOption
        .map(java.math.BigDecimal.valueOf)
        .getOrElse(java.math.BigDecimal.ZERO)
      val totD = total.doubleValue
      // rounded-12 share terms, decimal folds — identical in any engine
      var hhi = java.math.BigDecimal.ZERO
      var ent = java.math.BigDecimal.ZERO
      keyed.mapPartitions { it =>
        var h = java.math.BigDecimal.ZERO
        var e = java.math.BigDecimal.ZERO
        it.foreach { w =>
          val s = w.toDouble / totD
          h = h.add(java.math.BigDecimal.valueOf(s * s)
            .setScale(12, java.math.RoundingMode.HALF_UP))
          e = e.add(java.math.BigDecimal.valueOf(-s * math.log(s))
            .setScale(12, java.math.RoundingMode.HALF_UP))
        }
        Iterator((h, e))
      }.collect().foreach { case (h, e) => hhi = hhi.add(h); ent = ent.add(e) }
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val gini = 2.0 * rankWeight.doubleValue / (nKeys.toDouble * totD) -
        (nKeys + 1).toDouble / nKeys
      Seq((nKeys, total.longValueExact, r6(top1.doubleValue / totD),
          r6(topW.doubleValue / totD), r6(hhi.doubleValue),
          r6(ent.doubleValue),
          if (nKeys == 1L) 0.0 else r6(ent.doubleValue / math.log(nKeys.toDouble)),
          r6(gini)))
        .toDF("n_keys", "total_weight", "top1_share", "topk_share",
          "hhi", "entropy", "entropy_norm", "gini")
    } finally keyed.unpersist(blocking = false)
  }

  /** Lorenz curve at quantile buckets (Lorenz 1905, public) — the
    * CURVE behind [[report]]'s scalar Gini: per ascending value decile,
    * the cumulative population share vs the cumulative value share
    * ("the bottom 50 % of line items carry X % of the revenue"). The
    * shape tells you WHERE the inequality lives — a scalar can't.
    *
    * Same mechanics as the lift table: round-6 quantile fences
    * broadcast, bucket = 1 + Σ(v > t) (ties merge into the lower
    * bucket), one map-side-combined groupBy, a cumulative window over
    * the ≤`bins`-row bucket table (bounded by contract). Values must be
    * non-negative (a Lorenz share of negative mass is undefined —
    * loud). Returns (bucket, n, cum_pop_frac, cum_value_frac),
    * fractions round-9. */
  def lorenzDeciles(df: DataFrame, valueCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000]: $bins")
    val v = valueCol.cast("double")
    val rows = df.filter(v.isNotNull).select(v.as("__v"))
    val aggs = (1 until bins).map(k =>
      round(percentile(col("__v"), lit(k.toDouble / bins)), 6)
        .as(s"__t$k")) ++ Seq(
      count(lit(1)).as("__n"), min(col("__v")).as("__vmin"),
      sum(round(col("__v"), 9).cast("decimal(38,12)")).cast("double")
        .as("__sv"))
    val t = rows.agg(aggs.head, aggs.tail: _*).head()
    val n = t.getAs[Long]("__n")
    require(n > 0, "Lorenz needs values")
    require(t.getAs[Double]("__vmin") >= 0.0,
      s"negative mass breaks Lorenz shares: ${t.getAs[Double]("__vmin")}")
    val total = t.getAs[Double]("__sv")
    require(total > 0.0, "all-zero mass - no shares to draw")
    val bucket = (1 until bins)
      .map(k => (col("__v") > lit(t.getAs[Double](s"__t$k"))).cast("int"))
      .reduce(_ + _) + 1
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    rows.select(bucket.as("bucket"), col("__v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(round(col("__v"), 9).cast("decimal(38,12)")).as("__bv"))
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cv", sum(col("__bv")).over(w))
      .select(col("bucket"), col("n"),
        round(col("__cn").cast("double") / lit(n.toDouble), 9)
          .as("cum_pop_frac"),
        round(col("__cv").cast("double") / lit(total), 9)
          .as("cum_value_frac"))
      .orderBy("bucket")
  }
}
