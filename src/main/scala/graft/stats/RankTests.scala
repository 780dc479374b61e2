package graft.stats

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
  * location test that [[Anova.pairwiseTTests]]' t-test cannot replace
  * when the metric is skewed (latency, spend, token counts — every
  * heavy-tailed pipeline metric): U counts discordant pairs, so it is
  * invariant to any monotone transform and immune to outliers that
  * dominate a mean.
  *
  * Distributed shape: one per-value count aggregation per arm
  * (map-side combined), ONE distributed range-partitioned sort of the
  * distinct-value table, then per-partition running sums with broadcast
  * partition offsets — the parallel-scan idiom shared with
  * [[Drift.ksTwoSample]]; NO unpartitioned window, no data-sized
  * driver state (driver traffic is per-partition scalars).
  *
  * Exactness: 2·U is an exact integer (ties contribute the integer
  * ca·cb rather than half-pairs), accumulated in BigDecimal — n_a·n_b
  * overflows a long at corpus scale. The z statistic (tie-corrected
  * variance, 0.5 continuity correction toward the mean) is fixed
  * double arithmetic over those integers, so a SQL oracle replays it
  * bit-for-bit; only the normal-CDF p-value is library-only (the
  * established z-test convention: asserted sane in-gate, excluded from
  * the hashed projection). */
object RankTests {

  /** One row: n_a, n_b, u_a, u_b, tie_groups, z, p_value. `armCol`
    * must be boolean (true = arm A); null arms and null values are
    * excluded. Fails loudly on an empty arm. */
  def mannWhitneyU(df: DataFrame, armCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(armCol.as("arm"), valueCol.cast("double").as("v"))
      .filter(col("arm").isNotNull && col("v").isNotNull && !isnan(col("v")))
      .groupBy("v").agg(
        sum(when(col("arm"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("arm"), 1L).otherwise(0L)).as("cb"))
      .as[(Double, Long, Long)].rdd
      .sortBy(_._1)
    counts.cache()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        var sa = 0L; var sb = 0L
        it.foreach { t => sa += t._2; sb += t._3 }
        Iterator((i, sa, sb))
      }.collect().sortBy(_._1)
      val offA = partTotals.map(_._2).scanLeft(0L)(_ + _)
      val offB = partTotals.map(_._3).scanLeft(0L)(_ + _)
      val (nA, nB) = (offA.last, offB.last)
      require(nA > 0 && nB > 0,
        s"Mann-Whitney needs both arms non-empty, got nA=$nA nB=$nB")
      // per partition: Σ 2·ca·cbBelow + ca·cb (2U_A pair count, ties
      // half) and Σ t³−t for the tie-corrected variance
      val partSums = counts.mapPartitionsWithIndex { (i, it) =>
        var cbBelow = java.math.BigDecimal.valueOf(offB(i))
        var twoU = java.math.BigDecimal.ZERO
        var tie = java.math.BigDecimal.ZERO
        it.foreach { case (_, ca, cb) =>
          val bca = java.math.BigDecimal.valueOf(ca)
          val bcb = java.math.BigDecimal.valueOf(cb)
          twoU = twoU.add(bca.multiply(cbBelow.add(cbBelow).add(bcb)))
          val t = java.math.BigDecimal.valueOf(ca + cb)
          tie = tie.add(t.multiply(t).multiply(t).subtract(t))
          cbBelow = cbBelow.add(bcb)
        }
        Iterator((twoU, tie))
      }.collect()
      val twoUA = partSums.map(_._1)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val tieSum = partSums.map(_._2)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val uA = twoUA.doubleValue / 2.0
      val prod = nA.toDouble * nB
      val n = nA + nB
      val uB = prod - uA
      val mu = prod / 2.0
      // Lehmann tie-corrected variance; continuity correction shrinks
      // |U - mu| by 0.5 (the scipy 'asymptotic' convention)
      val sigma2 = prod / 12.0 *
        ((n + 1).toDouble - tieSum.doubleValue / (n.toDouble * (n - 1)))
      require(sigma2 > 0.0,
        "all values tied — rank-sum geometry degenerate; nothing to test")
      val diff = uA - mu
      val cc = math.signum(diff) * 0.5
      val z = (diff - cc) / math.sqrt(sigma2)
      val p = 2.0 * (1.0 -
        new NormalDistribution(0.0, 1.0).cumulativeProbability(math.abs(z)))
      Seq((nA, nB, uA, uB, round6(z), round6(math.min(p, 1.0))))
        .toDF("n_a", "n_b", "u_a", "u_b", "z", "p_value")
    } finally counts.unpersist()
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
}
