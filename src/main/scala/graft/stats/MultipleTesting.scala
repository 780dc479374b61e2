package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Benjamini–Hochberg false-discovery-rate adjustment (Benjamini &
  * Hochberg 1995) — the multiple-testing companion to the engine's
  * per-test p-values ([[Anova.pairwiseTTests]]' Bonferroni is the
  * family-wise bound; BH is what screening pipelines actually act on
  * when m is thousands of feature/segment hypotheses and Bonferroni
  * rejects nothing).
  *
  * q(i) = min_{j ≥ i} (p(j) · m / j) over the p-ascending order, capped
  * at 1 — the step-up rule: rejecting q ≤ α controls FDR at α.
  *
  * Distributed shape: NO unpartitioned window. One distributed
  * range-partitioned sort of (p, tie-break id) DESCENDING, then the
  * running minimum is a partition-offset parallel scan (per-partition
  * minima → driver prefix scan → per-partition sequential min), the
  * idiom shared with [[Drift.ksTwoSample]] and [[Correlation]]'s rank
  * pass. Descending order turns the suffix-min into a forward running
  * min, so one pass suffices. Driver traffic is per-partition scalars.
  *
  * Exactness: rank comes from the total order (p, id) — deterministic
  * in both engines; raw terms p·m/rank and the running min are plain
  * double arithmetic (min never creates new values), and only the
  * final q rounds (9 dp), so a SQL oracle replays every q bit-for-bit.
  *
  * Null p-values pass through with null q (null-in/null-out); p outside
  * [0, 1] fails loudly — silent clamping would fake significance. */
object MultipleTesting {

  /** Adds `outCol` = BH-adjusted q-value. `idCol` breaks p ties into a
    * total order (any unique key); tied p's receive equal q regardless
    * (the suffix-min erases within-tie rank differences). */
  def benjaminiHochberg(df: DataFrame, pCol: String, idCol: String,
      outCol: String = "q_value"): DataFrame = {
    val spark = df.sparkSession
    val p = col(pCol).cast("double")
    val bad = df.filter(p.isNotNull && (p < 0.0 || p > 1.0 || isnan(p)))
    require(bad.isEmpty,
      s"$pCol carries values outside [0, 1] — not p-values; fix upstream")
    val base = df.filter(p.isNotNull)
      .select(col(idCol).cast("string").as("__id"), p.as("__p"))
    val m = base.count()
    if (m == 0L) return df.withColumn(outCol, lit(null).cast("double"))
    // descending (p, id) sort: global position j (0-based) gives the
    // ascending rank m - j, and the suffix-min becomes a forward scan
    val sorted = base.rdd
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy({ case (id, pv) => (-pv, id) },
        ascending = true, numPartitions = base.rdd.getNumPartitions max 1)
    sorted.cache()
    try {
      // pass 1: per-partition (count, min raw term) — raw needs the
      // global rank, so carry the partition's element count to offset
      val partStats = sorted.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.size.toLong))
      }.collect().sortBy(_._1)
      val offsets = partStats.map(_._2).scanLeft(0L)(_ + _)
      val mins = sorted.mapPartitionsWithIndex { (i, it) =>
        var j = offsets(i); var best = Double.PositiveInfinity
        it.foreach { case (_, pv) =>
          val rank = m - j
          val raw = pv * m / rank
          if (raw < best) best = raw
          j += 1
        }
        Iterator((i, best))
      }.collect().sortBy(_._1).map(_._2)
      val prefixMin = mins.scanLeft(Double.PositiveInfinity)(math.min)
      // pass 2: sequential running min within each partition, seeded by
      // the minimum of every earlier (higher-p) partition
      val qRows = sorted.mapPartitionsWithIndex { (i, it) =>
        var j = offsets(i); var run = prefixMin(i)
        it.map { case (id, pv) =>
          val rank = m - j
          val raw = pv * m / rank
          if (raw < run) run = raw
          j += 1
          Row(id, MultipleTesting.r9(math.min(run, 1.0)))
        }
      }
      val qDf = spark.createDataFrame(qRows, StructType(Seq(
        StructField("__id", org.apache.spark.sql.types.StringType),
        StructField("__q", DoubleType))))
      df.join(qDf, col(idCol).cast("string") === col("__id"), "left")
        .withColumn(outCol, col("__q"))
        .drop("__id", "__q")
    } finally sorted.unpersist()
  }

  /** Driver-side BH for the bounded pairwise-test family: q-values in
    * input order. Shares the step-up arithmetic with the distributed
    * path (spec-pinned against it). */
  def qValues(ps: Seq[Double]): Seq[Double] = {
    require(ps.forall(p => !p.isNaN && p >= 0.0 && p <= 1.0),
      "p-values must lie in [0, 1]")
    val m = ps.size
    val byP = ps.zipWithIndex.sortBy { case (p, i) => (-p, i) }
    var run = Double.PositiveInfinity
    val q = new Array[Double](m)
    byP.zipWithIndex.foreach { case ((p, orig), j) =>
      val rank = m - j
      val raw = p * m / rank
      if (raw < run) run = raw
      q(orig) = r9(math.min(run, 1.0))
    }
    q.toSeq
  }

  /** HALF_UP decimal rounding — the same convention as Spark's and
    * DuckDB's `round(x, 9)`, so driver- and engine-side q agree; + 0.0
    * canonicalizes IEEE negative zero (the r13 covariance lesson). */
  private[stats] def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
}
