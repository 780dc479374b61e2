package graft.stats

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Kruskal–Wallis H (Kruskal & Wallis 1952, public) — the k-group
    * extension of [[mannWhitneyU]]: "do any of these groups differ in
    * location", rank-based, so heavy tails and monotone transforms
    * cannot distort it the way they distort [[Anova.oneWay]]'s F.
    *
    * Distributed shape: one per-(value, group) count aggregation, one
    * distinct-value total aggregation, ONE range-partitioned sort of
    * the distinct-value table with per-partition running sums +
    * broadcast partition offsets (the [[mannWhitneyU]] parallel-scan
    * idiom — NO unpartitioned window over the value domain, which is
    * unbounded for continuous metrics), then a join of the ranked
    * value table back to the (value, group) counts and a group-keyed
    * rollup. Driver state is per-partition scalars plus the
    * group-bounded rank-sum table.
    *
    * Exactness: 2·avgRank(v) = 2·countBelow + t + 1 is an exact
    * integer, so per-group 2·rankSum folds as exact decimal integers;
    * the per-group H terms (R_g²/n_g) are rounded to 6 and summed as
    * decimals in BOTH engines, making H order-invariant and
    * oracle-exact. The tie term Σ(t³−t) folds in decimal (t³ overflows
    * a long once a value repeats ~2M times). Only the χ²(k−1) p-value
    * is library-only (the established convention).
    *
    * Returns one row: (k_groups, n_total, h, h_tied, p_value), h
    * statistics rounded to 6; h_tied = h / (1 − Σ(t³−t)/(n³−n)).
    * Fails loudly with < 2 groups or when every value is tied. */
  /** Shared rank machinery for [[kruskalWallis]] and [[dunnTest]]: the
    * per-(value, group) cell counts → distributed average-rank scan →
    * per-group (n_g, exact 2·rankSum) rollup + the Σ(t³−t) tie sum.
    * One sort, partition-offset prefix scan, NO unpartitioned window;
    * driver receives the group-bounded rollup only. */
  private def groupRankSums(df: DataFrame, grpCol: Column,
      valueCol: Column, what: String):
      (Long, Array[(String, Long, java.math.BigDecimal)],
        java.math.BigDecimal) = {
    val spark = df.sparkSession
    import spark.implicits._
    val cellCounts = df
      .select(grpCol.cast("string").as("g"), valueCol.cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
      .groupBy("v", "g").agg(count(lit(1)).as("c"))
    cellCounts.cache()
    try {
      val totals = cellCounts.groupBy("v")
        .agg(sum(col("c")).as("t"))
        .as[(Double, Long)].rdd.sortBy(_._1)
      totals.cache()
      try {
        val partTotals = totals.mapPartitionsWithIndex { (i, it) =>
          var s = 0L; it.foreach(s += _._2); Iterator((i, s))
        }.collect().sortBy(_._1)
        val off = partTotals.map(_._2).scanLeft(0L)(_ + _)
        val n = off.last
        require(n > 0, s"$what needs at least one non-null value")
        // (v, 2*avgRank as exact long, t) — 2*rank fits a long (≤ 2n+1)
        val ranked = totals.mapPartitionsWithIndex { (i, it) =>
          var below = off(i)
          it.map { case (v, t) =>
            val r = (v, 2L * below + t + 1L, t)
            below += t
            r
          }
        }
        val rankDf = spark.createDataset(ranked).toDF("v", "two_rank", "t")
        // group rollup: n_g and the exact 2·rankSum (decimal — the
        // product c·two_rank is ~2n² and the sum ~2n² per group)
        val perGroup = cellCounts.join(rankDf, "v")
          .groupBy("g").agg(
            sum(col("c")).as("n_g"),
            sum(col("c").cast("decimal(38,0)") * col("two_rank"))
              .as("two_rank_sum"))
          .collect().sortBy(_.getAs[String]("g"))
        require(perGroup.length >= 2,
          s"$what needs >= 2 groups, got ${perGroup.length}")
        val tieSum = rankDf.agg(
          sum((col("t").cast("decimal(38,0)") * col("t") * col("t"))
            - col("t")).as("tie3"))
          .head().getDecimal(0)
        (n,
          perGroup.map(r => (r.getAs[String]("g"), r.getAs[Long]("n_g"),
            r.getAs[java.math.BigDecimal]("two_rank_sum"))),
          tieSum)
      } finally totals.unpersist()
    } finally cellCounts.unpersist()
  }

  def kruskalWallis(df: DataFrame, grpCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, perGroup, tieSum) =
      groupRankSums(df, grpCol, valueCol, "Kruskal-Wallis")
    // Σ (R_g)² / n_g as plain doubles in sorted-group order: the sum
    // has only k terms, so reorder error is ≤ k·ulp — ~1e-11 after
    // the 12/(n(n+1)) scale-down, far inside the round-6 line (a
    // per-term decimal round would be WORSE here: the terms sit at
    // ~n²·n_g magnitude where a 6-decimal round of a double is
    // itself ill-defined)
    val hSum = perGroup.map { case (_, ng, trsDec) =>
      val trs = trsDec.doubleValue
      (trs / 2.0) * (trs / 2.0) / ng
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1.0)) * hSum -
      3.0 * (n + 1.0)
    val nD = n.toDouble
    val corr = 1.0 - tieSum.doubleValue / (nD * nD * nD - nD)
    require(corr > 0.0,
      "all values tied — rank geometry degenerate; nothing to test")
    val hTied = h / corr
    val k = perGroup.length
    val p = 1.0 - new org.apache.commons.math3.distribution
      .ChiSquaredDistribution((k - 1).toDouble)
      .cumulativeProbability(math.max(hTied, 0.0))
    Seq((k.toLong, n, round6(h), round6(hTied), round6(p)))
      .toDF("k_groups", "n_total", "h", "h_tied", "p_value")
  }

  /** Dunn's post-hoc test (Dunn 1964, public): WHICH groups differ,
    * once [[kruskalWallis]] said that some do. For every group pair,
    * z = (R̄_i − R̄_j) / √(σ²·(1/n_i + 1/n_j)) with the tie-corrected
    * rank variance σ² = N(N+1)/12 − Σ(t³−t)/(12(N−1)) — the standard
    * mean-rank comparison on the SAME average ranks the H statistic
    * used (one [[groupRankSums]] pass; pairs are driver arithmetic over
    * the k-bounded rollup). Callers correcting for multiplicity feed
    * the p's to [[MultipleTesting]]'s BH — Dunn's own recommendation.
    *
    * Returns one row per pair (group_a < group_b): (group_a, group_b,
    * n_a, n_b, mean_rank_a, mean_rank_b, z, p_value), ranks and z
    * round-6; the two-sided normal p is library-only. */
  def dunnTest(df: DataFrame, grpCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, perGroup, tieSum) = groupRankSums(df, grpCol, valueCol, "Dunn")
    require(n >= 2, s"Dunn needs >= 2 ranked values, got $n")
    val sVar = n * (n + 1.0) / 12.0 -
      tieSum.doubleValue / (12.0 * (n - 1))
    require(sVar > 0.0,
      "all values tied — rank geometry degenerate; nothing to test")
    val norm = new NormalDistribution(0.0, 1.0)
    val rows = for {
      i <- perGroup.indices; j <- (i + 1) until perGroup.length
    } yield {
      val (ga, na, trsA) = perGroup(i)
      val (gb, nb, trsB) = perGroup(j)
      val ra = trsA.doubleValue / 2.0 / na
      val rb = trsB.doubleValue / 2.0 / nb
      val z = (ra - rb) / math.sqrt(sVar * (1.0 / na + 1.0 / nb))
      val p = 2.0 * (1.0 - norm.cumulativeProbability(math.abs(z)))
      (ga, gb, na, nb, round6(ra), round6(rb), round6(z), round6(p))
    }
    rows.toDF("group_a", "group_b", "n_a", "n_b", "mean_rank_a",
        "mean_rank_b", "z", "p_value")
      .orderBy("group_a", "group_b")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0

  /** Jonckheere–Terpstra trend test (Jonckheere 1954; Terpstra 1952,
    * public): the ORDERED-alternative k-group test — where
    * [[kruskalWallis]] asks "do the groups differ at all", JT asks "do
    * they increase in THIS order" (dose–response, version sequences,
    * quality tiers) and buys real power when the order is known.
    * JT = Σ_{i<j} U_ij over group pairs in the GIVEN order, ties
    * counted half (the Mann–Whitney convention); the z uses the
    * tie-corrected null moments (Hollander & Wolfe eq. 6.19 — exact
    * integer sums over group sizes and tie multiplicities).
    *
    * Distributed shape: the (value, group) cell table pivots to one
    * k-vector row per distinct value (k groups — bounded), ONE
    * distributed sort over values, pass 1 collects per-partition
    * per-group subtotals (k scalars each), a driver scanLeft turns them
    * into entering below-counts, pass 2 accumulates 2·JT per partition
    * in exact BigInt — NO unpartitioned window, driver traffic is k
    * scalars per partition.
    *
    * `groupOrder` fixes the alternative (ascending); groups absent from
    * the data fail loudly. Returns one row (k_groups, n_total, jt2 —
    * the exact integer 2·JT, mean2 = 2·E[JT], z, p_value): z round-6,
    * the normal p library-only. */
  def jonckheereTerpstra(df: DataFrame, grpCol: Column, valueCol: Column,
      groupOrder: Seq[String]): DataFrame = {
    require(groupOrder.size >= 2, "need >= 2 ordered groups")
    require(groupOrder.distinct.size == groupOrder.size,
      s"duplicate group in order: $groupOrder")
    val spark = df.sparkSession
    import spark.implicits._
    val k = groupOrder.size
    val cells = df
      .select(grpCol.cast("string").as("g"), valueCol.cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
      .filter(col("g").isin(groupOrder: _*))
      .groupBy("v", "g").agg(count(lit(1)).as("c"))
    val rows = cells.groupBy("v")
      .agg(map_from_entries(collect_list(struct(col("g"), col("c"))))
        .as("m"))
      .select(col("v"),
        array(groupOrder.map(g =>
          coalesce(col("m").getItem(g), lit(0L))).toIndexedSeq: _*)
          .as("cs"))
      .as[(Double, Array[Long])].rdd
      .sortBy(_._1)
    rows.cache()
    try {
      val partTotals = rows.mapPartitionsWithIndex { (i, it) =>
        val s = Array.ofDim[Long](k)
        it.foreach { case (_, cs) =>
          var j = 0; while (j < k) { s(j) += cs(j); j += 1 }
        }
        Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partTotals.scanLeft(Array.ofDim[Long](k)) { (acc, p) =>
        acc.zip(p).map { case (a, b) => a + b }
      }
      val nG = offsets.last
      groupOrder.zip(nG).foreach { case (g, n) =>
        require(n > 0, s"ordered group '$g' has no ranked values")
      }
      val n = nG.sum
      val offB = rows.sparkContext.broadcast(offsets)
      // pass 2: 2·JT per partition — 2·(below_i·c_j) + c_i·c_j over
      // ordered pairs i<j, exact in BigInt
      val jt2 = rows.mapPartitionsWithIndex { (i, it) =>
        val below = offB.value(i).clone()
        var acc = BigInt(0)
        it.foreach { case (_, cs) =>
          var jj = 1
          while (jj < k) {
            if (cs(jj) != 0L) {
              var ii = 0
              while (ii < jj) {
                acc += BigInt(2) * BigInt(below(ii)) * cs(jj) +
                  BigInt(cs(ii)) * cs(jj)
                ii += 1
              }
            }
            jj += 1
          }
          var m = 0; while (m < k) { below(m) += cs(m); m += 1 }
        }
        Iterator(acc)
      }.collect().sum
      // tie multiplicities for the corrected variance
      val tieRow = cells.groupBy("v").agg(sum(col("c")).as("t"))
        .agg(
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1)
            * (lit(2) * col("t") + 5)).as("t25"),
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1)
            * (col("t") - 2)).as("t3"),
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1)).as("t2"))
        .head()
      def dec(i: Int) = BigInt(tieRow.getDecimal(i).toBigInteger)
      val (t25, t3, t2) = (dec(0), dec(1), dec(2))
      def over(f: BigInt => BigInt) = nG.map(x => f(BigInt(x))).sum
      val nI = BigInt(n)
      val g25 = over(x => x * (x - 1) * (2 * x + 5))
      val g3 = over(x => x * (x - 1) * (x - 2))
      val g2 = over(x => x * (x - 1))
      // 2·E[JT] = Σ_{i<j} 2·n_i·n_j = N² − Σ n_g² (exact, always even /2)
      val mean2 = (nI * nI - over(x => x * x)) / 2
      // exact integer numerators, ONE double division each — the same
      // trees a SQL oracle replays (BigDecimal rational division would
      // round under a MathContext no SQL engine shares)
      val a = (nI * (n - 1) * (2 * n + 5) - g25 - t25).toDouble / 72.0
      val b = (g3 * t3).toDouble / (36.0 * n * (n - 1.0) * (n - 2.0))
      val c = (g2 * t2).toDouble / (8.0 * n * (n - 1.0))
      val varJt = a + b + c
      val (z, p): (Option[Double], Option[Double]) =
        if (varJt <= 0.0) (None, None)
        else {
          val zv = (jt2 - mean2).toDouble / 2.0 / math.sqrt(varJt)
          (Some(round6(zv)),
            Some(round6(2.0 * (1.0 - new NormalDistribution(0.0, 1.0)
              .cumulativeProbability(math.abs(zv))))))
        }
      require(jt2.isValidLong && mean2.isValidLong,
        s"2JT=$jt2 exceeds long range - emit as decimal past ~3e9 rows")
      Seq((k.toLong, n, jt2.toLong, mean2.toLong, z, p))
        .toDF("k_groups", "n_total", "jt2", "mean2", "z", "p_value")
    } finally rows.unpersist(blocking = false)
  }

  /** Wald–Wolfowitz runs test (Wald & Wolfowitz 1940, public) for
    * randomness of an ordered series: dichotomize on the round-6 median
    * (values equal to it are excluded — the standard treatment), count
    * the runs of consecutive same-sign values, and compare against the
    * exact run-count moments. Too FEW runs = positive serial dependence
    * (the Durbin–Watson story without a model); too MANY = alternation.
    *
    * Distributed shape: one median aggregate, then ONE distributed sort
    * of the (t, sign) pairs with per-partition run counting — sign
    * changes inside a partition count locally, partition boundaries
    * contribute via the collected (first, last) sign scalars (the
    * parallel-scan idiom of [[mannWhitneyU]]; NO unpartitioned window,
    * driver traffic is per-partition scalars). Runs span calendar gaps:
    * the sequence is the SORTED remaining values, matching the test's
    * definition on an ordered sample.
    *
    * Exactness: run/above/below counts are exact integers; E[R] and
    * Var[R] are the same double arithmetic in both engines; z rounds to
    * 6. Returns one row (n, n_above, n_below, n_runs, expected_runs, z,
    * p_value): z and p are null when either side is empty (every value
    * on one side of the median); the normal p is library-only. */
  def runsTest(series: DataFrame, tCol: Column, yCol: Column): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val vals = series.filter(tCol.isNotNull && yCol.isNotNull)
      .select(tCol.cast("long").as("t"), yCol.cast("double").as("y"))
    val medRow = vals.agg(round(percentile(col("y"), lit(0.5)), 6)).head()
    require(!medRow.isNullAt(0),
      "runs test needs at least one non-null (t, y) pair")
    val med = medRow.getDouble(0)
    val signed = vals.filter(col("y") =!= lit(med))
      .select(col("t"), (col("y") > lit(med)).as("up"))
      .as[(Long, Boolean)].rdd.sortBy(_._1)
    val parts = signed.mapPartitionsWithIndex { (i, it) =>
      var first: java.lang.Boolean = null
      var prev: java.lang.Boolean = null
      var changes = 0L; var n = 0L; var nUp = 0L
      it.foreach { case (_, up) =>
        if (first == null) first = up
        else if (prev.booleanValue != up) changes += 1
        prev = up; n += 1; if (up) nUp += 1
      }
      Iterator((i, first, prev, changes, n, nUp))
    }.collect().sortBy(_._1).filter(_._5 > 0)
    val n = parts.map(_._5).sum
    require(n > 0, "runs test needs values off the median")
    val n1 = parts.map(_._6).sum
    val n2 = n - n1
    val within = parts.map(_._4).sum
    val boundary = parts.sliding(2).count {
      case Array(a, b) => a._3.booleanValue != b._2.booleanValue
      case _ => false
    }
    val r = within + boundary + 1
    val result: (Option[Double], Option[Double], Option[Double]) =
      if (n1 == 0L || n2 == 0L || n < 2) (None, None, None)
      else {
        val twoP = 2.0 * n1 * n2
        val er = 1 + twoP / n
        val varR = twoP * (twoP - n) / (n.toDouble * n * (n - 1))
        if (varR <= 0.0) (Some(round6(er)), None, None)
        else {
          val z = (r - er) / math.sqrt(varR)
          val p = 2.0 * (1.0 - new NormalDistribution(0.0, 1.0)
            .cumulativeProbability(math.abs(z)))
          (Some(round6(er)), Some(round6(z)), Some(round6(p)))
        }
      }
    Seq((n, n1, n2, r, result._1, result._2, result._3))
      .toDF("n", "n_above", "n_below", "n_runs", "expected_runs", "z",
        "p_value")
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945, public) — the PAIRED
    * companion to [[mannWhitneyU]]: same rows, two measurements
    * (before/after, metric A/metric B), "is the median difference
    * zero". Zero differences are discarded (the Wilcoxon zero-method),
    * |d| is ranked with average ranks, and W⁺ sums the ranks of the
    * positive differences.
    *
    * Distributed shape: one per-|d| count aggregation (map-side
    * combined), ONE range-partitioned sort of the distinct-|d| table,
    * per-partition running sums with broadcast partition offsets — the
    * [[mannWhitneyU]] parallel-scan idiom; NO unpartitioned window,
    * driver traffic is per-partition scalars.
    *
    * Exactness: 2·avgRank(|d|) = 2·below + t + 1 is an exact integer,
    * so 2·W⁺ folds exactly in BigDecimal (rank sums reach ~n² — past a
    * long at corpus scale). z uses the tie-corrected variance
    * n(n+1)(2n+1)/24 − Σ(t³−t)/48 with a 0.5 continuity correction
    * toward the mean (the [[mannWhitneyU]] convention); fixed double
    * arithmetic over exact integers, so a SQL oracle replays it. Only
    * the normal p is library-only. Returns one row (n_nonzero, w_plus,
    * w_minus, z, p_value); z round-6. */
  def wilcoxonSignedRank(
      df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(xCol.cast("double").as("x"), yCol.cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
      .select((col("x") - col("y")).as("d"))
      .filter(col("d") =!= 0.0)
      .groupBy(abs(col("d")).as("ad"))
      .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("cpos"),
        count(lit(1)).as("t"))
      .as[(Double, Long, Long)].rdd
      .sortBy(_._1)
    counts.cache()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator((i, s))
      }.collect().sortBy(_._1)
      val off = partTotals.map(_._2).scanLeft(0L)(_ + _)
      val n = off.last
      require(n > 0,
        "signed-rank needs at least one non-zero paired difference")
      val partSums = counts.mapPartitionsWithIndex { (i, it) =>
        var below = java.math.BigDecimal.valueOf(off(i))
        var twoW = java.math.BigDecimal.ZERO
        var tie = java.math.BigDecimal.ZERO
        it.foreach { case (_, cpos, t) =>
          val bt = java.math.BigDecimal.valueOf(t)
          twoW = twoW.add(java.math.BigDecimal.valueOf(cpos)
            .multiply(below.add(below).add(bt)
              .add(java.math.BigDecimal.ONE)))
          tie = tie.add(bt.multiply(bt).multiply(bt).subtract(bt))
          below = below.add(bt)
        }
        Iterator((twoW, tie))
      }.collect()
      val twoW = partSums.map(_._1)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val tieSum = partSums.map(_._2)
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val wPlus = twoW.doubleValue / 2.0
      val total = n.toDouble * (n + 1) / 2.0
      val wMinus = total - wPlus
      val mu = total / 2.0
      val sigma2 = n.toDouble * (n + 1) * (2.0 * n + 1) / 24.0 -
        tieSum.doubleValue / 48.0
      require(sigma2 > 0.0,
        "all |d| tied into one group — signed-rank geometry degenerate")
      val diff = wPlus - mu
      val cc = math.signum(diff) * 0.5
      val z = (diff - cc) / math.sqrt(sigma2)
      val p = 2.0 * (1.0 -
        new NormalDistribution(0.0, 1.0)
          .cumulativeProbability(math.abs(z)))
      Seq((n, wPlus, wMinus, round6(z), round6(math.min(p, 1.0))))
        .toDF("n_nonzero", "w_plus", "w_minus", "z", "p_value")
    } finally counts.unpersist()
  }

  /** Cliff's delta (Cliff 1993, public) — the EFFECT SIZE companion to
    * [[mannWhitneyU]]'s significance: δ = P(X>Y) − P(X<Y) ∈ [−1, 1],
    * the probability a random A-arm value beats a random B-arm value
    * minus the reverse. A z-test on 60M rows flags a 0.1% shift as
    * "significant"; δ says whether anyone should care. Derived exactly
    * from the same pair count the U statistic holds: δ = 2U_A/(n_A·n_B)
    * − 1 (ties count half in U, i.e. zero in δ) — ONE [[mannWhitneyU]]
    * pass, no extra shuffle. Magnitude labels use the Romano et al.
    * 2006 thresholds (0.147 / 0.33 / 0.474) applied to the ROUNDED δ so
    * both engines label identically. Returns one row (n_a, n_b, delta,
    * magnitude); δ round-6. */
  def cliffsDelta(
      df: DataFrame, armCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val u = mannWhitneyU(df, armCol, valueCol).head()
    val nA = u.getAs[Long]("n_a"); val nB = u.getAs[Long]("n_b")
    val delta = round6(2.0 * u.getAs[Double]("u_a") /
      (nA.toDouble * nB) - 1.0)
    val a = math.abs(delta)
    val mag =
      if (a < 0.147) "negligible"
      else if (a < 0.33) "small"
      else if (a < 0.474) "medium"
      else "large"
    Seq((nA, nB, delta, mag)).toDF("n_a", "n_b", "delta", "magnitude")
  }

  /** Hodges–Lehmann two-sample shift estimate (Hodges & Lehmann 1963,
    * public): the median of ALL n_A·n_B pairwise differences x_i − y_j
    * — the robust "how big is the shift" point estimate that pairs with
    * [[mannWhitneyU]]'s "is there one" (it estimates the Δ the rank-sum
    * test inverts). Immune to outliers that drag a difference-of-means.
    *
    * Distributed shape: the pair multiset is NEVER materialized
    * row-wise — each arm collapses to its distinct-value count table
    * (one map-side-combined aggregation each), the difference
    * distribution is the k_A×k_B cross of those tables with weight
    * c_a·c_b (broadcast cross, loudly capped at `maxCells`), and the
    * weighted median comes from one cumulative sweep over the bounded
    * distinct-difference table (the bins-bounded-window convention).
    * Weights and the total n_A·n_B fold as exact decimals (the product
    * overflows a long at corpus scale).
    *
    * Weighted median: positions 1..T over ascending differences; T odd
    * → the value at (T+1)/2, T even → the mean of positions T/2 and
    * T/2+1. Returns one row (n_a, n_b, n_diff_cells, hl_shift);
    * hl_shift round-6. */
  def hodgesLehmannShift(
      df: DataFrame, armCol: Column, valueCol: Column,
      maxCells: Long = 4000000L): DataFrame = {
    val base = df
      .select(armCol.as("arm"), valueCol.cast("double").as("v"))
      .filter(col("arm").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val da = base.filter(col("arm")).groupBy(col("v").as("va"))
      .agg(count(lit(1)).as("ca"))
    val db = base.filter(!col("arm")).groupBy(col("v").as("vb"))
      .agg(count(lit(1)).as("cb"))
    val ka = da.count(); val kb = db.count()
    require(ka > 0 && kb > 0,
      s"Hodges-Lehmann needs both arms non-empty, got ka=$ka kb=$kb")
    require(ka * kb <= maxCells,
      s"distinct-value cross $ka x $kb exceeds maxCells=$maxCells - " +
        "quantize the metric first (equalFreqBins) or raise the cap")
    val cells = da.crossJoin(broadcast(db))
      .groupBy((col("va") - col("vb")).as("diff"))
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("w"))
    val tot = cells.agg(sum(col("w")).as("t"),
      count(lit(1)).as("n_cells"))
    // bounded sweep: the window runs over ≤ maxCells distinct diffs
    val w = Window.orderBy(col("diff"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = cells.withColumn("cum", sum(col("w")).over(w))
      .crossJoin(broadcast(tot))
    val k1 = floor((col("t") + lit(1)) / lit(2))
    val k2 = floor(col("t") / lit(2)) + lit(1)
    val res = swept.agg(
      min(when(col("cum") >= k1, col("diff"))).as("lo"),
      min(when(col("cum") >= k2, col("diff"))).as("hi"),
      max(col("n_cells")).as("n_diff_cells"))
      .select(col("n_diff_cells"),
        round((col("lo") + col("hi")) / 2.0, 6).as("hl_shift"))
    val nA = da.agg(sum(col("ca"))).head().getLong(0)
    val nB = db.agg(sum(col("cb"))).head().getLong(0)
    res.select(lit(nA).as("n_a"), lit(nB).as("n_b"),
      col("n_diff_cells"), col("hl_shift"))
  }

  /** Brunner–Munzel test (Brunner & Munzel 2000 — public): the modern
    * replacement for Mann–Whitney when the two samples may differ in
    * SHAPE as well as location (the Behrens–Fisher situation ranks
    * can't wish away): estimates the relative effect
    * p̂ = P(X < Y) + ½P(X = Y) and studentizes it with per-sample
    * placement variances, so unequal spreads don't inflate the test.
    * W is t-distributed with the Welch-type df̂ under H₀: p = ½ (the
    * t/normal p is library-only — t52 convention; |W| > 2 is the
    * practical alarm line).
    *
    * Distributed shape: per-value counts per side, ONE range-partitioned
    * sort of the merged distinct-value table, per-partition running
    * counts with broadcast offsets (the ksTwoSample idiom). Placements
    * are constant within a (value, side) cell, so every accumulated
    * quantity is Σ c·(2P) and Σ c·(2P)² over DOUBLED midranks — exact
    * integers added in BigDecimal, partition sums combined in index
    * order; the statistic is fixed double arithmetic over those
    * integers, fully oracle-replayable. Returns one row
    * (n_a, n_b, p_hat, w_stat, df), round-6; W null when both placement
    * variances are 0 (complete separation — p̂ still reports 0 or 1). */
  def brunnerMunzel(a: DataFrame, b: DataFrame,
      valueCol: Column): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, tagA: Boolean) = df
      .select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .select(col("v"),
        (if (tagA) col("c") else lit(0L)).as("ca"),
        (if (tagA) lit(0L) else col("c")).as("cb"))
    val counts = side(a, tagA = true).unionByName(side(b, tagA = false))
      .groupBy("v").agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
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
      val (n1, n2) = (offA.last, offB.last)
      require(n1 >= 2 && n2 >= 2,
        s"Brunner-Munzel needs >= 2 per side, got $n1/$n2")
      val partSums = counts.mapPartitionsWithIndex { (i, it) =>
        var ca0 = offA(i); var cb0 = offB(i)
        def bd(x: Long) = java.math.BigDecimal.valueOf(x)
        var s2pA = java.math.BigDecimal.ZERO // Σ ca·(2P_a)
        var s4pA = java.math.BigDecimal.ZERO // Σ ca·(2P_a)²
        var s2pB = java.math.BigDecimal.ZERO
        var s4pB = java.math.BigDecimal.ZERO
        it.foreach { case (_, ca, cb) =>
          // doubled midranks: 2M = 2·before_total + (ca+cb) + 1,
          // 2m_side = 2·before_side + c_side + 1 — all exact integers
          val m2 = 2 * (ca0 + cb0) + ca + cb + 1
          if (ca > 0) {
            val p2 = m2 - (2 * ca0 + ca + 1) // 2·P_a at this value
            s2pA = s2pA.add(bd(ca).multiply(bd(p2)))
            s4pA = s4pA.add(bd(ca).multiply(bd(p2).multiply(bd(p2))))
          }
          if (cb > 0) {
            val p2 = m2 - (2 * cb0 + cb + 1)
            s2pB = s2pB.add(bd(cb).multiply(bd(p2)))
            s4pB = s4pB.add(bd(cb).multiply(bd(p2).multiply(bd(p2))))
          }
          ca0 += ca; cb0 += cb
        }
        Iterator((i, s2pA, s4pA, s2pB, s4pB))
      }.collect().sortBy(_._1)
      def tot(f: ((Int, java.math.BigDecimal, java.math.BigDecimal,
          java.math.BigDecimal, java.math.BigDecimal)) =>
          java.math.BigDecimal) =
        partSums.foldLeft(java.math.BigDecimal.ZERO)((x, y) => x.add(f(y)))
      val (s2pA, s4pA) = (tot(_._2).doubleValue, tot(_._3).doubleValue)
      val (s2pB, s4pB) = (tot(_._4).doubleValue, tot(_._5).doubleValue)
      // mean placements (P̄ = Σc·2P / (2n)); p̂ = P̄_b / n1
      val pBarA = s2pA / (2.0 * n1)
      val pBarB = s2pB / (2.0 * n2)
      val pHat = pBarB / n1
      // placement variances: S² = (Σc·(2P)²/4 − n·P̄²)/(n−1)
      val s1 = (s4pA / 4.0 - n1 * pBarA * pBarA) / (n1 - 1)
      val s2 = (s4pB / 4.0 - n2 * pBarB * pBarB) / (n2 - 1)
      val u1 = s1 / (n1.toDouble * n2 * n2)
      val u2 = s2 / (n2.toDouble * n1 * n1)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val (w, df) =
        if (u1 + u2 > 0) {
          val wV = (pHat - 0.5) / math.sqrt(u1 + u2)
          val dfV = (u1 + u2) * (u1 + u2) /
            (u1 * u1 / (n1 - 1) + u2 * u2 / (n2 - 1))
          (Some(r6(wV)), Some(r6(dfV)))
        } else (None, None)
      Seq((n1, n2, r6(pHat), w, df))
        .toDF("n_a", "n_b", "p_hat", "w_stat", "df")
    } finally counts.unpersist(blocking = false)
  }

  /** Ansari–Bradley scale test (Ansari & Bradley 1960 — public): the
    * nonparametric DISPERSION companion to the location tests — scores
    * count inward from both ends (rank 1 and rank N both score 1, the
    * middle scores highest), so a sample concentrated at the center
    * collects HIGH scores: z > 0 means the FIRST sample is less
    * dispersed. Assumes equal medians/locations (center first when they
    * differ). The tie-robust moments come from the exact score sums
    * (the scipy convention): E = n₁·S/N and
    * Var = n₁n₂(N·S₂ − S²)/(N²(N−1)) with S = Σs, S₂ = Σs² over the
    * midrank-averaged scores; the normal p is library-only.
    *
    * Distributed shape: the ksTwoSample partition-offset scan over the
    * merged distinct-value table. Each tie block's score SUM has a
    * closed form (arithmetic series with a kink at (N+1)/2 — exact
    * integers), the block average spreads it over the block, and AB/S₂
    * fold as round-9 decimals with S an exact integer. Returns one row
    * (n_a, n_b, ab_stat, expected, z), round-6; z null when the score
    * variance is 0 (a single distinct value). */
  def ansariBradley(a: DataFrame, b: DataFrame,
      valueCol: Column): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, tagA: Boolean) = df
      .select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .select(col("v"),
        (if (tagA) col("c") else lit(0L)).as("ca"),
        (if (tagA) lit(0L) else col("c")).as("cb"))
    val counts = side(a, tagA = true).unionByName(side(b, tagA = false))
      .groupBy("v").agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
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
      val (n1, n2) = (offA.last, offB.last)
      require(n1 >= 2 && n2 >= 2,
        s"Ansari-Bradley needs >= 2 per side, got $n1/$n2")
      val nTot = n1 + n2
      val kMid = (nTot + 1) / 2
      val partSums = counts.mapPartitionsWithIndex { (i, it) =>
        var bt = offA(i) + offB(i)
        var ab = java.math.BigDecimal.ZERO
        var s = 0L
        var s2 = java.math.BigDecimal.ZERO
        def r9(x: Double) = java.math.BigDecimal.valueOf(x)
          .setScale(9, java.math.RoundingMode.HALF_UP)
        def sumUp(lo: Long, hi: Long): Long =
          if (hi < lo) 0L else (lo + hi) * (hi - lo + 1) / 2
        it.foreach { case (_, ca, cb) =>
          val c = ca + cb
          val lo = bt + 1; val hi = bt + c
          val bs = (if (lo <= kMid) sumUp(lo, math.min(hi, kMid)) else 0L) +
            (if (hi > kMid)
              sumUp(nTot + 1 - hi, nTot + 1 - math.max(lo, kMid + 1))
            else 0L)
          val sbar = bs.toDouble / c
          if (ca > 0) ab = ab.add(r9(ca * sbar))
          s += bs
          s2 = s2.add(r9(bs * sbar))
          bt += c
        }
        Iterator((i, ab, s, s2))
      }.collect().sortBy(_._1)
      val abStat = partSums
        .foldLeft(java.math.BigDecimal.ZERO)((x, y) => x.add(y._2))
        .doubleValue
      val s = partSums.map(_._3).sum
      val s2 = partSums
        .foldLeft(java.math.BigDecimal.ZERO)((x, y) => x.add(y._4))
        .doubleValue
      val e = n1.toDouble * s / nTot
      val varAb = n1.toDouble * n2 * (nTot * s2 - s.toDouble * s) /
        (nTot.toDouble * nTot * (nTot - 1))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val z = if (varAb > 0) Some(r6((abStat - e) / math.sqrt(varAb)))
        else None
      Seq((n1, n2, r6(abStat), r6(e), z))
        .toDF("n_a", "n_b", "ab_stat", "expected", "z")
    } finally counts.unpersist(blocking = false)
  }

  /** Friedman test (Friedman 1937 — public; Conover's tie-handling
    * formulation): the repeated-measures companion to
    * [[kruskalWallis]] — k treatments measured once per block, ranks
    * taken WITHIN each block, so between-block level differences cancel
    * by construction. Q = (k−1)·Σ_j(R_j − n(k+1)/2)²/(A − C) with
    * A = Σ r̄²_ij over all average ranks and C = nk(k+1)²/4 — the form
    * that is exact under ties; Q ~ χ²(k−1).
    *
    * Distributed shape: within-block rank windows partition on the
    * block key (k-sized frames — never a global window), one groupBy
    * rollup to k rows. Ranks are carried DOUBLED (2·r̄ = 2·rank +
    * ties − 1 is always an integer), so every accumulated quantity is
    * an exact integer and an oracle replays the statistic with no
    * rounding conventions at all. Blocks must be complete (every block
    * carries each of the k treatments exactly once — loud otherwise;
    * filter to a complete design first). The χ²(k−1) p closes in
    * exp(−Q/2) when k = 3 (shared with the oracle); other k use the
    * library CDF (library-only by the t52 convention — identical
    * column either way). Returns one row per treatment (treatment,
    * n_blocks, mean_rank, q_stat, p_value), round-6. */
  def friedman(df: DataFrame, blockCol: Column, treatCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(blockCol.as("b"), treatCol.cast("string").as("g"),
        valueCol.cast("double").as("v"))
      .filter(col("b").isNotNull && col("g").isNotNull &&
        col("v").isNotNull && !isnan(col("v")))
    val wb = Window.partitionBy(col("b")).orderBy(col("v"))
    val tie = Window.partitionBy(col("b"), col("v"))
    val ranked = base.withColumn("__r2",
      (rank().over(wb) * 2 + count(lit(1)).over(tie) - 1).cast("long"))
      .persist()
    try {
      val k = ranked.select(count_distinct(col("g"))).head().getLong(0)
      require(k >= 2, s"Friedman needs >= 2 treatments, got $k")
      val badBlocks = ranked.groupBy("b")
        .agg(count(lit(1)).as("c"), count_distinct(col("g")).as("kg"))
        .filter(col("c") =!= k || col("kg") =!= k).count()
      require(badBlocks == 0L,
        s"$badBlocks incomplete blocks - Friedman needs every block to " +
          "carry each treatment exactly once; filter to a complete " +
          "design first")
      val tot = ranked.agg(count(lit(1)).as("nk"),
        sum(col("__r2") * col("__r2")).as("a2")).head()
      val nk = tot.getAs[Long]("nk")
      require(nk > 0, "no complete blocks")
      val nb = nk / k
      val a2 = tot.getAs[Long]("a2")
      val perTreat = ranked.groupBy("g")
        .agg(sum(col("__r2")).as("r2sum")).orderBy("g").collect()
        .map(r => r.getString(0) -> r.getAs[Long]("r2sum"))
      val a = a2 / 4.0
      val c = nb.toDouble * k * (k + 1) * (k + 1) / 4.0
      require(a > c,
        "every block fully tied - rank geometry degenerate; nothing to test")
      val center = nb.toDouble * (k + 1) / 2.0
      val ssq = perTreat.map { case (_, r2s) =>
        val d = r2s / 2.0 - center
        d * d
      }.sum
      val q = (k - 1) * ssq / (a - c)
      // χ²(2) survival is EXACTLY exp(−x/2) — computed directly at
      // k = 3 so the oracle's exp matches bit-for-bit; the library CDF
      // would agree only to ~1 ulp
      val p =
        if (k == 3) math.exp(-q / 2)
        else 1.0 - new org.apache.commons.math3.distribution
          .ChiSquaredDistribution((k - 1).toDouble)
          .cumulativeProbability(math.max(q, 0.0))
      perTreat.toSeq.map { case (g, r2s) =>
        (g, nb, round6(r2s / 2.0 / nb), round6(q), round6(p))
      }.toDF("treatment", "n_blocks", "mean_rank", "q_stat", "p_value")
        .orderBy("treatment")
    } finally ranked.unpersist(blocking = false)
  }

  /** Conover's squared-ranks test for equal variances (Conover & Iman
    * 1978; Conover 1999 §5.3 — public): the NONPARAMETRIC k-group scale
    * test beside the parametric Levene/Bartlett pair and the two-group
    * [[ansariBradley]] — deviations from each group's mean are ranked
    * in the combined sample and the SQUARED ranks feed a χ²(k−1)
    * statistic T = (Σ S_g²/n_g − N·S̄²)/D², immune to the non-normality
    * that wrecks Bartlett. χ²(2) p closes in exp(−T/2) at k = 3 (else
    * library — t52 convention).
    *
    * Exactness: group means round to 12 (shared constants), deviations
    * are then identical doubles in both engines, and with DOUBLED
    * midranks every accumulated quantity — Σc·(2R)², Σc·(2R)⁴, per-group
    * sums — is an exact integer in DECIMAL(38,0); the statistic is one
    * mirrored double expression over them. Distributed shape: one
    * per-group moment fold (broadcast means), per-value counts, the
    * distinct-value scan for midranks, one (value, group) rollup — no
    * unpartitioned window. Returns one row per group (grp, n, s_sum,
    * t_stat, p_value), round-6; T null when D² = 0 (all deviations
    * tied). */
  def squaredRanks(df: DataFrame, grpCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(grpCol.cast("string").as("g"),
        valueCol.cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
    def fold12(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val means = base.groupBy("g")
      .agg(count(lit(1)).as("n"), fold12(col("v")).as("s1"))
      .select(col("g"), col("n"),
        round(col("s1") / col("n"), 12).as("mu"))
    val k = means.count()
    require(k >= 2, s"squared-ranks needs >= 2 groups, got $k")
    val devs = base.join(broadcast(means), "g")
      .select(col("g"), abs(col("v") - col("mu")).as("u"))
    // doubled midranks of u over the combined sample (distinct-u scan)
    val uCounts = devs.groupBy("u").agg(count(lit(1)).as("c"))
      .as[(Double, Long)].rdd.sortBy(_._1)
    uCounts.cache()
    val r2 =
      try {
        val sizes = uCounts.mapPartitionsWithIndex { (i, it) =>
          var s = 0L; it.foreach(s += _._2); Iterator((i, s))
        }.collect().sortBy(_._1)
        val offs = sizes.map(_._2).scanLeft(0L)(_ + _)
        uCounts.mapPartitionsWithIndex { (i, it) =>
          var before = offs(i)
          it.map { case (u, c) =>
            val mid2 = 2 * before + c + 1
            before += c
            (u, mid2)
          }
        }.toDF("u", "r2")
      } finally uCounts.unpersist(blocking = false)
    val cells = devs.groupBy("g", "u").agg(count(lit(1)).as("c"))
      .join(r2, "u")
    val perG = cells.groupBy("g").agg(
        sum(col("c")).as("n"),
        sum((col("c") * col("r2") * col("r2")).cast("decimal(38,0)"))
          .as("s4"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getDecimal(2).toBigInteger))
    val n = perG.map(_._2).sum
    require(n >= 3, s"squared-ranks needs >= 3 rows, got $n")
    // Σc·(2R)⁴ ≤ n·(2n+1)⁴ must fit DECIMAL(38,0): Spark's non-ANSI
    // decimal sum overflows to NULL, which would surface below as an
    // opaque NPE at toBigInteger instead of this remedy (the same cap
    // discipline wasserstein1 applies at 2^53).
    require(BigInt(n) * (2 * BigInt(n) + 1).pow(4) < BigInt(10).pow(38),
      s"squared-ranks: n = $n rows overflow the DECIMAL(38,0) " +
        "Σc·(2R)^4 accumulator (worst case n·(2n+1)^4 ≥ 10^38) - " +
        "subsample groups upstream and re-run")
    val tot = cells.agg(
      sum((col("c") * col("r2") * col("r2")).cast("decimal(38,0)"))
        .as("t2"),
      sum((col("c").cast("decimal(38,0)")
        * col("r2").cast("decimal(38,0)") * col("r2")
        * col("r2") * col("r2"))).as("t4")).head()
    val sumR2 = new java.math.BigDecimal(
      tot.getDecimal(0).toBigInteger).doubleValue / 4.0
    val sumR4 = new java.math.BigDecimal(
      tot.getDecimal(1).toBigInteger).doubleValue / 16.0
    val sbar = sumR2 / n
    val d2 = (sumR4 - n * sbar * sbar) / (n - 1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val (tStat, p) =
      if (d2 > 0) {
        val sg = perG.map { case (_, ng, s4) =>
          val s = new java.math.BigDecimal(s4).doubleValue / 4.0
          s * s / ng
        }.sum
        val t = (sg - n * sbar * sbar) / d2
        val pv =
          if (k == 3) math.exp(-t / 2)
          else 1.0 - new org.apache.commons.math3.distribution
            .ChiSquaredDistribution((k - 1).toDouble)
            .cumulativeProbability(math.max(t, 0.0))
        (Some(r6(t)), Some(r6(pv)))
      } else (None, None)
    perG.toSeq.map { case (g, ng, s4) =>
      (g, ng, r6(new java.math.BigDecimal(s4).doubleValue / 4.0),
        tStat, p)
    }.toDF("grp", "n", "s_sum", "t_stat", "p_value").orderBy("grp")
  }

  /** Quade test (Quade 1979 — public): [[friedman]] weighted by how
    * much each block DISCRIMINATES — blocks are ranked by their range
    * and a block's within-ranks count proportionally to that rank, so a
    * flat block (pure noise) barely votes while a wide one votes
    * loudest. More powerful than Friedman at small k; the statistic
    * T₃ = (n−1)·B/(A−B) is F(k−1, (n−1)(k−1)) under H₀ (the F p is
    * library-only — t52 convention).
    *
    * Exactness: with DOUBLED midranks both within blocks (2r) and
    * across block ranges (2Q), every score 4·S_ij = 2Q_j·(2r_ij−(k+1))
    * is an exact integer; A, B and the treatment sums accumulate in
    * exact decimals, and T₃ is one double expression over them.
    * Distributed shape: within-block rank windows partition on the
    * block key; block-range midranks come from the distinct-range
    * count-table scan (domain-bounded) joined back — no unpartitioned
    * window. Complete blocks required (loud). Returns one row per
    * treatment (treatment, n_blocks, s_sum, t3_stat), round-6; T₃ null
    * when A = B (all blocks perfectly consistent — the F explodes;
    * treat as "significant at any level" and read the s_sum order). */
  def quade(df: DataFrame, blockCol: Column, treatCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(blockCol.as("b"), treatCol.cast("string").as("g"),
        valueCol.cast("double").as("v"))
      .filter(col("b").isNotNull && col("g").isNotNull &&
        col("v").isNotNull && !isnan(col("v")))
    val wb = Window.partitionBy(col("b")).orderBy(col("v"))
    val tie = Window.partitionBy(col("b"), col("v"))
    val ranked = base.withColumn("__r2",
      (rank().over(wb) * 2 + count(lit(1)).over(tie) - 1).cast("long"))
      .persist()
    try {
      val k = ranked.select(count_distinct(col("g"))).head().getLong(0)
      require(k >= 2, s"Quade needs >= 2 treatments, got $k")
      val badBlocks = ranked.groupBy("b")
        .agg(count(lit(1)).as("c"), count_distinct(col("g")).as("kg"))
        .filter(col("c") =!= k || col("kg") =!= k).count()
      require(badBlocks == 0L,
        s"$badBlocks incomplete blocks - Quade needs every block to " +
          "carry each treatment exactly once")
      // block ranges -> doubled midranks via the distinct-value scan
      val ranges = ranked.groupBy("b")
        .agg((max(col("v")) - min(col("v"))).as("rng"))
      val rngCounts = ranges.groupBy("rng").agg(count(lit(1)).as("c"))
        .as[(Double, Long)].rdd.sortBy(_._1)
      rngCounts.cache()
      val q2 =
        try {
          val sizes = rngCounts.mapPartitionsWithIndex { (i, it) =>
            var s = 0L; it.foreach(s += _._2); Iterator((i, s))
          }.collect().sortBy(_._1)
          val offs = sizes.map(_._2).scanLeft(0L)(_ + _)
          rngCounts.mapPartitionsWithIndex { (i, it) =>
            var before = offs(i)
            it.map { case (r, c) =>
              val mid2 = 2 * before + c + 1 // doubled midrank
              before += c
              (r, mid2)
            }
          }.toDF("rng", "q2")
        } finally rngCounts.unpersist(blocking = false)
      val nBlocks = ranges.count()
      require(nBlocks >= 2, s"Quade needs >= 2 blocks, got $nBlocks")
      // 4S = q2 * (2r - (k+1)): exact integers per cell
      val cells = ranked
        .join(ranges.join(q2, "rng").select(col("b"), col("q2")), "b")
        .select(col("g"),
          (col("q2") * (col("__r2") - lit(k + 1))).as("s4"))
      val perTreat = cells.groupBy("g").agg(
        sum(col("s4").cast("decimal(38,0)")).as("s4sum")).orderBy("g")
        .collect()
        .map(r => r.getString(0) -> r.getDecimal(1).toBigInteger)
      val a16 = cells.agg(
        sum((col("s4") * col("s4")).cast("decimal(38,0)")))
        .head().getDecimal(0).toBigInteger
      val b16num = perTreat
        .map { case (_, s) => s.multiply(s) }
        .foldLeft(java.math.BigInteger.ZERO)(_.add(_))
      val a16d = new java.math.BigDecimal(a16).doubleValue
      val b16d = new java.math.BigDecimal(b16num).doubleValue / nBlocks
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val t3 =
        if (a16d > b16d) Some(r6((nBlocks - 1) * b16d / (a16d - b16d)))
        else None
      perTreat.toSeq.map { case (g, s4) =>
        (g, nBlocks, r6(new java.math.BigDecimal(s4).doubleValue / 4.0),
          t3)
      }.toDF("treatment", "n_blocks", "s_sum", "t3_stat")
        .orderBy("treatment")
    } finally ranked.unpersist(blocking = false)
  }

  /** Mood's median test (Mood 1950 — public): do k groups share a
    * common median? Every value classifies as above / at-or-below the
    * GRAND median, and the resulting 2×k contingency tests independence
    * by χ²(k−1) — cruder than [[kruskalWallis]] but assumption-free
    * about shape (it only reads the sign relative to one quantile), the
    * standard robustness cross-check when distributions differ wildly
    * in spread.
    *
    * The grand median is the exact interpolated percentile ROUNDED TO 6
    * (the classification CONSTANT both engines share — t17 establishes
    * percentile ≡ quantile_cont parity at that rounding); counts are
    * exact integers, expectations exact-integer ratios, so the oracle
    * replays χ² term-for-term. p closes in exp(−χ²/2) at k = 3 (else
    * library). Returns one row per group (grp, n, n_above, expected_
    * above, chi2, p_value) ordered by group, round-6. */
  def moodMedian(df: DataFrame, grpCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(grpCol.cast("string").as("g"),
        valueCol.cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val mRow = base.agg(round(percentile(col("v"), lit(0.5)), 6)).head()
    require(!mRow.isNullAt(0), "no values - median undefined")
    val med = mRow.getDouble(0)
    val cells = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(when(col("v") > med, 1L).otherwise(0L)).as("na"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("na")))
    val k = cells.length
    require(k >= 2, s"Mood's median test needs >= 2 groups, got $k")
    val nTot = cells.map(_._2).sum
    val aTot = cells.map(_._3).sum
    require(aTot > 0 && aTot < nTot,
      "all values on one side of the median - degenerate split " +
        "(massive ties at the median); use kruskalWallis instead")
    val chi2 = cells.map { case (_, n, na) =>
      val ea = n.toDouble * aTot / nTot
      val eb = n.toDouble * (nTot - aTot) / nTot
      val nb = n - na
      (na - ea) * (na - ea) / ea + (nb - eb) * (nb - eb) / eb
    }.sum
    val p =
      if (k == 3) math.exp(-chi2 / 2)
      else 1.0 - new org.apache.commons.math3.distribution
        .ChiSquaredDistribution((k - 1).toDouble)
        .cumulativeProbability(math.max(chi2, 0.0))
    cells.toSeq.map { case (g, n, na) =>
      (g, n, na, round6(n.toDouble * aTot / nTot), round6(chi2), round6(p))
    }.toDF("grp", "n", "n_above", "expected_above", "chi2", "p_value")
      .orderBy("grp")
  }
}
