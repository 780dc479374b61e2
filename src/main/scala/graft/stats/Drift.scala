package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * population stability index (PSI) over equi-depth bins, the standard
  * "has this feature's distribution moved since the reference window"
  * check a data pipeline runs before retraining.
  *
  * Bin edges come from the REFERENCE side's exact quantiles (one
  * aggregate), rounded so any engine bins identically; binning is a
  * static unrolled comparison chain (codegen'd, no join); the PSI table
  * is one tiny groupBy per side. PSI = Σ (q_i − p_i)·ln(q_i / p_i) with
  * the conventional 1e-6 floor on shares so an empty bin contributes a
  * large-but-finite term instead of ±∞.
  *
  * 100 TB: two scans (one per side) + a bins-sized result; swap the exact
  * quantile pass for percentile_approx/QuantileSketch when the reference
  * no longer fits a sort.
  */
object Drift {

  /** Reference-quantile bin edges (nBins−1 interior edges, rounded). */
  def binEdges(
      ref: DataFrame, valueCol: String, nBins: Int,
      roundTo: Int = 6): Seq[Double] = {
    require(nBins >= 2, s"need ≥2 bins, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val row = ref.agg(percentile(col(valueCol).cast("double"),
      array(ps.map(lit): _*)).as("q")).head()
    row.getSeq[Double](0).map(x =>
      BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  /** Bin index 0..nBins−1 = number of edges ≤ value (unrolled, static). */
  def binOf(value: Column, edges: Seq[Double]): Column =
    edges.map(t => when(value >= lit(t), 1).otherwise(0))
      .reduce(_ + _)

  /** Per-bin PSI table: (bin, ref_cnt, cur_cnt, term). PSI = sum(term).
    * Shares floor at 1e-6 (both engines mirror), so empty bins stay
    * finite. Bins with zero rows on BOTH sides are absent (no term). */
  def psiTable(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    val edges = binEdges(ref, valueCol, nBins)
    def binned(df: DataFrame, side: String) = df
      .select(binOf(col(valueCol).cast("double"), edges).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(s"${side}_cnt"))
    val joined = binned(ref, "ref").join(binned(cur, "cur"), Seq("bin"), "full")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
    val refTotal = sum(col("ref_cnt")).over(org.apache.spark.sql.expressions
      .Window.partitionBy())
    val curTotal = sum(col("cur_cnt")).over(org.apache.spark.sql.expressions
      .Window.partitionBy())
    val p = greatest(col("ref_cnt") / refTotal, lit(1e-6))
    val q = greatest(col("cur_cnt") / curTotal, lit(1e-6))
    joined
      .withColumn("term", (q - p) * log(q / p))
      .select("bin", "ref_cnt", "cur_cnt", "term")
      .orderBy("bin")
  }

  /** The scalar PSI. Conventional reading: <0.1 stable, 0.1–0.25 drifting,
    * >0.25 shifted. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10): Double =
    psiTable(ref, cur, valueCol, nBins)
      .agg(sum(col("term"))).head().getDouble(0)

  /** Per-group PSI — drift scored independently for every domain in one
    * distributed pass (no per-domain driver loop): each group's OWN
    * reference deciles come from one grouped percentile aggregate,
    * broadcast back as a rounded edge array; binning is a single-level
    * HOF fold over that 9-element array; counts, shares, and terms ride
    * (group, bin) aggregates. PSI terms are non-negative (Gibbs), so the
    * per-group sum is same-sign and ROUND absorbs reorder noise. */
  def psiByGroup(
      ref: DataFrame, cur: DataFrame, groupCol: String, valueCol: String,
      nBins: Int = 10, roundTo: Int = 6): DataFrame = {
    require(nBins >= 2, s"need ≥2 bins, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val edges = ref.groupBy(col(groupCol))
      .agg(percentile(col(valueCol).cast("double"),
        array(ps.map(lit): _*)).as("__q"))
      .select(col(groupCol),
        transform(col("__q"), x => round(x, roundTo)).as("__e"))
    def binned(df: DataFrame, side: String) = df
      .join(broadcast(edges), Seq(groupCol))
      .select(col(groupCol),
        aggregate(col("__e"), lit(0), (acc, t) =>
          acc + when(col(valueCol).cast("double") >= t, 1).otherwise(0))
          .as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as(s"${side}_cnt"))
    val joined = binned(ref, "ref")
      .join(binned(cur, "cur"), Seq(groupCol, "bin"), "full")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
    val byG = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val p = greatest(col("ref_cnt") / sum(col("ref_cnt")).over(byG), lit(1e-6))
    val q = greatest(col("cur_cnt") / sum(col("cur_cnt")).over(byG), lit(1e-6))
    joined
      .withColumn("__term", (q - p) * log(q / p))
      .groupBy(col(groupCol))
      .agg(round(sum(col("__term")), roundTo).as("psi"))
      .orderBy(col(groupCol))
  }

  /** Scalar PSI from two bin-count maps (the driver-side tail of the
    * streaming path; identical formula to [[psiTable]]'s term column). */
  def psiFromCounts(
      refCounts: Map[Int, Long], curCounts: Map[Int, Long]): Double = {
    val bins = (refCounts.keySet ++ curCounts.keySet).toSeq.sorted
    val rt = refCounts.values.sum.toDouble
    val ct = curCounts.values.sum.toDouble
    bins.map { b =>
      val p = math.max(refCounts.getOrElse(b, 0L) / rt, 1e-6)
      val q = math.max(curCounts.getOrElse(b, 0L) / ct, 1e-6)
      (q - p) * math.log(q / p)
    }.sum
  }

  /** Streaming drift monitor: per micro-batch PSI of the live feed against
    * a STATIC reference. Edges and reference shares are computed once
    * batch-side and closed over; each micro-batch pays one tiny binned
    * groupBy (state-free — the monitor is per-batch by design, matching
    * how drift alarms are consumed). `onBatch(batchId, psi)` receives each
    * score. Returns the started query. */
  def psiStream(
      ref: DataFrame, stream: DataFrame, valueCol: String, nBins: Int = 10)(
      onBatch: (Long, Double) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val edges = binEdges(ref, valueCol, nBins)
    val refCounts = ref
      .select(binOf(col(valueCol).cast("double"), edges).as("bin"))
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val cur = batch
          .select(binOf(col(valueCol).cast("double"), edges).as("bin"))
          .groupBy("bin").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        if (cur.nonEmpty) onBatch(id, psiFromCounts(refCounts, cur))
      }
      .start()
  }

  /** PSI over a CATEGORICAL column — label shares, language mix, cluster
    * shares (feed `cluster_id` from [[graft.ops.KMeans.assign]] to watch a
    * corpus's topic balance move between snapshots). No quantile pass:
    * categories are their own bins, so each side is one tiny groupBy and
    * the category axis is the union of both sides. NULL is a real
    * category (a missing label drifting in IS drift) via a string
    * sentinel, since join keys would otherwise never pair nulls. Same
    * 1e-6 share floor and (q−p)·ln(q/p) terms as [[psiTable]]. */
  def psiCategoricalTable(
      ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    def binned(df: DataFrame, side: String) = df
      .select(coalesce(col(catCol).cast("string"), lit("<null>"))
        .as("category"))
      .groupBy("category").agg(count(lit(1)).as(s"${side}_cnt"))
    val joined = binned(ref, "ref")
      .join(binned(cur, "cur"), Seq("category"), "full")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
    // totals as a broadcast 1-row aggregate, not an unpartitioned window
    // (the category table is usually small, but the whole-table window
    // shape is the one we ban everywhere else)
    val totals = broadcast(joined.agg(
      sum(col("ref_cnt")).as("__rt"), sum(col("cur_cnt")).as("__ct")))
    val p = greatest(col("ref_cnt") / col("__rt"), lit(1e-6))
    val q = greatest(col("cur_cnt") / col("__ct"), lit(1e-6))
    joined.crossJoin(totals)
      .withColumn("term", (q - p) * log(q / p))
      .select("category", "ref_cnt", "cur_cnt", "term")
      .orderBy("category")
  }

  /** The scalar categorical PSI (same <0.1 / 0.1–0.25 / >0.25 reading).
    * Two empty inputs yield 0.0 (no categories, no shift), not the NPE a
    * raw sum-over-zero-rows would throw. */
  def psiCategorical(ref: DataFrame, cur: DataFrame, catCol: String): Double =
    psiCategoricalTable(ref, cur, catCol)
      .agg(coalesce(sum(col("term")), lit(0.0))).head().getDouble(0)

  /** Two-sample Kolmogorov–Smirnov test: D = max_x |F_a(x) − F_b(x)| —
    * the nonparametric "did this numeric column's distribution move"
    * companion to PSI's binned view (no bin edges to choose, sensitive
    * to any shape change), with the asymptotic p-value via the standard
    * Kolmogorov series (Press et al., Numerical Recipes §14.3, public):
    * λ = (√n_e + 0.12 + 0.11/√n_e)·D, p = 2 Σ_{k≥1} (−1)^{k−1}
    * e^{−2k²λ²} (100 terms, clamped to [0,1]).
    *
    * Exactness: the max is taken over INTEGER numerators
    * |cumA·n_b − cumB·n_a| in decimal(38,0) — both engines agree on the
    * exact argmax before any division; D is then one double division.
    * The p-series terms round to 12 and fold in decimal.
    *
    * Scale shape: one per-value count aggregation per side, ONE
    * distributed range-partitioned sort of the distinct-value table,
    * then per-partition running sums with broadcast partition offsets
    * (the parallel-scan idiom shared with [[Correlation]]'s rank pass —
    * NO unpartitioned window), one scan for the max. Driver traffic is
    * per-partition scalars only.
    *
    * Returns one row (n_a, n_b, d_stat, p_value), rounded to 6. Fails
    * loudly on an empty side (the statistic is undefined). */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: Column): DataFrame = {
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
      val (nA, nB) = (offA.last, offB.last)
      require(nA > 0 && nB > 0,
        s"KS needs both samples non-empty, got nA=$nA nB=$nB")
      val bigA = java.math.BigDecimal.valueOf(nA)
      val bigB = java.math.BigDecimal.valueOf(nB)
      val maxNum = counts.mapPartitionsWithIndex { (i, it) =>
        var ca = offA(i); var cb = offB(i)
        var best = java.math.BigDecimal.ZERO
        it.foreach { case (_, da, db) =>
          ca += da; cb += db
          val num = java.math.BigDecimal.valueOf(ca).multiply(bigB)
            .subtract(java.math.BigDecimal.valueOf(cb).multiply(bigA)).abs()
          if (num.compareTo(best) > 0) best = num
        }
        Iterator(best)
      }.collect().foldLeft(java.math.BigDecimal.ZERO) {
        (x, y) => if (y.compareTo(x) > 0) y else x
      }
      val d = maxNum.doubleValue / (nA.toDouble * nB.toDouble)
      val ne = nA.toDouble * nB.toDouble / (nA.toDouble + nB.toDouble)
      val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
      // the alternating series needs λ bounded away from 0 to converge in
      // 100 terms (at λ = 0 it oscillates 2, 0, 2, ...); below 0.1 the
      // true p exceeds 1 − 1e-8, so both engines branch to exactly 1
      val p =
        if (lam < 0.1) 1.0
        else {
          // rounded-12 terms, exact decimal fold — identical in any engine
          var acc = java.math.BigDecimal.ZERO
          for (k <- 1 to 100) {
            val t = 2.0 * (if (k % 2 == 1) 1.0 else -1.0) *
              math.exp(-2.0 * k * k * lam * lam)
            acc = acc.add(java.math.BigDecimal.valueOf(t)
              .setScale(12, java.math.RoundingMode.HALF_UP))
          }
          math.min(1.0, math.max(0.0, acc.doubleValue))
        }
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((nA, nB, r6(d), r6(p))).toDF("n_a", "n_b", "d_stat", "p_value")
    } finally counts.unpersist(blocking = false)
  }

  /** Two-sample 1-Wasserstein (earth-mover) distance (Monge 1781 /
    * Kantorovich 1942; the 1-D closed form ∫|F_a − F_b| dv is textbook —
    * public): the DRIFT MAGNITUDE companion to [[ksTwoSample]]'s
    * detection — KS says "the distributions differ", W₁ says "by this
    * many units of the metric" (a 2-unit location shift reports ≈ 2),
    * which is what a score- or latency-drift alarm should threshold on.
    *
    * Exact, not binned: over the merged DISTINCT-value table,
    * W₁ = Σᵢ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ). Same distributed shape as
    * [[ksTwoSample]]: per-value counts, ONE range-partitioned sort,
    * per-partition running counts with broadcast offsets — the only
    * extra state is each partition's FIRST value (broadcast, one per
    * partition) so boundary widths close without a window. CDF
    * numerators |ca·n_b − cb·n_a| are exact integers (< 2⁵³ by the
    * loud pair cap); terms fold as round-12 decimals per partition and
    * the partition sums add in index order — deterministic and
    * oracle-replayable. Returns one row (n_a, n_b, n_values, w1),
    * round-6. */
  def wasserstein1(a: DataFrame, b: DataFrame,
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
      val partStats = counts.mapPartitionsWithIndex { (i, it) =>
        var sa = 0L; var sb = 0L; var n = 0L
        var first: Option[Double] = None
        it.foreach { t =>
          if (first.isEmpty) first = Some(t._1)
          sa += t._2; sb += t._3; n += 1
        }
        Iterator((i, sa, sb, n, first))
      }.collect().sortBy(_._1)
      val offA = partStats.map(_._2).scanLeft(0L)(_ + _)
      val offB = partStats.map(_._3).scanLeft(0L)(_ + _)
      val (nA, nB) = (offA.last, offB.last)
      require(nA > 0 && nB > 0,
        s"W1 needs both samples non-empty, got nA=$nA nB=$nB")
      require(nA.toDouble * nB < 9.0e15, // 2^53: the exact-integer bound
        s"nA*nB = ${nA.toDouble * nB} exceeds the exact CDF-numerator " +
          "range - pre-aggregate or sample one side")
      val nValues = partStats.map(_._4).sum
      // each partition's successor value: the first value of the next
      // NON-EMPTY partition (None past the last — that term is 0 anyway:
      // both CDFs are 1 at the final value)
      val nextFirst: Array[Option[Double]] = partStats.indices.map { i =>
        partStats.drop(i + 1).flatMap(_._5).headOption
      }.toArray
      val bNext = spark.sparkContext.broadcast(nextFirst)
      val partSums = counts.mapPartitionsWithIndex { (i, it) =>
        var ca = offA(i); var cb = offB(i)
        var acc = java.math.BigDecimal.ZERO
        var prev: Option[(Double, Long, Long)] = None
        def add(v: Double, nv: Double): Unit = {
          val num = math.abs(ca * nB - cb * nA).toDouble
          acc = acc.add(java.math.BigDecimal.valueOf(num * (nv - v))
            .setScale(12, java.math.RoundingMode.HALF_UP))
        }
        it.foreach { case (v, da, db) =>
          prev.foreach { case (pv, _, _) => add(pv, v) }
          ca += da; cb += db
          prev = Some((v, da, db))
        }
        prev.foreach { case (pv, _, _) =>
          bNext.value(i).foreach(nv => add(pv, nv))
        }
        Iterator((i, acc))
      }.collect().sortBy(_._1)
        .foldLeft(java.math.BigDecimal.ZERO)((x, y) => x.add(y._2))
      val w1 = partSums.doubleValue / (nA.toDouble * nB)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      Seq((nA, nB, nValues, r6(w1)))
        .toDF("n_a", "n_b", "n_values", "w1")
    } finally counts.unpersist(blocking = false)
  }

  /** One-sample Kolmogorov–Smirnov against U(0,1) (Kolmogorov 1933,
    * public): D = max over the sample of max(|F̂⁻(v) − v|, |F̂(v) − v|)
    * with both one-sided gaps at every jump — the QC test for anything
    * CLAIMING uniformity: hash-fraction splitters, pseudonymization
    * avalanche, p-value distributions under a true null. Values must
    * sit in [0,1] (loud).
    *
    * Distributed shape: per-value counts, ONE range-partitioned sort,
    * per-partition running counts with broadcast offsets (the
    * ksTwoSample idiom) — the max folds over per-partition maxima, and
    * each gap term is one double division of exact integers. The
    * asymptotic p uses the same Kolmogorov series as [[ksTwoSample]]
    * with √n. Returns one row (n, d_stat, p_value), round-6. */
  def ksUniform(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .as[(Double, Long)].rdd.sortBy(_._1)
    counts.cache()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }.collect().sortBy(_._1)
      val off = partTotals.map(_._2).scanLeft(0L)(_ + _)
      val n = off.last
      require(n > 0, "KS-uniform needs values")
      val nD = n.toDouble
      val d = counts.mapPartitionsWithIndex { (i, it) =>
        var cum = off(i)
        var best = 0.0
        it.foreach { case (v, c) =>
          require(v >= 0.0 && v <= 1.0, s"value outside [0,1]: $v")
          val lo = math.abs(cum / nD - v)
          cum += c
          val hi = math.abs(cum / nD - v)
          val m = math.max(lo, hi)
          if (m > best) best = m
        }
        Iterator(best)
      }.collect().foldLeft(0.0)(math.max)
      val lam = (math.sqrt(nD) + 0.12 + 0.11 / math.sqrt(nD)) * d
      val p =
        if (lam < 0.1) 1.0
        else {
          var acc = java.math.BigDecimal.ZERO
          for (k <- 1 to 100) {
            val t = 2.0 * (if (k % 2 == 1) 1.0 else -1.0) *
              math.exp(-2.0 * k * k * lam * lam)
            acc = acc.add(java.math.BigDecimal.valueOf(t)
              .setScale(12, java.math.RoundingMode.HALF_UP))
          }
          math.min(1.0, math.max(0.0, acc.doubleValue))
        }
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      Seq((n, r6(d), r6(p))).toDF("n", "d_stat", "p_value")
    } finally counts.unpersist(blocking = false)
  }

  /** One-sample Kolmogorov–Smirnov against a FITTED exponential
    * (Lilliefors 1969 variant — public): are inter-arrival gaps
    * memoryless? The homogeneous-Poisson hypothesis behind every
    * constant-rate capacity model — reject it and rate limits tuned on
    * the mean are wrong at the bursts. λ̂ = n/Σv (rounded 12 — the
    * shared cross-engine constant), D = the usual two-sided sup gap vs
    * F(v) = 1 − e^{−λ̂v}. NOTE the Kolmogorov p is INVALID when λ is
    * estimated from the same data (Lilliefors' point), so only D is
    * emitted — compare against Lilliefors critical values offline or
    * bootstrap; at pipeline scale any real daily cycle pushes D far
    * above every table anyway.
    *
    * Distributed shape: the [[ksUniform]] recipe — per-value counts,
    * ONE range-partitioned sort, per-partition running counts with
    * broadcast offsets; the mean fold is round-9 decimal. Values must
    * be ≥ 0 (loud). Returns one row (n, lambda_hat, d_stat), λ̂
    * round-12, D round-6. */
  def ksExponential(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .as[(Double, Long)].rdd.sortBy(_._1)
    counts.cache()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        var sv = java.math.BigDecimal.ZERO
        it.foreach { case (v, c) =>
          require(v >= 0.0, s"negative duration: $v")
          s += c
          sv = sv.add(java.math.BigDecimal.valueOf(v * c)
            .setScale(9, java.math.RoundingMode.HALF_UP))
        }
        Iterator((i, s, sv))
      }.collect().sortBy(_._1)
      val off = partTotals.map(_._2).scanLeft(0L)(_ + _)
      val n = off.last
      require(n >= 2, s"KS-exponential needs >= 2 values, got $n")
      val sumV = partTotals
        .foldLeft(java.math.BigDecimal.ZERO)((x, y) => x.add(y._3))
        .doubleValue
      require(sumV > 0.0, "all durations zero - no rate to fit")
      val lam = BigDecimal(n.toDouble / sumV)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      val nD = n.toDouble
      val d = counts.mapPartitionsWithIndex { (i, it) =>
        var cum = off(i)
        var best = 0.0
        it.foreach { case (v, c) =>
          val f = 1.0 - math.exp(-lam * v)
          val lo = math.abs(cum / nD - f)
          cum += c
          val hi = math.abs(cum / nD - f)
          val m = math.max(lo, hi)
          if (m > best) best = m
        }
        Iterator(best)
      }.collect().foldLeft(0.0)(math.max)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      Seq((n, lam + 0.0, r6(d))).toDF("n", "lambda_hat", "d_stat")
    } finally counts.unpersist(blocking = false)
  }

  /** Two-sample Cramér–von Mises statistic (Anderson 1962, public):
    * T = n·m/(n+m)² · Σ_pooled (F_n(z) − G_m(z))², summed over every
    * pooled observation — the WHOLE-distribution companion to
    * [[ksTwoSample]]'s single max: KS sees only the worst point, CvM
    * integrates every discrepancy, so it catches broad low-amplitude
    * drift (a slight variance change) KS shrugs at.
    *
    * Same distributed shape as KS: per-value counts, ONE
    * range-partitioned sort, per-partition running sums with broadcast
    * offsets; the accumulator is the exact BigInteger Σ t·(cumA·n_b −
    * cumB·n_a)² (the squared numerator passes 2⁶³ long before the data
    * is big), divided ONCE at the end by (n+m)²·n·m as the identical
    * double tree. Asymptotic 5%/1% critical values (0.461 / 0.743,
    * Anderson's table — the statistic's limiting distribution is
    * parameter-free) ship as literal columns with the comparison made
    * on the ROUNDED statistic. Returns one row (n_a, n_b, cvm_t,
    * reject_5pct); fails loudly on an empty side. */
  def cramerVonMises(a: DataFrame, b: DataFrame,
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
      val (nA, nB) = (offA.last, offB.last)
      require(nA > 0 && nB > 0,
        s"CvM needs both samples non-empty, got nA=$nA nB=$nB")
      val sumT = counts.mapPartitionsWithIndex { (i, it) =>
        var ca = offA(i); var cb = offB(i)
        var acc = BigInt(0)
        it.foreach { case (_, da, db) =>
          ca += da; cb += db
          val num = BigInt(ca) * nB - BigInt(cb) * nA
          acc += num * num * (da + db)
        }
        Iterator(acc)
      }.collect().sum
      val nT = nA + nB
      val t = sumT.toDouble / (nT.toDouble * nT * nA * nB)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((nA, nB, r6(t), r6(t) > 0.461))
        .toDF("n_a", "n_b", "cvm_t", "reject_5pct")
    } finally counts.unpersist(blocking = false)
  }
}
