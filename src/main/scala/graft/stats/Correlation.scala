package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** T2 correlation matrix (reference: analysis/statistics.py:190–260):
  * pearson / spearman / kendall with pairwise null handling and a
  * `minPeriods` guard, plus high-correlation pair mining (>0.7).
  *
  * - pearson: ONE aggregate computes all k(k−1)/2 pairs via the ANSI-safe
  *   population form (see `safeCorr` — the builtin `corr` throws
  *   DIVIDE_BY_ZERO on constant columns under Spark 4's ANSI default;
  *   explicit pairwise null masking keeps pandas semantics).
  * - spearman: per-pair rank transform (average ranks on ties) then
  *   pearson on the ranks. Global ranking needs a total order, so each
  *   pair costs a sort — fine at the reference's scale; at 100 TB
  *   pre-rank the few columns you care about once.
  * - kendall: O(n²) pairwise concordance, driver-side on a bounded sample
  *   (the reference runs pandas' O(n²) on the full frame; we cap) — the
  *   parity default. [[kendallPairExact]] is the opt-in full-data scale
  *   path: one contingency groupBy + O(D log D) Fenwick concordance count.
  */
object Correlation {

  final case class Pair(col1: String, col2: String, r: Option[Double], n: Long)

  /** All-pairs pearson in one pass. Pairs with fewer than `minPeriods`
    * non-null rows report None (statistics.py:194, 229); zero-variance
    * pairs report NaN (pandas `.corr()` parity).
    *
    * NOT `corr(a, b)`: under ANSI mode (Spark 4 default) the builtin
    * THROWS DIVIDE_BY_ZERO when either column is constant — one constant
    * column in a user's table would kill the whole matrix (caught by
    * StatsSpec's edge-case pin). The population form is algebraically
    * identical (the n−1 factors cancel: cov_pop/(σ_pop·σ_pop) =
    * ck/√(xMk·yMk), the same co-moments corr uses) and `try_divide` turns
    * the zero-variance case into NULL, which we surface as NaN. Pairwise
    * completeness: each side is null-masked to the rows where BOTH are
    * present, matching pandas pairwise deletion. */
  /** ANSI-safe pearson aggregate: pairwise null masking + NULL (via
    * try_divide) instead of DIVIDE_BY_ZERO on zero variance. Algebraically
    * identical to `corr` — the population n's cancel. */
  private def safeCorr(a: Column, b: Column): Column = {
    val both = a.isNotNull && b.isNotNull
    val av = when(both, a)
    val bv = when(both, b)
    try_divide(covar_pop(av, bv), stddev_pop(av) * stddev_pop(bv))
  }

  def pearson(df: DataFrame, cols: Seq[String], minPeriods: Int = 10): Seq[Pair] = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    if (pairs.isEmpty) return Seq.empty
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(
        safeCorr(col(a), col(b)).as(s"r__${a}__$b"),
        count(when(col(a).isNotNull && col(b).isNotNull, 1)).as(s"n__${a}__$b"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    pairs.map { case (a, b) =>
      val n = row.getAs[Long](s"n__${a}__$b")
      val r = Option(row.getAs[Any](s"r__${a}__$b")).map(_.asInstanceOf[Double])
      Pair(a, b,
        if (n < minPeriods) None
        else Some(r.getOrElse(Double.NaN)), n)
    }
  }

  /** Average-rank transform of a numeric column (ties share the mean rank,
    * pandas `rank(method='average')`), computed WITHOUT a global Window —
    * `Window.orderBy` with no partitioning funnels the whole dataset
    * through one task, which dies at scale. Instead: per-value counts →
    * distributed sort → per-partition prefix sums with broadcast partition
    * offsets (the classic parallel scan) → join ranks back on the value.
    * avg rank of a tie group = (#smaller values) + (ties + 1)/2. */
  /** Rank-pass odometer: [[avgRank]] is the expensive unit of spearman work
    * (a distributed sort per call), so specs pin the pass COUNT — k for an
    * all-complete k-column matrix — against silent reversion to the
    * per-pair k(k−1) shape. Monotone counter; tests read before/after. */
  private[graft] val rankPasses = new java.util.concurrent.atomic.AtomicLong()

  private def avgRank(df: DataFrame, c: String): DataFrame = {
    rankPasses.incrementAndGet()
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(c).cast(DoubleType).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .as[(Double, Long)].rdd
      .sortBy(_._1)
    counts.cache()
    try {
      val partTotals = counts.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(_._2).sum))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partTotals.scanLeft(0L)(_ + _)
      val ranks = counts.mapPartitionsWithIndex { (i, it) =>
        var below = offsets(i)
        it.map { case (v, cnt) =>
          val rank = below + (cnt + 1) / 2.0
          below += cnt
          (v, rank)
        }
      }.toDF(c + "__rkkey", s"__rk_$c")
      df.join(ranks, df(c).cast(DoubleType) === ranks(c + "__rkkey"))
        .drop(c + "__rkkey")
    } finally counts.unpersist(blocking = false)
  }

  def spearmanPair(df: DataFrame, a: String, b: String, minPeriods: Int = 10): Pair = {
    val nn = df.filter(col(a).isNotNull && col(b).isNotNull).select(col(a), col(b))
    val ranked = avgRank(avgRank(nn, a), b)
    val row = ranked.agg(
      safeCorr(col(s"__rk_$a"), col(s"__rk_$b")).as("r"),
      count(lit(1)).as("n")).head()
    val n = row.getAs[Long]("n")
    val r = Option(row.getAs[Any]("r")).map(_.asInstanceOf[Double])
    Pair(a, b,
      if (n < minPeriods) None else Some(r.getOrElse(Double.NaN)), n)
  }

  /** All-pairs spearman. Columns with NO nulls are ranked ONCE (k ranking
    * passes total) and their pairs come from a single all-pairs `corr`
    * aggregate over the rank columns — the naive per-pair path costs
    * k(k−1) rank-sorts for a k-column matrix, the dominant plan cost at
    * scale. Pairs touching a null-bearing column keep the exact per-pair
    * re-rank (pandas pairwise-complete semantics: ranks are computed within
    * the pairwise non-null subset, so a shared ranking would be wrong
    * wherever null patterns differ). */
  def spearman(df: DataFrame, cols: Seq[String], minPeriods: Int = 10): Seq[Pair] = {
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    if (pairs.isEmpty) return Seq.empty
    // One aggregate: total rows + per-column non-null counts.
    val countAggs = count(lit(1)).as("__rows") +:
      cols.map(c => count(col(c)).as(s"n__$c"))
    val crow = df.agg(countAggs.head, countAggs.tail: _*).head()
    val rows = crow.getAs[Long]("__rows")
    val complete = cols.filter(c => crow.getAs[Long](s"n__$c") == rows).toSet
    val (aligned, pairwise) = pairs.partition { case (a, b) =>
      complete.contains(a) && complete.contains(b)
    }
    val fast: Map[(String, String), Pair] =
      if (aligned.isEmpty) Map.empty
      else {
        val fastCols = complete.toSeq.sorted
        val ranked = fastCols.foldLeft(df.select(fastCols.map(col): _*))(
          (d, c) => avgRank(d, c))
        val aggs = aligned.map { case (a, b) =>
          safeCorr(col(s"__rk_$a"), col(s"__rk_$b")).as(s"r__${a}__$b")
        }
        val row = ranked.agg(aggs.head, aggs.tail: _*).head()
        aligned.map { case (a, b) =>
          val r = Option(row.getAs[Any](s"r__${a}__$b")).map(_.asInstanceOf[Double])
          (a, b) -> Pair(a, b,
            if (rows < minPeriods) None else Some(r.getOrElse(Double.NaN)), rows)
        }.toMap
      }
    pairs.map { case (a, b) =>
      fast.getOrElse((a, b), spearmanPair(df, a, b, minPeriods))
    }
  }

  /** Kendall's τ-b on a driver-side sample (cap matches the reference's own
    * practical scale; sampling is seeded for reproducibility). */
  def kendallPair(df: DataFrame, a: String, b: String, maxN: Int = 5000, seed: Long = 42): Pair = {
    val nn = df.filter(col(a).isNotNull && col(b).isNotNull)
      .select(col(a).cast(DoubleType), col(b).cast(DoubleType))
    val total = nn.count()
    val data =
      (if (total > maxN) nn.sample(withReplacement = false, maxN.toDouble / total, seed).limit(maxN)
       else nn).collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = data.length
    if (n < 2) return Pair(a, b, None, n)
    var concordant = 0L; var discordant = 0L; var tiesA = 0L; var tiesB = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dx = java.lang.Double.compare(data(i)._1, data(j)._1)
        val dy = java.lang.Double.compare(data(i)._2, data(j)._2)
        if (dx == 0 && dy == 0) { tiesA += 1; tiesB += 1 }
        else if (dx == 0) tiesA += 1
        else if (dy == 0) tiesB += 1
        else if (dx * dy > 0) concordant += 1
        else discordant += 1
        j += 1
      }
      i += 1
    }
    val n0 = n.toLong * (n - 1) / 2
    val denom = math.sqrt((n0 - tiesA).toDouble * (n0 - tiesB))
    val tau = if (denom == 0) Double.NaN else (concordant - discordant) / denom
    Pair(a, b, if (tau.isNaN) None else Some(tau), n)
  }

  /** EXACT Kendall τ-b over the FULL data — the opt-in scale path next to
    * the sampled parity default of [[kendallPair]].
    *
    * One distributed `groupBy(x, y).count()` (map-side combined — the T1
    * histogram trick) reduces the data to its 2-D contingency table; the
    * driver then counts concordant/discordant pairs over the CELLS with a
    * Fenwick tree in O(D log D), D = distinct (x, y) cells — Knight's
    * merge-count collapsed onto tie groups, so heavy ties make it cheaper,
    * not slower. Exact for any row count while D ≤ `maxCells` (the realistic
    * shape for cohort variables at 100 TB: bounded domains, huge n); a
    * near-unique continuous pair (D ≈ n) is refused with a clear error
    * rather than silently OOMing the driver — use the sampled path there.
    *
    * τ-b = (nc − nd) / √((n0 − n1)(n0 − n2)), n0 = n(n−1)/2, n1/n2 = tie
    * pairs in x/y (scipy.stats.kendalltau's default variant, which the
    * reference's pandas `corr(method='kendall')` computes). */
  def kendallPairExact(
      df: DataFrame, a: String, b: String, maxCells: Int = 1 << 22): Pair = {
    val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).cast(DoubleType).as("x"), col(b).cast(DoubleType).as("y"))
      .agg(count(lit(1)).as("m"))
      .limit(maxCells + 1) // bounds the collect; overflow detected below
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"kendallPairExact($a, $b): more than $maxCells distinct (x, y) cells — " +
        "near-unique continuous pair; raise maxCells or use the sampled kendallPair")
    val n = cells.iterator.map(_._3).sum
    if (n < 2) return Pair(a, b, None, n)
    // y-rank index for the Fenwick tree.
    val ys = cells.map(_._2).distinct.sorted
    val yRank = ys.zipWithIndex.toMap
    val tree = new Array[Long](ys.length + 1)
    def add(i0: Int, v: Long): Unit = {
      var i = i0 + 1
      while (i <= ys.length) { tree(i) += v; i += i & (-i) }
    }
    def sumTo(i0: Int): Long = { // cells with yRank <= i0
      var i = i0 + 1; var s = 0L
      while (i > 0) { s += tree(i); i -= i & (-i) }
      s
    }
    // Process cells in x order; all cells of one x group are scored against
    // the tree (rows with strictly smaller x) before the group is inserted,
    // so x ties never count as concordant or discordant.
    val sorted = cells.sortBy(c => (c._1, c._2))
    var nc = 0L; var nd = 0L; var inserted = 0L
    var gi = 0
    while (gi < sorted.length) {
      var ge = gi
      while (ge < sorted.length && sorted(ge)._1 == sorted(gi)._1) ge += 1
      var i = gi
      while (i < ge) {
        val (_, y, m) = sorted(i)
        val r = yRank(y)
        val below = if (r == 0) 0L else sumTo(r - 1)
        val aboveOrEq = sumTo(ys.length - 1) - below
        val eq = sumTo(r) - below
        nc += m * below
        nd += m * (aboveOrEq - eq)
        i += 1
      }
      i = gi
      while (i < ge) { add(yRank(sorted(i)._2), sorted(i)._3); inserted += sorted(i)._3; i += 1 }
      gi = ge
    }
    def tiePairs(marginal: Iterator[Long]): Long =
      marginal.map(t => t * (t - 1) / 2).sum
    val n1 = tiePairs(cells.groupBy(_._1).valuesIterator.map(_.map(_._3).sum))
    val n2 = tiePairs(cells.groupBy(_._2).valuesIterator.map(_.map(_._3).sum))
    val n0 = n * (n - 1) / 2
    val denom = math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble)
    val tau = if (denom == 0) Double.NaN else (nc - nd) / denom
    Pair(a, b, if (tau.isNaN) None else Some(tau), n)
  }

  /** All-pairs kendall matrix — API parity with [[pearson]]/[[spearman]]
    * (pandas `corr(method='kendall')`, statistics.py:190–260).
    *
    * Routing (`exact = None`, the default): ONE aggregate estimates each
    * pair's contingency-table size (`approx_count_distinct` over the
    * non-null (x, y) struct), and every pair whose estimated cell count
    * fits comfortably (≤ maxCells/2 — the margin absorbs HLL error) runs
    * the EXACT full-data Fenwick path; only near-unique continuous pairs
    * fall back to the bounded-sample estimate. Bounded domains + huge n —
    * the realistic cohort shape — therefore get the exact answer by
    * default, at the cost of one groupBy per routed pair. `Some(true)`
    * forces exact everywhere (errors past maxCells), `Some(false)` forces
    * the sampled parity path. An exact run that still overflows its cell
    * cap (HLL under-estimate) degrades to the sample rather than failing.
    * Pairwise-complete semantics come free: both underlying paths filter
    * nulls per pair. */
  def kendall(
      df: DataFrame, cols: Seq[String], minPeriods: Int = 10,
      exact: Option[Boolean] = None, maxCells: Int = 1 << 22): Seq[Pair] = {
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    if (pairs.isEmpty) return Seq.empty
    val routeExact: ((String, String)) => Boolean = exact match {
      case Some(e) => _ => e
      case None =>
        val aggs = pairs.map { case (a, b) =>
          approx_count_distinct(
            when(col(a).isNotNull && col(b).isNotNull, struct(col(a), col(b))))
            .as(s"d__${a}__$b")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val fits = pairs.map { case (a, b) =>
          (a, b) -> (row.getAs[Long](s"d__${a}__$b") <= maxCells / 2)
        }.toMap
        fits
    }
    pairs.map { case (a, b) =>
      val p =
        if (routeExact((a, b)))
          try kendallPairExact(df, a, b, maxCells)
          catch { case _: IllegalArgumentException => kendallPair(df, a, b) }
        else kendallPair(df, a, b)
      if (p.n < minPeriods) p.copy(r = None) else p
    }
  }

  /** Pairs with |r| above `threshold` (statistics.py:465–482). */
  def highCorrelations(pairs: Seq[Pair], threshold: Double = 0.7): Seq[Pair] =
    pairs.filter(_.r.exists(r => math.abs(r) > threshold))

  /** First-order partial correlation r_xy·z (Fisher 1924, public): the
    * pearson correlation of x and y with the shared dependence on a
    * control variable z regressed out —
    * (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)). The confounder screen
    * beside the t2 matrix: a raw r_xy that collapses once z is held
    * fixed was z's correlation all along.
    *
    * Deletion is LISTWISE (rows where any of the three is null are
    * excluded) so all three r's describe the same sample — the standard
    * contract for the partial formula; pairwise-deleted r's can produce
    * |r_partial| > 1.
    *
    * Cross-engine exactness: the three r's are rounded to 6 first, the
    * partial combine runs on the ROUNDED values, and the result rounds
    * to 6 — a SQL oracle replaying corr() at round-6 folds the identical
    * doubles. One aggregate pass (three safeCorr cells + a count), one
    * row out. Returns (n, r_xy, r_xz, r_yz, r_partial); r_partial is
    * null when either control correlation is ±1 at round-6 (the formula
    * divides by zero: x or y is an affine function of z) or n <
    * `minPeriods`. */
  def partialPearson(
      df: DataFrame, x: String, y: String, z: String,
      minPeriods: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val complete = df
      .filter(col(x).isNotNull && col(y).isNotNull && col(z).isNotNull)
    val row = complete.agg(
        count(lit(1)).as("n"),
        safeCorr(col(x), col(y)).as("rxy"),
        safeCorr(col(x), col(z)).as("rxz"),
        safeCorr(col(y), col(z)).as("ryz"))
      .head()
    val n = row.getAs[Long]("n")
    def hu6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(i: Int): Option[Double] =
      Option(row.getAs[Any](i)).map(_.asInstanceOf[Double])
        .filterNot(_.isNaN).map(hu6)
    val (rxy, rxz, ryz) = (r6(1), r6(2), r6(3))
    val partial: Option[Double] =
      if (n < minPeriods) None
      else for {
        a <- rxy; b <- rxz; c <- ryz
        den = (1.0 - b * b) * (1.0 - c * c)
        if den > 0.0
      } yield hu6((a - b * c) / math.sqrt(den))
    Seq((n, rxy, rxz, ryz, partial))
      .toDF("n", "r_xy", "r_xz", "r_yz", "r_partial")
  }

  def toDF(spark: SparkSession, pairs: Seq[Pair]): DataFrame = {
    import spark.implicits._
    pairs.map(p => (p.col1, p.col2, p.r, p.n)).toDF("col1", "col2", "r", "n")
  }

  /** Lin's concordance correlation coefficient (Lin 1989, public):
    * CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²) with population (1/n)
    * moments — agreement with the 45° line, not just linearity. THE
    * replica-check statistic: Pearson r answers "do the two pipelines
    * covary", CCC answers "do they produce the SAME numbers" (a
    * constant offset or scale drift crushes CCC while r stays 1).
    *
    * ONE aggregation of five round-12 decimal moment folds; CCC and r
    * are fixed double arithmetic — oracle-replayable. Returns one row
    * (n, mean_x, mean_y, pearson_r, ccc), round-6; loud when either
    * variance is 0. */
  def linsCCC(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def fold12(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast(DoubleType)
    val x = xCol.cast(DoubleType); val y = yCol.cast(DoubleType)
    val r = df.filter(x.isNotNull && y.isNotNull && !isnan(x) && !isnan(y))
      .select(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("n"),
        fold12(col("x")).as("sx"), fold12(col("y")).as("sy"),
        fold12(col("x") * col("x")).as("sxx"),
        fold12(col("y") * col("y")).as("syy"),
        fold12(col("x") * col("y")).as("sxy")).head()
    val n = r.getAs[Long]("n")
    require(n >= 2, s"CCC needs >= 2 pairs, got $n")
    def g(i: String) = r.getAs[Double](i)
    val mx = g("sx") / n; val my = g("sy") / n
    val vx = g("sxx") / n - mx * mx
    val vy = g("syy") / n - my * my
    val cxy = g("sxy") / n - mx * my
    require(vx > 0.0 && vy > 0.0,
      "a constant series cannot concord - variance is zero")
    val ccc = 2.0 * cxy / (vx + vy + (mx - my) * (mx - my))
    val pr = cxy / math.sqrt(vx * vy)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((n, r6(mx), r6(my), r6(pr), r6(ccc)))
      .toDF("n", "mean_x", "mean_y", "pearson_r", "ccc")
  }

  /** Chatterjee's ξ rank correlation (Chatterjee 2020, "A new
    * coefficient of correlation", JASA — public): measures how much Y
    * is a FUNCTION of X — ξ → 1 for any measurable function (monotone
    * or not: a parabola scores ~1 where Pearson and Spearman score 0),
    * ξ ≈ 0 under independence. The tie-general form:
    * ξ = 1 − n·Σᵢ|r_{i+1} − rᵢ| / (2·Σᵢ lᵢ(n − lᵢ)) with rows ordered
    * by X, rᵢ = #{j: yⱼ ≤ yᵢ}, lᵢ = #{j: yⱼ ≥ yᵢ}. Ties in X are
    * broken by `tieCol` — a DETERMINISTIC unique long id (the paper
    * randomizes; determinism is what makes the result an artifact) —
    * so the value is a pure function of the data.
    *
    * Distributed shape: one y-value count aggregation + partition-offset
    * scan for the cumulative ranks (distinct-y-sized), a shuffle join
    * back on y, then ONE range-partitioned sort of (x, tie) rows with
    * per-partition adjacent-difference sums — boundary gaps close via
    * the broadcast next-partition-first array (the wasserstein1 idiom);
    * NO unpartitioned window. Every accumulated quantity is an exact
    * integer. Returns one row (n, n_distinct_y, xi), round-6; loud when
    * y is constant (dependence undefined). */
  def xicor(df: DataFrame, xCol: Column, yCol: Column,
      tieCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(xCol.cast("double").as("x"),
        yCol.cast("double").as("y"), tieCol.cast("long").as("t"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("t").isNotNull && !isnan(col("x")) && !isnan(col("y")))
    // (y, cumLE, cnt) via the partition-offset scan over distinct y
    val yCounts = base.groupBy("y").agg(count(lit(1)).as("c"))
      .as[(Double, Long)].rdd.sortBy(_._1)
    yCounts.cache()
    try {
      val sizes = yCounts.mapPartitionsWithIndex { (i, it) =>
        var s = 0L; var k = 0L
        it.foreach { t => s += t._2; k += 1 }
        Iterator((i, s, k))
      }.collect().sortBy(_._1)
      val offs = sizes.map(_._2).scanLeft(0L)(_ + _)
      val n = offs.last
      require(n >= 2, s"xi needs >= 2 rows, got $n")
      val nDistinctY = sizes.map(_._3).sum
      val withRank = yCounts.mapPartitionsWithIndex { (i, it) =>
        var cum = offs(i)
        it.map { case (y, c) =>
          cum += c
          (y, cum, c) // cumLE through this value
        }
      }
      // denominator Σ c·ge·(n−ge) folded per partition in exact decimals
      val den = withRank.mapPartitions { it =>
        var acc = java.math.BigDecimal.ZERO
        it.foreach { case (_, cumLE, c) =>
          val ge = n - cumLE + c
          acc = acc.add(java.math.BigDecimal.valueOf(c)
            .multiply(java.math.BigDecimal.valueOf(ge))
            .multiply(java.math.BigDecimal.valueOf(n - ge)))
        }
        Iterator(acc)
      }.collect().foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      require(den.signum > 0,
        "y is constant - functional dependence on x is undefined")
      val yRanks = withRank.map { case (y, cumLE, _) => (y, cumLE) }
        .toDF("y", "r")
      val rows = base.join(yRanks, "y")
        .select(col("x"), col("t"), col("r"))
        .as[(Double, Long, Long)].rdd
        .sortBy(r => (r._1, r._2))
      rows.cache()
      try {
      val partInfo = rows.mapPartitionsWithIndex { (i, it) =>
        var first: Option[Long] = None
        var last: Option[Long] = None
        var sum = 0L
        var prev: Option[Long] = None
        it.foreach { case (_, _, r) =>
          if (first.isEmpty) first = Some(r)
          prev.foreach(p => sum += math.abs(r - p))
          prev = Some(r)
          last = Some(r)
        }
        Iterator((i, first, last, sum))
      }.collect().sortBy(_._1)
      // within-partition sums + the boundary gaps between consecutive
      // non-empty partitions (driver arithmetic over |partitions| scalars)
      var num = partInfo.map(_._4).sum
      var prevLast: Option[Long] = None
      partInfo.foreach { case (_, first, last, _) =>
        for (p <- prevLast; f <- first) num += math.abs(f - p)
        if (last.nonEmpty) prevLast = last
      }
        val xi = 1.0 - n.toDouble * num / (2.0 * den.doubleValue)
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        Seq((n, nDistinctY, r6(xi))).toDF("n", "n_distinct_y", "xi")
      } finally rows.unpersist(blocking = false)
    } finally yCounts.unpersist(blocking = false)
  }
}
