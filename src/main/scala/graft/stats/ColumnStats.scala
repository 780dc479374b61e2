package graft.stats

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T1 column statistics (reference: analysis/statistics.py:105–187) as TWO
  * full-data passes over ALL requested columns at once (never per-column
  * jobs): pass 1 is a plain aggregate for counts/moments (no countDistinct,
  * so no Expand blow-up), pass 2 builds ONE value histogram for all columns
  * (`groupBy(col_name, value)`, map-side combined) from which exact
  * quantiles, distinct counts and IQR outlier counts are all derived —
  * histogram-sized work instead of data-sized sorts.
  *
  * Estimator parity (SURVEY.md §7.4 #4): Spark's `skewness`/`kurtosis` are
  * population moments (g1, excess g2); pandas — and DuckDB — report the
  * bias-corrected sample versions (G1, excess G2). [[Moments.g1ToG1]] /
  * [[Moments.g2ToG2]] convert, so our outputs hash-match both pandas and a
  * DuckDB oracle.
  *
  * Scale: the histogram shuffle carries at most one row per distinct value
  * per column (map-side combine collapses repeats), and the per-column
  * quantile extraction runs a distributed prefix-sum over the sorted
  * histogram — nothing data-sized ever funnels through one task, and a
  * near-unique column degrades to exactly the cost of the sort it needs.
  * Pass `approxQuantiles = true` for the sketch path (`percentile_approx` +
  * `approx_count_distinct`, both mergeable) when estimator error is
  * acceptable — the cheapest call at 100 TB.
  */
object ColumnStats {

  final case class Stats(
      column: String,
      n: Long,
      nulls: Long,
      distinct: Long,
      mean: Option[Double],
      std: Option[Double],
      min: Option[Double],
      max: Option[Double],
      q25: Option[Double],
      median: Option[Double],
      q75: Option[Double],
      skew: Option[Double],
      kurt: Option[Double],
      iqrOutliers: Option[Long])

  /** Exact quantiles / distinct / outlier count per column, all computed
    * from one cached (value, count) histogram. */
  private final case class HistStats(
      quantiles: Seq[Option[Double]],
      distinct: Long,
      outliers: Option[Long])

  /** Exact linear-interpolated quantiles. Matches numpy/DuckDB
    * `quantile_cont` interpolation: v = a + idx_frac·(b − a) at position
    * (n−1)·p. */
  def exactQuantiles(df: DataFrame, c: String, ps: Seq[Double]): Seq[Option[Double]] =
    quantilesAndOutliers(df, c, ps)._1

  /** Quantiles plus the 1.5·IQR outlier count (assumes ps = Seq(q25, median,
    * q75) ordering when outliers are consumed). */
  def quantilesAndOutliers(
      df: DataFrame, c: String, ps: Seq[Double]): (Seq[Option[Double]], Option[Long]) = {
    val h = histogramStats(df, Seq(c), ps)(c)
    (h.quantiles, h.outliers)
  }

  /** Histograms at or below this entry count are collected and finished on
    * the driver (one job, ~1 MB); above it the distributed prefix-scan path
    * runs. Most real columns are low-cardinality, so at scale this turns
    * T1 into [one agg + one groupBy + one tiny collect per column]; only
    * near-unique columns pay a distributed sort — which for them is the
    * histogram ≈ the data, i.e. the sort they fundamentally need. */
  val SmallHistEntries: Long = 65536

  /** Upper bound for driver-finishing a ROUTED-OUT (high-cardinality)
    * column's own histogram: ≤ this many (value, count) entries (~32 MB at
    * 2M) still collect and finish locally — the distributed prefix-scan
    * (a range-partitioned sort plus three follow-up jobs) only pays for
    * itself beyond that. Routing uses pass 1's HLL estimate (±~2.5% rsd),
    * so the bound is approximate by design: a mis-estimate lands on the
    * other path, which computes the identical answer (r18). */
  val DriverHistEntries: Long = 2000000

  /** ONE histogram pass for all columns: explode to (col, value) pairs,
    * `groupBy(col, value).count()` (map-side combined), then per-column
    * finishing — driver-side for small histograms, distributed prefix-scan
    * for near-unique ones (identical arithmetic either way).
    *
    * Columns in `highCard` (routed by the caller's cheap
    * `approx_count_distinct` probe from pass 1) SKIP the combined
    * histogram entirely: a near-unique column's histogram ≈ the data, so
    * folding it into the shared explode+groupBy makes every other column's
    * shuffle data-sized and caches a data-sized histogram for nothing.
    * Instead each high-cardinality column runs its own narrow
    * groupBy(value) → prefix-scan sort — exactly the sort it fundamentally
    * needs, nothing more. Routing is purely a performance decision: the
    * arithmetic is identical on every path, and a mis-estimated column
    * still lands on a correct (just less optimal) path.
    *
    * For non-floating-point columns the histogram is keyed on the NATIVE value
    * (its exact string rendering, injective per column — two longs beyond
    * 2^53 that collapse to one double stay two entries, so `distinct`
    * matches pandas `nunique` on native values, analysis/statistics.py:121);
    * the double cast is used only for ordering and quantile interpolation,
    * where double precision is inherent to the arithmetic anyway. Float and
    * double columns key on the double ALONE: their string renders are not a
    * finer partition of the value space but a different one — "0.0" vs
    * "-0.0" — and grouping's float normalization must be what merges ±0.0
    * into one distinct value, as pandas `nunique` does. */
  private def histogramStats(
      df: DataFrame, cols: Seq[String], ps: Seq[Double],
      highCard: Set[String] = Set.empty,
      cardEstimates: Map[String, Long] = Map.empty): Map[String, HistStats] = {
    def exactKey(c: String): Column = df.schema(c).dataType match {
      case FloatType | DoubleType => lit(null).cast(StringType)
      case _ => col(c).cast(StringType)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val (big, small) = cols.partition(highCard)

    // Routed-out (high-cardinality) columns: per-column narrow histogram
    // (no shared explode, no cache), finished on the driver while the
    // entry count stays collectable ([[DriverHistEntries]], by pass 1's
    // HLL estimate) and by the distributed prefix-scan beyond that —
    // identical interpolation/outlier arithmetic on both paths.
    val bigFutures = big.map { c =>
      Future {
        val hist = df
          .select(col(c).cast(DoubleType).as("v"), exactKey(c).as("vs"))
          .filter(col("v").isNotNull && !isnan(col("v")))
          .groupBy("v", "vs").agg(count(lit(1)).as("n"))
          .select("v", "n")
        c -> (if (cardEstimates.getOrElse(c, Long.MaxValue) <= DriverHistEntries)
          colFromLocalHist(
            hist.collect().map(r => (r.getDouble(0), r.getLong(1))), ps)
        else
          colFromHist(hist.rdd.map(r => (r.getDouble(0), r.getLong(1))), ps))
      }
    }

    val smallResults: Seq[(String, HistStats)] = if (small.isEmpty) Seq.empty else {
      val pairs = df.select(explode(array(small.map(c =>
          struct(lit(c).as("c"), col(c).cast(DoubleType).as("v"),
            exactKey(c).as("vs"))): _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"), col("p.vs").as("vs"))
        // NaN must be excluded like null (pandas/DuckDB quantile semantics) —
        // a NaN entering the histogram sorts last and poisons quantiles
        .filter(col("v").isNotNull && !isnan(col("v")))
      val hist = pairs.groupBy("c", "v", "vs").agg(count(lit(1)).as("n"))
      // Pass 1's HLL estimates bound the combined entry count of every
      // small column: when the sum fits the driver-finish budget, collect
      // the WHOLE combined histogram in ONE job and split it locally —
      // no cache, no sizes job, no per-column filter+collect job each
      // (was 2 + |small| jobs over a cached histogram; identical
      // colFromLocalHist arithmetic either way). The estimate is ±~2.5%
      // rsd, so the budget is approximate by design — an over-run still
      // lands on a correct path, just a bigger single collect.
      val estSum = small.iterator
        .map(c => cardEstimates.getOrElse(c, Long.MaxValue))
        .foldLeft(0L)((a, x) => if (a < 0 || x == Long.MaxValue) -1L else a + x)
      if (estSum >= 0 && estSum <= DriverHistEntries) {
        val rows = hist.collect()
        small.map { c =>
          val entries = rows.iterator.filter(_.getString(0) == c)
            .map(r => (r.getDouble(1), r.getLong(3))).toArray
          c -> colFromLocalHist(entries, ps)
        }
      } else {
        val cached = hist.cache()
        try {
          // Materializes the cache AND sizes each column's histogram (one job).
          val sizes: Map[String, Long] = cached.groupBy("c").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val futures = small.map { c =>
            Future(c ->
              (if (sizes.getOrElse(c, 0L) <= SmallHistEntries)
                colFromLocalHist(
                  cached.filter(col("c") === c).select("v", "n")
                    .collect().map(r => (r.getDouble(0), r.getLong(1))), ps)
              else
                colFromHist(
                  cached.filter(col("c") === c).select("v", "n")
                    .rdd.map(r => (r.getDouble(0), r.getLong(1))), ps)))
          }
          // Await inside the try: the cache must outlive the small-column jobs
          Await.result(Future.sequence(futures), Duration.Inf)
        } finally cached.unpersist(blocking = false)
      }
    }
    (Await.result(Future.sequence(bigFutures), Duration.Inf) ++ smallResults).toMap
  }

  /** Driver-side twin of [[colFromHist]] for bounded histograms — the SAME
    * interpolation and outlier arithmetic, zero extra Spark jobs. */
  private def colFromLocalHist(
      entries: Array[(Double, Long)], ps: Seq[Double]): HistStats = {
    if (entries.isEmpty) return HistStats(ps.map(_ => None), 0L, None)
    val sorted = entries.sortBy(_._1)
    val nTotal = sorted.iterator.map(_._2).sum
    val positions = ps.map(p => (nTotal - 1) * p)
    def valueAt(idx: Long): Double = {
      var below = 0L
      var i = 0
      while (i < sorted.length) {
        below += sorted(i)._2
        if (idx < below) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    val quantiles = positions.map { pos =>
      val lo = valueAt(math.floor(pos).toLong)
      val hi = valueAt(math.ceil(pos).toLong)
      Some(lo + (pos - math.floor(pos)) * (hi - lo))
    }
    val outliers = for {
      q25 <- quantiles.headOption.flatten
      q75 <- quantiles.lastOption.flatten
    } yield {
      val iqr = q75 - q25
      val lo = q25 - 1.5 * iqr
      val hi = q75 + 1.5 * iqr
      sorted.iterator.filter { case (v, _) => v < lo || v > hi }.map(_._2).sum
    }
    HistStats(quantiles, sorted.length.toLong, outliers)
  }

  /** Exact quantiles from a per-column (value, count) histogram via the
    * classic parallel prefix-scan: sort the histogram, per-partition count
    * totals → broadcast offsets, each entry then knows its global index
    * range [below, below+count). Only the bracketing values come back. */
  private def colFromHist(h: RDD[(Double, Long)], ps: Seq[Double]): HistStats = {
    val sorted = h.sortBy(_._1)
    sorted.cache()
    try {
      // One pass collects per-partition row totals AND entry counts (the
      // entry count sum is the distinct count — no separate count() job).
      val partStats = sorted.mapPartitionsWithIndex { (i, it) =>
        var rows = 0L; var entries = 0L
        it.foreach { e => rows += e._2; entries += 1 }
        Iterator((i, rows, entries))
      }.collect().sortBy(_._1)
      val offsets = partStats.map(_._2).scanLeft(0L)(_ + _)
      val nTotal = offsets.last
      if (nTotal == 0) return HistStats(ps.map(_ => None), 0L, None)
      val distinct = partStats.map(_._3).sum
      val positions = ps.map(p => (nTotal - 1) * p)
      val needed = positions.flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct.sorted
      val picked = sorted.mapPartitionsWithIndex { (i, it) =>
        var below = offsets(i)
        it.flatMap { case (v, cnt) =>
          val lo = below
          below += cnt
          val hi = below
          needed.iterator.filter(idx => idx >= lo && idx < hi).map(idx => (idx, v))
        }
      }.collect().toMap
      val quantiles = positions.map { pos =>
        val lo = picked(math.floor(pos).toLong)
        val hi = picked(math.ceil(pos).toLong)
        Some(lo + (pos - math.floor(pos)) * (hi - lo))
      }
      val outliers = for {
        q25 <- quantiles.headOption.flatten
        q75 <- quantiles.lastOption.flatten
      } yield {
        val iqr = q75 - q25
        val lo = q25 - 1.5 * iqr
        val hi = q75 + 1.5 * iqr
        sorted.filter { case (v, _) => v < lo || v > hi }
          .map(_._2).fold(0L)(_ + _)
      }
      HistStats(quantiles, distinct, outliers)
    } finally sorted.unpersist(blocking = false)
  }

  def describe(
      df0: DataFrame,
      cols: Seq[String],
      approxQuantiles: Boolean = false): Seq[Stats] = {
    require(cols.nonEmpty, "describe needs at least one column")
    // project to the profiled columns, then widen a compact input: the
    // moment pass, histogram pass, and outlier pass are all map-heavy
    // and would otherwise inherit a single file's one-task parallelism.
    // PERSISTED for the duration of the call (released in the finally):
    // describe runs two to three full passes over this projection (the
    // moment aggregate, the value histogram, and — approx path — the
    // outlier fence count), and without the persist each pass re-decoded
    // the source and re-ran the widening shuffle (r18: three parquet
    // decodes per T1 call, each single-task on a compact input).
    val df = graft.core.Parallelism.widen(
      df0.select(cols.map(org.apache.spark.sql.functions.col): _*)).persist()
    try {

    // Pass 1: plain aggregate — exact distinct comes from the histogram
    // (exact path) or approx_count_distinct (sketch path), so no
    // countDistinct and therefore no Expand multiplying the scan.
    // The exact path ALSO carries approx_count_distinct — not as output,
    // but as the cardinality probe that routes near-unique columns past
    // the combined histogram (an HLL sketch per column is mergeable,
    // codegen'd, and ~free inside an aggregate that scans anyway).
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n__$c"),
        avg(col(c)).as(s"mean__$c"),
        stddev_samp(col(c)).as(s"std__$c"),
        min(col(c)).cast(DoubleType).as(s"min__$c"),
        max(col(c)).cast(DoubleType).as(s"max__$c"),
        skewness(col(c)).as(s"skew__$c"),
        kurtosis(col(c)).as(s"kurt__$c"),
        approx_count_distinct(col(c)).as(s"d__$c")) ++
        (if (approxQuantiles)
          Seq(
            percentile_approx(col(c), array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
              .as(s"q__$c"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")

    def optD(r: Row, name: String): Option[Double] =
      Option(r.getAs[Any](name)).map(_.asInstanceOf[Number].doubleValue())

    // Route columns whose estimated cardinality exceeds the driver-finish
    // bound to their own sort path. The HLL estimate (±~2.5% rsd) only
    // steers performance: an under-estimate keeps today's combined-path
    // behavior (sized by TRUE entry count), an over-estimate just runs a
    // narrow per-column sort that is also exact.
    val highCard: Set[String] =
      if (approxQuantiles) Set.empty
      else cols.filter(c => row.getAs[Long](s"d__$c") > SmallHistEntries).toSet
    val exactH: Map[String, HistStats] =
      if (approxQuantiles) Map.empty
      else histogramStats(df, cols, Seq(0.25, 0.5, 0.75), highCard,
        cols.map(c => c -> row.getAs[Long](s"d__$c")).toMap)

    val base = cols.map { c =>
      val n = row.getAs[Long](s"n__$c")
      val qs =
        if (approxQuantiles)
          Option(row.getAs[scala.collection.Seq[Any]](s"q__$c"))
            .map(_.map(v => Option(v).map(_.asInstanceOf[Number].doubleValue())).toSeq)
        else Some(exactH(c).quantiles)
      val q25 = qs.flatMap(_.lift(0).flatten)
      val med = qs.flatMap(_.lift(1).flatten)
      val q75 = qs.flatMap(_.lift(2).flatten)
      Stats(
        column = c, n = n, nulls = rows - n,
        distinct =
          if (approxQuantiles) row.getAs[Long](s"d__$c") else exactH(c).distinct,
        mean = optD(row, s"mean__$c"),
        std = optD(row, s"std__$c"),
        min = optD(row, s"min__$c"),
        max = optD(row, s"max__$c"),
        q25 = q25, median = med, q75 = q75,
        skew = optD(row, s"skew__$c").flatMap(Moments.g1ToG1(_, n)),
        kurt = optD(row, s"kurt__$c").flatMap(Moments.g2ToG2(_, n)),
        iqrOutliers = if (approxQuantiles) None else exactH(c).outliers)
    }
    if (!approxQuantiles) return base

    // Approx path pass 2: outlier counts against 1.5*IQR fences, one aggregate.
    val withFences = base.filter(s => s.q25.nonEmpty && s.q75.nonEmpty)
    if (withFences.isEmpty) base
    else {
      val outAggs = withFences.map { s =>
        val iqr = s.q75.get - s.q25.get
        val lo = s.q25.get - 1.5 * iqr
        val hi = s.q75.get + 1.5 * iqr
        sum(when(col(s.column) < lo || col(s.column) > hi, 1L).otherwise(0L))
          .as(s"o__${s.column}")
      }
      val orow = df.agg(outAggs.head, outAggs.tail: _*).head()
      base.map { s =>
        if (s.q25.isEmpty || s.q75.isEmpty) s
        else s.copy(iqrOutliers =
          Some(Option(orow.getAs[Any](s"o__${s.column}")).fold(0L)(_.asInstanceOf[Long])))
      }
    }
    } finally df.unpersist(blocking = false)
  }

  /** describe() as a DataFrame (one row per column), for report sinks. */
  def describeDF(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    describe(df, cols).toDF()
  }

  /** Equal-width binned histogram for report rendering: `nBins` counts per
    * column over its [min, max] (from already-computed [[Stats]]), ONE
    * explode + map-side-combined groupBy pass for all columns — the shuffle
    * carries at most nBins rows per column regardless of data size. Columns
    * without a numeric range (all-null) are omitted; a single-valued column
    * (min == max) lands entirely in bin 0. */
  def equiWidthHistograms(
      df: DataFrame, stats: Seq[Stats], nBins: Int = 20): Map[String, Seq[Long]] = {
    val ranged = stats.flatMap(s => for { mn <- s.min; mx <- s.max } yield (s.column, mn, mx))
    if (ranged.isEmpty) return Map.empty
    def binExpr(c: String, mn: Double, mx: Double): Column = {
      val v = col(c).cast(DoubleType)
      val bin =
        if (mx == mn) lit(0)
        else least(lit(nBins - 1), greatest(lit(0),
          floor((v - lit(mn)) / lit((mx - mn) / nBins)).cast("int")))
      when(v.isNotNull && !isnan(v), bin)
    }
    val counts = df.select(explode(array(ranged.map { case (c, mn, mx) =>
        struct(lit(c).as("c"), binExpr(c, mn, mx).as("bin"))
      }: _*)).as("p"))
      .select(col("p.c").as("c"), col("p.bin").as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy("c", "bin").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    ranged.map { case (c, _, _) =>
      val bins = new Array[Long](nBins)
      counts.iterator.filter(_._1 == c).foreach { case (_, b, n) => bins(b) = n }
      c -> bins.toSeq
    }.toMap
  }

  /** 2-D equal-width histogram for one numeric column pair — the
    * "interactions" pane of an explorative profile (ydata-profiling's
    * interaction plots; reference pages/profiling.py:74–77 exposes them via
    * `explorative=True`). Returns (bin_x, bin_y, n) rows, distributed all
    * the way: the shuffle carries at most nBins² rows regardless of data
    * size. Bin arithmetic is identical to [[equiWidthHistograms]] so an SQL
    * oracle reproduces it bit-for-bit. */
  def interactionBins(
      df: DataFrame, x: String, y: String,
      xMin: Double, xMax: Double, yMin: Double, yMax: Double,
      nBins: Int = 12): DataFrame = {
    def bin(c: String, mn: Double, mx: Double): Column = {
      val v = col(c).cast(DoubleType)
      if (mx == mn) lit(0)
      else least(lit(nBins - 1), greatest(lit(0),
        floor((v - lit(mn)) / lit((mx - mn) / nBins)).cast("int")))
    }
    df.filter(col(x).isNotNull && !isnan(col(x).cast(DoubleType)) &&
              col(y).isNotNull && !isnan(col(y).cast(DoubleType)))
      .select(bin(x, xMin, xMax).as("bin_x"), bin(y, yMin, yMax).as("bin_y"))
      .groupBy("bin_x", "bin_y").agg(count(lit(1)).as("n"))
  }

  /** All-pairs 2-D histograms in ONE explode + map-side-combined groupBy
    * pass (same shape as [[equiWidthHistograms]]): the shuffle carries at
    * most nBins² rows per pair. Ranges come from already-computed [[Stats]];
    * pairs whose either column lacks a range are omitted. Returned grids are
    * indexed `grid(binX)(binY)`. */
  def interactionHistograms(
      df: DataFrame, stats: Seq[Stats], pairs: Seq[(String, String)],
      nBins: Int = 12): Seq[(String, String, Seq[Seq[Long]])] = {
    val range = stats.flatMap(s =>
      for { mn <- s.min; mx <- s.max } yield s.column -> (mn, mx)).toMap
    val usable = pairs.filter(p => range.contains(p._1) && range.contains(p._2))
    if (usable.isEmpty) return Seq.empty
    def binExpr(c: String, mn: Double, mx: Double): Column = {
      val v = col(c).cast(DoubleType)
      val b =
        if (mx == mn) lit(0)
        else least(lit(nBins - 1), greatest(lit(0),
          floor((v - lit(mn)) / lit((mx - mn) / nBins)).cast("int")))
      when(v.isNotNull && !isnan(v), b)
    }
    val counts = df.select(explode(array(usable.zipWithIndex.map {
        case ((x, y), i) =>
          val (xmn, xmx) = range(x); val (ymn, ymx) = range(y)
          struct(lit(i).as("p"),
            binExpr(x, xmn, xmx).as("bx"), binExpr(y, ymn, ymx).as("by"))
      }: _*)).as("e"))
      .select(col("e.p").as("p"), col("e.bx").as("bx"), col("e.by").as("by"))
      .filter(col("bx").isNotNull && col("by").isNotNull)
      .groupBy("p", "bx", "by").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    usable.zipWithIndex.map { case ((x, y), i) =>
      val grid = Array.fill(nBins)(new Array[Long](nBins))
      counts.iterator.filter(_._1 == i)
        .foreach { case (_, bx, by, n) => grid(bx)(by) = n }
      (x, y, grid.map(_.toSeq).toSeq)
    }
  }

  /** Categorical column summary: top-k most common values with counts
    * (statistics.py:168–180 / A6). */
  def topValues(df: DataFrame, c: String, k: Int = 10): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(c).cast(StringType).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
      .limit(k)

  /** Frequency tables for MANY categorical columns in one data pass — the
    * categorical panes of a profile (ydata-profiling's per-variable value
    * tables). ONE explode + map-side-combined groupBy reads the data once
    * for all columns; per-column distinct counts then split the columns:
    * those with ≤ `maxDistinct` values get a driver-finished top-k table
    * (bounded collect: ≤ maxDistinct·|cols| rows), the rest are reported
    * high-cardinality with no table — the same guard the reference applies
    * at 1000 uniques (A5, generic_data/displays.py) — so no unbounded value
    * set is ever collected or windowed. Ties break by value ascending. */
  def categoricalFrequencies(
      df: DataFrame, cols: Seq[String], k: Int = 10, maxDistinct: Int = 1000)
      : (Map[String, Seq[(String, Long)]], Set[String]) = {
    if (cols.isEmpty) return (Map.empty, Set.empty)
    val counts = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("c", "v").agg(count(lit(1)).as("n"))
      .persist()
    try {
      val sizes = counts.groupBy("c").agg(count(lit(1)).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val high = cols.filter(c => sizes.getOrElse(c, 0L) > maxDistinct).toSet
      val low = cols.filterNot(high)
      val tables =
        if (low.isEmpty) Map.empty[String, Seq[(String, Long)]]
        else {
          val rows = counts.filter(col("c").isin(low: _*))
            .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          low.map { c =>
            c -> rows.iterator.filter(_._1 == c).map(t => (t._2, t._3)).toSeq
              .sortBy { case (v, n) => (-n, v) }.take(k)
          }.toMap
        }
      (tables, high)
    } finally { counts.unpersist(); () }
  }
}

/** Moment-estimator conversions between population (Spark) and
  * bias-corrected sample (pandas/DuckDB) skewness/kurtosis. */
object Moments {
  /** g1 (population skew) → G1 (sample skew): G1 = g1·√(n(n−1))/(n−2). */
  def g1ToG1(g1: Double, n: Long): Option[Double] =
    if (n < 3) None
    else Some(g1 * math.sqrt(n.toDouble * (n - 1)) / (n - 2))

  /** excess g2 (population) → excess G2 (sample):
    * G2 = ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3)). */
  def g2ToG2(g2: Double, n: Long): Option[Double] =
    if (n < 4) None
    else Some(((n + 1) * g2 + 6) * (n - 1).toDouble / ((n - 2).toDouble * (n - 3)))
}
