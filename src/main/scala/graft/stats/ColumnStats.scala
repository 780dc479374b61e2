package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T1 column statistics (reference: analysis/statistics.py:105–187) as TWO
  * aggregate passes over ALL requested columns at once (never per-column
  * jobs): pass 1 computes counts/moments/exact quantiles, pass 2 counts
  * IQR outliers against the pass-1 fences.
  *
  * Estimator parity (SURVEY.md §7.4 #4): Spark's `skewness`/`kurtosis` are
  * population moments (g1, excess g2); pandas — and DuckDB — report the
  * bias-corrected sample versions (G1, excess G2). [[Moments.g1ToG1]] /
  * [[Moments.g2ToG2]] convert, so our outputs hash-match both pandas and a
  * DuckDB oracle.
  *
  * Scale: quantiles default to exact `percentile` for oracle parity; pass
  * `approxQuantiles = true` to use `percentile_approx` (mergeable sketch,
  * no global sort buffer) — the right call at 100 TB.
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

  /** Exact linear-interpolated quantiles via distributed sort +
    * zipWithIndex — Spark's built-in exact `percentile` aggregate merges
    * per-partition count maps on ONE thread (16s on 600k×3 columns);
    * sorting stays parallel and only the bracketing elements come back to
    * the driver. Matches numpy/DuckDB `quantile_cont` interpolation:
    * v = a + (idx_frac)·(b − a) at position (n−1)·p. */
  def exactQuantiles(df: DataFrame, c: String, ps: Seq[Double]): Seq[Option[Double]] =
    quantilesAndOutliers(df, c, ps)._1

  /** Quantiles plus the 1.5·IQR outlier count from the SAME cached sorted
    * RDD (assumes ps = Seq(q25, median, q75) ordering when outliers are
    * consumed) — one distributed sort serves both, no second table scan. */
  def quantilesAndOutliers(
      df: DataFrame, c: String, ps: Seq[Double]): (Seq[Option[Double]], Option[Long]) = {
    val sorted = df.select(col(c).cast(DoubleType)).na.drop()
      .rdd.map(_.getDouble(0)).sortBy(identity).zipWithIndex()
      .map { case (v, i) => (i, v) }
    sorted.cache()
    try {
      val n = sorted.count()
      if (n == 0) return (ps.map(_ => None), None)
      val positions = ps.map(p => (n - 1) * p)
      val needed = positions.flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct.toSet
      val picked = sorted.filter { case (i, _) => needed.contains(i) }
        .collect().toMap
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
        sorted.filter { case (_, v) => v < lo || v > hi }.count()
      }
      (quantiles, outliers)
    } finally sorted.unpersist(blocking = false)
  }

  def describe(
      df: DataFrame,
      cols: Seq[String],
      approxQuantiles: Boolean = false): Seq[Stats] = {
    require(cols.nonEmpty, "describe needs at least one column")

    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n__$c"),
        countDistinct(col(c)).as(s"d__$c"),
        avg(col(c)).as(s"mean__$c"),
        stddev_samp(col(c)).as(s"std__$c"),
        min(col(c)).cast(DoubleType).as(s"min__$c"),
        max(col(c)).cast(DoubleType).as(s"max__$c"),
        skewness(col(c)).as(s"skew__$c"),
        kurtosis(col(c)).as(s"kurt__$c")) ++
        (if (approxQuantiles)
          Seq(percentile_approx(col(c), array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
            .as(s"q__$c"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")

    def optD(r: Row, name: String): Option[Double] =
      Option(r.getAs[Any](name)).map(_.asInstanceOf[Number].doubleValue())

    val exactQ: Map[String, (Seq[Option[Double]], Option[Long])] =
      if (approxQuantiles) Map.empty
      else {
        // Per-column sort jobs are independent — submit them concurrently
        // so the cluster overlaps the sorts instead of running them serially.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val futures = cols.map(c =>
          Future(c -> quantilesAndOutliers(df, c, Seq(0.25, 0.5, 0.75))))
        Await.result(Future.sequence(futures), Duration.Inf).toMap
      }

    val base = cols.map { c =>
      val n = row.getAs[Long](s"n__$c")
      val qs =
        if (approxQuantiles)
          Option(row.getAs[scala.collection.Seq[Any]](s"q__$c"))
            .map(_.map(v => Option(v).map(_.asInstanceOf[Number].doubleValue())).toSeq)
        else Some(exactQ(c)._1)
      val q25 = qs.flatMap(_.lift(0).flatten)
      val med = qs.flatMap(_.lift(1).flatten)
      val q75 = qs.flatMap(_.lift(2).flatten)
      Stats(
        column = c, n = n, nulls = rows - n,
        distinct = row.getAs[Long](s"d__$c"),
        mean = optD(row, s"mean__$c"),
        std = optD(row, s"std__$c"),
        min = optD(row, s"min__$c"),
        max = optD(row, s"max__$c"),
        q25 = q25, median = med, q75 = q75,
        skew = optD(row, s"skew__$c").flatMap(Moments.g1ToG1(_, n)),
        kurt = optD(row, s"kurt__$c").flatMap(Moments.g2ToG2(_, n)),
        iqrOutliers = if (approxQuantiles) None else exactQ(c)._2)
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
  }

  /** describe() as a DataFrame (one row per column), for report sinks. */
  def describeDF(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    describe(df, cols).toDF()
  }

  /** Categorical column summary: top-k most common values with counts
    * (statistics.py:168–180 / A6). */
  def topValues(df: DataFrame, c: String, k: Int = 10): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(c).cast(StringType).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
      .limit(k)
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
