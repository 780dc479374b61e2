package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** T2 correlation matrix (reference: analysis/statistics.py:190–260):
  * pearson / spearman / kendall with pairwise null handling and a
  * `minPeriods` guard, plus high-correlation pair mining (>0.7).
  *
  * - pearson: ONE aggregate computes all k(k−1)/2 `corr` pairs (Spark's
  *   `corr` ignores rows with a null on either side — pandas pairwise
  *   semantics for free).
  * - spearman: per-pair rank transform (average ranks on ties) then
  *   pearson on the ranks. Global ranking needs a total order, so each
  *   pair costs a sort — fine at the reference's scale; at 100 TB
  *   pre-rank the few columns you care about once.
  * - kendall: O(n²) pairwise concordance, driver-side on a bounded sample
  *   (the reference runs pandas' O(n²) on the full frame; we cap).
  */
object Correlation {

  final case class Pair(col1: String, col2: String, r: Option[Double], n: Long)

  /** All-pairs pearson in one pass. Pairs with fewer than `minPeriods`
    * non-null rows report None (statistics.py:194, 229). */
  def pearson(df: DataFrame, cols: Seq[String], minPeriods: Int = 10): Seq[Pair] = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    if (pairs.isEmpty) return Seq.empty
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(
        corr(col(a), col(b)).as(s"r__${a}__$b"),
        count(when(col(a).isNotNull && col(b).isNotNull, 1)).as(s"n__${a}__$b"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    pairs.map { case (a, b) =>
      val n = row.getAs[Long](s"n__${a}__$b")
      val r = Option(row.getAs[Any](s"r__${a}__$b")).map(_.asInstanceOf[Double])
      Pair(a, b, if (n < minPeriods) None else r, n)
    }
  }

  /** Average-rank transform of a numeric column (ties share the mean rank,
    * pandas `rank(method='average')`), computed WITHOUT a global Window —
    * `Window.orderBy` with no partitioning funnels the whole dataset
    * through one task, which dies at scale. Instead: per-value counts →
    * distributed sort → per-partition prefix sums with broadcast partition
    * offsets (the classic parallel scan) → join ranks back on the value.
    * avg rank of a tie group = (#smaller values) + (ties + 1)/2. */
  private def avgRank(df: DataFrame, c: String): DataFrame = {
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
      corr(col(s"__rk_$a"), col(s"__rk_$b")).as("r"),
      count(lit(1)).as("n")).head()
    val n = row.getAs[Long]("n")
    val r = Option(row.getAs[Any]("r")).map(_.asInstanceOf[Double])
    Pair(a, b, if (n < minPeriods) None else r, n)
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
          corr(col(s"__rk_$a"), col(s"__rk_$b")).as(s"r__${a}__$b")
        }
        val row = ranked.agg(aggs.head, aggs.tail: _*).head()
        aligned.map { case (a, b) =>
          val r = Option(row.getAs[Any](s"r__${a}__$b")).map(_.asInstanceOf[Double])
          (a, b) -> Pair(a, b, if (rows < minPeriods) None else r, rows)
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

  /** Pairs with |r| above `threshold` (statistics.py:465–482). */
  def highCorrelations(pairs: Seq[Pair], threshold: Double = 0.7): Seq[Pair] =
    pairs.filter(_.r.exists(r => math.abs(r) > threshold))

  def toDF(spark: SparkSession, pairs: Seq[Pair]): DataFrame = {
    import spark.implicits._
    pairs.map(p => (p.col1, p.col2, p.r, p.n)).toDF("col1", "col2", "r", "n")
  }
}
