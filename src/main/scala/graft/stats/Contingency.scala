package graft.stats

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-square test of independence between two categorical columns — the
  * standard "are these two labels related" screen (reference analog: the
  * categorical half of the profiling interactions report).
  *
  * One groupBy builds the contingency cells; row/column/grand totals ride
  * window sums over the tiny cell table (cells = |A|×|B|, bounded by the
  * categorical premise — no data-sized state). Expected counts and cell
  * contributions ((o−e)²/e) derive from EXACT integer counts, so the
  * whole table is engine-portable; the χ² statistic is their sum and the
  * p-value comes from commons-math3's χ² CDF driver-side (cells are
  * already driver-small).
  *
  * Zero-margin cells (a level absent from a row/column) cannot occur —
  * cells exist only for observed pairs, and expected = rowTot·colTot/n is
  * positive on every observed cell. Levels missing entirely from one
  * margin reduce the dof accordingly (dof = (|A|−1)(|B|−1) over observed
  * levels).
  */
object Contingency {

  final case class ChiSquareResult(
      chi2: Double, dof: Long, pValue: Double, n: Long)

  /** Contingency cells with expected counts and χ² contributions:
    * (a, b, observed, expected, contrib), ordered by (a, b). */
  def cells(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("observed"))
    val all = Window.partitionBy()
    val byA = Window.partitionBy(col("a"))
    val byB = Window.partitionBy(col("b"))
    counts
      .withColumn("__n", sum(col("observed")).over(all))
      .withColumn("__ra", sum(col("observed")).over(byA))
      .withColumn("__cb", sum(col("observed")).over(byB))
      .withColumn("expected",
        col("__ra").cast("double") * col("__cb") / col("__n"))
      .withColumn("contrib",
        (col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected"))
      .select(col("a"), col("b"), col("observed"), col("expected"),
        col("contrib"))
      .orderBy("a", "b")
  }

  /** Per-cell mutual-information terms over the same contingency cells:
    * (a, b, observed, term) with term = round((o/n)·ln(o·n/(ra·cb)), 9).
    * Factors go through double BEFORE multiplying (long products of two
    * 10¹¹-row marginals overflow), and the per-cell round makes the
    * downstream decimal sum order-invariant and engine-exact. */
  def miTerms(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("observed"))
    val all = Window.partitionBy()
    val byA = Window.partitionBy(col("a"))
    val byB = Window.partitionBy(col("b"))
    counts
      .withColumn("__n", sum(col("observed")).over(all))
      .withColumn("__ra", sum(col("observed")).over(byA))
      .withColumn("__cb", sum(col("observed")).over(byB))
      .withColumn("term",
        round((col("observed").cast("double") / col("__n")) *
          log((col("observed").cast("double") * col("__n")) /
            (col("__ra").cast("double") * col("__cb"))), 9))
  }

  /** Mutual information I(A;B) in nats, with the marginal entropies and
    * the min-normalized NMI — the feature-selection / target-leakage
    * screen next to [[chiSquare]]: MI ≈ 0 says a feature carries nothing
    * about the label; NMI ≈ 1 says it IS the label (leakage). One cell
    * aggregation; every sum is a decimal fold of per-term rounded
    * doubles, so shard order cannot perturb the result. Returns one row
    * (mi, h_a, h_b, nmi, n); NMI is null when either side is constant
    * (min entropy 0 — normalization undefined). */
  def mutualInformation(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = miTerms(df, colA, colB)
    def entropyOf(margin: String, cnt: String) = cells
      .groupBy(col(margin)).agg(
        max(col(cnt)).as("c"), max(col("__n")).as("n"))
      .select(round(-(col("c").cast("double") / col("n")) *
        log(col("c").cast("double") / col("n")), 9).as("t"))
      .agg(coalesce(sum(col("t").cast("decimal(38,12)")), lit(0))
        .cast("double").as("h"))
    val mi = cells.agg(
      coalesce(sum(col("term").cast("decimal(38,12)")), lit(0))
        .cast("double").as("mi"),
      coalesce(max(col("__n")), lit(0L)).as("n"))
    val ha = entropyOf("a", "__ra").withColumnRenamed("h", "h_a")
    val hb = entropyOf("b", "__cb").withColumnRenamed("h", "h_b")
    mi.crossJoin(ha).crossJoin(hb)
      .select(col("mi"), col("h_a"), col("h_b"),
        when(least(col("h_a"), col("h_b")) > 0,
          col("mi") / least(col("h_a"), col("h_b"))).as("nmi"),
        col("n"))
  }

  /** χ² statistic, degrees of freedom, p-value. Returns None when the
    * table is degenerate (fewer than 2 observed levels on either side). */
  def chiSquare(
      df: DataFrame, colA: String, colB: String): Option[ChiSquareResult] = {
    val c = cells(df, colA, colB).collect() // |A|×|B| rows — driver-small
    if (c.isEmpty) return None
    val aLevels = c.map(_.get(0)).distinct.length
    val bLevels = c.map(_.get(1)).distinct.length
    if (aLevels < 2 || bLevels < 2) return None
    val chi2 = c.map(_.getAs[Double]("contrib")).sum
    val n = c.map(_.getAs[Long]("observed")).sum
    val dof = (aLevels - 1).toLong * (bLevels - 1)
    val p = 1.0 - new ChiSquaredDistribution(dof.toDouble)
      .cumulativeProbability(chi2)
    Some(ChiSquareResult(chi2, dof, p, n))
  }
}
