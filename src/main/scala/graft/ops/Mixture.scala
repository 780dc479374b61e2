package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget allocation across domains by water-filling (the classic
  * max-min fair allocation, textbook-public — Bertsekas & Gallager's
  * fair-share level): give every domain the same level λ of tokens,
  * capped at what the domain actually has, with λ chosen so the caps +
  * levels exactly exhaust the budget. The planning step in front of
  * [[Sampling.mixCorpora]]/temperature sampling: proportional splits
  * over-ask tiny domains and starve nothing-special big ones; max-min
  * fairness is the neutral default when no quality prior says
  * otherwise.
  *
  * Closed form via one sort of the DOMAIN table (domain-count-sized —
  * statistics, never corpus rows): with domains ordered by availability
  * ascending, λᵢ = (B − prefix₍ᵢ₋₁₎)/(n − i + 1) is the level if the
  * first i−1 domains are capped; the first i whose λᵢ ≤ availᵢ yields
  * the true λ. No feasible i means the budget covers everything —
  * every domain gets its full supply and the remainder goes unspent.
  * All arithmetic is division over exact integer-valued sums —
  * engine-portable, DuckDB rebuilds every allocation. */
object Mixture {

  /** Per-domain allocations for `budget` tokens: (domainCol, available,
    * allocated rounded to 6, capped). Negative/null availabilities are
    * treated as absent domains (nothing to allocate from). */
  def waterFill(domains: DataFrame, domainCol: String, availCol: String,
      budget: Double): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = domains
      .select(col(domainCol).as("domain"),
        col(availCol).cast("double").as("available"))
      .filter(col("available").isNotNull && col("available") > 0)
    val ord = Window.orderBy(col("available"), col("domain"))
    val ranked = base
      .withColumn("__i", row_number().over(ord))
      .withColumn("__pre", sum(col("available")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val lam = ranked
      .withColumn("__lam",
        (lit(budget) - (col("__pre") - col("available")))
          / (col("__n") - col("__i") + 1))
      .filter(col("__lam") <= col("available"))
      .orderBy(col("__i"))
      .limit(1)
      .select(col("__lam").as("__lambda"))
    // left join on true (NOT a crossJoin): lam is EMPTY when the budget
    // covers every domain, and the rows must survive with a null level
    ranked
      .join(broadcast(lam), lit(true), "left")
      .select(col("domain"), col("available"),
        round(when(col("__lambda").isNull, col("available"))
          .otherwise(least(col("available"), col("__lambda"))), 6)
          .as("allocated"),
        (col("__lambda").isNull || col("available") <= col("__lambda"))
          .as("capped"))
  }
}
