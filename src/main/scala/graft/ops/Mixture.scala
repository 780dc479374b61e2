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

  /** Neyman optimal allocation (Neyman 1934, textbook survey sampling —
    * Cochran §5.5, public): split a sample budget across strata
    * proportionally to N_h·σ_h, the allocation minimizing the variance
    * of the stratified mean — the principled head-count step in front of
    * [[Sampling.stratifiedSample]]'s exact-k draw (proportional
    * allocation over-samples huge homogeneous strata; equal allocation
    * starves big variable ones).
    *
    * Integerization by largest remainder (Hamilton's method): floor every
    * raw share, then +1 to the largest fractional remainders until the
    * budget is exactly spent — Σ alloc == budget by construction. Ties
    * break on the stratum key. A stratum never receives more than its
    * row count (the surplus re-ranks to the next remainders); a budget
    * exceeding the total row count fails loudly.
    *
    * Engine-parity: per-stratum σ from exact decimal moments (the
    * [[graft.ops.EventAnalytics.cusumBaseline]] recipe, rounded 12),
    * weights/shares through one identical double sequence; the remainder
    * ranking compares those exact doubles with the key tie-break. Strata
    * with fewer than 2 rows fail loudly (σ undefined); all-zero weights
    * (every stratum constant) fall back to proportional-to-N_h weights —
    * documented, not an error (Neyman degenerates when variance carries
    * no information).
    *
    * Scale shape: one moment aggregation to the STRATA table, then
    * strata-table-sized windows (statistics, never corpus rows — same
    * contract as the water-fill sort above). Returns (strataCols…,
    * n_rows, sigma, weight, alloc). */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
      valueCol: Column, budget: Long): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column required")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val ks = strataCols.map(col)
    val moments = df
      .select((ks :+ valueCol.cast("double").as("__x")): _*)
      .filter(col("__x").isNotNull)
      .groupBy(ks: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("__x"), 6).cast("decimal(38,12)")).as("__s1"),
        sum(round(round(col("__x"), 6) * round(col("__x"), 6), 6)
          .cast("decimal(38,12)")).as("__s2"))
      .select((ks :+
        when(col("n_rows") < 2, raise_error(concat(
          lit("neymanAllocation: stratum with fewer than 2 rows: "),
          concat_ws("|", strataCols.map(c => col(c).cast("string")): _*))))
          .otherwise(col("n_rows")).as("n_rows") :+
        col("__s1") :+ col("__s2")): _*)
      .select((ks :+ col("n_rows") :+
        round(sqrt(greatest(lit(0.0),
          (col("__s2").cast("double")
            - col("__s1").cast("double") * col("__s1").cast("double")
              / col("n_rows")) / (col("n_rows") - 1))), 12)
          .as("sigma")): _*)
    val totals = moments.agg(
      sum(round(col("n_rows") * col("sigma"), 6).cast("decimal(38,12)"))
        .as("__wsum"),
      sum(col("n_rows")).as("__ntot")).head()
    val nTot = totals.getLong(1)
    require(budget <= nTot,
      s"budget $budget exceeds the $nTot available rows")
    val wsum = Option(totals.getDecimal(0))
      .map(_.doubleValue).getOrElse(0.0)
    // Neyman degenerates when every stratum is constant — fall back to
    // proportional allocation (weight = N_h)
    val weight =
      if (wsum > 0) round(col("n_rows") * col("sigma"), 6)
      else col("n_rows").cast("double")
    val wTotal = if (wsum > 0) wsum else nTot.toDouble
    val shared = moments
      .withColumn("weight", weight)
      .withColumn("__share", lit(budget.toDouble) * col("weight") / wTotal)
      .withColumn("__floor", floor(col("__share")).cast("long"))
      .withColumn("__rem", col("__share") - col("__floor"))
      // a stratum cannot supply more rows than it has: cap the floor and
      // zero the capped stratum's remainder so the surplus re-ranks
      .withColumn("__alloc0", least(col("__floor"), col("n_rows")))
      .withColumn("__rem2",
        when(col("__alloc0") < col("n_rows"), col("__rem"))
          .otherwise(lit(-1.0)))
    val spentRow = shared.agg(sum(col("__alloc0")),
      sum(when(col("__rem2") >= 0, 1L).otherwise(0L))).head()
    val extra = budget - spentRow.getLong(0)
    val uncapped = spentRow.getLong(1)
    // one +1 round must suffice for Σ alloc == budget; when the caps bind
    // so hard that more than one unit per uncapped stratum is needed,
    // Hamilton's method is no longer well-defined — fail loudly rather
    // than silently under-spend
    require(extra <= uncapped,
      s"caps bind: $extra residual units for $uncapped uncapped strata — " +
        "budget is too close to the population size for remainder rounding")
    val rankW = Window.orderBy(
      (col("__rem2").desc +: strataCols.map(col)): _*)
    shared
      .withColumn("__rk", row_number().over(rankW))
      .select((ks :+ col("n_rows") :+ col("sigma") :+ col("weight") :+
        (col("__alloc0") + when(col("__rk") <= extra, 1L).otherwise(0L))
          .as("alloc")): _*)
  }
}
