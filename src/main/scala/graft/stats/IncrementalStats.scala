package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable per-partition column statistics — the "incremental stats" leg
  * of SURVEY §7.4 #13.
  *
  * At 100 TB, data lands in partitions (a day, a dump shard, an ingest
  * batch) and the catalog's column stats (reference metadata.py chunked
  * min/max scan; analysis/statistics.py describe) must NOT be recomputed by
  * rescanning history. Every statistic here is chosen to be exactly
  * mergeable:
  *
  *   - count / non-null count / decimal sum / sum of squares: additive.
  *   - min / max: semilattice.
  *   - distinct count: a DataSketches HLL sketch (`hll_sketch_agg`), whose
  *     union (`hll_union_agg`) preserves full sketch fidelity — incremental
  *     maintenance adds no error beyond HLL itself (the union estimate can
  *     differ from a whole-data sketch's by a hair: the union gadget stores
  *     HLL_8 registers, a direct sketch HLL_4+aux — both inside the same
  *     rse envelope; pinned at <=1% in StatsSpec).
  *
  * Workflow: `sketch` each new partition as it lands (one scan of the new
  * data only), append the sketch rows to a stats table, and `merge` at read
  * time (or fold periodically). `merge(sketch(whole))` ==
  * `merge(sketch(parts))` exactly — pinned by StatsSpec and the
  * `inc_stats_merge` oracle gate entry, which compares the merged
  * partition-sketch path against DuckDB aggregating the full table in one
  * pass.
  *
  * Sums go through DECIMAL(38,6) so partition order cannot change the
  * result (double addition is non-associative; decimal is exact) — the same
  * rule as the oracle queries ([[graft.Q]]). Mean/variance are derived from
  * the exact sums at read time.
  */
object IncrementalStats {

  val SketchLgK = 12 // ~0.8% HLL relative standard error

  /** One scan of `df`: per (partition, column) mergeable stats row.
    * Schema: part, col_name, n, n_value, sum_v DECIMAL(38,6),
    * sum_sq DECIMAL(38,6), min_v, max_v, hll BINARY. */
  def sketch(df: DataFrame, cols: Seq[String], partition: Column): DataFrame = {
    require(cols.nonEmpty, "sketch: no columns given")
    // One wide aggregate per partition key (single shuffle, map-side
    // combined), then unpivot to the per-column row layout driver-side-free.
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      val dec = col(c).cast(DecimalType(38, 6))
      // The square goes through DECIMAL(18,6): its product is DECIMAL(37,12),
      // which Spark keeps at full scale (the +1 of a (38,x) operand would
      // force adjustPrecisionScale to cut the scale instead). Exact domain:
      // |v| < 1e12 with <= 6 fractional digits — money/measure/score
      // columns. Values outside the domain fail LOUDLY under ANSI mode
      // (Spark 4 default: overflow cast throws) rather than biasing the
      // stored stats; pre-scale such columns before sketching.
      val dec6 = col(c).cast(DecimalType(18, 6))
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nv_$c"),
        sum(dec).as(s"__sum_$c"),
        sum(dec6 * dec6).as(s"__sq_$c"),
        min(v).as(s"__min_$c"),
        max(v).as(s"__max_$c"),
        // hll_sketch_agg takes int/long/string/binary — key on the string
        // render (stable within Spark; the sketch never leaves the engine)
        hll_sketch_agg(col(c).cast("string"), lit(SketchLgK)).as(s"__hll_$c"))
    }
    val wide = df.groupBy(partition.as("part")).agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"), col(s"__nv_$c").as("n_value"),
        col(s"__sum_$c").as("sum_v"), col(s"__sq_$c").as("sum_sq"),
        col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"),
        col(s"__hll_$c").as("hll"))
    }
    wide.select(col("part"), explode(array(perCol: _*)).as("s"))
      .select(col("part"), col("s.*"))
  }

  /** Fold sketch rows down to ONE sketch row per column, preserving the
    * HLL binary — the output is itself a valid `sketch` result (part =
    * `foldedPart`), so stores can compact an append-log of sketches
    * without losing the ability to keep merging later. */
  def fold(sketches: DataFrame, foldedPart: String = "__folded__"): DataFrame =
    sketches.groupBy(col("col_name"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("n_value")).as("n_value"),
        sum(col("sum_v")).as("sum_v"),
        sum(col("sum_sq")).as("sum_sq"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("hll")).as("hll"))
      .select(lit(foldedPart).as("part"), col("col_name"), col("n"),
        col("n_value"), col("sum_v"), col("sum_sq"), col("min_v"),
        col("max_v"), col("hll"))

  /** Fold sketch rows (any number of partitions, any number of `sketch`
    * invocations appended together) into one stats row per column, with
    * derived mean/variance and the HLL distinct estimate. Exact for
    * everything except `distinct_est` (HLL, ~0.8% rse at lgK=12). */
  def merge(sketches: DataFrame): DataFrame =
    fold(sketches).drop("part")
      // Derived statistics as DOUBLE arithmetic over the exact decimal
      // sums: the sums are identical regardless of merge order, so these
      // doubles are bit-deterministic (and bit-equal to an oracle that
      // derives them the same way from the same sums).
      .withColumn("mean_v", col("sum_v").cast("double") / col("n_value"))
      .withColumn("var_pop",
        col("sum_sq").cast("double") / col("n_value")
          - (col("sum_v").cast("double") / col("n_value"))
          * (col("sum_v").cast("double") / col("n_value")))
      .withColumn("distinct_est", hll_sketch_estimate(col("hll")))
      .drop("hll")
}
