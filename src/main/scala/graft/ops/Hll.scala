package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches (Flajolet, Fusy, Gandouet, Meunier
  * 2007, public): m registers, each holding the maximum leading-zero rank
  * ("rho") any key hashing into it produced; cardinality is estimated from
  * the harmonic mean of 2^-register with the standard small-range
  * linear-counting fallback. Relative standard error ≈ 1.04/√m (6.5% at
  * the default m = 256). The third mergeable summary next to
  * [[HeavyHitters]] (Misra–Gries, undercount-only frequencies) and
  * [[CountMin]] (overcount-only frequencies): HLL answers "how many
  * DISTINCT keys?" per group in m bytes-ish of state.
  *
  * Unlike Spark's builtin `approx_count_distinct` (whose HLL++ registers
  * are an opaque binary and hash is engine-private), this sketch is a pure
  * function of the data through the engine-portable md5 identity hash
  * (the [[Sampling.hashFraction]] family): DuckDB rebuilds the ENTIRE
  * register table and the estimator cell-for-cell in the oracle gate, and
  * a retried stage reproduces registers bit-identically.
  *
  * Scale/streaming shape:
  *  - Building is ONE hash aggregation (max per (group, bucket)) —
  *    map-side combined, shuffle bounded by partitions × groups × m
  *    regardless of row count.
  *  - Registers merge by MAX, which is IDEMPOTENT as well as commutative/
  *    associative — re-folding a replayed micro-batch cannot change the
  *    sketch, so the streaming accumulator needs no batchId bookkeeping
  *    (contrast [[CountMin.runningSketchSink]], whose additive counters
  *    must skip replayed epochs).
  *
  * Hash layout per key: md5("seed|key") hex; chars 1–8 (32 bits) pick the
  * register (mod m — exact for any m ≤ 2^32, uniform since md5 bytes
  * are), chars 9–16 (32 bits) feed rho = 33 − bitlength(w), with w = 0
  * mapping to rho = 33. Registers therefore hold 1..33.
  */
object Hll {

  /** Bias-correction constant α_m for m ≥ 128 (the 2007 paper's table). */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  // the one engine-portable identity hash — shared, so a recipe change
  // can never silently diverge HLL registers from the other operators
  private def hex(seed: String, key: Column): Column =
    Sampling.hashHex(seed, Seq(key))

  /** Register index of `key` in [0, m). */
  def bucket(key: Column, m: Int, seed: String): Column =
    pmod(conv(substring(hex(seed, key), 1, 8), 16, 10).cast("long"),
      lit(m.toLong))

  /** Leading-zero rank of the second 32 hash bits: 33 − bitlength(w),
    * computed through the exact integer→binary-string length (never a
    * log2 whose libm rounding could flip a register cross-engine). */
  def rho(key: Column, seed: String): Column = {
    val w = conv(substring(hex(seed, key), 9, 8), 16, 10).cast("long")
    when(w === 0L, lit(33))
      .otherwise(lit(33) - length(conv(w.cast("string"), 10, 2)))
      .cast("int")
  }

  /** Per-group register tables: one row per (groupCols..., bucket) with
    * r = max rho over the group's keys in that bucket (sparse: absent
    * bucket = empty register). NULL keys are excluded — a missing key is
    * not a distinct value. One hash aggregation. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
      m: Int = 256, seed: String = "graft-hll"): DataFrame = {
    require(m >= 128, s"m must be >= 128 for the alpha(m) regime, got $m")
    df.filter(col(keyCol).isNotNull)
      .groupBy((groupCols.map(col) :+
        bucket(col(keyCol), m, seed).as("bucket")): _*)
      .agg(max(rho(col(keyCol), seed)).as("r"))
  }

  /** Ungrouped sketch: (bucket, r). */
  def sketch(df: DataFrame, keyCol: String, m: Int = 256,
      seed: String = "graft-hll"): DataFrame =
    sketchBy(df, Seq.empty, keyCol, m, seed)

  /** Register-wise max: merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    * exactly, and merge(s, s) == s (idempotent). `groupCols` must match
    * the sketches' grouping. */
  def merge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String] = Seq.empty): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Cardinality estimates from per-group register tables: raw estimate
    * α_m·m²/Σ2^-r (absent registers contribute 2^0 = 1; every 2^-r term
    * and their sum are exact dyadic doubles, so the harmonic sum is
    * bit-identical across engines and summation orders), falling back to
    * linear counting m·ln(m/V) when the raw estimate ≤ 2.5m and V > 0
    * empty registers remain (the 2007 paper's small-range correction).
    * Output per group: n_registers (occupied), v_zero (empty), and
    * hll_est rounded to 4 decimals. */
  def estimateBy(sk: DataFrame, groupCols: Seq[String],
      m: Int = 256): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sk.groupBy()
      else sk.groupBy(groupCols.map(col): _*)
    val nReg = count(lit(1))
    val harmonic = sum(lit(1.0) / pow(lit(2.0), col("r")))
    grouped
      .agg(nReg.cast("long").as("n_registers"),
        (harmonic + (lit(m.toDouble) - nReg)).as("__s"))
      .withColumn("v_zero", lit(m.toLong) - col("n_registers"))
      .withColumn("__raw",
        lit(alpha(m)) * lit(m.toDouble) * lit(m.toDouble) / col("__s"))
      .withColumn("hll_est",
        round(when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(col("__raw")), 4))
      .drop("__s", "__raw")
  }

  /** One-row estimate from an ungrouped sketch. */
  def estimate(sk: DataFrame, m: Int = 256): DataFrame =
    estimateBy(sk, Seq.empty, m)

  /** foreachBatch accumulator folding per-micro-batch sketches over an
    * unbounded stream. Register max is idempotent, so unlike the
    * Count-Min fold this needs NO batchId replay guard: an at-least-once
    * source re-delivering a whole micro-batch folds to the identical
    * register state. */
  def runningSketchSink(keyCol: String, m: Int = 256,
      seed: String = "graft-hll"):
      (java.util.concurrent.atomic.AtomicReference[Map[Long, Int]],
        (DataFrame, Long) => Unit) = {
    val ref = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[Long, Int])
    val fn = (batch: DataFrame, _: Long) => {
      val s = sketch(batch, keyCol, m, seed).collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
      ref.updateAndGet { prev =>
        (prev.keySet ++ s.keySet).map { k =>
          k -> math.max(prev.getOrElse(k, 0), s.getOrElse(k, 0))
        }.toMap
      }
      ()
    }
    (ref, fn)
  }

  /** Trailing-window distinct counts per day — "distinct users in the
    * last `windowDays` days, for every day" (the W-DAU family) WITHOUT
    * the W-fold rescan a naive per-window count-distinct costs: the
    * event log reduces to per-day register tables in ONE aggregation,
    * then each day-sketch fans out map-side (explode of a ≤W-date
    * sequence — no range join, no nested loop) to every trailing target
    * day it serves, and a register-max groupBy + [[estimateBy]] finish
    * on days×m-sized tables. Emitted days run through the last observed
    * event day; a day with no events of its own still reports the
    * trailing distinct of its window (proper sliding semantics).
    * Registers are mergeable, so the same day-sketches serve any W —
    * recompute only the fanout to re-window. */
  def slidingEstimateByDay(
      df: DataFrame, tsCol: String, keyCol: String, windowDays: Int,
      m: Int = 256, seed: String = "graft-hll"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daySk = sketchBy(df.withColumn("__day", to_date(col(tsCol))),
      Seq("__day"), keyCol, m, seed)
    val lastDay = daySk.agg(max(col("__day")).as("__last"))
    val merged = daySk
      .withColumn("day", explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))))
      .crossJoin(broadcast(lastDay))
      .filter(col("day") <= col("__last"))
      .groupBy("day", "bucket").agg(max(col("r")).as("r"))
    estimateBy(merged, Seq("day"), m)
  }

  /** Audience-overlap estimate between two keyed populations via
    * inclusion–exclusion over MERGEABLE register tables:
    * |A∩B| ≈ |A| + |B| − |A∪B|, with the union sketched EXACTLY by
    * register-wise max ([[merge]]) — never a rescan of either input.
    * The classic sketch answer to "how many users do these two
    * segments share" at any scale, with the caveat the scaladoc must
    * carry: inclusion–exclusion VARIANCE grows as the true overlap
    * shrinks relative to the union (three ±1.04/√m estimates subtract),
    * so tiny overlaps of huge sets are noise — the estimate is clamped
    * at 0 and both marginals ride along for the caller's own error
    * budget. One row: (est_a, est_b, est_union, est_intersection,
    * jaccard_est) — every number deterministic from the register
    * grids (exact-dyadic harmonic sums), rounded to 4. */
  def intersectEstimate(a: DataFrame, b: DataFrame,
      m: Int = 256): DataFrame = {
    def one(sk: DataFrame, name: String) =
      estimate(sk, m).select(col("hll_est").as(name))
    val ea = one(a, "est_a")
    val eb = one(b, "est_b")
    val eu = one(merge(a, b), "est_union")
    ea.crossJoin(eb).crossJoin(eu)
      .withColumn("est_intersection",
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 4))
      .withColumn("jaccard_est",
        when(col("est_union") > 0.0,
          round(col("est_intersection") / col("est_union"), 6)))
  }
}
