package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Poisson bootstrap (Efron 1979 resampling; the Poissonized one-pass
  * form is Chamandy, Muralidharan, Najmi & Naidu 2012, public): instead
  * of drawing B multinomial resamples — which needs the global row count
  * up front and a pass per resample — each row independently contributes
  * Poisson(1) copies of itself to every resample. For large n the
  * resample distributions converge to the classic bootstrap, and the
  * whole B-resample ensemble computes in ONE distributed pass: explode B
  * per row, map-side-combine partial sums, shuffle bounded by
  * partitions × B regardless of data size. Nothing data-sized ever
  * reaches the driver; the only driver-adjacent object is the B-row
  * means table.
  *
  * Determinism/portability: the Poisson draw for (row, resample b) is
  * the inverse CDF applied to the engine-portable identity-hash fraction
  * ([[graft.ops.Sampling.hashFraction]]) of (seed, b, keys...). The CDF
  * thresholds are Scala-computed doubles inlined as literals into BOTH
  * the Spark plan and the DuckDB oracle SQL, so the comparison
  * u > threshold — and hence every count, every resample, every CI — is
  * bit-identical across engines, retries, and cluster sizes. `keys` must
  * uniquely identify rows (the standard identity-hash contract:
  * duplicate key tuples would draw identical counts, silently coupling
  * their resample membership).
  */
object Bootstrap {

  /** P(X <= k) for X ~ Poisson(1), k = 0..11: e^-1 · Σ 1/j!. Count =
    * #{thresholds strictly below u} ∈ [0, 12]; P(X > 11) ≈ 3e-13 is
    * below the 2^-32 hash granularity, so the cap is unreachable. */
  val thresholds: Seq[Double] = {
    val eInv = math.exp(-1.0)
    (0 to 11).map { k =>
      var s = 0.0; var fact = 1.0
      (0 to k).foreach { j =>
        if (j > 0) fact *= j
        s += 1.0 / fact
      }
      eInv * s
    }
  }

  /** Poisson(1) count from a [0,1) fraction via the inlined inverse CDF:
    * the sum of indicator comparisons, never a loop or a libm call. */
  def poissonCount(u: Column): Column =
    thresholds.map(t => when(u > lit(t), 1).otherwise(0))
      .reduce(_ + _)

  /** Nearest-rank percentile positions (1-based) for a `level` CI over b
    * resamples, in EXACT decimal arithmetic: ceil((1−level)/2·b) drifts
    * by a whole rank when computed through binary doubles (0.05/2·200
    * lands at 5.0000000000000004 → ceil 6, while 0.025·200 rounds to
    * exactly 5) — a divergence found by the cross-engine gate. Both the
    * operator and oracle authors must take ranks from here. */
  def ranks(b: Long, level: Double): (Long, Long) = {
    val a2 = (BigDecimal(1) - BigDecimal.valueOf(level)) / 2
    val lo = (a2 * b).setScale(0, BigDecimal.RoundingMode.CEILING)
      .toLong.max(1L)
    val hi = ((BigDecimal(1) - a2) * b)
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong.min(b.toLong)
    (lo, hi)
  }

  /** The same inverse CDF as oracle SQL over a fraction expression
    * (literals interpolated from the SAME Scala doubles). */
  def poissonCountSql(uExpr: String): String =
    thresholds.map(t =>
        s"CASE WHEN $uExpr > CAST($t AS DOUBLE) THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** B bootstrap resample means of `value` (a column exactly summable
    * once cast to DECIMAL(18,6) — money/measure columns) in one pass:
    * (b, n_eff, boot_mean) per resample, boot_mean rounded to 6
    * decimals. Resamples with zero effective rows (possible only for
    * tiny inputs) yield null means. A NON-NULL value that the decimal
    * can't represent (more than 12 integer digits, or a non-numeric
    * string) raises a runtime error instead of silently vanishing from
    * every resample (under non-ANSI mode the cast alone would null it
    * and the null filter would eat it). */
  def resampleMeans(df: DataFrame, keys: Seq[String], value: Column,
      b: Int, seed: String = "graft-boot"): DataFrame = {
    require(b >= 2, s"need at least 2 resamples, got $b")
    val u = Sampling.hashFraction(seed, col("__b") +: keys.map(col))
    val vv = value.cast("decimal(18,6)")
    val checked = when(value.isNotNull && vv.isNull,
        raise_error(concat(
          lit("resampleMeans: value not representable as decimal(18,6): "),
          value.cast("string"))).cast("decimal(18,6)"))
      .otherwise(vv)
    df.select((keys.map(col) :+ checked.as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__cnt", poissonCount(u))
      .groupBy(col("__b").as("b"))
      .agg(sum(col("__cnt")).cast("long").as("n_eff"),
        sum(col("__cnt") * col("__v")).as("__sum"))
      .withColumn("boot_mean",
        when(col("n_eff") > 0,
          round(col("__sum").cast("double") / col("n_eff"), 6)))
      .drop("__sum")
  }

  /** Percentile-bootstrap confidence interval for the mean: one row with
    * the full-sample mean, the bootstrap standard error (exact decimal
    * moments of the rounded resample means; sqrt is IEEE-correctly
    * rounded, hence portable), and the nearest-rank percentile bounds
    * ci_lo/ci_hi at `level`. Rank selection (never interpolation — the
    * interpolated quantile's arithmetic varies by convention) over the
    * deterministic (boot_mean, b) order. */
  def ci(df: DataFrame, keys: Seq[String], value: Column, b: Int,
      seed: String = "graft-boot", level: Double = 0.95): DataFrame = {
    require(level > 0 && level < 1, s"bad level $level")
    // empty resamples (possible only for tiny inputs, P = e^-n each)
    // carry null means: they must not count toward the rank positions
    // or the SE moments, and a CI bound must never land on a null —
    // filter them and take ranks against the OBSERVED resample count
    val allMeans = resampleMeans(df, keys, value, b, seed)
      .filter(col("boot_mean").isNotNull)
      .persist()
    val observed = allMeans.count()
    require(observed >= 2,
      s"only $observed non-empty resamples of $b — input too small to " +
        "bootstrap")
    val (loRank, hiRank) = ranks(observed, level)
    val means = allMeans
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("boot_mean"), col("b"))))
    val full = df.select(value.cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(round(sum(col("__v")).cast("double") / count(lit(1)), 6)
        .as("mean"))
    // SE moments in exact integer micro-units (boot_mean is 6-decimal, so
    // round(mean·1e6) is the exact integer in both engines); squares go
    // through decimal(38,0) — Spark's long·long would overflow under ANSI
    // and DuckDB mirrors with HUGEINT.
    val mi = round(col("boot_mean") * 1e6, 0).cast("decimal(38,0)")
    val summary = means.agg(
      count(lit(1)).cast("long").as("b"),
      sum(mi).cast("double").as("__s"),
      sum(mi * mi).cast("double").as("__s2"),
      max(when(col("__rn") === loRank, col("boot_mean"))).as("ci_lo"),
      max(when(col("__rn") === hiRank, col("boot_mean"))).as("ci_hi"))
      .withColumn("boot_se",
        round(sqrt((col("__s2") - col("__s") * col("__s") / col("b"))
          / (col("b") - 1)) / 1e6, 6))
      .select("b", "boot_se", "ci_lo", "ci_hi")
    // evaluate eagerly so the persisted means table can be released
    // before returning (the engine computes every number; the caller
    // gets a 1-row local relation with identical values)
    val row = full.crossJoin(summary)
      .select("mean", "b", "boot_se", "ci_lo", "ci_hi").head()
    allMeans.unpersist()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(row), row.schema)
  }

  /** Percentile-bootstrap CI for the DIFFERENCE in means between two
    * arms (the A/B uplift interval — what a fixed-horizon experiment
    * readout quotes next to [[graft.stats.Experiment.cuped]]'s variance
    * reduction): each arm resamples INDEPENDENTLY (seed suffixed per
    * arm), draw b's uplift is mt_b − mc_b over 6-decimal resample means
    * (a difference of identical doubles — no further rounding needed or
    * wanted), the CI is nearest-rank over the (uplift, b) order, and
    * the SE comes from exact micro-unit moments (the [[ci]] recipe).
    * Draws where either arm came up empty are excluded from ranks and
    * moments. One row:
    * (mean_t, mean_c, uplift, b, boot_se, ci_lo, ci_hi). */
  def upliftCi(df: DataFrame, keys: Seq[String], armCol: Column,
      value: Column, b: Int, seed: String = "graft-boot",
      level: Double = 0.95): DataFrame = {
    require(level > 0 && level < 1, s"bad level $level")
    val t = resampleMeans(df.filter(armCol), keys, value, b, s"$seed/t")
      .select(col("b"), col("boot_mean").as("__mt"))
    val c = resampleMeans(df.filter(!armCol), keys, value, b, s"$seed/c")
      .select(col("b"), col("boot_mean").as("__mc"))
    val diffs = t.join(c, Seq("b"))
      .filter(col("__mt").isNotNull && col("__mc").isNotNull)
      .withColumn("__u", col("__mt") - col("__mc"))
      .persist()
    val observed = diffs.count()
    require(observed >= 2,
      s"only $observed paired non-empty resamples of $b — arms too small")
    val (loRank, hiRank) = ranks(observed, level)
    val ranked = diffs.withColumn("__rn",
      row_number().over(Window.orderBy(col("__u"), col("b"))))
    def armMean(pred: Column) = df.filter(pred)
      .select(value.cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(round(sum(col("__v")).cast("double") / count(lit(1)), 6))
      .head().getDouble(0)
    val meanT = armMean(armCol)
    val meanC = armMean(!armCol)
    val mi = round(col("__u") * 1e6, 0).cast("decimal(38,0)")
    val summary = ranked.agg(
        count(lit(1)).cast("long").as("b"),
        sum(mi).cast("double").as("__s"),
        sum(mi * mi).cast("double").as("__s2"),
        max(when(col("__rn") === loRank, col("__u"))).as("ci_lo"),
        max(when(col("__rn") === hiRank, col("__u"))).as("ci_hi"))
      .withColumn("boot_se",
        round(sqrt((col("__s2") - col("__s") * col("__s") / col("b"))
          / (col("b") - 1)) / 1e6, 6))
      .select(lit(meanT).as("mean_t"), lit(meanC).as("mean_c"),
        lit(meanT - meanC).as("uplift"),
        col("b"), col("boot_se"), col("ci_lo"), col("ci_hi"))
    val row = summary.head()
    diffs.unpersist()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(row), row.schema)
  }
}
