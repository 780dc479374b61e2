package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Re-identification-risk audits over quasi-identifier combinations —
  * k-anonymity equivalence classes, l-diversity of a sensitive column, and
  * suppression to a k floor. The reference's domain (clinical cohort
  * export — query/query_secure.py's export path releases demographics
  * slices) is exactly where these audits run before any data leaves the
  * enclave; for an LLM training corpus the same machinery audits
  * user/provenance metadata before it ships with a dataset release.
  *
  * Scale shape: every audit is one hash aggregation keyed on the
  * quasi-identifier tuple — the class table is bounded by the number of
  * DISTINCT quasi tuples (the thing being audited: far below row count
  * when k-anonymity is even achievable), so the rollups that follow are
  * cheap. [[suppressToK]] computes class sizes with a window over the
  * quasi keys, so the size and the keep/drop filter ride ONE shuffle of
  * the data — no separate class table or join-back. Nothing here touches
  * the driver beyond scalar reports.
  */
object Privacy {

  /** Equivalence classes of `quasiCols`: one row per distinct
    * quasi-identifier tuple with its `class_size`. NULL is a value (a
    * missing birth year still partitions the release), matching SQL
    * GROUP BY semantics in both engines. */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
  }

  /** Corpus-level k-anonymity report for threshold `k`: the dataset is
    * k-anonymous iff `min_class_size >= k`; `rows_below_k` counts the
    * ROWS at risk (each sits in a class an attacker can narrow below k
    * candidates), `classes_below_k` the violating classes. One
    * aggregation + one scalar rollup. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    equivalenceClasses(df, quasiCols)
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, lit(1L)).otherwise(lit(0L)))
          .as("classes_below_k"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
          .as("rows_below_k"))
      .withColumn("k", lit(k))
      .withColumn("anonymous", col("min_class_size") >= col("k"))
  }

  /** Distinct-l-diversity of `sensitiveCol` within each quasi class:
    * classes where every member shares one sensitive value (`l = 1`) leak
    * the attribute even when the class is large enough for k-anonymity.
    * NULL sensitive values are their own (countable) value: a class of
    * all-NULLs still discloses "value unknown", so `l` counts it rather
    * than reporting a spuriously diverse 0. */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    // count_distinct ignores NULL, so route NULL through a sentinel
    // struct: (is_null, value) tuples are distinct exactly when the
    // sensitive values are, with NULL as one extra value.
    val sentinel = struct(col(sensitiveCol).isNull, col(sensitiveCol))
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sentinel).as("l"))
  }

  /** l-diversity rollup mirroring [[kAnonymityReport]]: `min_l` over all
    * classes plus the classes/rows violating the `l` floor. */
  def lDiversityReport(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    lDiversity(df, quasiCols, sensitiveCol)
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < l, lit(1L)).otherwise(lit(0L)))
          .as("classes_below_l"),
        sum(when(col("l") < l, col("class_size")).otherwise(lit(0L)))
          .as("rows_below_l"))
      .withColumn("l", lit(l))
      .withColumn("diverse", col("min_l") >= col("l"))
  }

  /** Suppression to a k floor: drop every row whose quasi class has fewer
    * than `k` members — the released remainder is k-anonymous by
    * construction (suppression can only shrink classes to zero, never
    * split them). A window over the quasi keys computes class sizes
    * in the SAME shuffle that would feed the join-back, so the data
    * moves once. */
  def suppressToK(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("__cs", count(lit(1)).over(w))
      .filter(col("__cs") >= k)
      .drop("__cs")
  }

  /** Deterministic keyed pseudonymization of identifier columns: each
    * value becomes the hex SHA-256 of `secret || ":" || value` — stable
    * within a release (joins and group-bys on the pseudonym still work,
    * which is why a release pipeline prefers this over row numbers) and
    * unlinkable across releases that rotate the secret. Salted-hash, not
    * HMAC: SHA-256 length extension lets an attacker EXTEND a message,
    * not invert or dictionary-skip the secret, so for fixed-format ids
    * the simpler construction (which the SQL oracle can mirror) is
    * standard; rotate to a real HMAC if values are attacker-chosen
    * suffixes of each other. NULL stays NULL (a missing id must not gain
    * a pseudonym that collides with the hash of the empty string).
    * Pure codegen'd map — no shuffle, no UDF. */
  def pseudonymize(df: DataFrame, cols: Seq[String], secret: String): DataFrame = {
    require(cols.nonEmpty, "no columns to pseudonymize")
    require(secret.nonEmpty, "empty secret")
    cols.foldLeft(df) { (out, c) =>
      out.withColumn(c,
        when(col(c).isNotNull,
          sha2(concat(lit(secret), lit(":"), col(c).cast("string")), 256)))
    }
  }

  /** Fixed-width generalization bin for a numeric quasi-identifier
    * (age → age band, balance → balance band): the standard first move
    * when [[kAnonymityReport]] fails. `floor(x / width) * width` labels
    * the bin by its inclusive lower edge; NULL stays NULL. */
  def generalizeNumeric(c: Column, width: Double): Column = {
    require(width > 0, s"width must be positive, got $width")
    floor(c / lit(width)) * lit(width)
  }

  /** Laplace noise with scale `b`, drawn by inverse CDF from the
    * engine-portable identity hash of `keys` (strictly inside (0,1), so
    * the log never sees 0): noise = −b·sign(u)·ln(1 − 2|u|) for
    * u = hash − 0.5 ∈ (−½, ½). Seeding the mechanism on the release key
    * makes the release REPRODUCIBLE and oracle-checkable — the standard
    * auditable-pipeline trade: the draw is as good as random to anyone
    * without the seed, but the formal DP guarantee degrades to
    * protection against seed-blind adversaries, so treat the seed like
    * the pseudonymization secret (rotate per release, never publish). */
  private def laplaceNoise(b: Double, seed: String, keys: Seq[Column]): Column = {
    val u = Sampling.hashFractionOpen(seed, keys) - lit(0.5)
    lit(-b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
  }

  /** ε-DP noisy group counts (Laplace mechanism, Dwork et al. 2006):
    * (groupCols…, released) where released = count + Laplace(1/ε),
    * rounded to 6. A count query has sensitivity 1 — one row moves one
    * group's count by one — so scale is 1/ε per release; composing
    * releases spends ε additively (the caller's budget ledger). The true
    * count column is intentionally NOT returned: emitting it beside the
    * noisy one would defeat the release. One hash aggregation, noise as
    * a codegen'd map over the group-sized result. */
  def dpCountRelease(
      df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("released",
        round(col("__n") + laplaceNoise(1.0 / epsilon, seed,
          groupCols.map(col)), 6))
      .drop("__n")
  }

  /** ε-DP noisy group sums: values clip to [−clip, clip] first (bounding
    * the sensitivity at `clip` — the contribution bound every DP
    * aggregate needs), the clipped values sum EXACTLY as 6-decimal
    * decimals (summation-order-proof), and Laplace(clip/ε) noise is
    * added per group. NULL values contribute nothing. Returns
    * (groupCols…, released). */
  def dpSumRelease(
      df: DataFrame, groupCols: Seq[String], valueCol: String, clip: Double,
      epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(clip > 0, s"clip bound must be positive, got $clip")
    val clamped = greatest(least(col(valueCol).cast("double"), lit(clip)),
      lit(-clip))
    df.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(round(clamped, 6).cast("decimal(38,6)")),
        lit(0).cast("decimal(38,6)")).as("__s"))
      .withColumn("released",
        round(col("__s").cast("double") + laplaceNoise(clip / epsilon, seed,
          groupCols.map(col)), 6))
      .drop("__s")
  }

  /** k-ary randomized response (Warner 1965; the RAPPOR family's core —
    * LOCAL DP, where [[dpCountRelease]] is central DP): each row keeps
    * its true category with probability `p` and otherwise reports a
    * uniform draw over ALL k categories (the true one included — that
    * variant keeps the debias algebra one line). Both coin flips come
    * from the engine-portable identity hash of `idKeys` (which must
    * uniquely identify rows — the [[Sampling.weightedSample]] contract),
    * so the perturbed column is reproducible and oracle-checkable; the
    * ε it buys against a seed-blind adversary is ln(p·k/(1−p) + 1).
    * The category universe is the column's distinct values, collected
    * sorted and broadcast (bounded by contract: categorical telemetry,
    * not free text — a loud cap enforces it). NULL categories pass
    * through null (absence is not a category). Adds `reported`. */
  def randomizedResponse(
      df: DataFrame, catCol: String, p: Double, seed: String,
      idKeys: Seq[String], maxCategories: Int = 10000): DataFrame = {
    require(p > 0 && p < 1, s"keep probability p must sit in (0,1), got $p")
    require(idKeys.nonEmpty, "idKeys must uniquely identify rows")
    val cats = df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string")).distinct()
      .orderBy(catCol).limit(maxCategories + 1)
      .collect().map(_.getString(0))
    require(cats.length <= maxCategories,
      s"more than $maxCategories categories — randomized response is for " +
        "bounded categorical telemetry")
    require(cats.nonEmpty, "no non-null categories to perturb")
    val k = cats.length
    val keep = Sampling.hashFractionOpen(seed, idKeys.map(col)) < lit(p)
    val pick = floor(Sampling.hashFractionOpen(s"$seed#pick",
      idKeys.map(col)) * lit(k.toDouble)).cast("int")
    df.withColumn("reported",
      when(col(catCol).isNull, lit(null).cast("string"))
        .when(keep, col(catCol).cast("string"))
        .otherwise(element_at(array(cats.map(lit): _*), pick + 1)))
  }

  /** Debiased frequency estimates from a randomized-response release:
    * E[obs_c] = n_c·p + n·(1−p)/k ⟹ n̂_c = (obs_c − n·(1−p)/k)/p.
    * `k` is the MECHANISM's category-universe size (a randomization
    * parameter, never derived from the release — a category that drew
    * zero reports would silently shrink it). Returns (category,
    * observed, estimate) for every reported category, estimate rounded
    * to 6 (may be negative for rare categories — estimator variance,
    * not a bug; clamp at the consumer if needed). Null reports are
    * excluded. */
  def rrFrequencyEstimate(
      released: DataFrame, reportedCol: String, p: Double,
      k: Int): DataFrame = {
    require(p > 0 && p < 1, s"keep probability p must sit in (0,1), got $p")
    require(k >= 2, s"mechanism universe must have >= 2 categories, got $k")
    val base = released.filter(col(reportedCol).isNotNull)
    val obs = base.groupBy(col(reportedCol).as("category"))
      .agg(count(lit(1)).as("observed"))
    val totals = obs.agg(coalesce(sum(col("observed")), lit(0L)).as("__n"))
    obs.crossJoin(broadcast(totals))
      .select(col("category"), col("observed"),
        round((col("observed") - col("__n") * lit(1.0 - p) / lit(k.toDouble))
          / lit(p), 6).as("estimate"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, public) for an
    * ORDERED sensitive attribute: per quasi-identifier class, the earth
    * mover's distance between the class's sensitive-value distribution
    * and the global one, under the paper's ordered-distance ground
    * metric — EMD = (1/(m−1))·Σᵢ |Σ_{j≤i}(p_j − q_j)| over the m sorted
    * values. k-anonymity bounds who you might be; t-closeness bounds
    * what a class MEMBERSHIP reveals about the sensitive value (a class
    * whose salaries are all in the top decile leaks even at k = 50).
    *
    * Exactness: the cumulative term folds as the exact integer
    * Σ(c·N − g·n) (class count × global total minus global count ×
    * class total) in decimal, so shard order cannot perturb it; one
    * division at the end, rounded to 9 — engine-exact.
    *
    * Scale shape: one (quasi, value) aggregation; the audit grid is
    * classes × m via a broadcast of the m-row value domain (m loudly
    * capped — bin a continuous attribute first, e.g.
    * `floor(col / width)`); the cumulative window partitions BY CLASS
    * over ≤ m rows. Nothing data-sized past the first aggregation.
    * Returns (quasi..., n, t_emd, passed) ordered by the quasi columns;
    * `passed` = t_emd ≤ t. */
  def tCloseness(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: Column,
      t: Double, maxDomain: Int = 10000): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t <= 1, s"t must sit in (0,1], got $t")
    val qc = quasiCols.map(col)
    val cells = df
      .select(qc :+ sensitiveCol.cast("double").as("__s"): _*)
      .filter(col("__s").isNotNull && !isnan(col("__s")))
      .groupBy(qc :+ col("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    cells.cache()
    try {
      val domain = cells.groupBy("__s").agg(sum(col("__c")).as("__g"))
      val m = domain.count()
      require(m >= 2,
        "sensitive attribute is constant — nothing to audit")
      require(m <= maxDomain,
        s"sensitive domain $m exceeds maxDomain=$maxDomain — bin the " +
          "attribute first (EMD over a raw continuous column is " +
          "noise anyway)")
      val nTotal = domain.agg(sum(col("__g"))).head().getLong(0)
      val classes = cells.groupBy(qc: _*).agg(sum(col("__c")).as("__n"))
      val grid = classes.crossJoin(broadcast(domain))
        .join(cells, quasiCols :+ "__s", "left")
        .withColumn("__d",
          coalesce(col("__c"), lit(0L)).cast("decimal(38,0)") * nTotal
            - col("__g").cast("decimal(38,0)") * col("__n"))
      val w = Window.partitionBy(qc: _*).orderBy(col("__s"))
      grid
        .withColumn("__cum", sum(col("__d")).over(w))
        .groupBy(qc :+ col("__n").as("n"): _*)
        .agg(sum(abs(col("__cum"))).as("__emd"))
        .withColumn("t_emd",
          round(col("__emd").cast("double")
            / (lit(nTotal.toDouble) * col("n") * lit(m - 1.0)), 9))
        .withColumn("passed", col("t_emd") <= t)
        .select((qc :+ col("n") :+ col("t_emd") :+ col("passed")): _*)
        .orderBy(qc: _*)
    } finally cells.unpersist(blocking = false)
  }
}
