package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record-linkage candidate generation — near-duplicate ENTITY matching
  * (customer/supplier/author records), the structured-data sibling of the
  * text dedup family.
  *
  * The Splink/dedupe shape: a BLOCKING equi-join bounds comparisons to
  * records sharing a cheap key (nation, zip prefix, soundex…) — never the
  * corpus cross product — then per-pair similarity (edit distance on the
  * name) keeps the true candidates. Inside a block the comparison is
  * block², so blocks must be kept small; the length-difference prefilter
  * runs BEFORE levenshtein (|len(a)−len(b)| > maxEdit already exceeds the
  * bound — a one-instruction reject that skips the O(n·m) DP on most
  * pairs). Oversized blocks get the same observed-metric runtime warning
  * discipline as the text dedup paths (cap via `maxBlockSize`).
  */
object EntityResolution {

  /** Registers the banded edit distance against an EXPLICIT session and
    * returns the Column: exact when ≤ k, else k+1 — the native codegen'd
    * [[graft.functions.BoundedLevenshtein]], O(k·n) instead of the
    * builtin's O(n·m) full matrix. Registration mutates `spark`'s function
    * registry (idempotent; name is keyed on k). */
  def boundedEditIn(spark: org.apache.spark.sql.SparkSession,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    val fname = s"graft_bounded_lev_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => graft.functions.BoundedLevenshtein(exprs(0), exprs(1), k),
      "built-in")
    call_function(fname, a, b)
  }

  /** [[boundedEditIn]] against `SparkSession.active`. SIDE EFFECT: building
    * the Column registers a temp function in the active session — in
    * multi-session apps prefer [[boundedEditIn]] with the session that owns
    * the DataFrame (r9 ADVICE; [[candidatePairs]] does exactly that). */
  def boundedEdit(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    boundedEditIn(org.apache.spark.sql.SparkSession.active, a, b, k)

  /** Candidate pairs (id1 < id2, edit ≤ maxEdit) within blocks. Pairs from
    * blocks larger than `maxBlockSize` are excluded (and should be
    * re-blocked on a finer key); 0 disables the cap. */
  def candidatePairs(
      df: DataFrame, blockCols: Seq[String], idCol: String, nameCol: String,
      maxEdit: Int = 2, maxBlockSize: Int = 100000): DataFrame = {
    require(blockCols.nonEmpty, "blocking keys required — all-pairs ER is quadratic")
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("__id") :+
        col(nameCol).as("__name")): _*)
    val capped =
      if (maxBlockSize <= 0) base
      else {
        val sizes = base.groupBy(blockCols.map(col): _*)
          .agg(count(lit(1)).as("__bn"))
        base.join(broadcast(sizes.filter(col("__bn") <= maxBlockSize)),
          blockCols).drop("__bn")
      }
    val a = capped.select(blockCols.map(col) :+ col("__id").as("id1") :+
      col("__name").as("__n1"): _*)
    val b = capped.select(blockCols.map(col) :+ col("__id").as("id2") :+
      col("__name").as("__n2"): _*)
    a.join(b, blockCols)
      .filter(col("id1") < col("id2"))
      // cheap reject first: a length gap > maxEdit already exceeds the bound
      .filter(abs(length(col("__n1")) - length(col("__n2"))) <= maxEdit)
      // banded DP: exact within the bound, k+1 past it (filtered out), at
      // O(maxEdit·n) per pair instead of the builtin's full O(n·m) matrix
      .withColumn("edit",
        boundedEditIn(df.sparkSession, col("__n1"), col("__n2"), maxEdit))
      .filter(col("edit") <= maxEdit)
      .select((blockCols.map(col) :+ col("id1") :+ col("id2") :+
        col("edit")): _*)
  }

  /** One comparison field for [[fellegiSunter]]: `agree` is a boolean
    * Column over the candidate-pair frame (equality, a similarity
    * threshold, a numeric tolerance…); `m` = P(agree | same entity) and
    * `u` = P(agree | different entities) are the caller's match/unmatch
    * rates — the "provided m/u" path (the EM fit that estimates them is
    * a training concern, not a scoring one). */
  final case class FieldSpec(
      name: String, agree: org.apache.spark.sql.Column, m: Double, u: Double) {
    require(name.nonEmpty, "field name required")
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"$name: m and u must sit strictly inside (0, 1), got m=$m u=$u")
    require(m > u,
      s"$name: m must exceed u (agreement must be EVIDENCE of a match), " +
        s"got m=$m u=$u")
    /** log₂ likelihood-ratio contributions — constants of the spec, so
      * both engines fold the identical doubles. */
    val agreeWeight: Double = math.log(m / u) / math.log(2.0)
    val disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Fellegi–Sunter probabilistic record linkage scoring (Fellegi &
    * Sunter 1969 — public; the Splink scoring shape): each field
    * contributes its log₂(m/u) on agreement, log₂((1−m)/(1−u)) on
    * disagreement, and ZERO when the comparison is null (a missing value
    * is no evidence either way); the summed match weight classifies the
    * pair against `upper`/`lower` into match / possible / non_match
    * (the "possible" band is the clerical-review queue).
    *
    * Takes CANDIDATE pairs (from [[candidatePairs]] or any blocking
    * join) — scoring is one narrow codegen'd map over the pair table, so
    * the scale story is entirely the blocker's. Adds one `agree_<name>`
    * flag per field (null-safe int), `match_weight` (rounded 6) and
    * `classification`. The per-field weights are driver-computed literal
    * doubles, so a SQL oracle replays the exact fold. */
  def fellegiSunter(
      pairs: DataFrame, fields: Seq[FieldSpec],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    require(fields.map(_.name).distinct.size == fields.size,
      "field names must be unique")
    require(upper >= lower, s"upper $upper must be >= lower $lower")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_${f.name}",
        when(f.agree, 1).when(!f.agree, 0))
    }
    // one fixed-order arithmetic expression, never a re-orderable
    // aggregation: both engines sum the same literal doubles in the same
    // order, so the weight is bit-identical before the final round
    val weight = fields.map { f =>
      when(col(s"agree_${f.name}") === 1, lit(f.agreeWeight))
        .when(col(s"agree_${f.name}") === 0, lit(f.disagreeWeight))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    flagged
      .withColumn("match_weight", round(weight, 6))
      .withColumn("classification",
        when(col("match_weight") >= upper, "match")
          .when(col("match_weight") < lower, "non_match")
          .otherwise("possible"))
  }
}
