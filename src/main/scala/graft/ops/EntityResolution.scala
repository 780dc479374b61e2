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
}
