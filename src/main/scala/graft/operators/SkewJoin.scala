package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys — the explicit-control companion
  * to AQE's runtime skew splitting (`spark.sql.adaptive.skewJoin`): AQE
  * only rescues SORT-MERGE joins whose skew shows up in map output sizes,
  * and only after the lopsided shuffle has been written; salting removes
  * the hot partition from the plan itself, which is what you want when
  * the hot keys are KNOWN (crawl corpora: the empty-string host, the
  * null-URL bucket, `en` in a language join — a handful of keys carrying
  * double-digit percentages of 100 TB).
  *
  * Shape: the fact side appends a salt in [0, salt) derived from the
  * ROW'S OWN CONTENT (`xxhash64` over every fact column, modulo salt) —
  * a pure function of the row, so a recomputed map task after a fetch
  * failure reassigns the identical salt and partial stage retry can
  * never mix old and new map outputs under different sub-keys (the
  * hazard of positional schemes like `monotonically_increasing_id`,
  * which Spark marks nondeterministic precisely because it depends on
  * partition/row order). Exact duplicate rows share a salt bucket; hot
  * keys in practice carry distinct payloads (URLs, timestamps), and a
  * caller with degenerate fully-duplicate hot rows should aggregate them
  * first — replicating identical rows across reducers buys nothing. The
  * dim side replicates each row salt times. The join key becomes
  * (keys..., salt), so the hot key's rows land on `salt` reducers
  * instead of one. Dim-side cost: ×salt rows — use for dims that are
  * small-ish but too big (or too dynamic) to broadcast outright; for
  * truly tiny dims `broadcast()` beats salting and for even fact/fact
  * joins neither applies.
  *
  * Join types: inner, left (outer), left_semi, left_anti — the
  * fact-preserving types, where replication cannot duplicate unmatched
  * rows (each fact row exists once, under exactly one salt; each dim key
  * exists at EVERY salt, so match decisions are salt-invariant).
  * Right/full outer would emit unmatched dim rows once per salt replica
  * and are rejected loudly.
  */
object SkewJoin {

  /** Normalized (underscores stripped, lowercase) fact-preserving types. */
  private val Allowed = Set("inner", "left", "leftouter", "leftsemi",
    "leftanti")

  private val saltCol = "__graft_salt"

  /** Content-derived salt in [0, salt). Spark's hash expressions reject
    * MapType (no canonical element order); salt from the hashable
    * columns only — still a pure function of row content, and a fact
    * schema of ONLY maps has no usable identity to salt on, so refuse
    * loudly rather than degenerate. */
  private def contentSalt(
      fact: DataFrame, salt: Int): org.apache.spark.sql.Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val saltSource = fact.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toIndexedSeq
    require(saltSource.nonEmpty,
      "fact has no hashable (non-MapType) column to derive the salt from")
    pmod(xxhash64(saltSource: _*), lit(salt.toLong))
  }

  /** `fact ⋈ dim` on `keys`, fact-key skew neutralized over `salt`
    * sub-keys. Result is row-identical to the plain join (spec-pinned). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(keys.nonEmpty, "at least one join key required")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Allowed.contains(jt),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    val salted = fact.withColumn(saltCol, contentSalt(fact, salt))
    val replicated = dim.withColumn(saltCol,
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Pre-flight diagnostic for duplicate-heavy facts: per (key, salt
    * bucket) row counts for the `topKeys` largest keys, each bucket with
    * its share of the key and a `degraded` flag when one bucket holds
    * more than half the key's rows. Content-derived salting sends EXACT
    * duplicate rows to one bucket, so a duplicate-heavy hot key silently
    * reverts to the unsalted shape — this surfaces it. `degraded = true`
    * on a hot key means: pre-aggregate the duplicates (carry a count
    * column and weight downstream) before the join.
    *
    * Cost: one (keys, salt) aggregation over the fact table plus a
    * broadcast of the topKeys key totals — run once when adopting a
    * salt, not per query. */
  def saltSkewProfile(fact: DataFrame, keys: Seq[String], salt: Int,
      topKeys: Int = 20): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(keys.nonEmpty, "at least one join key required")
    val byBucket = fact.withColumn(saltCol, contentSalt(fact, salt))
      .groupBy((keys.map(col) :+ col(saltCol).as("salt")): _*)
      .agg(count(lit(1)).as("bucket_rows"))
    val hotKeys = byBucket.groupBy(keys.map(col): _*)
      .agg(sum(col("bucket_rows")).as("key_rows"),
        max(col("bucket_rows")).as("max_bucket_rows"))
      .orderBy(col("key_rows").desc)
      .limit(topKeys)
    byBucket.join(broadcast(hotKeys), keys)
      .withColumn("bucket_share",
        round(col("bucket_rows") / col("key_rows"), 4))
      .withColumn("degraded",
        col("max_bucket_rows") * 2 > col("key_rows"))
      .select((keys.map(col) ++ Seq(col("salt"), col("bucket_rows"),
        col("key_rows"), col("bucket_share"), col("degraded"))): _*)
      .orderBy(col("key_rows").desc +: col("bucket_rows").desc +:
        keys.map(col) :+ col("salt"): _*)
  }
}
