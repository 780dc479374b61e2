package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed keys — the escape hatch for the aggregations Spark
  * cannot spread on its own.
  *
  * What Spark already handles (do NOT salt these):
  *   - algebraic aggs (sum/count/min/max/avg/moments): partial aggregation
  *     compresses each mapper's hot key to one row before the shuffle;
  *   - `countDistinct`: Catalyst rewrites it to a two-phase plan whose
  *     first shuffle keys on (group, value), spreading a hot group;
  *   - skewed JOINs: AQE's skew-join splits oversized partitions at
  *     runtime (`spark.sql.adaptive.skewJoin.enabled`, on by default).
  *
  * What is left is the holistic aggs — `collect_set`/`collect_list` and
  * friends — where every value of a hot key lands on ONE reducer and the
  * map-side partial buffers the whole set. At 100 TB a single key holding
  * 1% of rows is a 1 TB reducer: that is an OOM, not a slowdown. The fix
  * is to salt by the VALUE's hash, so each hot key is split over `buckets`
  * reducers and — because identical values hash identically — every bucket
  * holds a DISJOINT slice of the value set: the phase-2 merge is a cheap
  * flatten of already-deduplicated, non-overlapping fragments over the now
  * key-per-row-sized data.
  *
  * Reference anchor: site/unique-value collection (demographics.py:484-497,
  * get_study_site_values) is the reference's collect_set-shaped operation;
  * [[graft.stats.SiteValues]]/[[graft.stats.CrossFilter]] are where this
  * matters at scale.
  */
object Skew {

  /** `collect_set(value) GROUP BY keys`, salted: exact same result as the
    * direct agg, but no reducer ever holds more than ~1/`buckets` of a hot
    * key's values. Output: keys ++ (`values`: sorted distinct array). */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val keyCols = keys.map(col)
    // no null pre-filter: collect_set already skips nulls, and dropping
    // null-valued ROWS would drop a KEY whose values are all null — the
    // direct agg keeps that key with an empty set
    df.groupBy(keyCols :+ pmod(xxhash64(col(valueCol)), lit(buckets)).as("__salt"): _*)
      .agg(collect_set(col(valueCol)).as("__frag"))
      .groupBy(keyCols: _*)
      .agg(array_sort(flatten(collect_list(col("__frag")))).as("values"))
  }

  /** Distinct count per key via the same value-hash salting (exact; sums
    * disjoint per-bucket distinct counts). Spark's own `countDistinct`
    * plans an equivalent shape — this exists for symmetry with
    * [[saltedCollectSet]] when the caller also needs the count without
    * materializing the set. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ pmod(xxhash64(col(valueCol)), lit(buckets)).as("__salt"): _*)
      .agg(countDistinct(col(valueCol)).as("__frag_n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__frag_n")).as("n_distinct"))
  }
}
