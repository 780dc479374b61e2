package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot delta between two corpus versions — the audit primitive for
  * incremental crawls: which documents appeared, vanished, or changed
  * between yesterday's corpus and today's. (The reference keeps no
  * versioned state; beyond-reference pipeline surface.)
  *
  * Scale shape: content columns are hashed DOWN TO 8 BYTES map-side
  * (`xxhash64` before the join), so the full outer join shuffles
  * (id, hash) pairs — never the document payload. At 100 TB that is the
  * difference between a metadata-sized shuffle and re-shuffling the
  * corpus twice. The hash compare treats a 64-bit collision as
  * "unchanged" (rate 2^-64 per changed doc — the standard fingerprint
  * trade every snapshot differ makes); pass more columns to widen what
  * counts as content.
  */
object CorpusDiff {

  /** Per-id status between `prev` and `cur`: `added` (only in cur),
    * `removed` (only in prev), `changed` (both, content hash differs),
    * `unchanged`. Null content hashes equal only each other (Spark's
    * xxhash64 of an all-null row is the seed constant on both sides, so
    * null-content rows compare stably). Contract: `idCol` is unique
    * within each snapshot (the standard corpus key contract — dedupe
    * first if not); duplicate ids would fan out through the join and
    * repeat their status row per pairing. */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "at least one content column required")
    def hashed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("id"),
        xxhash64(contentCols.map(col): _*).as(s"__h_$side"))
    hashed(prev, "prev").join(hashed(cur, "cur"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__h_prev").isNull, lit("added"))
          .when(col("__h_cur").isNull, lit("removed"))
          .when(col("__h_prev") === col("__h_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** [[diff]] rolled up to the four status counts — the snapshot-delta
    * line a corpus dashboard records per ingest. */
  def diffSummary(prev: DataFrame, cur: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(prev, cur, idCol, contentCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
