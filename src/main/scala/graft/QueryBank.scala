package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Exactness rules for oracle parity (driver hashes values after sorting
  * columns by name):
  *  - Sums over 2-decimal money columns go through `DECIMAL(18,2)` so both
  *    engines sum exactly, then cast to DOUBLE (identical bit pattern while
  *    the scaled value fits in 2^53).
  *  - Genuinely floating-point statistics (stddev, skewness, corr, ...) are
  *    rounded to a fixed number of decimals on BOTH sides.
  *  - Every query ends in an ORDER BY on a deterministic key, with NULLS
  *    FIRST spelled out in the oracle (Spark's ASC default) when the key can
  *    be null.
  *  - Aliases match the oracle column names exactly.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

trait QueryModule {
  def queries: Seq[Q]
}
