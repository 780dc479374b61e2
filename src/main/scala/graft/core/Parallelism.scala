package graft.core

import org.apache.spark.sql.DataFrame

/** The compact-input parallelism guard (the covariance lesson, shared):
  * a table landed as one or two parquet files gives every downstream
  * narrow map one or two tasks — fatal for operators that run several
  * expensive per-row passes before their first shuffle. `widen`
  * repartitions to the session's shuffle parallelism ONLY when the
  * current partitioning actually undershoots it, so a real corpus
  * (thousands of splits) never pays the extra shuffle and a
  * benchmark-scale single file does. Callers should project to the
  * columns they need BEFORE widening — the shuffle then moves only the
  * payload the operator reads. */
object Parallelism {
  def widen(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }
}
