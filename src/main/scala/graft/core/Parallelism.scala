package graft.core

import org.apache.spark.sql.DataFrame

/** The compact-input parallelism guard (the covariance lesson, shared):
  * a table landed as one or two parquet files gives every downstream
  * narrow map one or two tasks — fatal for operators that run several
  * expensive per-row passes before their first shuffle. `widen`
  * repartitions to the session's shuffle parallelism ONLY when the frame
  * reads from a small number of concrete input files — a METADATA-only
  * probe (`df.inputFiles`), never `.rdd`, because materializing the RDD
  * of an AQE plan with exchanges EXECUTES its shuffle stages (measured:
  * a 2.6× regression on an op that widened a derived frame). A real
  * corpus (thousands of files) never pays the extra shuffle; in-memory
  * or shuffle-fed frames report no input files and pass through
  * untouched. Callers should project to the columns they need BEFORE
  * widening — the shuffle then moves only the payload the operator
  * reads. */
object Parallelism {
  def widen(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val files = df.inputFiles.length
    if (files > 0 && files < parts) df.repartition(parts) else df
  }
}
