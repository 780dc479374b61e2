package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoding — the two encoders a tabular training
  * pipeline applies before models that want numbers.
  *
  * Both build a categories-sized dictionary with one groupBy and
  * broadcast it back: the data itself never shuffles, and the dictionary
  * is a deterministic artifact (frequency rank with value tie-break; no
  * hash collisions, no run-to-run drift) that can be persisted and reused
  * at serving time.
  */
object Encode {

  /** Frequency-rank index: the most frequent category gets 0, ties break
    * on the value itself. Nulls index null. */
  def categoryIndex(
      df: DataFrame, catCol: String, outCol: String): DataFrame = {
    val dict = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn(outCol,
        row_number().over(
          Window.orderBy(col("__cnt").desc, col(catCol))) - 1)
      .drop("__cnt")
    df.join(broadcast(dict), Seq(catCol), "left")
  }

  /** Leave-one-out target encoding: each row's category replaced by the
    * mean target of the OTHER rows in its category — (Σt − t)/(n − 1) —
    * the standard guard against the self-leakage plain mean-encoding has.
    * Group sums run decimal-exact so the encoding is engine-portable;
    * singleton categories (n = 1) encode null. */
  def targetEncodeLoo(
      df: DataFrame, catCol: String, targetCol: String, outCol: String,
      roundTo: Int = 6): DataFrame = {
    val d = col(targetCol).cast("decimal(18,2)")
    val m = df.groupBy(col(catCol)).agg(
      count(col(targetCol)).as("__n"),
      sum(d).cast("double").as("__sm"))
    df.join(broadcast(m), Seq(catCol), "left")
      .withColumn(outCol,
        when(col("__n") > 1,
          round((col("__sm") - col(targetCol).cast("double")) /
            (col("__n") - lit(1)), roundTo)))
      .drop("__n", "__sm")
  }
}
