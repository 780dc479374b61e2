package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the merge step after entity resolution
  * (candidates from [[EntityResolution]], clusters from
  * [[Clusters.assignClusters]]): collapse each matched cluster to ONE
  * record by per-attribute rules, the standard MDM recipe (longest
  * string for names, most recent for addresses, majority for
  * categoricals, max/min for numerics).
  *
  * Every rule is a deterministic TOTAL order realized as
  * `max(struct(orderKey..., value))` — the struct comparison is
  * lexicographic in BOTH engines, so ties resolve identically (largest
  * count → largest value for [[Majority]]; latest timestamp → largest
  * value for [[Latest]]) and the oracle hash-matches without any
  * "arbitrary tie" caveat. Null attribute values become null structs,
  * which aggregation skips: an all-null cluster surfaces a null, never
  * a fabricated value.
  *
  * Scale shape: all struct-max rules ride ONE hash aggregation per
  * cluster (map-side combined); each [[Majority]] column adds one
  * (cluster, value) count pass + a cluster-sized struct-max, joined
  * back on the cluster id — shuffles bounded by clusters × distinct
  * values, never records². */
object Survivorship {

  sealed trait Rule
  /** Longest non-null string; length ties → lexicographically largest. */
  case object LongestString extends Rule
  case object MaxValue extends Rule
  case object MinValue extends Rule
  /** Most frequent non-null value; count ties → largest value. */
  case object Majority extends Rule
  /** Value at the greatest `tsCol` (rows with null ts never win);
    * timestamp ties → largest value. */
  final case class Latest(tsCol: String) extends Rule

  def goldenRecords(
      df: DataFrame, clusterCol: String,
      rules: Map[String, Rule]): DataFrame = {
    require(rules.nonEmpty, "no survivorship rules")
    val cl = col(clusterCol)
    val onePass = rules.toSeq.sortBy(_._1).collect {
      case (c, LongestString) =>
        max(when(col(c).isNotNull,
          struct(length(col(c)).as("k"), col(c).as("v"))))
          .getField("v").as(c)
      case (c, MaxValue) => max(col(c)).as(c)
      case (c, MinValue) => min(col(c)).as(c)
      case (c, Latest(ts)) =>
        max(when(col(c).isNotNull && col(ts).isNotNull,
          struct(col(ts).as("k"), col(c).as("v"))))
          .getField("v").as(c)
    }
    val aggs = count(lit(1)).as("n_records") +: onePass
    val base = df.groupBy(cl.as("cluster")).agg(aggs.head, aggs.tail: _*)
    rules.toSeq.sortBy(_._1).collect { case (c, Majority) => c }
      .foldLeft(base) { (acc, c) =>
        val maj = df.filter(col(c).isNotNull)
          .groupBy(cl.as("cluster"), col(c).as("__v"))
          .agg(count(lit(1)).as("__n"))
          .groupBy("cluster")
          .agg(max(struct(col("__n").as("k"), col("__v").as("v")))
            .getField("v").as(c))
        acc.join(maj, Seq("cluster"), "left")
      }
  }
}
