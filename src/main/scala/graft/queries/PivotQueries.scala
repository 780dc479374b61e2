package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.core.MergeKeys
import graft.transform.Enwiden
import org.apache.spark.sql.functions._

/** A7 enwiden (long→wide pivot) + A8 baseline consolidation, exercised on
  * lineitem with l_orderkey as the participant and l_linenumber as the
  * session (1..3 canonicalize to BAS1..BAS3, 4..7 stay numeric labels —
  * reference label map export.py:112–150).
  *
  * The synthetic lineitem has duplicate (orderkey, linenumber) pairs, so the
  * reference's row-order-dependent `first` is nondeterministic here; these
  * oracle-checked entries use the deterministic MinNonNull cell aggregation
  * (= MIN FILTER in the oracle), identical to `first` on unique keys.
  */
object PivotQueries extends QueryModule {

  private val liKeys = MergeKeys(
    primaryId = "l_orderkey",
    sessionId = Some("l_linenumber"),
    compositeId = None,
    isLongitudinal = true)

  private def labels: Seq[(Int, String)] =
    (1 to 7).map(n => n -> Enwiden.sessionLabel(n.toString))

  private def pivotExprs(cols: Seq[String]): Seq[String] =
    cols.flatMap(c => labels.map { case (n, lab) =>
      s"MIN($c) FILTER (WHERE l_linenumber = $n) AS ${c}_$lab"
    })

  /** A7: enwiden lineitem quantities/prices per line number. */
  val a7Enwiden: Q = Q(
    "a7_enwiden_pivot",
    Some(s"""
      SELECT l_orderkey,
        ${pivotExprs(Seq("l_quantity", "l_extendedprice")).mkString(",\n        ")}
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      Enwiden.enwiden(df, liKeys, cellAgg = Enwiden.MinNonNull).orderBy("l_orderkey")
    })

  /** A8: baseline consolidation after enwiden — BAS = BAS3 > BAS2 > BAS1
    * non-null priority (only the 1..3 line numbers map to BAS labels). */
  val a8Baseline: Q = Q(
    "a8_baseline_consolidation",
    Some(s"""
      SELECT l_orderkey,
        ${pivotExprs(Seq("l_quantity")).filterNot(_.contains("_BAS")).mkString(",\n        ")},
        COALESCE(
          MIN(l_quantity) FILTER (WHERE l_linenumber = 3),
          MIN(l_quantity) FILTER (WHERE l_linenumber = 2),
          MIN(l_quantity) FILTER (WHERE l_linenumber = 1)) AS l_quantity_BAS
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""),
    (s, dir) => {
      val df = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      Enwiden.enwiden(df, liKeys, consolidateBaselines = true, cellAgg = Enwiden.MinNonNull).orderBy("l_orderkey")
    })

  override def queries: Seq[Q] = Seq(a7Enwiden, a8Baseline)
}
