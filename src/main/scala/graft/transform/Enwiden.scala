package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.MergeKeys

/** Long→wide pivot of longitudinal data ("enwiden") plus baseline
  * consolidation (reference: analysis/export.py:24–233).
  *
  * Semantics reproduced exactly (SURVEY.md §2.4 A7/A8, §7.4 #1–3):
  *  - sessions = sorted distinct non-null session values (as strings);
  *  - a column is *static* iff no participant has >1 distinct non-null value
  *    across sessions (`countDistinct` ignores nulls, matching pandas
  *    `nunique`), else *dynamic*;
  *  - static → one value per participant (any non-null — they are all equal
  *    by definition); dynamic → per-session columns `col_<LABEL>` taking the
  *    first non-null value per (participant, session);
  *  - session labels canonicalized via the reference's order-sensitive map
  *    (BAS/numeric/visit/V forms → BAS1..3, else cleaned uppercase, else SES-prefixed).
  *
  * Plan shape (designed for scale): ONE classification aggregate over all
  * value columns + ONE conditional-aggregation pass (the `pivot` sugar is
  * bypassed so both static and dynamic columns come out of a single
  * shuffle). No per-column jobs, no driver-side row loops — at 100 TB this
  * is two map-side-combinable hash aggregates on the participant key.
  */
object Enwiden {

  /** Reference session-label canonicalization (export.py:112–150). */
  def sessionLabel(session: String): String = {
    val s = session.trim
    val up = s.toUpperCase
    val low = s.toLowerCase
    if (Set("BAS1", "BASELINE1", "BASE1")(up)) "BAS1"
    else if (Set("BAS2", "BASELINE2", "BASE2")(up)) "BAS2"
    else if (Set("BAS3", "BASELINE3", "BASE3")(up)) "BAS3"
    else if (Set("1", "1.0", "1.00")(s)) "BAS1"
    else if (Set("2", "2.0", "2.00")(s)) "BAS2"
    else if (Set("3", "3.0", "3.00")(s)) "BAS3"
    else if (Set("visit1", "v1")(low)) "BAS1"
    else if (Set("visit2", "v2")(low)) "BAS2"
    else if (Set("visit3", "v3")(low)) "BAS3"
    else {
      val clean = s.replaceAll("[^a-zA-Z0-9_]", "").toUpperCase
      if (clean.nonEmpty) clean else s"SES$s"
    }
  }

  /** Cell aggregation when a participant has several rows in one session.
    * [[FirstNonNull]] matches the reference (pandas `aggfunc='first'`), which
    * is file-row-order-dependent and therefore nondeterministic in a
    * distributed engine when (participant, session) is not unique.
    * [[MinNonNull]] is the deterministic tie-break for such data (SURVEY.md
    * §7.4 #2) — identical to FirstNonNull whenever keys are unique. */
  sealed trait CellAgg
  case object FirstNonNull extends CellAgg
  case object MinNonNull extends CellAgg

  /** Pivot `df` to wide format. Returns the input unchanged when the data is
    * not longitudinal or has ≤1 distinct session (export.py:47–62). */
  def enwiden(
      df: DataFrame,
      keys: MergeKeys,
      consolidateBaselines: Boolean = false,
      cellAgg: CellAgg = FirstNonNull): DataFrame = {
    if (!keys.isLongitudinal || keys.sessionId.isEmpty) return df
    val sessCol = keys.sessionId.get
    require(df.columns.contains(sessCol), s"Session column '$sessCol' not found")
    require(df.columns.contains(keys.primaryId), s"Primary ID column '${keys.primaryId}' not found")

    val sess = col(sessCol).cast(StringType)
    val sessions: Seq[String] = df
      .select(sess.as("s")).na.drop().distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (sessions.length <= 1) return df

    val excluded = Set(keys.primaryId, sessCol) ++ keys.compositeId.filter(df.columns.contains)
    val valueCols = df.columns.filterNot(excluded).toSeq

    // ONE shuffle over the data: a single groupBy(participant) computes,
    // per column, (a) the per-session pivot cells, (b) the whole-row cell
    // (for the static case), and (c) the per-participant distinct count for
    // classification — size(collect_set(c)), not countDistinct(c), because
    // multiple distinct aggregates make Spark insert an Expand that
    // multiplies input rows ×(columns+1) while collect_set stays a single
    // hash aggregate (set cardinality is bounded by the session count).
    // Classification then reduces the small wide frame, and a projection
    // picks pivoted or static columns — no second pass over the input.
    def cell(c: Column): Column = cellAgg match {
      case FirstNonNull => first(c, ignoreNulls = true)
      case MinNonNull   => min(c)
    }
    val aggs: Seq[Column] = valueCols.flatMap { c =>
      sessions.map(s => cell(when(sess === s, col(c))).as(s"__p__${c}__$s")) ++
        Seq(cell(col(c)).as(s"__w__$c"),
          size(collect_set(col(c))).as(s"__n__$c"))
    }
    val perParticipant = df.groupBy(col(keys.primaryId))
      .agg(aggs.head, aggs.tail: _*)
      .cache()

    val maxRow = perParticipant
      .agg(max(col(s"__n__${valueCols.head}")).as(valueCols.head),
        valueCols.tail.map(c => max(col(s"__n__$c")).as(c)): _*)
      .head()
    val dynamic: Set[String] = valueCols.filter { c =>
      val m = maxRow.getAs[Any](c)
      m != null && m.asInstanceOf[Int] > 1
    }.toSet

    val outCols: Seq[Column] = col(keys.primaryId) +: valueCols.flatMap { c =>
      if (dynamic(c))
        sessions.map(s => col(s"__p__${c}__$s").as(s"${c}_${sessionLabel(s)}"))
      else
        Seq(col(s"__w__$c").as(c))
    }
    val wide = perParticipant.select(outCols: _*)
    if (consolidateBaselines) consolidateBaseline(wide) else wide
  }

  /** Collapse `col_BAS1/2/3` groups into `col_BAS` via non-null priority
    * BAS3 > BAS2 > BAS1, dropping the originals (export.py:172–233). Only
    * groups with more than one baseline column are consolidated. */
  def consolidateBaseline(df: DataFrame): DataFrame = {
    val pattern = "^(.+)_(BAS[123])$".r
    val groups: Map[String, Seq[String]] = df.columns.toSeq
      .collect { case c @ pattern(base, _) => base -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.length > 1)
    if (groups.isEmpty) return df
    val dropped = groups.values.flatten.toSet
    val kept = df.columns.filterNot(dropped).map(col)
    val consolidated = groups.toSeq.sortBy(_._1).map { case (base, cols) =>
      val byPriority = Seq("BAS3", "BAS2", "BAS1")
        .map(sfx => s"${base}_$sfx").filter(cols.contains)
      coalesce(byPriority.map(col): _*).as(s"${base}_BAS")
    }
    df.select(kept ++ consolidated: _*)
  }
}
