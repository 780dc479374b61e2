package graft

import graft.core.MergeKeys
import graft.transform.{Enwiden, ExportPrep}

class EnwidenSpec extends SparkSpec {
  import spark.implicits._

  private val keys = MergeKeys("ursi", Some("session_num"), Some("customID"), isLongitudinal = true)

  test("session label canonicalization (reference export.py:112-150)") {
    val cases = Map(
      "BAS1" -> "BAS1", "baseline2" -> "BAS2", "BASE3" -> "BAS3",
      "1" -> "BAS1", "2.0" -> "BAS2", "3.00" -> "BAS3",
      "visit1" -> "BAS1", "V2" -> "BAS2", "v3" -> "BAS3",
      "FLU1" -> "FLU1", "follow-up!" -> "FOLLOWUP", "4" -> "4")
    cases.foreach { case (in, out) => assert(Enwiden.sessionLabel(in) == out, s"for $in") }
  }

  test("static vs dynamic classification; nulls don't make a column dynamic") {
    val df = Seq(
      ("S1", "BAS1", Some(25), Some(100)),
      ("S1", "BAS2", Some(25), Some(105)),
      ("S2", "BAS1", Some(40), None),
      ("S2", "BAS2", None, Some(90))
    ).toDF("ursi", "session_num", "age", "wm")
    val wide = Enwiden.enwiden(df, keys)
    // age static (S1: {25}, S2: {40} — null ignored); wm dynamic (S1: {100,105})
    assert(wide.columns.toSeq == Seq("ursi", "age", "wm_BAS1", "wm_BAS2"))
    val rows = wide.orderBy("ursi").collect()
    assert(rows(0).getAs[Int]("age") == 25 && rows(1).getAs[Int]("age") == 40)
    assert(rows(1).isNullAt(wide.columns.indexOf("wm_BAS1")))
    assert(rows(1).getAs[Int]("wm_BAS2") == 90)
  }

  test("single session returns input unchanged") {
    val df = Seq(("S1", "BAS1", 1), ("S2", "BAS1", 2)).toDF("ursi", "session_num", "x")
    assert(Enwiden.enwiden(df, keys) eq df)
  }

  test("missing sessions produce null cells, not dropped participants") {
    val df = Seq(
      ("S1", "visit1", 10), ("S1", "visit2", 11), ("S1", "visit3", 12),
      ("S2", "visit1", 20)
    ).toDF("ursi", "session_num", "score")
    val wide = Enwiden.enwiden(df, keys)
    assert(wide.columns.toSeq == Seq("ursi", "score_BAS1", "score_BAS2", "score_BAS3"))
    val s2 = wide.filter($"ursi" === "S2").head()
    assert(s2.getAs[Int]("score_BAS1") == 20 && s2.isNullAt(2) && s2.isNullAt(3))
  }

  test("baseline consolidation: BAS3 > BAS2 > BAS1 priority, originals dropped") {
    val df = Seq(
      ("S1", Some(1.0), Some(2.0), Some(3.0)),
      ("S2", Some(1.0), Some(2.0), None),
      ("S3", Some(1.0), None, None),
      ("S4", None, None, None)
    ).toDF("ursi", "x_BAS1", "x_BAS2", "x_BAS3")
    val out = Enwiden.consolidateBaseline(df)
    assert(out.columns.toSeq == Seq("ursi", "x_BAS"))
    val vals = out.orderBy("ursi").collect().map(r => Option(r.get(1)))
    assert(vals.toSeq == Seq(Some(3.0), Some(2.0), Some(1.0), None))
  }

  test("consolidation leaves single-session groups alone") {
    val df = Seq(("S1", 1.0, 9.0)).toDF("ursi", "x_BAS1", "y_FLU1")
    val out = Enwiden.consolidateBaseline(df)
    assert(out.columns.toSeq == Seq("ursi", "x_BAS1", "y_FLU1"))
  }

  test("export prep: all-null pruned, sparse flagged, dups counted, sorted") {
    val df = Seq(
      ("S2", Some(1), None: Option[String]),
      ("S1", Some(2), None),
      ("S1", None, None)
    ).toDF("ursi", "x", "empty")
    val k = MergeKeys("ursi")
    val (out, report) = ExportPrep.prepare(df, k)
    assert(report.droppedAllNull == Seq("empty"))
    assert(!out.columns.contains("empty"))
    assert(report.duplicateKeyRows == 2)
    assert(out.select("ursi").collect().map(_.getString(0)).toSeq == Seq("S1", "S1", "S2"))
  }
}
