package graft

import graft.catalog.TableCatalog
import graft.core.{EngineConfig, Filter}
import graft.core.Filter._
import graft.query.CohortQuery

/** Cohort semantics on the three canonical fixture layouts (FIXTURES.md),
  * with data authored here (not copied from the reference). */
class CohortQuerySpec extends SparkSpec {

  private def crossSectionalDir(): String = fixtureDir(
    "demographics.csv" ->
      """ursi,age,sex,height,weight
        |S001,25,1.0,165.5,60.2
        |S002,31,2.0,180.1,82.0
        |S003,44,1.0,158.9,55.4
        |S004,19,2.0,175.0,70.3
        |S005,67,1.0,162.2,64.8""",
    "cognitive.csv" ->
      """ursi,working_memory,processing_speed,attention_score
        |S001,105,45,78
        |S002,98,52,64
        |S003,112,39,91
        |S005,101,47,70""",
    "unrelated.csv" ->
      """ursi,bogus_metric
        |S001,1
        |S002,2""")

  private def longitudinalDir(): String = fixtureDir(
    "demographics.csv" ->
      """ursi,session_num,age,sex
        |S001,BAS1,25,1.0
        |S001,BAS2,26,1.0
        |S002,BAS1,31,2.0
        |S002,BAS2,32,2.0
        |S003,BAS1,44,1.0""",
    "cognitive.csv" ->
      """ursi,session_num,working_memory
        |S001,BAS1,105
        |S001,BAS2,107
        |S002,BAS1,98
        |S002,BAS2,96
        |S003,BAS1,112""")

  test("mixed-format catalog: csv hub + jsonl behavioral table join") {
    val dir = fixtureDir(
      "demographics.csv" ->
        """ursi,age
          |S001,25
          |S002,31
          |S003,44""",
      "labs.jsonl" ->
        """{"ursi":"S001","glucose":5.2}
          |{"ursi":"S003","glucose":6.1}""")
    val cat = new TableCatalog(spark, EngineConfig(dir))
    assert(cat.tableNames == Seq("demographics", "labs"))
    assert(cat.table("labs").count() == 2)
    val q = CohortQuery(cat,
      filters = Seq(NumericRange("labs", "glucose", 5.0, 7.0)),
      selections = Seq(("labs", "glucose")))
    assert(q.count() == 2)
    val rows = q.data.orderBy("ursi").collect()
    assert(rows.map(_.getAs[String]("ursi")).toSeq == Seq("S001", "S003"))
    assert(rows.map(_.getAs[Double]("glucose")).toSeq == Seq(5.2, 6.1))
  }

  test("cross-sectional structure detection") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val k = cat.mergeKeys
    assert(!k.isLongitudinal && k.primaryId == "ursi" && k.mergeColumn == "ursi")
    assert(cat.behavioralTableNames == Seq("cognitive", "unrelated"))
  }

  test("longitudinal detection derives composite ID") {
    val cat = new TableCatalog(spark, EngineConfig(longitudinalDir()))
    val k = cat.mergeKeys
    assert(k.isLongitudinal && k.mergeColumn == "customID")
    val ids = cat.demographics.select("customID").collect().map(_.getString(0)).sorted
    assert(ids.head == "S001_BAS1" && ids.length == 5)
    assert(cat.sessionValues == Seq("BAS1", "BAS2"))
  }

  test("fallback ladder: *id* column when no configured primary") {
    val dir = fixtureDir("demographics.csv" ->
      """subject_id,age
        |X1,30
        |X2,40""")
    val cat = new TableCatalog(spark, EngineConfig(dir))
    assert(cat.mergeKeys.primaryId == "subject_id")
  }

  test("count-path quirk: session filter + demographics-only join set force-adds first behavioral table") {
    // Reference filters.py:289–291: longitudinal + a session filter + a
    // demographics-only join set => the FIRST available behavioral table is
    // added to the count query's join set (and only there).
    val cat = new TableCatalog(spark, EngineConfig(longitudinalDir()))
    val q = CohortQuery(cat, filters = Seq(Sessions(Seq("BAS1"))))
    assert(q.joinTables.isEmpty, "data-path join set stays demographics-only")
    assert(q.countJoinTables() == Seq("cognitive"), "count path adds cognitive")
    assert(q.countJoinTables(countPathQuirk = false).isEmpty)
    // The left join never changes COUNT(DISTINCT key): literal parity.
    assert(q.count() == 3L)
    assert(q.count(countPathQuirk = false) == 3L)
    // No session filter, or a non-empty join set => no force-add.
    assert(CohortQuery(cat).countJoinTables().isEmpty)
    assert(CohortQuery(cat, filters = Seq(Sessions(Seq("BAS1"))),
      selectedTables = Seq("cognitive")).countJoinTables() == Seq("cognitive"))
  }

  test("count + filters, cross-sectional") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val q = CohortQuery(cat,
      filters = Seq(
        AgeRange(20, 50),
        NumericRange("cognitive", "working_memory", 100, 120)))
    // S001 (25, 105) and S003 (44, 112); S005 is 67; S002 wm=98; S004 absent.
    assert(q.count() == 2)
  }

  test("join-set minimization leaves unreferenced tables out of the plan") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val q = CohortQuery(cat, filters = Seq(AgeRange(20, 50)))
    assert(q.joinTables.isEmpty)
    val withFilter = q.copy(filters = q.filters :+
      NumericRange("cognitive", "working_memory", 0, 200))
    assert(withFilter.joinTables == Seq("cognitive"))
    assert(!withFilter.basePlan.queryExecution.analyzed.toString.contains("bogus_metric"))
  }

  test("left join preserves hub rows; filter on behavioral table tightens") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val all = CohortQuery(cat, selectedTables = Seq("cognitive"))
    assert(all.count() == 5) // S004 kept with null cognitive columns
    val filtered = CohortQuery(cat,
      filters = Seq(NumericRange("cognitive", "working_memory", 0, 200)))
    assert(filtered.count() == 4) // S004 drops: null fails the predicate
  }

  test("longitudinal count counts participant-sessions (reference behavior)") {
    val cat = new TableCatalog(spark, EngineConfig(longitudinalDir()))
    val q = CohortQuery(cat)
    assert(q.count() == 5) // 2+2+1 sessions, not 3 participants
    val bas1 = CohortQuery(cat, filters = Seq(Sessions(Seq("BAS1"))))
    assert(bas1.count() == 3)
  }

  test("data query selects keys + demographics + selected behavioral columns") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val q = CohortQuery(cat,
      filters = Seq(AgeRange(20, 50)),
      selections = Seq(("cognitive", "working_memory")))
    val df = q.data
    assert(df.columns.toSeq == Seq("ursi", "age", "sex", "height", "weight", "working_memory"))
    assert(df.count() == 3)
  }

  test("boolean normalization") {
    assert(Filter.normalizeBoolean(Seq("Yes", "No")) == Some(Seq(true, false)))
    assert(Filter.normalizeBoolean(Seq("1", "0", "True")) == Some(Seq(true, false, true)))
    assert(Filter.normalizeBoolean(Seq("Maybe")).isEmpty)
  }

  test("substudy token match is whole-word") {
    val dir = fixtureDir("demographics.csv" ->
      """ursi,age,all_studies
        |S001,25,Discovery Longitudinal_Adult
        |S002,30,Longitudinal_Child
        |S003,35,Discovery""")
    val cat = new TableCatalog(spark, EngineConfig(dir))
    val q = CohortQuery(cat, filters = Seq(Substudies(Seq("Discovery"))))
    assert(q.count() == 2) // not Longitudinal_Child; substring would not match either, whole-word does match S003
  }

  test("unknown table/column rejected by catalog validation") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    intercept[IllegalArgumentException](cat.table("nope"))
    intercept[IllegalArgumentException](cat.validateColumn("cognitive", "nope"))
  }

  test("numeric ranges metadata in one pass") {
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val m = cat.meta("demographics")
    assert(m.numericRanges("age") == (19.0, 67.0))
    assert(!m.numericColumns.contains("ursi"))
  }

  test("catalog is format-pluggable: parquet directory with configured hub") {
    val cat = new TableCatalog(spark, EngineConfig(
      dataDir = "/root/testdata/sf0.001",
      demographicsTable = "customer",
      primaryIdColumn = "c_custkey"))
    assert(cat.mergeKeys == graft.core.MergeKeys("c_custkey"))
    assert(cat.tableNames.contains("lineitem"))
    val q = CohortQuery(cat,
      filters = Seq(NumericRange("orders", "o_totalprice", 0, 1e9)))
    // orders joins on c_custkey? it lacks that column -> clear error
    val err = intercept[IllegalArgumentException](q.count())
    assert(err.getMessage.contains("merge column"))
    // hub-only count works over parquet
    assert(CohortQuery(cat).count() == cat.demographics.count())
  }

  test("metaFromStore serves the same numeric ranges as the full-scan meta") {
    import graft.catalog.StatsStore
    val cat = new TableCatalog(spark, EngineConfig(crossSectionalDir()))
    val full = cat.meta("cognitive")
    assert(full.numericRanges.nonEmpty)

    // each "ingest batch" appends its own sketch; no full rescan ever
    val statsDir = java.nio.file.Files.createTempDirectory("graft-meta-store")
      .resolve("cognitive").toString
    val df = cat.table("cognitive")
    val batches = Seq(
      df.limit(2),
      df.exceptAll(df.limit(2)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StatsStore.append(statsDir, b, full.numericColumns, s"batch$i")
    }

    val incremental = cat.metaFromStore("cognitive", statsDir)
    assert(incremental.numericColumns == full.numericColumns)
    assert(incremental.numericRanges == full.numericRanges,
      s"store ${incremental.numericRanges} vs scan ${full.numericRanges}")
  }
}
