package graft

import graft.core.MergeKeys
import graft.ingest.Ingest
import graft.report.{PhenotypicFilterState, QueryState, Sinks, Toml}
import graft.catalog.TableCatalog
import graft.core.EngineConfig
import graft.stats.FilterFunnel

class ReportSpec extends SparkSpec {
  import spark.implicits._

  private def sampleState = QueryState(
    ageRange = Some((18.0, 65.0)),
    substudies = Seq("Discovery", "Longitudinal_Adult"),
    sessions = Seq("BAS1", "BAS2"),
    phenotypic = Seq(
      PhenotypicFilterState("cognitive", "working_memory", "range",
        rangeMin = Some(90), rangeMax = Some(120)),
      PhenotypicFilterState("cognitive", "handedness", "categorical",
        values = Seq("left", "right")),
      PhenotypicFilterState("survey", "consented", "categorical",
        values = Seq("Yes"))),
    selectedTables = Seq("cognitive"),
    selectedColumns = Map("cognitive" -> Seq("working_memory", "attention_score")),
    enwidenLongitudinal = true,
    consolidateBaseline = true,
    userNotes = "round-trip \"test\" with, punctuation\nand a newline",
    exportTimestamp = "2026-08-12T00:00:00")

  test("TOML query-state round-trip preserves everything") {
    val text = QueryState.toToml(sampleState)
    val (back, errors) = QueryState.fromToml(text)
    assert(errors.isEmpty)
    assert(back == sampleState)
  }

  test("TOML parser handles comments, escapes, arrays of tables") {
    val doc = Toml.parse(
      """# header comment
        |title = "has # hash and \"quotes\"" # trailing
        |n = 42
        |flag = true
        |xs = [1, 2, 3]
        |
        |[[item]]
        |name = "a"
        |
        |[[item]]
        |name = "b"
        |""".stripMargin)
    assert(doc("title") == Toml.Str("has # hash and \"quotes\""))
    assert(doc("n") == Toml.Num(42))
    assert(doc("xs") == Toml.Arr(Seq(Toml.Num(1), Toml.Num(2), Toml.Num(3))))
    assert(doc("item") == Toml.TblArr(Seq(
      Map("name" -> Toml.Str("a")), Map("name" -> Toml.Str("b")))))
  }

  test("state lowers to the filter algebra with boolean normalization") {
    val filters = QueryState.toFilters(sampleState)
    import graft.core.Filter._
    assert(filters.collect { case f: BooleanFilter => f }
      .exists(f => f.column == "consented" && f.values == Seq(true)))
    assert(filters.collect { case f: Categorical => f }
      .exists(_.values == Seq("left", "right")))
    assert(filters.head.isInstanceOf[Substudies]) // canonical order by construction
  }

  test("validation reports unknown tables/columns against the catalog") {
    val dir = fixtureDir(
      "demographics.csv" -> "ursi,age\nS1,30",
      "cognitive.csv" -> "ursi,working_memory\nS1,100")
    val cat = new TableCatalog(spark, EngineConfig(dir))
    val errors = QueryState.validate(sampleState, cat)
    assert(errors.exists(_.contains("Unknown table 'survey'")))
    assert(errors.exists(_.contains("Unknown column 'handedness'")))
    assert(!errors.exists(_.contains("working_memory")))
  }

  test("secure filenames strip paths and bad characters") {
    assert(Sinks.secureFilename("../../etc/passwd") == "passwd")
    assert(Sinks.secureFilename("my data (v2).csv") == "my_data_v2_.csv")
    assert(Sinks.secureFilename("..hidden") == "hidden")
  }

  test("csv export writes one headered file; zip bundles report") {
    val df = Seq(("S1", 1), ("S2", 2)).toDF("ursi", "x")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink")
    val csv = Sinks.csvExport(df.orderBy("ursi"), s"$tmp/out.csv")
    val lines = java.nio.file.Files.readAllLines(csv)
    assert(lines.get(0) == "ursi,x" && lines.size == 3)

    val zip = Sinks.summaryReportZip(s"$tmp/report.zip",
      Seq(FilterFunnel.Step(0, "baseline", 10, 0, 0.0)),
      df)
    val zf = new java.util.zip.ZipFile(zip.toFile)
    val names = zf.entries().asIterator().asScala.map(_.getName).toSet
    assert(names == Set("filtering_report.csv", "final_summary.csv"))
    zf.close()
  }

  test("profile JSON renders valid structure") {
    val df = Seq(("S1", 1.0, 10.0), ("S2", 2.0, 20.0), ("S3", 3.0, 31.0))
      .toDF("ursi", "x", "y")
    val json = Sinks.profileJson(df, MergeKeys("ursi"), Seq("x", "y"))
    assert(json.contains("\"row_count\":3"))
    assert(json.contains("\"column\":\"x\""))
    assert(json.contains("\"correlations\""))
    // parses as JSON (driver-side python reads these)
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("ingest: sanitizes headers, validates, derives composite, lands CSV") {
    val src = java.nio.file.Files.createTempDirectory("graft-ingest")
    java.nio.file.Files.writeString(src.resolve("My Upload (1).csv"),
      "ursi,session_num,Weird Col!,2nd\nS1,BAS1,=cmd(),5\n")
    val dataDir = java.nio.file.Files.createTempDirectory("graft-data")
    val keys = MergeKeys("ursi", Some("session_num"), Some("customID"), isLongitudinal = true)
    val (v, path) = Ingest.ingestCsv(spark, s"$src/My Upload (1).csv", dataDir.toString, keys)
    assert(v.ok, v.errors.mkString("; "))
    assert(v.warnings.exists(_.contains("formula-injection")))
    val landed = spark.read.option("header", "true").csv(path.get)
    assert(landed.columns.toSeq == Seq("ursi", "session_num", "Weird_Col", "c_2nd", "customID"))
    assert(landed.head().getAs[String]("customID") == "S1_BAS1")
  }

  test("ingest detects duplicate re-uploads: cancel rejects, rename lands anew") {
    val src = java.nio.file.Files.createTempDirectory("graft-dup")
    java.nio.file.Files.writeString(src.resolve("scores.csv"), "ursi,x\nS1,1\n")
    val dataDir = java.nio.file.Files.createTempDirectory("graft-dup-data").toString
    val keys = MergeKeys("ursi")

    val (v1, p1) = Ingest.ingestCsv(spark, s"$src/scores.csv", dataDir, keys)
    assert(v1.ok && p1.exists(_.endsWith("scores.csv")))

    val (dups, fresh) = Ingest.checkDuplicates(Seq("scores.csv", "other.csv"), dataDir)
    assert(dups.map(_.safeName) == Seq("scores.csv") && fresh == Seq(1))

    val (v2, p2) = Ingest.ingestCsv(spark, s"$src/scores.csv", dataDir, keys, Ingest.Cancel)
    assert(!v2.ok && p2.isEmpty && v2.errors.exists(_.contains("Duplicate file")))

    val (v3, p3) = Ingest.ingestCsv(spark, s"$src/scores.csv", dataDir, keys,
      Ingest.Rename("scores_v2.csv"))
    assert(v3.ok && p3.exists(_.endsWith("scores_v2.csv")))

    val (v4, p4) = Ingest.ingestCsv(spark, s"$src/scores.csv", dataDir, keys, Ingest.Replace)
    assert(v4.ok && p4.exists(_.endsWith("scores.csv")))

    // A rename whose TARGET already exists must be rejected, not silently
    // given Replace semantics (scores_v2.csv landed in the v3 step above).
    val (v5, p5) = Ingest.ingestCsv(spark, s"$src/scores.csv", dataDir, keys,
      Ingest.Rename("scores_v2.csv"))
    assert(!v5.ok && p5.isEmpty && v5.errors.exists(_.contains("scores_v2")))
  }

  test("profile HTML renders overview, column, correlation and quality tables") {
    val df = Seq(("S1", 1.0, 10.0), ("S2", 2.0, 20.0), ("S3", 3.0, 31.0),
        ("S3", 3.0, 31.0))
      .toDF("ursi", "x", "y")
    val p = Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"))
    val html = Sinks.renderProfileHtml(p, title = "t <&> t")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("t &lt;&amp;&gt; t")) // title escaped
    assert(html.contains("Rows: 4"))
    assert(html.contains("<td>x</td>") && html.contains("<td>y</td>"))
    assert(html.contains("Duplicate primary IDs: 1"))
    // per-column histogram bars render for numeric columns
    assert(html.contains("<h2>Distributions</h2>"))
    assert(html.contains("""<div class="hist"><h3>x</h3>"""))
    assert(html.contains("""class="bar""""))
    // x = {1,2,3,3}: the peak bin (two 3.0s) renders at full 60px height
    assert(html.contains("height:60px"))
    // sampled profile stays bounded and seeded-deterministic
    val sampled = Sinks.profile(df, MergeKeys("ursi"), Seq("x"), sampleN = Some(2))
    assert(sampled.rowCount <= 2)
    val again = Sinks.profile(df, MergeKeys("ursi"), Seq("x"), sampleN = Some(2))
    assert(again.rowCount == sampled.rowCount
      && again.columns.map(_.mean) == sampled.columns.map(_.mean))
  }

  test("profile sample fraction is clamped when n is just under the row count") {
    // n < total < 1.1*n: the 1.1 oversample factor would exceed 1.0 and
    // Spark's Sample node rejects fractions > 1 without replacement.
    val df = (1 to 21).map(i => (s"S$i", i.toDouble)).toDF("ursi", "x")
    val p = Sinks.profile(df, MergeKeys("ursi"), Seq("x"), sampleN = Some(20))
    assert(p.rowCount <= 20)
  }

  test("profile minimal mode skips correlations and quality, keeps column stats") {
    val df = Seq(("S1", 1.0, 10.0), ("S2", 2.0, 20.0), ("S3", 3.0, 31.0))
      .toDF("ursi", "x", "y")
    val p = Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"),
      mode = Sinks.ProfileMode.Minimal)
    assert(p.columns.map(_.column) == Seq("x", "y"))
    assert(p.correlations.isEmpty && p.quality.totalIssues == 0)
    val full = Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"),
      mode = Sinks.ProfileMode.Explorative)
    assert(full.correlations.nonEmpty)
    // Minimal must not merely return empty sections — it must not RUN the
    // correlation/quality jobs at all (the mode exists to skip that work).
    val minimalJobs = countJobs {
      Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"),
        mode = Sinks.ProfileMode.Minimal)
    }
    val fullJobs = countJobs {
      Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"),
        mode = Sinks.ProfileMode.Full)
    }
    assert(minimalJobs < fullJobs,
      s"Minimal ran $minimalJobs jobs, Full ran $fullJobs — skip not effective")
  }

  test("explorative profile computes interaction grids; Full does not") {
    // x = {0,1,2,3}, y = {0,10,20,30}: 12 bins, width 0.25 / 2.5 — each row
    // lands on the diagonal (bins 0,4,8,11); value==max clamps into bin 11.
    val df = Seq(("S1", 0.0, 0.0), ("S2", 1.0, 10.0), ("S3", 2.0, 20.0),
        ("S4", 3.0, 30.0))
      .toDF("ursi", "x", "y")
    val full = Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"))
    assert(full.interactions.isEmpty)
    val p = Sinks.profile(df, MergeKeys("ursi"), Seq("x", "y"),
      mode = Sinks.ProfileMode.Explorative)
    assert(p.interactions.map(i => (i.col1, i.col2)) == Seq(("x", "y")))
    val grid = p.interactions.head.grid
    assert(grid.size == 12 && grid.forall(_.size == 12))
    assert(grid.iterator.flatten.sum == 4)
    // x=0→bin 0, x=1→floor(1/0.25)=4, x=2→8, x=3→clamped 11; y identical.
    for (b <- Seq(0, 4, 8, 11)) assert(grid(b)(b) == 1L, s"diagonal bin $b")
    // JSON carries the sparse cells; HTML renders the heatmap pane.
    val json = Sinks.renderProfileJson(p)
    assert(json.contains(""""interactions":[{"col1":"x","col2":"y","n_bins":12"""))
    assert(json.contains("[0,0,1]") && json.contains("[11,11,1]"))
    val html = Sinks.renderProfileHtml(p)
    assert(html.contains("<h2>Interactions</h2>"))
    assert(html.contains("""<div class="inter"><h3>x &times; y</h3>"""))
    assert(html.contains("""title="x=11 y=11: 1""""))
    // full-opacity cell for the peak, zero for an empty cell
    assert(html.contains("opacity:1.000") && html.contains("opacity:0.000"))
  }

  test("profile categorical panes: top-k tables and the high-cardinality guard") {
    val df = (1 to 30).map(i =>
        (s"S$i", if (i <= 20) "a" else if (i <= 29) "b" else "c", s"id$i"))
      .toDF("ursi", "seg", "uid")
    val p = Sinks.profile(df, MergeKeys("ursi"), Seq.empty,
      categoricalCols = Seq("seg", "uid"))
    assert(p.categories.map(_.column) == Seq("seg", "uid"))
    val seg = p.categories.find(_.column == "seg").get
    assert(!seg.highCardinality)
    assert(seg.values == Seq(("a", 20L), ("b", 9L), ("c", 1L)))
    // uid has 30 distinct values; with the guard lowered it must suppress
    val (tables, high) = graft.stats.ColumnStats.categoricalFrequencies(
      df, Seq("seg", "uid"), maxDistinct = 10)
    assert(high == Set("uid") && tables.keySet == Set("seg"))
    val json = Sinks.renderProfileJson(p)
    assert(json.contains(""""column":"seg","high_cardinality":false"""))
    assert(json.contains(""""value":"a","n":20"""))
    val html = Sinks.renderProfileHtml(p)
    assert(html.contains("<h2>Categorical columns</h2>"))
    assert(html.contains("""<div class="cat"><h3>seg</h3>"""))
    // minimal mode skips the categorical pass entirely
    val min = Sinks.profile(df, MergeKeys("ursi"), Seq.empty,
      mode = Sinks.ProfileMode.Minimal, categoricalCols = Seq("seg"))
    assert(min.categories.isEmpty)
  }

  test("ingest rejects oversized claims and wrong extensions") {
    val src = java.nio.file.Files.createTempDirectory("graft-bad")
    java.nio.file.Files.writeString(src.resolve("data.txt"), "a,b\n1,2\n")
    val v = Ingest.validateFile(src.resolve("data.txt"))
    assert(!v.ok && v.errors.exists(_.contains("Not a .csv")))
    assert(Ingest.sanitizeColumnNames(Seq("a", "a", "A")) == Seq("a", "a_1", "A_2"))
  }

  test("EngineConfig.fromToml loads the reference config.toml shape") {
    // exact shape of the reference's own config.toml (core/config.py:154–177)
    val toml = """
      |[data]
      |data_dir = "data"
      |demographics_file = "demographics.csv"
      |primary_id_column = "ursi"
      |session_column = "session_num"
      |composite_id_column = "customID"
      |age_column = "age"
      |sex_column = "sex"
      |study_site_column = "all_sites"
      |
      |[ui]
      |default_age_min = 18
      |default_age_max = 80
      |max_display_rows = 50
      |
      |[state]
      |backend = "client"
      |ttl_default = 3600
      |enable_user_isolation = true
      |""".stripMargin
    val cfg = graft.core.EngineConfig.fromToml(toml)
    assert(cfg.dataDir == "data")
    assert(cfg.demographicsTable == "demographics") // file stem
    assert(cfg.primaryIdColumn == "ursi")
    assert(cfg.sessionColumn == "session_num")
    assert(cfg.compositeIdColumn == "customID")
    assert(cfg.ageColumn == "age" && cfg.sexColumn == "sex")
    assert(cfg.studySiteColumn.contains("all_sites"))
    assert(cfg.validate.isEmpty)

    // absent keys keep defaults; missing [data] section keeps all defaults
    val sparse = graft.core.EngineConfig.fromToml("[data]\ndata_dir = \"/x\"\n")
    assert(sparse.dataDir == "/x" && sparse.primaryIdColumn == "ursi"
      && sparse.studySiteColumn.isEmpty)
    val empty = graft.core.EngineConfig.fromToml("")
    assert(empty.dataDir == "data" && empty.demographicsTable == "demographics")
    assert(graft.core.EngineConfig(dataDir = "").validate.nonEmpty)
  }

  private implicit class IterConv[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = {
      new Iterator[A] {
        def hasNext = it.hasNext
        def next() = it.next()
      }
    }
  }
}
