package graft

import java.nio.file.Files

import graft.catalog.{BucketedLayout, TableCatalog}
import graft.core.EngineConfig
import graft.core.Filter._
import graft.query.CohortQuery

/** Plan + parity pins for the bucketed-layout cohort path (round-8 verdict
  * item 2): a [[BucketedLayout]]-backed catalog must (a) plan the hub star
  * join with ZERO shuffle exchange and ZERO per-side sort — the layout's
  * whole point at 100 TB — and (b) return results identical to the plain
  * CSV catalog.
  */
class LayoutCohortSpec extends SparkSpec {

  private def starDir(): String = fixtureDir(
    "demographics.csv" ->
      """ursi,age,sex,height
        |S001,25,1.0,165.5
        |S002,31,2.0,180.1
        |S003,44,1.0,158.9
        |S004,19,2.0,175.0
        |S005,67,1.0,162.2
        |S006,52,2.0,171.3""",
    "cognitive.csv" ->
      """ursi,working_memory,processing_speed
        |S001,105,45
        |S002,98,52
        |S003,112,39
        |S005,101,47
        |S005,99,44""",
    "labs.csv" ->
      """ursi,glucose
        |S001,5.2
        |S002,6.1
        |S004,4.9""")

  private def catalogs(): (TableCatalog, TableCatalog) = {
    val dir = starDir()
    val wh = Files.createTempDirectory("graft-layout-wh-").toString
    val plain = new TableCatalog(spark, EngineConfig(dir))
    val bucketed = plain.withLayout(BucketedLayout(wh, 4, "layspec"))
    (plain, bucketed)
  }

  private def withNoBroadcast[A](f: => A): A = {
    // the layout serves the big-big regime; disable broadcast so the spec
    // pins the SortMergeJoin plan the layout exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("layout-backed basePlan: star join has zero shuffle exchange") {
    val (_, bucketed) = catalogs()
    withNoBroadcast {
      val q = CohortQuery(bucketed,
        filters = Seq(NumericRange("cognitive", "working_memory", 90, 120)),
        selectedTables = Seq("cognitive", "labs"))
      val df = q.basePlan
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ regime:\n$plan")
      // both behavioral joins ride the bucketed layout: no hash exchange on
      // ANY side — the network cost the layout exists to eliminate
      assert(!plan.contains("Exchange"),
        s"layout-backed star join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan should be bucket-aware:\n$plan")
    }
  }

  test("with legacy bucketed-scan ordering, the per-side Sort disappears too") {
    // Spark ≥3.0 ignores the writer's sortBy order by default (reading it
    // requires listing files at planning time); the layout still pays zero
    // exchange, and opting into the legacy conf removes the per-bucket Sort
    // as well. Pinned so the trade-off stays documented-and-true.
    val (_, bucketed) = catalogs()
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try withNoBroadcast {
      val df = CohortQuery(bucketed,
        filters = Seq(NumericRange("cognitive", "working_memory", 90, 120)),
        selectedTables = Seq("cognitive", "labs")).basePlan
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ regime:\n$plan")
      assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"one file per bucket + sortBy order should satisfy SMJ without a Sort:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("layout-backed count(): distinct aggregates in-bucket, one final gather") {
    // Layout's scaladoc claims COUNT(DISTINCT key) partially aggregates
    // within buckets. Pin it: the only Exchange in the whole plan is the
    // final SinglePartition gather of per-bucket partials — the join AND
    // the distinct phase both ride the bucket partitioning.
    val (_, bucketed) = catalogs()
    withNoBroadcast {
      val df = CohortQuery(bucketed,
        filters = Seq(NumericRange("cognitive", "working_memory", 90, 120)),
        selectedTables = Seq("cognitive"))
        .basePlan.agg(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("ursi")))
      df.collect()
      // AQE's toString appends an "== Initial Plan ==" section; count
      // exchanges only in the executed final plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly the final gather exchange, got $exchanges:\n$plan")
      assert(plan.contains("Exchange SinglePartition"),
        s"the one exchange should be the final gather:\n$plan")
      assert(plan.contains("partial_count(distinct"),
        s"distinct phase should partial-aggregate in-bucket:\n$plan")
    }
  }

  test("unbucketed control: the same plan pays exchanges") {
    val (plain, _) = catalogs()
    withNoBroadcast {
      val df = CohortQuery(plain,
        filters = Seq(NumericRange("cognitive", "working_memory", 90, 120)),
        selectedTables = Seq("cognitive", "labs")).basePlan
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"control should shuffle — if not, the layout spec proves nothing:\n$plan")
    }
  }

  test("layout-backed cohort results are identical to the plain catalog") {
    val (plain, bucketed) = catalogs()
    def run(cat: TableCatalog): (Long, Seq[String]) = {
      val q = CohortQuery(cat,
        filters = Seq(
          AgeRange(18, 60),
          NumericRange("cognitive", "working_memory", 90, 120)),
        selections = Seq(("cognitive", "working_memory"), ("labs", "glucose")))
      val rows = q.data.collect().map(_.mkString("|")).sorted.toSeq
      (q.count(), rows)
    }
    val (nPlain, rowsPlain) = run(plain)
    val (nBucketed, rowsBucketed) = run(bucketed)
    assert(nPlain == nBucketed, s"count drift: $nPlain vs $nBucketed")
    assert(rowsPlain == rowsBucketed,
      s"row drift:\nplain=$rowsPlain\nbucketed=$rowsBucketed")
    assert(nPlain > 0 && rowsPlain.nonEmpty)
  }

  test("layout maintenance is per-table: changing one file re-buckets only it") {
    val dir = fixtureDir(
      "demographics.csv" -> "ursi,age\nS001,25\nS002,31",
      "labs.csv" -> "ursi,glucose\nS001,5.2\nS002,6.1")
    val wh = Files.createTempDirectory("graft-layout-wh-").toString
    val prefix = s"laymnt${System.nanoTime()}"
    val cat = new TableCatalog(spark, EngineConfig(dir),
      Some(BucketedLayout(wh, 2, prefix)))
    cat.table("demographics").count() // materialize both layouts
    cat.table("labs").count()
    def bucketedTables: Seq[String] = spark.catalog.listTables()
      .collect().map(_.name).filter(_.startsWith(prefix)).toSeq.sorted
    val before = bucketedTables
    assert(before.count(_.contains("demographics")) == 1 && before.count(_.contains("labs")) == 1)

    // regenerate ONLY labs (new content AND size; bump mtime explicitly in
    // case the fs clock is coarse)
    val labsPath = java.nio.file.Paths.get(dir, "labs.csv")
    java.nio.file.Files.writeString(labsPath,
      "ursi,glucose\nS001,7.7\nS002,8.8\nS003,9.9\n")
    java.nio.file.Files.setLastModifiedTime(labsPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))

    assert(cat.table("labs").count() == 3, "regenerated labs must be re-read")
    cat.table("demographics").count()
    val after = bucketedTables
    assert(after.count(_.contains("labs")) == 2,
      s"labs should have a NEW bucketed version: $after")
    assert(after.count(_.contains("demographics")) == 1,
      s"unchanged demographics must keep its existing buckets: $after")
  }

  test("tables without the merge column are served raw under a layout") {
    val dir = fixtureDir(
      "demographics.csv" -> "ursi,age\nS001,25\nS002,31",
      "lookup.csv" -> "code,label\n1,one\n2,two")
    val wh = Files.createTempDirectory("graft-layout-wh-").toString
    val cat = new TableCatalog(spark, EngineConfig(dir),
      Some(BucketedLayout(wh, 4, "layraw")))
    assert(cat.table("lookup").count() == 2)
    assert(cat.table("demographics").count() == 2)
  }
}
