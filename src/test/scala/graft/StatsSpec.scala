package graft

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.commons.math3.random.Well19937c

import graft.core.MergeKeys
import graft.stats._
import org.apache.spark.sql.functions.{col, lit, to_timestamp}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def normalSample(n: Int, seed: Int = 7): Array[Double] = {
    val d = new NormalDistribution(new Well19937c(seed), 0.0, 1.0)
    Array.fill(n)(d.sample())
  }

  test("Shapiro-Wilk accepts normal, rejects exponential-ish data") {
    val normal = normalSample(200).sorted
    val swN = Normality.shapiroWilk(normal)
    assert(swN.statistic > 0.97 && swN.pValue.get > 0.05, s"normal: $swN")

    val skewed = normal.map(x => math.exp(x)).sorted // lognormal
    val swS = Normality.shapiroWilk(skewed)
    assert(swS.statistic < 0.9 && swS.pValue.get < 0.01, s"skewed: $swS")
  }

  test("Shapiro-Wilk W is scale/location invariant") {
    val x = normalSample(50).sorted
    val y = x.map(v => v * 37.5 + 1000.0)
    val a = Normality.shapiroWilk(x).statistic
    val b = Normality.shapiroWilk(y).statistic
    assert(math.abs(a - b) < 1e-10)
  }

  test("Anderson-Darling accepts normal, rejects uniform tails") {
    val normal = normalSample(500, seed = 11).sorted
    val adN = Normality.andersonDarling(normal)
    assert(adN.isNormal, s"normal should pass: $adN")

    val uniform = Array.tabulate(500)(i => i / 499.0).sorted
    val adU = Normality.andersonDarling(uniform)
    assert(!adU.isNormal, s"uniform should fail: $adU")
  }

  test("correlation edge cases: zero variance -> NaN (pandas parity), short pairs -> None") {
    import graft.stats.Correlation
    // constant column: r is undefined; pandas .corr() reports NaN, so we
    // must surface NaN (a silent 0.0 or a crash would both be wrong)
    val const = Seq.tabulate(20)(i => (5.0, i.toDouble)).toDF("x", "y")
    val cp = Correlation.pearson(const, Seq("x", "y")).head
    assert(cp.n == 20 && cp.r.exists(_.isNaN), s"constant pearson: $cp")
    val cs = Correlation.spearmanPair(const, "x", "y")
    assert(cs.r.forall(_.isNaN), s"constant spearman: $cs")
    // fewer than minPeriods complete rows: None, not a number
    val short = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    assert(Correlation.pearson(short, Seq("x", "y")).head.r.isEmpty)
    assert(Correlation.spearmanPair(short, "x", "y").r.isEmpty)
    // exact linear relation: r == 1 to double precision
    val lin = Seq.tabulate(50)(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val lp = Correlation.pearson(lin, Seq("x", "y")).head
    assert(lp.r.exists(r => math.abs(r - 1.0) < 1e-12), s"linear pearson: $lp")
    // kendall on a constant: tau-b denominator is 0 -> NaN, not a crash
    val ck = Correlation.kendallPairExact(const, "x", "y")
    assert(ck.r.forall(_.isNaN), s"constant kendall: $ck")
    // describe on a constant column must not throw either (skew/kurt of
    // zero variance) and must report the degenerate shape faithfully
    val cs2 = graft.stats.ColumnStats.describe(const, Seq("x")).head
    assert(cs2.n == 20 && cs2.distinct == 1)
    assert(cs2.std.contains(0.0) && cs2.min == cs2.max)
    assert(cs2.skew.forall(v => v.isNaN || v == 0.0), s"skew: ${cs2.skew}")
  }

  test("Kendall tau on a hand-computed example") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 5.0), (5.0, 4.0))
      .toDF("x", "y")
    val p = Correlation.kendallPair(df, "x", "y")
    // 10 pairs: 9 concordant, 1 discordant -> tau = 0.8
    assert(math.abs(p.r.get - 0.8) < 1e-12)
    val e = Correlation.kendallPairExact(df, "x", "y")
    assert(math.abs(e.r.get - 0.8) < 1e-12)
  }

  test("exact Kendall (contingency+Fenwick) matches the O(n^2) impl under heavy ties") {
    // Seeded data with ties in x, y, and jointly — every tie-correction term
    // (n1, n2) must agree with the quadratic concordance count. maxN above n
    // makes kendallPair the full unsampled O(n^2) reference.
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(800) { _ =>
      val x = rnd.nextInt(12).toDouble
      val y = (x + rnd.nextInt(8) - rnd.nextInt(8)).toDouble
      (x, y)
    }
    val df = rows.toDF("x", "y")
    val brute = Correlation.kendallPair(df, "x", "y", maxN = 10000)
    val exact = Correlation.kendallPairExact(df, "x", "y")
    assert(exact.n == brute.n)
    assert(math.abs(exact.r.get - brute.r.get) < 1e-12,
      s"exact ${exact.r} vs brute ${brute.r}")
    // Anti-correlated shape exercises the discordant side dominating.
    val df2 = rows.map { case (x, y) => (x, -y) }.toDF("x", "y")
    val b2 = Correlation.kendallPair(df2, "x", "y", maxN = 10000)
    val e2 = Correlation.kendallPairExact(df2, "x", "y")
    assert(math.abs(e2.r.get - b2.r.get) < 1e-12)
    // The cell cap refuses near-unique pairs instead of OOMing the driver.
    intercept[IllegalArgumentException] {
      Correlation.kendallPairExact(df, "x", "y", maxCells = 10)
    }
  }

  test("kendall() auto-routes: exact when the contingency table fits, sampled past the cap") {
    // Bounded-domain pair (12x~27 cells, n=800): the probe routes it to the
    // exact path, so the matrix answer equals kendallPairExact bit-for-bit
    // even though n is far beyond the sampled path's default 5000 cap logic.
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(800) { _ =>
      val x = rnd.nextInt(12).toDouble
      val y = (x + rnd.nextInt(8) - rnd.nextInt(8)).toDouble
      (x, y)
    }
    val df = rows.toDF("x", "y")
    val auto = Correlation.kendall(df, Seq("x", "y")).head
    val exact = Correlation.kendallPairExact(df, "x", "y")
    assert(auto.r.get == exact.r.get, s"auto ${auto.r} != exact ${exact.r}")

    // Near-unique pair under a tiny cap: the probe (~800 estimated cells
    // > maxCells/2 = 25) must route to the sampled path, whose seeded
    // result differs from none — it equals kendallPair's.
    val unique = Seq.tabulate(800)(i => (i.toDouble, (i * 37 % 800).toDouble))
      .toDF("x", "y")
    val routed = Correlation.kendall(unique, Seq("x", "y"), maxCells = 50).head
    val sampled = Correlation.kendallPair(unique, "x", "y")
    assert(routed.r.get == sampled.r.get, s"routed ${routed.r} != sampled ${sampled.r}")
    // Forced modes still honored.
    val forcedExact = Correlation.kendall(unique, Seq("x", "y"), exact = Some(true)).head
    assert(forcedExact.r.get == Correlation.kendallPairExact(unique, "x", "y").r.get)
  }

  test("spearman matrix ranks all-complete columns exactly once each") {
    // 4 complete columns -> the aligned fast path ranks each column ONCE
    // (4 passes) and correlates ranks in a single aggregate; the naive
    // per-pair shape would pay 6 pairs x 2 ranks = 12 passes. A null in one
    // column demotes only ITS pairs to the exact pairwise re-rank.
    val rnd = new scala.util.Random(3)
    val complete = Seq.tabulate(200)(i =>
      (i.toDouble, rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble()))
      .toDF("a", "b", "c", "d")
    val before = Correlation.rankPasses.get()
    val ps = Correlation.spearman(complete, Seq("a", "b", "c", "d"))
    assert(ps.size == 6 && ps.forall(_.r.isDefined))
    assert(Correlation.rankPasses.get() - before == 4L,
      s"expected 4 rank passes, got ${Correlation.rankPasses.get() - before}")

    import org.apache.spark.sql.functions.{col, lit, when}
    val withNull = complete.withColumn("d",
      when(col("a") < 1.0, lit(null)).otherwise(col("d")))
    val before2 = Correlation.rankPasses.get()
    val ps2 = Correlation.spearman(withNull, Seq("a", "b", "c", "d"))
    assert(ps2.size == 6)
    // 3 complete columns ranked once (3) + 3 pairs touching d re-ranked
    // pairwise (3 x 2) = 9.
    assert(Correlation.rankPasses.get() - before2 == 9L,
      s"expected 9 rank passes, got ${Correlation.rankPasses.get() - before2}")
  }

  test("OLS recovers a perfect line with p ~ 0") {
    val df = (1 to 50).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val r = Regression.ols(df, "x", "y").get
    assert(math.abs(r.slope - 3.0) < 1e-9)
    assert(math.abs(r.intercept - 7.0) < 1e-7)
    assert(math.abs(r.r2 - 1.0) < 1e-12)
    assert(r.pValue < 1e-10)
    val ((x0, y0), (x1, y1)) = r.trendline
    assert(x0 == 1.0 && math.abs(y0 - 10.0) < 1e-7 && x1 == 50.0 && math.abs(y1 - 157.0) < 1e-7)
  }

  test("OLS p-value is large for pure noise") {
    val noise = normalSample(400, seed = 23)
    val df = noise.grouped(2).collect { case Array(a, b) => (a, b) }.toSeq.toDF("x", "y")
    val r = Regression.ols(df, "x", "y").get
    assert(r.pValue > 0.01, s"noise p=${r.pValue} r=${r.r}")
  }

  test("ANOVA detects separated groups; p from F distribution") {
    val rows = Seq.tabulate(90) { i =>
      val g = i % 3
      (s"g$g", g * 10.0 + normalSample(1, seed = 100 + i)(0))
    }
    val df = rows.toDF("grp", "y")
    val a = Anova.oneWay(df, "grp", "y").get
    assert(a.fStat > 100 && a.pValue < 1e-10)
    assert(a.dfBetween == 2 && a.dfWithin == 87)
    assert(a.etaSquared > 0.8)
    val ts = Anova.pairwiseTTests(df, "grp", "y")
    assert(ts.size == 3 && ts.forall(_.pBonferroni < 0.001))
  }

  test("KDE curve integrates to ~1 and peaks near the mode") {
    val data = normalSample(1000, seed = 5).toSeq.toDF("v")
    val c = KDE.curve(data, "v").get
    assert(c.x.length == 300)
    val dx = c.x(1) - c.x(0)
    val integral = c.density.sum * dx
    assert(math.abs(integral - 1.0) < 0.05, s"integral=$integral")
    val peakX = c.x(c.density.indexOf(c.density.max))
    assert(math.abs(peakX) < 0.5)
  }

  test("DataQuality flags missing, duplicate IDs, and mixed types") {
    val df = Seq(
      ("S1", Some(1.0), "12.5"),
      ("S1", Some(2.0), "oops"),
      ("S2", None, "13"),
      ("S3", Some(4.0), "14")
    ).toDF("ursi", "x", "stringy")
    val r = DataQuality.report(df, MergeKeys("ursi"))
    assert(r.missing.exists(m => m.column == "x" && m.missingCount == 1))
    assert(r.primaryIdDuplicates == 1)
    assert(r.mixedTypes.exists(m => m.column == "stringy" && m.failedConversions == 1))
  }

  test("column stats: pandas-parity moments on a known sample") {
    // Same sample as the DuckDB cross-check in the build log: pandas
    // skew=1.1125587, kurt=1.4169356 (bias-corrected).
    val df = Seq(1.0, 2.5, 3.7, 4.2, 8.9, 2.2, 5.5).toDF("x")
    val s = ColumnStats.describe(df, Seq("x")).head
    assert(math.abs(s.skew.get - 1.1125587136788) < 1e-9)
    assert(math.abs(s.kurt.get - 1.4169356352036) < 1e-9)
    assert(math.abs(s.median.get - 3.7) < 1e-12)
    assert(math.abs(s.q25.get - 2.35) < 1e-12)
    assert(math.abs(s.q75.get - 4.85) < 1e-12)
  }

  test("column stats: distinct counts native values beyond double precision") {
    // 2^53 = 9007199254740992: consecutive longs above it collapse to the
    // same double, so a double-keyed histogram undercounts distinct. The
    // native-keyed histogram must match countDistinct.
    val base = 9007199254740992L
    val vals = (0L until 6L).map(base + _) ++ Seq(base, base + 3L) // 6 distinct, 8 rows
    val df = vals.toDF("big")
    val s = ColumnStats.describe(df, Seq("big")).head
    import org.apache.spark.sql.functions.{col, countDistinct}
    val expected = df.select(countDistinct(col("big"))).head().getLong(0)
    assert(expected == 6L)
    assert(s.distinct == expected, s"native distinct ${s.distinct} != $expected")
    assert(s.n == 8L)
  }

  test("column stats: 0.0 and -0.0 are ONE distinct value on float columns") {
    // The native string key that preserves >2^53 long identity must NOT
    // apply to floating-point columns: "0.0" and "-0.0" render differently
    // but are the same value (pandas nunique gives 1). Float/double columns
    // key the histogram on the normalized double alone.
    val df = Seq(0.0d, -0.0d, 1.5d, 0.0d).toDF("x")
    val s = ColumnStats.describe(df, Seq("x")).head
    assert(s.distinct == 2L, s"expected {0.0, 1.5} = 2 distinct, got ${s.distinct}")
    assert(s.n == 4L)
    val f = Seq(0.0f, -0.0f, 2.5f).toDF("y")
    val sf = ColumnStats.describe(f, Seq("y")).head
    assert(sf.distinct == 2L, s"float column gave ${sf.distinct}")
  }

  test("distribution analysis composes moments + normality") {
    val df = normalSample(300, seed = 9).toSeq.toDF("v")
    val a = Distribution.analyze(df, "v").get
    assert(a.n == 300 && a.shapiroWilk.get.pValue.get > 0.01)
    assert(a.andersonDarling.get.isNormal)
    assert(math.abs(a.skew.get) < 0.4) // population skew of normal sample
  }

  test("filter funnel: correct counts, and the plan has no Expand") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("S1", 25, 1), ("S1", 26, 2), ("S2", 31, 1), ("S2", 32, 2),
      ("S3", 44, 1), ("S4", 19, 1), (null.asInstanceOf[String], 99, 1))
      .toDF("ursi", "age", "session")
    val steps = Seq(
      "adults" -> (col("age") >= 20),
      "session1" -> (col("session") === 1))
    val funnel = graft.stats.FilterFunnel.funnel(df, "ursi", steps)
    // baseline 4 distinct non-null ursi; adults drops S4; session1 keeps S2,S3...
    assert(funnel.map(f => (f.label, f.n)) ==
      Seq(("baseline", 4L), ("adults", 3L), ("session1", 3L)))
    val impact = graft.stats.FilterFunnel.impact(df, "ursi", steps)
    assert(impact.map(f => (f.label, f.n)) ==
      Seq(("baseline", 4L), ("adults", 3L), ("session1", 4L), ("all_filters", 3L)))

    // Plan shape: the multi-condition distinct count must NOT use Expand
    // (K+1 countDistinct would multiply the scan x(K+1) at 100 TB).
    val flags = steps.scanLeft(org.apache.spark.sql.functions.lit(true))(
      (acc, s) => acc && s._2).zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.when(c, 1L).otherwise(0L)).as(s"m__$i") }
    val perKey = df.filter(col("ursi").isNotNull)
      .groupBy(col("ursi")).agg(flags.head, flags.tail: _*)
    val physical = perKey.queryExecution.executedPlan.toString
    assert(!physical.contains("Expand"), s"funnel plan contains Expand:\n$physical")
  }

  test("site values parse braces, commas, semicolons, spaces") {
    val df = Seq("{Discovery, Longitudinal_Adult}", "A;B", "C D", " ", "A")
      .toDF("all_studies")
    val v = SiteValues.distinctValues(df, "all_studies")
    assert(v == Seq("A", "B", "C", "D", "Discovery", "Longitudinal_Adult"))
    assert(SiteValues.detectSiteColumn(Seq("ursi", "all_studies"), None).contains("all_studies"))
    assert(SiteValues.isRocklandLike(Seq("all_studies")))
  }

  test("incremental stats: merged partition sketches == one-pass whole-table stats") {
    import org.apache.spark.sql.functions.{col, countDistinct, lit}
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")

    val whole = IncrementalStats.merge(
      IncrementalStats.sketch(li, cols, lit("all")))
      .orderBy("col_name").collect()
    // 7-way partition by returnflag+linestatus, sketched in TWO separate
    // calls appended together — the incremental-ingest shape: new data is
    // sketched alone, its rows land next to the old sketch rows, merge
    // reads both.
    val oldPart = IncrementalStats.sketch(
      li.filter(col("l_linenumber") <= 2), cols,
      org.apache.spark.sql.functions.concat_ws("|", col("l_returnflag"), col("l_linestatus")))
    val newPart = IncrementalStats.sketch(
      li.filter(col("l_linenumber") > 2), cols,
      org.apache.spark.sql.functions.concat_ws("|", col("l_returnflag"), col("l_linestatus")))
    val merged = IncrementalStats.merge(oldPart.unionByName(newPart))
      .orderBy("col_name").collect()

    assert(whole.length == cols.size && merged.length == cols.size)
    whole.zip(merged).foreach { case (w, m) =>
      assert(w.getAs[String]("col_name") == m.getAs[String]("col_name"))
      // additive/semilattice legs are exact regardless of partitioning
      assert(w.getAs[Long]("n") == m.getAs[Long]("n"))
      assert(w.getAs[Long]("n_value") == m.getAs[Long]("n_value"))
      assert(w.getAs[java.math.BigDecimal]("sum_v").compareTo(
        m.getAs[java.math.BigDecimal]("sum_v")) == 0)
      assert(w.getAs[java.math.BigDecimal]("sum_sq").compareTo(
        m.getAs[java.math.BigDecimal]("sum_sq")) == 0)
      assert(w.getAs[Double]("min_v") == m.getAs[Double]("min_v"))
      assert(w.getAs[Double]("max_v") == m.getAs[Double]("max_v"))
      // doubles derived from exact sums: bit-deterministic
      assert(w.getAs[Double]("mean_v") == m.getAs[Double]("mean_v"))
      assert(w.getAs[Double]("var_pop") == m.getAs[Double]("var_pop"))
      // HLL union carries full sketch fidelity, but the union gadget stores
      // HLL_8 registers while a direct sketch uses HLL_4+aux — estimates
      // agree to well within the sketch's own rse, not bit-for-bit
      val we = w.getAs[Long]("distinct_est").toDouble
      val me = m.getAs[Long]("distinct_est").toDouble
      assert(math.abs(we - me) <= math.max(1.0, 0.01 * we),
        s"${w.getAs[String]("col_name")}: union estimate drifted: $me vs $we")
    }

    // and the HLL estimate is actually accurate (lgK=12 -> ~0.8% rse; 5x slack)
    val exact = li.select(cols.map(c => countDistinct(col(c)).as(c)): _*).head()
    val est = merged.map(r => r.getAs[String]("col_name") -> r.getAs[Long]("distinct_est").toDouble).toMap
    cols.foreach { c =>
      val e = exact.getAs[Long](c).toDouble
      assert(math.abs(est(c) - e) <= math.max(1.0, 0.04 * e),
        s"$c: hll ${est(c)} vs exact $e")
    }
  }

  test("stats store: append-only log, fold-compaction, append-after-compact") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.catalog.StatsStore
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-store")
      .resolve("log").toString

    // three ingest batches, each sketched alone — history never rescanned
    (0 to 2).foreach { b =>
      StatsStore.append(dir, li.filter(col("l_orderkey") % 3 === b), cols, s"b$b")
    }
    assert(StatsStore.partIds(spark, dir) == Seq("b0", "b1", "b2"))

    def statsMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_value"),
          r.getAs[java.math.BigDecimal]("sum_v").doubleValue(),
          r.getAs[Double]("min_v"), r.getAs[Double]("max_v"),
          r.getAs[Double]("mean_v"), r.getAs[Double]("var_pop"),
          r.getAs[Long]("distinct_est"))).toMap

    val fromStore = statsMap(StatsStore.read(spark, dir).collect())
    val whole = statsMap(IncrementalStats.merge(
      IncrementalStats.sketch(li, cols, lit("all"))).collect())
    cols.foreach { c =>
      val (s, w) = (fromStore(c), whole(c))
      assert(s._1 == w._1 && s._2 == w._2 && s._3 == w._3
        && s._4 == w._4 && s._5 == w._5 && s._6 == w._6 && s._7 == w._7,
        s"$c: store $s vs whole $w")
      assert(math.abs(s._8 - w._8) <= math.max(1.0, 0.01 * w._8))
    }

    // compaction folds the log to one row per column, losing nothing
    StatsStore.compact(spark, dir)
    assert(StatsStore.partIds(spark, dir) == Seq("__folded__"))
    assert(StatsStore.sketches(spark, dir).count() == cols.size)
    val afterCompact = statsMap(StatsStore.read(spark, dir).collect())
    cols.foreach { c =>
      assert(afterCompact(c) == fromStore(c), s"$c changed across compaction")
    }

    // a compacted store keeps accepting appends (fold preserved the HLL)
    val extra = li.limit(100)
    val extraN = extra.count()
    StatsStore.append(dir, extra, cols, "b3")
    val afterAppend = statsMap(StatsStore.read(spark, dir).collect())
    cols.foreach { c =>
      assert(afterAppend(c)._1 == fromStore(c)._1 + extraN)
    }

    // the quantile sub-log shares the store and the lifecycle: batch-wise
    // appends, merged estimate within the sketch's error of exact, and
    // moments compaction must not disturb it
    (0 to 2).foreach { b =>
      StatsStore.appendQuantiles(dir, li.filter(col("l_orderkey") % 3 === b),
        cols, s"b$b")
    }
    StatsStore.compact(spark, dir)
    val med = StatsStore.readQuantiles(spark, dir, "l_quantity", Seq(0.5))(0.5)
    val exactMed = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0).head
    assert(math.abs(med - exactMed) <= 0.021 * math.max(math.abs(exactMed), 1.0),
      s"store median $med vs exact $exactMed")
  }

  test("incremental stats are exact for 6-fractional-digit values (score columns)") {
    import org.apache.spark.sql.functions.{col, lit}
    // quality-score-shaped data: 6 decimals in (0,1) — the shape
    // PipelineDemo sketches; a coarser square cast would bias var_pop
    val vals = (1 to 1000).map(i => math.rint(i / 1000.0 * 1e6) / 1e6)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("q")
    val whole = IncrementalStats.merge(
      IncrementalStats.sketch(df, Seq("q"), lit("all"))).head()
    val parts = IncrementalStats.merge(
      IncrementalStats.sketch(df.filter(col("q") <= 0.5), Seq("q"), lit("lo"))
        .unionByName(IncrementalStats.sketch(
          df.filter(col("q") > 0.5), Seq("q"), lit("hi")))).head()
    assert(whole.getAs[java.math.BigDecimal]("sum_sq")
      .compareTo(parts.getAs[java.math.BigDecimal]("sum_sq")) == 0)
    // against independently computed exact moments
    val exactMean = vals.sum / vals.size
    val exactVar = vals.map(v => v * v).sum / vals.size - exactMean * exactMean
    assert(math.abs(whole.getAs[Double]("mean_v") - exactMean) < 1e-12)
    assert(math.abs(whole.getAs[Double]("var_pop") - exactVar) < 1e-9,
      s"var ${whole.getAs[Double]("var_pop")} vs $exactVar")
  }

  test("quantile sketch: merge == whole; relative-error bound; full domain") {
    import org.apache.spark.sql.functions.{col, lit}
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_extendedprice", "l_discount")

    val whole = QuantileSketch.merge(
      QuantileSketch.sketch(li, cols, lit("all")))
    val parts = QuantileSketch.merge(
      QuantileSketch.sketch(li.filter(col("l_linenumber") <= 2), cols,
          col("l_returnflag"))
        .unionByName(QuantileSketch.sketch(
          li.filter(col("l_linenumber") > 2), cols, col("l_returnflag"))))
    // bucket counts are additive -> identical tables regardless of split
    assert(whole.exceptAll(parts).count() == 0 &&
      parts.exceptAll(whole).count() == 0)

    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    cols.foreach { c =>
      val est = QuantileSketch.quantiles(whole, c, qs)
      val exact = li.stat.approxQuantile(c, qs.toArray, 0.0)
      qs.zip(exact).foreach { case (q, ex) =>
        val rel = math.abs(est(q) - ex) / math.max(math.abs(ex), 1e-12)
        assert(rel <= 0.021, s"$c q=$q: est ${est(q)} vs exact $ex (rel $rel)")
      }
    }

    // negatives and zeros: median of a symmetric set is the zero bucket
    val sym = spark.createDataFrame(
      Seq(-1000.0, -10.0, -0.5, 0.0, 0.0, 0.5, 10.0, 1000.0).map(Tuple1(_)))
      .toDF("v")
    val symSketch = QuantileSketch.merge(
      QuantileSketch.sketch(sym, Seq("v"), lit("p")))
    val symQ = QuantileSketch.quantiles(symSketch, "v", Seq(0.0, 0.5, 1.0))
    assert(symQ(0.5) == 0.0, s"median of symmetric set: ${symQ(0.5)}")
    assert(math.abs(symQ(0.0) + 1000.0) <= 10.5, s"min-ish: ${symQ(0.0)}")
    assert(math.abs(symQ(1.0) - 1000.0) <= 10.5, s"max-ish: ${symQ(1.0)}")
  }

  test("logistic IRLS matches an independent NumPy reference fit") {
    import graft.stats.Logistic
    // Reference computed offline with NumPy IRLS (lambda 0.1 on features,
    // intercept unpenalized, 7 iterations to max|step| < 1e-12):
    //   weights = [3.64511354, -2.67335211], intercept = -0.77415222,
    //   deviance = 2.81911834
    val rows = Seq(
      (0.2, 1.0, 0.0), (0.4, 0.8, 0.0), (0.6, 1.2, 0.0), (0.8, 0.4, 1.0),
      (1.0, 1.5, 0.0), (1.2, 0.2, 1.0), (1.4, 1.1, 1.0), (1.6, 0.6, 1.0),
      (1.8, 1.3, 1.0), (2.0, 0.9, 1.0))
    val df = rows.toDF("x1", "x2", "y")
    val fit = Logistic.fit(df,
      Seq("x1" -> col("x1"), "x2" -> col("x2")), col("y"),
      lambda = 0.1, maxIter = 50, tol = 1e-10).get
    assert(fit.converged && fit.n == 10)
    assert(math.abs(fit.weights(0) - 3.64511354) < 1e-5, fit.weights(0).toString)
    assert(math.abs(fit.weights(1) + 2.67335211) < 1e-5, fit.weights(1).toString)
    assert(math.abs(fit.intercept + 0.77415222) < 1e-5, fit.intercept.toString)
    assert(math.abs(fit.deviance - 2.81911834) < 1e-4, fit.deviance.toString)
    // scoring expression reproduces the fitted probabilities
    val scores = df.select(col("y"),
        fit.score(Seq(col("x1"), col("x2"))).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    scores.foreach { case (y, p) => assert(p > 0 && p < 1) }
    val aucPairs = for {
      (1.0, p1) <- scores; (0.0, p0) <- scores
    } yield if (p1 > p0) 1.0 else if (p1 == p0) 0.5 else 0.0
    assert(aucPairs.sum / aucPairs.length > 0.85, "fit must rank pos over neg")
  }

  test("logistic distributed IRLS == fitLocal to 1e-9 (array moment pass)") {
    import graft.stats.Logistic
    // deterministic multi-feature fixture, large enough that the
    // distributed path actually spans partitions
    val rows = (0 until 2000).map { i =>
      val x1 = (i % 17) / 17.0
      val x2 = (i % 29) / 29.0 - 0.5
      val x3 = ((i * 7) % 13) / 13.0
      val z = 2.0 * x1 - 3.0 * x2 + 0.5 * x3 - 0.4
      // deterministic "noisy" label: threshold against a hash-ish phase
      val y = if (z + 0.3 * math.sin(i * 2.39996) > 0) 1.0 else 0.0
      (x1, x2, x3, y)
    }
    val df = rows.toDF("x1", "x2", "x3", "y").repartition(8)
    val feats = Seq("x1" -> col("x1"), "x2" -> col("x2"), "x3" -> col("x3"))
    val dist = Logistic.fit(df, feats, col("y"), lambda = 1e-3).get
    val local = Logistic.fitLocal(df, feats, col("y"), lambda = 1e-3).get
    assert(dist.converged && local.converged)
    assert(dist.n == local.n && dist.n == 2000)
    dist.weights.zip(local.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weight drift: $a vs $b") }
    assert(math.abs(dist.intercept - local.intercept) < 1e-9)
    assert(math.abs(dist.deviance - local.deviance) < 1e-6 * local.deviance)
  }

  test("LogisticMomentAgg accumulates exactly the fitLocal arithmetic") {
    val beta = Array(0.7, -1.2, 0.3)
    val rows = Seq((1.0, Seq(0.4, 1.1, 1.0)), (0.0, Seq(-0.2, 0.6, 1.0)))
    // single partition: the aggregate's buffer order == sequential order,
    // so the comparison is bit-identical (same double ops, same order)
    val df = rows.toDF("y", "xs").coalesce(1)
    val got = df.select(graft.functions.LogisticMomentAgg(
        spark, col("y"), col("xs").cast("array<double>"), beta).as("m"))
      .head().getSeq[Double](0).toArray
    val d = 3
    // moments + the [n, min y, max y] bookkeeping cells
    val expect = new Array[Double](d * (d + 1) / 2 + d + 4)
    expect(expect.length - 3) = rows.length.toDouble
    expect(expect.length - 2) = rows.map(_._1).min
    expect(expect.length - 1) = rows.map(_._1).max
    rows.foreach { case (y, xsSeq) =>
      val xs = xsSeq.toArray
      var eta = 0.0
      for (i <- 0 until d) eta += xs(i) * beta(i)
      val p = math.min(math.max(1.0 / (1.0 + math.exp(-eta)), 1e-12),
        1.0 - 1e-12)
      val w = p * (1.0 - p)
      val r = y - p
      var k = 0
      for (i <- 0 until d; j <- i until d) {
        expect(k) += w * xs(i) * xs(j); k += 1
      }
      for (i <- 0 until d) { expect(k) += r * xs(i); k += 1 }
      expect(k) += -2.0 * (y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
    }
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("logistic degenerate inputs return None, never throw") {
    import graft.stats.Logistic
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    assert(Logistic.fit(empty, Seq("x" -> col("x")), col("y")).isEmpty)
    // constant label: no boundary to fit
    val const = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0)).toDF("x", "y")
    assert(Logistic.fit(const, Seq("x" -> col("x")), col("y")).isEmpty)
    // nulls dropped pairwise-complete; survivors still fit
    val withNulls = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 0.0), (null, 1.0), (3.0, null), (4.0, 1.0), (0.5, 0.0), (5.0, 1.0))
      .toDF("x", "y")
    val f = Logistic.fit(withNulls, Seq("x" -> col("x")), col("y"),
      lambda = 0.1).get
    assert(f.n == 4 && f.weights(0) > 0, s"n=${f.n} w=${f.weights(0)}")
  }

  test("chi-square: matches commons-math3 on raw counts; degenerate → None") {
    import graft.stats.Contingency
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val r = Contingency.chiSquare(df, "l_returnflag", "l_linestatus").get

    // independent implementation on the same observed counts
    val obs = df.groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val as = obs.map(_._1).distinct.sorted
    val bs = obs.map(_._2).distinct.sorted
    val m = Array.ofDim[Long](as.length, bs.length)
    obs.foreach { case (a, b, c) => m(as.indexOf(a))(bs.indexOf(b)) = c }
    val tester = new org.apache.commons.math3.stat.inference.ChiSquareTest()
    assert(math.abs(r.chi2 - tester.chiSquare(m)) < 1e-9,
      s"chi2 ${r.chi2} vs ${tester.chiSquare(m)}")
    assert(math.abs(r.pValue - tester.chiSquareTest(m)) < 1e-9)
    assert(r.dof == (as.length - 1).toLong * (bs.length - 1))
    assert(r.n == obs.map(_._3).sum)

    // single-level side → None
    val one = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Contingency.chiSquare(one, "a", "b").isEmpty)

    // a structurally-empty cell must contribute (0-e)^2/e = e, not be
    // dropped: counts ((3,0),(0,2)) — commons-math3 on the full matrix
    val zc = Seq("x", "x", "x").map(v => (v, "p")) ++
      Seq("y", "y").map(v => (v, "q"))
    val rz = Contingency.chiSquare(zc.toDF("a", "b"), "a", "b").get
    val mz = Array(Array(3L, 0L), Array(0L, 2L))
    val tz = new org.apache.commons.math3.stat.inference.ChiSquareTest()
    assert(math.abs(rz.chi2 - tz.chiSquare(mz)) < 1e-9,
      s"zero-cell chi2 ${rz.chi2} vs ${tz.chiSquare(mz)}")
    assert(rz.chi2 == 5.0, s"perfect 3/2 copy scores n = 5, got ${rz.chi2}")
  }

  test("psi drift: identical distributions score ~0; a shift scores large") {
    import graft.stats.Drift
    val ref = (1 to 1000).map(i => i.toDouble).toDF("v")
    // same distribution: PSI ≈ 0 (bin counts match exactly here)
    assert(math.abs(Drift.psi(ref, ref, "v")) < 1e-12)
    // shifted by half the range: mass leaves the low bins
    val cur = (501 to 1500).map(i => i.toDouble).toDF("v")
    val shifted = Drift.psi(ref, cur, "v")
    assert(shifted > 0.25, s"shifted distribution must flag, psi=$shifted")
    // binning: edges from ref deciles; bin of min is 0, of max is nBins-1
    val edges = Drift.binEdges(ref, "v", 10)
    assert(edges.length == 9 && edges.head < edges.last)
  }

  test("psi by group: stable domain ~0 while shifted domain flags, in one pass") {
    import graft.stats.Drift
    val ref = ((1 to 500).map(i => ("stable", i.toDouble)) ++
      (1 to 500).map(i => ("moving", i.toDouble))).toDF("g", "v")
    val cur = ((1 to 500).map(i => ("stable", i.toDouble)) ++
      (751 to 1250).map(i => ("moving", i.toDouble))).toDF("g", "v")
    val out = Drift.psiByGroup(ref, cur, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("stable")) < 1e-9, s"stable: ${out("stable")}")
    assert(out("moving") > 0.25, s"moving: ${out("moving")}")
  }

  test("encode: frequency-rank index deterministic; LOO excludes own target") {
    import graft.transform.Encode
    val df = Seq(("b", 10.0), ("b", 20.0), ("a", 5.0), ("a", 7.0), ("a", 9.0),
      ("c", 1.0)).toDF("cat", "y")
    val idx = Encode.categoryIndex(df, "cat", "idx")
      .select("cat", "idx").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // a (3 rows) → 0, b (2) → 1, c (1) → 2
    assert(idx == Map("a" -> 0, "b" -> 1, "c" -> 2), s"$idx")

    val te = Encode.targetEncodeLoo(df, "cat", "y", "te")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.getAs[Any]("te")))).toSet
    // each row's encoding is the mean of the OTHERS in its category
    assert(te.contains(("a", 5.0, Some(8.0))))  // (7+9)/2
    assert(te.contains(("b", 10.0, Some(20.0))))
    assert(te.contains(("c", 1.0, None)), "singleton category must be null")
  }

  test("impute: nulls fill with group mean; observed values untouched") {
    import graft.transform.Impute
    val df = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 10.0), (2L, "a", null), (3L, "a", 20.0),
      (4L, "b", null), (5L, "b", null) // group with no observed values
    ).toDF("id", "g", "v")
    val out = Impute.fillWithGroupMean(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("v")))
      .toMap
    assert(out(1L) == Some(10.0) && out(3L) == Some(20.0))
    assert(out(2L) == Some(15.0), s"imputed ${out(2L)}")
    assert(out(4L).isEmpty && out(5L).isEmpty,
      "a fully-null group has no mean to impute")
  }

  test("standardize: mean 0 / sd 1 after transform; constant column nulls") {
    import graft.transform.Standardize
    val df = Seq((1L, 10.0, 5.0), (2L, 20.0, 5.0), (3L, 30.0, 5.0),
      (4L, 40.0, 5.0)).toDF("id", "v", "k")
    val out = Standardize.zscore(df, Seq("v", "k"), roundTo = 9)
    val vs = out.select("v").collect().map(_.getDouble(0)).sorted
    // 10,20,30,40: mean 25, sample sd = sqrt(500/3)
    val sd = math.sqrt(500.0 / 3.0)
    val want = Seq(-15.0, -5.0, 5.0, 15.0).map(x =>
      BigDecimal(x / sd).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(vs.toSeq == want, s"got ${vs.toSeq}")
    assert(out.select("k").collect().forall(_.isNullAt(0)),
      "zero-variance column must standardize to null, not throw")
  }

  test("robust z: median/MAD math; outlier-resistant; MAD=0 and nulls null out") {
    import graft.transform.Standardize
    // group a: 1,2,3,4,100 — median 3, deviations 2,1,0,1,97 → MAD 1
    // group b: all 7s — MAD 0 → null; group c has a null value
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)), ("a", 3L, Some(3.0)),
      ("a", 4L, Some(4.0)), ("a", 5L, Some(100.0)),
      ("b", 6L, Some(7.0)), ("b", 7L, Some(7.0)),
      ("c", 8L, Some(5.0)), ("c", 9L, None), ("c", 10L, Some(9.0))
    ).toDF("g", "id", "v")
    val out = Standardize.robustZByGroup(df, "g", "v", roundTo = 6)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[AnyRef])).toMap
    def rz(v: Double, med: Double, mad: Double): Double =
      BigDecimal((v - med) / (1.4826 * mad))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L) == rz(3.0, 3.0, 1.0).asInstanceOf[AnyRef]) // exactly 0
    assert(out(1L) == rz(1.0, 3.0, 1.0).asInstanceOf[AnyRef])
    // the outlier's z is huge but BOUNDED by the clean median/MAD — a
    // mean/sd z of the same group would be pulled toward the outlier
    assert(out(5L) == rz(100.0, 3.0, 1.0).asInstanceOf[AnyRef])
    assert(out(6L) == null && out(7L) == null, "MAD=0 group must null out")
    assert(out(9L) == null, "null value stays null")
    // group c: median 7 (interpolated from 5,9), MAD 2
    assert(out(8L) == rz(5.0, 7.0, 2.0).asInstanceOf[AnyRef])
  }

  test("winsorize: tails clip to percentile bounds, interior passes through") {
    import graft.transform.Winsorize
    // 1..100: p1 = 1.99, p99 = 99.01 under (n-1)p interpolation
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Winsorize.clip(df, Seq("v"), 0.01, 0.99)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 1.99 && out(100L) == 99.01, s"${out(1L)}, ${out(100L)}")
    assert(out(2L) == 2.0 && out(50L) == 50.0 && out(99L) == 99.0)
  }

  test("categorical psi: identical shares ~0, collapsed mix flags, null is a category") {
    import graft.stats.Drift
    val ref = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("lbl")
    assert(math.abs(Drift.psiCategorical(ref, ref, "lbl")) < 1e-12)
    // current collapses to one label: textbook severe drift
    val cur = Seq.fill(100)("a").toDF("lbl")
    val psi = Drift.psiCategorical(ref, cur, "lbl")
    assert(psi > 0.25, s"collapsed mix must flag, psi=$psi")
    // a category present only on one side still contributes (1e-6 floor)
    val table = Drift.psiCategoricalTable(ref, cur, "lbl")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cur_cnt")).toMap
    assert(table.keySet == Set("a", "b", "c"))
    // NULL labels drift in: counted as their own category, not dropped
    val curNull = (Seq.fill(80)(Some("a")) ++ Seq.fill(20)(Option.empty[String]))
      .toDF("lbl")
    val t2 = Drift.psiCategoricalTable(ref, curNull, "lbl")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cur_cnt")).toMap
    assert(t2("<null>") == 20L, s"null category lost: $t2")
    assert(Drift.psiCategorical(ref, curNull, "lbl") > 0.1)
    // degenerate: both sides empty -> 0.0 (no categories, no shift), not
    // an NPE from summing zero rows
    val empty = ref.filter(lit(false))
    assert(Drift.psiCategorical(empty, empty, "lbl") == 0.0)
  }

  test("two-sample KS: hand-computed D, identical samples, shifted samples") {
    import graft.stats.Drift
    // A = {1,2,3,4}, B = {3,4,5,6}: max |F_a - F_b| = 0.5 (at v in 2..4)
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Drift.ksTwoSample(a, b, col("v")).head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("d_stat") == 0.5)
    // identical samples: D = 0, p = 1 (series sums to ~1, clamped)
    val same = Drift.ksTwoSample(a, a, col("v")).head()
    assert(same.getAs[Double]("d_stat") == 0.0)
    assert(same.getAs[Double]("p_value") == 1.0)
    // a big clean shift: D near 1, p tiny
    val x = (0 until 300).map(_ / 300.0).toDF("v")
    val y = (0 until 300).map(i => 10.0 + i / 300.0).toDF("v")
    val far = Drift.ksTwoSample(x, y, col("v")).head()
    assert(far.getAs[Double]("d_stat") == 1.0)
    assert(far.getAs[Double]("p_value") < 1e-6)
    // same distribution sampled twice: D small, p comfortably large
    val x2 = (0 until 300).map(i => ((i * 37) % 300) / 300.0).toDF("v")
    val close = Drift.ksTwoSample(x, x2, col("v")).head()
    assert(close.getAs[Double]("p_value") > 0.9,
      s"same-distribution p should be large: $close")
    // empty side fails loudly
    assert(intercept[IllegalArgumentException] {
      Drift.ksTwoSample(a.filter(lit(false)), b, col("v"))
    }.getMessage.contains("non-empty"))
    // partitioning invariance of the distributed scan
    val rp = Drift.ksTwoSample(a.repartition(7), b.repartition(5),
      col("v")).head()
    assert(rp.getAs[Double]("d_stat") == 0.5)
  }

  test("benford screen: multiplicative data conforms, uniform does not") {
    import graft.stats.DataQuality
    // geometric growth is the canonical Benford generator
    val benfordish = (0 until 2000)
      .map(i => math.floor(math.pow(1.07, i % 500) * 17).toLong + 1)
    val conf = DataQuality.benfordSummary(benfordish.toDF("v"), col("v"))
      .collect().head
    assert(conf.getAs[Boolean]("conforms"),
      s"geometric data should conform, mad=${conf.getAs[Double]("mad")}")
    assert(conf.getAs[Long]("n") == 2000)
    // uniform over [40000, 49999]: every first digit is 4
    val uniform = (0 until 1000).map(i => 40000L + i * 10)
    val bad = DataQuality.benfordSummary(uniform.toDF("v"), col("v"))
      .collect().head
    assert(!bad.getAs[Boolean]("conforms"))
    // single-digit data: the 8 absent digits keep their expected mass
    val table = DataQuality.benfordTable(uniform.toDF("v"), col("v"))
      .collect()
    assert(table.length == 1 && table.head.getAs[Int]("digit") == 4)
    assert(table.head.getAs[Double]("observed_share") == 1.0)
    // non-positive and null rows are excluded
    val mixed = Seq(Some(123L), Some(-5L), Some(0L), None)
      .toDF("v")
    val m = DataQuality.benfordSummary(mixed, col("v")).collect().head
    assert(m.getAs[Long]("n") == 1)
  }

  test("mutual information: driver reference, identity and independence limits") {
    import graft.stats.Contingency
    val rows = (0 until 600).map { i =>
      (s"a${i % 4}", s"b${(i * 7) % 3}", i)
    }
    // planted dependence for the reference check: c copies a on 1/3 of rows
    val dep = rows.map { case (a, b, i) => (a, if (i % 3 == 0) a else b) }
    val df = dep.toDF("a", "b")
    val got = Contingency.mutualInformation(df, "a", "b").collect().head
    // independent full reference from exact joint counts
    val n = dep.size.toDouble
    val joint = dep.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val pa = dep.groupBy(_._1).view.mapValues(_.size.toDouble / n).toMap
    val pb = dep.groupBy(_._2).view.mapValues(_.size.toDouble / n).toMap
    val miRef = joint.map { case ((a, b), c) =>
      math.rint((c / n) * math.log((c / n) / (pa(a) * pb(b))) * 1e9) / 1e9
    }.sum
    assert(math.abs(got.getAs[Double]("mi") - miRef) < 1e-7,
      s"mi ${got.getAs[Double]("mi")} vs reference $miRef")
    val hRef = -pa.values.map(p => math.rint(p * math.log(p) * 1e9) / 1e9).sum
    assert(math.abs(got.getAs[Double]("h_a") - hRef) < 1e-7)
    // b == a: MI equals H(A), NMI is exactly 1
    val same = rows.map(t => (t._1, t._1)).toDF("a", "b")
    val g2 = Contingency.mutualInformation(same, "a", "b").collect().head
    assert(math.abs(g2.getAs[Double]("mi") - g2.getAs[Double]("h_a")) < 1e-9)
    assert(math.abs(g2.getAs[Double]("nmi") - 1.0) < 1e-9)
    // constant b: MI is 0 and NMI undefined (null)
    val const = rows.map(t => (t._1, "k")).toDF("a", "b")
    val g3 = Contingency.mutualInformation(const, "a", "b").collect().head
    assert(g3.getAs[Double]("mi") == 0.0)
    assert(g3.isNullAt(g3.fieldIndex("nmi")))
  }

  test("poisson bootstrap: draws match a driver reference and behave like Poisson(1)") {
    import graft.stats.Bootstrap
    val n = 400; val b = 50
    val df = (0 until n).map(i => (i.toLong, 10.0 + (i % 7))).toDF("id", "x")
    val means = Bootstrap.resampleMeans(df, Seq("id"), col("x"), b, "t")
      .collect()
    assert(means.length == b)
    // driver reference: recompute resample 13 from the same hash scheme
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(bi: Int, id: Long): Double = {
      val h = md.digest(s"t|$bi|$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0
    }
    def cnt(uu: Double): Int = Bootstrap.thresholds.count(uu > _)
    val ref = (0 until n).map { i =>
      val c = cnt(u(13, i.toLong)); (c.toLong, c * (10.0 + (i % 7)))
    }
    val (refN, refSum) = (ref.map(_._1).sum, ref.map(_._2).sum)
    val got = means.find(_.getAs[Int]("b") == 13).get
    assert(got.getAs[Long]("n_eff") == refN)
    assert(got.getAs[Double]("boot_mean") ==
      math.rint(refSum / refN * 1e6) / 1e6)
    // poisson(1) behavior: mean n_eff ~ n, and resamples genuinely vary
    val effs = means.map(_.getAs[Long]("n_eff").toDouble)
    assert(math.abs(effs.sum / b - n) < 4 * math.sqrt(n.toDouble / b))
    assert(effs.distinct.length > 1)
    // a value the decimal(18,6) cannot hold must fail LOUDLY, not vanish
    // from every resample through the non-ANSI cast-to-null + null filter
    val overflow = Seq((1L, 1.0), (2L, 1e15)).toDF("id", "x")
    val e = intercept[Exception] {
      Bootstrap.resampleMeans(overflow, Seq("id"), col("x"), 2, "t").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // under ANSI (this session's default) the cast itself throws
    // NUMERIC_VALUE_OUT_OF_RANGE before our guard; under non-ANSI the
    // guard's raise_error fires — either way the failure is loud
    assert(msgs(e).exists(m => m != null &&
        (m.contains("not representable") ||
          m.contains("NUMERIC_VALUE_OUT_OF_RANGE"))),
      s"expected the loud overflow error, got: $e")
  }

  test("kaplan-meier: the 6-MP textbook curve, zero-survival path, censor-only times") {
    import graft.stats.Survival
    // Freireich 1963 6-MP arm (public textbook data): * = censored
    val obs = Seq(6, 6, 6, 7, 10, 13, 16, 22, 23).map((_, 1))
    val cen = Seq(6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35).map((_, 0))
    val df = (obs ++ cen).map { case (t, e) => (t.toDouble, e) }
      .toDF("t", "e")
    val curve = Survival.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => r.getAs[Double]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Double]("survival")))).toMap
    assert(curve(6.0) == ((21L, 0.857143)))
    assert(curve(7.0)._2 == 0.806723 || curve(7.0)._2 == 0.806722)
    assert(curve(10.0)._1 == 15L)
    assert(curve(23.0)._2 == 0.448178 || curve(23.0)._2 == 0.448179)
    // censoring-only times (9, 11, ...) never appear as curve steps
    assert(!curve.contains(9.0) && !curve.contains(11.0))
    // Greenwood band + Nelson-Aalen on the same textbook curve: at t=6
    // H = 3/21 = 0.142857 and se = S*sqrt(3/(21*18)) = 0.07636 (the
    // published 6-MP value ~0.0764)
    val band = Survival.survivalBand(Survival.kaplanMeier(df, col("t"),
        col("e"))).orderBy("t").collect()
    val b6 = band.head
    assert(b6.getAs[Double]("t") == 6.0 &&
      b6.getAs[Double]("cumhaz") == 0.142857 &&
      b6.getAs[Double]("se") == 0.07636, s"$b6")
    assert(b6.getAs[Double]("ci_lo") <= 0.857143 &&
      0.857143 <= b6.getAs[Double]("ci_hi"))
    val hz = band.map(_.getAs[Double]("cumhaz"))
    assert(hz.zip(hz.tail).forall(p => p._1 <= p._2), "H non-decreasing")
    // everyone dies at the last time: survival hits exactly 0, not ln(0)
    val allDie = Seq((1.0, 1), (1.0, 1), (2.0, 1), (2.0, 1)).toDF("t", "e")
    val z = Survival.kaplanMeier(allDie, col("t"), col("e"))
      .orderBy("t").collect()
    assert(z.last.getAs[Double]("survival") == 0.0)
    assert(z.head.getAs[Double]("survival") == 0.5)
    // pre-binning contract: too many distinct durations fails LOUDLY
    // (the curve windows run over the distinct-duration table) with the
    // binDurations remedy in the message
    val noisy = (1 to 50).map(i => (i + i * 1e-7, 1)).toDF("t", "e")
    val err = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(noisy, col("t"), col("e"),
        maxDistinctTimes = 10)
    }
    assert(err.getMessage.contains("binDurations"))
    // binDurations floors to the grain: noise-distinct durations
    // collapse to curve steps (50 distinct -> at most 6 integer bins,
    // back inside the cap), and a binned duration never exceeds the
    // true one
    val fine = (1 to 50).map(i => (i * 0.1 + i * 1e-9, 1)).toDF("t", "e")
    val binned = Survival.kaplanMeier(fine,
      Survival.binDurations(col("t"), 1.0), col("e"),
      maxDistinctTimes = 10)
    assert(binned.count() <= 6)
    val bd = fine.select(Survival.binDurations(col("t"), 1.0).as("b"),
      col("t")).collect()
    assert(bd.forall(r => r.getAs[Double]("b") <= r.getAs[Double]("t")))
  }

  test("brunner-munzel: hand placements, relative effect, separation edge") {
    import graft.stats.RankTests
    // x=[1,2,2,5], y=[2,3,6]: p_hat = P(X<Y)+0.5P(X=Y) = 0.75 (matches
    // the brute-force pair count), W = 1.224745, Welch df = 4.8 —
    // replayed independently in pure Python from the doubled-midrank
    // placement sums
    val r = RankTests.brunnerMunzel(
      Seq(1.0, 2.0, 2.0, 5.0).toDF("v"), Seq(2.0, 3.0, 6.0).toDF("v"),
      col("v")).head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("p_hat") == 0.75 &&
      r.getAs[Double]("w_stat") == 1.224745 &&
      r.getAs[Double]("df") == 4.8, s"$r")
    // complete separation: p_hat = 1, placement variances 0 -> null W
    val sep = RankTests.brunnerMunzel(
      Seq(1.0, 1.0, 2.0).toDF("v"), Seq(5.0, 6.0).toDF("v"),
      col("v")).head()
    assert(sep.getAs[Double]("p_hat") == 1.0 &&
      sep.isNullAt(sep.fieldIndex("w_stat")), s"$sep")
    // symmetry: swapping sides reflects p_hat around 1/2
    val sw = RankTests.brunnerMunzel(
      Seq(2.0, 3.0, 6.0).toDF("v"), Seq(1.0, 2.0, 2.0, 5.0).toDF("v"),
      col("v")).head()
    assert(sw.getAs[Double]("p_hat") == 0.25, s"$sw")
    intercept[IllegalArgumentException] {
      RankTests.brunnerMunzel(Seq(1.0).toDF("v"),
        Seq(2.0, 3.0).toDF("v"), col("v"))
    }
  }

  test("chatterjee xi: hand ties case, finite-n monotone value, edges") {
    import graft.stats.Correlation
    // x=[1,1,2,3], y=[5,5,7,5]: r=[3,3,4,3], num=2, den=3 ->
    // xi = 1 - 4*2/6 = -1/3 (replayed by hand; negative values happen
    // at tiny n)
    val r = Correlation.xicor(
      Seq((1.0, 5.0, 0L), (1.0, 5.0, 1L), (2.0, 7.0, 2L), (3.0, 5.0, 3L))
        .toDF("x", "y", "t"), col("x"), col("y"), col("t")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_distinct_y") == 2L)
    assert(r.getAs[Double]("xi") == -0.333333, s"$r")
    // perfect monotone at n=5: xi = 1 - 5*4/(2*20) = 0.5 exactly (the
    // coefficient's known finite-n ceiling; -> 1 as n grows)
    val m = Correlation.xicor(
      (1 to 5).map(i => (i.toDouble, i.toDouble, i.toLong)).toDF("x", "y", "t"),
      col("x"), col("y"), col("t")).head()
    assert(m.getAs[Double]("xi") == 0.5, s"$m")
    // larger monotone approaches 1; a non-monotone FUNCTION also scores
    // high (the property Pearson/Spearman lack)
    val big = (1 to 2000).map(i => (i.toDouble, (i - 1000.0) * (i - 1000.0),
      i.toLong)).toDF("x", "y", "t")
    val pb = Correlation.xicor(big, col("x"), col("y"), col("t")).head()
    assert(pb.getAs[Double]("xi") > 0.99, s"$pb")
    intercept[IllegalArgumentException] { // constant y -> loud
      Correlation.xicor(Seq((1.0, 2.0, 1L), (2.0, 2.0, 2L)).toDF("x", "y", "t"),
        col("x"), col("y"), col("t"))
    }
  }

  test("squared-ranks: hand T=3, chi2(2) calibration shape, tied edge") {
    import graft.stats.RankTests
    // a=[1,3], b=[0,4]: deviations (1,1) and (2,2) -> midranks 1.5, 3.5
    // -> S_a = 4.5, S_b = 24.5, T = 3.0 (replayed by hand)
    val r = RankTests.squaredRanks(
      Seq(("a", 1.0), ("a", 3.0), ("b", 0.0), ("b", 4.0)).toDF("g", "v"),
      col("g"), col("v")).collect()
    val byG = r.map(x => x.getString(0) -> x.getAs[Double]("s_sum")).toMap
    assert(byG == Map("a" -> 4.5, "b" -> 24.5), byG.toString)
    assert(r.forall(_.getAs[Double]("t_stat") == 3.0), r.mkString(";"))
    // all deviations tied (symmetric pairs around each mean with equal
    // spread): D2 = 0 -> null T
    val tied = RankTests.squaredRanks(
      Seq(("a", 0.0), ("a", 2.0), ("b", 5.0), ("b", 7.0)).toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(tied.forall(_.isNullAt(3)), tied.mkString(";"))
  }

  test("ansari-bradley: hand scores, scale direction, degenerate edge") {
    import graft.stats.RankTests
    // x=[1,4], y=[2,3]: both-end scores 1,2,2,1 -> AB=2, E=3,
    // Var = 4*(4*10-36)/(16*3) = 1/3, z = -1.732051 (x MORE dispersed)
    val r = RankTests.ansariBradley(Seq(1.0, 4.0).toDF("v"),
      Seq(2.0, 3.0).toDF("v"), col("v")).head()
    assert(r.getAs[Double]("ab_stat") == 2.0 &&
      r.getAs[Double]("expected") == 3.0 &&
      r.getAs[Double]("z") == -1.732051, s"$r")
    // direction: a concentrated sample scores HIGH -> z > 0
    val conc = RankTests.ansariBradley(
      (1 to 20).map(i => 10.0 + (i % 3)).toDF("v"),
      (1 to 20).map(i => 10.0 + 5.0 * (i % 5) - 10.0).toDF("v"),
      col("v")).head()
    assert(conc.getAs[Double]("z") > 2.0, s"$conc")
    // one distinct value everywhere: zero score variance -> null z
    val d = RankTests.ansariBradley(Seq(2.0, 2.0).toDF("v"),
      Seq(2.0, 2.0).toDF("v"), col("v")).head()
    assert(d.isNullAt(d.fieldIndex("z")), s"$d")
  }

  test("wasserstein-1: hand shifts, identity zero, empty-side loudness") {
    import graft.stats.Drift
    // unit shift: a = {0,1}, b = {1,2} -> W1 = 1 exactly
    val w1 = Drift.wasserstein1(Seq(0.0, 1.0).toDF("v"),
      Seq(1.0, 2.0).toDF("v"), col("v")).head()
    assert(w1.getAs[Double]("w1") == 1.0 &&
      w1.getAs[Long]("n_values") == 3L, s"$w1")
    // mass transport: a = {0,10}, b = {5,5} -> move each unit 5 -> W1 = 5
    val w2 = Drift.wasserstein1(Seq(0.0, 10.0).toDF("v"),
      Seq(5.0, 5.0).toDF("v"), col("v")).head()
    assert(w2.getAs[Double]("w1") == 5.0, s"$w2")
    // identical samples -> 0, regardless of sizes (CDF equality)
    val w3 = Drift.wasserstein1(Seq(1.0, 2.0, 3.0).toDF("v"),
      Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0).toDF("v"), col("v")).head()
    assert(w3.getAs[Double]("w1") == 0.0, s"$w3")
    intercept[IllegalArgumentException] {
      Drift.wasserstein1(Seq(1.0).toDF("v"),
        Seq.empty[Double].toDF("v"), col("v"))
    }
  }

  test("friedman: textbook Q=0.5, ties, incomplete-block loudness") {
    import graft.stats.RankTests
    // 4 complete blocks x 3 treatments, no ties: R = (8,7,9) ->
    // Q = 2*2/(56-48) = 0.5, p = exp(-0.25) = 0.778801 (chi2(2) closed form)
    val rows = Seq(
      (1, "t1", 7.0), (1, "t2", 9.0), (1, "t3", 8.0),
      (2, "t1", 6.0), (2, "t2", 5.0), (2, "t3", 8.0),
      (3, "t1", 9.0), (3, "t2", 7.0), (3, "t3", 6.0),
      (4, "t1", 6.0), (4, "t2", 5.0), (4, "t3", 9.0))
    val out = RankTests.friedman(rows.toDF("b", "g", "v"),
      col("b"), col("g"), col("v")).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getAs[Double]("q_stat") == 0.5 &&
      r.getAs[Double]("p_value") == 0.778801), out.mkString(";"))
    val mr = out.map(r => r.getString(0) -> r.getAs[Double]("mean_rank")).toMap
    assert(mr == Map("t1" -> 2.0, "t2" -> 1.75, "t3" -> 2.25), mr.toString)
    // a within-block tie takes the average rank (doubled-rank integers):
    // block 2 becomes (6,6,8) -> ranks (1.5,1.5,3)
    val tied = rows.map { case (b, g, v) =>
      if (b == 2 && g == "t2") (b, g, 6.0) else (b, g, v) }
    val to = RankTests.friedman(tied.toDF("b", "g", "v"),
      col("b"), col("g"), col("v")).collect()
    // R = (8.5, 7.5, 9), A = 55.5, C = 48: Q = 2*1.5/7.5 = 0.4
    assert(to.forall(r => r.getAs[Double]("q_stat") == 0.4),
      to.mkString(";"))
    // incomplete block -> loud
    val err = intercept[IllegalArgumentException] {
      RankTests.friedman(rows.drop(1).toDF("b", "g", "v"),
        col("b"), col("g"), col("v"))
    }
    assert(err.getMessage.contains("incomplete"), err.getMessage)
  }

  test("quade: hand range-weighted case T3=9.5, incomplete loudness") {
    import graft.stats.RankTests
    // blocks [[1,2,3],[2,4,6],[3,3,5]]: ranges 2,4,2 -> range midranks
    // 1.5,3,1.5; S_i = (-5.25, -0.75, 6.0); A=25.875, B=21.375 ->
    // T3 = 2*21.375/4.5 = 9.5 (replayed by hand)
    val rows = Seq(
      (1, "t1", 1.0), (1, "t2", 2.0), (1, "t3", 3.0),
      (2, "t1", 2.0), (2, "t2", 4.0), (2, "t3", 6.0),
      (3, "t1", 3.0), (3, "t2", 3.0), (3, "t3", 5.0))
    val out = RankTests.quade(rows.toDF("b", "g", "v"),
      col("b"), col("g"), col("v")).collect()
    val sums = out.map(r => r.getString(0) -> r.getAs[Double]("s_sum")).toMap
    assert(sums == Map("t1" -> -5.25, "t2" -> -0.75, "t3" -> 6.0), sums)
    assert(out.forall(_.getAs[Double]("t3_stat") == 9.5), out.mkString(";"))
    // perfectly consistent blocks: A = B -> null T3 (read the sums)
    val perfect = Seq(
      (1, "t1", 1.0), (1, "t2", 2.0),
      (2, "t1", 3.0), (2, "t2", 4.0))
    val p = RankTests.quade(perfect.toDF("b", "g", "v"),
      col("b"), col("g"), col("v")).collect()
    assert(p.forall(_.isNullAt(3)), p.mkString(";"))
    intercept[IllegalArgumentException] {
      RankTests.quade(rows.drop(1).toDF("b", "g", "v"),
        col("b"), col("g"), col("v"))
    }
  }

  test("mood median: hand 2x2 chi2=8, degenerate split loudness") {
    import graft.stats.RankTests
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(5.0, 6.0, 7.0, 8.0).map(("b", _))).toDF("g", "v")
    val out = RankTests.moodMedian(df, col("g"), col("v")).collect()
    // grand median 4.5: a has 0 above, b has 4; chi2 = 4 + 4 = 8
    assert(out.length == 2)
    val byG = out.map(r => r.getString(0) ->
      ((r.getAs[Long]("n_above"), r.getAs[Double]("expected_above")))).toMap
    assert(byG("a") == ((0L, 2.0)) && byG("b") == ((4L, 2.0)), byG.toString)
    assert(out.forall(_.getAs[Double]("chi2") == 8.0), out.mkString(";"))
    // everything tied at one value -> degenerate split, loud
    val err = intercept[IllegalArgumentException] {
      RankTests.moodMedian(Seq(("a", 2.0), ("a", 2.0), ("b", 2.0))
        .toDF("g", "v"), col("g"), col("v"))
    }
    assert(err.getMessage.contains("degenerate"), err.getMessage)
  }

  test("dagostino k2: hand case, normal calibration, directional behavior") {
    import graft.stats.Normality
    // hand case replayed independently (decimal folds + transforms in
    // pure Python, tools-free): n=20 mixed sample
    val xs = Seq(1.2, 3.4, 2.2, 5.6, 4.1, 0.5, 2.9, 3.3, 1.8, 7.7,
      2.4, 3.1, 4.8, 2.0, 3.6, 1.1, 2.7, 5.2, 3.9, 2.5)
    val r = Normality.dagostinoK2(xs.toDF("x"), col("x")).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("g1") == 0.805201 &&
      r.getAs[Double]("g2") == 0.634206, s"$r")
    assert(r.getAs[Double]("z_skew") == 1.708713 &&
      r.getAs[Double]("z_kurt") == 1.253846, s"$r")
    assert(r.getAs[Double]("k2") == 4.491829 &&
      r.getAs[Double]("k2_p") == 0.105831, s"$r")
    assert(r.getAs[Double]("jb") == 2.496344 &&
      r.getAs[Double]("jb_p") == 0.287029, s"$r")
    // calibration: near-normal data (Irwin–Hall sum of 12 uniforms from
    // the deterministic hash stream) must NOT reject; z's stay small
    val n1 = (1 to 3000).map { i =>
      val rng = new java.util.Random(i.toLong * 2654435761L)
      (1 to 12).map(_ => rng.nextDouble()).sum - 6.0
    }
    val rn = Normality.dagostinoK2(n1.toDF("x"), col("x")).head()
    assert(rn.getAs[Double]("k2_p") > 0.05 &&
      math.abs(rn.getAs[Double]("z_skew")) < 3 &&
      math.abs(rn.getAs[Double]("z_kurt")) < 3, s"$rn")
    // directional: exponential-ish -> strong right skew z; uniform ->
    // strongly negative kurtosis z
    val ex = (1 to 2000).map { i =>
      val u = (new java.util.Random(i.toLong * 40503L)).nextDouble()
      -math.log(1.0 - u)
    }
    val re = Normality.dagostinoK2(ex.toDF("x"), col("x")).head()
    assert(re.getAs[Double]("z_skew") > 5, s"$re")
    val un = (1 to 2000).map(i =>
      (new java.util.Random(i.toLong * 69069L)).nextDouble())
    val ru = Normality.dagostinoK2(un.toDF("x"), col("x")).head()
    assert(ru.getAs[Double]("z_kurt") < -5, s"$ru")
    // loud floors
    intercept[IllegalArgumentException] {
      Normality.dagostinoK2((1 to 19).map(_.toDouble).toDF("x"), col("x"))
    }
    intercept[IllegalArgumentException] {
      Normality.dagostinoK2(Seq.fill(25)(2.0).toDF("x"), col("x"))
    }
  }

  test("log-rank shares the capped distinct-times contract (r15 weak item)") {
    import graft.stats.Survival
    // microsecond-noise durations: logRank's windows run over the SAME
    // distinct-duration table as kaplanMeier's, so the loud cap +
    // binDurations remedy must fire identically (r14/r15 carried the
    // asymmetry where only kaplanMeier enforced it)
    val noisy = (1 to 50).map(i =>
      (if (i % 2 == 0) "a" else "b", i + i * 1e-7, 1)).toDF("g", "t", "e")
    val err = intercept[IllegalArgumentException] {
      Survival.logRank(noisy, col("g"), col("t"), col("e"),
        maxDistinctTimes = 10)
    }
    assert(err.getMessage.contains("logRank") &&
      err.getMessage.contains("binDurations"), err.getMessage)
    // the remedy path: binned durations drop back inside the cap and
    // the statistic computes (identical groups -> chi2 near 0)
    val ok = Survival.logRank(noisy,
      col("g"), Survival.binDurations(col("t"), 10.0), col("e"),
      maxDistinctTimes = 10).collect().head
    assert(ok.getAs[Long]("n_a") == 25L && ok.getAs[Long]("n_b") == 25L)
    // an externally-built curve rides survivalSummary's windows: the
    // same cap guards it
    val curve = (1 to 50).map(i => (i + i * 1e-7, 50L - i, 1L, 0L, 1.0 - i / 51.0))
      .toDF("t", "n_risk", "d_events", "n_censored", "survival")
    val err2 = intercept[IllegalArgumentException] {
      Survival.survivalSummary(curve, tau = 100.0, maxDistinctTimes = 10)
    }
    assert(err2.getMessage.contains("survivalSummary") &&
      err2.getMessage.contains("binDurations"), err2.getMessage)
  }

  test("theil-sen: exact line recovery, 29% breakdown resistance, edge shapes") {
    import graft.stats.Regression
    // clean line y = 3x + 2: every pairwise slope is 3
    val clean = (0 until 20).map(i => (i.toDouble, 3.0 * i + 2.0))
      .toDF("x", "y")
    val c = Regression.theilSen(clean, "x", "y").collect().head
    assert(c.getAs[Double]("slope") == 3.0 &&
      c.getAs[Double]("intercept") == 2.0)
    assert(c.getAs[Long]("n_pairs") == 190)
    // corrupt 25% of points with wild outliers: the median slope holds
    val dirty = (0 until 20).map { i =>
      val y = if (i % 4 == 0) 1e6 else 3.0 * i + 2.0
      (i.toDouble, y)
    }.toDF("x", "y")
    val d = Regression.theilSen(dirty, "x", "y").collect().head
    assert(math.abs(d.getAs[Double]("slope") - 3.0) < 0.5,
      s"robust slope must survive 25% corruption, got ${d.getAs[Double]("slope")}")
    // OLS, for contrast, is dragged far away by the same corruption
    val o = Regression.ols(dirty, "x", "y").get
    assert(math.abs(o.slope - 3.0) > 100)
    // all x equal: no defined pairs -> null slope
    val vert = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    val v = Regression.theilSen(vert, "x", "y").collect().head
    assert(v.getAs[Long]("n_pairs") == 0 &&
      v.isNullAt(v.fieldIndex("slope")))
    // loud cap
    val big = (0 until 50).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.theilSen(big, "x", "y", maxRows = 10)
    }
    assert(e.getMessage.contains("all-pairs-exact"))
  }

  test("survival summary: hand RMST integral, median, no-events horizon") {
    import graft.stats.Survival
    // curve: S(2)=0.8, S(5)=0.4 -> tau=6: 1*2 + 0.8*3 + 0.4*1 = 4.8
    val curve = Seq((2.0, 8L, 2L, 0L, 0.8), (5.0, 6L, 4L, 0L, 0.4))
      .toDF("t", "n_risk", "d_events", "n_censored", "survival")
    val r = Survival.survivalSummary(curve, tau = 6.0).collect().head
    assert(r.getAs[Double]("rmst") == 4.8)
    assert(r.getAs[Double]("median_survival") == 5.0)
    // tau before the first event: S = 1 throughout, RMST = tau
    val r2 = Survival.survivalSummary(curve, tau = 1.0).collect().head
    assert(r2.getAs[Double]("rmst") == 1.0)
    // curve never reaches 0.5: median is null, not a made-up number
    val high = Seq((2.0, 8L, 1L, 0L, 0.9)).toDF(
      "t", "n_risk", "d_events", "n_censored", "survival")
    val r3 = Survival.survivalSummary(high, tau = 6.0).collect().head
    assert(r3.isNullAt(r3.fieldIndex("median_survival")))
    assert(r3.getAs[Double]("rmst") == 2.0 + 0.9 * 4.0)
  }

  test("key/FD discovery: keys, null disqualification, null-rhs FD break") {
    import graft.stats.DataQuality
    val df = Seq(
      (1L, "a", Some("x"), 10),
      (2L, "b", Some("x"), 10),
      (3L, "c", None, 20),
      (4L, "c", Some("y"), 20))
      .toDF("id", "name", "opt", "grp")
    val keys = DataQuality.keyCandidates(df,
      Seq("id", "name", "opt", "grp")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_null"),
          r.getAs[Boolean]("is_key")))).toMap
    assert(keys("id") == ((4L, 0L, true)))
    assert(keys("name")._3 == false, "duplicate 'c' disqualifies name")
    assert(keys("opt") == ((2L, 1L, false)),
      "a null disqualifies even a distinct column")
    val fds = DataQuality.functionalDependencies(df,
      Seq("id", "name", "grp")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        r.getAs[Boolean]("holds")).toMap
    assert(fds(("id", "name")) && fds(("id", "grp")),
      "the key determines everything")
    assert(fds(("name", "grp")), "name -> grp holds (c maps only to 20)")
    assert(!fds(("grp", "name")), "grp 20 maps to two names")
    // null rhs breaks an FD: name 'c' maps grp... use opt as rhs
    val fds2 = DataQuality.functionalDependencies(df, Seq("name", "opt"))
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        r.getAs[Boolean]("holds")).toMap
    assert(!fds2(("name", "opt")),
      "'c' maps to {y, NULL} - two values, the FD must break")
  }

  test("log-rank: driver reference, identical groups ~ 0, separated groups large") {
    import graft.stats.Survival
    // two clearly separated hazard groups
    val fast = (1 to 20).map(i => ("a", (i % 5 + 1).toDouble, 1))
    val slow = (1 to 20).map(i => ("b", (i % 5 + 10).toDouble, 1))
    val df = (fast ++ slow).toDF("g", "t", "e")
    val r = Survival.logRank(df, col("g"), col("t"), col("e"))
      .collect().head
    assert(r.getAs[String]("group_a") == "a" && r.getAs[Long]("n_a") == 20)
    assert(r.getAs[Double]("chi2") > 20.0,
      s"disjoint hazards must give a huge statistic, got ${r.getAs[Double]("chi2")}")
    // driver reference on a small mixed case with censoring
    val rows = Seq(("a", 1.0, 1), ("a", 2.0, 0), ("a", 3.0, 1),
      ("b", 1.0, 1), ("b", 4.0, 1), ("b", 5.0, 0))
    val got = Survival.logRank(rows.toDF("g", "t", "e"), col("g"),
      col("t"), col("e")).collect().head
    def ref: (Double, Double) = {
      val times = rows.filter(_._3 == 1).map(_._2).distinct.sorted
      var (u, v, ex) = (0.0, 0.0, 0.0)
      times.foreach { t =>
        val atRisk = rows.filter(_._2 >= t)
        val n = atRisk.length.toDouble
        val na = atRisk.count(_._1 == "a").toDouble
        val d = rows.count(r => r._2 == t && r._3 == 1).toDouble
        val da = rows.count(r => r._1 == "a" && r._2 == t && r._3 == 1)
        val ea = d * na / n
        ex += ea; u += da - ea
        if (n > 1) v += d * (na / n) * ((n - na) / n) * (n - d) / (n - 1)
      }
      (ex, u * u / v)
    }
    val (refEx, refChi) = ref
    assert(math.abs(got.getAs[Double]("expected_a") - refEx) < 1e-5)
    assert(math.abs(got.getAs[Double]("chi2") - refChi) < 1e-4)
    // identical groups: statistic collapses toward 0
    val same = (1 to 30).map(i => ("a", (i % 6 + 1).toDouble, 1)) ++
      (1 to 30).map(i => ("b", (i % 6 + 1).toDouble, 1))
    val z = Survival.logRank(same.toDF("g", "t", "e"), col("g"),
      col("t"), col("e")).collect().head
    assert(z.getAs[Double]("chi2") < 1e-6)
    // three groups fail loudly
    val e3 = intercept[IllegalArgumentException] {
      Survival.logRank(
        Seq(("a", 1.0, 1), ("b", 1.0, 1), ("c", 1.0, 1)).toDF("g", "t", "e"),
        col("g"), col("t"), col("e"))
    }
    assert(e3.getMessage.contains("exactly two groups"))
    // zero total variance (everyone dies at one time): null chi2, not NaN
    val onetime = Seq(("a", 3.0, 1), ("a", 3.0, 1), ("b", 3.0, 1))
      .toDF("g", "t", "e")
    val zv = Survival.logRank(onetime, col("g"), col("t"), col("e"))
      .collect().head
    assert(zv.isNullAt(zv.fieldIndex("chi2")))
  }

  test("quantile normalization: identical group distributions, tie stability, shift removal") {
    import graft.transform.Standardize
    // group a: scores in [0, 9]; group b: same SHAPE shifted +100 —
    // after normalization both land on the pooled reference
    val rows = (0 until 10).map(i => ("a", i.toDouble)) ++
      (0 until 10).map(i => ("b", 100.0 + i))
    val out = Standardize.quantileNormalizeByGroup(
      rows.toDF("g", "v"), "g", "v").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("v"),
        r.getAs[Double]("normalized")))
    val byG = out.groupBy(_._1)
    val na = byG("a").map(_._3).sorted.toSeq
    val nb = byG("b").map(_._3).sorted.toSeq
    assert(na == nb, "equal-shape groups must normalize identically")
    // monotone within group
    byG.values.foreach { g =>
      val sortedByV = g.sortBy(_._2).map(_._3)
      assert(sortedByV.zip(sortedByV.tail).forall(p => p._1 <= p._2))
    }
    // normalized values come from the pooled multiset
    val pooledVals = rows.map(_._2).toSet
    assert(out.forall(r => pooledVals.contains(r._3)))
    // ties: identical inputs normalize identically (rank(), not row_number)
    val tied = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 5.0))
      .toDF("g", "v")
    val tOut = Standardize.quantileNormalizeByGroup(tied, "g", "v")
      .filter(col("g") === "a" && col("v") === 1.0)
      .select("normalized").as[Double].collect()
    assert(tOut.length == 2 && tOut.distinct.length == 1)
    // null values pass through with null normalized — never dropped
    val withNull = Seq(("a", Some(1.0)), ("a", None), ("b", Some(2.0)))
      .toDF("g", "v")
    val nOut = Standardize.quantileNormalizeByGroup(withNull, "g", "v")
    assert(nOut.count() == 3)
    val nRow = nOut.filter(col("v").isNull).collect()
    assert(nRow.length == 1 &&
      nRow.head.isNullAt(nRow.head.fieldIndex("normalized")))
  }

  test("conformal: rank formula, qhat order statistic, coverage guarantee") {
    import graft.stats.Conformal
    // rank: exact-decimal ceil, incl. the (n+1) % 10 == 0 drift cases
    assert(Conformal.rank(9, 0.1) == 9)   // 0.9*10 = 9 exactly, NOT 10
    assert(Conformal.rank(99, 0.1) == 90)
    assert(Conformal.rank(100, 0.1) == 91)
    assert(Conformal.rank(4, 0.05) == 5)  // 0.95*5 = 4.75 -> 5
    // qhat = the rank-th smallest residual, by hand
    val cal = Seq((0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (0.0, 4.0),
      (0.0, 5.0), (0.0, 6.0), (0.0, 7.0), (0.0, 8.0), (0.0, 9.0))
      .toDF("y", "yhat")
    val fr = Conformal.fit(cal, col("y"), col("yhat"), alpha = 0.1)
      .collect().head
    assert(fr.getAs[Long]("n_cal") == 9 && fr.getAs[Long]("q_rank") == 9)
    assert(fr.getAs[Double]("qhat") == 9.0)
    // unattainable coverage: rank > n -> null qhat
    val fr2 = Conformal.fit(cal.limit(3), col("y"), col("yhat"),
      alpha = 0.1).collect().head
    assert(fr2.getAs[Long]("q_rank") > 3 &&
      fr2.isNullAt(fr2.fieldIndex("qhat")))
    // coverage on exchangeable data honors 1 - alpha
    val n = 4000
    val data = (0 until n).map { i =>
      val noise = (((i * 2654435761L) % 1000) - 500).toDouble / 100.0
      (i.toLong, 50.0 + noise)
    }.toDF("id", "y").withColumn("yhat", lit(50.0))
    val calHalf = data.filter(col("id") % 2 === 0)
    val testHalf = data.filter(col("id") % 2 =!= 0)
    val q = Conformal.fit(calHalf, col("y"), col("yhat"), alpha = 0.2)
      .collect().head.getAs[Double]("qhat")
    val covRow = Conformal.coverage(testHalf, col("y"), col("yhat"), q)
      .collect().head
    val covg = covRow.getAs[Double]("coverage")
    assert(covg >= 0.78 && covg <= 0.88,
      s"coverage $covg should sit near 1-alpha = 0.8")
    // intervals: y within [lo, hi] iff residual <= qhat
    val iv = Conformal.intervals(testHalf, col("yhat"), Some(q))
      .filter(col("y") >= col("lo") && col("y") <= col("hi")).count()
    assert(iv == covRow.getAs[Long]("covered"))
  }

  test("mahalanobis: exact hand geometries, null pass-through, loud collinear") {
    import graft.stats.Mahalanobis
    // 4 corners of an axis-aligned box: population cov diag(1, 4),
    // precision diag(1, 0.25) -> every corner scores 1 + 1 = 2 exactly
    val box = Seq((1L, 0.0, 0.0), (2L, 2.0, 0.0), (3L, 0.0, 4.0),
      (4L, 2.0, 4.0)).toDF("id", "x", "y")
    val d2 = Mahalanobis.distances(box, Seq("x", "y"))
      .collect().map(_.getAs[Double]("md2")).toSeq
    assert(d2 == Seq(2.0, 2.0, 2.0, 2.0), s"$d2")
    // d = 3 exercises the Gauss-Jordan path: independent dims with
    // variances 1/4/9 -> every corner of the box scores exactly 3
    val cube = (for { x <- Seq(0.0, 2.0); y <- Seq(0.0, 4.0);
      z <- Seq(0.0, 6.0) } yield (x, y, z)).toDF("x", "y", "z")
    val d3 = Mahalanobis.distances(cube, Seq("x", "y", "z"))
      .collect().map(_.getAs[Double]("md2")).toSeq
    assert(d3.forall(_ == 3.0), s"$d3")
    // a null cell scores null and is excluded from the fit
    val withNull = box.unionByName(
      Seq((5L, Some(1.0), None: Option[Double])).toDF("id", "x", "y"))
    val dn = Mahalanobis.distances(withNull, Seq("x", "y")).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("md2"))).toMap
    assert(dn(5L).isEmpty && dn(1L).contains(2.0))
    // collinear columns have no geometry -> loud, not NaN
    val flat = Seq((0.0, 0.0), (1.0, 2.0), (2.0, 4.0), (3.0, 6.0))
      .toDF("x", "y")
    intercept[IllegalArgumentException] {
      Mahalanobis.distances(flat, Seq("x", "y"))
    }
  }

  test("association: exact copy gives V = U = 1; independence gives ~0") {
    import graft.stats.Contingency
    val copy = Seq("x", "x", "x", "y", "y").map(v => (v, v)).toDF("a", "b")
    val r = Contingency.association(copy, "a", "b").collect().head
    assert(r.getAs[Double]("cramers_v") == 1.0)
    assert(r.getAs[Double]("u_a_given_b") == 1.0 &&
      r.getAs[Double]("u_b_given_a") == 1.0)
    // perfectly independent 2x2 (every cell equal): V and U exactly 0
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q") }
      yield (a, b)).toDF("a", "b")
    val ri = Contingency.association(indep, "a", "b").collect().head
    assert(ri.getAs[Double]("cramers_v") == 0.0)
    assert(ri.getAs[Double]("u_a_given_b") == 0.0)
    // single-level side: normalizations undefined -> null, not NaN
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val rf = Contingency.association(flat, "a", "b").collect().head
    assert(rf.isNullAt(rf.fieldIndex("cramers_v")))
    assert(rf.isNullAt(rf.fieldIndex("u_a_given_b")),
      "zero entropy on a must null U(a|b)")
  }

  test("benjamini-hochberg: hand step-up, ties share q, distributed == driver") {
    import graft.stats.MultipleTesting
    // classic step-up: q1 is pulled DOWN to q2's level (0.0225 < raw1)
    val q = MultipleTesting.qValues(Seq(0.005, 0.009, 0.05, 0.1, 0.5))
    assert(q == Seq(0.0225, 0.0225, 0.083333333, 0.125, 0.5), s"$q")
    // tied p's share one q regardless of internal rank order
    assert(MultipleTesting.qValues(Seq(0.02, 0.02, 0.5)) ==
      Seq(0.03, 0.03, 0.5))
    // distributed path agrees with the driver fold on every row
    val df = (1 to 500).map { i =>
      (i.toLong, BigDecimal((i * 2654435761L % 1000) / 999.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("id", "p")
    val got = MultipleTesting.benjaminiHochberg(df, "p", "id")
      .orderBy("id").collect().map(_.getAs[Double]("q_value")).toSeq
    val want = {
      val rows = df.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      MultipleTesting.qValues(rows.map(_._2).toSeq)
    }
    assert(got == want)
    // null p passes through with null q; out-of-range p is loud
    val withNull = Seq((1L, Some(0.5)), (2L, None)).toDF("id", "p")
    val nr = MultipleTesting.benjaminiHochberg(withNull, "p", "id")
      .orderBy("id").collect()
    assert(!nr(0).isNullAt(2) && nr(1).isNullAt(2))
    intercept[IllegalArgumentException] {
      MultipleTesting.benjaminiHochberg(
        Seq((1L, 1.5)).toDF("id", "p"), "p", "id")
    }
  }

  test("mann-whitney: hand U with ties, independent pair count, loud edges") {
    import graft.stats.RankTests
    // A=[1,2,3] B=[2,3,4]: U_A = 2 (one win + two half-ties), U_B = 7
    val ab = Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 2.0), (false, 3.0), (false, 4.0)).toDF("arm", "v")
    val r = RankTests.mannWhitneyU(ab, col("arm"), col("v")).head()
    assert(r.getAs[Double]("u_a") == 2.0 && r.getAs[Double]("u_b") == 7.0)
    // tie-corrected sigma^2 = 9/12 * (7 - 12/30) = 4.95; z = -2/sqrt
    val zWant = BigDecimal(-2.0 / math.sqrt(4.95))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == zWant,
      s"z=${r.getAs[Double]("z")} want $zWant")
    // independent check on a random-ish sample: brute-force pair count
    val xs = (1 to 60).map(i => (i % 3 != 0, ((i * 7) % 13).toDouble))
    val big = xs.toDF("arm", "v")
    val rb = RankTests.mannWhitneyU(big, col("arm"), col("v")).head()
    val brute = (for {
      (true, a) <- xs; (false, b) <- xs
    } yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    assert(rb.getAs[Double]("u_a") == brute,
      s"u_a=${rb.getAs[Double]("u_a")} brute=$brute")
    // empty arm and all-tied inputs fail loudly
    intercept[IllegalArgumentException] {
      RankTests.mannWhitneyU(
        Seq((true, 1.0), (true, 2.0)).toDF("arm", "v"),
        col("arm"), col("v"))
    }
    intercept[IllegalArgumentException] {
      RankTests.mannWhitneyU(
        Seq((true, 5.0), (false, 5.0)).toDF("arm", "v"),
        col("arm"), col("v"))
    }
  }

  test("wilcoxon signed-rank: hand ranks with ties, zero drop, loud edges") {
    import graft.stats.RankTests
    // d = [1,-2,3,-4,5], no ties: W+ = 1+3+5 = 9, sigma^2 = 5*6*11/24
    val a = Seq((1.0, 0.0), (0.0, 2.0), (3.0, 0.0), (0.0, 4.0), (5.0, 0.0))
      .toDF("x", "y")
    val r = RankTests.wilcoxonSignedRank(a, col("x"), col("y")).head()
    assert(r.getAs[Long]("n_nonzero") == 5L &&
      r.getAs[Double]("w_plus") == 9.0 && r.getAs[Double]("w_minus") == 6.0)
    val zWant = BigDecimal(1.0 / math.sqrt(13.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == zWant,
      s"z=${r.getAs[Double]("z")} want $zWant")
    // ties: d = [1,-1,2,2,-3] -> avg ranks 1.5/3.5/5, W+ = 8.5;
    // tie3 = 6+6, sigma^2 = 13.75 - 12/48 = 13.5; zeros are dropped
    val t = Seq((1.0, 0.0), (0.0, 1.0), (2.0, 0.0), (2.0, 0.0),
      (0.0, 3.0), (7.0, 7.0)).toDF("x", "y")
    val rt = RankTests.wilcoxonSignedRank(t, col("x"), col("y")).head()
    assert(rt.getAs[Long]("n_nonzero") == 5L &&
      rt.getAs[Double]("w_plus") == 8.5 &&
      rt.getAs[Double]("w_minus") == 6.5)
    val zTie = BigDecimal(0.5 / math.sqrt(13.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rt.getAs[Double]("z") == zTie)
    // all differences zero -> loud
    intercept[IllegalArgumentException] {
      RankTests.wilcoxonSignedRank(
        Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y"), col("x"), col("y"))
    }
  }

  test("cliff's delta and hodges-lehmann: hand pair geometry, loud cap") {
    import graft.stats.RankTests
    // A=[1,2,3] B=[2,3,4]: U_A = 2 -> delta = 4/9 - 1 = -0.555556, large
    val ab = Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 2.0), (false, 3.0), (false, 4.0)).toDF("arm", "v")
    val d = RankTests.cliffsDelta(ab, col("arm"), col("v")).head()
    assert(d.getAs[Double]("delta") == -0.555556 &&
      d.getAs[String]("magnitude") == "large", s"$d")
    // HL on the same arms: 9 diffs sorted [-3,-2,-2,-1,-1,-1,0,0,1],
    // T=9 odd -> median -1; 5 distinct difference cells
    val h = RankTests.hodgesLehmannShift(ab, col("arm"), col("v")).head()
    assert(h.getAs[Long]("n_a") == 3L && h.getAs[Long]("n_b") == 3L &&
      h.getAs[Long]("n_diff_cells") == 5L &&
      h.getAs[Double]("hl_shift") == -1.0, s"$h")
    // even pair total: A=[1,3] B=[2] -> diffs [-1,1], median (lo+hi)/2 = 0
    val ev = Seq((true, 1.0), (true, 3.0), (false, 2.0)).toDF("arm", "v")
    val he = RankTests.hodgesLehmannShift(ev, col("arm"), col("v")).head()
    assert(he.getAs[Double]("hl_shift") == 0.0, s"$he")
    // distinct-value cross above the cap fails loudly with the remedy
    val ex = intercept[IllegalArgumentException] {
      RankTests.hodgesLehmannShift(ab, col("arm"), col("v"), maxCells = 4L)
    }
    assert(ex.getMessage.contains("quantize"), ex.getMessage)
  }

  test("cochran-armitage, g-test, bartlett: hand tables and loud guards") {
    import graft.stats.{Anova, Contingency}
    // CA on a perfect dose-response: (n,a) = (10,1)/(10,5)/(10,9) at
    // scores 0/1/2: num = 23 - 15 = 8, den^2 = 0.25*(50-30) = 5
    val ca = ((1 to 10).map(i => (i <= 1, 0L)) ++
      (1 to 10).map(i => (i <= 5, 1L)) ++
      (1 to 10).map(i => (i <= 9, 2L))).toDF("f", "s")
    val r = Contingency.cochranArmitage(ca, col("f"), col("s")).head()
    val zWant = BigDecimal(8.0 / math.sqrt(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("k_levels") == 3L && r.getAs[Long]("n_pos") == 15L
      && r.getAs[Double]("z") == zWant, s"$r")
    assert(r.getAs[Double]("p_value") < 0.001)
    intercept[IllegalArgumentException] { // constant score -> loud
      Contingency.cochranArmitage(
        Seq((true, 1L), (false, 1L)).toDF("f", "s"), col("f"), col("s"))
    }
    // G-test on [[10,20],[30,40]]: terms replayed with the round-9 fold
    val g2 = (Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v"))).toDF("a", "b")
    val gr = Contingency.gTest(g2, "a", "b").head()
    def t9(o: Double, e: Double) = BigDecimal(o * math.log(o / e))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val gWant = BigDecimal(2.0 * (t9(10, 30.0 * 40 / 100) +
      t9(20, 30.0 * 60 / 100) + t9(30, 70.0 * 40 / 100) +
      t9(40, 70.0 * 60 / 100)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gr.getAs[Double]("g") == gWant, s"g=${gr.getAs[Double]("g")}")
    assert(gr.getAs[Double]("g_williams") < gr.getAs[Double]("g") &&
      gr.getAs[Long]("dof") == 1L)
    // Bartlett on [1..4] vs 2*[1..4]: ssw = 25, dfw = 6, C = 1 + 1/6
    val ba = ((1 to 4).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", 2.0 * i))).toDF("g", "y")
    val br = Anova.bartlett(ba, "g", "y").head()
    val tWant = (6.0 * math.log(25.0 / 6) -
      3.0 * (math.log(5.0 / 3) + math.log(20.0 / 3))) / (1.0 + 0.5 / 3)
    assert(math.abs(br.getAs[Double]("t_stat") - tWant) < 1e-5, s"$br")
    assert(br.getAs[Double]("c_factor") ==
      BigDecimal(1.0 + 0.5 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    intercept[IllegalArgumentException] { // zero-variance group -> loud
      Anova.bartlett(
        Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("g", "y"),
        "g", "y")
    }
  }

  test("box-cox scan, vif3, influence: hand geometry and loud guards") {
    import graft.stats.Regression
    import graft.transform.Standardize
    // geometric data is exactly log-normal-shaped: lambda = 0 must win
    val geo = (Seq.fill(5)(1.0) ++ Seq.fill(5)(math.exp(1)) ++
      Seq.fill(5)(math.exp(2))).map(Tuple1(_)).toDF("x")
    val bc = Standardize.boxCoxScan(geo, "x").collect()
    assert(bc.length == 7 &&
      bc.filter(_.getAs[Boolean]("is_best"))
        .head.getAs[Double]("lambda") == 0.0, bc.mkString(";"))
    intercept[IllegalArgumentException] { // zero input -> loud
      Standardize.boxCoxScan(Seq(Tuple1(0.0), Tuple1(1.0)).toDF("x"), "x")
    }
    // hand correlations: r12 = r23 = 0, r13 = -0.4472 -> det = 0.8,
    // VIF = (1.25, 1.0, 1.25)
    val vd = Seq((1.0, 1.0, 1.0), (2.0, -1.0, -1.0), (3.0, -1.0, 1.0),
      (4.0, 1.0, -1.0)).toDF("a", "b", "c")
    val v = Regression.vif3(vd, Seq("a", "b", "c")).collect()
      .map(r => r.getAs[String]("feature") -> r.getAs[Double]("vif")).toMap
    assert(v("a") == 1.25 && v("b") == 1.0 && v("c") == 1.25, s"$v")
    intercept[IllegalArgumentException] { // collinear -> singular, loud
      Regression.vif3(
        Seq((1.0, 1.0, 2.0), (2.0, -1.0, 4.0), (3.0, -1.0, 6.0),
          (4.0, 1.0, 8.0)).toDF("a", "b", "c"), Seq("a", "b", "c"))
    }
    // influence: a clean line plus one gross outlier - the outlier must
    // rank first and extreme x carries the highest leverage
    val pts = (1 to 9).map(i => (i.toLong, i.toDouble, 2.0 * i)) :+
      (99L, 5.0, 60.0)
    val inf = Regression.influenceTopK(pts.toDF("id", "x", "y"),
      "id", "x", "y", topK = 3).collect()
    assert(inf.head.getAs[Long]("id") == 99L, inf.mkString(";"))
    assert(inf.head.getAs[Double]("cooks_d") >
      inf(1).getAs[Double]("cooks_d"))
    intercept[IllegalArgumentException] { // perfect fit -> loud
      Regression.influenceTopK(
        (1 to 5).map(i => (i.toLong, i.toDouble, 2.0 * i))
          .toDF("id", "x", "y"), "id", "x", "y")
    }
    // leverage exactly 1 (x = [0,0,0,1] passes n>=4 and s2>0): Cook's D
    // divides by (1-h)^2 — must fail loudly, not float an Infinity to
    // the top of the cut
    val lev1 = intercept[IllegalArgumentException] {
      Regression.influenceTopK(
        Seq((1L, 0.0, 1.0), (2L, 0.0, 2.0), (3L, 0.0, 3.0),
          (4L, 1.0, 9.0)).toDF("id", "x", "y"), "id", "x", "y")
    }
    assert(lev1.getMessage.contains("leverage 1"), lev1.getMessage)
  }

  test("levene: hand mean-centered F, agrees with one-way on |z|") {
    import graft.stats.Anova
    // groups [1..4] and 2*[1..4]: |z| means 1 and 2 -> F = 2 / (5/6)
    val df = ((1 to 4).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", 2.0 * i))).toDF("g", "y")
    val r = Anova.levene(df, "g", "y").get
    assert(math.abs(r.fStat - 2.4) < 1e-9, s"F=${r.fStat}")
    assert(r.dfBetween == 1L && r.dfWithin == 6L)
    // ordering invariant vs Brown-Forsythe on a symmetric fixture:
    // same centers (mean == median) -> identical statistic
    val bf = Anova.brownForsythe(df, "g", "y").get
    assert(math.abs(r.fStat - bf.fStat) < 1e-9)
  }

  test("lin's ccc: shift penalized, identity perfect, keyness hand G") {
    import graft.stats.Correlation
    // y = x + 1: r = 1 but CCC = 2*(2/3) / (2/3 + 2/3 + 1) = 4/7
    val sh = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val r = Correlation.linsCCC(sh, col("x"), col("y")).head()
    assert(r.getAs[Double]("pearson_r") == 1.0 &&
      r.getAs[Double]("ccc") == BigDecimal(4.0 / 7)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    // identity agrees perfectly
    val id = Seq((1.0, 1.0), (2.0, 2.0), (5.0, 5.0)).toDF("x", "y")
    assert(Correlation.linsCCC(id, col("x"), col("y")).head()
      .getAs[Double]("ccc") == 1.0)
    intercept[IllegalArgumentException] { // constant series -> loud
      Correlation.linsCCC(
        Seq((1.0, 1.0), (1.0, 2.0)).toDF("x", "y"), col("x"), col("y"))
    }
    // keyness: A = "x x x y", B = "y y y x" -> symmetric G, x keyed to
    // a and y to b; tie broken by term asc
    val a = Seq(Tuple1("x x x y")).toDF("text")
    val b = Seq(Tuple1("y y y x")).toDF("text")
    val k = graft.ops.CorpusOverlap.keynessTopK(a, "text", b, "text",
      topK = 2, minCount = 2L).collect()
    val gWant = BigDecimal(2.0 * (3.0 * math.log(3.0 / 2) +
      1.0 * math.log(1.0 / 2)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(k.length == 2 && k(0).getAs[String]("term") == "x" &&
      k(0).getAs[String]("direction") == "a" &&
      k(0).getAs[Double]("g_score") == gWant &&
      k(1).getAs[String]("term") == "y" &&
      k(1).getAs[String]("direction") == "b", k.mkString(";"))
  }

  test("welch t-tests: match commons-math3 on unequal-variance groups") {
    import graft.stats.Anova
    val a = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val b = Array(10.0, 30.0, 50.0, 20.0, 40.0, 60.0)
    val df = (a.map(("g1", _)) ++ b.map(("g2", _))).toSeq.toDF("g", "y")
    val r = Anova.welchTTests(df, "g", "y").head
    val tester = new org.apache.commons.math3.stat.inference.TTest()
    // commons-math3's two-sample t/tTest ARE the Welch statistics
    assert(math.abs(r.tStat - tester.t(a, b)) < 1e-12,
      s"t=${r.tStat} vs ${tester.t(a, b)}")
    assert(math.abs(r.pValue - tester.tTest(a, b)) < 1e-12)
    // Welch dof must sit strictly below the pooled n1+n2-2 here
    assert(r.dof < 9.0 && r.dof > 5.0, s"dof=${r.dof}")
  }

  test("brown-forsythe: spread difference detected, equal spreads are not") {
    import graft.stats.Anova
    // same medians, wildly different spreads -> significant W
    val uneq = ((1 to 40).map(i => ("tight", 100.0 + (i % 5))) ++
      (1 to 40).map(i => ("wide", 100.0 + (i % 5) * 60))).toDF("g", "y")
    val w = Anova.brownForsythe(uneq, "g", "y").get
    assert(w.pValue < 1e-6, s"planted heteroscedasticity missed: $w")
    // identical distributions -> W ~ 0
    val eq = ((1 to 40).map(i => ("a", (i % 7).toDouble)) ++
      (1 to 40).map(i => ("b", (i % 7).toDouble))).toDF("g", "y")
    val we = Anova.brownForsythe(eq, "g", "y").get
    assert(we.fStat < 1e-9 && we.pValue > 0.99, s"$we")
  }

  test("mde: hand two-proportion power formula, loud degenerate inputs") {
    import graft.stats.Experiment
    // 100 vs 100 units at a pooled 50% baseline:
    // mde = (z_.975 + z_.8) * sqrt(.25 * .02)
    val units = (1 to 200).map(i => (i <= 100, i % 2 == 0)).toDF("arm", "conv")
    val r = Experiment.minimumDetectableEffect(units,
      col("arm"), col("conv")).head()
    val want = (Experiment.zQuantile(0.975) + Experiment.zQuantile(0.8)) *
      math.sqrt(0.25 * 0.02)
    // emitted values are rounded to 9 dp, so allow the half-grid slack
    assert(math.abs(r.getAs[Double]("mde_abs") - want) < 1e-8,
      s"${r.getAs[Double]("mde_abs")} vs $want")
    assert(math.abs(r.getAs[Double]("mde_rel") -
      r.getAs[Double]("mde_abs") / 0.5) < 1e-8)
    // zero baseline: absolute MDE still defined, relative is null
    val cold = (1 to 200).map(i => (i <= 100, false)).toDF("arm", "conv")
    val rc = Experiment.minimumDetectableEffect(cold,
      col("arm"), col("conv")).head()
    assert(rc.getAs[Double]("mde_abs") == 0.0 &&
      rc.isNullAt(rc.fieldIndex("mde_rel")))
    intercept[IllegalArgumentException] {
      Experiment.minimumDetectableEffect(units, col("arm"), col("conv"),
        alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Experiment.minimumDetectableEffect(
        units.filter(col("arm")), col("arm"), col("conv"))
    }
  }

  test("did: hand-computed 2x2, null evidence excluded, loud thin cell") {
    import graft.stats.Experiment
    // control pre [1,2] post [2,3]; treat pre [1,3] post [5,7]:
    // effect = (6-2) - (2.5-1.5) = 3; vars c0=c1=0.5, t0=t1=2;
    // se = sqrt(2/2 + 2/2 + 0.5/2 + 0.5/2) = sqrt(2.5)
    val rows = Seq(
      (false, false, 1.0), (false, false, 2.0),
      (false, true, 2.0), (false, true, 3.0),
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 5.0), (true, true, 7.0)
    ).toDF("treat", "post", "y")
    val r = Experiment.differenceInDifferences(rows,
      col("treat"), col("post"), col("y")).collect().head
    assert(r.getAs[Double]("did_effect") == 3.0)
    assert(r.getAs[Double]("mean_treat_post") == 6.0 &&
      r.getAs[Double]("mean_control_pre") == 1.5)
    val se = math.rint(math.sqrt(2.5) * 1e8) / 1e8
    assert(r.getAs[Double]("se") == se)
    assert(r.getAs[Double]("t_stat") ==
      math.rint(3.0 / math.sqrt(2.5) * 1e8) / 1e8)
    // a cell with fewer than 2 units has no variance -> loud
    val thin = Seq((false, false, 1.0), (false, false, 2.0),
      (false, true, 2.0), (false, true, 3.0),
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 5.0)).toDF("treat", "post", "y")
    val err = intercept[IllegalArgumentException] {
      Experiment.differenceInDifferences(thin,
        col("treat"), col("post"), col("y"))
    }
    assert(err.getMessage.contains("t1"))
  }

  test("cuped: recovers theta, cuts the SE on a correlated covariate, no-ops on noise") {
    import graft.stats.Experiment
    // y = 2x + unit noise; x varies across units -> theta ~ 2, big SE cut
    def mkUnits(corr: Boolean) = (0 until 2000).map { i =>
      val arm = if (i % 2 == 0) "treatment" else "control"
      val x = (i % 50).toDouble
      val noise = ((i * 2654435761L) % 97).toDouble / 97.0
      val y = if (corr) 2.0 * x + noise else noise
      (arm, x, y)
    }.toDF("arm", "x", "y")
    val r = Experiment.cuped(mkUnits(corr = true)).collect().head
    assert(math.abs(r.getAs[Double]("theta") - 2.0) < 0.01,
      s"theta=${r.getAs[Double]("theta")}")
    assert(r.getAs[Double]("se_adj") < r.getAs[Double]("se_raw") * 0.1,
      "a dominant covariate must slash the SE")
    assert(r.getAs[Double]("var_reduction") > 0.9)
    // driver reference for the adjusted diff
    val rows = (0 until 2000).map { i =>
      val x = (i % 50).toDouble
      val noise = ((i * 2654435761L) % 97).toDouble / 97.0
      (if (i % 2 == 0) "treatment" else "control", x, 2.0 * x + noise)
    }
    val n = rows.length.toDouble
    val (sx, sy) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val sxy = rows.map(t => t._2 * t._3).sum
    val sxx = rows.map(t => t._2 * t._2).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val mt = rows.filter(_._1 == "treatment")
    val mc = rows.filter(_._1 == "control")
    val refAdj = (mt.map(_._3).sum / mt.length - mc.map(_._3).sum / mc.length) -
      theta * (mt.map(_._2).sum / mt.length - mc.map(_._2).sum / mc.length)
    assert(math.abs(r.getAs[Double]("diff_adj") - refAdj) < 1e-5)
    // uncorrelated covariate: theta ~ 0, adjustment leaves SE ~ unchanged
    val r2 = Experiment.cuped(mkUnits(corr = false)).collect().head
    assert(math.abs(r2.getAs[Double]("theta")) < 0.01)
    assert(r2.getAs[Double]("se_adj") <= r2.getAs[Double]("se_raw") + 1e-9)
    assert(math.abs(r2.getAs[Double]("var_reduction")) < 0.05)
    // constant pre-period covariate (new metric): theta falls back to 0,
    // never a NaN cascade
    val flat = (0 until 100).map(i =>
      (if (i % 2 == 0) "treatment" else "control", 0.0,
        (i % 7).toDouble)).toDF("arm", "x", "y")
    val r3 = Experiment.cuped(flat).collect().head
    assert(r3.getAs[Double]("theta") == 0.0)
    assert(!r3.getAs[Double]("se_adj").isNaN &&
      r3.getAs[Double]("se_adj") == r3.getAs[Double]("se_raw"))
  }

  test("unitMetrics splits pre/post and assigns arms deterministically") {
    import graft.stats.Experiment
    val ev = Seq(
      (1L, "2024-01-10 00:00:00", 5.0),
      (1L, "2024-01-20 00:00:00", 7.0),
      (2L, "2024-01-05 00:00:00", 3.0), // pre only -> y = 0
      (3L, "2024-01-25 00:00:00", 9.0)) // post only -> x = 0
      .toDF("user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val u = Experiment.unitMetrics(ev, "user_id", "ts", "value",
      "2024-01-16 00:00:00", "s").collect()
      .map(r => r.getAs[Long]("unit") ->
        ((r.getAs[Double]("x"), r.getAs[Double]("y"),
          r.getAs[String]("arm")))).toMap
    assert(u(1L)._1 == 5.0 && u(1L)._2 == 7.0)
    assert(u(2L) == ((3.0, 0.0, u(2L)._3)))
    assert(u(3L) == ((0.0, 9.0, u(3L)._3)))
    assert(u.values.map(_._3).forall(Set("treatment", "control")))
    // repartitioned input assigns identically
    val u2 = Experiment.unitMetrics(ev.repartition(7), "user_id", "ts",
      "value", "2024-01-16 00:00:00", "s").collect()
      .map(r => r.getAs[Long]("unit") -> r.getAs[String]("arm")).toMap
    assert(u.view.mapValues(_._3).toMap == u2)
  }

  test("isotonic PAV equals the independent minimax formula; edge shapes") {
    import graft.stats.Isotonic
    val rnd = new scala.util.Random(42)
    // weighted random levels, labels in [0,1]
    val rows = (0 until 60).flatMap { lvl =>
      val reps = 1 + rnd.nextInt(4)
      (0 until reps).map(_ => (lvl.toDouble, rnd.nextInt(2).toDouble))
    }
    val model = Isotonic.fit(rows.toDF("s", "y"), col("s"), col("y"))
    // independent reference: fitted_i = max_{j<=i} min_{k>=i} avg(j..k)
    val levels = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(_._2).sum)
    }
    val l = levels.length
    val ref = (0 until l).map { i =>
      (0 to i).map { j =>
        (i until l).map { k =>
          val seg = levels.slice(j, k + 1)
          seg.map(_._3).sum / seg.map(_._2).sum
        }.min
      }.max
    }
    model.fitted.zip(ref).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-12, s"level $i: $got != $want")
    }
    assert(model.fitted.zip(model.fitted.tail).forall(p => p._1 <= p._2))
  }

  test("isotonic calibration: monotone recovery, step lookup, anti-monotone pooling") {
    import graft.stats.Isotonic
    // perfectly monotone data: fitted == level means
    val mono = (0 until 5).flatMap(lvl =>
      Seq.fill(10)((lvl.toDouble, lvl / 4.0)))
    val m1 = Isotonic.fit(mono.toDF("s", "y"), col("s"), col("y"))
    assert(m1.fitted.toSeq == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // anti-monotone data pools to the global mean
    val anti = (0 until 5).flatMap(lvl =>
      Seq.fill(10)((lvl.toDouble, (4 - lvl) / 4.0)))
    val m2 = Isotonic.fit(anti.toDF("s", "y"), col("s"), col("y"))
    assert(m2.fitted.forall(_ == 0.5))
    // step lookup: below range, between levels, above range, seen level
    assert(m1.at(-3.0) == 0.0 && m1.at(1.5) == 0.25 &&
      m1.at(99.0) == 1.0 && m1.at(2.0) == 0.5)
    val probes = Seq(-3.0, 1.5, 2.0, 99.0).toDF("x")
    val stepped = Isotonic.calibrateStep(probes, col("x"), m1)
      .orderBy("x").select("calibrated").as[Double].collect().toSeq
    assert(stepped == Seq(0.0, 0.25, 0.5, 1.0))
    // exact-level broadcast join parity, with an unseen score -> null
    val cal = Isotonic.calibrate(Seq(2.0, 7.0).toDF("x"), col("x"), m1)
      .orderBy("x").collect()
    assert(cal(0).getAs[Double]("calibrated") == 0.5)
    assert(cal(1).isNullAt(cal(1).fieldIndex("calibrated")))
    // loud level cap
    val wide = (0 until 30).map(i => (i.toDouble, 1.0)).toDF("s", "y")
    val e = intercept[IllegalArgumentException] {
      Isotonic.fit(wide, col("s"), col("y"), maxLevels = 10)
    }
    assert(e.getMessage.contains("round the score"))
  }

  test("bootstrap ci brackets the mean and narrows with sample size") {
    import graft.stats.Bootstrap
    def ciWidth(n: Int): Double = {
      val df = (0 until n).map(i => (i.toLong, (i % 100).toDouble))
        .toDF("id", "x")
      val r = Bootstrap.ci(df, Seq("id"), col("x"), 100, "t").collect().head
      val (m, lo, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= m && m <= hi, s"CI [$lo,$hi] misses mean $m at n=$n")
      hi - lo
    }
    val (wide, narrow) = (ciWidth(200), ciWidth(3200))
    assert(narrow < wide,
      s"CI width must shrink with n: $narrow !< $wide")
  }

  test("kruskal-wallis: hand values, tie correction, degenerate guards") {
    import graft.stats.RankTests
    // no ties: groups {1,2,3},{4,5,6},{7,8,9} -> ranks 1..9,
    // H = 12/90 * (36/3 + 225/3 + 576/3) - 30 = 7.2, correction = 1
    val clean = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 4.0),
      ("y", 5.0), ("y", 6.0), ("z", 7.0), ("z", 8.0), ("z", 9.0))
      .toDF("g", "v")
    val rc = RankTests.kruskalWallis(clean, col("g"), col("v")).head()
    assert(rc.getAs[Long]("k_groups") == 3 && rc.getAs[Long]("n_total") == 9)
    assert(rc.getAs[Double]("h") == 7.2, s"h=${rc.getAs[Double]("h")}")
    assert(rc.getAs[Double]("h_tied") == 7.2)
    // ties: a={1,1,2}, b={2,3,3} -> avg ranks 1.5/3.5/5.5,
    // Ra=6.5, Rb=14.5, H=12/42*(6.5^2/3+14.5^2/3)-21=3.047619,
    // C = 1 - 18/210, H/C = 10/3
    val tied = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 2.0),
      ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val rt = RankTests.kruskalWallis(tied, col("g"), col("v")).head()
    assert(rt.getAs[Double]("h") == 3.047619, s"h=${rt.getAs[Double]("h")}")
    assert(rt.getAs[Double]("h_tied") == 3.333333,
      s"h_tied=${rt.getAs[Double]("h_tied")}")
    // two groups: H must equal the (uncorrected-z) Mann-Whitney z^2
    // geometry — verify the rank sums via the known relation
    // H = z_nocc^2 for k=2 (z without continuity correction)
    val two = Seq(("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 2.0),
      ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val h2 = RankTests.kruskalWallis(two, col("g"), col("v")).head()
      .getAs[Double]("h")
    // brute: ranks a={1,3,5} sum 9, b={2,4,6,7} sum 19; n=7
    // H = 12/56*(81/3+361/4)-24
    val want = BigDecimal(12.0 / 56.0 * (81.0 / 3 + 361.0 / 4) - 24.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h2 == want, s"h=$h2 want $want")
    // null group/value rows are excluded, not crashed on
    val withNulls = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (None, Some(2.0)), (Some("b"), Some(3.0)), (Some("b"), Some(4.0)))
      .toDF("g", "v")
    val rn = RankTests.kruskalWallis(withNulls, col("g"), col("v")).head()
    assert(rn.getAs[Long]("n_total") == 3)
    intercept[IllegalArgumentException] { // one group
      RankTests.kruskalWallis(
        Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), col("g"), col("v"))
    }
    intercept[IllegalArgumentException] { // all tied
      RankTests.kruskalWallis(
        Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v"), col("g"), col("v"))
    }
  }

  test("feature screen: leakage scores 1, independence scores 0, nulls") {
    import graft.stats.FeatureScreen
    val indep = (0 until 64).map { i =>
      val label = i % 2 == 0
      (label,
        if (label) "yes" else "no", // copy of the label -> U = 1
        s"k${(i / 2) % 2}", // every (label, ind) cell = 16 -> MI = 0
        if (i < 32) Some(s"h${i % 2}") else None) // half nulls
    }.toDF("y", "copy", "ind", "halfnull")
    val out = FeatureScreen.screen(indep, "y",
      Seq("copy", "ind", "halfnull"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("copy").getAs[Double]("u_label") == 1.0)
    assert(out("copy").getAs[Double]("mi") ==
      out("copy").getAs[Double]("h_label"))
    assert(out("ind").getAs[Double]("mi") == 0.0,
      s"balanced independent feature must carry zero MI, " +
        s"got ${out("ind").getAs[Double]("mi")}")
    // per-feature null exclusion: halfnull screens on its 32-row slice
    assert(out("halfnull").getAs[Long]("n") == 32L)
    assert(out("copy").getAs[Long]("n") == 64L)
    // output is feature-ordered and label can't be screened against itself
    val names = FeatureScreen.screen(indep, "y", Seq("ind", "copy"))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("copy", "ind"))
    intercept[IllegalArgumentException] {
      FeatureScreen.screen(indep, "y", Seq("y", "copy"))
    }
  }

  test("welch anova: k=2 reduces to squared welch t, guards") {
    import graft.stats.Anova
    val a = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val b = Array(10.0, 30.0, 50.0, 20.0, 40.0, 60.0)
    val df = (a.map(("g1", _)) ++ b.map(("g2", _))).toSeq.toDF("g", "y")
    val w = Anova.welchAnova(df, "g", "y").get
    val t = Anova.welchTTests(df, "g", "y").head
    // the textbook identity: Welch F at k=2 IS the Welch t squared,
    // with df2 equal to the Welch-Satterthwaite dof
    assert(math.abs(w.fStat - t.tStat * t.tStat) < 1e-9,
      s"F=${w.fStat} vs t^2=${t.tStat * t.tStat}")
    assert(math.abs(w.df2 - t.dof) < 1e-9, s"df2=${w.df2} vs ${t.dof}")
    assert(math.abs(w.pValue - t.pValue) < 1e-9)
    assert(w.df1 == 1 && w.k == 2 && w.n == 11)
    // a third group shifts the weighted grand mean and k terms
    val three = df.union(Seq(("g3", 100.0), ("g3", 105.0), ("g3", 110.0))
      .toDF("g", "y"))
    val w3 = Anova.welchAnova(three, "g", "y").get
    assert(w3.k == 3 && w3.fStat > 0)
    // zero-variance group and single group are refused
    assert(Anova.welchAnova(
      df.union(Seq(("g3", 7.0), ("g3", 7.0)).toDF("g", "y")),
      "g", "y").isEmpty)
    assert(Anova.welchAnova(
      a.map(("g1", _)).toSeq.toDF("g", "y"), "g", "y").isEmpty)
  }

  test("cmh: simpson's paradox nulls out, single stratum matches chi2") {
    import graft.stats.Contingency
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    // each stratum EXACTLY independent (a = r1*c1/n), but marginally
    // the pooled table shows a strong association — CMH must null it
    val paradox = (stratum("hi", 16, 4, 4, 1) ++
      stratum("lo", 1, 4, 4, 16)).toDF("s", "fa", "fb")
    val rp = Contingency.cmh(paradox, col("s"), col("fa"), col("fb"))
      .head()
    assert(rp.getAs[Double]("chi2_cmh") == 0.0)
    assert(rp.getAs[Double]("or_mh") == 1.0)
    assert(rp.getAs[Double]("p_value") == 1.0)
    assert(rp.getAs[Long]("k_strata") == 2 &&
      rp.getAs[Long]("n_total") == 50)
    // one stratum: CMH = chi2 * (n-1)/n (the hypergeometric variance
    // uses n-1 where Pearson uses n)
    val one = stratum("only", 12, 5, 3, 10).toDF("s", "fa", "fb")
    val rc = Contingency.cmh(one, col("s"), col("fa"), col("fb")).head()
    val chi = Contingency.chiSquare(
      one.withColumnRenamed("fa", "x"), "x", "fb").get
    val want = chi.chi2 * (chi.n - 1) / chi.n
    assert(math.abs(rc.getAs[Double]("chi2_cmh") - want) < 1e-6,
      s"cmh=${rc.getAs[Double]("chi2_cmh")} want $want")
    // degenerate strata (constant flag) carry nothing and fail loudly
    // when they are all there is
    intercept[IllegalArgumentException] {
      Contingency.cmh(stratum("x", 5, 0, 3, 0).toDF("s", "fa", "fb"),
        col("s"), col("fa"), col("fb"))
    }
  }

  test("rate ratio: hand values, identical arms, zero-cell guard") {
    import graft.stats.Experiment
    // arm A: 20 events over 10 units; arm B: 10 over 10 -> ratio 2
    val df = Seq((true, 20L, 10.0), (false, 10L, 10.0))
      .toDF("arm", "k", "e")
    val r = Experiment.rateRatio(df, col("arm"), col("k"), col("e")).head()
    assert(r.getAs[Double]("rate_a") == 2.0 &&
      r.getAs[Double]("rate_b") == 1.0 && r.getAs[Double]("ratio") == 2.0)
    val se = math.sqrt(1.0 / 20 + 1.0 / 10)
    assert(r.getAs[Double]("z") ==
      BigDecimal(math.log(2.0) / se).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("ci_lo") < 2.0 && 2.0 < r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("p_value") < 0.1,
      "a 2x rate gap at these counts is near-significant")
    // split rows per arm must aggregate before the ratio
    val split = Seq((true, 12L, 6.0), (true, 8L, 4.0), (false, 10L, 10.0))
      .toDF("arm", "k", "e")
    assert(Experiment.rateRatio(split, col("arm"), col("k"), col("e"))
      .head().getAs[Double]("ratio") == 2.0)
    // identical arms: ratio 1, z 0, p 1
    val same = Seq((true, 10L, 5.0), (false, 10L, 5.0))
      .toDF("arm", "k", "e")
    val rs = Experiment.rateRatio(same, col("arm"), col("k"), col("e"))
      .head()
    assert(rs.getAs[Double]("ratio") == 1.0 && rs.getAs[Double]("z") == 0.0
      && rs.getAs[Double]("p_value") == 1.0)
    intercept[IllegalArgumentException] { // zero events in one arm
      Experiment.rateRatio(Seq((true, 0L, 5.0), (false, 3L, 5.0))
        .toDF("arm", "k", "e"), col("arm"), col("k"), col("e"))
    }
  }

  test("fisher exact: textbook 2x2 values and symmetry") {
    import graft.stats.Contingency
    def table(a: Int, b: Int, c: Int, d: Int) = {
      val rows = Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false))
      rows.toDF("fa", "fb")
    }
    // scipy fisher_exact([[1,9],[11,3]]) two-sided = 0.002759...
    val r1 = Contingency.fisherExact(table(1, 9, 11, 3),
      col("fa"), col("fb")).head()
    assert(r1.getAs[Double]("p_two_sided") == 0.002759,
      s"p=${r1.getAs[Double]("p_two_sided")}")
    assert(r1.getAs[Double]("odds_ratio") ==
      BigDecimal(1.0 * 3 / (9.0 * 11)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // lady-tasting-tea-shaped 3/1/1/3: p = 0.485714
    val r2 = Contingency.fisherExact(table(3, 1, 1, 3),
      col("fa"), col("fb")).head()
    assert(r2.getAs[Double]("p_two_sided") == 0.485714,
      s"p=${r2.getAs[Double]("p_two_sided")}")
    // transposing the table cannot change the hypergeometric p
    val r2t = Contingency.fisherExact(table(3, 1, 1, 3),
      col("fb"), col("fa")).head()
    assert(r2t.getAs[Double]("p_two_sided") ==
      r2.getAs[Double]("p_two_sided"))
    // independence-shaped table: p = 1
    val r3 = Contingency.fisherExact(table(5, 5, 5, 5),
      col("fa"), col("fb")).head()
    assert(r3.getAs[Double]("p_two_sided") == 1.0)
    // zero cell: odds ratio null, p still defined
    val r4 = Contingency.fisherExact(table(4, 0, 2, 6),
      col("fa"), col("fb")).head()
    assert(r4.isNullAt(r4.fieldIndex("odds_ratio")))
    assert(r4.getAs[Double]("p_two_sided") > 0.0 &&
      r4.getAs[Double]("p_two_sided") <= 1.0)
  }

  test("mcnemar: hand table, swap symmetry, never-disagree null") {
    import graft.stats.Contingency
    // truth always true; rr=20 both right, b=10 only A, c=2 only B, ww=5
    def rows(rr: Int, b: Int, c: Int, ww: Int) =
      (Seq.fill(rr)((true, true, true)) ++ Seq.fill(b)((true, true, false)) ++
        Seq.fill(c)((true, false, true)) ++
        Seq.fill(ww)((true, false, false)))
        .toDF("t", "pa", "pb")
    val r = Contingency.mcnemar(rows(20, 10, 2, 5),
      col("t"), col("pa"), col("pb")).head()
    assert(r.getAs[Long]("n") == 37L)
    assert(r.getAs[Long]("n_only_a") == 10L &&
      r.getAs[Long]("n_only_b") == 2L)
    // (|10-2|-1)^2 / 12 = 49/12 = 4.083333333
    assert(r.getAs[Double]("chi2_cc") == 4.083333333, s"chi2=$r")
    val p = r.getAs[Double]("p_value")
    assert(p > 0.04 && p < 0.05, s"p=$p") // scipy mcnemar(exact=False) 0.0433
    // swapping the classifiers flips b/c but not the statistic
    val sw = Contingency.mcnemar(rows(20, 10, 2, 5),
      col("t"), col("pb"), col("pa")).head()
    assert(sw.getAs[Long]("n_only_a") == 2L &&
      sw.getAs[Double]("chi2_cc") == 4.083333333)
    // |b-c| <= 1 under the continuity correction clamps to 0
    val eq = Contingency.mcnemar(rows(5, 3, 3, 1),
      col("t"), col("pa"), col("pb")).head()
    assert(eq.getAs[Double]("chi2_cc") == 0.0 &&
      eq.getAs[Double]("p_value") == 1.0)
    // models never disagree: nothing to test
    val nd = Contingency.mcnemar(rows(8, 0, 0, 4),
      col("t"), col("pa"), col("pb")).head()
    assert(nd.isNullAt(nd.fieldIndex("chi2_cc")) &&
      nd.isNullAt(nd.fieldIndex("p_value")))
  }

  test("partial correlation: exact line stays 1, confounder nulls, indep ~ raw") {
    val n = 200
    // y is exactly 2x: r_xy = 1 and the partial stays 1 whatever z does
    val lin = (1 to n).map { i =>
      (i.toDouble, 2.0 * i, ((i * 37) % 101).toDouble)
    }.toDF("x", "y", "z")
    val r1 = Correlation.partialPearson(lin, "x", "y", "z").head()
    assert(r1.getAs[Double]("r_xy") == 1.0 &&
      r1.getAs[Double]("r_partial") == 1.0, s"$r1")
    // y IS z: r_yz = 1, the formula divides by zero -> null
    val conf = (1 to n).map { i =>
      (i + ((i * 13) % 7).toDouble, i.toDouble, i.toDouble)
    }.toDF("x", "y", "z")
    val r2 = Correlation.partialPearson(conf, "x", "y", "z").head()
    assert(r2.getAs[Double]("r_yz") == 1.0 &&
      r2.isNullAt(r2.fieldIndex("r_partial")), s"$r2")
    // z independent of both: partialling it out barely moves r_xy
    val ind = (1 to n).map { i =>
      (i.toDouble + ((i * 7) % 13), i.toDouble + ((i * 5) % 11),
        ((i * 2654435761L) % 997).toDouble)
    }.toDF("x", "y", "z")
    val r3 = Correlation.partialPearson(ind, "x", "y", "z").head()
    assert(math.abs(r3.getAs[Double]("r_partial") -
      r3.getAs[Double]("r_xy")) < 0.02, s"$r3")
    // fewer complete rows than minPeriods -> null
    val r4 = Correlation.partialPearson(lin.limit(5), "x", "y", "z").head()
    assert(r4.isNullAt(r4.fieldIndex("r_partial")))
  }

  test("durbin-watson: independent ~2, smooth ~0, alternating ~4, gaps, flat") {
    def series(ys: Seq[(Long, Double)]) = ys.toDF("t", "y")
    // scrambled deterministic noise around a trend: DW near 2
    val indep = series((1 to 300).map(t =>
      (t.toLong, 0.5 * t + ((t * 2654435761L) % 1000) / 1000.0)))
    val d1 = Regression.durbinWatson(indep, "t", "y").head()
    assert(d1.getAs[Long]("n_pairs") == 299L)
    val dw1 = d1.getAs[Double]("dw")
    assert(dw1 > 1.6 && dw1 < 2.4, s"dw=$dw1")
    // slow sine: residuals glide -> strong positive serial correlation
    val smooth = series((1 to 300).map(t =>
      (t.toLong, math.sin(t / 30.0))))
    val dw2 = Regression.durbinWatson(smooth, "t", "y")
      .head().getAs[Double]("dw")
    assert(dw2 < 0.5, s"dw=$dw2")
    // alternating residuals -> negative serial correlation, DW toward 4
    val alt = series((1 to 300).map(t =>
      (t.toLong, if (t % 2 == 0) 1.0 else -1.0)))
    val dw3 = Regression.durbinWatson(alt, "t", "y")
      .head().getAs[Double]("dw")
    assert(dw3 > 3.5, s"dw=$dw3")
    // calendar gap: only consecutive-t pairs count
    val gappy = series(Seq((1L, 1.2), (2L, 0.4), (5L, 1.9), (6L, 0.1),
      (7L, 1.0)))
    assert(Regression.durbinWatson(gappy, "t", "y")
      .head().getAs[Long]("n_pairs") == 3L)
    // perfect line: zero residual variance -> dw null
    val flat = series((1 to 50).map(t => (t.toLong, 3.0 * t + 1.0)))
    val d5 = Regression.durbinWatson(flat, "t", "y").head()
    assert(d5.isNullAt(d5.fieldIndex("dw")))
  }

  test("breusch-pagan: planted fan-out fires, exact homoscedasticity nulls") {
    def sgn(i: Int) = if (i % 2 == 0) 1.0 else -1.0
    // residual magnitude grows with x: e ~ ±0.05x -> e² tracks x
    val fan = (1 to 200).map(i =>
      (i.toDouble, 3.0 * i + 5.0 + sgn(i) * 0.05 * i)).toDF("x", "y")
    val hot = Regression.breuschPagan(fan, "x", "y").head()
    val lm = hot.getAs[Double]("lm")
    assert(lm > 50.0, s"fan-out must fire: $hot")
    assert(Regression.breuschPaganP(lm) < 1e-6)
    assert(math.abs(hot.getAs[Double]("slope") - 3.0) < 0.01)
    // exactly constant |e|: the +,-,-,+ period-4 pattern is orthogonal
    // to both the constant and x over 50 full periods, so the fit is
    // EXACTLY y = 3x + 5 and e² = 0.25 has zero variance -> nulls
    def p4(i: Int) = if (i % 4 == 1 || i % 4 == 0) 0.5 else -0.5
    val const = (1 to 200).map(i =>
      (i.toDouble, 3.0 * i + 5.0 + p4(i))).toDF("x", "y")
    val cold = Regression.breuschPagan(const, "x", "y").head()
    assert(cold.isNullAt(cold.fieldIndex("r2_aux")) &&
      cold.isNullAt(cold.fieldIndex("lm")), s"$cold")
    // constant x: nothing to fit, loud
    intercept[IllegalArgumentException] {
      Regression.breuschPagan(
        (1 to 20).map(i => (2.0, i.toDouble)).toDF("x", "y"), "x", "y")
    }
  }

  test("runs test: alternation, blocks, hand moments, one-sided null") {
    import graft.stats.RankTests
    def run(ys: Seq[Double]) = RankTests.runsTest(
      ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("t", "y"),
      col("t"), col("y")).head()
    // perfect alternation around the median: every step is a run
    val alt = run((1 to 40).map(i => if (i % 2 == 0) 2.0 else 1.0))
    assert(alt.getAs[Long]("n_runs") == 40L &&
      alt.getAs[Double]("z") > 5.0, s"$alt")
    // two solid blocks: exactly 2 runs, strongly negative z
    val blocks = run(Seq.fill(20)(1.0) ++ Seq.fill(20)(2.0))
    assert(blocks.getAs[Long]("n_runs") == 2L &&
      blocks.getAs[Double]("z") < -5.0, s"$blocks")
    assert(blocks.getAs[Double]("expected_runs") == 21.0,
      "E[R] = 1 + 2*20*20/40")
    // median values drop: 1,2,3 with median 2 keeps one 1 and one 3
    val drop = run(Seq(1.0, 2.0, 3.0))
    assert(drop.getAs[Long]("n") == 2L && drop.getAs[Long]("n_runs") == 2L)
    // everything on one side after exclusion: z and p null
    val oneSide = run(Seq(1.0, 1.0, 1.0, 5.0))
    assert(oneSide.isNullAt(oneSide.fieldIndex("z")), s"$oneSide")
  }

  test("grubbs: planted outlier found, constant column nulls, critical value") {
    import graft.stats.Distribution
    val df = ((1 to 99).map(i => 10.0 + (i % 5) * 0.5) ++ Seq(50.0))
      .zipWithIndex.map { case (y, i) => (i, y) }.toDF("i", "y")
    val r = Distribution.grubbs(df, col("y")).head()
    assert(r.getAs[Double]("outlier_value") == 50.0, s"$r")
    val g = r.getAs[Double]("g_stat")
    val crit = Distribution.grubbsCritical(r.getAs[Long]("n"))
    assert(g > crit, s"planted point must reject: g=$g crit=$crit")
    // scipy-checked critical value shape: n=10, alpha=0.05 -> 2.2899...
    val c10 = Distribution.grubbsCritical(10)
    assert(math.abs(c10 - 2.29) < 0.01, s"c10=$c10")
    // constant column: sd = 0, no outlier to test
    val flat = (1 to 20).map(i => (i, 7.0)).toDF("i", "y")
    val f = Distribution.grubbs(flat, col("y")).head()
    assert(f.isNullAt(f.fieldIndex("g_stat")) &&
      f.isNullAt(f.fieldIndex("outlier_value")))
    intercept[IllegalArgumentException] {
      Distribution.grubbs(flat.limit(2), col("y"))
    }
  }

  test("cohen's h: textbook asin geometry, bands, zero effect") {
    import graft.stats.Experiment
    def units(nt: Int, ct: Int, nc: Int, cc: Int) =
      ((1 to nt).map(i => (true, i <= ct)) ++
        (1 to nc).map(i => (false, i <= cc))).toDF("arm", "conv")
    // h(0.5, 0.25) = pi/2 - pi/3 = 0.523599 -> "medium"
    val r = Experiment.cohensH(units(50, 25, 40, 10),
      col("arm"), col("conv")).head()
    assert(r.getAs[Double]("h") == 0.523599, s"$r")
    assert(r.getAs[String]("magnitude") == "medium")
    // identical rates: exactly zero, negligible
    val z = Experiment.cohensH(units(30, 15, 60, 30),
      col("arm"), col("conv")).head()
    assert(z.getAs[Double]("h") == 0.0 &&
      z.getAs[String]("magnitude") == "negligible")
    // extreme split: h(1, 0) = pi = "large"
    val l = Experiment.cohensH(units(10, 10, 10, 0),
      col("arm"), col("conv")).head()
    assert(l.getAs[Double]("h") == 3.141593 &&
      l.getAs[String]("magnitude") == "large")
    intercept[IllegalArgumentException] {
      Experiment.cohensH(units(10, 5, 0, 0), col("arm"), col("conv"))
    }
  }

  test("eb shrinkage: toward the mean, small-n shrinks harder, degenerate") {
    import graft.stats.Shrinkage
    // 40 spread-rate keys + one tiny-n and one huge-n key at rate 1.0
    val rows =
      (1 to 40).flatMap { k =>
        val n = 10; val s = k % 11
        (1 to n).map(i => (k.toLong, i <= s))
      } ++ (1 to 2).map(i => (100L, true)) ++
        (1 to 200).map(i => (200L, true))
    val out = Shrinkage.betaBinomialRates(rows.toDF("key", "ok"),
      col("key"), col("ok"))
      .collect().map(r => r.getAs[Long]("key") -> r).toMap
    val a = out(100L); val b = out(200L)
    assert(!a.isNullAt(a.fieldIndex("alpha")), "prior must be admissible")
    val alpha = a.getAs[Double]("alpha"); val beta = a.getAs[Double]("beta")
    val pm = alpha / (alpha + beta)
    // both raw rates are 1.0; the n=2 key must land much closer to the
    // prior mean than the n=200 key
    assert(math.abs(a.getAs[Double]("shrunk_rate") - pm) <
      math.abs(b.getAs[Double]("shrunk_rate") - pm), s"a=$a b=$b")
    // every key shrinks TOWARD the mean, never past or away from it
    out.values.foreach { r =>
      val raw = r.getAs[Double]("rate"); val sh = r.getAs[Double]("shrunk_rate")
      assert(math.abs(sh - pm) <= math.abs(raw - pm) + 1e-9, s"$r")
    }
    // all keys at the same rate: zero variance, no admissible prior
    val flat = (1 to 5).flatMap(k => Seq((k.toLong, true), (k.toLong, false)))
    val f = Shrinkage.betaBinomialRates(flat.toDF("key", "ok"),
      col("key"), col("ok")).head()
    assert(f.isNullAt(f.fieldIndex("alpha")) &&
      f.getAs[Double]("shrunk_rate") == 0.5)
  }

  test("hill tail index: exact exponential-spacing hand value, guards") {
    import graft.stats.Distribution
    // top-3 of {e^2, e^1, 1}: terms ln(e^2)=2, ln(e)=1 -> alpha = 2/3
    val vals = Seq(math.exp(2.0), math.exp(1.0), 1.0, -5.0, 0.0)
      .zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "y")
    val r = Distribution.hillTailIndex(vals, col("y"), 2).head()
    assert(r.getAs[Double]("threshold") == 1.0 &&
      r.getAs[Double]("sum_log") == 3.0 &&
      r.getAs[Double]("alpha") == 0.666667, s"$r")
    // all top values equal: degenerate tail, alpha null
    val flat = (1 to 10).map(i => (i, 4.0)).toDF("i", "y")
    val f = Distribution.hillTailIndex(flat, col("y"), 3).head()
    assert(f.isNullAt(f.fieldIndex("alpha")))
    // not enough positive mass fails loudly
    intercept[IllegalArgumentException] {
      Distribution.hillTailIndex(vals, col("y"), 5)
    }
  }

  test("dunn post-hoc: separated groups, kw consistency, tie variance") {
    import graft.stats.RankTests
    // three cleanly separated groups: a={1..5} < b={11..15} < c={21..25}
    val rows = (1 to 5).flatMap(i => Seq(
      ("a", i.toDouble), ("b", 10.0 + i), ("c", 20.0 + i)))
    val out = RankTests.dunnTest(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    // no ties: sigma^2 = N(N+1)/12 = 20; mean ranks 3, 8, 13
    val ab = out(("a", "b"))
    assert(ab.getAs[Double]("mean_rank_a") == 3.0 &&
      ab.getAs[Double]("mean_rank_b") == 8.0, s"$ab")
    val expZ = (3.0 - 8.0) / math.sqrt(20.0 * (1.0 / 5 + 1.0 / 5))
    assert(math.abs(ab.getAs[Double]("z") - expZ) < 1e-6)
    // |z| grows with separation: a-c beats a-b
    assert(math.abs(out(("a", "c")).getAs[Double]("z")) >
      math.abs(ab.getAs[Double]("z")))
    // identical groups: z = 0, p = 1
    val same = (1 to 6).flatMap(i => Seq(("x", i.toDouble % 3),
      ("y", i.toDouble % 3)))
    val s = RankTests.dunnTest(same.toDF("g", "v"), col("g"), col("v"))
      .head()
    assert(s.getAs[Double]("z") == 0.0 && s.getAs[Double]("p_value") == 1.0)
    // all-tied values: loud degenerate
    intercept[IllegalArgumentException] {
      RankTests.dunnTest(Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v"),
        col("g"), col("v"))
    }
  }

  test("woe/iv: pure cells adjusted, signs, iv nonneg, missing class loud") {
    import graft.stats.FeatureScreen
    // cat A: 8 events / 2 non; cat B: 2 / 8; cat C: 0 / 10 (pure)
    val rows = Seq.fill(8)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq.fill(2)(("B", true)) ++ Seq.fill(8)(("B", false)) ++
      Seq.fill(10)(("C", false))
    val out = FeatureScreen.woeTable(rows.toDF("cat", "ev"), "cat",
        col("ev"))
      .collect().map(r => r.getString(0) -> r).toMap
    // te = 10, tn = 20: woe_A = ln((2/20)/(8/10)) < 0 (event-heavy),
    // woe_B = ln((8/20)/(2/10)) = ln 2 > 0, woe_C uses the 0.5 event adj
    assert(out("A").getAs[Double]("woe") < 0 &&
      out("B").getAs[Double]("woe") > 0)
    assert(out("B").getAs[Double]("woe") == 0.693147, s"${out("B")}")
    val c = out("C")
    assert(c.getAs[Long]("n_event") == 0L &&
      c.getAs[Double]("woe") ==
        BigDecimal(math.log((10.0 / 20.0) / (0.5 / 10.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    out.values.foreach(r =>
      assert(r.getAs[Double]("iv_term") >= 0.0, s"$r"))
    intercept[IllegalArgumentException] {
      FeatureScreen.woeTable(
        Seq(("A", true), ("B", true)).toDF("cat", "ev"), "cat", col("ev"))
    }
  }

  test("trimmed mean: outliers dropped, inclusive fences, empty column") {
    import graft.transform.Winsorize
    // 1..20 plus a wild 1000: trimming at 5/95 drops the tail point
    val df = ((1 to 20).map(_.toDouble) :+ 1000.0)
      .zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val r = Winsorize.trimmedMean(df, "v", 0.05, 0.95).head()
    assert(r.getAs[Long]("n_total") == 21L)
    assert(r.getAs[Long]("n_used") < 21L)
    val m = r.getAs[Double]("trimmed_mean")
    assert(m > 5.0 && m < 15.0, s"outlier must not drag the mean: $r")
    // constant column: fences collapse, everything survives (inclusive)
    val flat = (1 to 10).map(i => (i, 7.0)).toDF("i", "v")
    val f = Winsorize.trimmedMean(flat, "v").head()
    assert(f.getAs[Long]("n_used") == 10L &&
      f.getAs[Double]("trimmed_mean") == 7.0)
    // all-null column: defined empty result, no NPE
    val nul = (1 to 5).map(i => (i, Option.empty[Double])).toDF("i", "v")
    val e = Winsorize.trimmedMean(nul, "v").head()
    assert(e.getAs[Long]("n_total") == 0L &&
      e.isNullAt(e.fieldIndex("trimmed_mean")))
  }

  test("expected shortfall: hand tail, inclusive fence, heavier tail deepens") {
    import graft.stats.Distribution
    // 1..100: q05 = 5.95 -> tail {1..5}, es = 3
    val df = (1 to 100).map(i => (i, i.toDouble)).toDF("i", "v")
    val r = Distribution.expectedShortfall(df, col("v")).head()
    assert(r.getAs[Long]("tail_n") == 5L && r.getAs[Double]("es") == 3.0,
      s"$r")
    assert(r.getAs[Double]("es") <= r.getAs[Double]("var_q"))
    // a heavier lower tail drags ES down at the same VaR-ish fence
    val heavy = ((1 to 100).map(i => (i, i.toDouble)) ++
      Seq((101, -1000.0))).toDF("i", "v")
    val h = Distribution.expectedShortfall(heavy, col("v")).head()
    assert(h.getAs[Double]("es") < r.getAs[Double]("es"))
    intercept[IllegalArgumentException] {
      Distribution.expectedShortfall(df, col("v"), alpha = 0.7)
    }
  }

  test("trimmed mean by group: per-group fences, outlier isolated to its group") {
    import graft.transform.Winsorize
    // group a is clean 1..20; group b carries a 1000 outlier
    val df = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i.toDouble)) :+ (("b", 1000.0)))
      .toDF("g", "v")
    val out = Winsorize.trimmedMeanByGroup(df, col("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a"); val b = out("b")
    assert(a.getAs[Long]("n_total") == 20L)
    // each group keeps its own fences; b's sits at least as high
    assert(a.getAs[Double]("hi") < 25.0 &&
      b.getAs[Double]("hi") >= a.getAs[Double]("hi"), s"a=$a b=$b")
    assert(b.getAs[Long]("n_used") < b.getAs[Long]("n_total"),
      "b must trim something")
    val m = b.getAs[Double]("trimmed_mean")
    assert(m > 5.0 && m < 60.0, s"the outlier must not dominate b: $b")
  }

  test("median ci: brackets, widens with z, narrows with n, short guard") {
    import graft.stats.Distribution
    val df = (1 to 101).map(i => (i, i.toDouble)).toDF("i", "v")
    val r = Distribution.medianCI(df, col("v")).head()
    assert(r.getAs[Double]("median") == 51.0)
    // ranks: lo = floor((101 - 1.96*sqrt(101))/2) = 40, hi = 62
    assert(r.getAs[Long]("lo_rank") == 40L && r.getAs[Long]("hi_rank") == 62L)
    assert(r.getAs[Double]("ci_lo") == 40.0 &&
      r.getAs[Double]("ci_hi") == 62.0, s"$r")
    // a wider z widens the interval
    val wide = Distribution.medianCI(df, col("v"), z = 2.575829303549).head()
    assert(wide.getAs[Long]("lo_rank") < 40L)
    // 4x the data narrows the RELATIVE interval (sqrt-n shrinkage)
    val big = (1 to 404).map(i => (i, (i % 101 + 1).toDouble)).toDF("i", "v")
    val b = Distribution.medianCI(big, col("v")).head()
    assert((b.getAs[Double]("ci_hi") - b.getAs[Double]("ci_lo")) / 404.0 <
      (r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")) / 101.0)
    intercept[IllegalArgumentException] {
      Distribution.medianCI(df.limit(5), col("v"))
    }
  }

  test("ks uniform: grid gap 1/n, point mass rejects, range guard") {
    import graft.stats.Drift
    // the regular grid i/n has one-sided gaps of exactly 1/n
    val grid = (1 to 100).map(i => (i, i / 100.0)).toDF("i", "v")
    val g = Drift.ksUniform(grid, col("v")).head()
    assert(g.getAs[Double]("d_stat") == 0.01, s"$g")
    assert(g.getAs[Double]("p_value") == 1.0)
    // all mass on one point: D = 0.5, decisively rejected
    val point = (1 to 200).map(i => (i, 0.5)).toDF("i", "v")
    val p = Drift.ksUniform(point, col("v")).head()
    assert(p.getAs[Double]("d_stat") == 0.5 &&
      p.getAs[Double]("p_value") < 1e-6, s"$p")
    intercept[Exception] {
      Drift.ksUniform(Seq((1, 1.5)).toDF("i", "v"), col("v")).head()
    }
  }

  test("cramer-von mises: identical zero, shift fires, broad beats ks-blind") {
    import graft.stats.Drift
    def df(xs: Seq[Double]) =
      xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    // identical samples: every CDF difference is 0
    val same = df((1 to 50).map(_.toDouble))
    val z = Drift.cramerVonMises(same, same, col("v")).head()
    assert(z.getAs[Double]("cvm_t") == 0.0 && !z.getAs[Boolean]("reject_5pct"))
    // clean location shift: rejects at 5%
    val a = df((1 to 200).map(_.toDouble))
    val b = df((1 to 200).map(_ + 40.0))
    val sh = Drift.cramerVonMises(a, b, col("v")).head()
    assert(sh.getAs[Boolean]("reject_5pct"), s"$sh")
    // hand value on a tiny case: a={1,3}, b={2,4}
    // pooled diffs (x2x2 scale): at 1: (1*2-0*2)=2; 2: (2-2)=0... T computed
    // num at v=1: 1*2-0*2=2; v=2: 2-2=0; v=3: 4-2=2; v=4: 0 -> sum t*num2 = 8
    // T = 8 / (16 * 4) = 0.125
    val t = Drift.cramerVonMises(df(Seq(1.0, 3.0)), df(Seq(2.0, 4.0)),
      col("v")).head()
    assert(t.getAs[Double]("cvm_t") == 0.125, s"$t")
    intercept[IllegalArgumentException] {
      Drift.cramerVonMises(df(Seq.empty), same, col("v")).head()
    }
  }

  test("log2 histogram: exact power-of-two boundaries, sub-1 pool, edges") {
    import graft.stats.Distribution
    // values straddling boundaries: 1 -> b0, 2,3 -> b1, 4..7 -> b2,
    // 1024 - eps -> b9, 1024 -> b10, 0.5 -> b-1, -3/0 dropped
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 7.9, 1023.999, 1024.0, 0.5, -3.0, 0.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val out = Distribution.log2Histogram(df, col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(-1L).getAs[Long]("n") == 1L)
    assert(out(0L).getAs[Long]("n") == 1L && out(1L).getAs[Long]("n") == 2L)
    assert(out(2L).getAs[Long]("n") == 2L)
    assert(out(9L).getAs[Long]("n") == 1L, "1023.999 floors into bucket 9")
    assert(out(10L).getAs[Long]("n") == 1L)
    assert(out(10L).getAs[Double]("lo_edge") == 1024.0 &&
      out(10L).getAs[Double]("hi_edge") == 2048.0)
    assert(out.values.map(_.getAs[Long]("n")).sum == 8L, "nonpositive out")
  }

  test("jonckheere-terpstra: hand 2JT, trend sign, reversal, ties") {
    import graft.stats.RankTests
    // a={1,3}, b={2,4}: pairs a<b: (1,2)+(1,4)+(3,4)=3 -> 2JT=6
    // mean2 = (16 - 8)/2 = 4; no ties
    val small = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = RankTests.jonckheereTerpstra(small, col("g"), col("v"),
      Seq("a", "b")).head()
    assert(r.getAs[Long]("jt2") == 6L && r.getAs[Long]("mean2") == 4L,
      s"$r")
    assert(r.getAs[Double]("z") > 0.0)
    // reversing the claimed order flips the statistic around the mean
    val rev = RankTests.jonckheereTerpstra(small, col("g"), col("v"),
      Seq("b", "a")).head()
    assert(rev.getAs[Long]("jt2") == 2L, "8 - 6 = 2 (no ties)")
    assert(rev.getAs[Double]("z") == -r.getAs[Double]("z"))
    // ties count half: a={1,2}, b={2,3}: strict 3 pairs + one tie -> 2JT=7
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val t = RankTests.jonckheereTerpstra(tied, col("g"), col("v"),
      Seq("a", "b")).head()
    assert(t.getAs[Long]("jt2") == 7L, s"$t")
    // a strong planted trend across 3 ordered groups fires hard
    val trend = (1 to 30).flatMap(i => Seq(
      ("lo", i.toDouble), ("mid", 100.0 + i), ("hi", 200.0 + i)))
    val big = RankTests.jonckheereTerpstra(trend.toDF("g", "v"),
      col("g"), col("v"), Seq("lo", "mid", "hi")).head()
    assert(big.getAs[Double]("z") > 5.0 &&
      big.getAs[Double]("p_value") < 1e-6, s"$big")
    // missing ordered group is loud
    intercept[IllegalArgumentException] {
      RankTests.jonckheereTerpstra(small, col("g"), col("v"),
        Seq("a", "b", "zzz"))
    }
  }

  test("newey-west: iid ~ ols, smooth residuals inflate, weights sane") {
    // avalanche-scrambled noise around a trend (a Weyl sequence would
    // carry strong lag-2/4 correlations and bias the HAC sum): ratio ~ 1
    def scramble(t: Int): Double = {
      var x = t * 0x9E3779B9
      x ^= x >>> 16; x *= 0x85EBCA6B; x ^= x >>> 13
      (x & 0x7fffffff) % 1000 / 1000.0
    }
    val iid = (1 to 400).map(t => (t.toLong, 2.0 * t + scramble(t)))
      .toDF("t", "y")
    val r1 = Regression.neweyWestSlope(iid, "t", "y", maxLag = 7).head()
    val ratio1 = r1.getAs[Double]("ratio")
    assert(ratio1 > 0.5 && ratio1 < 1.5, s"iid ratio near 1: $r1")
    // slow sine residuals: strong positive autocorrelation, ratio >> 1
    val smooth = (1 to 400).map(t =>
      (t.toLong, 2.0 * t + 5.0 * math.sin(t / 40.0))).toDF("t", "y")
    val r2 = Regression.neweyWestSlope(smooth, "t", "y", maxLag = 7)
      .head()
    assert(r2.getAs[Double]("ratio") > 1.5,
      s"autocorrelated residuals must inflate the HAC SE: $r2")
    // both SEs positive, slope recovered
    assert(math.abs(r2.getAs[Double]("slope") - 2.0) < 0.05)
    assert(r2.getAs[Double]("se_nw") > r2.getAs[Double]("se_ols"))
    intercept[IllegalArgumentException] {
      Regression.neweyWestSlope(iid.limit(5), "t", "y", maxLag = 7)
    }
  }

  test("quantile effects: pure variance intervention, shift, empty arm") {
    import graft.stats.Experiment
    // control 41..60 (tight), treatment 26..75 (spread, same median):
    // low-p effects negative, high-p positive, median ~ 0
    val spread = ((26 to 75).map(v => (true, v.toDouble)) ++
      (41 to 60).map(v => (false, v.toDouble))).toDF("arm", "y")
    val qte = Experiment.quantileEffects(spread, col("arm"), col("y"))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("effect"))
      .toMap
    assert(qte(0.1) < -5.0 && qte(0.9) > 5.0, s"$qte")
    assert(math.abs(qte(0.5)) < 1.0)
    // a pure +7 shift moves EVERY quantile by exactly 7
    val shift = ((1 to 50).map(v => (true, v + 7.0)) ++
      (1 to 50).map(v => (false, v.toDouble))).toDF("arm", "y")
    Experiment.quantileEffects(shift, col("arm"), col("y"))
      .collect().foreach(r =>
        assert(r.getAs[Double]("effect") == 7.0, s"$r"))
    intercept[IllegalArgumentException] {
      Experiment.quantileEffects(
        (1 to 5).map(v => (true, v.toDouble)).toDF("arm", "y"),
        col("arm"), col("y"))
    }
  }

  test("srm: clean split passes, broken split flags, ratio parameter") {
    import graft.stats.Experiment
    def arms(nt: Int, nc: Int) =
      (Seq.fill(nt)(true) ++ Seq.fill(nc)(false)).toDF("arm")
    val ok = Experiment.srmTest(arms(5000, 5010), col("arm")).head()
    assert(ok.getAs[Double]("p_value") > 0.5, s"$ok")
    // a 10% leak on one arm at n=10k is unmissable
    val broken = Experiment.srmTest(arms(4500, 5500), col("arm")).head()
    assert(broken.getAs[Double]("chi2") == 100.0 &&
      broken.getAs[Double]("p_value") < 1e-6, s"$broken")
    // 90/10 design: the same counts are fine under the right ratio
    val ninety = Experiment.srmTest(arms(9000, 1000), col("arm"), 0.9)
      .head()
    assert(ninety.getAs[Double]("chi2") == 0.0 &&
      ninety.getAs[Double]("p_value") == 1.0)
  }

  test("pythagorean means: am >= gm >= hm, hand values, nonpositive out") {
    import graft.stats.Distribution
    // {1, 4}: am 2.5, gm 2, hm 1.6; {2,2}: all 2; one nonpositive dropped
    val df = Seq(("a", 1.0), ("a", 4.0), ("b", 2.0), ("b", 2.0),
      ("b", -7.0)).toDF("g", "v")
    val out = Distribution.pythagoreanMeans(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("am") == 2.5 && a.getAs[Double]("gm") == 2.0 &&
      a.getAs[Double]("hm") == 1.6, s"$a")
    val b = out("b")
    assert(b.getAs[Long]("n_nonpos") == 1L &&
      b.getAs[Double]("am") == 2.0 && b.getAs[Double]("gm") == 2.0 &&
      b.getAs[Double]("hm") == 2.0)
  }
}
