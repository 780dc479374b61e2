package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{Filter, MergeKeys}
import graft.transform.Enwiden

/** Property tests for the semantic traps (SURVEY.md §5 plan) using raw
  * ScalaCheck generators (the scalatest bridge isn't in the offline cache):
  * enwiden invariants over generated longitudinal frames, session-label
  * totality, boolean-normalization algebra.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val keys = MergeKeys("ursi", Some("session_num"), None, isLongitudinal = true)

  private val sessionGen = Gen.oneOf("BAS1", "BAS2", "BAS3", "visit1", "FLU2", "1", "2")
  private val rowsGen: Gen[List[(String, String, Option[Int], Option[Int])]] =
    Gen.listOfN(40, for {
      p <- Gen.choose(1, 8).map(i => f"S$i%03d")
      s <- sessionGen
      static <- Gen.option(Gen.const(7)) // per-participant constant when present
      dyn <- Gen.option(Gen.choose(0, 100))
    } yield (p, s, static, dyn))

  test("enwiden property: one row per participant, static column unsuffixed") {
    samples(rowsGen, 8).foreach { rows =>
      val df = rows.toDF("ursi", "session_num", "stat", "dyn")
      val wide = Enwiden.enwiden(df, keys, cellAgg = Enwiden.MinNonNull)
      val nParticipants = rows.map(_._1).distinct.size
      val nSessions = rows.map(_._2).distinct.size
      if (nSessions <= 1) assert(wide eq df)
      else {
        assert(wide.count() == nParticipants)
        assert(wide.select("ursi").distinct().count() == nParticipants)
        // 'stat' is 7-or-null per participant => always static
        assert(wide.columns.contains("stat"))
        assert(!wide.columns.exists(_.startsWith("stat_")))
        // 'dyn' survives in some form (static if degenerate, else pivoted)
        assert(wide.columns.exists(_.startsWith("dyn")))
        // spot-check a participant's static value
        val expect = rows.filter(r => r._3.nonEmpty).groupBy(_._1)
        expect.headOption.foreach { case (p, rs) =>
          val got = wide.filter($"ursi" === p).head().getAs[Any]("stat")
          assert(got == 7, s"participant $p stat=$got")
        }
      }
    }
  }

  test("session labels: total, normalized shape") {
    samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 200).foreach { s =>
      val label = Enwiden.sessionLabel(s)
      assert(label.nonEmpty, s"for '$s'")
      assert(label == label.toUpperCase || label.startsWith("SES"), s"for '$s' -> '$label'")
    }
    // the canonical collapses
    assert(Seq("1", "1.0", "visit1", "V1", "bas1", "BASELINE1")
      .map(Enwiden.sessionLabel).forall(_ == "BAS1"))
  }

  test("boolean normalization algebra") {
    val boolTok = Gen.oneOf("Yes", "No", "True", "False", "1", "0", "yes", "no")
    samples(Gen.nonEmptyListOf(boolTok), 50).foreach { toks =>
      val r = Filter.normalizeBoolean(toks)
      assert(r.nonEmpty && r.get.length == toks.length)
      val truthy = Set("yes", "true", "1")
      assert(r.get == toks.map(t => truthy(t.trim.toLowerCase)))
    }
    samples(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)), 50).foreach { toks =>
      val allBool = toks.forall(t =>
        Set("yes", "no", "true", "false")(t.trim.toLowerCase))
      assert(Filter.normalizeBoolean(toks).nonEmpty == allBool)
    }
  }

  test("filter funnel property: one-scan flags == K naive re-queries") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    import graft.stats.FilterFunnel
    // Random frames with duplicate and null keys, random thresholds: the
    // one-scan per-key-flag funnel/impact must equal the reference
    // semantics (K cumulative / standalone re-queries with countDistinct).
    val rowGen = Gen.listOfN(120, for {
      k <- Gen.option(Gen.choose(1, 15).map(i => s"K$i")) // nulls included
      a <- Gen.choose(0, 100)
      b <- Gen.choose(0, 100)
    } yield (k, a, b))
    samples(rowGen, 6, seed = 99).zipWithIndex.foreach { case (rows, trial) =>
      val df = rows.map { case (k, a, b) => (k.orNull, a, b) }
        .toDF("k", "a", "b")
      val t1 = 20 + trial * 10
      val t2 = 80 - trial * 5
      val steps = Seq(
        "a_hi" -> (col("a") >= t1),
        "b_lo" -> (col("b") <= t2),
        "a_even" -> (col("a") % 2 === 0))
      // naive cumulative re-queries (the reference's K+1 query pattern)
      val naive = steps.scanLeft(df)((d, s) => d.filter(s._2))
        .map(_.filter(col("k").isNotNull)
          .agg(countDistinct(col("k"))).head().getLong(0))
      val funnel = FilterFunnel.funnel(df, "k", steps)
      assert(funnel.map(_.n) == naive, s"trial $trial funnel drift")
      funnel.sliding(2).foreach { case Seq(prev, cur) =>
        assert(cur.removed == prev.n - cur.n)
      }
      // impact: each filter alone + all combined vs naive standalone queries
      val naiveAlone = steps.map(s => df.filter(s._2)
        .filter(col("k").isNotNull)
        .agg(countDistinct(col("k"))).head().getLong(0))
      val naiveAll = steps.map(_._2).reduce(_ && _) match {
        case all => df.filter(all).filter(col("k").isNotNull)
          .agg(countDistinct(col("k"))).head().getLong(0)
      }
      val impact = FilterFunnel.impact(df, "k", steps)
      assert(impact.map(_.n) == (naive.head +: naiveAlone :+ naiveAll),
        s"trial $trial impact drift")
    }
  }

  test("minhash estimate tracks exact jaccard on synthetic pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.0, maxBucketSize = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)) || pairs((1L, 3L)) < 0.3)
  }

  test("bucketed layout: co-located hub join plans without a shuffle exchange") {
    val dir = fixtureDir(
      "demographics.csv" -> "ursi,age\nS1,30\nS2,40\nS3,50",
      "cognitive.csv" -> "ursi,wm\nS1,100\nS2,90\nS3,80")
    val cat = new graft.catalog.TableCatalog(spark, graft.core.EngineConfig(dir))
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    graft.catalog.Layout.writeBucketed(cat, wh, buckets = 2, namePrefix = "pbt")
    val a = graft.catalog.Layout.bucketedTable(spark, "pbt", "demographics")
    val b = graft.catalog.Layout.bucketedTable(spark, "pbt", "cognitive")
    val joined = a.join(b, Seq("ursi"))
    assert(joined.count() == 3)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("j1_star_left_join_bucketed: same rows as j1, no hash exchange in the join") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.queries.CoreQueries.j1StarLeftJoin.run(spark, dir)
    val bucketed = graft.queries.CoreQueries.j1StarLeftJoinBucketed.run(spark, dir)
    assert(plain.collect().toSeq == bucketed.collect().toSeq,
      "bucketed layout must not change results")
    // The big-side join must be co-located: the only exchange allowed is the
    // final ORDER BY's range partitioning. Force the sort-merge path (small
    // sf would auto-broadcast orders, hiding a layout regression).
    val noBhj = spark.sessionState.conf.getConfString(
      "spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
    try {
      val plan = graft.queries.CoreQueries.j1StarLeftJoinBucketed
        .run(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed j1 still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", noBhj)
  }

  /** Total records read by the scan tasks of `f` (listener-metered; the
    * listener bus is async, so poll until the counter stabilizes). */
  private def recordsRead(f: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val n = new java.util.concurrent.atomic.AtomicLong()
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          n.addAndGet(te.taskMetrics.inputMetrics.recordsRead); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var prev = -1L; var cur = n.get(); var tries = 0
      while (cur != prev && tries < 50) {
        Thread.sleep(100); prev = cur; cur = n.get(); tries += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("z-order layout: multi-dim box filter reads far fewer records") {

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // clustering-depth report on hand-built intervals: files spanning
    // [0,9], [10,19], [5,14] → depths 2, 2, 3 → avg 7/3, max 3
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft-depth")
      def writeOne(name: String, lo: Int, hi: Int): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft-depth-part")
        (lo to hi).toDF("x").coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp)
          .filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get()
        java.nio.file.Files.move(part, dir.resolve(name))
      }
      writeOne("f1.parquet", 0, 9)
      writeOne("f2.parquet", 10, 19)
      writeOne("f3.parquet", 5, 14)
      val rep = graft.catalog.Layout
        .clusteringReport(spark, dir.toString, Seq("x")).head()
      assert(rep.getAs[Long]("n_files") == 3L)
      assert(rep.getAs[Double]("avg_depth") == 2.3333)
      assert(rep.getAs[Long]("max_depth") == 3L)
    }
    // unsorted baseline: random partitioning, every file spans the full
    // value space, so min/max stats prune nothing
    orders.repartition(8).write.parquet(s"$base/plain")
    graft.catalog.Layout.writeZOrdered(
      orders, Seq("o_custkey", "o_totalprice"), s"$base/zorder",
      files = 8, bitsPerDim = 3)

    val zdf = spark.read.parquet(s"$base/zorder")
    assert(zdf.count() == orders.count(), "z-order write must preserve rows")

    // a ~1/16 box in (custkey, totalprice)
    val (loK, hiK) = (100, 400)
    val (loP, hiP) = (50000.0, 100000.0)
    def box(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("o_custkey").between(loK, hiK) &&
        col("o_totalprice").between(loP, hiP))
    val expect = box(spark.read.parquet(s"$base/plain"))
      .agg(coalesce(sum(col("o_orderkey")), lit(0L)).as("s"),
        count(lit(1)).as("n")).head()
    val got = box(zdf)
      .agg(coalesce(sum(col("o_orderkey")), lit(0L)).as("s"),
        count(lit(1)).as("n")).head()
    assert(got == expect, "z-order layout must not change query results")
    assert(expect.getLong(1) > 0, "fixture degenerate: empty filter box")

    val plainRead = recordsRead {
      box(spark.read.parquet(s"$base/plain")).write.format("noop")
        .mode("overwrite").save()
    }
    val zRead = recordsRead {
      box(zdf).write.format("noop").mode("overwrite").save()
    }
    assert(zRead < plainRead * 6 / 10,
      s"z-order pruning ineffective: read $zRead of $plainRead baseline records")
  }

  test("top-k per group plans WindowGroupLimit (per-partition heap, not full sort)") {
    // rank <= k above a window must trigger InferWindowGroupLimit: each map
    // task keeps a k-heap per group instead of sorting every row — the
    // difference between O(n log k) and O(n log n) per partition at 100 TB.
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = graft.ops.Similarity.bruteForceTopK(
      embs, "vec_id", "embedding", col("vec_id") < 10, k = 3)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k filter did not lower to WindowGroupLimit:\n$plan")
  }

  test("runtime bloom-filter join: selective dim filter injects a probe on the fact side") {
    // At 100 TB the fact-side scan of a selectively-filtered dim join should
    // be pre-filtered by Spark's runtime bloom filter (InjectRuntimeFilter).
    // The defaults gate injection on production sizes
    // (applicationSideScanSizeThreshold=10GB), so this spec pins the
    // CAPABILITY with thresholds lowered to test scale — the config a real
    // deployment tunes, documented here by executable example.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force the shuffle-join regime where a runtime filter pays off
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected on the fact scan:\n$optimized")
      assert(j.head().get(0) != null, "join must still produce a result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cluster resolution property: matches driver union-find on random graphs") {
    import graft.ops.Clusters
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(0, 120)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
    } yield edges
    samples(graphGen, 6, seed = 99).filter(_.nonEmpty).foreach { edges =>
      // driver-side union-find ground truth
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = nodes.map(x => x -> find(x)).toMap
      // min-compression: union-find roots are the component minimum here
      // because unions always hang the larger root under the smaller.
      // Exercise BOTH implementations: the driver fast path (default) and
      // the distributed hash-min propagation (forced via maxDriverEdges=0).
      val fast = Clusters.resolveClusters(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == truth,
        s"driver path, edges $edges:\n spark $fast\n truth $truth")
      val dist = Clusters.resolveClusters(edges.toDF("a", "b"),
          maxDriverEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == truth,
        s"distributed path, edges $edges:\n spark $dist\n truth $truth")
    }
  }

  test("postings bucketed by term: an IN-query reads a fraction of the index") {
    import graft.ops.TextSearch
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val postings = TextSearch.buildPostings(docs, "doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft-postings").toString
    val indexed = graft.catalog.Layout.ensureBucketed(
      spark, postings, "term", 8, wh, "graft_postings_spec")
    // full-index baseline vs a 3-term query slice: bucket pruning on the
    // IN filter must keep whole buckets unread — the "query-time cost
    // scales with posting sizes, not corpus bytes" claim, metered
    val full = recordsRead { indexed.agg(sum(col("tf"))).head() }
    val q = Seq("spark", "hash", "join")
    val sliced = recordsRead {
      indexed.filter(col("term").isin(q: _*)).agg(sum(col("tf"))).head()
    }
    assert(full > 0 && sliced > 0)
    assert(sliced * 2 <= full,
      s"term slice read $sliced of $full records — bucket pruning ineffective")
    // and searching FROM the persisted index returns the fresh-build result
    val (n, avgdl) = TextSearch.corpusStats(docs, "text")
    val fresh = TextSearch.bm25TopKIndexed(postings, n, avgdl, q.mkString(" "))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val persisted = TextSearch.bm25TopKIndexed(indexed, n, avgdl, q.mkString(" "))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fresh == persisted)
  }

  test("sampling properties: split partitions; packing preserves multiset") {
    import graft.ops.Sampling
    import org.apache.spark.sql.functions.col
    val weightsGen: Gen[List[Long]] =
      Gen.listOfN(80, Gen.choose(1L, 500L))
    samples(weightsGen, 5, seed = 7).foreach { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
      // split: every row lands in exactly one named split (fractions sum to 1)
      val split = Sampling.hashSplit(df, Seq("id"),
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      assert(split.filter(col("split").isNull).count() == 0)
      assert(split.count() == ws.size)
      // packing: the binned rows are exactly the input multiset
      val packed = Sampling.packByBudget(df, "w", 700L, Seq("id"), groups = 3)
      assert(packed.count() == ws.size)
      assert(packed.select("id").distinct().count() == ws.size)
      val binned = packed.groupBy("pack_group", "pack_seq")
        .agg(org.apache.spark.sql.functions.sum("w").as("tot")).collect()
      val maxW = ws.max
      binned.foreach(r =>
        assert(r.getAs[Long]("tot") <= 700L + maxW,
          s"bin ${r.get(0)}/${r.get(1)} holds ${r.get(2)}"))
    }
  }

  test("salted join property: row-identical to the plain join on random skews") {
    import graft.operators.SkewJoin
    // random fact frames with a planted hot key plus a scattered tail,
    // random dim coverage (some fact keys unmatched, some dim keys unused)
    val factGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(300, for {
        hot <- Gen.prob(0.7) // ~70% of rows on key 0
        k <- if (hot) Gen.const(0L) else Gen.choose(1L, 25L)
        v <- Gen.choose(0L, 999L)
      } yield (k, v))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    samples(factGen, 4, seed = 11).foreach { rows =>
      val fact = rows.toDF("k", "v")
      val dim = (0L until 18L).map(k => (k, s"d$k")).toDF("k", "label")
      for (jt <- Seq("inner", "left", "left_semi", "left_anti");
           salt <- Seq(2, 7)) {
        val plain = canon(fact.join(dim, Seq("k"), jt))
        val salted = canon(SkewJoin.saltedJoin(fact, dim, Seq("k"), salt, jt))
        assert(salted == plain, s"drift for $jt salt=$salt")
      }
    }
  }

  test("k-means assignment plans ZERO exchanges (pure narrow scoring map)") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = graft.ops.KMeans.Model(
      Array.tabulate(4)(i => Array.tabulate(64)(j => (i * 64 + j) / 256.0)), 6)
    val plan = graft.ops.KMeans.assign(embs, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment should be a narrow map, found a shuffle:\n$plan")
  }

  test("anchorTerms: count and top-k window share ONE exchange") {
    import spark.implicits._
    val edges = (0 until 2000)
      .map(i => (i.toLong, (i % 37).toLong, s"w${i % 11} w${i % 5} common"))
      .toDF("src", "dst", "anchor")
    val plan = graft.ops.Graph.anchorTerms(edges, "dst", "anchor", k = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly one exchange, found $exchanges:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k did not lower to WindowGroupLimit:\n$plan")
  }

  test("prunePrototypes: count and rank windows share the cluster exchange") {
    import spark.implicits._
    val assigned = (0 until 1000)
      .map(i => (i.toLong, i % 7, (i * 31 % 997).toDouble))
      .toDF("id", "cluster_id", "dist")
    val plan = graft.ops.KMeans.prunePrototypes(assigned, "id", 0.3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly one exchange, found $exchanges:\n$plan")
  }

  test("winnowing selection plans ZERO exchanges; HLL sketch exactly one") {
    import spark.implicits._
    val docs = (0 until 50)
      .map(i => (i.toLong, s"document number $i with some shared text body"))
      .toDF("doc_id", "text")
    val wn = graft.ops.Winnow.fingerprints(docs, "doc_id", "text", 8, 8)
      .queryExecution.executedPlan.toString
    assert(!wn.contains("Exchange"),
      s"fingerprint selection must stay doc-local (narrow):\n$wn")
    val hll = graft.ops.Hll.sketchBy(docs, Seq.empty, "text", 256)
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(hll).size
    assert(ex == 1, s"HLL sketch is ONE hash aggregation, found $ex:\n$hll")
  }

  test("rrf fusion: one aggregation exchange + one window cut, group-limit lowered") {
    import spark.implicits._
    val la = (0 until 200).map(i => (i % 10L, i.toLong, i % 20 + 1))
      .toDF("q", "d", "r")
    val lb = (0 until 200).map(i => (i % 10L, (i + 7).toLong, i % 20 + 1))
      .toDF("q", "d", "r")
    val plan = graft.ops.Similarity.rrfFuse(Seq(la, lb), "q", "d", "r")
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex <= 2,
      s"fusion should need at most agg + window exchanges, found $ex:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank <= topK did not lower to WindowGroupLimit:\n$plan")
  }

  test("projections plan ZERO exchanges; covariance exactly one") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val jl = graft.ops.Projection.signProject(embs, "embedding", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!jl.contains("Exchange"),
      s"JL projection should be a narrow map:\n$jl")
    val model = graft.ops.Projection.PcaModel(
      Array.fill(64)(0.0),
      Array.tabulate(4)(i => Array.tabulate(64)(j =>
        if (j == i) 1.0 else 0.0)),
      Array.fill(64)(1.0), 6)
    val pc = graft.ops.Projection.pcaProject(embs, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("Exchange"),
      s"PCA projection should be a narrow map:\n$pc")
    val cov = graft.ops.Projection.covarianceUpper(embs, "embedding", 64)
      .queryExecution.executedPlan.toString
    // designed round-13 shape: ONE round-robin repartition of the skinny
    // vectors (parallelism must come from rows, not file splits) + ONE
    // cell aggregation exchange; the heavy per-partition partial sums
    // LONGS (unscaledround12), decimals appear only above the exchange
    // (the planner may or may not insert a second cell-sized exchange for
    // the (i, j, pid) partial level — both are cells-only, never terms)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(cov).size
    val rrEx = "Exchange RoundRobinPartitioning".r.findAllIn(cov).size
    assert(hashEx <= 2 && rrEx == 1,
      s"covariance should repartition once + shuffle only cell rows, " +
        s"found hash=$hashEx roundrobin=$rrEx:\n$cov")
    assert(cov.contains("sum(unscaledround12"),
      s"the heavy partials must sum unscaled longs:\n$cov")
  }

  test("quantile normalize + zipf fit: NO unpartitioned window in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qn = graft.transform.Standardize.quantileNormalizeByGroup(
      docs.select($"doc_id", $"lang", length($"text").cast("double").as("score")),
      "lang", "score")
    val qnWins = qn.queryExecution.sparkPlan.collect {
      case w: WindowExec => w }
    assert(qnWins.nonEmpty, "expected the per-group rank windows")
    assert(qnWins.forall(_.partitionSpec.nonEmpty),
      "quantile normalization must not plan a global (unpartitioned) window")
    // semantic sanity on the rewritten path: normalized values are drawn
    // from the pooled score set (quantile normalization substitutes real
    // pooled values, never interpolations), and within a group the map
    // is monotone in the raw score
    val scoreSet = qn.select($"score").distinct().as[Double].collect().toSet
    val rows = qn.select($"lang", $"score", $"normalized")
      .as[(String, Double, Double)].collect()
    assert(rows.forall { case (_, _, n) => scoreSet.contains(n) },
      "normalized values must come from the pooled distribution")
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.sliding(2).forall {
        case Array((_, s1, n1), (_, s2, n2)) => s1 > s2 || n1 <= n2
        case _ => true
      }, s"group $g: normalization must be monotone in the raw score")
    }
    val zf = graft.ops.TextOps.zipfFit(docs, "text")
    assert(globalWindows(zf).isEmpty,
      "zipf rank must come from the distributed sort, not a global window")
    val row = zf.head()
    assert(row.getAs[Long]("vocab") > 0 && row.getAs[Double]("slope") < 0,
      "zipf fit should produce a negative slope on natural-ish text")
  }

  test("round-13 rank/selection ops: NO unpartitioned window in any plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // stride interleaving: one PER-DOMAIN rank window + a global SORT
    // (range-partitioned — allowed), never a global window
    val il = graft.ops.Sampling.interleaveByWeight(
      docs.select($"doc_id", $"source"), Seq("doc_id"), "source",
      docs.select("source").distinct().collect()
        .map(_.getString(0) -> 0.5).toMap)
    assert(globalWindows(il).isEmpty,
      s"interleave must not plan a global window")
    // equal-frequency bins: ranks via the partition-offset RDD pass
    val bins = graft.transform.Standardize.discretizeEqualFreq(
      docs.select($"doc_id", $"n_chars".cast("double").as("x")), "x", 8)
    assert(globalWindows(bins).isEmpty,
      "equal-freq binning must not plan a global window")
    // 2-D pareto front: value-level offset pass, no global window
    val front = graft.ops.Skyline.paretoFront2D(
      docs.select($"doc_id", $"n_chars".cast("double").as("x"),
        ($"doc_id" % 97).cast("double").as("y")), "x", "y")
    assert(globalWindows(front).isEmpty,
      "pareto front must not plan a global window")
  }

  test("gopher/c4 rule filters: narrow codegen maps, zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (plan <- Seq(
      graft.ops.QualityRules.gopherFlags(docs, "doc_id", "text")
        .queryExecution.executedPlan,
      graft.ops.QualityRules.c4Clean(docs, "doc_id", "text")
        .queryExecution.executedPlan)) {
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"a per-document rule filter must not shuffle:\n$plan")
      val codegen = plan.collect { case w: WholeStageCodegenExec => w }
      assert(codegen.nonEmpty,
        s"rule columns should ride whole-stage codegen:\n$plan")
    }
  }

  test("global top-fraction cut: threshold filter plan, NO window; exact boundary") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source", $"n_chars".cast("double").as("score"))
    val cut = graft.ops.Sampling.topFractionExact(
      docs, $"score", $"doc_id", frac = 0.3)
    // the returned frame is the original scan under a broadcast-threshold
    // filter — no WindowExec of ANY kind may appear (the r14/r15 weak
    // item was precisely a global row_number window here)
    val wins = cut.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty,
      s"top-fraction cut must be a pure threshold filter, found windows:\n" +
        cut.queryExecution.sparkPlan)
    // exact-boundary semantics vs a local reference sort, ties included
    val all = docs.as[(Long, String, Double)].collect()
    val k = math.ceil(0.3 * all.length).toLong
    val expect = all.sortBy { case (id, _, s) => (-s, id) }.take(k.toInt)
      .map(_._1).toSet
    val got = cut.select($"doc_id").as[Long].collect().toSet
    assert(got == expect,
      s"kept set diverges from the reference order statistic: " +
        s"${(got -- expect).take(5)} vs ${(expect -- got).take(5)}")
    // a null score is never kept
    val withNull = docs.withColumn("score",
      when($"doc_id" % 7 === 0, lit(null)).otherwise($"score"))
    val cutN = graft.ops.Sampling.topFractionExact(
      withNull, $"score", $"doc_id", frac = 0.5)
    assert(cutN.filter($"score".isNull).count() == 0L,
      "null scores must never survive the cut")
  }

  test("corpus divergence: NO unpartitioned window; totals broadcast onto the vocabulary") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val dv = graft.ops.CorpusOverlap.divergence(a, "text", b, "text")
    // the web-scale vocabulary table must never funnel through one
    // task: the three scalars come from a broadcast 1-row aggregate
    val wins = dv.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty,
      "divergence must not plan any window over the vocabulary table")
    assert(dv.queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin") ||
      dv.queryExecution.sparkPlan.toString.contains("BroadcastExchange"),
      "the 1-row totals must come back via broadcast")
    val row = dv.head()
    val js = row.getAs[Double]("js")
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-9,
      s"JS divergence must sit in [0, ln 2], got $js")
    assert(row.getAs[Double]("kl_ab") >= 0.0 &&
      row.getAs[Double]("kl_ba") >= 0.0)
  }

  test("round-14 session-2 ops: windows partitioned or bounded, never global") {
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    // RFM: groupBy + one percentile agg + broadcast thresholds — no
    // window anywhere (the quintile is comparison arithmetic)
    val rfm = graft.ops.Segmentation.rfmScores(
      ev.select($"user_id".as("cust"), $"ts".as("odate"),
        $"value".as("amt")), "cust", "odate", "amt")
    assert(rfm.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.isEmpty,
      "rfm must not plan any window")
    // inter-event gaps: the lag window is per-(type, user) — partitioned
    val gaps = graft.ops.EventAnalytics.interEventGaps(ev)
    assert(globalWindows(gaps).isEmpty,
      "inter-event gaps must not plan a global window")
    // LTV: the cumulative sweep is partitioned BY COHORT
    val ltv = graft.ops.EventAnalytics.ltvCurve(ev)
    assert(globalWindows(ltv).isEmpty,
      "ltv must not plan a global window")
    // linear attribution: k comes from a per-CONVERSION window
    val att = graft.ops.EventAnalytics.attributeRevenueLinear(
      ev, Seq("view", "click"), "purchase", windowSeconds = 172800L)
    assert(globalWindows(att).isEmpty,
      "linear attribution must not plan a global window")
    // funnel step timing and weekday ANOVA: pure groupBy shapes
    val fst = graft.ops.EventAnalytics.funnelStepTimes(
      ev, Seq("view", "click", "purchase"), window = "48 hours")
    assert(fst.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.isEmpty,
      "funnel timing must not plan any window")
    // lift table: EXACTLY one global window, and only over the
    // bins-bounded bucket table (the documented exception) — more than
    // one would mean a data-sized frame crept in
    val lift = graft.stats.Eval.liftTable(
      ev.select(($"value").as("s"),
        ($"event_id" % 2).cast("int").as("y")), $"s", $"y")
    assert(globalWindows(lift).size == 1,
      "lift table plans exactly one (bins-bounded) cumulative window")
  }

  test("round-15 ops: windows partitioned or bounded, never data-global") {
    import org.apache.spark.sql.execution.window.WindowExec
    def wins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    def globalWins(df: org.apache.spark.sql.DataFrame) =
      wins(df).filter(_.partitionSpec.isEmpty)
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // rank scans (signed-rank, wilcoxon's distinct-|d| pass) ride the
    // RDD partition-offset idiom — those ops never build a plan window,
    // so nothing to pin there. The ones below DO plan windows:
    // hodges-lehmann sweeps the bounded distinct-difference table only
    val hl = graft.stats.RankTests.hodgesLehmannShift(
      ev.select(($"user_id" % 2 === 0).as("arm"),
        ($"event_id" % 13).cast("double").as("v")), $"arm", $"v")
    assert(globalWins(hl).size == 1,
      "HL plans exactly one window, over the capped diff table")
    // average precision: one window over DISTINCT scores (the auc
    // contract) — global by design but score-domain-bounded
    val ap = graft.stats.Eval.averagePrecision(
      ev.select(($"event_id" % 7).cast("double").as("s"),
        ($"event_id" % 2).cast("int").as("y")), $"s", $"y")
    assert(globalWins(ap).size == 1,
      "AP plans exactly one distinct-score window")
    // hurst: cumulative deviations are block-PARTITIONED
    val hr = graft.ops.EventAnalytics.hurstRS(ev, "ts", Seq(4, 8))
    assert(globalWins(hr).isEmpty,
      "hurst cumulative sweeps must partition by block")
    // class balance: rank windows partition on the label
    val cb = graft.ops.Sampling.classBalance(emb, "vec_id", "label", "s")
    assert(wins(cb).nonEmpty && globalWins(cb).isEmpty,
      "class balance ranks within label partitions only")
    // kNN purity / TwoNN: neighbor ranks partition on the query point
    val pu = graft.ops.EmbeddingDrift.knnLabelPurity(
      emb, "vec_id", "embedding", "label", k = 2, maxVectors = 100000L)
    assert(globalWins(pu).isEmpty,
      "kNN ranks must partition by query point")
    // turnover: no window at all — a shifted full-outer join
    val to = graft.ops.EventAnalytics.userTurnover(ev)
    assert(wins(to).isEmpty, "turnover is join-shaped, never a window")
  }

  test("survival family: NO window in any plan (r16 item #2)") {
    // the curve cumulative sums/products now run as partition-offset
    // scans (the RankTests idiom) — the former single-task
    // Window.orderBy over the distinct-times table must be gone from
    // every Survival entry point, while the capped contract stays
    import org.apache.spark.sql.execution.window.WindowExec
    import graft.stats.Survival
    def wins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    val durs = (1 to 40).map(i => (i.toDouble, i % 3 min 1)) ++
      Seq((41.0, 0), (42.0, 0))
    val df = durs.toDF("t", "e")
    val km = Survival.kaplanMeier(df, col("t"), col("e"))
    assert(wins(km).isEmpty,
      "kaplanMeier must not plan any window (scan idiom)")
    val band = Survival.survivalBand(km)
    assert(wins(band).isEmpty,
      "survivalBand must not plan any window (scan idiom)")
    val summ = Survival.survivalSummary(km, tau = 30.0)
    assert(wins(summ).isEmpty,
      "survivalSummary must not plan any window (driver-literal row)")
    val two = durs.zipWithIndex.map { case ((t, e), i) =>
      (if (i % 2 == 0) "a" else "b", t, e) }.toDF("g", "t", "e")
    val lr = Survival.logRank(two, col("g"), col("t"), col("e"))
    assert(wins(lr).isEmpty,
      "logRank must not plan any window (scan countdown + hash agg)")
    // the scans preserve values: the curve equals a local reference fold
    val rows = km.orderBy("t").collect()
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, xs) => (t, xs.count(_._2 == 1).toLong,
        xs.count(_._2 == 0).toLong) }
    var atRisk = byT.map(x => x._2 + x._3).sum
    var s = 1.0
    val ref = byT.flatMap { case (t, d, c) =>
      val n = atRisk
      atRisk -= d + c
      if (d > 0) { s *= 1.0 - d.toDouble / n; Some((t, n, d, c, s)) }
      else None
    }
    assert(rows.length == ref.length, "curve step count")
    rows.zip(ref).foreach { case (r, (t, n, d, c, sv)) =>
      assert(r.getDouble(0) == t && r.getLong(1) == n &&
        r.getLong(2) == d && r.getLong(3) == c &&
        math.abs(r.getDouble(4) - sv) < 1e-6, s"$r vs ($t,$n,$d,$c,$sv)")
    }
  }
}
