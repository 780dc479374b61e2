package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degrees: per-direction counts, full-outer merged, zero-filled") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.degrees(edges).orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 0L, 2L), (4L, 1L, 0L)))
  }

  test("pageRank matches an independent driver-side reference, dangling included") {
    // 4 nodes: 0->{1,2}, 1->{2}, 2 DANGLING, 3 isolated (never linked)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")

    // independent reference: dense driver-side recurrence
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L))
    val d = 0.85
    val n = 4.0
    var ranks = Seq(0L, 1L, 2L, 3L).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val dangling = ranks.collect {
        case (v, rk) if !out.contains(v) => rk
      }.sum
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, dsts) <- out; v <- dsts)
        contrib(v) += ranks(u) / dsts.size
      ranks = ranks.keys.map(v =>
        v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }

    val got = Graph.pageRank(edges, nodes, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(got.keySet == ranks.keySet)
    for ((v, expect) <- ranks)
      assert(math.abs(got(v) - expect) < 1e-12,
        s"node $v: got ${got(v)}, expect $expect")
    // mass conserved, and link structure ranks as it must: 2 (everyone's
    // target) > 1 (one inlink) > 0 == 3 (teleport floor only)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(2L) > got(1L) && got(1L) > got(0L))
    assert(math.abs(got(0L) - got(3L)) < 1e-15)
  }

  test("iteration join reuses the persisted src-partitioned edge table") {
    // the scale claim in Graph.pageRank's scaladoc: edges shuffle ON src
    // once (repartition + persist); each iteration's rank-edge join then
    // adds exactly ONE new exchange (the rank table), not two. Broadcast
    // is disabled to force the sort-merge regime — at 100 TB the rank
    // table is node-sized and never broadcasts (at test size it would,
    // which also reuses the cache, but proves nothing about shuffles).
    val bhj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val edges = (0L until 2000L).map(i => (i % 50, (i * 7) % 50))
      .toDF("src", "dst")
    val eDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg")),
        "src")
      .repartition(col("src")).persist()
    try {
      eDeg.count()
      val ranks = (0L until 50L).toDF("node").withColumn("rank", lit(0.02))
      val joined = ranks.join(eDeg, ranks("node") === eDeg("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // look only at the FINAL adaptive plan, and only ABOVE the cache
      // leaf: the cached relation's stored build plan (which legitimately
      // holds the one-time repartition exchange) prints below it
      val finalSection = plan.split("== Initial Plan ==")(0)
      assert(finalSection.contains("InMemoryTableScan"),
        s"cached edges not used:\n$finalSection")
      val aboveCache = finalSection.split("InMemoryRelation")(0)
      val exchanges =
        "Exchange hashpartitioning".r.findAllIn(aboveCache).size
      assert(exchanges == 1,
        s"expected 1 fresh exchange (rank side only), found $exchanges:\n$aboveCache")
    } finally {
      eDeg.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bhj)
    }
  }

  test("pageRank on an edgeless graph stays exactly uniform (all dangling)") {
    val nodes = (0L until 6L).toDF("node")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Graph.pageRank(edges, nodes, iters = 3).collect()
    assert(got.length == 6)
    // (1-d)/n + d*(1/n) = 1/n at every iteration (up to float addition
    // in the dangling-mass sum)
    for (r <- got)
      assert(math.abs(r.getDouble(1) - 1.0 / 6.0) < 1e-14,
        s"edgeless rank drifted: ${r.getDouble(1)}")
  }

  test("connectedComponents: chains resolve identically on both resolver paths") {
    // chains of 4 over 0..15, plus isolated nodes 16..18
    val edges = (0L until 16L).filter(_ % 4 != 3)
      .map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L until 19L).toDF("node")
    val expect = (0L until 19L).map(i =>
      if (i < 16) i -> (i - i % 4) else i -> i).toMap
    val driver = Graph.connectedComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.connectedComponents(edges, nodes, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == expect, s"driver path drift: $driver")
    assert(dist == expect, s"distributed path drift: $dist")
  }

  test("trustRank: trust flows from seeds; unreachable non-seeds score exactly 0") {
    // 0 (seed) -> 1 -> 2; 3 -> 4 (a component no seed can reach)
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst")
    val nodes = (0L until 5L).toDF("node")
    val seeds = Seq(0L).toDF("node")
    val d = 0.85
    // independent driver-side reference of the same recurrence
    val out = Map(0L -> Seq(1L), 1L -> Seq(2L), 3L -> Seq(4L))
    val t = Map(0L -> 1.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0)
    var r = t
    for (_ <- 1 to 5) {
      val dangling = r.collect { case (v, rv) if !out.contains(v) => rv }.sum
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, dsts) <- out; v <- dsts) contrib(v) += r(u) / dsts.size
      r = t.keys.map(v =>
        v -> ((1 - d) * t(v) + d * (contrib(v) + dangling * t(v)))).toMap
    }
    val got = Graph.trustRank(edges, nodes, seeds, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    for ((v, expect) <- r)
      assert(math.abs(got(v) - expect) < 1e-12,
        s"node $v: got ${got(v)}, expect $expect")
    // 3 and 4 start at t=0 and never receive seed trust: exactly 0
    assert(got(3L) == 0.0 && got(4L) == 0.0,
      s"unreachable nodes gained trust: ${got(3L)}, ${got(4L)}")
    // every node on the seed's chain holds positive trust (at 5 iters the
    // chain still sloshes — strict ordering only appears at convergence)
    assert(got(0L) > 0.0 && got(1L) > 0.0 && got(2L) > 0.0)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // a seed outside the vertex set would silently leak teleport mass —
    // must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Graph.trustRank(edges, nodes, Seq(0L, 99L).toDF("node"), iters = 2)
    }
    assert(e.getMessage.contains("teleport mass"))
  }

  test("weighted pageRank: contributions split by edge weight, not edge count") {
    // 0 ->(3) 1, 0 ->(1) 2: node 1 draws 3/4 of node 0's rank
    val edges = Seq((0L, 1L, 3.0), (0L, 2L, 1.0)).toDF("src", "dst", "w")
    val nodes = (0L until 3L).toDF("node")
    val d = 0.85
    val n = 3.0
    var r = Map(0L -> 1 / n, 1L -> 1 / n, 2L -> 1 / n)
    for (_ <- 1 to 5) {
      val dangling = r(1L) + r(2L) // both dangling
      val c = Map(1L -> r(0L) * 3.0 / 4.0, 2L -> r(0L) * 1.0 / 4.0)
      r = r.keys.map(v => v ->
        ((1 - d) / n + d * (c.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    val got = Graph.pageRank(edges, nodes, iters = 5, weightCol = Some("w"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    for ((v, expect) <- r)
      assert(math.abs(got(v) - expect) < 1e-12,
        s"node $v: got ${got(v)}, expect $expect")
    assert(got(1L) > got(2L), "weighted edge must dominate")
  }

  test("pageRankConverged: stops at the fixed point and matches long fixed-iteration runs") {
    // chain graph: genuine mixing needed; compare against a LONG
    // fixed-iteration run as the converged reference. Damping 0.5 so the
    // L1 delta (~d^k) clears 1e-8 within the default iteration budget —
    // at d=0.85 that takes ~110 iterations, too slow for a unit test
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L until 10L).toDF("node")
    val reference = Graph.pageRank(edges, nodes, iters = 45, damping = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (ranksDf, iters) =
      Graph.pageRankConverged(edges, nodes, tol = 1e-8, damping = 0.5)
    val got = ranksDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(iters < 50, s"did not converge before maxIters: $iters")
    assert(iters > 5, s"suspiciously instant convergence: $iters")
    for ((v, expect) <- reference)
      assert(math.abs(got(v) - expect) < 1e-7,
        s"node $v: converged ${got(v)} vs long-run $expect")
    // a cycle starts AT the fixed point: one iteration detects delta 0
    val cyc = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong))
      .toDF("src", "dst")
    val (_, cycIters) = Graph.pageRankConverged(
      cyc, (0L until 6L).toDF("node"), tol = 1e-12)
    assert(cycIters == 1, s"cycle should detect the fixed point: $cycIters")
  }

  test("HITS: hubs and authorities separate; matches a driver reference") {
    // 0 and 3 are hubs pointing at {1,2}; nothing links to 0/3 and 1/2
    // link nowhere — pure hub/authority separation. 4 is isolated.
    val edges = Seq((0L, 1L), (0L, 2L), (3L, 1L)).toDF("src", "dst")
    val nodes = (0L until 5L).toDF("node")
    // independent driver-side reference of the L1-normalized recurrence
    val out = Map(0L -> Seq(1L, 2L), 3L -> Seq(1L))
    val in = Map(1L -> Seq(0L, 3L), 2L -> Seq(0L))
    val ids = (0L until 5L).toSeq
    var hub = ids.map(_ -> 0.2).toMap
    var auth = ids.map(_ -> 0.2).toMap
    for (_ <- 1 to 5) {
      val aRaw = ids.map(v => v -> in.getOrElse(v, Nil).map(hub).sum).toMap
      val aSum = aRaw.values.sum
      auth = aRaw.map { case (v, a) => v -> (if (aSum == 0) 0.0 else a / aSum) }
      val hRaw = ids.map(v => v -> out.getOrElse(v, Nil).map(auth).sum).toMap
      val hSum = hRaw.values.sum
      hub = hRaw.map { case (v, h) => v -> (if (hSum == 0) 0.0 else h / hSum) }
    }
    val got = Graph.hits(edges, nodes, iters = 5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (v <- ids) {
      assert(math.abs(got(v)._1 - hub(v)) < 1e-12, s"hub drift at $v")
      assert(math.abs(got(v)._2 - auth(v)) < 1e-12, s"authority drift at $v")
    }
    // structure: 0/3 are pure hubs, 1/2 pure authorities, 4 scores zero;
    // 1 (two in-links) out-ranks 2; 0 (two good targets) out-ranks 3
    assert(got(0L)._2 == 0.0 && got(3L)._2 == 0.0)
    assert(got(1L)._1 == 0.0 && got(2L)._1 == 0.0)
    assert(got(4L) == (0.0, 0.0))
    assert(got(1L)._2 > got(2L)._2)
    assert(got(0L)._1 > got(3L)._1)
  }

  test("warm-start convergence: yesterday's ranks cut iterations; new nodes covered") {
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L until 10L).toDF("node")
    val (cold, coldIters) =
      Graph.pageRankConverged(edges, nodes, tol = 1e-8, damping = 0.5)
    // re-converging the SAME graph from its own fixed point is ~instant
    val (warm, warmIters) = Graph.pageRankConverged(edges, nodes,
      tol = 1e-8, damping = 0.5, warmStart = Some(cold))
    assert(warmIters < coldIters,
      s"warm start did not cut iterations: $warmIters vs $coldIters")
    val coldMap = cold.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val warmMap = warm.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((v, expect) <- coldMap)
      assert(math.abs(warmMap(v) - expect) < 1e-7,
        s"warm fixed point drifted at $v")
    // the graph GROWS (the daily-recrawl shape): a new node with no warm
    // rank starts at the teleport floor; mass renormalizes to 1
    val edges2 = edges.unionByName(Seq((9L, 10L)).toDF("src", "dst"))
    val nodes2 = (0L until 11L).toDF("node")
    val (grown, grownIters) = Graph.pageRankConverged(edges2, nodes2,
      tol = 1e-8, damping = 0.5, warmStart = Some(cold))
    val grownMap = grown.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(grownMap.keySet == (0L until 11L).toSet)
    assert(grownMap(10L) > 0.0)
    assert(math.abs(grownMap.values.sum - 1.0) < 1e-9,
      s"mass not conserved after growth: ${grownMap.values.sum}")
    assert(grownIters <= coldIters,
      s"warm start on the grown graph took longer than cold: $grownIters")
  }

  test("string host ids rank identically to numeric ids (the crawl shape)") {
    // same topology under both id types: 0->1, 0->2, 2 dangling, 3 isolated
    val numEdges = Seq((0L, 1L), (0L, 2L)).toDF("src", "dst")
    val numNodes = (0L until 4L).toDF("node")
    val names = Map(0L -> "a.example", 1L -> "b.example",
      2L -> "c.example", 3L -> "d.example")
    val strEdges = Seq(("a.example", "b.example"), ("a.example", "c.example"))
      .toDF("src", "dst")
    val strNodes = names.values.toSeq.toDF("node")
    val num = Graph.pageRank(numEdges, numNodes, iters = 5).collect()
      .map(r => names(r.getLong(0)) -> r.getDouble(1)).toMap
    val str = Graph.pageRank(strEdges, strNodes, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(str.keySet == num.keySet)
    // ulp-tolerant: the dangling-mass sum order differs per id type
    for ((h, expect) <- num)
      assert(math.abs(str(h) - expect) < 1e-12,
        s"string-id rank diverged at $h: ${str(h)} vs $expect")
    // trustRank too: seed by hostname
    val trust = Graph.trustRank(strEdges, strNodes,
      Seq("a.example").toDF("node"), iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(trust("d.example") == 0.0 && trust("b.example") > 0.0)
  }

  test("label propagation: two triangles bridged once resolve to two communities") {
    // triangles {0,1,2} and {10,11,12} with a single bridge 2–10; the
    // intra-triangle majority beats the one bridge vote, so each triangle
    // converges to its min id and the bridge never merges them
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
        (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
      .toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L).toDF("node") // 99 isolated
    val got = Graph.labelPropagation(edges, nodes, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L)
    assert(got(10L) == 0L || got(10L) == 10L) // bridge node may tie toward min
    assert(got(11L) == got(12L))
    assert(got(99L) == 99L) // isolated node keeps its own label
    // deterministic: a second run agrees exactly
    val again = Graph.labelPropagation(edges, nodes, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
    // direction/multiplicity invariance: reversed + duplicated edges are
    // the same undirected set, so communities are identical
    val noisy = edges.select(col("dst").as("src"), col("src").as("dst"))
      .unionByName(edges).unionByName(edges)
    val sym = Graph.labelPropagation(noisy, nodes, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sym == got)
  }

  test("pageRank on a uniform cycle stays uniform (fixed point)") {
    val n = 8
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val got = Graph.pageRank(edges, nodes, iters = 3).collect()
    for (r <- got)
      assert(math.abs(r.getDouble(1) - 1.0 / n) < 1e-12,
        s"cycle rank drifted at ${r.getLong(0)}: ${r.getDouble(1)}")
  }

  test("anchorTerms: per-target counts, count-then-term ordering, k cut") {
    val edges = Seq(
      (1L, 10L, "big data engine"),
      (2L, 10L, "data engine docs"),
      (3L, 10L, "data  platform"), // double space: still two tokens
      (4L, 11L, "zzz aaa"),
      (5L, 11L, ""),               // empty anchor contributes nothing
      (6L, 12L, "   ")             // blank anchor contributes nothing
    ).toDF("src", "dst", "anchor")
    val got = Graph.anchorTerms(edges, "dst", "anchor", k = 2)
      .orderBy("dst", "rank")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 1, "data", 3L),   // clear winner
      (10L, 2, "engine", 2L), // beats big/docs/platform (n=1) on count
      (11L, 1, "aaa", 1L),    // tie at n=1 breaks lexicographically
      (11L, 2, "zzz", 1L)))
    // target 12 had only blank anchors: absent entirely
    assert(!got.exists(_._1 == 12L))
  }

  test("triangles: K4 yields all four triples, each exactly once") {
    // complete graph on {1,2,3,4}, given as a messy directed multigraph
    // with duplicates, reversals, and a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 2L),
      (2L, 4L), (3L, 4L), (4L, 3L), (2L, 2L)).toDF("src", "dst")
    val tri = Graph.triangles(edges)
      .select(sort_array(array(col("a"), col("b"), col("c"))).as("t"))
      .collect().map(r => { val s = r.getSeq[Long](0); (s(0), s(1), s(2)) })
      .sorted.toSeq
    assert(tri == Seq((1L, 2L, 3L), (1L, 2L, 4L),
      (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: a path has none; clustering coefficients check out") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(path).count() == 0)
    // triangle + pendant: node 3 has degree 3 and one triangle ->
    // coefficient 2*1/(3*2) = 1/3; pendant node 4 (degree 1) -> null
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val cc = Graph.clusteringCoefficients(g).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          Option(r.getAs[Any]("clustering"))))).toMap
    assert(cc(1L) == ((2L, 1L, Some(1.0))))
    assert(cc(3L) == ((3L, 1L, Some(0.333333333))))
    assert(cc(4L) == ((1L, 0L, None)))
  }

  test("kCore peels a chain completely and keeps a clique intact") {
    // 2-core of a pure path is empty (endpoints peel, exposing new
    // endpoints -- the multi-round fixpoint a single pass would miss)
    val path = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(Graph.kCore(path, 2).count() == 0)
    // K4 with a pendant chain: 3-core = exactly the K4, degrees all 3
    val g = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val core = Graph.kCore(g, 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore(1) drops only isolated self-loop artifacts") {
    val g = Seq((1L, 2L), (3L, 3L)).toDF("src", "dst")
    val core = Graph.kCore(g, 1).collect().map(_.getAs[Long]("node")).sorted
    assert(core.toSeq == Seq(1L, 2L))
  }

  test("textrank: hub outranks leaves, symmetry respected, mass conserved") {
    import graft.ops.TextRank
    // "hub a hub b hub c hub": every leaf sits between two hubs, so all
    // three hub-leaf edges carry weight 2 -- hub must outrank, leaves
    // tie exactly (the trailing hub matters: without it c's edge would
    // be weight 1 and the tie breaks)
    val docs = Seq((1L, "hub a hub b hub c hub")).toDF("doc_id", "text")
    val r = TextRank.keywords(docs, "text").collect()
      .map(x => x.getAs[String]("word") -> x.getAs[Double]("rank")).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("hub") > r("a") && r("a") == r("b") && r("b") == r("c"), s"$r")
    // repeated-word self-loops are dropped: "y y y" has no edges, so
    // a second doc's words split mass evenly with y staying dangling
    val dangling = Seq((1L, "y y y"), (2L, "p q")).toDF("doc_id", "text")
    val d = TextRank.keywords(dangling, "text").collect()
      .map(x => x.getAs[String]("word") -> x.getAs[Double]("rank")).toMap
    assert(math.abs(d.values.sum - 1.0) < 1e-9)
    assert(d("p") == d("q") && d("y") < d("p"),
      s"edgeless word must keep sub-uniform teleport mass: $d")
  }

  test("bfs levels: chain distances, min over sources, hop cap, early exit") {
    import graft.ops.Graph
    // chain 1->2->3->4->5 plus a shortcut 1->4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    def levels(seeds: Seq[Long], hops: Int) =
      Graph.bfsLevels(edges, seeds.toDF("node"), hops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fromOne = levels(Seq(1L), 10)
    assert(fromOne == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2),
      s"shortcut must win: $fromOne")
    // two sources: min hop distance over both
    val two = levels(Seq(1L, 3L), 10)
    assert(two(3L) == 0 && two(4L) == 1 && two(5L) == 2 && two(2L) == 1)
    // hop cap truncates the frontier
    val capped = levels(Seq(1L), 1)
    assert(capped.keySet == Set(1L, 2L, 4L))
    // a seed with no outgoing edges terminates immediately
    assert(levels(Seq(99L), 5) == Map(99L -> 0))
  }

  test("reciprocity, assortativity, modularity: hand graphs") {
    // directed: 1->2, 2->1, 1->3: two of three edges reciprocated
    val dir = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.reciprocity(dir).head()
    assert(r.getAs[Long]("n_edges") == 3L &&
      r.getAs[Long]("n_reciprocal") == 2L &&
      r.getAs[Double]("reciprocity") == 0.666667, s"$r")
    // a star is maximally disassortative: r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(star).head()
      .getAs[Double]("assortativity") == -1.0)
    // constant-degree graph (a 3-cycle) -> undefined, loud
    intercept[IllegalArgumentException] {
      Graph.degreeAssortativity(
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    }
    // two triangles joined by a bridge, split at the bridge:
    // m = 7, e_c = 3 each, d_c = 7 each -> Q = 2*(3/7 - 0.25)
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "community")
    val q = Graph.modularity(twoTri, comm).head()
    val qWant = BigDecimal(
      BigDecimal(3.0 / 7 - 0.25).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q.getAs[Long]("n_communities") == 2L &&
      q.getAs[Long]("m_edges") == 7L &&
      q.getAs[Double]("modularity") == qWant, s"$q want $qWant")
    // a node missing from the partition must fail loudly
    intercept[IllegalArgumentException] {
      Graph.modularity(twoTri, comm.filter(col("node") =!= 6L))
    }
  }
}
