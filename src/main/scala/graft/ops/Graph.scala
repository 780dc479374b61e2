package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-crawl corpora: a crawl's host/URL graph
  * carries the strongest quality prior a pipeline has before any content
  * model runs (reference keeps no graph state — this is beyond-reference
  * pipeline surface, like the rest of ops/).
  *
  * Scale shape (100 TB crawl, ~10^10 edges): every structure here is a
  * DataFrame keyed by node or by src — nothing graph-shaped ever reaches
  * the driver. [[pageRank]] joins a node-sized rank table against an
  * edge table pre-partitioned ON src ONCE (`repartition(src)` + persist:
  * each iteration's sort-merge join reuses that exchange instead of
  * re-shuffling the edges), so one iteration costs one shuffle of the
  * rank table plus one `groupBy(dst)` of the contributions. The dangling
  * mass is a one-row aggregate per iteration, broadcast back into the
  * update plan (no driver collect on the iteration path). Lineage is
  * truncated per iteration
  * (`localCheckpoint`): iterative DataFrame plans otherwise grow Catalyst
  * analysis superlinearly with the iteration count (on a cluster, point
  * `spark.sparkContext.setCheckpointDir` at durable storage and swap in
  * `checkpoint` for failure-tolerant truncation).
  */
object Graph {

  /** In/out degree per edge endpoint: one `groupBy` per direction merged
    * full-outer — two shuffles total, both on node ids (never the edge
    * payload). Nodes with no edges at all are absent (compose with a node
    * table via left join when isolated nodes must appear). */
  def degrees(
      edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** Connected components over an undirected edge list, completing the
    * graph family (degrees, PageRank, components): delegates to the
    * scale-adaptive resolver ([[graft.ops.Clusters.assignClusters]] —
    * driver union-find below `maxDriverEdges`, distributed hash-min with
    * path halving above; both produce the identical min-id labeling).
    * Returns (node, component) for every node in `nodes`; isolated nodes
    * label themselves. */
  def connectedComponents(
      edges: DataFrame, nodes: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", nodeCol: String = "node",
      maxDriverEdges: Long = 2000000L): DataFrame =
    graft.ops.Clusters.assignClusters(
        nodes.select(col(nodeCol).as("node")), "node",
        edges.select(col(srcCol).as("a"), col(dstCol).as("b")), "a", "b",
        maxDriverEdges = maxDriverEdges)
      .select(col("id").as("node"), col("cluster_id").as("component"))

  /** Community detection via synchronous label propagation (Raghavan et
    * al. 2007, deterministic variant): labels start as node ids; each
    * iteration every node adopts the most frequent label among its
    * neighbors PLUS its own current label, ties broken toward the
    * smallest label. The own-label vote keeps singletons stable and damps
    * the two-coloring oscillation plain synchronous LPA exhibits on
    * bipartite structures; the min-label tie-break makes the whole
    * recurrence a pure function of the graph — reproducible across runs,
    * partitionings, and engines (the gate unrolls it as SQL CTEs).
    * Edges are treated as an UNDIRECTED SET: both directions, multi-edges
    * collapsed, self-loops dropped — community membership is about who
    * links whom, not how often.
    *
    * Scale shape: the symmetrized edge set shuffles ON u once
    * (repartition + persist — each iteration's join reuses that
    * exchange); one iteration then costs one label-table join + one
    * (node, lbl) groupBy, and the argmax window rides the groupBy's
    * partitioning (no extra exchange). Labels are node-sized, never
    * edge-sized; lineage truncates per iteration like [[pageRank]].
    * Returns (node, community). */
  def labelPropagation(
      edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val nodeDf = nodes.select(col(nodeCol).as("node")).distinct().persist()
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .repartition(col("u")).persist()
    var labels = nodeDf.withColumn("lbl", col("node")).persist()
    var i = 0
    while (i < iters) {
      val neigh = und.join(labels.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), col("lbl"))
      val counts = neigh.union(labels.select(col("node"), col("lbl")))
        .groupBy("node", "lbl").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("lbl").asc)
      val next = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("lbl"))
        .localCheckpoint(true) // truncate lineage per iteration
      labels.unpersist()
      labels = next
      i += 1
    }
    und.unpersist()
    nodeDf.unpersist()
    labels.withColumnRenamed("lbl", "community")
  }

  /** Standard damped PageRank with uniform dangling-mass redistribution:
    * rank'(v) = (1-d)/n + d * (Σ_{u→v} rank(u)/outdeg(u) + D/n), where D
    * is the total rank held by nodes without out-edges. `nodes` fixes the
    * vertex set (isolated nodes keep the teleport floor). Returns
    * (node, rank); ranks sum to 1 at every iteration.
    *
    * Contract: edge endpoints must be drawn from `nodes` — a dst outside
    * the vertex set silently absorbs (drops) its contribution, so ranks
    * stop summing to 1; a mass-conservation check downstream (as the
    * gr_pagerank gate runs) catches that loudly. An edgeless graph is
    * all-dangling and stays exactly uniform at 1/n. Ids keep their own
    * type end to end — string host ids (the crawl use case) work exactly
    * like numeric ids (spec-pinned); a silent numeric cast here
    * previously collapsed string vertex sets to one null node. */
  def pageRank(
      edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      damping: Double = 0.85, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", weightCol: Option[String] = None): DataFrame =
    propagate(edges, uniformTeleport(nodes, nodeCol),
      iters, damping, srcCol, dstCol, weightCol)

  /** (node, t = 1/n) — the uniform teleport vector. */
  private def uniformTeleport(nodes: DataFrame, nodeCol: String): DataFrame = {
    val nodeDf = nodes.select(col(nodeCol).as("node")).distinct()
    val n = nodeDf.count().toDouble
    require(n > 0, "empty node set")
    nodeDf.withColumn("t", lit(1.0 / n))
  }

  /** [[pageRank]] iterated to an L1 fixed point instead of a fixed
    * iteration count — the production mode at 100 TB, where the mixing
    * time isn't known in advance: stops when Σ|rank' − rank| < `tol` (or
    * at `maxIters`, loudly in the returned count). The delta is one
    * extra node-table join + scalar agg per iteration — the same cost
    * class as the dangling aggregate, nothing data-sized. Returns
    * (ranks, iterationsRun). The L1 delta contracts at ~damping^k, so
    * pick maxIters ≥ ln(tol)/ln(damping) — the defaults are consistent
    * (0.85^100 ≈ 9e-8 < 1e-6); a tighter tol needs a larger budget or a
    * smaller damping. */
  def pageRankConverged(
      edges: DataFrame, nodes: DataFrame, tol: Double = 1e-6,
      maxIters: Int = 100, damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", nodeCol: String = "node",
      weightCol: Option[String] = None,
      warmStart: Option[DataFrame] = None): (DataFrame, Int) = {
    require(tol > 0, s"tol must be positive, got $tol")
    // warm start: yesterday's (node, rank) as rank0 — the incremental
    // mode for periodic recrawls, where the graph barely moves and the
    // fixed point is a few iterations from the previous one instead of
    // ~ln(tol)/ln(damping) from uniform. Nodes absent from the warm
    // ranks (newly crawled) start at the teleport floor t; the vector is
    // then renormalized to mass 1 so convergence still contracts toward
    // THE fixed point (the iteration is linear — any mass error would
    // persist at (1-d)-scale, not decay).
    val tele = uniformTeleport(nodes, nodeCol)
    val init = warmStart.map { prev =>
      val joined = tele
        .join(prev.select(col("node"), col("rank").as("__warm")),
          Seq("node"), "left")
        .select(col("node"), col("t"),
          coalesce(col("__warm"), col("t")).as("rank"))
      val mass = joined.agg(sum("rank")).head().getDouble(0)
      require(mass > 0, "warm-start ranks sum to 0")
      joined.select(col("node"), col("t"),
        (col("rank") / lit(mass)).as("rank"))
    }
    propagateCore(edges, tele, maxIters, damping, srcCol, dstCol,
      weightCol, Some(tol), init)
  }

  /** TrustRank (Gyöngyi, Garcia-Molina, Pedersen 2004, public): PageRank
    * with the teleport vector concentrated on a TRUSTED SEED set instead
    * of uniform — trust flows outward along links, so pages reachable
    * from the seeds in few hops score high and link-isolated spam decays
    * toward zero. The standard link-level quality prior for crawl
    * corpora, feeding the same per-domain rollups as [[pageRank]].
    * Dangling mass teleports back to the seeds (random-walk-with-restart
    * semantics); trust sums to 1; non-seed nodes unreachable from any
    * seed score exactly 0. */
  def trustRank(
      edges: DataFrame, nodes: DataFrame, seeds: DataFrame, iters: Int = 5,
      damping: Double = 0.85, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", seedCol: String = "node",
      weightCol: Option[String] = None): DataFrame = {
    val nodeDf = nodes.select(col(nodeCol).as("node")).distinct()
    val seedDf = seeds.select(col(seedCol).as("node")).distinct()
    val nSeeds = seedDf.count().toDouble
    require(nSeeds > 0, "empty seed set")
    val teleport = nodeDf
      .join(seedDf.withColumn("t", lit(1.0 / nSeeds)), Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0.0)).as("t"))
    // a seed absent from `nodes` would silently shrink the teleport mass
    // below 1 (trust leaks every iteration) — fail loudly instead
    val mass = teleport.agg(sum("t")).head().getDouble(0)
    require(math.abs(mass - 1.0) < 1e-9,
      f"seed set not contained in nodes: teleport mass $mass%.6f != 1 " +
        "(some seeds missing from the vertex set)")
    propagate(edges, teleport, iters, damping, srcCol, dstCol, weightCol)
  }

  /** HITS hubs & authorities (Kleinberg 1999, public): mutual
    * reinforcement over the link graph — a good AUTHORITY is pointed to
    * by good hubs, a good HUB points at good authorities. The complement
    * to PageRank for crawl curation: authorities surface canonical
    * content pages, hubs surface link directories/aggregators (often
    * exactly what a training pipeline down-weights). Iteration:
    * a'(v) = Σ_{u→v} h(u), h'(u) = Σ_{u→v} a'(v), each L1-normalized —
    * normalization choice affects SCALE only, not ranking (Kleinberg's
    * convergence holds under any norm), and the L1 form keeps the whole
    * recurrence in +,*,/ so a SQL oracle can track it to ulps (an L2
    * norm would put sqrt parity on the cross-engine critical path).
    * Per iteration: two groupBy shuffles over the persisted
    * src-partitioned edge table plus two scalar normalization aggs.
    * Isolated nodes score 0 on both axes; returns (node, hub, authority)
    * over the full vertex set. */
  def hits(
      edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodeDf = nodes.select(col(nodeCol).as("node")).distinct().persist()
    val n = nodeDf.count().toDouble
    require(n > 0, "empty node set")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).persist()
    var scores = nodeDf
      .withColumn("hub", lit(1.0 / n))
      .withColumn("auth", lit(1.0 / n))
      .persist()
    var i = 0
    while (i < iters) {
      // authority update: sum of in-neighbor hub scores, L1-normalized
      val aRaw = scores.join(e, scores("node") === e("src"))
        .select(col("dst").as("node"), col("hub").as("c"))
        .groupBy("node").agg(sum("c").as("a"))
      val aJoined = nodeDf.join(aRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
        .persist()
      val aSum = aJoined.agg(sum("a")).head().getDouble(0)
      val aNorm = aJoined.select(col("node"),
        (if (aSum == 0.0) lit(0.0) else col("a") / lit(aSum)).as("auth"))
      // hub update: sum of out-neighbor NEW authority scores, normalized
      val hRaw = aNorm.join(e, aNorm("node") === e("dst"))
        .select(col("src").as("node"), col("auth").as("c"))
        .groupBy("node").agg(sum("c").as("h"))
      val hJoined = nodeDf.join(hRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h"))
        .persist()
      val hSum = hJoined.agg(sum("h")).head().getDouble(0)
      val next = hJoined
        .select(col("node"),
          (if (hSum == 0.0) lit(0.0) else col("h") / lit(hSum)).as("hub"))
        .join(aNorm, Seq("node"))
        .select(col("node"), col("hub"), col("auth"))
        .localCheckpoint(true) // truncate lineage per iteration
      aJoined.unpersist()
      hJoined.unpersist()
      scores.unpersist()
      scores = next
      i += 1
    }
    e.unpersist()
    nodeDf.unpersist()
    scores.withColumnRenamed("auth", "authority")
  }

  /** Shared damped-propagation core: power iteration of
    * rank'(v) = (1-d)·t(v) + d·(Σ_{u→v} rank(u)·w(u,v)/W(u) + D·t(v))
    * over a teleport vector `t` with Σt = 1 (uniform t = PageRank;
    * seed-concentrated t = TrustRank); rank0 = t. `weightCol` weights
    * each out-edge (host graphs: link multiplicity); W(u) = Σ out-weights
    * — unweighted edges use w = 1.0, which reduces bit-exactly to
    * rank/outdeg. See the object scaladoc for the per-iteration cost
    * shape. */
  private def propagate(
      edges: DataFrame, nodeT: DataFrame, iters: Int, damping: Double,
      srcCol: String, dstCol: String,
      weightCol: Option[String] = None): DataFrame =
    propagateCore(edges, nodeT, iters, damping, srcCol, dstCol,
      weightCol, tol = None)._1

  private def propagateCore(
      edges: DataFrame, nodeT: DataFrame, iters: Int, damping: Double,
      srcCol: String, dstCol: String, weightCol: Option[String],
      tol: Option[Double],
      init: Option[DataFrame] = None): (DataFrame, Int) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst"), w.as("w"))
    // static per-iteration inputs, shuffled ON src once and persisted:
    // (src, dst, w, deg) — the degree join happens here, not in the loop
    val deg = e.groupBy("src").agg(sum("w").as("deg"))
    val eDeg = e.join(deg, "src").repartition(col("src")).persist()
    // DANGLING membership is STATIC (a node's out-degree never changes
    // across iterations), so it is computed ONCE here as a boolean on the
    // node table instead of re-running a ranks×degree anti-join inside
    // every iteration (r19: the per-iteration anti-join added a broadcast
    // build + join pass per iteration whose inputs never changed —
    // guide §1.2 "don't compute things you throw away"). The dangling
    // MASS each iteration is then a one-row aggregate over the
    // checkpointed rank vector itself.
    val nodeDf = nodeT
      .join(deg.select(col("src").as("node"), lit(true).as("__out")),
        Seq("node"), "left")
      .select(col("node"), col("t"),
        coalesce(col("__out"), lit(false)).as("__out"))
      .persist()
    // rank0: the teleport vector, unless a warm start supplies
    // (node, t, rank) directly (the flag joins on once at setup)
    var ranks = init
      .map(_.join(nodeDf.select("node", "__out"), Seq("node")))
      .getOrElse(nodeDf.withColumn("rank", col("t")))
      .persist()
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      // rank trapped in dangling nodes this iteration: one-row aggregate
      // over the rank vector (no join — membership is the static flag).
      // Shipped into the update plan as a broadcast scalar instead of a
      // driver collect — the same double, but the iteration then runs as
      // ONE action (the eager checkpoint below) instead of two driver
      // barriers per iteration (r18: the barrier split showed up as ~half
      // of gr_pagerank's wall time being driver gaps between jobs).
      val dangling = ranks
        .agg(coalesce(sum(when(!col("__out"), col("rank"))), lit(0.0))
          .as("__dangling"))
      val contribs = ranks.join(eDeg, ranks("node") === eDeg("src"))
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      val next = nodeDf.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("t"), col("__out"),
          (lit(1.0 - damping) * col("t") + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("__dangling") * col("t")))
            .as("rank"))
        .localCheckpoint(true) // truncate lineage per iteration
      tol.foreach { eps =>
        val delta = next
          .join(ranks.select(col("node"), col("rank").as("prev")), "node")
          .agg(sum(abs(col("rank") - col("prev")))).head().getDouble(0)
        converged = delta < eps
      }
      ranks.unpersist()
      ranks = next
      i += 1
    }
    eDeg.unpersist()
    nodeDf.unpersist()
    (ranks.drop("t").drop("__out"), i)
  }

  /** Inbound anchor-term profile per target page: the top-`k` terms (by
    * count, ties to the lexicographically first term) across the anchor
    * text of every link INTO each `dstCol` — what the web's authors call
    * the page, one of the strongest page-description signals a crawl
    * carries (and orthogonal to the page's own text). Returns
    * (dst, rank, term, n).
    *
    * ONE exchange: the exploded terms are repartitioned on dst up front,
    * so the (dst, term) count (clustered by a superset of the partition
    * key) and the per-dst top-k window both reuse that partitioning, and
    * the rank ≤ k filter lowers to WindowGroupLimit (per-partition k-heap
    * before any data moves). */
  def anchorTerms(edges: DataFrame, dstCol: String, anchorCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val terms = edges
      .select(col(dstCol).as("dst"),
        explode(TextOps.tokens(col(anchorCol))).as("term"))
      .filter(col("term") =!= "")
      .repartition(col("dst"))
    val w = Window.partitionBy("dst").orderBy(col("n").desc, col("term"))
    terms.groupBy("dst", "term").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("dst", "rank", "term", "n")
  }

  /** The undirected simple graph underlying a (possibly directed,
    * multi-edge, self-looping) edge list: distinct canonical pairs
    * (u < v), self-loops dropped. One distinct — the shared first step
    * of [[triangles]] and [[kCore]]. */
  def undirect(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Exact triangle enumeration over the undirected simple graph —
    * the compact-forward algorithm (Latapy 2008; Cohen's MapReduce
    * formulation 2009 — both public): orient every undirected edge from
    * the smaller to the larger endpoint under the total order
    * (degree, node), build wedges by joining oriented edges on their
    * source, and close each wedge with a third oriented-edge join. Each
    * triangle appears EXACTLY once (its vertices sorted by the order).
    * Returns (a, b, c) node triples, a/b/c in orientation order.
    *
    * Why orientation matters at 100 TB: naive wedge counting does
    * Σ deg(v)² work, which a single celebrity node turns into a
    * quadratic hot key. Orienting by degree bounds every out-degree by
    * O(√m), so wedge volume is O(m^1.5) worst-case and the three joins
    * shuffle ids only — the textbook mitigation, not a heuristic. */
  def triangles(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // the simple graph is consumed three times (degrees + both sides of
    // the orientation) and the oriented table three more (both wedge
    // arms + the closing join): LOCAL CHECKPOINTS materialize each once
    // instead of re-deriving the whole upstream chain per reference —
    // without them the plan re-expands the edge derivation ~9× (plan
    // audit; the ContextCleaner frees the blocks when the result is
    // GC'd). Eager like [[kCore]]: calling triangles() runs the two
    // preparation jobs immediately.
    val und = undirect(edges, srcCol, dstCol).localCheckpoint()
    // undirected degree per node, joined to both endpoints to compute the
    // orientation (deg, id) locally per edge
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("d", "du"), Seq("u"))
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("d", "dv"), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      // the wedge join needs (deg, id) of both endpoints again to order
      // the wedge arms; carry the target's order key on the edge
      .join(deg.withColumnRenamed("node", "t")
        .withColumnRenamed("d", "dt"), Seq("t"))
      .localCheckpoint()
    val a = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val b2 = oriented.select(col("s"), col("t").as("c"), col("dt").as("dc"))
    val wedges = a.join(b2, Seq("s"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    wedges
      .join(oriented.select(col("s").as("b"), col("t").as("c")),
        Seq("b", "c"))
      .select(col("s").as("a"), col("b"), col("c"))
  }

  /** Per-node triangle count and local clustering coefficient
    * 2·t / (d·(d−1)) over the undirected simple graph (d ≥ 2, else
    * null), the page-quality companion to [[pageRank]] — link farms
    * and spam clusters sit at coefficient extremes. Returns
    * (node, degree, n_triangles, clustering) for every node with at
    * least one edge; the coefficient rounds to 9 so both engines emit
    * identical doubles. */
  def clusteringCoefficients(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = undirect(edges, srcCol, dstCol)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangles(edges, srcCol, dstCol)
    val perNode = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 9)).as("clustering"))
  }

  /** Link prediction over the undirected simple graph — the classic
    * neighborhood scores (Liben-Nowell & Kleinberg 2003 — public) for
    * every NON-ADJACENT pair sharing at least one neighbor: common
    * neighbors, Adamic–Adar Σ_w 1/ln(deg w), and neighborhood Jaccard
    * |Γu ∩ Γv| / |Γu ∪ Γv|. The crawl/recommendation primitive: which
    * missing edges does the structure predict.
    *
    * Scale shape: one wedge self-join through each MIDDLE node — volume
    * Σ_w deg(w)², which one celebrity node turns quadratic, so middles
    * above `maxMiddleDegree` are EXCLUDED (default 10,000; 0 disables).
    * That is the standard Adamic–Adar truncation, not just a cost cap:
    * a super-hub's contribution per wedge is 1/ln(d) → vanishing, while
    * its wedge count is d² → dominant — the signal-to-work ratio on hubs
    * is the worst in the graph. The exclusion is DOCUMENTED BEHAVIOR
    * (scores are "over the ≤cap-degree middle graph"); the per-term
    * rounded-ln decimal fold keeps the AA sum cross-engine exact.
    * Returns (u, v, common_neighbors, deg_u, deg_v, adamic_adar,
    * jaccard); u < v; existing edges never appear. */
  def linkPrediction(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxMiddleDegree: Int = 10000): DataFrame = {
    // consumed by the wedge arms AND the non-adjacency anti-join:
    // localCheckpoint materializes the simple graph once (the
    // [[triangles]] discipline)
    val und = undirect(edges, srcCol, dstCol).localCheckpoint()
    val adj = und.select(col("u").as("w"), col("v").as("n"))
      .unionAll(und.select(col("v").as("w"), col("u").as("n")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
    val mids = if (maxMiddleDegree > 0)
      deg.filter(col("d") <= maxMiddleDegree) else deg
    val arms = adj.join(mids, Seq("w"))
    // a wedge needs two distinct arms, so every surviving middle has
    // d >= 2 and 1/ln(d) is finite
    val wedges = arms.select(col("w"), col("n").as("u"), col("d"))
      .join(arms.select(col("w"), col("n").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val cn = wedges.groupBy("u", "v").agg(
      count(lit(1)).as("common_neighbors"),
      sum(round(lit(1.0) / log(col("d").cast("double")), 9)
        .cast("decimal(38,12)")).cast("double").as("__aa"))
    val newPairs = cn.join(und, Seq("u", "v"), "left_anti")
    newPairs
      .join(deg.select(col("w").as("u"), col("d").as("deg_u")), Seq("u"))
      .join(deg.select(col("w").as("v"), col("d").as("deg_v")), Seq("v"))
      .select(col("u"), col("v"), col("common_neighbors"),
        col("deg_u"), col("deg_v"),
        round(col("__aa"), 6).as("adamic_adar"),
        round(col("common_neighbors").cast("double") /
          (col("deg_u") + col("deg_v") - col("common_neighbors")), 6)
          .as("jaccard"))
  }

  /** The k-core of the undirected simple graph (Seidman 1983 — public):
    * the maximal subgraph where every node has degree ≥ k, computed by
    * the standard peeling fixpoint — drop all nodes with degree < k,
    * recompute degrees in the induced subgraph, repeat until stable.
    * The web-quality workhorse: high-core pages sit in densely
    * interlinked regions, low-core pages hang off the periphery
    * (crawl-frontier and spam triage both key on it).
    *
    * Returns (node, degree) of the surviving subgraph (degree WITHIN
    * the core). Each round is two id-only shuffles (a semi-join of
    * edges against surviving nodes + a degree count); rounds needed =
    * peel depth, which is small for web-like graphs (cores nest). The
    * loop stops when the node count is stable; `maxIters` bounds a
    * pathological chain (fails loudly rather than looping forever).
    * Intermediate edge sets are persisted and released round-to-round
    * (the [[pageRank]] iteration discipline). */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxIters: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Each round's edge set is rebuilt FROM the previous round's five
    // times over (the main input plus two semi-joins whose keep side
    // unions the same edges twice), so carrying plain lineage grows the
    // logical plan 5^rounds wide — the driver dies rendering the plan
    // string long before any data moves (observed at 7 peels). Peel
    // state is therefore LOCALLY CHECKPOINTED every round: lineage
    // truncates to the materialized blocks, keeping every round's plan
    // constant-size. (Local — not reliable — checkpointing trades
    // executor-loss recovery for zero disk round-trips; peels are cheap
    // to restart from scratch, which is the right trade for a
    // maintenance-pass operator. The returned core holds the final
    // round's blocks.)
    var cur = undirect(edges, srcCol, dstCol).localCheckpoint()
    var n = -1L
    var iters = 0
    while (iters < maxIters) {
      val deg = cur.select(col("u").as("node"))
        .unionAll(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      val keep = deg.filter(col("degree") >= k).localCheckpoint()
      val kn = keep.count()
      if (kn == n || kn == 0) {
        cur.unpersist(blocking = false)
        return keep
      }
      n = kn
      iters += 1
      val next = cur
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
      cur.unpersist(blocking = false)
      keep.unpersist(blocking = false)
      cur = next
    }
    throw new IllegalStateException(
      s"kCore(k=$k) did not reach a fixpoint in $maxIters peels")
  }

  /** Multi-source BFS hop levels (SSSP on unit weights) from a seed
    * set, bounded at `maxHops` — "what can this spam hub reach in ≤ k
    * clicks", the reachability primitive under TrustRank-style seed
    * analyses. Directed edges, level = fewest hops from ANY seed.
    *
    * Scale shape: classic frontier expansion — per hop ONE
    * frontier⋈edges join (shuffle keyed on src) + one left_anti against
    * the visited set; the frontier is node-sized, lineage truncates per
    * hop (`localCheckpoint`), and the loop exits early on an empty
    * frontier. A SQL oracle replays it as a bounded recursive CTE —
    * iterative Spark joins vs WITH RECURSIVE is a genuine
    * cross-paradigm differential.
    *
    * Returns (node, level) for every node reached within `maxHops`
    * (seeds at level 0), ordered by node. */
  def bfsLevels(
      edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops in [1,64]: $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src")).persist()
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .filter(col("node").isNotNull)
      .select(col("node"), lit(0).as("level"))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 1
    try {
      while (hop <= maxHops && frontier.limit(1).count() > 0) {
        val next = frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .select(col("node"), lit(hop).as("level"))
          .localCheckpoint(true) // truncate lineage per hop
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
        hop += 1
      }
      visited.orderBy("node")
    } finally e.unpersist(blocking = false)
  }

  /** Edge reciprocity of the DIRECTED graph (Garlaschelli & Loffredo
    * 2004 popularized the corrected form; the raw ratio here is the
    * classic definition, public): the fraction of directed edges whose
    * reverse edge also exists. Crawl-graph intuition: mutual links are
    * navigation/template structure, one-way links are endorsements —
    * a reciprocity spike inside a host flags link farms and boilerplate
    * that PageRank-family scores then overvalue.
    *
    * One distinct edge pass + one self-join on the reversed key (both
    * sides shuffle on the same (src, dst)-swapped hash — no driver
    * state). Self-loops are excluded. Returns one row (n_edges,
    * n_reciprocal, reciprocity round-6). */
  def reciprocity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
      .distinct()
    val rev = e.select(col("d").as("s"), col("s").as("d"))
    val n = e.count()
    require(n > 0, "reciprocity needs at least one non-loop edge")
    val recip = e.intersect(rev).count()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((n, recip,
        BigDecimal(recip.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
      .toDF("n_edges", "n_reciprocal", "reciprocity")
  }

  /** Degree assortativity of the undirected simple graph (Newman 2002,
    * public): the Pearson correlation of endpoint degrees over every
    * edge counted in both orientations. Positive = hubs link hubs
    * (social-like), negative = hubs link leaves (web/crawl-like) —
    * the one-number structure check that tells you whether hub-removal
    * sampling will shatter the graph.
    *
    * Degrees come from one groupBy over the undirected edge set; the
    * ordered-pair moment sums (Σj, Σjk, Σj²) are exact integers folded
    * in decimal (degree products overflow a long on celebrity nodes),
    * and r is fixed double arithmetic — oracle-replayable. By the
    * both-orientations symmetry Σj = Σk, so three sums suffice.
    * Returns one row (n_edges_undirected, assortativity round-6);
    * loud when degrees are constant (r undefined). */
  def degreeAssortativity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = undirect(edges, srcCol, dstCol).persist()
    try {
      val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val m = und.count()
      require(m > 0, "assortativity needs at least one edge")
      val dec = "decimal(38,0)"
      // both orientations: (j,k) and (k,j) for every undirected edge
      val pairs = und
        .join(deg.select(col("node").as("u"), col("deg").as("ju")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("jv")), "v")
        .select(explode(array(
          struct(col("ju").as("j"), col("jv").as("k")),
          struct(col("jv").as("j"), col("ju").as("k")))).as("p"))
        .select(col("p.j").as("j"), col("p.k").as("k"))
      val s = pairs.agg(
        count(lit(1)).as("m2"),
        sum(col("j").cast(dec)).as("sj"),
        sum(col("j").cast(dec) * col("k")).as("sjk"),
        sum(col("j").cast(dec) * col("j")).as("sjj"))
        .head()
      val m2 = s.getAs[Long]("m2").toDouble
      def d(i: String) = s.getAs[java.math.BigDecimal](i).doubleValue
      val mj = d("sj") / m2
      val num = d("sjk") / m2 - mj * mj
      val den = d("sjj") / m2 - mj * mj
      require(den > 0.0,
        "regular graph (constant degree) - assortativity undefined")
      val spark = edges.sparkSession
      import spark.implicits._
      Seq((m, BigDecimal(num / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
        .toDF("n_edges_undirected", "assortativity")
    } finally und.unpersist(blocking = false)
  }

  /** Average-neighbor-degree curve knn(k) (Pastor-Satorras, Vázquez &
    * Vespignani 2001, public): for each degree class k, the mean over
    * degree-k nodes of their neighbors' average degree — the FULL curve
    * behind [[degreeAssortativity]]'s single correlation (a flat curve
    * = no degree mixing, decreasing = hub-to-leaf crawl structure,
    * and a bump isolates WHICH degree class mixes unusually — the link-
    * farm signature).
    *
    * Degrees ride one groupBy over the undirected edge set; neighbor
    * sums are one join of the both-orientations pair table against the
    * degree table (exact integers); per-node means are exact rationals
    * rounded to 9, folded as decimals per degree class. Returns
    * (degree, n_nodes, avg_neighbor_degree) ordered by degree,
    * round-6. */
  def avgNeighborDegree(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = undirect(edges, srcCol, dstCol).persist()
    try {
      require(und.limit(1).count() > 0, "needs at least one edge")
      val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val pairs = und
        .select(col("u").as("a"), col("v").as("b"))
        .unionByName(und.select(col("v").as("a"), col("u").as("b")))
      val perNode = pairs
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .groupBy("a").agg(sum(col("db")).as("nsum"), count(lit(1)).as("nd"))
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .select(col("da").as("degree"),
          round(col("nsum").cast("double") / col("nd"), 9).as("knn"))
      perNode.groupBy("degree").agg(
          count(lit(1)).as("n_nodes"),
          round(sum(col("knn").cast("decimal(38,12)")).cast("double")
            / count(lit(1)), 6).as("avg_neighbor_degree"))
        .orderBy("degree")
    } finally und.unpersist(blocking = false)
  }

  /** Newman–Girvan modularity (Newman & Girvan 2004, public) of a given
    * node partition over the undirected simple graph: Q = Σ_c (e_c/m −
    * (d_c/2m)²), where e_c counts intra-community edges, d_c sums
    * community degrees, m the undirected edge count. THE acceptance
    * number for any clustering of the link graph ([[labelPropagation]],
    * [[connectedComponents]], host-level groupings): Q ≈ 0 means the
    * partition explains nothing beyond chance.
    *
    * Shape: degrees and intra-edge counts ride two groupBys keyed by
    * node/community; nodes missing from the partition fail loudly
    * (a silently-dropped node deflates d_c and inflates Q). Per-
    * community terms round to 9 and fold as decimals — oracle-
    * replayable. Returns one row (n_communities, m_edges, modularity
    * round-6). */
  def modularity(edges: DataFrame, communities: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", commCol: String = "community"): DataFrame = {
    val und = undirect(edges, srcCol, dstCol).persist()
    try {
      val comm = communities
        .select(col(nodeCol).as("node"), col(commCol).as("comm"))
        .filter(col("node").isNotNull && col("comm").isNotNull)
      val m = und.count()
      require(m > 0, "modularity needs at least one edge")
      val tagged = und
        .join(comm.select(col("node").as("u"), col("comm").as("cu")),
          Seq("u"), "left")
        .join(comm.select(col("node").as("v"), col("comm").as("cv")),
          Seq("v"), "left")
      val missing = tagged
        .filter(col("cu").isNull || col("cv").isNull).count()
      require(missing == 0L,
        s"$missing edges touch nodes absent from the partition - " +
          "assign every node a community first")
      val intra = tagged.filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("comm")).agg(count(lit(1)).as("e_c"))
      val degC = und
        .select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .join(comm, "node")
        .groupBy("comm").agg(sum(col("deg")).as("d_c"))
      val terms = degC.join(intra, Seq("comm"), "left")
        .select(round(
          coalesce(col("e_c"), lit(0L)).cast("double") / m -
            (col("d_c").cast("double") / (2.0 * m)) *
            (col("d_c").cast("double") / (2.0 * m)), 9).as("t"))
      val q = terms.agg(count(lit(1)).as("k"),
        sum(col("t").cast("decimal(38,12)")).cast("double").as("q"))
        .head()
      val spark = edges.sparkSession
      import spark.implicits._
      Seq((q.getAs[Long]("k"), m,
          BigDecimal(q.getAs[Double]("q"))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
        .toDF("n_communities", "m_edges", "modularity")
    } finally und.unpersist(blocking = false)
  }
}
