package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn pairwise duplicate edges (the output
  * of [[Dedup.minhashLshPairs]] / [[Dedup.ngramJaccardPairs]] /
  * [[Dedup.simhashPairs]]) into connected components, so a pipeline can
  * keep ONE canonical document per near-dup cluster rather than reasoning
  * about pairs. The reference stops at group/pair reporting
  * (analysis/data_quality checks); cluster resolution is the missing step
  * between "these pairs are dups" and "this is the deduplicated corpus".
  *
  * Algorithm: hash-min label propagation with path-halving shortcuts —
  * each round every node takes the min label among itself and its
  * neighbors (one join + groupBy over the edge list), then labels are
  * shortcut through themselves (label := label's label, one self-join), so
  * convergence is O(log diameter) rounds instead of O(diameter). Each
  * round's result is `localCheckpoint`ed to truncate lineage (an iterative
  * plan otherwise grows exponentially in Catalyst). Near-dup clusters in
  * practice have tiny diameter (most are cliques from a shared LSH
  * bucket), so 3–5 rounds is typical; chains — e.g. drifting documents
  * A≈B≈C≉A — are exactly what the shortcut rounds keep cheap.
  *
  * At 100 TB scale the edge list is the candidate-pair output, orders of
  * magnitude smaller than the corpus; every step here is a keyed
  * join/groupBy over ids only (no payloads), AQE-balanced. The driver sees
  * a single scalar per round (the convergence probe).
  */
object Clusters {

  /** Resolve undirected edges (columns `a`, `b`) to components.
    * Returns (id, cluster_id) for every id that appears in an edge;
    * cluster_id = the minimum id in the component (by the id type's own
    * ordering — numeric or lexicographic; any orderable id type works,
    * string ids included). Ids absent from the edge list are singletons —
    * union them in with id as their own cluster, as [[assignClusters]]
    * does.
    *
    * Scale-adaptive: an edge list at or below `maxDriverEdges` (with an
    * integral/string/floating id type) resolves by driver-side union-find
    * — microseconds and ZERO iterative Spark rounds, the right shape for
    * the common case where candidate pairs are thousands, not billions
    * (each distributed round costs several jobs regardless of data size,
    * ~10+ s of fixed overhead for a small graph). Larger edge lists run
    * the distributed hash-min propagation unchanged. Both paths produce
    * the identical (id, min-id) labeling; `maxDriverEdges = 0` forces the
    * distributed path. The driver path collects id PAIRS only — at the
    * default cap that is tens of MB, far below any payload. */
  def resolveClusters(pairs: DataFrame, a: String = "a", b: String = "b",
      maxRounds: Int = 25, maxDriverEdges: Long = 2000000L): DataFrame = {
    require(pairs.schema(a).dataType == pairs.schema(b).dataType,
      s"edge endpoint types differ: ${pairs.schema(a).dataType} vs ${pairs.schema(b).dataType}")
    val driverCap = math.min(maxDriverEdges, Int.MaxValue - 1L)
    // Null-endpoint contract (identical on both paths): a both-null edge is
    // dropped; a half-null edge contributes its non-null endpoint as a node
    // (so it labels itself unless other edges connect it); null is never an
    // id in the output.
    val proj = pairs.select(col(a), col(b))
      .filter(col(a).isNotNull || col(b).isNotNull)
    // The size probe and the resolve share ONE evaluation of the pairs plan
    // (in semanticDedup that plan is the O(Σ cell²) cosine self-join): the
    // probe is a take(cap+1) over the persisted projection — partitions it
    // computes stay cached, so the distributed fall-through reuses instead
    // of recomputing, and the driver path resolves directly from the rows
    // the probe already collected.
    var probeCache: Option[DataFrame] = None
    var src = proj
    if (driverCap > 0 && comparatorFor(pairs.schema(a).dataType).isDefined) {
      val cached = proj.persist()
      val probe = cached.take(driverCap.toInt + 1)
      if (probe.length <= driverCap) {
        val out = driverResolve(pairs.sparkSession, pairs.schema(a).dataType, probe)
        cached.unpersist(blocking = false)
        return out
      }
      probeCache = Some(cached)
      src = cached
    }
    val edges = src.select(col(a).as("src"), col(b).as("dst"))
      .union(src.select(col(b).as("src"), col(a).as("dst")))
      .filter(col("src").isNotNull)
      .distinct()
      .localCheckpoint() // eager — the probe cache has served its purpose after this
    probeCache.foreach(_.unpersist(blocking = false))

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // min over self + neighbors' labels
      val viaNeighbor = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("lbl"))
      val afterMin = labels.union(viaNeighbor)
        .groupBy("id").agg(min("lbl").as("lbl"))
      // path halving: follow the label one hop (lbl := lbl's lbl)
      val asMap = afterMin.select(col("id").as("m_id"), col("lbl").as("m_lbl"))
      val next = afterMin.join(asMap, afterMin("lbl") === asMap("m_id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("m_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()

      val changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).limit(1).count()
      // the superseded round's checkpoint blocks are reclaimed by the
      // ContextCleaner once this reassignment drops the last reference —
      // at any moment at most two rounds of labels are materialized
      labels = next
      done = changed == 0L
      round += 1
    }
    require(done, s"resolveClusters did not converge in $maxRounds rounds " +
      "(component diameter larger than 2^rounds — raise maxRounds)")
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** [[resolveClusters]] plus singleton handling: every id in `ids` gets a
    * cluster (its own id when it has no duplicate edge). Id types are
    * preserved end to end — string/UUID ids resolve as readily as
    * numeric. */
  def assignClusters(ids: DataFrame, idCol: String, pairs: DataFrame,
      a: String = "a", b: String = "b",
      maxDriverEdges: Long = 2000000L): DataFrame = {
    val resolved = resolveClusters(pairs, a, b, maxDriverEdges = maxDriverEdges)
    ids.select(col(idCol).as("id")).distinct()
      .join(resolved, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Ordering for the driver fast path, per id DataType; None = type not
    * supported, use the distributed path. Matches Spark's own ordering for
    * these types, so both paths pick the same min id. */
  private def comparatorFor(dt: org.apache.spark.sql.types.DataType)
      : Option[(Any, Any) => Boolean] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some((x, y) => x.asInstanceOf[Number].longValue() < y.asInstanceOf[Number].longValue())
      case FloatType | DoubleType =>
        // java.lang.Double.compare, not `<`: primitive `<` is false for any
        // NaN operand, which would make NaN-labeled unions order-dependent;
        // compare() sorts NaN last — exactly where Spark's min() puts it,
        // so both paths pick the same min-id label. (±0.0 is normalized to
        // +0.0 at ingest, matching Spark's grouping normalization.)
        Some((x, y) => java.lang.Double.compare(
          x.asInstanceOf[Number].doubleValue(),
          y.asInstanceOf[Number].doubleValue()) < 0)
      case StringType =>
        // UTF-8 binary order (what Spark's min() on StringType uses), NOT
        // Java's UTF-16 compareTo — they disagree between [U+E000,U+FFFF]
        // and supplementary characters, and both paths must pick the same
        // min-id label
        Some((x, y) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(x.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(
              y.asInstanceOf[String])) < 0)
      case _ => None
    }
  }

  /** Driver union-find with path halving and union-by-min (the smaller
    * root becomes parent, so every root IS its component's minimum).
    * Operates on the edge rows the size probe already collected — the
    * expensive pairs plan is never evaluated a second time.
    *
    * Boxed-key normalization: Spark's grouping treats -0.0 and 0.0 as one
    * key, but `java.lang.Double.equals` does not — without normalization a
    * HashMap would split one node in two and the two paths would disagree.
    * Half-null edges register the non-null endpoint as a node (the same
    * singleton the distributed path emits); fully-null rows were filtered
    * upstream. */
  private def driverResolve(
      spark: org.apache.spark.sql.SparkSession,
      dt: org.apache.spark.sql.types.DataType,
      edgeRows: Array[Row]): DataFrame = {
    val lt = comparatorFor(dt).get
    def norm(v: Any): Any = v match {
      case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
      case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
      case other => other
    }
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.get(x)
      while (p != x) {
        val gp = parent.get(p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.get(x)
      }
      x
    }
    edgeRows.foreach { r =>
      val (x, y) = (norm(r.get(0)), norm(r.get(1)))
      if (x != null && !parent.containsKey(x)) parent.put(x, x)
      if (y != null && !parent.containsKey(y)) parent.put(y, y)
      if (x != null && y != null) {
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) {
          if (lt(rx, ry)) parent.put(ry, rx) else parent.put(rx, ry)
        }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", dt),
      org.apache.spark.sql.types.StructField("cluster_id", dt)))
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size())
    val it = parent.keySet().iterator()
    while (it.hasNext) {
      val id = it.next()
      rows += org.apache.spark.sql.Row(id, find(id))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }
}
