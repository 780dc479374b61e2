package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * does. */
  def resolveClusters(pairs: DataFrame, a: String = "a", b: String = "b",
      maxRounds: Int = 25): DataFrame = {
    require(pairs.schema(a).dataType == pairs.schema(b).dataType,
      s"edge endpoint types differ: ${pairs.schema(a).dataType} vs ${pairs.schema(b).dataType}")
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint()

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
      a: String = "a", b: String = "b"): DataFrame = {
    val resolved = resolveClusters(pairs, a, b)
    ids.select(col(idCol).as("id")).distinct()
      .join(resolved, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }
}
