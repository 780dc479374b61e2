package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}
import graft.ops.Graph

/** Link-graph gate entries ([[graft.ops.Graph]]). The corpus tables carry
  * no edge list, so both engines derive the SAME deterministic synthetic
  * link graph from `documents`: every non-dangling document links to three
  * hash-derived targets in [0, n); documents with `doc_id % 7 == 0` emit
  * NO out-edges (the dangling set PageRank must redistribute). Spark and
  * DuckDB then compute independently — Spark through the iterative
  * DataFrame op, DuckDB through unrolled per-iteration CTEs.
  */
object GraphQueries extends QueryModule {

  /** Spark side of the synthetic edge list (src links to 3 hash-derived
    * targets in [0, nDocs); doc_id % 7 == 0 dangles). ONE definition —
    * ScaleBench's gr_pagerank entry reuses it so the bench measures
    * exactly the graph the gate verifies. */
  private[graft] def linkEdges(docs: DataFrame, nDocs: Long): DataFrame =
    docs.select(col("doc_id")).filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("src"),
        explode(array(
          pmod(col("doc_id") * 31 + 17, lit(nDocs)),
          pmod(col("doc_id") * 57 + 5, lit(nDocs)),
          pmod(col("doc_id") * 13 + 29, lit(nDocs)))).as("dst"))

  private def edgesDf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    linkEdges(d, d.count())
  }

  /** DuckDB side of the same edge list. */
  private val edgesSql =
    """SELECT doc_id AS src,
         (doc_id * m + a) % (SELECT count(*) FROM documents) AS dst
       FROM documents, (VALUES (31, 17), (57, 5), (13, 29)) AS f(m, a)
       WHERE doc_id % 7 <> 0"""

  val grDegrees: Q = Q(
    "gr_degrees",
    Some(s"""
      WITH edges AS ($edgesSql),
      outd AS (SELECT src AS node, count(*) AS out_degree
               FROM edges GROUP BY src),
      ind AS (SELECT dst AS node, count(*) AS in_degree
              FROM edges GROUP BY dst)
      SELECT d.doc_id AS node,
        COALESCE(o.out_degree, 0) AS out_degree,
        COALESCE(i.in_degree, 0) AS in_degree
      FROM documents d
      LEFT JOIN outd o ON d.doc_id = o.node
      LEFT JOIN ind i ON d.doc_id = i.node
      ORDER BY node"""),
    (s, dir) => {
      val nodes = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("node"))
      nodes.join(Graph.degrees(edgesDf(s, dir)), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("out_degree"), lit(0L)).as("out_degree"),
          coalesce(col("in_degree"), lit(0L)).as("in_degree"))
        .orderBy("node")
    })

  private val Iters = 5
  private val Damping = 0.85

  /** Unrolled damped-propagation oracle: a `tele` CTE supplies the
    * teleport vector t (uniform → PageRank, seed-concentrated →
    * TrustRank), r0 = t, then `Iters` CTE layers each computing the
    * dangling mass and the damped contribution sum — the SAME recurrence,
    * in the SAME arithmetic form ((1-d)·t + d·(c + mass·t)), as the Spark
    * op iterates, so per-node doubles track to ulps. Ranks are genuinely
    * floating-point: both engines round to 8 decimals at the very end
    * (Q exactness rules). */
  /** WITH-clause block of the unrolled recurrence plus the name of the
    * final rank relation — composable, so integration gates can join the
    * propagated ranks against other derivations. */
  private def propagationCtes(
      teleCte: String, weighted: Boolean): (String, String) = {
    // unweighted edges carry w = 1.0 so the contribution term
    // (rank * w / deg) is the IDENTICAL arithmetic on both paths
    val wExpr =
      if (weighted) "CAST((src + dst) % 3 + 1 AS DOUBLE)" else "1.0"
    val header = s"""
      e0 AS ($edgesSql),
      edges AS (SELECT src, dst, $wExpr AS w FROM e0),
      outd AS (SELECT src, SUM(w) AS deg FROM edges GROUP BY src),
      $teleCte,
      r0 AS (SELECT node, t AS rank FROM tele)"""
    val iters = (1 to Iters).map { i =>
      val p = i - 1
      s"""
      d$i AS (SELECT COALESCE(SUM(r.rank), 0.0) AS mass
              FROM r$p r LEFT JOIN outd o ON r.node = o.src
              WHERE o.src IS NULL),
      c$i AS (SELECT e.dst AS node, SUM(r.rank * e.w / o.deg) AS c
              FROM r$p r
              JOIN outd o ON r.node = o.src
              JOIN edges e ON e.src = r.node
              GROUP BY e.dst),
      r$i AS (SELECT tele.node,
                (1.0 - $Damping) * tele.t
                  + $Damping * (COALESCE(c.c, 0.0)
                    + (SELECT mass FROM d$i) * tele.t) AS rank
              FROM tele LEFT JOIN c$i c ON tele.node = c.node)"""
    }.mkString(",", ",", "")
    (header + iters, s"r$Iters")
  }

  private def propagationSql(
      teleCte: String, outCol: String, weighted: Boolean = false): String = {
    val (ctes, rel) = propagationCtes(teleCte, weighted)
    s"""
      WITH $ctes
      SELECT node, ROUND(rank, 8) AS $outCol
      FROM $rel
      ORDER BY node"""
  }

  /** The seed-concentrated teleport CTE shared by the TrustRank gates. */
  private val trustTeleCte =
    """tele AS (SELECT doc_id AS node,
         CASE WHEN doc_id % 17 = 0
           THEN 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM documents
                       WHERE doc_id % 17 = 0)
           ELSE 0.0 END AS t
       FROM documents)"""

  val grPagerank: Q = Q(
    "gr_pagerank",
    Some(propagationSql(
      """tele AS (SELECT doc_id AS node,
           1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS t
         FROM documents)""",
      "pagerank")),
    (s, dir) => {
      val nodes = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val ranks = Graph.pageRank(edgesDf(s, dir), nodes,
        iters = Iters, damping = Damping)
      // mass conservation: ranks must sum to 1 (within float addition)
      val total = ranks.agg(sum("rank")).head().getDouble(0)
      require(math.abs(total - 1.0) < 1e-9,
        s"PageRank mass not conserved: $total")
      ranks.select(col("node"), round(col("rank"), 8).as("pagerank"))
        .orderBy("node")
    })

  /** TrustRank ([[Graph.trustRank]]): teleport concentrated on the seed
    * set doc_id % 17 == 0 — trust flows outward along the synthetic link
    * graph, dangling mass restarts at the seeds. Same unrolled oracle
    * recurrence with the seed-shaped `tele` CTE. */
  val grTrustrank: Q = Q(
    "gr_trustrank",
    Some(propagationSql(trustTeleCte, "trust")),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val nodes = d.select(col("doc_id").as("node"))
      val seeds = d.select(col("doc_id").as("node"))
        .filter(col("node") % 17 === 0)
      val ranks = Graph.trustRank(edgesDf(s, dir), nodes, seeds,
        iters = Iters, damping = Damping)
      val total = ranks.agg(sum("rank")).head().getDouble(0)
      require(math.abs(total - 1.0) < 1e-9,
        s"trust mass not conserved: $total")
      ranks.select(col("node"), round(col("rank"), 8).as("trust"))
        .orderBy("node")
    })

  /** Connected components ([[Graph.connectedComponents]]) over a chain
    * graph: doc i links to i+1 except every 10th — components are exactly
    * the 10-blocks, so the oracle states the answer in CLOSED FORM
    * (`doc_id - doc_id % 10`) while the Spark side must actually resolve
    * the chains. (The resolver's two paths are pinned equal in GraphSpec;
    * the distributed path's own oracle is dd_cluster_resolve.) */
  val grComponents: Q = Q(
    "gr_components",
    Some("""
      SELECT doc_id AS node, doc_id - doc_id % 10 AS component
      FROM documents
      ORDER BY node"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val nodes = d.select(col("doc_id").as("node"))
      val chain = d.select(col("doc_id")).filter(col("doc_id") % 10 =!= 9)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      Graph.connectedComponents(chain, nodes).orderBy("node")
    })

  /** WEIGHTED PageRank ([[Graph.pageRank]] with `weightCol`): each edge
    * carries multiplicity w = (src+dst)%3+1 (the host-graph shape — link
    * counts between hosts), out-degree becomes Σw and contributions
    * rank·w/W. Same unrolled oracle with the weighted edge CTE. */
  val grPagerankWeighted: Q = Q(
    "gr_pagerank_weighted",
    Some(propagationSql(
      """tele AS (SELECT doc_id AS node,
           1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS t
         FROM documents)""",
      "pagerank", weighted = true)),
    (s, dir) => {
      val nodes = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val weighted = edgesDf(s, dir).withColumn("w",
        ((col("src") + col("dst")) % 3 + 1).cast("double"))
      val ranks = Graph.pageRank(weighted, nodes, iters = Iters,
        damping = Damping, weightCol = Some("w"))
      val total = ranks.agg(sum("rank")).head().getDouble(0)
      require(math.abs(total - 1.0) < 1e-9,
        s"weighted PageRank mass not conserved: $total")
      ranks.select(col("node"), round(col("rank"), 8).as("pagerank"))
        .orderBy("node")
    })

  /** HITS ([[Graph.hits]]): the L1-normalized mutual-reinforcement
    * recurrence unrolled as per-iteration CTEs — authority update,
    * normalize, hub update, normalize — in the same +,*,/ arithmetic
    * form as the Spark op (the L1-norm design choice exists exactly so
    * this oracle avoids sqrt parity). Normalization uses a window
    * `SUM(...) OVER ()` so every CTE is referenced exactly once:
    * DuckDB inlines CTEs, and a scalar-subquery form that referenced
    * each layer 3× expanded 9× PER ITERATION — ~59k parquet opens at 5
    * iterations, found as an fd exhaustion crash. */
  val grHits: Q = Q(
    "gr_hits",
    Some {
      val header = s"""
      WITH e0 AS ($edgesSql),
      edges AS (SELECT src, dst FROM e0),
      nodes AS (SELECT doc_id AS node FROM documents),
      h0 AS (SELECT node,
               1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS hub
             FROM nodes)"""
      val iters = (1 to Iters).map { i =>
        val p = i - 1
        s"""
      ar$i AS (SELECT e.dst AS node, SUM(h.hub) AS a
               FROM h$p h JOIN edges e ON h.node = e.src
               GROUP BY e.dst),
      a$i AS (SELECT n.node,
                CASE WHEN SUM(COALESCE(ar.a, 0.0)) OVER () = 0 THEN 0.0
                     ELSE COALESCE(ar.a, 0.0)
                       / SUM(COALESCE(ar.a, 0.0)) OVER () END AS auth
              FROM nodes n LEFT JOIN ar$i ar ON n.node = ar.node),
      hr$i AS (SELECT e.src AS node, SUM(a.auth) AS h
               FROM a$i a JOIN edges e ON a.node = e.dst
               GROUP BY e.src),
      h$i AS (SELECT n.node,
                CASE WHEN SUM(COALESCE(hr.h, 0.0)) OVER () = 0 THEN 0.0
                     ELSE COALESCE(hr.h, 0.0)
                       / SUM(COALESCE(hr.h, 0.0)) OVER () END AS hub
              FROM nodes n LEFT JOIN hr$i hr ON n.node = hr.node)"""
      }.mkString(",", ",", "")
      header + iters + s"""
      SELECT h.node, ROUND(h.hub, 8) AS hub, ROUND(a.auth, 8) AS authority
      FROM h$Iters h JOIN a$Iters a ON h.node = a.node
      ORDER BY h.node"""
    },
    (s, dir) => {
      val nodes = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val scores = Graph.hits(edgesDf(s, dir), nodes, iters = Iters)
      // both axes L1-normalized: each sums to 1
      val sums = scores.agg(sum("hub"), sum("authority")).head()
      require(math.abs(sums.getDouble(0) - 1.0) < 1e-9 &&
        math.abs(sums.getDouble(1) - 1.0) < 1e-9,
        s"HITS normalization broken: $sums")
      scores.select(col("node"), round(col("hub"), 8).as("hub"),
          round(col("authority"), 8).as("authority"))
        .orderBy("node")
    })

  /** INTEGRATION gate — TrustRank wired into the per-domain rollup, the
    * actual 100 TB use of a link prior: link-level trust aggregated to
    * the registrable domain that curation decisions act on. Composes the
    * two oracle chains end to end (unrolled propagation CTEs joined to
    * the URL-canonicalization/domain CTEs from [[UrlQueries]]) — a pass
    * proves graph trust, URL canonicalization, domain extraction, and
    * the rollup agree across engines SIMULTANEOUSLY. */
  val grDomainTrust: Q = Q(
    "gr_domain_trust",
    Some {
      val (ctes, rel) = propagationCtes(trustTeleCte, weighted = false)
      s"""
      WITH $ctes,
      u AS (SELECT doc_id, ${UrlQueries.urlSql} AS url FROM documents),
      nf AS (SELECT doc_id,
               regexp_replace(url, '#.*$$', '') AS nofrag FROM u),
      cu AS (SELECT doc_id, ${UrlQueries.canonSql} AS canonical_url FROM nf),
      h AS (SELECT doc_id,
              lower(regexp_extract(canonical_url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
            FROM cu),
      dom AS (SELECT doc_id,
                CASE WHEN regexp_extract(host,
                       '([^.]+\\.(${UrlQueries.multiSql}))$$', 1) <> ''
                       THEN regexp_extract(host,
                         '([^.]+\\.(${UrlQueries.multiSql}))$$', 1)
                     WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) <> ''
                       THEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
                     ELSE host END AS domain
              FROM h)
      SELECT dom.domain, count(*) AS n_docs,
        ROUND(SUM(r.rank) / count(*), 8) AS mean_trust,
        CAST(SUM(CASE WHEN dom.doc_id % 17 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_seeds
      FROM dom JOIN $rel r ON dom.doc_id = r.node
      GROUP BY dom.domain
      ORDER BY dom.domain"""
    },
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val nodes = d.select(col("doc_id").as("node"))
      val seeds = nodes.filter(col("node") % 17 === 0)
      val trust = Graph.trustRank(edgesDf(s, dir), nodes, seeds,
        iters = Iters, damping = Damping)
      val domains = d
        .select(col("doc_id"), graft.queries.UrlQueries.urlCol.as("url"))
        .withColumn("canonical_url",
          graft.ops.UrlOps.canonicalUrl(col("url")))
        .withColumn("host", graft.ops.UrlOps.host(col("canonical_url")))
        .withColumn("domain",
          graft.ops.UrlOps.registrableDomain(col("host")))
        .select("doc_id", "domain")
      domains.join(trust, domains("doc_id") === trust("node"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          round(sum("rank") / count(lit(1)), 8).as("mean_trust"),
          sum(when(col("doc_id") % 17 === 0, 1L).otherwise(0L))
            .as("n_seeds"))
        .orderBy("domain")
    })

  /** Deterministic synchronous label propagation
    * ([[Graph.labelPropagation]], 3 iterations): the oracle unrolls the
    * recurrence — symmetrized distinct edge set, per-(node, label)
    * neighbor+self vote counts, argmax with the min-label tie-break — so
    * both engines must agree on every vote count and every tie. */
  val grLabelProp: Q = Q(
    "gr_label_propagation",
    Some(s"""
      WITH e0 AS ($edgesSql),
      und AS (
        SELECT DISTINCT u, v FROM (
          SELECT src AS u, dst AS v FROM e0
          UNION ALL
          SELECT dst AS u, src AS v FROM e0)
        WHERE u <> v),
      l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
      c1 AS (
        SELECT node, lbl, count(*) AS cnt FROM (
          SELECT und.v AS node, l.lbl FROM und JOIN l0 l ON und.u = l.node
          UNION ALL SELECT node, lbl FROM l0)
        GROUP BY node, lbl),
      l1 AS (SELECT node, lbl FROM (
        SELECT node, lbl,
          row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
        FROM c1) WHERE rn = 1),
      c2 AS (
        SELECT node, lbl, count(*) AS cnt FROM (
          SELECT und.v AS node, l.lbl FROM und JOIN l1 l ON und.u = l.node
          UNION ALL SELECT node, lbl FROM l1)
        GROUP BY node, lbl),
      l2 AS (SELECT node, lbl FROM (
        SELECT node, lbl,
          row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
        FROM c2) WHERE rn = 1),
      c3 AS (
        SELECT node, lbl, count(*) AS cnt FROM (
          SELECT und.v AS node, l.lbl FROM und JOIN l2 l ON und.u = l.node
          UNION ALL SELECT node, lbl FROM l2)
        GROUP BY node, lbl),
      l3 AS (SELECT node, lbl FROM (
        SELECT node, lbl,
          row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
        FROM c3) WHERE rn = 1)
      SELECT node, lbl AS community
      FROM l3
      ORDER BY node"""),
    (s, dir) => {
      val nodes = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("node"))
      Graph.labelPropagation(edgesDf(s, dir), nodes, iters = 3)
        .orderBy("node")
    })

  /** Inbound anchor-term profiles ([[Graph.anchorTerms]]): each synthetic
    * link carries anchor text cut deterministically from its SOURCE
    * document (4 words starting at dst % 8 — varies per edge, so targets
    * accumulate anchors from many positions), and both engines roll up
    * each target's top-3 inbound terms independently. Graph × text in one
    * oracle: the edge formula, the tokenizer, the slice, and the
    * count/rank window all have to agree at once. */
  val grAnchorTerms: Q = Q(
    "gr_anchor_terms",
    Some(s"""
      WITH edges AS ($edgesSql),
      dw AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(text), '\\s+') END AS w
        FROM documents),
      anch AS (
        SELECT e.dst, unnest(list_slice(d.w,
            e.dst % 8 + 1, e.dst % 8 + 4)) AS term
        FROM edges e JOIN dw d ON e.src = d.doc_id),
      cnt AS (
        SELECT dst, term, count(*) AS n FROM anch
        WHERE term <> '' GROUP BY 1, 2),
      r AS (
        SELECT dst, term, n,
          row_number() OVER (PARTITION BY dst ORDER BY n DESC, term) AS rank
        FROM cnt)
      SELECT dst, rank, term, n FROM r WHERE rank <= 3
      ORDER BY dst, rank"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val edges = linkEdges(d, d.count())
      val withAnchor = edges
        .join(d.select(col("doc_id").as("src"), col("text")), "src")
        .withColumn("anchor", concat_ws(" ",
          slice(graft.ops.TextOps.tokens(col("text")),
            (pmod(col("dst"), lit(8L)) + 1).cast("int"), lit(4))))
      Graph.anchorTerms(withAnchor, "dst", "anchor", k = 3)
        .orderBy("dst", "rank")
    })

  /** Spark side of the "social" edge list used by the triangle/k-core
    * gates: the hash-derived links ([[linkEdges]]) plus two window edges
    * per document (doc → doc+1, doc+2 mod n) — the pure hash graph is
    * locally tree-like (zero triangles), so the window edges plant a
    * triangle per consecutive triple while the hash edges keep degrees
    * irregular enough to exercise the degree-ordered orientation. */
  private[graft] def socialEdges(docs: DataFrame, nDocs: Long): DataFrame =
    linkEdges(docs, nDocs).unionByName(
      docs.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") + 1, lit(nDocs)),
          pmod(col("doc_id") + 2, lit(nDocs)))).as("dst")))

  /** DuckDB side of the same edge list. */
  private val socialEdgesSql = s"""$edgesSql
       UNION ALL
       SELECT doc_id AS src,
         (doc_id + s) % (SELECT count(*) FROM documents) AS dst
       FROM documents, (VALUES (1), (2)) AS w(s)"""

  /** Canonical undirected simple graph + exact triangle triples, shared
    * by the triangle gates: each triangle once, vertices ascending. */
  private val triSqlPrelude = s"""
      WITH edges AS ($socialEdgesSql),
      und AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
      tri AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)"""

  /** Exact triangle enumeration: Spark's degree-ordered compact-forward
    * join ([[Graph.triangles]]) against DuckDB's naive canonical triple
    * join — two INDEPENDENT algorithms that must enumerate the identical
    * triangle set (here compared vertex-sorted, since orientation order
    * is an implementation detail). */
  val grTriangles: Q = Q(
    "gr_triangles",
    Some(triSqlPrelude + """
      SELECT x, y, z FROM tri
      ORDER BY x, y, z"""),
    (s, dir) => {
      val t = Graph.triangles(edgesSocial(s, dir))
      val sorted = sort_array(array(col("a"), col("b"), col("c")))
      t.select(sorted.getItem(0).as("x"), sorted.getItem(1).as("y"),
          sorted.getItem(2).as("z"))
        .orderBy("x", "y", "z")
    })

  /** Per-node triangle count + local clustering coefficient — the
    * page-quality signal (link farms sit at coefficient extremes).
    * Coefficients round to 9 on both sides; the oracle's `+ 0.0` is the
    * negative-zero canonicalizer (see ProjectionQueries.covSql). */
  val grClustering: Q = Q(
    "gr_clustering",
    Some(triSqlPrelude + """,
      tn AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY node),
      deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        GROUP BY node)
      SELECT d.node, d.degree,
        COALESCE(t.n_triangles, 0) AS n_triangles,
        CASE WHEN d.degree >= 2 THEN
          round(2.0 * COALESCE(t.n_triangles, 0)
            / (d.degree * (d.degree - 1)), 9) + 0.0 END AS clustering
      FROM deg d LEFT JOIN tn t USING (node)
      ORDER BY node"""),
    (s, dir) =>
      Graph.clusteringCoefficients(edgesSocial(s, dir)).orderBy("node"))

  /** Link prediction ([[Graph.linkPrediction]]): common-neighbor /
    * Adamic–Adar / neighborhood-Jaccard scores for every non-adjacent
    * pair sharing a neighbor. The oracle rebuilds the wedge join, the
    * per-term rounded-ln decimal AA fold, the NOT EXISTS non-adjacency
    * cut and both degree joins from scratch — every score hash-checked.
    * No middle-degree cap on this fixture (every node is far below the
    * default), so the capped Spark path and the uncapped SQL agree. */
  val grLinkPrediction: Q = Q(
    "gr_link_prediction",
    Some(s"""
      WITH edges AS ($socialEdgesSql),
      und AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
      adj AS (SELECT u AS w, v AS n FROM und
              UNION ALL SELECT v AS w, u AS n FROM und),
      deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY w),
      wed AS (
        SELECT a1.n AS u, a2.n AS v, d.d
        FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.n < a2.n
        JOIN deg d ON d.w = a1.w),
      cn AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
          CAST(SUM(CAST(round(1.0 / ln(d), 9) AS DECIMAL(38,12)))
            AS DOUBLE) AS aa
        FROM wed GROUP BY u, v),
      nw AS (
        SELECT * FROM cn WHERE NOT EXISTS (
          SELECT 1 FROM und WHERE und.u = cn.u AND und.v = cn.v))
      SELECT nw.u, nw.v, nw.common_neighbors, du.d AS deg_u, dv.d AS deg_v,
        round(nw.aa, 6) AS adamic_adar,
        round(CAST(nw.common_neighbors AS DOUBLE)
          / (du.d + dv.d - nw.common_neighbors), 6) AS jaccard
      FROM nw JOIN deg du ON du.w = nw.u JOIN deg dv ON dv.w = nw.v
      ORDER BY u, v"""),
    (s, dir) => {
      val out = Graph.linkPrediction(edgesSocial(s, dir))
      out.orderBy("u", "v")
    })

  private val CoreK = 7
  private val CorePeels = 12

  /** DuckDB mirror of the k-core peeling fixpoint: `layers` unrolled
    * peel rounds (degree filter + induced-subgraph restriction); rounds
    * past the fixpoint are idempotent, so any unroll ≥ the true peel
    * depth lands on the core — and an unroll that's too SHALLOW shows
    * up as a hash mismatch, not a silent pass. */
  private def kcoreSql(k: Int, layers: Int): String = {
    // every peel layer references its parent three times — CTEs must be
    // MATERIALIZED or the engine's inlining expands the chain 3^layers
    // scans wide (observed as fd exhaustion at 12 layers)
    val sb = new StringBuilder(
      s"""WITH edges AS ($socialEdgesSql),
      e0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst)""")
    for (i <- 1 to layers) {
      sb.append(s""",
      n$i AS MATERIALIZED (
        SELECT node FROM (SELECT u AS node FROM e${i - 1}
                          UNION ALL SELECT v FROM e${i - 1})
        GROUP BY node HAVING count(*) >= $k),
      e$i AS MATERIALIZED (
        SELECT u, v FROM e${i - 1}
        WHERE u IN (SELECT node FROM n$i)
          AND v IN (SELECT node FROM n$i))""")
    }
    sb.append(s"""
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM e$layers UNION ALL SELECT v FROM e$layers)
      GROUP BY node
      ORDER BY node""")
    sb.toString
  }

  /** k-core membership: Spark's loop-until-stable peel
    * ([[Graph.kCore]]) vs the unrolled SQL fixpoint — every surviving
    * node with its within-core degree. The gate also asserts the core
    * property itself (min internal degree ≥ k) so a convergence bug
    * can't hide behind a matching-but-wrong oracle. */
  val grKcore: Q = Q(
    "gr_kcore",
    Some(kcoreSql(CoreK, CorePeels)),
    (s, dir) => {
      val core = Graph.kCore(edgesSocial(s, dir), CoreK)
      val bad = core.filter(col("degree") < CoreK).count()
      require(bad == 0, s"$bad nodes below degree $CoreK inside the core")
      core.orderBy("node")
    })

  private def edgesSocial(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    socialEdges(d, d.count())
  }

  /** Multi-source BFS hop levels ([[Graph.bfsLevels]]) from the
    * doc_id % 97 seed set over the standard link graph, bounded at 4
    * hops — Spark's iterative frontier joins against DuckDB's bounded
    * WITH RECURSIVE: a genuine cross-paradigm differential (same
    * reachable set, same minimum hop counts, row for row). */
  val grBfs: Q = Q(
    "gr_bfs_levels",
    Some(s"""
      WITH RECURSIVE edges AS ($edgesSql),
      bfs(node, level) AS (
        SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
        UNION
        SELECT e.dst, b.level + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.level < 4)
      SELECT node, CAST(min(level) AS BIGINT) AS level
      FROM bfs GROUP BY node ORDER BY node"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val seeds = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("node"))
      val out = Graph.bfsLevels(edgesDf(s, dir), seeds, maxHops = 4)
        .select(col("node"), col("level").cast("long").as("level"))
        .orderBy("node")
      if (Tables.gateMode) {
        val bad = out.agg(min(col("level")), max(col("level"))).head()
        require(bad.getLong(0) == 0L && bad.getLong(1) <= 4L,
          s"levels must span [0, 4]: $bad")
      }
      out
    })

  /** Edge reciprocity ([[graft.ops.Graph.reciprocity]]) of the directed
    * link graph — the oracle replays the distinct non-loop edge set and
    * the reversed-key self-join count. */
  val grReciprocity: Q = Q(
    "gr_reciprocity",
    Some(s"""
      WITH edges AS ($edgesSql),
      e AS (SELECT DISTINCT src AS s, dst AS d FROM edges
            WHERE src <> dst),
      r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
      rec AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr
              FROM e a JOIN e b ON a.s = b.d AND a.d = b.s)
      SELECT r.n AS n_edges, rec.nr AS n_reciprocal,
        round(CAST(rec.nr AS DOUBLE) / r.n, 6) + 0.0 AS reciprocity
      FROM r, rec"""),
    (s, dir) => {
      val out = Graph.reciprocity(edgesDf(s, dir))
      val r = out.head()
      require(r.getAs[Double]("reciprocity") >= 0.0 &&
        r.getAs[Double]("reciprocity") <= 1.0, s"$r")
      out
    })

  /** Degree assortativity ([[graft.ops.Graph.degreeAssortativity]]) of
    * the undirected link graph — the oracle replays the degree table
    * and the both-orientations Pearson moments. */
  val grAssortativity: Q = Q(
    "gr_assortativity",
    Some(s"""
      WITH edges AS ($edgesSql),
      und AS (SELECT DISTINCT LEAST(src, dst) AS u,
          GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
      deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und
              UNION ALL SELECT v AS node FROM und) GROUP BY node),
      pr AS (
        SELECT du.deg AS j, dv.deg AS k FROM und
          JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node
        UNION ALL
        SELECT dv.deg AS j, du.deg AS k FROM und
          JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        CAST(SUM(j) AS DOUBLE) AS sj,
        CAST(SUM(j * k) AS DOUBLE) AS sjk,
        CAST(SUM(j * j) AS DOUBLE) AS sjj FROM pr),
      um AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
      SELECT um.m AS n_edges_undirected,
        round((sjk / m2 - (sj / m2) * (sj / m2))
          / (sjj / m2 - (sj / m2) * (sj / m2)), 6) + 0.0 AS assortativity
      FROM st, um"""),
    (s, dir) => {
      val out = Graph.degreeAssortativity(edgesDf(s, dir))
      val r = out.head()
      val a = r.getAs[Double]("assortativity")
      require(a >= -1.0 && a <= 1.0, s"a correlation must be in [-1,1]: $a")
      out
    })

  /** Average-neighbor-degree curve ([[graft.ops.Graph.avgNeighborDegree]])
    * — the oracle replays the degree table, the both-orientations
    * neighbor sums, and the per-degree-class decimal folds. */
  val grKnnDegree: Q = Q(
    "gr_knn_degree",
    Some(s"""
      WITH edges AS ($edgesSql),
      und AS (SELECT DISTINCT LEAST(src, dst) AS u,
          GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
      deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und
              UNION ALL SELECT v AS node FROM und) GROUP BY node),
      pairs AS (SELECT u AS a, v AS b FROM und
                UNION ALL SELECT v AS a, u AS b FROM und),
      pn AS (
        SELECT pairs.a,
          round(CAST(SUM(d.deg) AS DOUBLE) / COUNT(*), 9) AS knn
        FROM pairs JOIN deg d ON pairs.b = d.node GROUP BY pairs.a),
      j AS (SELECT da.deg AS degree, pn.knn
        FROM pn JOIN deg da ON pn.a = da.node)
      SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        round(CAST(SUM(CAST(knn AS DECIMAL(38,12))) AS DOUBLE)
          / COUNT(*), 6) + 0.0 AS avg_neighbor_degree
      FROM j GROUP BY degree ORDER BY degree"""),
    (s, dir) => {
      val out = Graph.avgNeighborDegree(edgesDf(s, dir))
      val rows = out.collect()
      require(rows.nonEmpty &&
        rows.forall(_.getAs[Double]("avg_neighbor_degree") >= 1.0),
        "every neighbor has degree >= 1")
      out
    })

  /** Newman–Girvan modularity ([[graft.ops.Graph.modularity]]) of the
    * deterministic doc_id%10 partition over the link graph — the gate
    * pins the estimator's arithmetic on a trivially-replayable
    * partition (the library API composes with labelPropagation /
    * connectedComponents for discovered communities). */
  val grModularity: Q = Q(
    "gr_modularity",
    Some(s"""
      WITH edges AS ($edgesSql),
      und AS (SELECT DISTINCT LEAST(src, dst) AS u,
          GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
      comm AS (SELECT doc_id AS node, doc_id % 10 AS comm FROM documents),
      tag AS (SELECT cu.comm AS cu, cv.comm AS cv FROM und
        JOIN comm cu ON und.u = cu.node JOIN comm cv ON und.v = cv.node),
      intra AS (SELECT cu AS comm, CAST(COUNT(*) AS BIGINT) AS e_c
        FROM tag WHERE cu = cv GROUP BY cu),
      deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und
              UNION ALL SELECT v AS node FROM und) GROUP BY node),
      degc AS (SELECT c.comm, CAST(SUM(d.deg) AS BIGINT) AS d_c
        FROM deg d JOIN comm c ON d.node = c.node GROUP BY c.comm),
      terms AS (
        SELECT round(CAST(COALESCE(e_c, 0) AS DOUBLE) / m.m
          - (CAST(d_c AS DOUBLE) / (2.0 * m.m))
            * (CAST(d_c AS DOUBLE) / (2.0 * m.m)), 9) AS t
        FROM degc LEFT JOIN intra USING (comm), m)
      SELECT CAST((SELECT COUNT(*) FROM terms) AS BIGINT)
          AS n_communities,
        (SELECT m FROM m) AS m_edges,
        round((SELECT CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE)
          FROM terms), 6) + 0.0 AS modularity
      """),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val comm = d.select(col("doc_id").as("node"),
        pmod(col("doc_id"), lit(10L)).as("community"))
      val out = Graph.modularity(edgesDf(s, dir), comm)
      val r = out.head()
      val q = r.getAs[Double]("modularity")
      require(q >= -1.0 && q <= 1.0, s"Q is bounded: $q")
      out
    })

  override def queries: Seq[Q] =
    Seq(grDegrees, grPagerank, grPagerankWeighted, grTrustrank,
      grComponents, grDomainTrust, grHits, grLabelProp, grAnchorTerms,
      grTriangles, grClustering, grLinkPrediction, grKcore, grBfs,
      grReciprocity, grAssortativity, grModularity, grKnnDegree)
}
