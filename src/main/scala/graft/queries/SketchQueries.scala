package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{CountMin, TextOps}
import org.apache.spark.sql.functions._

/** Mergeable-sketch gates. The Count-Min bucket hash is the engine-portable
  * md5 scheme ([[graft.ops.Sampling.hashFraction]] family), so the DuckDB
  * oracle rebuilds the ENTIRE counter grid independently and the gates
  * hash-compare actual sketch state, not just derived answers.
  */
object SketchQueries extends QueryModule {

  private val Depth = 4; private val Width = 512; private val Seed = "graft-cms"

  /** token stream CTEs shared by both cms oracles (txt_vocab's split). */
  private val tokCte = """
      t AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
        WHERE length(trim(text)) > 0),
      tok AS (SELECT token FROM t WHERE token <> ''),
      d AS (SELECT unnest([0, 1, 2, 3]) AS d)"""

  private def bucketSql(key: String, depth: String): String =
    s"""CAST(concat('0x', substr(md5(concat_ws('|', '$Seed',
        CAST($depth AS VARCHAR), $key)), 1, 8)) AS BIGINT) % $Width"""

  private def tokensDf(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")

  /** The full Count-Min counter grid over the document token stream —
    * both engines build all depth × width nonzero counters independently
    * and must agree on every cell ([[graft.ops.CountMin.sketch]]). */
  val cmsCounters: Q = Q(
    "cms_sketch_counters",
    Some(s"""
      WITH $tokCte
      SELECT d.d AS depth,
        ${bucketSql("token", "d.d")} AS bucket,
        count(*) AS cnt
      FROM tok, d
      GROUP BY 1, 2
      ORDER BY depth, bucket"""),
    (s, dir) =>
      CountMin.sketch(tokensDf(s, dir), "token", Depth, Width, Seed)
        .orderBy("depth", "bucket"))

  /** Point-query estimates for the 50 most frequent tokens next to their
    * exact counts ([[graft.ops.CountMin.estimate]]): the oracle probes its
    * own counter grid the same way, and the gate additionally enforces the
    * CMS one-sided-error contract (no estimate below the exact count)
    * before returning. */
  val cmsEstimates: Q = Q(
    "cms_estimate_topk",
    Some(s"""
      WITH $tokCte,
      counters AS (
        SELECT d.d AS depth, ${bucketSql("token", "d.d")} AS bucket,
          count(*) AS cnt
        FROM tok, d
        GROUP BY 1, 2),
      top AS (
        SELECT token, count(*) AS n FROM tok
        GROUP BY token ORDER BY n DESC, token LIMIT 50),
      probes AS (
        SELECT top.token, top.n, d.d AS depth,
          ${bucketSql("top.token", "d.d")} AS bucket
        FROM top, d)
      SELECT p.token, p.n, min(COALESCE(c.cnt, 0)) AS cms_est
      FROM probes p LEFT JOIN counters c USING (depth, bucket)
      GROUP BY p.token, p.n
      ORDER BY token"""),
    (s, dir) => {
      val toks = tokensDf(s, dir)
      val sk = CountMin.sketch(toks, "token", Depth, Width, Seed)
      val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50)
      val est = CountMin.estimate(sk, top, "token", Depth, Width, Seed)
      val under = est.filter(col("cms_est") < col("n")).count()
      require(under == 0L,
        s"CMS undercounted $under keys — one-sided error contract broken")
      est.select("token", "n", "cms_est").orderBy("token")
    })

  /** Join-size estimation without touching the tables: sketch orders and
    * customer on custkey, estimate |orders ⋈ customer| as the min
    * per-depth counter dot product, next to the exact join count. The
    * oracle rebuilds BOTH grids and the full estimator; the gate
    * additionally enforces the one-sided contract (never an
    * undercount). */
  val cmsJoinCardinality: Q = Q(
    "cms_join_cardinality",
    Some(s"""
      WITH d AS (SELECT unnest([0, 1, 2, 3]) AS d),
      ga AS (
        SELECT d.d AS depth, ${bucketSql("o_custkey", "d.d")} AS bucket,
          count(*) AS cnt
        FROM orders, d GROUP BY 1, 2),
      gb AS (
        SELECT d.d AS depth, ${bucketSql("c_custkey", "d.d")} AS bucket,
          count(*) AS cnt
        FROM customer, d GROUP BY 1, 2),
      dots AS (
        SELECT ga.depth, SUM(ga.cnt * gb.cnt) AS dot
        FROM ga JOIN gb USING (depth, bucket)
        GROUP BY ga.depth)
      SELECT CAST(MIN(dot) AS BIGINT) AS cms_join_est,
        (SELECT count(*) FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey) AS exact_rows
      FROM dots"""),
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      val ska = CountMin.sketch(orders, "o_custkey", Depth, Width, Seed)
      val skb = CountMin.sketch(customer, "c_custkey", Depth, Width, Seed)
      val exact = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      val out = CountMin.joinCardinality(ska, skb)
        .withColumn("exact_rows", lit(exact))
      val est = out.collect().head.getAs[Long]("cms_join_est")
      require(est >= exact,
        s"CMS join estimate $est undercounts exact $exact")
      out
    })

  override def queries: Seq[Q] =
    Seq(cmsCounters, cmsEstimates, cmsJoinCardinality)
}
