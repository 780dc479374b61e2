package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deeper multi-join aggregates (TPC-H Q3/Q5 shapes) — exercising join
  * reordering, broadcast selection and decimal-exact revenue math across
  * 3–6 tables. Beyond the reference's own 2–3-table star, but the shape a
  * real cohort engine hits as soon as dimensions nest (region→nation→
  * customer), and the classic scale test for join planning.
  */
object JoinQueries extends QueryModule {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def revenue = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** Q3 shape: unshipped high-value orders for a segment. */
  val q3Shipping: Q = Q(
    "q3_shipping_priority",
    Some("""
      SELECT l.l_orderkey,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, l.l_orderkey
      LIMIT 10"""),
    (s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    })

  /** Q5 shape: revenue by nation through a 6-table chain; broadcastable
    * dims (region, nation, supplier) + the lineitem fact. The customer
    * join carries TPC-H's `c_nationkey = s_nationkey` predicate — the
    * "local supplier" condition that makes the join load-bearing (without
    * it the customer table contributes nothing but a wasted fact-stream
    * join, basic_data_fusion.py's Q5 shape notwithstanding). */
  val q5Nation: Q = Q(
    "q5_nation_revenue",
    Some("""
      SELECT n.n_name,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM region r
      JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_nationkey = n.n_nationkey
      JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
        AND c.c_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n.n_name
      ORDER BY revenue DESC, n.n_name"""),
    (s, dir) => {
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, dir, "nation")
      val sup = Tables.load(s, dir, "supplier")
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = Tables.load(s, dir, "customer")
      broadcast(r)
        .join(n, n("n_regionkey") === r("r_regionkey"))
        .join(sup, sup("s_nationkey") === n("n_nationkey"))
        .join(l, l("l_suppkey") === sup("s_suppkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey")
          && c("c_nationkey") === sup("s_nationkey"))
        .groupBy(n("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })

  /** Salted skew join ([[graft.operators.SkewJoin]]): a synthetic hot key
    * carries ~80% of lineitem (the empty-host/`en`-language shape of real
    * crawl joins), joined to a 97-row dim through 8 salt sub-keys.
    * ORACLE-checked: DuckDB runs the PLAIN join — a hash match proves
    * salting is result-invariant (fact rows salted once each, dim rows
    * replicated per salt), which is the operator's entire contract. */
  val j4SaltedSkew: Q = Q(
    "j4_salted_skew_join",
    Some("""
      WITH f AS (
        SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                    ELSE l_orderkey % 97 END AS k,
               l_quantity
        FROM lineitem),
      d AS (SELECT range AS k, 'seg_' || CAST(range AS VARCHAR) AS seg
            FROM range(97))
      SELECT f.k, d.seg, count(*) AS n,
        CAST(SUM(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM f JOIN d ON f.k = d.k
      GROUP BY f.k, d.seg
      ORDER BY f.k"""),
    (s, dir) => {
      val f = Tables.load(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 < 8, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(97L))).as("k"),
        col("l_quantity"))
      val d = s.range(97).select(col("id").as("k"),
        concat(lit("seg_"), col("id").cast("string")).as("seg"))
      graft.operators.SkewJoin.saltedJoin(f, d, Seq("k"), salt = 8)
        .groupBy("k", "seg")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
        .orderBy("k")
    })

  override def queries: Seq[Q] = Seq(q3Shipping, q5Nation, j4SaltedSkew)
}
