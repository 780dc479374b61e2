package graft

import org.apache.spark.sql.functions._

import graft.stats.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, q: String) =
    df.filter($"query" === q).head()

  test("ranking metrics: hand-computed nDCG/MRR/P@k/R@k per query") {
    // q1: graded docs; q2: nothing relevant; q3: perfect ranking
    val df = Seq(
      ("q1", 1L, 10.0, 2), ("q1", 2L, 9.0, 0), ("q1", 3L, 8.0, 1),
      ("q1", 4L, 7.0, 0), ("q1", 5L, 6.0, 2),
      ("q2", 6L, 5.0, 0), ("q2", 7L, 4.0, 0),
      ("q3", 8L, 3.0, 1), ("q3", 9L, 2.0, 0))
      .toDF("query", "doc", "s", "rel")
    val m = Ranking.rankingMetrics(df, "query", "doc", $"s", $"rel", k = 3)
    assert(m.count() == 3)

    val q1 = row(m, "q1")
    // system top-3: rel 2,0,1 -> DCG = 3/1 + 0 + 1/2 = 3.5
    // ideal top-3: rel 2,2,1 -> IDCG = 3 + 3/log2(3) + 0.5
    val idcg = 3.0 + 3.0 / (math.log(3.0) / math.log(2.0)) + 0.5
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(q1.getAs[Double]("ndcg_at_k") == r6(3.5 / idcg))
    assert(q1.getAs[Double]("mrr") == 1.0)
    assert(q1.getAs[Double]("precision_at_k") == r6(2.0 / 3.0))
    assert(q1.getAs[Double]("recall_at_k") == r6(2.0 / 3.0))
    assert(q1.getAs[Long]("n_rel") == 3L)

    // no relevant docs: nDCG/recall undefined (null), MRR is 0 by the
    // standard miss convention, precision 0
    val q2 = row(m, "q2")
    assert(q2.isNullAt(q2.fieldIndex("ndcg_at_k")))
    assert(q2.getAs[Double]("mrr") == 0.0)
    assert(q2.getAs[Double]("precision_at_k") == 0.0)
    assert(q2.isNullAt(q2.fieldIndex("recall_at_k")))

    // perfect single-relevant ranking: everything maxes
    val q3 = row(m, "q3")
    assert(q3.getAs[Double]("ndcg_at_k") == 1.0)
    assert(q3.getAs[Double]("mrr") == 1.0)
    assert(q3.getAs[Double]("recall_at_k") == 1.0)

    // macro: defined-only averaging (q2 contributes to mrr, not ndcg)
    val mac = Ranking.macroMetrics(m).head()
    assert(mac.getAs[Long]("n_queries") == 3L)
    assert(mac.getAs[Double]("macro_ndcg") ==
      r6((r6(3.5 / idcg) + 1.0) / 2.0))
    assert(mac.getAs[Double]("macro_mrr") == r6((1.0 + 0.0 + 1.0) / 3.0))
  }

  test("ranking metrics: deterministic doc tie-break on equal scores") {
    // both docs score 5.0 — rank must follow doc id, so rel=1 at doc 1
    // lands at rank 1 regardless of input order
    val a = Seq(("q", 2L, 5.0, 0), ("q", 1L, 5.0, 1)).toDF("query", "doc", "s", "rel")
    val b = Seq(("q", 1L, 5.0, 1), ("q", 2L, 5.0, 0)).toDF("query", "doc", "s", "rel")
    val ma = Ranking.rankingMetrics(a, "query", "doc", $"s", $"rel", 2).head()
    val mb = Ranking.rankingMetrics(b, "query", "doc", $"s", $"rel", 2).head()
    assert(ma.getAs[Double]("mrr") == 1.0 && mb.getAs[Double]("mrr") == 1.0)
  }

  test("null score or relevance rows are excluded, not ranked") {
    val df = Seq(
      ("q", 1L, Some(9.0), Some(1)), ("q", 2L, None, Some(1)),
      ("q", 3L, Some(8.0), None))
      .toDF("query", "doc", "s", "rel")
    val m = Ranking.rankingMetrics(df, "query", "doc", $"s", $"rel", 5).head()
    assert(m.getAs[Long]("n_docs") == 1L && m.getAs[Long]("n_rel") == 1L)
  }

  test("one query-key shuffle: the two rank windows share an exchange") {
    val df = Seq(("q", 1L, 1.0, 1)).toDF("query", "doc", "s", "rel")
    val plan = Ranking.rankingMetrics(df, "query", "doc", $"s", $"rel", 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected window + agg exchanges at most, found $exchanges:\n$plan")
  }

  test("rbo: identical lists give 1 - p^k, disjoint give 0, singles weight W(1)") {
    import graft.stats.Ranking
    val p = 0.9; val k = 20
    val a = (1 to k).map(r => ("q", s"d$r", r)).toDF("query", "doc", "rank")
    val same = Ranking.rbo(a, a, "query", "doc", "rank", p, k).head()
    // identical prefixes: A_d = 1 at every depth → (1−p)·Σ p^{d−1} = 1 − p^k
    val expect = BigDecimal(
      (1.0 - p) * (1 to k).map(d => BigDecimal(math.pow(p, d - 1) / d * d)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(same.getAs[Double]("rbo") - expect) < 2e-6,
      s"got ${same.getAs[Double]("rbo")} want ~$expect")
    assert(same.getAs[Long]("overlap_at_depth") == k.toLong)
    // disjoint rankings: no co-ranked item → 0, query still reported
    val b = (1 to k).map(r => ("q", s"x$r", r)).toDF("query", "doc", "rank")
    val dis = Ranking.rbo(a, b, "query", "doc", "rank", p, k).head()
    assert(dis.getAs[Double]("rbo") == 0.0 &&
      dis.getAs[Long]("overlap_at_depth") == 0L)
    // one shared item at rank 1 both sides contributes exactly W(1)
    val a1 = Seq(("q", "s", 1)).toDF("query", "doc", "rank")
    val b1 = Seq(("q", "s", 1), ("q", "t", 2)).toDF("query", "doc", "rank")
    val w1 = (1 to k).map(d => BigDecimal(math.pow(p, d - 1) / d)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val single = Ranking.rbo(a1, b1, "query", "doc", "rank", p, k).head()
    assert(math.abs(single.getAs[Double]("rbo") - (1.0 - p) * w1) < 2e-6)
    // top-weighting: agreement at the top outranks agreement at the bottom
    val topAgree = Ranking.rbo(a,
      ((1 to 5).map(r => ("q", s"d$r", r)) ++
        (6 to k).map(r => ("q", s"y$r", r))).toDF("query", "doc", "rank"),
      "query", "doc", "rank", p, k).head().getAs[Double]("rbo")
    val botAgree = Ranking.rbo(a,
      ((1 to 15).map(r => ("q", s"z$r", r)) ++
        (16 to k).map(r => ("q", s"d$r", r))).toDF("query", "doc", "rank"),
      "query", "doc", "rank", p, k).head().getAs[Double]("rbo")
    assert(topAgree > botAgree)
  }
}
