package graft

import org.apache.spark.sql.functions._

import graft.ops.ClusterEval

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Double], String)]) =
    rows.toDF("id", "v", "c")

  test("silhouette: hand-computed two-cluster line, singleton scores 0") {
    val data = df(Seq(
      (0L, Array(0.0, 0.0), "A"), (1L, Array(1.0, 0.0), "A"),
      (10L, Array(10.0, 0.0), "B"), (11L, Array(11.0, 0.0), "B"),
      (99L, Array(100.0, 0.0), "C"))) // singleton
    val out = ClusterEval.silhouetteSample(data, "id", "v", "c", lit(true))
      .collect().map(r => r.getAs[Long]("pid") -> r).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // point 0: a = 1, b = mean(10, 11) = 10.5 -> s = 9.5/10.5
    assert(out(0L).getAs[Double]("a_mean") == 1.0)
    assert(out(0L).getAs[Double]("b_mean") == 10.5)
    assert(out(0L).getAs[Double]("s") == r6(9.5 / 10.5))
    // point 1: a = 1, b = mean(9, 10) = 9.5
    assert(out(1L).getAs[Double]("s") == r6(8.5 / 9.5))
    // the singleton: a undefined -> 0 by convention
    assert(out(99L).isNullAt(out(99L).fieldIndex("a_mean")))
    assert(out(99L).getAs[Double]("s") == 0.0)
    // all of A and B are well-separated: positive scores
    Seq(10L, 11L).foreach(i => assert(out(i).getAs[Double]("s") > 0.8))
    val sum = ClusterEval.silhouetteSummary(
      ClusterEval.silhouetteSample(data, "id", "v", "c", lit(true))).head()
    assert(sum.getAs[Long]("n_points") == 5L)
    assert(sum.getAs[Double]("frac_negative") == 0.0)
  }

  test("silhouette: a misassigned point scores negative") {
    val data = df(Seq(
      (0L, Array(0.0, 0.0), "A"), (1L, Array(1.0, 0.0), "A"),
      (2L, Array(10.0, 0.0), "A"), // belongs with B
      (10L, Array(10.5, 0.0), "B"), (11L, Array(11.0, 0.0), "B")))
    val out = ClusterEval.silhouetteSample(data, "id", "v", "c", lit(true))
      .collect().map(r => r.getAs[Long]("pid") -> r).toMap
    assert(out(2L).getAs[Double]("s") < 0,
      s"misassigned point must score negative: ${out(2L)}")
  }

  test("silhouette: fewer than two clusters fails loudly") {
    val one = df(Seq((0L, Array(0.0), "A"), (1L, Array(1.0), "A")))
    val e = intercept[IllegalArgumentException] {
      ClusterEval.silhouetteSample(one, "id", "v", "c", lit(true))
    }
    assert(e.getMessage.contains("at least 2 clusters"))
  }

  test("validity indices: hand geometry, separation moves both, guards") {
    // two tight clusters 10 apart: wss = 4, bss = 100, CH = 50, DB = 0.2
    val tight = df(Seq(
      (0L, Array(0.0, 0.0), "a"), (1L, Array(0.0, 2.0), "a"),
      (2L, Array(10.0, 0.0), "b"), (3L, Array(10.0, 2.0), "b")))
    val r = ClusterEval.validityIndices(tight, "id", "v", "c").head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("wss") == 4.0 && r.getAs[Double]("bss") == 100.0,
      s"$r")
    assert(r.getAs[Double]("ch_index") == 50.0 &&
      r.getAs[Double]("db_index") == 0.2)
    // the same shape squeezed together: CH collapses, DB explodes
    val close = df(Seq(
      (0L, Array(0.0, 0.0), "a"), (1L, Array(0.0, 2.0), "a"),
      (2L, Array(1.0, 0.0), "b"), (3L, Array(1.0, 2.0), "b")))
    val c = ClusterEval.validityIndices(close, "id", "v", "c").head()
    assert(c.getAs[Double]("ch_index") < r.getAs[Double]("ch_index"))
    assert(c.getAs[Double]("db_index") > r.getAs[Double]("db_index"))
    // guards: one cluster, and as many clusters as points
    intercept[IllegalArgumentException] {
      ClusterEval.validityIndices(
        df(Seq((0L, Array(0.0), "A"), (1L, Array(1.0), "A"))),
        "id", "v", "c")
    }
    intercept[IllegalArgumentException] {
      ClusterEval.validityIndices(
        df(Seq((0L, Array(0.0), "A"), (1L, Array(1.0), "B"))),
        "id", "v", "c")
    }
  }
}
