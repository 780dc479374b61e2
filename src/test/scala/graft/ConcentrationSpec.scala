package graft

import org.apache.spark.sql.functions._

import graft.ops.Concentration

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed shares: [1, 3] gives gini 0.25, hhi 0.625") {
    val df = Seq(("a", 1L), ("b", 3L)).toDF("k", "w")
    val r = Concentration.report(df, Seq("k"), $"w", topK = 1).head()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r.getAs[Long]("n_keys") == 2L)
    assert(r.getAs[Long]("total_weight") == 4L)
    assert(r.getAs[Double]("top1_share") == 0.75)
    assert(r.getAs[Double]("topk_share") == 0.75)
    assert(r.getAs[Double]("hhi") == 0.625)
    assert(r.getAs[Double]("gini") == 0.25)
    assert(r.getAs[Double]("entropy") ==
      r6(-(0.25 * math.log(0.25) + 0.75 * math.log(0.75))))
  }

  test("uniform shares: gini 0, normalized entropy 1; monopoly: hhi 1") {
    val uniform = (0 until 8).map(i => (s"k$i", 5L)).toDF("k", "w")
    val u = Concentration.report(uniform, Seq("k"), $"w").head()
    assert(u.getAs[Double]("gini") == 0.0)
    assert(u.getAs[Double]("entropy_norm") == 1.0)
    assert(u.getAs[Double]("hhi") == 0.125)
    val mono = Seq(("only", 100L)).toDF("k", "w")
    val m = Concentration.report(mono, Seq("k"), $"w").head()
    assert(m.getAs[Double]("hhi") == 1.0 && m.getAs[Double]("gini") == 0.0 &&
      m.getAs[Double]("entropy_norm") == 0.0)
  }

  test("rank-weight sum is partitioning-invariant; empty fails loudly") {
    val df = (0 until 200).map(i => (s"k$i", (i % 13 + 1).toLong))
      .toDF("k", "w")
    val a = Concentration.report(df, Seq("k"), $"w").head()
    val b = Concentration.report(df.repartition(17), Seq("k"), $"w").head()
    assert(a.getAs[Double]("gini") == b.getAs[Double]("gini"))
    assert(a.getAs[Double]("entropy") == b.getAs[Double]("entropy"))
    assert(intercept[IllegalArgumentException] {
      Concentration.report(df.filter(lit(false)), Seq("k"), $"w")
    }.getMessage.contains("empty key set"))
  }

  test("lorenz deciles: uniform diagonal, concentrated sags, negative loud") {
    // equal values: the curve IS the diagonal
    val flat = (1 to 100).map(i => (i, 5.0)).toDF("i", "v")
    Concentration.lorenzDeciles(flat, $"v").collect().foreach { r =>
      assert(r.getAs[Double]("cum_pop_frac") ==
        r.getAs[Double]("cum_value_frac"), s"$r")
    }
    // one whale: the bottom buckets carry almost nothing
    val whale = ((1 to 99).map(i => (i, 1.0)) :+ ((100, 9901.0)))
      .toDF("i", "v")
    val rows = Concentration.lorenzDeciles(whale, $"v")
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    val bottom = rows(1)
    assert(bottom.getAs[Double]("cum_pop_frac") == 0.99 &&
      bottom.getAs[Double]("cum_value_frac") < 0.02,
      s"99% of rows carry <1% of mass: $bottom")
    val last = rows(rows.keys.max)
    assert(last.getAs[Double]("cum_pop_frac") == 1.0 &&
      last.getAs[Double]("cum_value_frac") == 1.0)
    intercept[IllegalArgumentException] {
      Concentration.lorenzDeciles(
        Seq((1, -2.0), (2, 5.0)).toDF("i", "v"), $"v")
    }
  }
}
