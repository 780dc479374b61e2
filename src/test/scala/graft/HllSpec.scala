package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(n: Int, m: Int = 256): (Double, Long) = {
    val df = (0 until n).map(i => s"key-$i").toDF("k")
    val row = Hll.estimate(Hll.sketch(df, "k", m), m).collect().head
    (row.getAs[Double]("hll_est"), row.getAs[Long]("v_zero"))
  }

  test("estimates track exact cardinality within 4 sigma across regimes") {
    val sigma = 1.04 / math.sqrt(256.0)
    Seq(100, 1000, 10000).foreach { n =>
      val (est, _) = estimateOf(n)
      assert(math.abs(est - n) <= 4 * sigma * n,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("small cardinalities take the linear-counting branch and stay tight") {
    val (est, vZero) = estimateOf(30)
    assert(vZero > 0, "30 keys cannot fill 256 registers")
    // linear counting is near-exact this far below m
    assert(math.abs(est - 30) <= 4, s"LC estimate $est for n=30")
    val expected = 256.0 * math.log(256.0 / vZero)
    assert(math.abs(est - math.rint(expected * 1e4) / 1e4) < 1e-9,
      "estimate must be the rounded LC formula")
  }

  test("merge is the register-wise max: union equality and idempotence") {
    val all = (0 until 500).map(i => s"k$i").toDF("k")
    val (a, b) = ((0 until 300).map(i => s"k$i").toDF("k"),
      (200 until 500).map(i => s"k$i").toDF("k"))
    val whole = Hll.sketch(all, "k").orderBy("bucket")
      .as[(Long, Int)].collect().toSeq
    val merged = Hll.merge(Hll.sketch(a, "k"), Hll.sketch(b, "k"))
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(merged == whole, "merge(shards) must equal sketch of union")
    val sk = Hll.sketch(a, "k")
    val twice = Hll.merge(sk, sk).orderBy("bucket")
      .as[(Long, Int)].collect().toSeq
    assert(twice == sk.orderBy("bucket").as[(Long, Int)].collect().toSeq,
      "merge must be idempotent")
  }

  test("grouped sketches estimate per group; null keys are excluded") {
    val rows = (0 until 1000).map(i => ("g" + (i % 2), s"k${i % 400}")) ++
      Seq(("g0", null), ("g1", null))
    val df = rows.toDF("g", "k")
    val est = Hll.estimateBy(
      Hll.sketchBy(df, Seq("g"), "k"), Seq("g"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("hll_est"))
      .toMap
    // g0 sees k0,k2,...  (200 distinct), g1 the odd 200
    val sigma = 1.04 / math.sqrt(256.0)
    Seq("g0", "g1").foreach { g =>
      assert(math.abs(est(g) - 200) <= 4 * sigma * 200,
        s"$g est=${est(g)}")
    }
  }

  test("streaming fold is replay-safe without batchId bookkeeping") {
    val batches = Seq(
      (0 until 200).map(i => s"k$i"),
      (150 until 350).map(i => s"k$i"),
      (300 until 500).map(i => s"k$i"))
    val (ref, fold) = Hll.runningSketchSink("k")
    batches.zipWithIndex.foreach { case (b, i) => fold(b.toDF("k"), i.toLong) }
    val afterAll = ref.get()
    // re-deliver the middle batch (at-least-once source): max is idempotent
    fold(batches(1).toDF("k"), 1L)
    assert(ref.get() == afterAll, "replayed batch must not move registers")
    val whole = Hll.sketch((0 until 500).map(i => s"k$i").toDF("k"), "k")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
    assert(afterAll == whole, "folded stream must equal the batch sketch")
  }

  test("sliding window: trailing semantics, quiet days, tail clipping") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // day 0: users 1..200; day 1: users 101..300; day 3: users 1..50
    // (day 2 is quiet but inside day-1's trailing window)
    val events = ((1 to 200).map(u => (ts(0), u.toLong)) ++
      (101 to 300).map(u => (ts(1), u.toLong)) ++
      (1 to 50).map(u => (ts(3), u.toLong))).toDF("ts", "user_id")
    val out = Hll.slidingEstimateByDay(events, "ts", "user_id",
        windowDays = 2).collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        r.getAs[Double]("hll_est")).toMap
    // windows: d0 {1..200}=200, d1 {1..300}=300, d2 {101..300}=200
    // (quiet day, trailing from d1), d3 {1..50}=50; nothing past d3
    val expect = Map(0L -> 200.0, 1L -> 300.0, 2L -> 200.0, 3L -> 50.0)
    assert(out.keySet == expect.keySet, s"days = ${out.keySet}")
    val sigma = 1.04 / math.sqrt(256.0)
    expect.foreach { case (d, n) =>
      assert(math.abs(out(d) - n) <= 4 * sigma * n,
        s"day $d: est ${out(d)} vs exact $n") }
    // W = 1 degenerates to the per-day estimates
    val w1 = Hll.slidingEstimateByDay(events, "ts", "user_id", windowDays = 1)
      .collect().map(_.getAs[Double]("hll_est")).sorted
    val perDay = Hll.estimateBy(
      Hll.sketchBy(events.withColumn("__day", to_date(col("ts"))),
        Seq("__day"), "user_id"), Seq("__day"))
      .collect().map(_.getAs[Double]("hll_est")).sorted
    assert(w1.sameElements(perDay))
  }
}
