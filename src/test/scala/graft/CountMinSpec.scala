package graft

import org.apache.spark.sql.functions._

import graft.ops.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words =
    Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++ Seq.fill(9)("gamma") ++
      (0 until 50).map(i => s"rare$i")
  private lazy val df = words.toDF("w")

  test("each depth row's counters sum to exactly N") {
    val sk = CountMin.sketch(df, "w", depth = 4, width = 64)
    val perDepth = sk.groupBy("depth").agg(sum("cnt").as("n"))
      .select("n").as[Long].collect()
    assert(perDepth.length == 4)
    assert(perDepth.forall(_ == words.length.toLong))
  }

  test("estimates never undercount, and are exact at collision-free width") {
    val exact = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val keys = exact.keys.toSeq.toDF("w")
    // tight width: collisions certain → one-sided error only
    val tight = CountMin.estimate(
      CountMin.sketch(df, "w", 4, 16), keys, "w", 4, 16)
      .select("w", "cms_est").as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(tight(k) >= n, s"undercount for $k: ${tight(k)} < $n")
    }
    // huge width: 53 keys in 4 x 65536 counters — min over 4 depths is
    // exact unless the same pair collides at every depth (~(53²/65536)⁴)
    val wide = CountMin.estimate(
      CountMin.sketch(df, "w", 4, 65536), keys, "w", 4, 65536)
      .select("w", "cms_est").as[(String, Long)].collect().toMap
    assert(wide == exact, "wide sketch should be collision-free here")
  }

  test("merge of shard sketches equals the sketch of the union") {
    val (a, b) = (words.take(60).toDF("w"), words.drop(60).toDF("w"))
    val merged = CountMin.merge(
      CountMin.sketch(a, "w", 4, 64), CountMin.sketch(b, "w", 4, 64))
      .orderBy("depth", "bucket").as[(Int, Long, Long)].collect().toSeq
    val whole = CountMin.sketch(df, "w", 4, 64)
      .orderBy("depth", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(merged == whole)
  }

  test("null keys are not occurrences") {
    val withNulls = (words.map(Option(_)) ++ Seq(None, None)).toDF("w")
    val sk = CountMin.sketch(withNulls, "w", 2, 64)
    val n = sk.filter(col("depth") === 0).agg(sum("cnt")).as[Long].head()
    assert(n == words.length.toLong)
  }

  test("join-cardinality estimate never undercounts; exact when collision-free") {
    val a = words.toDF("w")
    val b = (words.take(80) ++ Seq("delta", "delta")).toDF("w")
    val exact = a.join(b.withColumnRenamed("w", "w2"),
      col("w") === col("w2")).count()
    // tight width forces collisions: estimate must stay one-sided
    val estTight = CountMin.joinCardinality(
        CountMin.sketch(a, "w", 4, 16), CountMin.sketch(b, "w", 4, 16))
      .collect().head.getAs[Long]("cms_join_est")
    assert(estTight >= exact, s"undercount: $estTight < $exact")
    // collision-free width: the inner product IS the exact join size
    val estWide = CountMin.joinCardinality(
        CountMin.sketch(a, "w", 4, 65536), CountMin.sketch(b, "w", 4, 65536))
      .collect().head.getAs[Long]("cms_join_est")
    assert(estWide == exact, s"collision-free estimate $estWide != $exact")
  }

  test("running sink folds micro-batches and skips re-delivered batch ids") {
    val (ref, fn) = CountMin.runningSketchSink("w", depth = 4, width = 64)
    val b0 = words.take(70).toDF("w")
    val b1 = words.drop(70).toDF("w")
    fn(b0, 0L)
    fn(b1, 1L)
    fn(b1, 1L) // at-least-once redelivery of the same epoch
    val whole = CountMin.sketch(df, "w", 4, 64).collect()
      .map(r => (r.getAs[Int]("depth"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(ref.get() == whole, "accumulator drifted from the batch sketch")
  }
}
