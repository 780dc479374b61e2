package graft

import graft.ops.Bitext

class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Double])]) =
    rows.toDF("id", "v")

  test("margin penalizes the hub: cosine-best and margin-best disagree") {
    // X clusters around (1, 0)-ish; y_hub sits inside the cluster (close
    // to EVERYTHING in X -> uniformly high neighborhood -> penalized),
    // y_target is close only to x1. Raw cosine ranks hub above target
    // for x1; the ratio margin flips the preference — the exact failure
    // mode the Artetxe & Schwenk margin exists to fix.
    val xs = vecs(Seq(
      1L -> Array(1.0, 0.0),
      2L -> Array(0.95, 0.312),
      3L -> Array(0.90, 0.436)))
    val ys = vecs(Seq(
      10L -> Array(0.95, 0.312),   // hub
      11L -> Array(0.94, -0.341))) // target: near x1 only
    val scores = Bitext.marginScores(xs, ys, "id", "v", k = 2)
      .collect()
      .map(r => (r.getAs[Long]("x_id"), r.getAs[Long]("y_id")) ->
        ((r.getAs[Double]("cosine"), r.getAs[Double]("margin")))).toMap
    val (cosHub, mHub) = scores((1L, 10L))
    val (cosTgt, mTgt) = scores((1L, 11L))
    assert(cosHub > cosTgt, s"fixture broke: hub cosine $cosHub <= $cosTgt")
    assert(mTgt > mHub,
      s"margin must flip the hub preference: target $mTgt vs hub $mHub")
    // and the miner pairs x1 with the target, above margin 1
    val mined = Bitext.marginMine(xs, ys, "id", "v", k = 2, minMargin = 1.0)
      .collect().map(r => r.getAs[Long]("x_id") -> r.getAs[Long]("y_id"))
      .toMap
    assert(mined.get(1L).contains(11L),
      s"x1 should mine the target, got $mined")
  }

  test("twin corpora mine their twins one-to-one") {
    val base = Seq(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0),
      Array(0.7, 0.7, 0.0), Array(0.0, 0.6, 0.8))
    val xs = vecs(base.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    val ys = vecs(base.zipWithIndex.map { case (v, i) => (100L + i, v) })
    val mined = Bitext.marginMine(xs, ys, "id", "v", k = 3)
      .collect()
    assert(mined.length == base.length, s"expected all twins mined")
    mined.foreach { r =>
      assert(r.getAs[Long]("y_id") == 100L + r.getAs[Long]("x_id"))
      assert(r.getAs[Double]("cosine") == 1.0)
      assert(r.getAs[Double]("margin") > 1.0)
    }
  }

  test("ivf miner with full probing equals the exact miner bit-for-bit") {
    // nProbe == nLists retrieves every cell, so the candidate graph is
    // all pairs and the blocked miner must reproduce marginMine exactly
    val xs = vecs((0 until 24).map(i => (i.toLong,
      Array(math.cos(i * 0.26), math.sin(i * 0.26), (i % 5) * 0.1))))
    val ys = vecs((0 until 24).map(i => (100L + i,
      Array(math.cos(i * 0.26 + 0.05), math.sin(i * 0.26 + 0.05), (i % 5) * 0.1))))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("x_id"), r.getAs[Long]("y_id"),
        r.getAs[Double]("cosine"), r.getAs[Double]("margin"))).toSet
    val exact = rows(Bitext.marginMine(xs, ys, "id", "v", k = 3))
    val full = rows(Bitext.marginMineIvf(xs, ys, "id", "v", k = 3,
      nLists = 4, nProbe = 4, fitSampleRows = 0L))
    assert(exact.nonEmpty && full == exact,
      s"full-probe IVF must equal exact:\n only exact: ${exact -- full}\n only ivf: ${full -- exact}")
    // narrow probing stays a subset of the exact scorer's pair universe
    // on the cosine column (exact scoring over retrieved candidates)
    val narrow = Bitext.marginMineIvf(xs, ys, "id", "v", k = 3,
      nLists = 4, nProbe = 1, fitSampleRows = 0L).collect()
    val exactCos = exact.map(t => (t._1, t._2) -> t._3).toMap
    narrow.foreach { r =>
      val key = (r.getAs[Long]("x_id"), r.getAs[Long]("y_id"))
      exactCos.get(key).foreach(c =>
        assert(r.getAs[Double]("cosine") == c, s"cosine drift on $key"))
    }
  }

  test("mutual-best is one-to-one; null vectors never pair") {
    val xs = Seq((1L, Some(Array(1.0, 0.0))), (2L, None))
      .toDF("id", "v")
    val ys = Seq((10L, Some(Array(0.9, 0.436))), (11L, Some(Array(0.5, 0.866))))
      .toDF("id", "v")
    val mined = Bitext.marginMine(xs, ys, "id", "v", k = 2,
      minMargin = 0.0).collect()
    assert(mined.map(_.getAs[Long]("x_id")).distinct.length == mined.length)
    assert(!mined.exists(_.getAs[Long]("x_id") == 2L))
  }
}
