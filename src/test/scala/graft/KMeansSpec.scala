package graft

import org.apache.spark.sql.functions._

import graft.ops.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** The exact rounding ladder the engine applies, reproduced driver-side:
    * cast-to-decimal(12) each component, exact sum, double mean, round(6)
    * HALF_UP on the shortest decimal representation (what Spark's round
    * does via BigDecimal.valueOf). */
  private def engineRound(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent full reference: same deterministic hash init, Lloyd loop
    * with decimal-exact means and round-before-reuse — written against the
    * SPEC of the algorithm, not the Spark code. */
  private def referenceFit(
      rows: Seq[(Long, Array[Double])], k: Int, iters: Int, seed: String)
      : (Array[Array[Double]], Map[Long, Int]) = {
    var cents = rows
      .sortBy { case (id, _) => (md5Hex(s"$seed|$id"), id) }
      .take(k)
      .map(_._2.map(engineRound(_, 6)))
      .toArray
    def nearest(v: Array[Double]): Int = {
      val xx = v.foldLeft(0.0)((a, x) => a + x * x)
      cents.zipWithIndex.map { case (c, i) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        val dot = v.indices.foldLeft(0.0)((a, j) => a + v(j) * c(j))
        (xx - 2.0 * dot + cc, i)
      }.min
    }._2
    var labels = Map.empty[Long, Int]
    for (_ <- 1 to iters) {
      labels = rows.map { case (id, v) => id -> nearest(v) }.toMap
      val next = cents.map(_.clone())
      labels.values.toSet[Int].foreach { cid =>
        val members = rows.filter { case (id, _) => labels(id) == cid }
        for (j <- next(cid).indices) {
          val s = members
            .map(m => java.math.BigDecimal.valueOf(m._2(j))
              .setScale(12, java.math.RoundingMode.HALF_UP))
            .reduce(_.add(_))
          next(cid)(j) =
            engineRound(s.doubleValue() / members.size, 6)
        }
      }
      cents = next
    }
    labels = rows.map { case (id, v) => id -> nearest(v) }.toMap
    (cents, labels)
  }

  /** Deterministic pseudo-random doubles in [0,1) from a hash recurrence. */
  private def synth(n: Int, dim: Int): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim) { j =>
        val h = ((i * 1103515245L + j * 12345L + 6789L) * 2654435761L) & 0xffffffffL
        h.toDouble / 4294967296.0
      })
    }

  test("well-separated clusters recover ground truth with exact means") {
    // two tight blobs far apart; ids interleave the blobs
    val rows = (0 until 40).map { i =>
      val blob = i % 2
      (i.toLong, Array(blob * 100.0 + (i / 2) * 0.01, blob * 100.0))
    }
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val model = KMeans.fit(df, "id", "vec", k = 2, iters = 3)
    val got = KMeans.assign(df, "vec", model)
      .select(col("id"), col("cluster_id")).as[(Long, Int)].collect().toMap
    // one cluster per blob, internally consistent
    val byBlob = rows.groupBy(_._1 % 2).view
      .mapValues(_.map { case (id, _) => got(id) }.toSet).toMap
    assert(byBlob.values.forall(_.size == 1), s"blob split across clusters: $byBlob")
    assert(byBlob(0L) != byBlob(1L), "blobs merged into one cluster")
    // converged centroid = the blob's exact componentwise mean (rounded)
    for ((blob, cids) <- byBlob; cid = cids.head) {
      val members = rows.filter(_._1 % 2 == blob).map(_._2)
      val mean = Array.tabulate(2)(j =>
        engineRound(members.map(_(j)).sum / members.size, 6))
      assert(model.centroids(cid).toSeq == mean.toSeq,
        s"centroid $cid drifted: ${model.centroids(cid).toSeq} vs ${mean.toSeq}")
    }
  }

  test("full parity with an independent driver reference on synthetic data") {
    val rows = synth(200, 4)
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val (refCents, refLabels) = referenceFit(rows, k = 3, iters = 3, seed = "graft-km")
    val model = KMeans.fit(df, "id", "vec", k = 3, iters = 3)
    assert(model.centroids.map(_.toSeq).toSeq == refCents.map(_.toSeq).toSeq)
    val got = KMeans.assign(df, "vec", model)
      .select(col("id"), col("cluster_id")).as[(Long, Int)].collect().toMap
    assert(got == refLabels)
  }

  test("fit is invariant under repartition") {
    val rows = synth(150, 4)
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val a = KMeans.fit(df, "id", "vec", k = 3, iters = 2)
    val b = KMeans.fit(df.repartition(7), "id", "vec", k = 3, iters = 2)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("an emptied cluster keeps its seed centroid instead of vanishing") {
    // every point sits at one of two locations, so 3 seeds include a
    // duplicate location; the min-cid tie-break drains the twin seed
    val rows = (0 until 60).map { i =>
      (i.toLong, Array((i % 2) * 50.0, (i % 2) * 50.0))
    }
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val model = KMeans.fit(df, "id", "vec", k = 3, iters = 2)
    val assigned = KMeans.assign(df, "vec", model)
    val sizes = KMeans.clusterSizes(assigned)
      .select(col("cluster_id"), col("size")).as[(Int, Long)].collect().toMap
    assert(sizes.values.sum == 60L)
    assert(sizes.size == 2, s"expected exactly one drained cluster: $sizes")
    val drained = (0 until 3).filterNot(sizes.contains)
    assert(drained.size == 1)
    // its centroid is still one of the two seed locations, unmoved
    val kept = model.centroids(drained.head).toSeq
    assert(kept == Seq(0.0, 0.0) || kept == Seq(50.0, 50.0),
      s"drained centroid drifted: $kept")
  }

  test("assign dist is the squared L2 to the chosen centroid") {
    val df = Seq((1L, Seq(3.0, 4.0))).toDF("id", "vec")
    val model = KMeans.Model(Array(Array(0.0, 0.0), Array(3.0, 5.0)), 6)
    val row = KMeans.assign(df, "vec", model)
      .select(col("cluster_id"), col("dist")).head()
    assert(row.getInt(0) == 1) // dist 1 beats dist 25
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("ties between equidistant centroids break to the lower cluster id") {
    val df = Seq((1L, Seq(5.0, 0.0))).toDF("id", "vec")
    val model = KMeans.Model(Array(Array(10.0, 0.0), Array(0.0, 0.0)), 6)
    val got = KMeans.assign(df, "vec", model).select("cluster_id").head().getInt(0)
    assert(got == 0)
  }

  test("prototype pruning keeps the farthest ceil-fraction per cluster") {
    // cluster 0: dists 1..10 (ids 0..9); cluster 1: dists 1..4 (ids 10..13)
    val assigned = (
      (0 until 10).map(i => (i.toLong, 0, (i + 1).toDouble)) ++
      (0 until 4).map(i => (10L + i, 1, (i + 1).toDouble))
    ).toDF("id", "cluster_id", "dist")
    val kept = KMeans.prunePrototypes(assigned, "id", keepFraction = 0.3)
      .select(col("id"), col("cluster_id"), col("proto_rank"))
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    // ceil(0.3*10)=3 farthest of cluster 0 (dists 10,9,8 → ids 9,8,7);
    // ceil(0.3*4)=2 of cluster 1 (dists 4,3 → ids 13,12)
    assert(kept == Seq((7L, 0, 3), (8L, 0, 2), (9L, 0, 1),
      (12L, 1, 2), (13L, 1, 1)))
  }

  test("null vectors never seed, never vote, and assign to no cluster") {
    val rows: Seq[(Long, Option[Seq[Double]])] =
      (0 until 20).map(i => (i.toLong, Some(Seq((i % 2) * 10.0, 1.0)))) :+
        (99L, Option.empty[Seq[Double]])
    val df = rows.toDF("id", "vec")
    val model = KMeans.fit(df, "id", "vec", k = 2, iters = 2)
    // both centroids derive from real vectors only
    assert(model.centroids.forall(_.forall(x => !x.isNaN)))
    assert(model.centroids.map(_.toSeq).toSet ==
      Set(Seq(0.0, 1.0), Seq(10.0, 1.0)))
    val got = KMeans.assign(df, "vec", model)
      .select(col("id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(got(99L).isEmpty, "null vector received a cluster")
    assert((0 until 20).forall(i => got(i.toLong).isDefined))
  }

  test("model round-trips through parquet") {
    val rows = synth(60, 4)
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val model = KMeans.fit(df, "id", "vec", k = 3, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-km-model")
    try {
      val path = s"$dir/model"
      KMeans.saveModel(spark, model, path)
      val loaded = KMeans.loadModel(spark, path)
      assert(loaded.decimals == model.decimals)
      assert(loaded.centroids.map(_.toSeq).toSeq ==
        model.centroids.map(_.toSeq).toSeq)
      // loaded model scores identically
      val a = KMeans.assign(df, "vec", model)
        .select("id", "cluster_id").as[(Long, Int)].collect().toMap
      val b = KMeans.assign(df, "vec", loaded)
        .select("id", "cluster_id").as[(Long, Int)].collect().toMap
      assert(a == b)
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("prototype pruning: every cluster keeps at least one row, ties break on id") {
    val assigned = Seq(
      (1L, 0, 5.0), (2L, 0, 5.0), // exact tie: rank by id asc
      (3L, 1, 0.0)                // singleton cluster, tiny fraction
    ).toDF("id", "cluster_id", "dist")
    val kept = KMeans.prunePrototypes(assigned, "id", keepFraction = 0.01)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L), s"got $kept") // min-1 per cluster; tie → lower id
  }
}
