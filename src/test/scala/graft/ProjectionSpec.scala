package graft

import org.apache.spark.sql.functions._

import graft.ops.Projection

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Array[Double])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "embedding")

  /** Deterministic pseudo-random vectors (hash-derived, no RNG state). */
  private def fakeVec(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      val h = (id * 2654435761L + j * 40503L) & 0xffffL
      h.toDouble / 0xffff.toDouble - 0.5
    }

  test("sign matrix matches the Spark md5-parity expression") {
    val df = spark.range(1).select(
      (0 until 4).flatMap { i =>
        (0 until 5).map { j =>
          (when(pmod(conv(substring(md5(
            concat_ws("|", lit("graft-jl"), lit(i.toString), lit(j.toString))
              .cast("binary")), 1, 8), 16, 10).cast("long"), lit(2L)) === 0,
            1.0).otherwise(-1.0)).as(s"s_${i}_$j")
        }
      }: _*)
    val row = df.collect().head
    var idx = 0
    for (i <- 0 until 4; j <- 0 until 5) {
      assert(row.getDouble(idx) == Projection.sign("graft-jl", i, j),
        s"sign mismatch at ($i,$j)")
      idx += 1
    }
  }

  test("JL projection preserves pairwise distances within the JL bound") {
    val dim = 64; val out = 16
    val rows = (0L until 40L).map(id => id -> fakeVec(id, dim))
    val proj = Projection.signProject(vecDf(rows), "embedding", dim, out)
      .select(col("id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      a <- 0L until 40L; b <- (a + 1) until 40L
    } yield d2(proj(a), proj(b)) / d2(rows(a.toInt)._2, rows(b.toInt)._2)
    // k=16 gives a loose concentration; assert the mean is ~1 and no
    // catastrophic collapse/blow-up of any single pair
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean distortion $mean")
    // k=16 concentration is loose for the worst of 780 pairs: the bound
    // here is "no catastrophic collapse", not the asymptotic ε-band
    assert(ratios.min > 0.1 && ratios.max < 3.5,
      s"distortion range [${ratios.min}, ${ratios.max}]")
  }

  test("null and wrong-dimension vectors project to null") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0, 3.0, 4.0))),
      (2L, None),
      (3L, Some(Seq(1.0, 2.0)))).toDF("id", "embedding")
    val out = Projection.signProject(df, "embedding", 4, 2)
      .select("id", "proj").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty, "null vector must project to null")
    // wrong length: DotProduct length algebra yields null components
    assert(out(3L).forall(
      _.asInstanceOf[scala.collection.Seq[Any]].forall(_ == null)),
      "short vector must not silently project")
  }

  test("jacobiEigen recovers a known 2x2 spectrum") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (values, vectors) = Projection.jacobiEigen(m)
    val sorted = values.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for 3.0 is (1,1)/sqrt(2) up to sign
    val hiCol = values.indexOf(values.max)
    val v = Array(vectors(0)(hiCol), vectors(1)(hiCol))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12)
  }

  test("pcaFit agrees with an independent power-iteration eigensolver") {
    val dim = 8
    val rows = (0L until 200L).map(id => id -> fakeVec(id, dim))
    val df = vecDf(rows)
    val model = Projection.pcaFit(df, "embedding", dim, k = 3)

    // independent reference: build the SAME rounded covariance matrix from
    // the gate-checked distributed pass, then power-iterate with deflation
    // (a different algorithm than Jacobi)
    val covRows = Projection.covarianceUpper(df, "embedding", dim).collect()
    val cov = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val c = r.getAs[Double]("cov")
      cov(r.getAs[Int]("i"))(r.getAs[Int]("j")) = c
      cov(r.getAs[Int]("j"))(r.getAs[Int]("i")) = c
    }
    def matVec(m: Array[Array[Double]], v: Array[Double]) =
      m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    def powerIter(m: Array[Array[Double]]): (Double, Array[Double]) = {
      var v = Array.tabulate(dim)(i => 1.0 / math.sqrt(dim.toDouble) + i * 1e-3)
      for (_ <- 0 until 2000) {
        val w = matVec(m, v)
        val n = math.sqrt(w.map(x => x * x).sum)
        v = w.map(_ / n)
      }
      val lambda = v.zip(matVec(m, v)).map { case (a, b) => a * b }.sum
      (lambda, v)
    }
    var work = cov.map(_.clone())
    for (c <- 0 until 3) {
      val (lambda, v) = powerIter(work)
      assert(math.abs(lambda - model.eigenvalues(c)) < 1e-6,
        s"eigenvalue $c: power=$lambda jacobi=${model.eigenvalues(c)}")
      val dot = math.abs(
        v.zip(model.components(c)).map { case (a, b) => a * b }.sum)
      assert(math.abs(dot - 1.0) < 1e-4,
        s"component $c direction mismatch |dot|=$dot")
      // deflate
      for (i <- 0 until dim; j <- 0 until dim)
        work(i)(j) -= lambda * v(i) * v(j)
    }
  }

  test("pca recovers a planted low-rank structure") {
    // rows live on a 2-d plane inside 6-d space (plus tiny hash noise)
    val dim = 6
    val b1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2.0))
    val b2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0).map(_ / math.sqrt(2.0))
    val rows = (0L until 300L).map { id =>
      val a = (id * 37 % 101).toDouble / 10.0 - 5.0
      val b = (id * 53 % 89).toDouble / 10.0 - 4.0
      id -> Array.tabulate(dim)(j => a * b1(j) + b * b2(j) +
        ((id * 7 + j) % 13).toDouble * 1e-4)
    }
    val model = Projection.pcaFit(vecDf(rows), "embedding", dim, k = 4)
    val ev = model.eigenvalues
    assert(ev(1) > 100 * ev(2),
      s"rank-2 structure not recovered: ${ev.toSeq}")
    // the top-2 subspace spans b1,b2: projecting the basis onto the
    // components loses nothing
    for (basis <- Seq(b1, b2)) {
      val c0 = basis.zip(model.components(0)).map { case (a, b) => a * b }.sum
      val c1 = basis.zip(model.components(1)).map { case (a, b) => a * b }.sum
      assert(math.abs(c0 * c0 + c1 * c1 - 1.0) < 1e-3,
        "planted basis vector escapes the top-2 eigenspace")
    }
  }

  test("pca model round-trips through parquet and projects identically") {
    val dim = 8
    val rows = (0L until 50L).map(id => id -> fakeVec(id, dim))
    val df = vecDf(rows)
    val model = Projection.pcaFit(df, "embedding", dim, k = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca-model")
    try {
      val path = tmp.resolve("m").toString
      Projection.savePcaModel(spark, model, path)
      val loaded = Projection.loadPcaModel(spark, path)
      assert(loaded.mean.toSeq == model.mean.toSeq)
      assert(loaded.eigenvalues.toSeq == model.eigenvalues.toSeq)
      assert(loaded.components.map(_.toSeq).toSeq ==
        model.components.map(_.toSeq).toSeq)
      val a = Projection.pcaProject(df, "embedding", model)
        .select("id", "pc").collect().map(_.toString).sorted
      val b = Projection.pcaProject(df, "embedding", loaded)
        .select("id", "pc").collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally graft.core.Fs.deleteRecursively(tmp)
  }

  test("moment shards merge into exactly the whole-corpus table") {
    val dim = 8
    val rows = (0L until 120L).map(id => id -> fakeVec(id, dim))
    val df = vecDf(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("i"), r.getAs[Int]("j"))
    def vals(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("si"),
        r.getAs[java.math.BigDecimal]("sj"), r.getAs[java.math.BigDecimal]("sij"))
    val whole = Projection.momentsUpper(df, "embedding", dim)
      .collect().map(r => key(r) -> vals(r)).toMap
    val a = Projection.momentsUpper(df.filter(col("id") % 3 === 0),
      "embedding", dim)
    val b = Projection.momentsUpper(df.filter(col("id") % 3 =!= 0),
      "embedding", dim)
    val merged = Projection.mergeMoments(a, b)
      .collect().map(r => key(r) -> vals(r)).toMap
    assert(merged == whole, "decimal moment merge must be EXACT")
  }

  test("whitened projection has unit variance per component") {
    val dim = 8
    val rows = (0L until 400L).map(id => id -> fakeVec(id, dim))
    val df = vecDf(rows)
    val model = Projection.pcaFit(df, "embedding", dim, k = 3)
    val proj = Projection.pcaProject(df, "embedding", model, whiten = true)
      .select(posexplode(col("pc")).as(Seq("c", "x")))
    val vars = proj.groupBy("c")
      .agg((sum(col("x") * col("x")) / count(lit(1)) -
        pow(sum(col("x")) / count(lit(1)), 2)).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (c <- 0 until 3)
      assert(math.abs(vars(c) - 1.0) < 1e-2,
        s"component $c variance ${vars(c)} after whitening")
    // degenerate eigenvalue guard: whitening past the rank fails loudly
    val flat = vecDf((0L until 20L).map(id =>
      id -> Array.fill(4)(1.0))) // zero variance everywhere
    val m2 = Projection.pcaFit(flat, "embedding", 4, k = 2)
    val e = intercept[IllegalArgumentException] {
      Projection.pcaProject(flat, "embedding", m2, whiten = true)
    }
    assert(e.getMessage.contains("positive eigenvalues"))
  }

  test("projection is partitioning-invariant") {
    val dim = 16
    val rows = (0L until 100L).map(id => id -> fakeVec(id, dim))
    val df = vecDf(rows)
    def run(d: org.apache.spark.sql.DataFrame) =
      Projection.signProject(d, "embedding", dim, 4)
        .select("id", "proj").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(df) == run(df.repartition(7)))
  }
}
