package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orthogonal Procrustes alignment between two embedding spaces
  * (Schönemann 1966 — public): given paired vectors (x, y) — the same
  * corpus embedded by an OLD and a NEW model — find the rotation R
  * minimizing ‖XR − Y‖_F, namely R = UVᵀ from the SVD of M = XᵀY. The
  * model-migration tool: align the re-embedded corpus back onto the
  * space an existing ANN index / centroid table / classifier was built
  * in, instead of rebuilding everything on day one.
  *
  * Scale shape: the ONLY distributed work is the d_a × d_b cross-moment
  * grid — one pair-exploded, map-side-combined aggregation whose
  * shuffle is partitions × d² cells regardless of N (the
  * [[Projection]] covariance recipe, asymmetric), with products
  * rounded to 12 and folded in decimal(38,12) so the DuckDB oracle
  * rebuilds every cell. The SVD runs on the driver over the d × d
  * table (via the one-sided route: eigen of MᵀM gives V and Σ², then
  * U = MVΣ⁻¹ — reusing the deterministic cyclic Jacobi); applying R is
  * a narrow map with the rotation columns inlined as literals. */
object Procrustes {

  /** The full d_a × d_b cross-moment grid M = Σ rows x_i·y_j:
    * (i, j, n, m) with m the exact decimal fold of round(xᵢ·yⱼ, 12),
    * cast to double. Rows where either vector is null are excluded;
    * mixed dimensions surface as differing per-cell counts (checked in
    * [[fit]]). */
  def crossMoments(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.select(col(aCol).cast("array<double>").as("__a"),
        col(bCol).cast("array<double>").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .select(posexplode(col("__a")).as(Seq("i", "xi")), col("__b"))
      .select(col("i"), col("xi"),
        posexplode(col("__b")).as(Seq("j", "yj")))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(round(col("xi") * col("yj"), 12).cast("decimal(38,12)"))
          .cast("double").as("m"))

  /** Fitted alignment: the d_a × d_b rotation (orthonormal columns) and
    * the singular values of the cross-moment matrix. */
  final case class Model(rotation: Array[Array[Double]],
      singularValues: Array[Double])

  /** Fit R = UVᵀ. Fails loudly on mixed dimensions or a rank-deficient
    * cross-moment matrix (σ_min below 1e-9·σ_max — the paired spaces
    * don't determine a rotation; typically a constant or duplicated
    * coordinate). */
  def fit(df: DataFrame, aCol: String, bCol: String): Model = {
    val cells = crossMoments(df, aCol, bCol).collect()
    require(cells.nonEmpty, "no paired vectors to align")
    val ns = cells.map(_.getAs[Long]("n")).distinct
    require(ns.length == 1,
      s"mixed vector dimensions: cell counts ${ns.sorted.mkString(",")}")
    val da = cells.iterator.map(_.getAs[Int]("i")).max + 1
    val db = cells.iterator.map(_.getAs[Int]("j")).max + 1
    val m = Array.ofDim[Double](da, db)
    cells.foreach { r =>
      m(r.getAs[Int]("i"))(r.getAs[Int]("j")) = r.getAs[Double]("m")
    }
    // one-sided SVD: MtM = V diag(sigma^2) Vt, U = M V / sigma
    val mtm = Array.tabulate(db, db) { (p, q) =>
      var s = 0.0; var i = 0
      while (i < da) { s += m(i)(p) * m(i)(q); i += 1 }
      s
    }
    val (eig, vecs) = Projection.jacobiEigen(mtm)
    val order = eig.zipWithIndex.sortBy { case (e, i) => (-e, i) }
      .map(_._2)
    val sigma = order.map(i => math.sqrt(math.max(eig(i), 0.0)))
    require(sigma.head > 0 && sigma.last > 1e-9 * sigma.head,
      s"cross-moment matrix is rank-deficient (sigma=${sigma.mkString(",")})" +
        " — the paired spaces do not determine a rotation")
    val v = Array.tabulate(db, db)((r, c) => vecs(r)(order(c)))
    val u = Array.tabulate(da, db) { (r, c) =>
      var s = 0.0; var i = 0
      while (i < db) { s += m(r)(i) * v(i)(c); i += 1 }
      s / sigma(c)
    }
    // R = U Vt
    val rot = Array.tabulate(da, db) { (r, c) =>
      var s = 0.0; var k = 0
      while (k < db) { s += u(r)(k) * v(c)(k); k += 1 }
      s
    }
    Model(rot, sigma)
  }

  /** Apply the rotation: adds `aligned` = x·R, one narrow codegen'd map
    * with R's columns inlined as literals over the native sequential-
    * fold dot. Null vectors align to null. */
  def align(df: DataFrame, aCol: String, model: Model,
      outCol: String = "aligned"): DataFrame = {
    val v = col(aCol).cast("array<double>")
    val cols = model.rotation.head.indices.map { c =>
      val colLit = array(model.rotation.map(row => lit(row(c)))
        .toIndexedSeq: _*)
      Similarity.dot(v, colLit)
    }
    df.withColumn(outCol,
      when(v.isNotNull, array(cols.toIndexedSeq: _*)))
  }
}
