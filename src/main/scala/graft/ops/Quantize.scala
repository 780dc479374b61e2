package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the standard 4×
  * storage/IO compression for vector corpora (per-dimension affine
  * min/max quantization, the public recipe behind FAISS's
  * ScalarQuantizer and the int8 paths in every vector database): at
  * 100 TB the embedding column dominates scan bytes, and a narrow-map
  * re-encode that preserves top-k recall pays for itself on the first
  * full-corpus pass.
  *
  * code(i) = clamp(round((x(i) − lo(i)) / step(i)), 0, 2^bits − 1),
  * step(i) = (hi(i) − lo(i)) / (2^bits − 1); a flat dimension
  * (hi == lo) encodes 0 and decodes back to lo exactly.
  *
  * Engine-portability of every number: lo/hi are exact data doubles
  * (min/max never rounds), step and (x − lo)/step are single IEEE 754
  * operations both engines execute bit-identically, and the only
  * rounding is round-half-up on a NON-NEGATIVE quotient, where Spark's
  * decimal-string HALF_UP and a binary half-away round agree (a tie is
  * a double exactly equal to n + 0.5; every other double sits strictly
  * on one side of it in both representations, because the shortest
  * round-trip string preserves ordering against the representable 0.5).
  *
  * Scale shape: [[ranges]] is ONE explode + hash aggregation
  * (map-side combined, shuffle = partitions × d); [[encode]] /
  * [[decode]] are narrow per-row maps with the d-row range table
  * inlined as literals (no shuffle, stream-safe); nothing driver-side
  * exceeds the d-row range table — the [[KMeans]] centroid-table
  * discipline.
  */
object Quantize {

  /** Per-dimension quantization range: (i, lo, hi) for each of the
    * `dim` components over non-null vectors of the declared dimension.
    * Exact data values — min/max of doubles needs no rounding to be
    * engine-stable. */
  def ranges(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol).cast("array<double>")
    df.filter(v.isNotNull && size(v) === dim)
      .select(posexplode(v).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
  }

  /** The collected range table as (lo, hi) arrays indexed by dimension —
    * d rows of driver traffic, the model artifact [[encode]]/[[decode]]
    * inline. */
  def collectRanges(r: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val rows = r.collect()
    require(rows.length == dim,
      s"range table has ${rows.length} dims, expected $dim — " +
        "mixed-dimension corpus?")
    val lo = Array.ofDim[Double](dim); val hi = Array.ofDim[Double](dim)
    rows.foreach { row =>
      val i = row.getAs[Int]("i")
      lo(i) = row.getAs[Double]("lo"); hi(i) = row.getAs[Double]("hi")
    }
    (lo, hi)
  }

  private def levels(bits: Int): Double = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    ((1 << bits) - 1).toDouble
  }

  /** Quantize `vecCol` to an array<int> of codes in `outCol` — one
    * narrow codegen'd map (d element_at + arithmetic components, the
    * [[Projection.signProject]] build), null vectors stay null. */
  def encode(df: DataFrame, vecCol: String, lo: Array[Double],
      hi: Array[Double], bits: Int = 8, outCol: String = "code"): DataFrame = {
    val lv = levels(bits)
    val v = col(vecCol).cast("array<double>")
    val comps = lo.indices.map { i =>
      if (hi(i) == lo(i)) lit(0)
      else {
        val step = (hi(i) - lo(i)) / lv
        least(greatest(round((v.getItem(i) - lit(lo(i))) / lit(step)),
          lit(0.0)), lit(lv)).cast("int")
      }
    }
    df.withColumn(outCol, when(v.isNotNull, array(comps: _*)))
  }

  /** Dequantize codes back to doubles: x̂(i) = lo(i) + code(i)·step(i).
    * Same narrow-map shape as [[encode]]. */
  def decode(df: DataFrame, codeCol: String, lo: Array[Double],
      hi: Array[Double], bits: Int = 8, outCol: String = "dec"): DataFrame = {
    val lv = levels(bits)
    val c = col(codeCol)
    val comps = lo.indices.map { i =>
      if (hi(i) == lo(i)) lit(lo(i))
      else lit(lo(i)) + c.getItem(i).cast("double") * lit((hi(i) - lo(i)) / lv)
    }
    df.withColumn(outCol, when(c.isNotNull, array(comps: _*)))
  }

  /** Per-dimension reconstruction error of the quantizer on `df`:
    * (i, n, mse, max_abs_err) with the squared errors rounded to 12 and
    * decimal-folded (summation-order-invariant, so both a distributed
    * run and the oracle land on identical doubles), mse rounded to 12.
    * The contract max_abs_err ≤ step/2 (up to one ulp of the quotient)
    * is what specs pin. */
  def reconstructionError(df: DataFrame, vecCol: String, lo: Array[Double],
      hi: Array[Double], bits: Int = 8): DataFrame = {
    val dim = lo.length
    val v = col(vecCol).cast("array<double>")
    val enc = encode(df.filter(v.isNotNull && size(v) === dim)
      .select(v.as("__v")), "__v", lo, hi, bits, "__c")
    val dec = decode(enc, "__c", lo, hi, bits, "__d")
    dec
      .select(posexplode(arrays_zip(col("__v"), col("__d"))).as(Seq("i", "p")))
      .select(col("i"), (col("p.__v") - col("p.__d")).as("e"))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("e") * col("e"), 12).cast("decimal(38,12)"))
          .cast("double") / count(lit(1)), 12).as("mse"),
        max(abs(col("e"))).as("max_abs_err"))
  }
}
