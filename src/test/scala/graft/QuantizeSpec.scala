package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def fakeVec(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      val h = (id * 2654435761L + j * 40503L) & 0xffffL
      h.toDouble / 0xffff.toDouble - 0.5
    }

  private def vecDf(rows: Seq[(Long, Array[Double])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")

  test("round-trip error is bounded by half a quantization step") {
    val dim = 8
    val df = vecDf((0L until 200L).map(id => id -> fakeVec(id, dim)))
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", dim), dim)
    val err = Quantize.reconstructionError(df, "v", lo, hi)
      .collect().map(r => r.getAs[Int]("i") ->
        (r.getAs[Double]("mse"), r.getAs[Double]("max_abs_err"))).toMap
    for (i <- 0 until dim) {
      val step = (hi(i) - lo(i)) / 255.0
      val (mse, maxe) = err(i)
      assert(maxe <= step / 2 + 1e-12, s"dim $i: max err $maxe > step/2 $step")
      assert(mse <= step * step / 4 + 1e-12, s"dim $i mse $mse")
    }
  }

  test("codes stay inside [0, 255] and extremes map to the endpoints") {
    val dim = 4
    val df = vecDf((0L until 100L).map(id => id -> fakeVec(id, dim)))
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", dim), dim)
    val codes = Quantize.encode(df, "v", lo, hi)
      .select(posexplode(col("code")).as(Seq("i", "c")))
    val mm = codes.agg(min("c"), max("c")).head()
    assert(mm.getInt(0) == 0 && mm.getInt(1) == 255,
      s"range [${mm.getInt(0)}, ${mm.getInt(1)}] — min/max rows must hit the endpoints")
  }

  test("flat dimensions encode 0 and decode to the constant exactly") {
    val df = Seq((1L, Seq(3.5, 1.0)), (2L, Seq(3.5, 2.0)), (3L, Seq(3.5, 3.0)))
      .toDF("id", "v")
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", 2), 2)
    assert(lo(0) == 3.5 && hi(0) == 3.5)
    val out = Quantize.decode(Quantize.encode(df, "v", lo, hi), "code",
      lo, hi).select(col("id"), col("code"), col("dec")).collect()
    out.foreach { r =>
      assert(r.getSeq[Int](1).head == 0, "flat dim must encode 0")
      assert(r.getSeq[Double](2).head == 3.5, "flat dim must decode exactly")
    }
  }

  test("null vectors pass through as null codes") {
    val df = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None)).toDF("id", "v")
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", 2), 2)
    val out = Quantize.encode(df, "v", lo, hi)
      .select("id", "code").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("encode is partitioning-invariant") {
    val dim = 8
    val df = vecDf((0L until 120L).map(id => id -> fakeVec(id, dim)))
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", dim), dim)
    def run(d: org.apache.spark.sql.DataFrame) =
      Quantize.encode(d, "v", lo, hi).select("id", "code").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(run(df) == run(df.repartition(7)))
  }

  test("encode plan is a narrow map — no shuffle") {
    val dim = 8
    val df = vecDf((0L until 50L).map(id => id -> fakeVec(id, dim)))
    val (lo, hi) = Quantize.collectRanges(Quantize.ranges(df, "v", dim), dim)
    val plan = Quantize.encode(df, "v", lo, hi)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
