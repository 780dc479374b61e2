package graft

import graft.ops.Collocations

/** Collocation statistics: hand-computed PMI/t/LLR on a tiny corpus, the
  * planted-collocation ranking property, and degenerate guards. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed association statistics on a tiny corpus") {
    // bigram multiset: "x y" ×3, "y x" ×2, "y z" ×1 → N = 6
    // left marginals: x begins 3 ("x y"), y begins 3 ("y x"×2, "y z")
    // right marginals: y ends 3, x ends 2, z ends 1
    val corpus = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "y x"),
      (5L, "y x"), (6L, "y z")).toDF("doc_id", "text")
    val out = Collocations.collocations(corpus, "text", minCount = 1)
      .collect().map(r => r.getAs[String]("bigram") -> r).toMap
    val xy = out("x y")
    assert(xy.getAs[Long]("cb") == 3L)
    assert(xy.getAs[Long]("c1") == 3L)
    assert(xy.getAs[Long]("c2") == 3L)
    // pmi = ln(cb*N/(c1*c2)) = ln(3*6/9) = ln 2
    assert(math.abs(xy.getAs[Double]("pmi") - math.log(2.0)) < 1e-6)
    // t = (cb - c1*c2/N)/sqrt(cb) = (3 - 1.5)/sqrt(3)
    assert(math.abs(xy.getAs[Double]("tscore") - 1.5 / math.sqrt(3.0)) < 1e-6)
    // llr by direct contingency arithmetic
    val (cb, c1, c2, n) = (3.0, 3.0, 3.0, 6.0)
    def ll(o: Double, e: Double) = if (o > 0) o * math.log(o / e) else 0.0
    val llr = 2.0 * (ll(cb, c1 * c2 / n) + ll(c1 - cb, c1 * (n - c2) / n) +
      ll(c2 - cb, (n - c1) * c2 / n) +
      ll(n - c1 - c2 + cb, (n - c1) * (n - c2) / n))
    assert(math.abs(xy.getAs[Double]("llr") - llr) < 1e-6)
    assert(out.values.forall(_.getAs[Double]("llr") >= 0.0))
  }

  test("a planted collocation outranks independent fillers") {
    // "new york" always adjacent; filler words combine freely
    val fill = Seq("alpha", "beta", "gamma", "delta")
    val docs = (0 until 40).map { i =>
      val f1 = fill(i % 4); val f2 = fill((i + 1) % 4)
      (i.toLong, s"$f1 new york $f2 $f1 $f2")
    }.toDF("doc_id", "text")
    val top = Collocations.topCollocations(docs, "text", k = 3, minCount = 2)
      .collect()
    assert(top.head.getAs[String]("bigram") == "new york",
      s"top = ${top.map(_.getAs[String]("bigram")).mkString(", ")}")
  }

  test("minCount floors and empty corpora") {
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val floored = Collocations.collocations(corpus, "text", minCount = 2)
      .collect()
    assert(floored.map(_.getAs[String]("bigram")).toSet == Set("a b"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Collocations.collocations(empty, "text", minCount = 1).count() == 0)
    intercept[IllegalArgumentException] {
      Collocations.collocations(corpus, "text", minCount = 0)
    }
  }
}
