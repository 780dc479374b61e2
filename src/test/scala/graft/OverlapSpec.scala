package graft

import graft.ops.CorpusOverlap

/** Corpus-content overlap: exact one-aggregation report + KMV sketches. */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  test("exact overlap: hand-counted bigram sets") {
    // A: {"a b", "b c"}; B: {"b c", "c d"} → inter 1, union 3
    val a = Seq("a b c").toDF("text")
    val b = Seq("b c d").toDF("text")
    val r = CorpusOverlap.exact(a, "text", b, "text", n = 2).head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("n_intersect") == 1 && r.getAs[Long]("n_union") == 3)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("containment_a") - 0.5) < 1e-12)

    // disjoint corpora → all zeros, no NULL/ANSI surprises
    val z = CorpusOverlap.exact(a, "text", Seq("x y z").toDF("text"), "text", 2).head()
    assert(z.getAs[Long]("n_intersect") == 0 && z.getAs[Double]("jaccard") == 0.0)

    // identical corpora → jaccard and both containments exactly 1
    val i = CorpusOverlap.exact(a, "text", a, "text", 2).head()
    assert(i.getAs[Double]("jaccard") == 1.0 &&
      i.getAs[Double]("containment_a") == 1.0 &&
      i.getAs[Double]("containment_b") == 1.0)
  }

  test("KMV: unsaturated sketch is exact; identical corpora estimate J=1") {
    val a = Seq("one two three four five", "six seven eight").toDF("text")
    val k = 64
    val sk = CorpusOverlap.kmvSketch(a, "text", n = 2, k = k)
    // 6 distinct bigrams < k → sketch holds them all, estimate is exact
    assert(sk.length == 6)
    assert(CorpusOverlap.estimateDistinct(sk, k) == 6.0)
    val (j, da, db) = CorpusOverlap.estimate(sk, sk, k)
    assert(j == 1.0 && da == 6.0 && db == 6.0)
  }

  test("KMV estimates track exact overlap on the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val k = 512
    val skA = CorpusOverlap.kmvSketch(a, "text", n = 2, k = k)
    val skB = CorpusOverlap.kmvSketch(b, "text", n = 2, k = k)
    val (jEst, daEst, dbEst) = CorpusOverlap.estimate(skA, skB, k)
    val ex = CorpusOverlap.exact(a, "text", b, "text", n = 2).head()
    assert(math.abs(jEst - ex.getAs[Double]("jaccard")) <= 0.1)
    assert(math.abs(daEst - ex.getAs[Long]("n_a")) <= 0.2 * ex.getAs[Long]("n_a"))
    assert(math.abs(dbEst - ex.getAs[Long]("n_b")) <= 0.2 * ex.getAs[Long]("n_b"))
    // merge is commutative and bounded by k
    val m = CorpusOverlap.mergeSketches(skA, skB, k)
    assert(m.length <= k)
    assert(m.sameElements(CorpusOverlap.mergeSketches(skB, skA, k)))
    // merging a sketch with itself is the identity
    assert(CorpusOverlap.mergeSketches(skA, skA, k).sameElements(skA))
  }
}
