package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Heaps-law vocabulary growth: curve invariants, partitioning
  * independence of the prefix scan, and degenerate corpora. */
class HeapsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, s"w${i % 7} w${i % 13} w${i % 29} shared token")
  }.toDF("doc_id", "text")

  test("curve invariants: monotone, bounded by N, exact totals") {
    val docs = corpus(60)
    val rows = TextOps.heapsCurve(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_prefix"))
    val vs = rows.map(_.getAs[Long]("vocab"))
    assert(ns.sameElements(ns.sorted) && vs.sameElements(vs.sorted))
    assert(ns.zip(vs).forall { case (n, v) => v <= n })
    // the last grid point is the whole corpus: total tokens and full vocab
    val totalTokens = docs
      .agg(sum(size(split(trim(col("text")), "\\s+")))).head().getLong(0)
    val fullVocab = docs
      .select(explode(split(trim(col("text")), "\\s+")))
      .distinct().count()
    assert(ns.last == totalTokens)
    assert(vs.last == fullVocab)
  }

  test("prefix scan is partitioning-independent") {
    val docs = corpus(40)
    val a = TextOps.heapsCurve(docs, "doc_id", "text").collect().toSeq
    val b = TextOps.heapsCurve(docs.repartition(13), "doc_id", "text")
      .collect().toSeq
    assert(a == b)
  }

  test("fit lands beta in (0,1) on growing text, degenerates gracefully") {
    val fit = TextOps.heapsFit(corpus(80), "doc_id", "text").head()
    val beta = fit.getAs[Double]("beta")
    assert(beta > 0 && beta < 1, s"beta=$beta")
    assert(fit.getAs[Double]("r2") > 0.5)
    // constant vocabulary: y never moves → slope 0, r2 nulled by the floor
    val flat = (0 until 30).map(i => (i.toLong, "same same same"))
      .toDF("doc_id", "text")
    val f2 = TextOps.heapsFit(flat, "doc_id", "text").head()
    assert(f2.getAs[Double]("beta") == 0.0)
    assert(f2.isNullAt(f2.fieldIndex("r2")))
    // empty corpus: zero grid points, null fit
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val f3 = TextOps.heapsFit(empty, "doc_id", "text").head()
    assert(f3.getAs[Long]("n_points") == 0L)
    assert(f3.isNullAt(f3.fieldIndex("beta")))
  }
}
