package graft

import org.apache.spark.sql.functions._

import graft.ops.LangId

/** Scratch tuning harness (deleted before commit). */
class LangIdTuneSpec extends SparkSpec {
  import spark.implicits._

  test("tune") {
    val corpus = LangId.syntheticCorpus(spark).cache()
    corpus.count()
    for (dim <- Seq(12, 16, 24); tol <- Seq(1e-5)) {
      val t0 = System.nanoTime()
      val model = LangId.train(corpus.filter(!$"is_test"), "text", "lang",
        dim = dim, tol = tol)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val test = LangId.predict(corpus.filter($"is_test"), "text", model)
      val acc = test.agg(
        avg(($"lang_pred" === $"lang").cast("double"))).head().getDouble(0)
      val iters = model.fits.map(_._2.iterations).mkString(",")
      println(f"TUNE dim=$dim tol=$tol train=$tTrain%.1fs acc=$acc%.4f iters=$iters")
    }
  }
}
