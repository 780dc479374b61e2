package graft

import org.apache.spark.sql.functions._

import graft.ops.Features

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("bucket counts conserve the token count and stay in range") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",
      "",
      "   ",
      "a b c d e f g h i j k l m n o p").toDF("text")
    val dim = 8
    val got = df.select(
        graft.ops.TextOps.tokenCount(col("text")).as("n"),
        Features.bucketCounts(Features.tokenBuckets(col("text"), dim), dim)
          .as("bow"))
      .as[(Int, Seq[Int])].collect()
    got.foreach { case (n, bow) =>
      assert(bow.length == dim)
      assert(bow.sum == n, s"counts ${bow.sum} != tokens $n")
      assert(bow.forall(_ >= 0))
    }
  }

  test("same token always lands in the same bucket, across rows and dims") {
    val df = Seq("alpha beta alpha", "beta alpha").toDF("text")
    val rows = df.select(Features.tokenBuckets(col("text"), 16).as("b"))
      .as[Seq[Int]].collect()
    val Seq(r1, r2) = rows.toSeq
    assert(r1 == Seq(r1(0), r1(1), r1(0)), "repeat token changed bucket")
    assert(r2 == Seq(r1(1), r1(0)), "bucket not a pure function of the token")
  }

  test("hashed BoW + logistic separates disjoint vocabularies end to end") {
    val vocabA = Seq("aardvark", "burrow", "termite", "snout", "nocturnal")
    val vocabB = Seq("glacier", "crevasse", "moraine", "icefall", "serac")
    val rows = (0 until 120).map { i =>
      val v = if (i % 2 == 0) vocabA else vocabB
      val text = (0 until 12).map(j => v((i * 7 + j * 3) % v.size)).mkString(" ")
      (i.toLong, text, (i % 2 == 0))
    }
    val df = rows.toDF("id", "text", "is_a")
    val (feat, feats) = Features.hashedBow(df, "text", dim = 16)
    val fit = graft.stats.Logistic.fit(feat, feats,
        col("is_a").cast("double"), lambda = 1e-3)
      .getOrElse(fail("no model"))
    val accuracy = feat
      .withColumn("ok",
        ((fit.score(feats.map(_._2)) >= 0.5) === col("is_a")).cast("double"))
      .agg(avg("ok")).head().getDouble(0)
    assert(accuracy == 1.0, s"disjoint vocabularies must separate: $accuracy")
  }
}
