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

  test("native TokenBow == compositional bucketCounts, bit-identical") {
    // adversarial edge set: blank, spaces-only, interior runs, leading /
    // trailing spaces (trimmed), a leading TAB that trim (0x20-only)
    // keeps so Java's \s+ split yields a leading EMPTY token, Unicode
    // NBSP (NOT a \s separator), multi-byte tokens
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "", "   ", "  padded  both  ends  ",
      " \tfoo bar", "\ttab lead", "a b", "naïve café 🚀 日本語",
      "x\ty\nz\rwv\fu", "a  b\t\tc \t d")
    val df = texts.toDF("text")
    for (dim <- Seq(2, 8, 24)) {
      val both = df.select(
          Features.bucketCounts(Features.tokenBuckets(col("text"), dim), dim)
            .as("spec"),
          graft.functions.TokenBow(spark, col("text"), dim).as("native"))
        .as[(Seq[Int], Seq[Int])].collect()
      both.zip(texts).foreach { case ((spec, native), t) =>
        assert(spec == native, s"dim=$dim text='$t': $spec vs $native")
      }
    }
    // corpus-wide over the real fixture
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dim = 16
    val drift = docs.select(
        Features.bucketCounts(Features.tokenBuckets(col("text"), dim), dim)
          .as("spec"),
        graft.functions.TokenBow(spark, col("text"), dim).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(drift == 0, s"$drift fixture docs drifted")
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
