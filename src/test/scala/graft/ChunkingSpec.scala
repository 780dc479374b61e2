package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def splitOne(text: String): Seq[String] =
    Seq(text).toDF("t").select(TextOps.sentences(col("t")))
      .as[Seq[String]].head()

  private def packOne(text: String, max: Int): Seq[(String, Int, Int, Int)] =
    Seq(text).toDF("t")
      .select(TextOps.packSentences(col("t"), max))
      .as[Seq[(String, Int, Int, Int)]].head()

  test("sentence split: terminator runs attach, fragments survive, empties drop") {
    assert(splitOne("One two. Three four! Five?") ==
      Seq("One two.", "Three four!", "Five?"))
    assert(splitOne("Really?! Yes... sure") ==
      Seq("Really?!", "Yes...", "sure"))
    assert(splitOne("no terminator at all") == Seq("no terminator at all"))
    assert(splitOne("") == Seq())
    assert(splitOne("   ") == Seq())
    assert(splitOne("...") == Seq("..."))
  }

  test("terminators inside tokens are not boundaries (decimals, URLs, versions)") {
    assert(splitOne("pi is 3.14 ok") == Seq("pi is 3.14 ok"))
    assert(splitOne("ship v1.2.3 today. see http://x.y/z?q=1 now") ==
      Seq("ship v1.2.3 today.", "see http://x.y/z?q=1 now"))
    // conservation through such text: chunk words == document words
    val text = "val is 3.14 and 2.72. more at a.b/c?d=1 end"
    val words = Seq(text).toDF("t")
      .select(TextOps.tokens(col("t"))).as[Seq[String]].head()
    val chunkWords = packOne(text, 4).flatMap(_._1.split("\\s+").toSeq)
    assert(chunkWords == words)
  }

  test("greedy packing matches the hand-computed chunks") {
    // sentence token costs: 2, 3, 2, 1 under a budget of 5
    val got = packOne("a b. c d e. f g. h.", 5)
    assert(got == Seq(
      ("a b. c d e.", 5, 2, 2), // 2+3 fits exactly; +2 would overflow
      ("f g. h.", 3, 2, 2)))
  }

  test("a single over-budget sentence becomes its own over-budget chunk") {
    val got = packOne("one two three four five six. tiny.", 3)
    assert(got == Seq(
      ("one two three four five six.", 6, 1, 6),
      ("tiny.", 1, 1, 1)))
  }

  test("word sequence is conserved through messy whitespace") {
    val text = "Alpha  beta.\n\nGamma   delta! epsilon"
    val words = Seq(text).toDF("t")
      .select(TextOps.tokens(col("t"))).as[Seq[String]].head()
    val chunkWords = packOne(text, 3).flatMap { case (t, _, _, _) =>
      t.split("\\s+").toSeq }
    assert(chunkWords == words)
  }

  test("empty document packs to zero chunks") {
    assert(packOne("", 10) == Seq())
  }

  test("budget of 1 isolates every sentence") {
    val got = packOne("a. b. c.", 1)
    assert(got.map(_._1) == Seq("a.", "b.", "c."))
    assert(got.forall(c => c._2 == 1 && c._3 == 1 && c._4 == 1))
  }
}
