package graft

import org.apache.spark.sql.functions._

import graft.stats.LabelNoise

class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  // hand-designed panel (k = 3):
  //   t_0 = mean p_0 over given-0 = 0.9; t_1 = mean(0.8, 0.04) = 0.42;
  //   t_2 = mean(0.8, 0.4) = 0.6
  private lazy val panel = Seq(
    (1L, 0, Array(0.90, 0.05, 0.05)), // confident 0
    (2L, 0, Array(0.90, 0.05, 0.05)), // confident 0
    (3L, 1, Array(0.10, 0.80, 0.10)), // confident 1
    (4L, 1, Array(0.95, 0.04, 0.01)), // MISLABELED: model says 0
    (5L, 2, Array(0.10, 0.10, 0.80)), // confident 2
    (6L, 2, Array(0.30, 0.30, 0.40))) // clears no threshold: abstains
    .toDF("id", "y", "p")

  test("confident joint: hand-computed thresholds, suggestions, abstention") {
    val sugg = LabelNoise.confidentSuggestions(panel, "id", $"y", $"p", 3)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(sugg.size == 5 && !sugg.contains(6L),
      "the below-threshold example must abstain")
    assert(sugg(4L).getAs[Int]("suggested") == 0 &&
      sugg(4L).getAs[Double]("p_suggested") == 0.95 &&
      sugg(4L).getAs[Double]("p_given") == 0.04)
    Seq(1L, 2L, 3L, 5L).foreach(i =>
      assert(sugg(i).getAs[Int]("suggested") == sugg(i).getAs[Int]("given")))

    val joint = LabelNoise.confidentJoint(panel, "id", $"y", $"p", 3)
      .collect()
      .map(r => (r.getAs[Int]("given"), r.getAs[Int]("suggested")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share")))).toMap
    assert(joint((0, 0)) == ((2L, 0.4)))
    assert(joint((1, 1)) == ((1L, 0.2)))
    assert(joint((1, 0)) == ((1L, 0.2)))
    assert(joint((2, 2)) == ((1L, 0.2)))
    assert(joint.size == 4)

    val issues = LabelNoise.labelIssues(panel, "id", $"y", $"p", 3).collect()
    assert(issues.length == 1 && issues.head.getAs[Long]("id") == 4L)
  }

  test("bad labels and wrong-length probs fail loudly") {
    val badLabel = Seq((1L, 7, Array(0.5, 0.5))).toDF("id", "y", "p")
    assert(intercept[Exception] {
      LabelNoise.confidentSuggestions(badLabel, "id", $"y", $"p", 2).collect()
    }.toString.contains("label outside"))
    val badProbs = Seq((1L, 0, Array(0.5, 0.3, 0.2))).toDF("id", "y", "p")
    assert(intercept[Exception] {
      LabelNoise.confidentSuggestions(badProbs, "id", $"y", $"p", 2).collect()
    }.toString.contains("probs length"))
  }

  test("argmax tie-break picks the smallest class index") {
    // both classes tie at p = 0.5 and clear their thresholds (t = 0.5)
    val tied = Seq((1L, 0, Array(0.5, 0.5)), (2L, 1, Array(0.5, 0.5)))
      .toDF("id", "y", "p")
    val sugg = LabelNoise.confidentSuggestions(tied, "id", $"y", $"p", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("suggested"))
      .toMap
    assert(sugg(1L) == 0 && sugg(2L) == 0)
  }
}
