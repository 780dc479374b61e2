package graft

import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class CusumSpec extends SparkSpec {
  import spark.implicits._

  test("closed window form equals the sequential CUSUM recurrence") {
    // one series: baseline 10-ish, then a +8 shift from t=8
    val xs = Seq(10.0, 11.0, 9.0, 10.0, 10.0, 12.0, 9.0, 10.0,
      18.0, 18.0, 19.0, 18.0)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t, x) }
      .toDF("key", "t", "x")
    val out = EventAnalytics.cusum(df, Seq("key"), "t", $"x", $"t" < 8,
      kSigma = 0.5, hSigma = 4.0)
      .orderBy("t").collect()
    // driver reference: the textbook recurrence on the same mu/sigma
    val base = xs.take(8)
    val mu = base.sum / 8
    val sigma = math.sqrt(base.map(v => (v - mu) * (v - mu)).sum / 7)
    var sp = 0.0; var sn = 0.0
    val ref = xs.map { x =>
      sp = math.max(0.0, sp + x - mu - 0.5 * sigma)
      sn = math.max(0.0, sn + mu - 0.5 * sigma - x)
      (sp, sn)
    }
    out.zip(ref).foreach { case (row, (rp, rn)) =>
      assert(math.abs(row.getAs[Double]("s_pos") - rp) < 1e-6,
        s"t=${row.getAs[Int]("t")}: ${row.getAs[Double]("s_pos")} vs $rp")
      assert(math.abs(row.getAs[Double]("s_neg") - rn) < 1e-6)
    }
    // the shift is flagged, and only after it starts
    val flagged = out.filter(_.getAs[Boolean]("flag")).map(_.getAs[Int]("t"))
    assert(flagged.nonEmpty && flagged.min >= 8,
      s"flags: ${flagged.mkString(",")}")
    assert(out.take(8).forall(!_.getAs[Boolean]("flag")))
  }

  test("downward shifts flag through the negative leg") {
    val xs = Seq(10.0, 10.5, 9.5, 10.0, 2.0, 2.0, 1.5, 2.0)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t, x) }
      .toDF("key", "t", "x")
    val out = EventAnalytics.cusum(df, Seq("key"), "t", $"x", $"t" < 4,
      hSigma = 4.0).orderBy("t").collect()
    assert(out.exists(r => r.getAs[Boolean]("flag") &&
      r.getAs[Double]("s_neg") > r.getAs[Double]("s_pos")))
  }

  test("zero-variance baseline yields null S; thin baseline fails loudly") {
    val flat = (0 until 6).map(t => ("k", t, 5.0)).toDF("key", "t", "x")
    val out = EventAnalytics.cusum(flat, Seq("key"), "t", $"x", $"t" < 4)
      .orderBy("t").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("s_pos"))))
    val thin = Seq(("k", 0, 1.0), ("k", 1, 2.0)).toDF("key", "t", "x")
    assert(intercept[Exception] {
      EventAnalytics.cusum(thin, Seq("key"), "t", $"x", $"t" < 1).collect()
    }.toString.contains("fewer than 2 baseline rows"))
  }
}
