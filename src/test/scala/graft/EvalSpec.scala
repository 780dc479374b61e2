package graft

import org.apache.spark.sql.functions._

import graft.stats.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force pairwise AUC reference: P(score_pos > score_neg) +
    * 0.5·P(tie) over all pos×neg pairs. */
  private def pairwiseAuc(rows: Seq[(Double, Int)]): Double = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val s = (for (p <- pos; n <- neg) yield {
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    }).sum
    s / (pos.size * neg.size)
  }

  test("auc matches the brute-force pairwise definition, ties included") {
    val rows = Seq(
      (0.1, 0), (0.2, 0), (0.2, 1), (0.3, 0), (0.3, 0), (0.3, 1),
      (0.5, 1), (0.5, 1), (0.7, 0), (0.9, 1))
    val got = Eval.auc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(got.getAs[Double]("auc") == pairwiseAuc(rows))
    assert(got.getAs[Long]("n_pos") == 5 && got.getAs[Long]("n_neg") == 5)
  }

  test("average precision: hand sklearn values, ties, edges") {
    // ranked desc: +, -, +, -  ->  AP = (1/2)(1/1) + (1/2)(2/3)
    val r = Eval.averagePrecision(
      Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("s", "y"),
      col("s"), col("y")).head()
    assert(r.getAs[Double]("average_precision") == 0.833333 &&
      r.getAs[Long]("n_thresholds") == 4L, s"$r")
    // tied scores collapse into one threshold: AP = precision there
    val t = Eval.averagePrecision(
      Seq((1.0, 1), (1.0, 0)).toDF("s", "y"), col("s"), col("y")).head()
    assert(t.getAs[Double]("average_precision") == 0.5 &&
      t.getAs[Long]("n_thresholds") == 1L)
    // perfect ranking: AP = 1; no positives: AP null
    val p = Eval.averagePrecision(
      Seq((0.9, 1), (0.8, 1), (0.1, 0)).toDF("s", "y"),
      col("s"), col("y")).head()
    assert(p.getAs[Double]("average_precision") == 1.0)
    val np = Eval.averagePrecision(
      Seq((0.9, 0), (0.8, 0)).toDF("s", "y"), col("s"), col("y")).head()
    assert(np.isNullAt(np.fieldIndex("average_precision")))
    intercept[Exception] {
      Eval.averagePrecision(
        Seq((0.1, 0), (0.2, 2)).toDF("s", "y"), col("s"), col("y"))
        .collect()
    }
  }

  test("vocab concentration and burstiness: hand counts") {
    import graft.ops.TextOps
    // "a a a b b c": counts 3/2/1 -> N=6 V=3 sum c^2 = 14
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val vc = TextOps.vocabConcentration(docs, "text").head()
    assert(vc.getAs[Long]("n_tokens") == 6L && vc.getAs[Long]("vocab") == 3L)
    assert(vc.getAs[Double]("yules_k") == 2222.222222 &&
      vc.getAs[Double]("simpson_d") == 0.266667, s"$vc")
    val cWant = BigDecimal(math.log(3.0) / math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(vc.getAs[Double]("herdan_c") == cWant)
    intercept[IllegalArgumentException] { // single type -> loud
      TextOps.vocabConcentration(Seq(Tuple1("x x x")).toDF("text"), "text")
    }
    // burstiness: x cf=4 df=2 -> 2.0; y and z tie at 1.0, token asc wins
    val b = TextOps.termBurstiness(
      Seq((1L, "x x x"), (2L, "x y"), (3L, "y z")).toDF("doc_id", "text"),
      "doc_id", "text", minDf = 1, topK = 2).collect()
    assert(b.length == 2 &&
      b(0).getAs[String]("token") == "x" && b(0).getAs[Long]("cf") == 4L &&
      b(0).getAs[Double]("burstiness") == 2.0 &&
      b(1).getAs[String]("token") == "y", b.mkString("; "))
  }

  test("auc is null with a single class and skips null rows") {
    val oneClass = Seq((0.1, 1), (0.9, 1)).toDF("s", "y")
    assert(Eval.auc(oneClass, col("s"), col("y")).collect().head.isNullAt(0))
    val withNulls = Seq(
      (Some(0.2), Some(0)), (Some(0.8), Some(1)),
      (None, Some(1)), (Some(0.5), None)).toDF("s", "y")
    val r = Eval.auc(withNulls, col("s"), col("y")).collect().head
    assert(r.getAs[Double]("auc") == 1.0)
    assert(r.getAs[Long]("n_pos") == 1 && r.getAs[Long]("n_neg") == 1)
  }

  test("auc rejects non-binary labels loudly") {
    val bad = Seq((0.1, 0), (0.2, 2)).toDF("s", "y")
    val e = intercept[Exception] {
      Eval.auc(bad, col("s"), col("y")).collect()
    }
    assert(e.getMessage.contains("labels outside"))
  }

  test("rocPoints confusion counts and undefined-rate nulls") {
    val rows = Seq((0.1, 0), (0.3, 1), (0.6, 0), (0.8, 1))
    val out = Eval.rocPoints(rows.toDF("s", "y"), col("s"), col("y"),
        Seq(0.0, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val at0 = out(0.0)
    assert(at0.getAs[Long]("tp") == 2 && at0.getAs[Long]("fp") == 2)
    assert(at0.getAs[Double]("precision") == 0.5 &&
      at0.getAs[Double]("recall") == 1.0)
    val at05 = out(0.5)
    assert(at05.getAs[Long]("tp") == 1 && at05.getAs[Long]("fp") == 1 &&
      at05.getAs[Long]("fn") == 1 && at05.getAs[Long]("tn") == 1)
    val at09 = out(0.9)
    assert(at09.getAs[Long]("tp") == 0 && at09.getAs[Long]("fp") == 0)
    assert(at09.isNullAt(at09.fieldIndex("precision")),
      "no predicted positives must give null precision")
    assert(at09.isNullAt(at09.fieldIndex("f1")))
    assert(at09.getAs[Double]("recall") == 0.0)
  }

  test("calibration bins: edges, exact fractions, loud out-of-range") {
    val rows = Seq((0.0, 0), (0.05, 1), (0.95, 1), (1.0, 1))
    val out = Eval.calibrationBins(rows.toDF("s", "y"), col("s"), col("y"),
        bins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[Long]("n") == 2, "0.0 and 0.05 share bin 0")
    assert(out(0).getAs[Double]("frac_pos") == 0.5)
    assert(out(9).getAs[Long]("n") == 2, "score 1.0 lands in the last bin")
    assert(out(9).getAs[Double]("frac_pos") == 1.0)
    val e = intercept[Exception] {
      Eval.calibrationBins(Seq((1.2, 1)).toDF("s", "y"),
        col("s"), col("y")).collect()
    }
    assert(e.getMessage.contains("score outside"))
  }

  test("aucByGroup matches per-group pairwise AUC; single-class group is null") {
    val rows = Seq(
      ("a", 0.1, 0), ("a", 0.2, 1), ("a", 0.2, 0), ("a", 0.9, 1),
      ("b", 0.3, 1), ("b", 0.4, 0), ("b", 0.5, 1),
      ("c", 0.7, 1), ("c", 0.8, 1)) // single class
    val out = Eval.aucByGroup(rows.toDF("g", "s", "y"), Seq("g"),
        col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val want = pairwiseAuc(rows.filter(_._1 == g).map(t => (t._2, t._3)))
      assert(out(g).getAs[Double]("auc") == want, s"group $g")
    }
    assert(out("c").isNullAt(out("c").fieldIndex("auc")))
    assert(out("c").getAs[Long]("n_pos") == 2)
  }

  test("auc is partitioning-invariant") {
    val rows = (0 until 500).map { i =>
      (((i * 37) % 101).toDouble / 101.0, i % 3 min 1)
    }
    val df = rows.toDF("s", "y")
    val a = Eval.auc(df, col("s"), col("y")).collect().head.getDouble(0)
    val b = Eval.auc(df.repartition(13), col("s"), col("y"))
      .collect().head.getDouble(0)
    assert(a == b)
    assert(a == pairwiseAuc(rows.map { case (s, y) => (s, y) }))
  }

  test("yield curve: hand-computed kept counts and weight fractions") {
    // scores 0.1..1.0, weight = 10*score index
    val df = (1 to 10).map(i => (i / 10.0, i * 10L)).toDF("s", "w")
    val out = Eval.yieldCurve(df, col("s"), col("w"), Seq(0.35, 0.75, 2.0))
      .collect().map(r => r.getAs[Double]("threshold") -> r).toMap
    val t1 = out(0.35) // keeps scores .4..1.0: 7 rows, weight 40+..+100=490
    assert(t1.getAs[Long]("n_kept") == 7L)
    assert(t1.getAs[Double]("frac_kept") == 0.7)
    assert(t1.getAs[Double]("weight_kept") == 490.0)
    assert(t1.getAs[Double]("frac_weight") ==
      math.rint(490.0 / 550.0 * 1e6) / 1e6)
    val t3 = out(2.0) // nothing survives
    assert(t3.getAs[Long]("n_kept") == 0L &&
      t3.getAs[Double]("weight_kept") == 0.0)
    // kept mass is monotone non-increasing in the threshold
    val sorted = Eval.yieldCurve(df, col("s"), col("w"),
      Seq(0.1, 0.3, 0.5, 0.7, 0.9)).collect()
    assert(sorted.map(_.getAs[Long]("n_kept")).sliding(2)
      .forall { case Array(a2, b2) => a2 >= b2; case _ => true })
    // a null weight on a scored row fails loudly, never silently skipped
    val bad = Seq((0.5, Some(1L)), (0.6, None)).toDF("s", "w")
    val e = intercept[Exception] {
      Eval.yieldCurve(bad, col("s"), col("w"), Seq(0.1)).collect()
    }
    assert(e.getMessage != null || e.getCause != null)
  }

  test("bestThreshold: hand-computed F1 and Youden argmaxes, tie rule") {
    // scores 0.9, 0.8, 0.7, 0.6 with labels 1, 1, 0, 1: P=3, N=1
    // sweep t=0.9: tp=1 fp=0 -> f1=2/4=.5  | tpr=1/3 fpr=0 -> j=1/3
    //       t=0.8: tp=2 fp=0 -> f1=4/5=.8  | tpr=2/3 fpr=0 -> j=2/3
    //       t=0.7: tp=2 fp=1 -> f1=4/6=.667| tpr=2/3 fpr=1 -> j=-1/3
    //       t=0.6: tp=3 fp=1 -> f1=6/7=.857| tpr=1   fpr=1 -> j=0
    val df = Seq((0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1)).toDF("s", "y")
    val r = Eval.bestThreshold(df, col("s"), col("y")).head()
    assert(r.getAs[Double]("threshold_f1") == 0.6)
    assert(r.getAs[Double]("f1") == math.rint(6.0 / 7 * 1e9) / 1e9)
    assert(r.getAs[Double]("threshold_j") == 0.8)
    assert(r.getAs[Double]("youden_j") == math.rint(2.0 / 3 * 1e9) / 1e9)
    assert(r.getAs[Double]("fpr_at_j") == 0.0)
    // single-class input fails loudly
    val one = Seq((0.9, 1), (0.8, 1)).toDF("s", "y")
    intercept[IllegalArgumentException] {
      Eval.bestThreshold(one, col("s"), col("y")).head()
    }
  }

  test("brier decomposition: murphy identity, perfect/base forecasts") {
    // forecasts on a 3-value grid; identity BS = REL - RES + UNC exact
    val rows = Seq.fill(10)((0.2, 0)) ++ Seq.fill(10)((0.2, 1)) ++
      Seq.fill(20)((0.8, 1)) ++ Seq.fill(5)((0.8, 0)) ++
      Seq.fill(5)((0.5, 1))
    val r = Eval.brierDecomposition(rows.toDF("p", "y"),
      col("p"), col("y")).head()
    val id = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(r.getAs[Double]("brier") - id) < 3e-9, s"$r")
    // a perfectly calibrated AND perfectly sharp forecaster: BS = 0
    val perfect = (Seq.fill(10)((1.0, 1)) ++ Seq.fill(10)((0.0, 0)))
      .toDF("p", "y")
    val pf = Eval.brierDecomposition(perfect, col("p"), col("y")).head()
    assert(pf.getAs[Double]("brier") == 0.0 &&
      pf.getAs[Double]("reliability") == 0.0 &&
      pf.getAs[Double]("resolution") == pf.getAs[Double]("uncertainty"))
    // the constant base-rate forecast: RES = 0, BS = UNC
    val base = (Seq.fill(6)((0.25, 0)) ++ Seq.fill(2)((0.25, 1)))
      .toDF("p", "y")
    val bf = Eval.brierDecomposition(base, col("p"), col("y")).head()
    assert(bf.getAs[Double]("resolution") == 0.0 &&
      bf.getAs[Double]("reliability") == 0.0 &&
      bf.getAs[Double]("brier") == bf.getAs[Double]("uncertainty"))
    intercept[IllegalArgumentException] {
      Eval.brierDecomposition(Seq((1.5, 1)).toDF("p", "y"),
        col("p"), col("y")).head()
    }
  }

  test("mcc: perfect 1, inverted -1, random ~ 0, degenerate null") {
    def df(rows: Seq[(Double, Int)]) = rows.toDF("s", "y")
    // threshold 0.5 splits perfectly
    val perfect = (1 to 10).map(i => (if (i <= 5) 0.9 else 0.1,
      if (i <= 5) 1 else 0))
    assert(Eval.mccAt(df(perfect), col("s"), col("y"), 0.5)
      .head().getAs[Double]("mcc") == 1.0)
    val inverted = perfect.map { case (s, y) => (s, 1 - y) }
    assert(Eval.mccAt(df(inverted), col("s"), col("y"), 0.5)
      .head().getAs[Double]("mcc") == -1.0)
    // all predicted positive: a zero marginal, MCC undefined
    val oneSided = Eval.mccAt(df(perfect), col("s"), col("y"), 0.0)
      .head()
    assert(oneSided.isNullAt(oneSided.fieldIndex("mcc")))
    intercept[IllegalArgumentException] {
      Eval.mccAt(Seq((1.0, 2)).toDF("s", "y"), col("s"), col("y"), 0.5)
        .head()
    }
  }

  test("spiegelhalter z: calibrated passes, systematic bias rejects") {
    // calibrated by construction: p in {0.2, 0.8}, y matches the rate
    val cal = (Seq.fill(8)((0.2, 0)) ++ Seq.fill(2)((0.2, 1)) ++
      Seq.fill(2)((0.8, 0)) ++ Seq.fill(8)((0.8, 1))).toDF("p", "y")
    val c = Eval.spiegelhalterZ(cal, col("p"), col("y")).head()
    assert(math.abs(c.getAs[Double]("z")) < 1e-9,
      s"exact calibration must give z = 0: $c")
    // overconfident low forecasts that keep coming true
    val bias = (Seq.fill(50)((0.1, 1)) ++ Seq.fill(5)((0.1, 0)))
      .toDF("p", "y")
    val b = Eval.spiegelhalterZ(bias, col("p"), col("y")).head()
    assert(b.getAs[Double]("z") > 5.0 && b.getAs[Double]("p_value") < 1e-6,
      s"$b")
    // all-certain forecasts: zero variance, z undefined
    val hard = (Seq.fill(5)((1.0, 1)) ++ Seq.fill(5)((0.0, 0)))
      .toDF("p", "y")
    val h = Eval.spiegelhalterZ(hard, col("p"), col("y")).head()
    assert(h.isNullAt(h.fieldIndex("z")))
    intercept[IllegalArgumentException] {
      Eval.spiegelhalterZ(Seq((1.5, 1)).toDF("p", "y"),
        col("p"), col("y"))
    }
  }

  test("lift table: perfect ranker geometry, tie merge, label guard") {
    // scores 1..100 distinct, positives = the top 20 scores
    val perfect = (1 to 100).map(i => (i.toDouble, if (i > 80) 1 else 0))
      .toDF("s", "y")
    val rows = Eval.liftTable(perfect, col("s"), col("y"))
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(rows.size == 10)
    val top = rows(1)
    assert(top.getAs[Long]("n") == 10L && top.getAs[Long]("n_pos") == 10L)
    assert(top.getAs[Double]("lift") == 5.0, s"top decile lift 1/0.2: $top")
    assert(rows(2).getAs[Double]("cum_capture") == 1.0,
      "top two deciles hold all 20 positives")
    assert(rows(3).getAs[Long]("n_pos") == 0L &&
      rows(3).getAs[Double]("lift") == 0.0)
    assert(rows(10).getAs[Double]("cum_frac") == 1.0 &&
      rows(10).getAs[Double]("cum_capture") == 1.0)
    // all-tied scores: every threshold equal, one merged bucket
    val tied = (1 to 40).map(i => (7.0, i % 4 / 3)).toDF("s", "y")
    val t = Eval.liftTable(tied, col("s"), col("y")).collect()
    assert(t.length == 1 && t.head.getAs[Int]("bucket") == 10)
    assert(t.head.getAs[Double]("lift") == 1.0 &&
      t.head.getAs[Double]("cum_capture") == 1.0)
    // labels outside 0/1 fail loudly
    intercept[IllegalArgumentException] {
      Eval.liftTable(Seq((1.0, 2)).toDF("s", "y"), col("s"), col("y"))
        .collect()
    }
  }
}
