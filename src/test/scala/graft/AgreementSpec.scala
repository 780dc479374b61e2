package graft

import org.apache.spark.sql.functions._

import graft.stats.Agreement

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohen's kappa: the textbook 2x2 table gives 0.4") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no:
    // po = 35/50 = 0.7, pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Agreement.cohenKappa(rows.toDF("a", "b"), $"a", $"b").head()
    assert(out.getAs[Long]("n_items") == 50L)
    assert(out.getAs[Double]("p_observed") == 0.7)
    assert(out.getAs[Double]("p_expected") == 0.5)
    assert(out.getAs[Double]("kappa") == 0.4)
  }

  test("cohen's kappa: perfect agreement is 1, constant raters are null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("x", "y")
    assert(Agreement.cohenKappa(perfect, $"x", $"y").head()
      .getAs[Double]("kappa") == 1.0)
    // pe = 1 (one category in both raters): undefined, not 0/0
    val const = Seq(("a", "a"), ("a", "a")).toDF("x", "y")
    val r = Agreement.cohenKappa(const, $"x", $"y").head()
    assert(r.isNullAt(r.fieldIndex("kappa")))
    // null labels excluded
    val withNull = Seq((Some("a"), Some("a")), (None, Some("b")),
      (Some("b"), None), (Some("b"), Some("a")))
      .toDF("x", "y")
    assert(Agreement.cohenKappa(withNull, $"x", $"y").head()
      .getAs[Long]("n_items") == 2L)
  }

  test("fleiss' kappa: hand-solved 2-item 3-rater panel gives -0.2") {
    // item 1: a,a,b (Pi = 1/3); item 2: a,a,a (Pi = 1)
    // P-bar = 2/3, pe = (25+1)/36 = 13/18, kappa = -0.2
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a")).toDF("i", "l")
    val out = Agreement.fleissKappa(df, $"i", $"l").head()
    assert(out.getAs[Long]("n_items") == 2L)
    assert(out.getAs[Long]("n_raters") == 3L)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.getAs[Double]("p_bar") == r6(2.0 / 3.0))
    assert(out.getAs[Double]("p_expected") == r6(13.0 / 18.0))
    assert(out.getAs[Double]("kappa") == -0.2)
  }

  test("fleiss' kappa: ragged panels and single raters fail loudly") {
    val ragged = Seq((1L, "a"), (1L, "a"), (2L, "a")).toDF("i", "l")
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(ragged, $"i", $"l")
    }
    assert(e.getMessage.contains("constant rater count"))
    val single = Seq((1L, "a"), (2L, "b")).toDF("i", "l")
    assert(intercept[IllegalArgumentException] {
      Agreement.fleissKappa(single, $"i", $"l")
    }.getMessage.contains("at least 2 raters"))
  }

  test("fleiss' kappa: unanimous panel with >1 category is exactly 1") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("i", "l")
    assert(Agreement.fleissKappa(df, $"i", $"l").head()
      .getAs[Double]("kappa") == 1.0)
  }

  test("kendall's W: perfect concordance is 1, perfect opposition is 0") {
    val same = (1 to 5).flatMap(i =>
      Seq((i.toLong, "a", i.toDouble), (i.toLong, "b", i.toDouble),
        (i.toLong, "c", i.toDouble))).toDF("i", "r", "s")
    val w1 = Agreement.kendallW(same, $"i", $"r", $"s").head()
    assert(w1.getAs[Double]("w") == 1.0)
    assert(w1.getAs[Long]("n_items") == 5L && w1.getAs[Long]("n_raters") == 3L)
    // two exactly reversed rankings: every item's rank sum is equal → W = 0
    val opposed = (1 to 4).flatMap(i =>
      Seq((i.toLong, "a", i.toDouble), (i.toLong, "b", (5 - i).toDouble)))
      .toDF("i", "r", "s")
    assert(Agreement.kendallW(opposed, $"i", $"r", $"s").head()
      .getAs[Double]("w") == 0.0)
  }

  test("kendall's W: hand-solved tied panel gives 78/84") {
    // rater a: 1, 2, 2 (tie) ; rater b: 1, 2, 3 → S4 = 26, ΣT = 6,
    // den = 4·24 − 12 = 84, W = 3·26/84, χ² = m(n−1)W
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0),
      (1L, "b", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)).toDF("i", "r", "s")
    val row = Agreement.kendallW(df, $"i", $"r", $"s").head()
    assert(math.abs(row.getAs[Double]("w") - 78.0 / 84.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("chi2") - 4.0 * 78.0 / 84.0) < 1e-6)
  }

  test("kendall's W: all-tied panel yields null; ragged panels fail") {
    val tied = Seq((1L, "a", 1.0), (2L, "a", 1.0),
      (1L, "b", 1.0), (2L, "b", 1.0)).toDF("i", "r", "s")
    assert(Agreement.kendallW(tied, $"i", $"r", $"s").head().isNullAt(2))
    val ragged = Seq((1L, "a", 1.0), (2L, "a", 2.0), (1L, "b", 1.0))
      .toDF("i", "r", "s")
    intercept[IllegalArgumentException] {
      Agreement.kendallW(ragged, $"i", $"r", $"s").head()
    }
    val solo = Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("i", "r", "s")
    intercept[IllegalArgumentException] {
      Agreement.kendallW(solo, $"i", $"r", $"s").head()
    }
  }

  test("krippendorff's alpha matches an independent driver reference") {
    // deterministic ragged panel: item u gets 2 + u%3 ratings (every
    // 7th item a singleton), rater r disagrees on every (2+r)-th item
    val rows = for {
      u <- 1L to 60L
      m = if (u % 7 == 0) 1 else 2 + (u % 3).toInt
      r <- 1 to m
    } yield (u, ((u % 4 + (if (u % (2 + r) == 0) r else 0)) % 4).toString)
    val out = Agreement.krippendorffAlpha(rows.toDF("i", "l"), $"i", $"l")
      .head()
    // independent reference: the coincidence-matrix formulation (pairs
    // within items weighted 1/(m_u - 1)) — a different derivation than
    // the operator's per-item disagreement numerators
    val byItem = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size >= 2)
    var coincDiag = 0.0; var n = 0.0
    val catTotals = scala.collection.mutable.Map.empty[String, Double]
    for ((_, ls) <- byItem) {
      val m = ls.size
      for (a <- ls.indices; b <- ls.indices if a != b) {
        val w = 1.0 / (m - 1)
        if (ls(a) == ls(b)) coincDiag += w
        catTotals(ls(a)) = catTotals.getOrElse(ls(a), 0.0) + w
        n += w
      }
    }
    val doRef = (n - coincDiag) / n
    val deRef = catTotals.values.map(nc => nc * (n - nc)).sum / (n * (n - 1))
    val alphaRef = 1.0 - doRef / deRef
    assert(out.getAs[Long]("n_ratings") == n.round)
    assert(math.abs(out.getAs[Double]("alpha") - alphaRef) < 1e-6,
      s"alpha ${out.getAs[Double]("alpha")} != reference $alphaRef")
    assert(math.abs(out.getAs[Double]("do_rate") - doRef) < 1e-6)
    assert(math.abs(out.getAs[Double]("de_rate") - deRef) < 1e-6)
  }

  test("krippendorff's alpha: perfect, degenerate, and singleton panels") {
    // perfect agreement -> alpha 1
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("i", "l")
    assert(Agreement.krippendorffAlpha(perfect, $"i", $"l")
      .head().getAs[Double]("alpha") == 1.0)
    // one category everywhere -> D_e = 0 -> null alpha
    val flat = Seq((1L, "x"), (1L, "x"), (2L, "x")).toDF("i", "l")
    val fr = Agreement.krippendorffAlpha(flat, $"i", $"l").head()
    assert(fr.isNullAt(fr.fieldIndex("alpha")))
    // singleton items contribute nothing: adding one changes no number
    val withSolo = perfect.unionByName(Seq((3L, "z")).toDF("i", "l"))
    val a = Agreement.krippendorffAlpha(perfect, $"i", $"l").head()
    val b = Agreement.krippendorffAlpha(withSolo, $"i", $"l").head()
    assert(a.getAs[Long]("n_ratings") == b.getAs[Long]("n_ratings"))
    assert(a.getAs[Double]("alpha") == b.getAs[Double]("alpha"))
  }

  test("cronbach: duplicate items -> 1, orthogonal -> 0, degenerate -> null") {
    // two identical items: total variance = 4v, item sum = 2v -> alpha 1
    val dup = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("r1", "r2")
    val rd = Agreement.cronbachAlpha(dup, Seq("r1", "r2")).head()
    assert(rd.getAs[Double]("alpha") == 1.0)
    // exactly zero sample covariance: total var = sum of item vars -> 0
    val orth = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
      .toDF("r1", "r2")
    val ro = Agreement.cronbachAlpha(orth, Seq("r1", "r2")).head()
    assert(ro.getAs[Double]("alpha") == 0.0, s"$ro")
    // null item row excluded from the fit, not zero-filled
    val withNull = dup.unionByName(
      Seq((Some(9.0), None: Option[Double])).toDF("r1", "r2"))
    val rn = Agreement.cronbachAlpha(withNull, Seq("r1", "r2")).head()
    assert(rn.getAs[Long]("n_rows") == 4 && rn.getAs[Double]("alpha") == 1.0)
    // constant total score: reliability undefined -> null, never NaN
    val const = Seq((1.0, 2.0), (2.0, 1.0), (1.5, 1.5)).toDF("r1", "r2")
    val rc = Agreement.cronbachAlpha(const, Seq("r1", "r2")).head()
    assert(rc.isNullAt(rc.fieldIndex("alpha")))
    intercept[IllegalArgumentException] {
      Agreement.cronbachAlpha(dup, Seq("r1"))
    }
  }

  test("weighted kappa: perfect 1, near-miss forgiven, constant rater null") {
    // perfect agreement on an ordinal scale
    val perfect = (0 to 4).flatMap(i => Seq.fill(5)((i.toLong, i.toLong)))
      .toDF("a", "b")
    val p = Agreement.weightedKappa(perfect, col("a"), col("b")).head()
    assert(p.getAs[Double]("kappa_w") == 1.0 && p.getAs[Int]("levels") == 5)
    // textbook check: 2x2 with obs ONLY one-step misses scores higher
    // weighted than unweighted when the scale has long-range mass
    val near = ((0 to 4).flatMap(i => Seq.fill(8)((i.toLong, i.toLong))) ++
      (0 to 3).map(i => (i.toLong, i.toLong + 1))).toDF("a", "b")
    val kw = Agreement.weightedKappa(near, col("a"), col("b"))
      .head().getAs[Double]("kappa_w")
    val plain = Agreement.cohenKappa(near, col("a"), col("b"))
      .head().getAs[Double]("kappa")
    assert(kw > plain && kw > 0.8, s"kw=$kw plain=$plain")
    // ONE constant rater: chance weighted agreement exactly cancels the
    // observed disagreement -> kappa_w = 0 (no skill beyond chance)
    val oneConst = (1 to 10).map(i => (2L, (i % 5).toLong)).toDF("a", "b")
    val oc = Agreement.weightedKappa(oneConst, col("a"), col("b")).head()
    assert(oc.getAs[Double]("kappa_w") == 0.0, s"$oc")
    // BOTH raters constant at the same level: zero expected
    // disagreement, kappa undefined
    val const = (1 to 10).map(_ => (2L, 2L)).toDF("a", "b")
    val c = Agreement.weightedKappa(const, col("a"), col("b")).head()
    assert(c.isNullAt(c.fieldIndex("kappa_w")))
  }

  test("bowker: hand 2x2 equals mcnemar-uncorrected, symmetry nulls, drift") {
    // two labels: only discordant pair (x,y)/(y,x): chi2 = (b-c)^2/(b+c)
    val two = (Seq.fill(20)(("x", "x")) ++ Seq.fill(10)(("x", "y")) ++
      Seq.fill(2)(("y", "x")) ++ Seq.fill(5)(("y", "y"))).toDF("a", "b")
    val r = Agreement.bowker(two, col("a"), col("b")).head()
    assert(r.getAs[Long]("n_pairs_tested") == 1L &&
      r.getAs[Double]("chi2") == 5.333333, s"$r")
    // perfectly symmetric discordance: chi2 exactly 0, p = 1
    val sym = (Seq.fill(7)(("x", "y")) ++ Seq.fill(7)(("y", "x")) ++
      Seq.fill(3)(("z", "x")) ++ Seq.fill(3)(("x", "z"))).toDF("a", "b")
    val s = Agreement.bowker(sym, col("a"), col("b")).head()
    assert(s.getAs[Double]("chi2") == 0.0 &&
      s.getAs[Double]("p_value") == 1.0 &&
      s.getAs[Long]("n_pairs_tested") == 2L)
    // raters never disagree: nothing to test
    val agree = (1 to 6).map(i => (s"l$i", s"l$i")).toDF("a", "b")
    val a = Agreement.bowker(agree, col("a"), col("b")).head()
    assert(a.isNullAt(a.fieldIndex("chi2")) &&
      a.getAs[Long]("n_pairs_tested") == 0L)
  }

  test("cochran's q: hand table, k=2 equals uncorrected mcnemar, degenerate") {
    // 6 subjects x 3 treatments: c = (5,4,2), r = (2,1,3,2,2,1)
    // num = 2*(3*45 - 121) = 28, den = 3*11 - 23 = 10 -> Q = 2.8
    val hand = Seq(
      (true, true, false), (true, false, false), (true, true, true),
      (true, true, false), (true, false, true), (false, true, false)
    ).toDF("f0", "f1", "f2")
    val r = Agreement.cochranQ(hand, Seq("f0", "f1", "f2")).head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Int]("k") == 3)
    assert(r.getAs[Double]("q_stat") == 2.8, s"$r")
    val p = r.getAs[Double]("p_value")
    assert(p > 0.24 && p < 0.25, s"1 - chi2cdf(2.8, 2) = 0.2466: $p")
    // k = 2 reduces to McNemar WITHOUT continuity correction:
    // b = 10, c = 2 -> Q = (10-2)^2 / 12 = 5.333333333
    val two = (Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("a", "b")
    val q2 = Agreement.cochranQ(two, Seq("a", "b")).head()
    assert(q2.getAs[Double]("q_stat") == 5.333333333, s"$q2")
    // rows with any null verdict are excluded from the pairing
    val withNull = hand.unionAll(
      Seq((Some(true), Option.empty[Boolean], Some(true)))
        .toDF("f0", "f1", "f2"))
    assert(Agreement.cochranQ(withNull, Seq("f0", "f1", "f2"))
      .head().getAs[Long]("n") == 6L)
    // every subject unanimous -> zero within-subject information -> null
    val unanimous = Seq((true, true, true), (false, false, false),
      (true, true, true)).toDF("f0", "f1", "f2")
    val u = Agreement.cochranQ(unanimous, Seq("f0", "f1", "f2")).head()
    assert(u.isNullAt(u.fieldIndex("q_stat")))
    intercept[IllegalArgumentException] {
      Agreement.cochranQ(hand, Seq("f0"))
    }
  }

  test("icc(1,1): hand ANOVA decomposition, degenerate and unbalanced edges") {
    import graft.stats.Agreement
    // 3 items x 2 ratings: within-pair diff 1 everywhere -> MSW = 0.5,
    // MSB = 24.666667, ICC = 24.1667/25.1667 = 0.960265, F = 49.333333
    val hand = Seq((1L, 8.0), (1L, 9.0), (2L, 4.0), (2L, 5.0),
      (3L, 1.0), (3L, 2.0)).toDF("i", "y")
    val r = Agreement.icc(hand, col("i"), col("y")).head()
    assert(r.getAs[Long]("n_items") == 3L && r.getAs[Long]("k_raters") == 2L)
    assert(r.getAs[Double]("msb") == 24.666667 &&
      r.getAs[Double]("msw") == 0.5, s"$r")
    assert(r.getAs[Double]("icc1") == 0.960265 &&
      r.getAs[Double]("f_stat") == 49.333333, s"$r")
    // identical ratings everywhere: MSW = MSB = 0 -> null icc, null F
    val flat = Seq((1L, 2.0), (1L, 2.0), (2L, 2.0), (2L, 2.0))
      .toDF("i", "y")
    val fr = Agreement.icc(flat, col("i"), col("y")).head()
    assert(fr.isNullAt(fr.fieldIndex("icc1")) &&
      fr.isNullAt(fr.fieldIndex("f_stat")), s"$fr")
    // perfect separation with zero within-item noise: icc = 1 exactly
    val sep = Seq((1L, 1.0), (1L, 1.0), (2L, 9.0), (2L, 9.0)).toDF("i", "y")
    val sr = Agreement.icc(sep, col("i"), col("y")).head()
    assert(sr.getAs[Double]("icc1") == 1.0 &&
      sr.isNullAt(sr.fieldIndex("f_stat")), s"$sr")
    // unbalanced design -> loud
    val err = intercept[IllegalArgumentException] {
      Agreement.icc(hand.limit(5), col("i"), col("y"))
    }
    assert(err.getMessage.contains("balanced"), err.getMessage)
  }
}
