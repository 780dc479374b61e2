package graft

import org.apache.spark.sql.functions._

import graft.ops.{Privacy, Sampling, Similarity}

/** Wave-5 operators: privacy audits, the dedup-aware split, and
  * hard-negative mining. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    // (zip, age_band, diagnosis) — class (z1, 30) has 3 rows / 1 value,
    // (z1, 40) has 2 rows / 2 values, (z2, 30) is a singleton, and the
    // NULL-diagnosis class (z2, 40) has 2 rows / 2 values (NULL + "flu").
    ("z1", 30, "flu"), ("z1", 30, "flu"), ("z1", 30, "flu"),
    ("z1", 40, "flu"), ("z1", 40, "cold"),
    ("z2", 30, "cold"),
    ("z2", 40, null), ("z2", 40, "flu")
  ).toDF("zip", "age_band", "diagnosis")

  test("dp release: deterministic zero-mean noise, scale ∝ 1/ε, exact clip") {
    import graft.ops.Privacy
    val df = (1 to 400).map(i => (s"g${i % 4}", i.toDouble))
      .toDF("g", "v")
    def noiseOf(eps: Double) = Privacy
      .dpCountRelease(df, Seq("g"), eps, "spec-dp").collect()
      .map(r => r.getString(0) -> (r.getDouble(1) - 100.0)).toMap
    val n1 = noiseOf(0.5)
    // reproducible: the same seed redraws the same release
    assert(noiseOf(0.5) == n1)
    // scale is exactly b-proportional for a fixed hash draw: ε/4 → 4×
    val n2 = noiseOf(0.125)
    n1.foreach { case (g, x) =>
      assert(math.abs(n2(g) - 4.0 * x) < 1e-4, s"$g: ${n2(g)} vs 4*$x") }
    // noise is signed (both tails appear over distinct group keys)
    val wide = (1 to 64).map(i => (s"k$i", 1.0)).toDF("g", "v")
    val signs = Privacy.dpCountRelease(wide, Seq("g"), 1.0, "spec-dp")
      .collect().map(_.getDouble(1) - 1.0)
    assert(signs.exists(_ > 0) && signs.exists(_ < 0))
    // clipped sum: one huge outlier moves the release by at most clip
    val base = Privacy.dpSumRelease(df, Seq("g"), "v", clip = 50.0,
      epsilon = 0.5, seed = "s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spiked = Privacy.dpSumRelease(
      df.union(Seq(("g0", 1e9)).toDF("g", "v")), Seq("g"), "v",
      clip = 50.0, epsilon = 0.5, seed = "s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(spiked("g0") - base("g0") - 50.0) < 1e-6)
    assert(spiked("g1") == base("g1"))
    intercept[IllegalArgumentException] {
      Privacy.dpCountRelease(df, Seq("g"), 0.0, "s")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpSumRelease(df, Seq("g"), "v", clip = -1.0, epsilon = 1.0,
        seed = "s")
    }
  }

  test("randomized response: universe-closed, deterministic, debiasable") {
    import graft.ops.Privacy
    val df = (1 to 900).map(i =>
      (i.toLong, if (i <= 600) "a" else if (i <= 800) "b" else "c"))
      .toDF("id", "cat")
    val rel = Privacy.randomizedResponse(df, "cat", p = 0.75,
      seed = "spec-rr", Seq("id")).persist()
    val reported = rel.select("reported").collect().map(_.getString(0))
    assert(reported.forall(Set("a", "b", "c")))
    // deterministic
    val again = Privacy.randomizedResponse(df, "cat", p = 0.75,
      seed = "spec-rr", Seq("id")).select("id", "reported").collect().toSeq
    assert(rel.select("id", "reported").collect().toSeq == again)
    // kept fraction tracks p
    val kept = rel.filter(col("reported") === col("cat")).count().toDouble / 900
    assert(kept > 0.7 && kept < 0.95, s"kept fraction $kept")
    // estimator algebra is exact: estimate == (obs - n*(1-p)/k)/p
    val est = Privacy.rrFrequencyEstimate(rel, "reported", p = 0.75, k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val obsA = est("a").getAs[Long]("observed")
    val expected = BigDecimal((obsA - 900 * 0.25 / 3.0) / 0.75)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est("a").getAs[Double]("estimate") == expected)
    // and it lands near the truth
    assert(math.abs(est("a").getAs[Double]("estimate") - 600) <
      4 * math.sqrt(900.0))
    // nulls pass through as null reports and are excluded from estimates
    val withNull = df.withColumn("cat",
      when(col("id") <= 10, lit(null).cast("string")).otherwise(col("cat")))
    val rel2 = Privacy.randomizedResponse(withNull, "cat", p = 0.75,
      seed = "spec-rr", Seq("id"))
    assert(rel2.filter(col("id") <= 10 && col("reported").isNotNull)
      .count() == 0)
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(df, "cat", p = 0.75, seed = "s",
        Seq("id"), maxCategories = 2)
    }
    rel.unpersist()
    ()
  }

  test("k-anonymity report: class census, rows at risk, threshold flag") {
    val r2 = Privacy.kAnonymityReport(people, Seq("zip", "age_band"), k = 2).head()
    assert(r2.getAs[Long]("n_classes") == 4)
    assert(r2.getAs[Long]("n_rows") == 8)
    assert(r2.getAs[Long]("min_class_size") == 1)
    assert(r2.getAs[Long]("classes_below_k") == 1) // the (z2, 30) singleton
    assert(r2.getAs[Long]("rows_below_k") == 1)
    assert(!r2.getAs[Boolean]("anonymous"))

    val r1 = Privacy.kAnonymityReport(people, Seq("zip", "age_band"), k = 1).head()
    assert(r1.getAs[Boolean]("anonymous")) // k=1 always holds
  }

  test("l-diversity: NULL sensitive value counts as one distinct value") {
    val l = Privacy.lDiversity(people, Seq("zip", "age_band"), "diagnosis")
      .orderBy("zip", "age_band").collect()
    assert(l.map(r => (r.getString(0), r.getInt(1), r.getAs[Long]("l"))).toSeq ==
      Seq(("z1", 30, 1L), ("z1", 40, 2L), ("z2", 30, 1L), ("z2", 40, 2L)))
    val rep = Privacy.lDiversityReport(people, Seq("zip", "age_band"),
      "diagnosis", l = 2).head()
    assert(rep.getAs[Long]("min_l") == 1)
    assert(rep.getAs[Long]("classes_below_l") == 2)
    assert(rep.getAs[Long]("rows_below_l") == 4) // 3 + 1
    assert(!rep.getAs[Boolean]("diverse"))
  }

  test("suppression to k leaves a k-anonymous remainder and only drops") {
    val kept = Privacy.suppressToK(people, Seq("zip", "age_band"), k = 2)
    assert(kept.count() == 7) // the (z2, 30) singleton is gone
    val audit = Privacy.kAnonymityReport(kept, Seq("zip", "age_band"), k = 2).head()
    assert(audit.getAs[Boolean]("anonymous"))
    // suppression never invents rows: kept ⊆ original, classes intact
    assert(kept.exceptAll(people).count() == 0)
    // idempotent: suppressing an already-k-anonymous release drops nothing
    assert(Privacy.suppressToK(kept, Seq("zip", "age_band"), k = 2).count() == 7)
  }

  test("generalization bins label by inclusive lower edge; NULL stays NULL") {
    val df = Seq[java.lang.Double](17.0, -0.5, 0.0, 999.9, null).toDF("v")
    val bins = df.select(Privacy.generalizeNumeric(col("v"), 10.0).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(bins.toSeq == Seq(10.0, -10.0, 0.0, 990.0, null))
  }

  test("pseudonymize: stable join key, NULL preserved, secret rotation unlinks") {
    val df = Seq(Some("u1"), Some("u2"), Some("u1"), None).toDF("uid")
    val p1 = Privacy.pseudonymize(df, Seq("uid"), "s1")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    // same input → same pseudonym (joinable); distinct inputs stay distinct
    assert(p1(0) == p1(2) && p1(0) != p1(1))
    assert(p1(3) == null, "NULL id must not gain a pseudonym")
    assert(p1(0).length == 64 && p1(0).matches("[0-9a-f]+"))
    // rotating the secret unlinks releases
    val p2 = Privacy.pseudonymize(df, Seq("uid"), "s2")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(p1(0) != p2(0))
    // the separator prevents (secret, value) ambiguity: secret "s" +
    // value "1x" must differ from secret "s1" + value "x"
    val a = Privacy.pseudonymize(Seq("1x").toDF("uid"), Seq("uid"), "s")
      .head().getString(0)
    val b = Privacy.pseudonymize(Seq("x").toDF("uid"), Seq("uid"), "s1")
      .head().getString(0)
    assert(a != b)
  }

  test("leakage-safe split: pairs never straddle; empty pairs == hashSplit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // near-dup proxy pairs: same (lang, n_chars/100) bucket, star edges
    val keyed = docs.select(col("doc_id"), col("lang"),
      floor(col("n_chars") / 100).as("bkt"))
    val reps = keyed.groupBy("lang", "bkt").agg(min("doc_id").as("rep"))
    val pairs = keyed.join(reps, Seq("lang", "bkt"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))
    assert(pairs.count() > 0)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, splits)

    // no pair straddles splits: join each edge to both endpoints' splits
    val s = out.select(col("doc_id"), col("split"))
    val straddle = pairs
      .join(s.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), Seq("a"))
      .join(s.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), Seq("b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0)

    // every row assigned, all three splits non-empty at this size
    assert(out.filter(col("split").isNull).count() == 0)
    assert(out.select("split").distinct().count() == 3)

    // empty pairs degrade to the plain per-row hashSplit, row for row
    val empty = pairs.filter(lit(false))
    val solo = Sampling.leakageSafeSplit(docs, "doc_id", empty, splits)
      .select(col("doc_id"), col("split"))
    val plain = Sampling.hashSplit(docs, Seq("doc_id"), splits)
      .select(col("doc_id"), col("split"))
    assert(solo.exceptAll(plain).count() == 0 && plain.exceptAll(solo).count() == 0)
  }

  test("hard negatives: cross-label only, descending cosine, nulls never pair") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      col("vec_id") < 5, k = 4).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      // strictly cross-label
      assert(sorted.forall(r => r.getAs[Int]("q_label") != r.getAs[Int]("n_label")))
      // non-increasing cosine down the ranks
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }

    // driver cross-check for one query: best cross-label neighbor matches
    val rows = embs.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    val (qid, qv, ql) = rows.find(_._1 == 0L).get
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expectBest = rows.filter(r => r._3 != ql)
      .map(r => (r._1, cosine(qv, r._2))).maxBy { case (nid, c) => (c, -nid) }
    val got = Similarity.hardNegatives(embs.filter(col("vec_id") < 200),
        "vec_id", "embedding", "label", col("vec_id") === 0, k = 1)
      .head()
    assert(got.getAs[Long]("nid") == expectBest._1)
    assert(math.abs(got.getAs[Double]("cosine") - expectBest._2) < 1e-9)

    // a null label can be neither anchor nor negative
    val withNull = embs.limit(50)
      .withColumn("label",
        when(col("vec_id") % 2 === 0, lit(null).cast("int")).otherwise(col("label")))
    val nn = Similarity.hardNegatives(withNull, "vec_id", "embedding", "label",
      lit(true), k = 3)
    assert(nn.filter(col("qid") % 2 === 0 || col("nid") % 2 === 0).count() == 0)
  }

  test("t-closeness: hand EMD, identical distributions, guards") {
    import graft.ops.Privacy
    // global s-domain {1,2,3} each ×2; class A skews low, B skews high:
    // p_A=(2/3,1/3,0) vs q=(1/3,1/3,1/3) -> cums 1/3,1/3,0 -> EMD=1/3
    val df = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0),
      ("B", 2.0), ("B", 3.0), ("B", 3.0)).toDF("g", "s")
    val out = Privacy.tCloseness(df, Seq("g"), col("s"), t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("t_emd"), r.getAs[Boolean]("passed")))).toMap
    assert(out("A") == ((0.333333333, false)), s"A=${out("A")}")
    assert(out("B") == ((0.333333333, false)), s"B=${out("B")}")
    // identical per-class distributions: t = 0, passes any threshold
    val same = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "s")
    val rs = Privacy.tCloseness(same, Seq("g"), col("s"), t = 0.01)
      .collect()
    assert(rs.forall(r => r.getAs[Double]("t_emd") == 0.0 &&
      r.getAs[Boolean]("passed")))
    // null sensitive values are excluded, not counted as a bucket
    val withNull = Seq(("A", Some(1.0)), ("A", None), ("B", Some(2.0)))
      .toDF("g", "s")
    val rn = Privacy.tCloseness(withNull, Seq("g"), col("s"), t = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(rn == Map("A" -> 1L, "B" -> 1L))
    // constant sensitive attribute and oversize domains fail loudly
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(Seq(("A", 5.0), ("B", 5.0)).toDF("g", "s"),
        Seq("g"), col("s"), t = 0.5)
    }
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(
        (1 to 50).map(i => ("A", i.toDouble)).toDF("g", "s"),
        Seq("g"), col("s"), t = 0.5, maxDomain = 10)
    }
  }
}
