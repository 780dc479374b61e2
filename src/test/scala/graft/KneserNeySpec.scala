package graft

import graft.ops.LanguageModel

/** Interpolated Kneser–Ney: hand-computed toy probabilities, the exact
  * normalization invariant the add-one continuation buys, OOV behavior,
  * and the CCNet tercile bucketing. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // corpus tokens: a b a b a c → bigrams ab×2, ba×2, ac×1
  // B = 3 types, V = 3, n1 = 1 (ac), n2 = 2 (ab, ba) → D = 1/5 = 0.2
  // cw(a) = 3, fanout(a) = 2; cw(b) = 2, fanout(b) = 1
  // nc(a) = 1 (ba), nc(b) = 1 (ab), nc(c) = 1 (ac); pc(w) = (nc+1)/6
  private def toyModel() = {
    val corpus = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    LanguageModel.trainKneserNey(corpus, "text")
  }

  private def probe(lm: LanguageModel.KneserNey, text: String): Double = {
    val doc = Seq((1L, text)).toDF("doc_id", "text")
    val r = LanguageModel.scoreKneserNey(lm, doc, "doc_id", "text").head()
    r.getAs[Double]("logprob")
  }

  test("trained scalars match the hand count") {
    val lm = toyModel()
    assert(lm.bigramTypes == 3L)
    assert(lm.vocabSize == 3L)
    assert(math.abs(lm.discount - 0.2) < 1e-15)
  }

  test("hand-computed probabilities: seen, backoff, OOV context, OOV word") {
    val lm = toyModel()
    def check(text: String, expected: Double): Unit = {
      val lp = probe(lm, text)
      assert(math.abs(lp - math.log(expected)) < 1e-5,
        s"'$text': got lp=$lp want ln($expected)=${math.log(expected)}")
    }
    check("a b", 1.8 / 3 + 0.2 * 2 / 3 * (2.0 / 6))     // seen bigram
    check("b a", 1.8 / 2 + 0.2 * 1 / 2 * (2.0 / 6))     // seen bigram
    check("a a", 0.2 * 2 / 3 * (2.0 / 6))               // backoff within ctx
    check("z a", 2.0 / 6)                               // OOV context
    check("a z", 0.2 * 2 / 3 * (1.0 / 6))               // OOV continuation
  }

  test("conditional sums to exactly 1 over the training vocab") {
    val lm = toyModel()
    for (ctx <- Seq("a", "b")) {
      val total = Seq("a", "b", "c")
        .map(w => math.exp(probe(lm, s"$ctx $w"))).sum
      // probe logprobs are 6-rounded, so the sum carries ~1e-6 noise
      assert(math.abs(total - 1.0) < 1e-4,
        s"sum p(.|$ctx) = $total, expected 1.0")
    }
  }

  test("degenerate inputs: short docs, empty corpus") {
    val lm = toyModel()
    val short = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val rows = LanguageModel.scoreKneserNey(lm, short, "doc_id", "text")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_bigrams") == 0L &&
      rows(0).getAs[Double]("logprob") == 0.0 &&
      rows(0).getAs[Double]("perplexity") == 1.0)
    assert(rows(1).getAs[Long]("n_bigrams") == 0L)
    assert(rows(2).getAs[Long]("n_bigrams") == 1L)
    // empty corpus: D = 0, B = V = 0, every score finite (floor at 1)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val lmE = LanguageModel.trainKneserNey(empty, "text")
    assert(lmE.discount == 0.0 && lmE.bigramTypes == 0L)
    val scored = LanguageModel.scoreKneserNey(lmE,
      Seq((1L, "x y")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(!scored.getAs[Double]("logprob").isNaN &&
      !scored.getAs[Double]("logprob").isInfinite)
  }

  test("ccnet buckets: per-language terciles, head = lowest perplexity") {
    // 6 docs per lang with clearly separated repetitiveness so the
    // self-trained model orders them deterministically
    val docs = (0 until 6).flatMap { i =>
      Seq((i.toLong, "en", ("common words " * (i + 1)) + s"rare$i token$i"),
        (10L + i, "fr", ("mots communs " * (i + 1)) + s"rare$i jeton$i"))
    }.toDF("doc_id", "lang", "text")
    val out = LanguageModel.ccnetBuckets(docs, "doc_id", "text", "lang")
    val counts = out.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("en", "fr"); b <- Seq("head", "middle", "tail"))
      assert(counts((l, b)) == 2L, s"$l/$b: ${counts.get((l, b))}")
    // within each lang, every head ppl <= every tail ppl
    val byLang = out.collect().groupBy(_.getAs[String]("lang"))
    byLang.values.foreach { rows =>
      val head = rows.filter(_.getAs[String]("bucket") == "head")
        .map(_.getAs[Double]("perplexity")).max
      val tail = rows.filter(_.getAs[String]("bucket") == "tail")
        .map(_.getAs[Double]("perplexity")).min
      assert(head <= tail)
    }
  }

  test("fused self-score equals the unfused train->score composition") {
    // selfScoreKneserNey (r19) precomputes ln p per bigram TYPE and joins
    // instances once; this pins it row-for-row against the general
    // scoreKneserNey over the same trained model — the unfused form whose
    // per-instance arithmetic it claims to replicate bit-identically
    // (coverage is total in self-score: every instance is a type).
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "b a c a"),
      (3L, "single"),
      (4L, ""),
      (5L, "c c c b")).toDF("doc_id", "text")
    val fused = LanguageModel.selfScoreKneserNey(docs, "doc_id", "text")
      .orderBy("id").collect()
    val lm = LanguageModel.trainKneserNey(docs, "text")
    val unfused = LanguageModel.scoreKneserNey(lm, docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(fused.length == unfused.length)
    fused.zip(unfused).foreach { case (f, u) =>
      assert(f.getAs[Long]("id") == u.getAs[Long]("id"))
      assert(f.getAs[Long]("n_bigrams") == u.getAs[Long]("n_bigrams"))
      assert(f.getAs[Double]("logprob") == u.getAs[Double]("logprob"),
        s"logprob diverged for id ${f.getAs[Long]("id")}")
      assert(f.getAs[Double]("perplexity") == u.getAs[Double]("perplexity"))
    }
  }
}
