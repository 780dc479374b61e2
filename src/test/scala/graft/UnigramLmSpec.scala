package graft

import org.apache.spark.sql.functions._

import graft.ops.{UnigramLm, UnigramModel}

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of a word into vocab pieces (unknown single chars
    * allowed at the floor) — the brute-force reference for Viterbi. */
  private def allSegs(word: String, m: UnigramModel): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Seq.empty)
    else (1 to math.min(word.length, m.maxPieceLen)).flatMap { l =>
      val piece = word.substring(0, l)
      val ok = m.logp.contains(piece) || l == 1
      if (!ok) Seq.empty
      else allSegs(word.substring(l), m).map(piece +: _)
    }

  private def segScore(seg: Seq[String], m: UnigramModel): Double =
    seg.map(p => m.logp.getOrElse(p, m.unkLogp)).sum

  test("viterbi equals brute-force maximum-likelihood segmentation") {
    // deterministic pseudo-random model over a 4-char alphabet
    val pieces = for {
      l <- 1 to 3
      s <- Seq("a", "b", "c", "d").flatMap(x =>
        if (l == 1) Seq(x)
        else Seq("ab", "bc", "cd", "abc", "bcd", "dab", "ca"))
      if s.length == l
    } yield s
    val logp = pieces.distinct.zipWithIndex.map { case (p, i) =>
      p -> (-1.0 - (i * 7 % 13) * 0.37)
    }.toMap
    val m = UnigramModel(logp, maxPieceLen = 3)
    val words = Seq("abcd", "aabb", "dabca", "abcabc", "dddd", "cabcd",
      "a", "abcdabc")
    for (w <- words) {
      val best = allSegs(w, m).maxBy(s => (segScore(s, m), -s.length))
      val got = m.viterbi(w).toSeq
      assert(segScore(got, m) == segScore(best, m),
        s"viterbi suboptimal on '$w': $got (${segScore(got, m)}) vs " +
          s"$best (${segScore(best, m)})")
      assert(got.mkString("") == w, s"lossy segmentation of '$w': $got")
    }
  }

  test("EM discovers the repeated unit and compresses it") {
    // a corpus whose words are built from 'xy': the trained model must
    // tokenize them into multi-char pieces, beating per-char splitting
    val words = Map("xyxy" -> 50L, "xyxyxy" -> 30L, "xy" -> 40L,
      "zq" -> 5L)
    val m = UnigramLm.train(words, vocabSize = 8, maxPieceLen = 4,
      emIters = 5)
    val segged = m.viterbi("xyxyxy")
    assert(segged.mkString("") == "xyxyxy")
    assert(segged.length < 6,
      s"no compression learned: 'xyxyxy' -> ${segged.toSeq}")
    // the dominant unit (or a multiple of it) is in the vocabulary
    assert(m.logp.keySet.exists(p => p.length > 1 && "xyxyxy".contains(p)))
  }

  test("unknown characters at apply time stay lossless as UNK chars") {
    val m = UnigramLm.train(Map("abc" -> 10L), vocabSize = 6,
      maxPieceLen = 3)
    assert(m.viterbi("ab9c").mkString("") == "ab9c")
    assert(m.tokenizeText("abc  ab9c\nzz").mkString("") == "abcab9czz")
  }

  test("astral characters (surrogate pairs) never split into lone surrogates") {
    // 🚀 and 𝕏 are outside the BMP: as UTF-16 they are surrogate PAIRS,
    // and a code-unit DP would emit lone-surrogate pieces that UTF8String
    // mangles to '?'
    val m = UnigramLm.train(Map("ab🚀cd" -> 5L, "𝕏y" -> 3L), vocabSize = 12,
      maxPieceLen = 3)
    for (w <- Seq("ab🚀cd", "𝕏y", "🚀🚀", "x🚀z")) {
      val pieces = m.viterbi(w)
      assert(pieces.mkString("") == w, s"lossy on '$w': ${pieces.toSeq}")
      // every piece is a well-formed string: unpaired surrogates do not
      // survive a UTF-8 round-trip (they become U+FFFD/'?')
      assert(pieces.forall(p =>
        new String(p.getBytes("UTF-8"), "UTF-8") == p),
        s"piece with a lone surrogate in ${pieces.toSeq}")
    }
    // and through the distributed expression round-trip
    val df = Seq((1L, "ab🚀cd x🚀z")).toDF("id", "text")
    val got = df.select(UnigramLm.tokenize(spark, col("text"), m))
      .as[Seq[String]].head()
    assert(got.mkString("") == "ab🚀cdx🚀z", s"expression mangled: $got")
  }

  test("model round-trips through parquet and tokenizes identically") {
    val m = UnigramLm.train(Map("alpha" -> 10L, "beta" -> 7L, "alphabet" -> 3L),
      vocabSize = 16, maxPieceLen = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram-model")
    try {
      val path = s"$dir/model"
      UnigramLm.saveModel(spark, m, path)
      val loaded = UnigramLm.loadModel(spark, path)
      assert(loaded.maxPieceLen == m.maxPieceLen)
      assert(loaded.logp == m.logp)
      for (w <- Seq("alpha", "alphabet", "betabet", "zz"))
        assert(loaded.viterbi(w).toSeq == m.viterbi(w).toSeq)
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("trainOn over the distributed corpus equals train over driver counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val driverCounts = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val a = UnigramLm.trainOn(docs, "text", vocabSize = 64, maxPieceLen = 5)
    val b = UnigramLm.train(driverCounts, vocabSize = 64, maxPieceLen = 5)
    assert(a.logp.keySet == b.logp.keySet, "vocabulary drift")
    assert(a.logp.forall { case (p, v) => math.abs(v - b.logp(p)) < 1e-12 })
    // repartition invariance (counts are exact, EM is deterministic)
    val c = UnigramLm.trainOn(docs.repartition(7), "text", vocabSize = 64,
      maxPieceLen = 5)
    assert(c.logp == a.logp)
  }

  test("distributed tokenize expression matches the driver model and is lossless") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val m = UnigramLm.trainOn(docs, "text", vocabSize = 128, maxPieceLen = 5)
    val got = docs
      .select(col("doc_id"), col("text"),
        UnigramLm.tokenize(spark, col("text"), m).as("pieces"))
      .collect()
    for (r <- got) {
      val text = r.getString(1)
      val pieces = r.getSeq[String](2)
      assert(pieces.mkString("") == text.split("\\s+").filter(_.nonEmpty)
        .mkString(""), s"lossy tokenization of doc ${r.getLong(0)}")
      assert(pieces.toArray.sameElements(m.tokenizeText(text)),
        s"expression drifted from the driver model on doc ${r.getLong(0)}")
    }
  }
}
