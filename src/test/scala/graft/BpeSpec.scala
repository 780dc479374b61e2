package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeTokenizer}
import graft.ops.Sampling

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tok = Bpe.fromResource()
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // ---- independent reference implementation (differential test) ----
  // Different byte map construction (direct codepoint arithmetic instead of
  // a printable-set scan) and a different apply strategy: replay the merges
  // IN TRAINING ORDER over the whole symbol list, instead of repeatedly
  // taking the min-rank adjacent pair. The two are equivalent for any valid
  // BPE merges table (a merge at rank r only ever produces symbols that
  // participate in later-rank merges).
  private lazy val refByteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var extra = 0
    for (b <- 0 until 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xa1 && b <= 0xac) ||
        (b >= 0xae && b <= 0xff)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + extra).toChar; extra += 1 }
    }
    out
  }

  private def refEncode(text: String): Array[Int] = {
    val vocab = {
      val m = scala.collection.mutable.HashMap.empty[String, Int]
      for (b <- 0 until 256) m(refByteToChar(b).toString) = b
      for (((l, r), i) <- tok.merges.zipWithIndex) m(l + r) = 256 + i
      m
    }
    val pat = java.util.regex.Pattern.compile(Bpe.LosslessSplitPattern)
    val matcher = pat.matcher(text)
    val ids = Seq.newBuilder[Int]
    while (matcher.find()) {
      var syms: List[String] = matcher.group()
        .getBytes("UTF-8").map(b => refByteToChar(b & 0xff).toString).toList
      for ((l, r) <- tok.merges) {
        // one left-to-right pass replacing every (l, r) adjacency
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: t if a == l && b == r => out += (l + r); rest = t
          case a :: t => out += a; rest = t
          case Nil => ()
        }
        syms = out.toList
      }
      ids ++= syms.map(vocab)
    }
    ids.result().toArray
  }

  test("min-rank-first encoder matches rank-order replay on every fixture doc") {
    val texts = docs.select("text").as[String].collect()
    assert(texts.nonEmpty)
    for (t <- texts)
      assert(tok.encode(t).sameElements(refEncode(t)), s"diverged on: $t")
  }

  test("pinned fixture encodings (trained merges drift dies here too)") {
    assert(tok.encode("the fast table scan").sameElements(
      Array(116, 104, 101, 270, 266, 116, 271, 97, 98, 108, 101, 290)))
    assert(tok.encode("a").sameElements(Array(97)))
    assert(tok.encode("").isEmpty)
    assert(tok.encode("naïve café 🚀").sameElements(
      Array(110, 97, 195, 175, 118, 101, 267, 97, 102, 195, 169, 32, 240,
        159, 154, 128)))
  }

  test("encode/decode is the identity on adversarial strings") {
    val cases = Seq("", " ", "  \t\n ", "a  b", "word", "Ω≈ç√∫˜µ≤",
      "日本語テキスト", "🚀🚀 rockets", "tab\tsep\tvals\n", "'s 't mix'd",
      "1234 56.78 -9", "mixedCASE Words", "\u0000null byte\u0000")
    for (c <- cases) {
      val ids = tok.encode(c)
      assert(tok.decode(ids) == c, s"roundtrip failed on ${c.getBytes("UTF-8").mkString(",")}")
    }
  }

  test("Spark expression matches driver-side encode; codegen plan stays whole-stage") {
    val df = docs.select(col("doc_id"), col("text"),
      Bpe.encodeIds(spark, col("text"), tok).as("ids"),
      Bpe.decodeIds(spark, Bpe.encodeIds(spark, col("text"), tok), tok).as("rt"))
    val rows = df.collect()
    for (r <- rows) {
      val expected = tok.encode(r.getString(1))
      assert(r.getSeq[Int](2).toArray.sameElements(expected))
      assert(r.getString(3) == r.getString(1))
    }
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty,
      s"BPE fell out of codegen:\n${df.queryExecution.executedPlan}")
  }

  test("training is deterministic and independent of input order") {
    val pieces = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "west" -> 4L)
    val a = Bpe.train(pieces, maxMerges = 10)
    val b = Bpe.train(scala.util.Random.shuffle(pieces.toSeq).toMap, 10)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    // every merge must reference symbols producible by earlier merges/bytes
    val known = scala.collection.mutable.Set.empty[String]
    (0 until 256).foreach(bb => known += refByteToChar(bb).toString)
    for ((l, r) <- a) {
      assert(known.contains(l) && known.contains(r), s"dangling merge ($l,$r)")
      known += (l + r)
    }
  }

  test("packByBudget driven by REAL bpe counts: every bin within budget (+1 row slack)") {
    val budget = 200L
    val weighted = docs.select(col("doc_id"), col("text"))
      .withColumn("n_bpe", size(Bpe.encodeIds(spark, col("text"), tok)).cast("long"))
    val packed = Sampling.packByBudget(
      weighted, "n_bpe", budget, Seq("doc_id"), groups = 8)
    val bins = packed.groupBy("pack_group", "pack_seq")
      .agg(sum("n_bpe").as("w"), max("n_bpe").as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(bins.nonEmpty)
    for (b <- bins) {
      val (w, mx) = (b.getLong(2), b.getLong(3))
      assert(w <= budget + mx, s"bin overshoots beyond one-row slack: $b")
    }
    // real counts differ from the pre-split estimate somewhere (they gate
    // budgets differently) — if they never differed the fixture is trivial
    val diff = weighted
      .withColumn("est", graft.ops.TextOps.bpeTokenCount(col("text")).cast("long"))
      .filter(col("est") =!= col("n_bpe")).count()
    assert(diff > 0, "real BPE counts identical to pre-split estimate everywhere")
  }

  test("packSequences: fixed rows, pads only at bin tails, corpus decodes back") {
    val seqLen = 64
    val packed = Sampling.packSequences(
      docs, "doc_id", "text", tok, seqLen = seqLen, binBudget = 512,
      groups = 8).persist()
    val rows = packed.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Int](3).size == seqLen), "row length drift")
    // pads (n_real < seqLen) may appear ONLY in a bin's final row
    val byBin = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
    for ((_, rs) <- byBin) {
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.init.forall(_.getInt(4) == seqLen),
        "padding before a bin's last row")
    }
    // full roundtrip: per bin, drop padding, split on EOS, decode — the
    // multiset of decoded segments must be the corpus text multiset
    val eos = tok.vocabSize
    val decoded = byBin.values.flatMap { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      val flat = sorted.flatMap(r =>
        r.getSeq[Int](3).take(r.getInt(4)))
      // split on eos; every doc ends with one, so no trailing remainder
      val segs = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (id <- flat) {
        if (id == eos) { segs += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty[Int] }
        else cur += id
      }
      assert(cur.isEmpty, "bin stream did not end at an EOS")
      segs.map(tok.decode)
    }.toSeq
    val corpus = docs.select("text").as[String].collect().toSeq
    assert(decoded.sorted == corpus.sorted,
      s"packed stream does not decode back to the corpus " +
        s"(${decoded.size} segments vs ${corpus.size} docs)")
  }

  test("corpus card carries real token volume when a tokenizer is supplied") {
    val card = graft.ops.CorpusReport.bySource(docs,
      tokenizer = Some(tok)).collect()
    assert(card.nonEmpty)
    for (r <- card) {
      val est = r.getAs[Long]("n_tokens")
      val real = r.getAs[Long]("n_bpe_tokens")
      assert(real >= est, s"real BPE tokens < whitespace words for ${r.getString(0)}")
    }
  }

  test("doc_ids provenance: per-token ids reassemble every document exactly") {
    val eos = tok.vocabSize
    val packed = Sampling.packSequences(docs, "doc_id", "text", tok,
        seqLen = 48, binBudget = 256, groups = 8)
      .orderBy("pack_group", "pack_seq", "seq_index")
      .select("token_ids", "n_real_tokens", "doc_ids")
      .collect()
    // rebuild each document from ONLY its provenance-tagged tokens,
    // in stream order (documents straddle row boundaries)
    val byDoc = scala.collection.mutable.LinkedHashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    for (r <- packed) {
      val ids = r.getSeq[Int](0)
      val nReal = r.getInt(1)
      val dids = r.getSeq[Long](2)
      assert(dids.length == nReal, "doc_ids must cover exactly real tokens")
      for (i <- 0 until nReal)
        byDoc.getOrElseUpdate(dids(i),
          scala.collection.mutable.ArrayBuffer.empty[Int]) += ids(i)
    }
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(byDoc.keySet == texts.keySet, "provenance must cover every doc")
    for ((docId, toks) <- byDoc) {
      assert(toks.last == eos, s"doc $docId's final token must be its EOS")
      assert(tok.decode(toks.dropRight(1).toArray) == texts(docId),
        s"doc $docId did not reassemble from provenance-tagged tokens")
    }
  }

  test("distributed piece counting matches driver-side counting exactly") {
    val distributed = Bpe.pieceCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val splitter = java.util.regex.Pattern.compile(Bpe.LosslessSplitPattern)
    val local = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- docs.select("text").as[String].collect()) {
      val m = splitter.matcher(t)
      while (m.find())
        local.updateWith(m.group())(c => Some(c.getOrElse(0L) + 1L))
    }
    assert(distributed == local.toMap,
      s"piece count drift: distributed=${distributed.size} local=${local.size}")
    // minPieceCount drops exactly the below-threshold tail
    val floored = Bpe.pieceCounts(docs, "text", minPieceCount = 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(floored == local.filter(_._2 >= 3L).toMap)
  }

  test("distributed training reproduces the checked-in fixture byte-for-byte") {
    // the fixture header records its provenance: sf0.001 text, 64 merges,
    // min pair count 2 — trainOn with the same knobs must reproduce it,
    // closing the loop from distributed corpus scan to the shipped vocab
    val merges = Bpe.trainOn(docs, "text", maxMerges = 64)
    assert(merges.length == tok.merges.length,
      s"merge count drift: ${merges.length} vs fixture ${tok.merges.length}")
    val firstDiff = merges.zip(tok.merges).indexWhere { case (a, b) => a != b }
    assert(merges.sameElements(tok.merges),
      s"first divergent merge at rank $firstDiff")
    // the loud driver-transfer bound names the knob instead of OOMing
    val e = intercept[IllegalArgumentException] {
      Bpe.trainOn(docs, "text", maxMerges = 4, maxPieces = 10)
    }
    assert(e.getMessage.contains("minPieceCount"))
  }
}
