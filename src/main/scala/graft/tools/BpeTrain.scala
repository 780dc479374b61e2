package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Bpe, BpeTokenizer}

/** Trains the checked-in BPE merges fixture
  * (`src/main/resources/graft/bpe/merges.txt`) so its provenance is
  * reproducible from source (dev tool, run manually).
  *
  * Corpus: `/root/testdata/sf0.001/documents.parquet` text. Pieces come
  * from the SAME lossless pre-split the tokenizer uses; the pair-merge
  * loop is [[Bpe.train]] (deterministic: max count, ties to the
  * lexicographically smallest pair). Prints the content hash and a few
  * pinned encodings for the spec/gate literals.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-bpe-train")
    val maxMerges = args.lift(1).map(_.toInt).getOrElse(512)
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))

    val splitter = java.util.regex.Pattern.compile(Bpe.LosslessSplitPattern)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- texts) {
      val m = splitter.matcher(t)
      while (m.find())
        counts.updateWith(m.group())(c => Some(c.getOrElse(0L) + 1L))
    }
    println(s"[bpe-train] ${texts.length} docs, ${counts.size} distinct pieces")

    val merges = Bpe.train(counts.toMap, maxMerges)
    val header =
      s"""graft BPE merges fixture — trained by tools/BpeTrain (deterministic).
         |corpus: /root/testdata/sf0.001/documents.parquet (text column)
         |pre-split: Bpe.LosslessSplitPattern; merges: ${merges.length}; min pair count: 2""".stripMargin
    val out = Paths.get(args.headOption
      .getOrElse("src/main/resources/graft/bpe/merges.txt"))
    Files.createDirectories(out.getParent)
    Files.write(out, Bpe.renderMerges(header, merges).getBytes(UTF_8))
    println(s"[bpe-train] wrote ${merges.length} merges to $out")

    val tok = new BpeTokenizer(merges)
    println(s"[bpe-train] contentHash=${tok.contentHash} vocab=${tok.vocabSize}")
    for (s <- Seq(
        "the fast table scan", "spark  join\nmerge", "a",
        "naïve café 🚀", "")) {
      val ids = tok.encode(s)
      val rt = tok.decode(ids) == s
      println(s"[bpe-train] pin ${s.replace("\n", "\\n")} -> " +
        s"${ids.mkString("Array(", ", ", ")")} roundtrip=$rt")
    }
    spark.stop()
  }
}
