package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained unigram-LM tokenizer model: natural-log piece probabilities.
  * Top-level class (not nested in the companion) so whole-stage codegen
  * can name it in generated Java. Unknown characters at apply time
  * segment as single-char pieces at `unkLogp` (floor), so tokenization
  * is total and lossless within words. */
final case class UnigramModel(logp: Map[String, Double], maxPieceLen: Int)
    extends Serializable {

  val unkLogp: Double =
    if (logp.isEmpty) -100.0 else logp.values.min - 10.0

  /** Maximum-likelihood segmentation of one word. The DP runs over CODE
    * POINTS, not UTF-16 units — a lone-surrogate "piece" is not a valid
    * string, and UTF8String would mangle it to '?', breaking the lossless
    * contract on any astral character (emoji, rare CJK). Ties break
    * toward the LONGER final piece (we scan candidate split points
    * ascending and only improve on a strictly better score), so the
    * result is a pure function of (word, model). */
  def viterbi(word: String): Array[String] = {
    val cps = UnigramModel.codePoints(word)
    val n = cps.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - math.max(maxPieceLen, 1))
      while (j < i) {
        val piece = cps.slice(j, i).mkString
        val lp =
          if (i - j == 1) logp.getOrElse(piece, unkLogp)
          else logp.getOrElse(piece, Double.NegativeInfinity)
        if (lp > Double.NegativeInfinity) {
          val score = best(j) + lp
          if (score > best(i)) { best(i) = score; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += cps.slice(back(k), k).mkString; k = back(k) }
    out.reverseIterator.toArray
  }

  /** Whitespace-split the text and Viterbi each word; pieces of
    * consecutive words are contiguous, so concat(pieces) == the text
    * with whitespace removed (lossless within words — gate-asserted). */
  def tokenizeText(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).flatMap(viterbi)

  /** Called directly from generated Java — must stay public. */
  def tokenizeArrayData(s: UTF8String): ArrayData =
    new GenericArrayData(
      tokenizeText(s.toString).map(UTF8String.fromString(_)))
}

object UnigramModel {
  /** The word as whole code points (surrogate pairs stay together). */
  private[ops] def codePoints(word: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }
}

/** Unigram language-model tokenizer (Kudo 2018, SentencePiece's unigram
  * mode — public) — the second tokenizer family next to byte-level BPE
  * ([[graft.functions.Bpe]]): instead of greedy merges, a probability is
  * learned per piece and a word segments into its maximum-likelihood
  * piece sequence (Viterbi over the segmentation lattice). The practical
  * training trick used by every wordpiece-style trainer applies: EM runs
  * over the DISTINCT-WORD frequency table, not the corpus — the corpus
  * is scanned once, distributed, to build word counts; the vocabulary-
  * sized EM then runs on the driver (same economics as the BPE trainer's
  * bounded collect and the PQ codebook fit).
  *
  * Deviations from full SentencePiece, documented: word-internal pieces
  * only (no cross-word pieces, no ▁ marker — application is
  * WordPiece-shaped); pruning is one-shot by expected count (Kudo prunes
  * iteratively by loss delta); EM is a fixed iteration count. Every step
  * is deterministic: seeds and pruning rank by (count desc, piece), the
  * Viterbi tie-break is fixed, so two fits over the same counts produce
  * identical vocabularies and segmentations.
  *
  * Scale shape: training = one distributed word-count aggregation +
  * driver EM over ≤ `maxWords` rows (bounded LOUDLY); application = the
  * native codegen'd [[UnigramTokenize]] expression — the model rides the
  * plan as a reference object, one narrow map, streaming-safe.
  */
object UnigramLm {

  type Model = UnigramModel

  /** Distributed whitespace word counts — the only corpus-sized pass. */
  def wordCounts(df: DataFrame, textCol: String,
      minWordCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions._
    val counted = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
    if (minWordCount <= 1L) counted
    else counted.filter(col("n") >= minWordCount)
  }

  /** Driver EM over a (word, frequency) table. Fully deterministic. */
  def train(words: Map[String, Long], vocabSize: Int,
      maxPieceLen: Int = 6, emIters: Int = 4,
      seedFactor: Int = 4): Model = {
    require(vocabSize >= 2 && maxPieceLen >= 1 && emIters >= 1)
    require(words.nonEmpty, "empty word-frequency table")
    val wordSeq = words.toVector.sortBy(_._1)
    val wordCps = wordSeq.map { case (w, n) => (UnigramModel.codePoints(w), n) }
    // single CODE POINTS: the coverage floor keeping every word segmentable
    val chars: Set[String] = wordCps.flatMap(_._1).toSet
    // seed vocabulary: code-point substring counts, top seedFactor·vocabSize
    val subCounts = mutable.HashMap.empty[String, Long]
    for ((w, n) <- wordCps; j <- 0 until w.length;
         i <- (j + 1) to math.min(w.length, j + maxPieceLen))
      subCounts.updateWith(w.slice(j, i).mkString)(c => Some(c.getOrElse(0L) + n))
    val seeds: Set[String] = chars ++ subCounts.toSeq
      .filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedFactor * vocabSize - chars.size))
      .map(_._1)
    var model = normalize(
      seeds.toSeq.map(p => p -> subCounts.getOrElse(p, 1L).toDouble).toMap,
      maxPieceLen)

    def emStep(m: Model): Map[String, Double] = {
      val ec = mutable.HashMap.empty[String, Double]
      for ((w, n) <- wordSeq; (p, c) <- expectedCounts(w, m))
        ec.updateWith(p)(v => Some(v.getOrElse(0.0) + c * n))
      ec.toMap
    }

    for (_ <- 1 to emIters) model = normalize(emStep(model), maxPieceLen)
    // one-shot prune: all chars + the (vocabSize − |chars|) heaviest pieces
    val ec = emStep(model)
    val kept: Set[String] = chars ++ ec.toSeq
      .filter { case (p, _) => p.length > 1 }
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size))
      .map(_._1)
    model = normalize(
      ec.filter { case (p, _) => kept(p) } ++
        chars.map(c => c -> math.max(ec.getOrElse(c, 0.0), 1e-12)).toMap,
      maxPieceLen)
    // settle probabilities on the pruned vocabulary
    for (_ <- 1 to 2) model = normalize(emStep(model), maxPieceLen)
    model
  }

  private def normalize(
      counts: Map[String, Double], maxPieceLen: Int): Model = {
    val floored = counts.map { case (p, c) => p -> math.max(c, 1e-12) }
    val total = floored.values.sum
    UnigramModel(
      floored.map { case (p, c) => p -> math.log(c / total) }, maxPieceLen)
  }

  /** Forward–backward expected piece counts for one word, in log space
    * (per-word lattices are tiny; this is driver-side EM). */
  private def expectedCounts(word: String, m: Model): Map[String, Double] = {
    val cps = UnigramModel.codePoints(word)
    val n = cps.length
    if (n == 0) return Map.empty
    def lp(j: Int, i: Int): Double = {
      val piece = cps.slice(j, i).mkString
      if (i - j == 1) m.logp.getOrElse(piece, m.unkLogp)
      else m.logp.getOrElse(piece, Double.NegativeInfinity)
    }
    def logsum(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else {
        val hi = math.max(a, b)
        hi + math.log1p(math.exp(math.min(a, b) - hi))
      }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0; beta(n) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - m.maxPieceLen) until i)
      alpha(i) = logsum(alpha(i), alpha(j) + lp(j, i))
    for (j <- (n - 1) to 0 by -1;
         i <- (j + 1) to math.min(n, j + m.maxPieceLen))
      beta(j) = logsum(beta(j), lp(j, i) + beta(i))
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Map.empty
    val out = mutable.HashMap.empty[String, Double]
    for (j <- 0 until n; i <- (j + 1) to math.min(n, j + m.maxPieceLen)) {
      val l = lp(j, i)
      if (l > Double.NegativeInfinity) {
        val post = math.exp(alpha(j) + l + beta(i) - z)
        if (post > 0.0)
          out.updateWith(cps.slice(j, i).mkString)(
            v => Some(v.getOrElse(0.0) + post))
      }
    }
    out.toMap
  }

  /** Distributed word counts → driver EM. The collect is vocabulary-table
    * sized and bounded LOUDLY (same contract as `Bpe.trainOn`): the limit
    * caps the transfer before it happens and the error names the knob. */
  def trainOn(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, emIters: Int = 4, minWordCount: Long = 1L,
      maxWords: Int = 1000000): Model = {
    val rows = wordCounts(df, textCol, minWordCount)
      .limit(maxWords + 1).collect()
    require(rows.length <= maxWords,
      s"corpus has more than $maxWords distinct words; raise minWordCount " +
        "(drops the singleton tail) or maxWords")
    train(rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      vocabSize, maxPieceLen, emIters)
  }

  /** Distributed apply: the model rides the plan as a reference object
    * inside a native codegen'd expression — one narrow map. */
  /** Persist the model as a tiny parquet table (piece, logp,
    * max_piece_len) — the interchange twin of the BPE merges fixture:
    * any parquet reader can rebuild the tokenizer. */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.logp.toSeq.sortBy(_._1)
      .map { case (p, lp) => (p, lp, model.maxPieceLen) }
      .toDF("piece", "logp", "max_piece_len")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveModel]]. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("piece", "logp", "max_piece_len").collect()
    require(rows.nonEmpty, s"no pieces at $path")
    val lens = rows.map(_.getInt(2)).distinct
    require(lens.length == 1,
      s"inconsistent max_piece_len at $path: ${lens.mkString(",")}")
    UnigramModel(
      rows.map(r => r.getString(0) -> r.getDouble(1)).toMap, lens.head)
  }

  private val tokenizeSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def tokenize(spark: SparkSession, c: Column, model: Model): Column = {
    // a fresh sequence number per registration: identityHashCode can
    // collide between live models and would silently rebind the name for
    // plans that re-resolve; registry growth is one entry per model
    // actually tokenized with — bounded by models built in the session
    val n = s"graft_unigram_${tokenizeSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      n, exprs => UnigramTokenize(exprs.head, model), "built-in")
    org.apache.spark.sql.functions.call_function(n, c)
  }
}

/** Viterbi-tokenize a string column into its piece array. */
case class UnigramTokenize(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"unigram_tokenize needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    model.tokenizeArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"$m.tokenizeArrayData($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenize =
    copy(child = newChild)
}
