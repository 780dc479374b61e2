package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-level BPE — iterative pair merges against a trained merges
  * table, not the pre-split piece-count heuristic
  * ([[graft.ops.TextOps.bpePieces]] remains the cheap estimator; this is
  * the exact tokenizer that token budgets should run on).
  *
  * Design (GPT-2 lineage, public: Radford et al. 2019 + the published
  * encoder):
  *  - every byte maps to a printable unicode symbol (so merges operate on
  *    visible strings and any byte sequence is representable),
  *  - text pre-splits on a LOSSLESS RE2-safe pattern
  *    ([[Bpe.LosslessSplitPattern]]: the graft pre-tokenizer plus a `\s+`
  *    catch-all — no lookahead, whitespace runs become pieces instead of
  *    being dropped, so encode∘decode is the identity on any string; this
  *    is the documented deviation from GPT-2's lookahead-based split),
  *  - per piece, the lowest-rank adjacent pair merges first, repeatedly,
  *    until no pair is in the table (the canonical BPE apply; equivalent
  *    to replaying merges in training order — the spec checks this
  *    equivalence against an independently-written rank-order encoder),
  *  - ids: 0–255 are raw bytes, 256+i is merge i's result. Vocab is
  *    DERIVED from the merges table — one fixture file, no drift.
  *
  * Scale shape: the tokenizer ships to executors as a plan reference
  * (`ctx.addReferenceObj`, a few MB even for a 50k-merge vocab — the same
  * mechanism every literal-heavy plan uses), initialization is once per
  * plan, per-piece results memoize in a bounded per-JVM cache (Zipf makes
  * the hit rate extreme), and encoding is stateless per row — fully
  * map-side, fused into the scan, no shuffle. Training is driver-side on
  * a bounded sample ([[Bpe.train]]), the same economics as the PQ
  * codebook fit ([[graft.ops.Pq]]).
  */
object Bpe {

  /** [[graft.ops.TextOps.BpePiecePattern]] + a whitespace-run catch-all:
    * every character lands in exactly one piece → lossless. */
  val LosslessSplitPattern: String =
    graft.ops.TextOps.BpePiecePattern + "|\\s+"

  /** GPT-2's byte→printable-unicode table: printable latin-1 bytes map to
    * themselves, the rest shift to 256+k — bijective, so decode is exact. */
  private[functions] val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val printable =
      (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).toSet
    var shift = 0
    for (b <- 0 until 256) {
      if (printable.contains(b.toChar)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }

  private[functions] val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Byte-mapped symbol string of a piece. */
  private[functions] def toSymbols(piece: String): Array[String] = {
    val bytes = piece.getBytes(UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteToChar(bytes(i) & 0xff)); i += 1
    }
    out
  }

  /** Train a merges table on piece counts: repeatedly merge the most
    * frequent adjacent symbol pair (count ≥ `minCount`), ties broken on
    * the lexicographically smallest (left, right) — fully deterministic
    * for a given multiset of pieces, independent of input order. Runs on
    * the driver over a bounded sample (the 100 TB path: sample → train
    * here → apply distributed). */
  def train(
      pieceCounts: Map[String, Long], maxMerges: Int,
      minCount: Long = 2L): Array[(String, String)] = {
    var words: Vector[(Array[String], Long)] =
      pieceCounts.toVector.sortBy(_._1).map { case (p, n) => (toSymbols(p), n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < maxMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((w, n) <- words; i <- 0 until w.length - 1)
        pairCounts.updateWith((w(i), w(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (pairCounts.isEmpty) continue = false
      else {
        val (best, cnt) = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < minCount) continue = false
        else {
          merges += best
          words = words.map { case (w, n) => (mergeAll(w, best._1, best._2), n) }
        }
      }
    }
    merges.toArray
  }

  private[functions] def mergeAll(
      w: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < w.length) {
      if (j < w.length - 1 && w(j) == l && w(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += w(j); j += 1 }
    }
    out.toArray
  }

  /** Parse merges.txt content (lines of "left right"; `#` lines are
    * comments — the header records provenance). */
  def parseMerges(lines: Iterator[String]): Array[(String, String)] =
    lines.map(_.stripLineEnd).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"bad merges line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toArray

  def renderMerges(header: String, merges: Array[(String, String)]): String =
    (header.linesIterator.map("# " + _) ++
      merges.iterator.map { case (l, r) => s"$l $r" }).mkString("", "\n", "\n")

  /** Distributed piece counting — the ONE corpus pass of BPE training:
    * lossless pre-split (regexp extraction, codegen'd) → explode →
    * groupBy(piece). The result is VOCABULARY-sized (distinct pre-split
    * pieces, heavy-tailed — ~10^5–10^7 rows even for web-scale corpora),
    * not corpus-sized; this is the table the merge loop actually needs.
    * `minPieceCount` drops the singleton junk tail (the standard lossy
    * knob at 100 TB — a dropped piece's pair counts are lost, so the
    * default keeps everything for exactness). */
  def pieceCounts(
      df: DataFrame, textCol: String, minPieceCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions._
    val counted = df
      .select(explode(regexp_extract_all(
        col(textCol).cast("string"),
        lit(LosslessSplitPattern), lit(0))).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n"))
    if (minPieceCount <= 1L) counted else counted.filter(col("n") >= minPieceCount)
  }

  /** Train a merges table on a corpus DataFrame: distributed
    * [[pieceCounts]], then the SAME deterministic merge loop as [[train]]
    * over the collected (piece, count) table — byte-identical merges to
    * driver-side counting (spec-pinned), but the corpus is scanned
    * distributed, once. The collect is vocabulary-sized (PQ-codebook
    * economics), bounded LOUDLY by `maxPieces`: `limit(maxPieces + 1)`
    * caps the transfer before it happens, and the `require` names the
    * knob to turn (`minPieceCount`) instead of OOMing the driver. */
  def trainOn(
      df: DataFrame, textCol: String, maxMerges: Int, minCount: Long = 2L,
      minPieceCount: Long = 1L,
      maxPieces: Int = 10000000): Array[(String, String)] = {
    val rows = pieceCounts(df, textCol, minPieceCount)
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"corpus has more than $maxPieces distinct pre-split pieces; raise " +
        "minPieceCount (drops the singleton tail) or maxPieces")
    train(rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      maxMerges, minCount)
  }

  @volatile private var resourceCache = Map.empty[String, BpeTokenizer]

  /** Tokenizer from a classpath resource (the checked-in fixture rides the
    * application jar to every executor). Cached per path. */
  def fromResource(path: String = "graft/bpe/merges.txt"): BpeTokenizer =
    resourceCache.getOrElse(path, {
      val in = getClass.getClassLoader.getResourceAsStream(path)
      require(in != null, s"BPE merges resource not found: $path")
      val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val tok = new BpeTokenizer(parseMerges(text.linesIterator))
      synchronized { resourceCache += path -> tok }
      tok
    })

  /** Tokenizer from a merges TABLE (columns: left, right, rank) — the
    * "provided merges/vocab table" path. The collect is bounded by vocab
    * size (≤ ~10^5 rows for any real tokenizer), the classic
    * driver-side-codebook shape. */
  def fromDataFrame(
      merges: DataFrame, leftCol: String = "left", rightCol: String = "right",
      rankCol: String = "rank"): BpeTokenizer = {
    import org.apache.spark.sql.functions.col
    val rows = merges.select(col(leftCol), col(rightCol), col(rankCol))
      .orderBy(rankCol).collect()
    new BpeTokenizer(rows.map(r => (r.getString(0), r.getString(1))))
  }

  private def fname(prefix: String, tok: BpeTokenizer): String =
    s"graft_${prefix}_${tok.contentHash}"

  /** `array<int>` of real BPE token ids for a string column. */
  def encodeIds(spark: SparkSession, c: Column, tok: BpeTokenizer): Column = {
    val n = fname("bpe_encode", tok)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      n, exprs => BpeEncode(exprs.head, tok), "built-in")
    call_function(n, c)
  }

  /** Exact decode of [[encodeIds]] output back to the original string. */
  def decodeIds(spark: SparkSession, c: Column, tok: BpeTokenizer): Column = {
    val n = fname("bpe_decode", tok)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      n, exprs => BpeDecode(exprs.head, tok), "built-in")
    call_function(n, c)
  }

  /** Real BPE token count — the number that should gate token budgets
    * ([[graft.ops.Sampling.packByBudget]], corpus cards). */
  def tokenCount(spark: SparkSession, c: Column, tok: BpeTokenizer): Column =
    org.apache.spark.sql.functions.size(encodeIds(spark, c, tok))

  /** Corpus vocabulary-utilization histogram over REAL BPE ids: encode
    * map-side (codegen'd), explode, ONE groupBy over ids — at most
    * `vocabSize` groups regardless of corpus size — then the printable
    * symbol text joins in from a broadcast vocab table, unused ids kept
    * at n = 0. The view a tokenizer owner reads before retraining: which
    * merges earn their slots on THIS corpus. */
  def tokenFrequencies(
      spark: SparkSession, df: DataFrame, textCol: String,
      tok: BpeTokenizer): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val counts = df
      .select(explode(encodeIds(spark, col(textCol), tok)).as("token_id"))
      .groupBy("token_id").agg(count(lit(1)).as("n"))
    val vocab = (0 until tok.vocabSize)
      .map(i => (i, tok.symbolOf(i))).toDF("token_id", "symbol")
    vocab.join(counts, Seq("token_id"), "left")
      .select(col("token_id"), col("symbol"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}

/** A trained byte-level BPE tokenizer: merges ranks + derived vocab.
  * Serializable (ships as a plan reference); caches and derived maps are
  * transient and rebuild lazily per JVM. */
final class BpeTokenizer(
    val merges: Array[(String, String)]) extends Serializable {

  /** Stable content hash (for function-registry names and fixture pins). */
  lazy val contentHash: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (l, r) =>
      md.update(l.getBytes(UTF_8)); md.update(0x1f.toByte)
      md.update(r.getBytes(UTF_8)); md.update(0x1e.toByte)
    }
    md.digest().take(6).map("%02x".format(_)).mkString
  }

  def vocabSize: Int = 256 + merges.length

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, i); i += 1
    }
    m
  }

  /** symbol string → id (bytes 0–255, then one per merge). */
  @transient private lazy val symbolId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](256 + merges.length * 2)
    var b = 0
    while (b < 256) {
      m.put(String.valueOf(Bpe.byteToChar(b)), b); b += 1
    }
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + merges(i)._2, 256 + i); i += 1
    }
    m
  }

  /** Printable symbol text of an id (the byte-mapped alphabet — always
    * renderable, unlike a raw single-id byte decode, which may be a
    * partial UTF-8 sequence). */
  def symbolOf(id: Int): String = idSymbol(id)

  /** id → symbol string. */
  @transient private lazy val idSymbol: Array[String] = {
    val out = new Array[String](vocabSize)
    var b = 0
    while (b < 256) { out(b) = String.valueOf(Bpe.byteToChar(b)); b += 1 }
    var i = 0
    while (i < merges.length) {
      out(256 + i) = merges(i)._1 + merges(i)._2; i += 1
    }
    out
  }

  private val MaxCacheEntries = 65536
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  @transient private lazy val splitter =
    java.util.regex.Pattern.compile(Bpe.LosslessSplitPattern)

  /** Canonical BPE apply to one pre-split piece: merge the lowest-rank
    * adjacent pair, repeat. Memoized (bounded; cleared when full — hot
    * pieces repopulate immediately under Zipf). */
  def encodePiece(piece: String): Array[Int] = {
    val hit = cache.get(piece)
    if (hit != null) return hit
    var word = Bpe.toSymbols(piece)
    var done = word.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < word.length - 1) {
        val r = ranks.get(word(i) + " " + word(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = merges(bestRank)
        word = Bpe.mergeAll(word, l, r)
        done = word.length < 2
      }
    }
    val out = new Array[Int](word.length)
    var j = 0
    while (j < word.length) { out(j) = symbolId.get(word(j)); j += 1 }
    if (cache.size >= MaxCacheEntries) cache.clear()
    if (piece.length <= 64) cache.put(piece, out)
    out
  }

  def encode(text: String): Array[Int] = {
    val m = splitter.matcher(text)
    val out = mutable.ArrayBuilder.make[Int]
    while (m.find()) out ++= encodePiece(m.group())
    out.result()
  }

  def decode(ids: Array[Int]): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ids.length) { sb.append(idSymbol(ids(i))); i += 1 }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var j = 0
    while (j < s.length) { bytes(j) = Bpe.charToByte(s.charAt(j)); j += 1 }
    new String(bytes, UTF_8)
  }

  /** Static-shaped helpers shared by interpreted eval and generated code. */
  def encodeArrayData(s: UTF8String): ArrayData =
    ArrayData.toArrayData(encode(s.toString))

  def decodeUTF8(a: ArrayData): UTF8String =
    UTF8String.fromString(decode(a.toIntArray()))
}

/** `array<int>` of BPE ids — native expression; codegen calls the plan-
  * referenced tokenizer directly, keeping the scan inside whole-stage
  * codegen. */
case class BpeEncode(child: Expression, tokenizer: BpeTokenizer)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"bpe_encode needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    tokenizer.encodeArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("bpeTokenizer", tokenizer,
      classOf[BpeTokenizer].getName)
    defineCodeGen(ctx, ev, c => s"$tok.encodeArrayData($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Exact inverse of [[BpeEncode]] (byte-level BPE is bijective). */
case class BpeDecode(child: Expression, tokenizer: BpeTokenizer)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"bpe_decode needs ARRAY<INT>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    tokenizer.decodeUTF8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("bpeTokenizer", tokenizer,
      classOf[BpeTokenizer].getName)
    defineCodeGen(ctx, ev, c => s"$tok.decodeUTF8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecode =
    copy(child = newChild)
}
