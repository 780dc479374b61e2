package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token summary statistics as ONE native codegen pass:
  * `struct(n_tokens, n_distinct, n_stop, sum_len)` over the tokens of
  * `trim(text)` split on `\s+` — the shared base of the text-quality
  * ratio columns ([[graft.ops.TextOps.distinctRatio]] /
  * `stopwordRatio` / `meanTokenLength` / `qualityScore`).
  *
  * Bit-compatible with the compositional form
  * `split(trim(c), "\\s+")` + `size` / `array_distinct` /
  * `filter(_.isin(stop))` / `aggregate(transform(_, length), 0L, _+_)`,
  * including the edge semantics ([[TokenBow]]'s documented quirks):
  *  - `trim` strips 0x20 spaces ONLY, so a leading tab/newline yields a
  *    LEADING EMPTY token (counted, length 0, distinct as "");
  *  - Spark's `split` is `Pattern.split(str, -1)`, which ALSO keeps the
  *    TRAILING empty token when the trimmed text ends in non-space
  *    whitespace (unlike Java's `String.split`) — replicated: pieces =
  *    separator matches + 1;
  *  - `\s` is ASCII-only (tab, LF, VT, FF, CR, space) — Unicode spaces
  *    are token bytes;
  *  - blank text → all-zero struct; token lengths count CHARACTERS
  *    (codepoints), not bytes, exactly like `length()`.
  *
  * Why native (r18): the quality gate projects four ratio columns whose
  * compositional forms each re-tokenize the text through interpreted
  * higher-order functions (~7 tokenizations per row after CollapseProject
  * inlining, none of them codegen). This expression runs once per row —
  * whole-stage codegen's common-subexpression elimination collapses the
  * four textually-repeated instances into one evaluation. */
case class TokenQualityStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  // java.util.HashSet of UTF8String compares by bytes — the same equality
  // `isin` applies to string literals
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Shared scanner: returns (nTokens, nDistinct, nStop, sumLen). */
  private def scan(t: UTF8String): (Int, Int, Int, Long) = {
    var nTokens = 0
    var nStop = 0
    var sumLen = 0L
    val distinct = new java.util.HashSet[UTF8String]()
    val n = t.numBytes
    if (n > 0) {
      val base = t.getBaseObject
      val off = t.getBaseOffset
      def ws(i: Int): Boolean = {
        val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
        b == 32 || (b >= 9 && b <= 13)
      }
      def take(start: Int, len: Int): Unit = {
        val tok = UTF8String.fromAddress(base, off + start, len)
        nTokens += 1
        sumLen += tok.numChars()
        if (stopSet.contains(tok)) nStop += 1
        distinct.add(tok)
        ()
      }
      // Pattern.split(str, -1): one piece before/after/between every
      // maximal \s+ run — leading AND trailing empties kept
      var i = 0
      var done = false
      while (!done) {
        val start = i
        while (i < n && !ws(i)) i += 1
        take(start, i - start)
        if (i == n) done = true
        else {
          while (i < n && ws(i)) i += 1
          if (i == n) { take(n, 0); done = true }
        }
      }
    }
    (nTokens, distinct.size, nStop, sumLen)
  }

  override def nullSafeEval(input: Any): Any = {
    val (nT, nD, nS, sL) = scan(input.asInstanceOf[UTF8String].trim())
    new GenericInternalRow(Array[Any](nT, nD, nS, sL))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the scanner is one tight loop either way; the codegen path simply
    // calls back into this instance so interp/codegen cannot drift, while
    // the expression still participates in whole-stage codegen (and its
    // common-subexpression elimination — the point of going native)
    val self = ctx.addReferenceObj("tokenStats", this,
      classOf[TokenQualityStats].getName)
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.nullSafeEval($str);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenQualityStats = copy(child = newChild)

  override def prettyName: String = "graft_token_stats"
}

object TokenQualityStats {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column form (fresh session function per distinct stop set — the
    * CharGramBow naming discipline). */
  def apply(spark: SparkSession, text: Column, stopWords: Seq[String]): Column = {
    val fname = s"graft_token_stats_${seq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => TokenQualityStats(exprs.head, stopWords), "built-in")
    org.apache.spark.sql.functions.call_function(fname, text)
  }
}
