package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-script character counts of a string — ONE pass over code points
  * bucketing into the major Unicode script blocks — as a native Catalyst
  * expression with whole-stage codegen. The writing-system histogram is
  * the robust companion to n-gram language ID: n-gram profiles confuse
  * related languages and break on transliteration, while the script
  * histogram is exact and free (langid needs it as a prefilter — there is
  * no point scoring Cyrillic text against an English trigram table).
  *
  * Returns array<int> of counts in [[ScriptCounts.names]] order
  * (latin, cyrillic, greek, hebrew, arabic, devanagari, kana, cjk,
  * hangul, digit). Characters outside every range (punctuation, space,
  * astral-plane symbols) count in no bucket; the DuckDB oracle mirrors
  * each bucket as `length(regexp_replace(text, '[^class]', '', 'g'))`
  * with `\x{....}` ranges RE2 and java.util.regex both accept.
  *
  * Scale shape: stateless per-row map, no shuffle; surrogate pairs
  * advance by Character.charCount so astral input cannot desync the walk.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ScriptCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)

  override def prettyName: String = "script_counts"
}

object ScriptCounts {

  /** Bucket order — fixed public contract (gates and profiles index it). */
  val names: Seq[String] = Seq("latin", "cyrillic", "greek", "hebrew",
    "arabic", "devanagari", "kana", "cjk", "hangul", "digit")

  /** Inclusive code-point ranges per bucket, parallel to [[names]].
    * Latin = ASCII letters + Latin-1 letters + Extended-A/B; kana covers
    * hiragana + katakana; cjk is the BMP unified-ideograph block. */
  val ranges: Seq[Seq[(Int, Int)]] = Seq(
    Seq(('A'.toInt, 'Z'.toInt), ('a'.toInt, 'z'.toInt), (0xC0, 0x24F)),
    Seq((0x400, 0x4FF)),
    Seq((0x370, 0x3FF)),
    Seq((0x590, 0x5FF)),
    Seq((0x600, 0x6FF)),
    Seq((0x900, 0x97F)),
    Seq((0x3040, 0x30FF)),
    Seq((0x4E00, 0x9FFF)),
    Seq((0xAC00, 0xD7AF)),
    Seq(('0'.toInt, '9'.toInt)))

  /** The `[^...]` character class for bucket `i` in the `\x{....}` syntax
    * both java.util.regex and RE2 (DuckDB) accept — the oracle mirror. */
  def negatedClassRegex(i: Int): String =
    "[^" + ranges(i).map { case (lo, hi) =>
      f"\\x{$lo%04X}-\\x{$hi%04X}"
    }.mkString + "]"

  /** Static helper shared by eval and generated code. */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Int](names.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      var b = 0
      var found = false
      while (b < rangeTable.length && !found) {
        val rs = rangeTable(b)
        var r = 0
        while (r < rs.length && !found) {
          if (cp >= rs(r)(0) && cp <= rs(r)(1)) { out(b) += 1; found = true }
          r += 1
        }
        b += 1
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(out.map(Integer.valueOf))
  }

  private val rangeTable: Array[Array[Array[Int]]] =
    ranges.map(_.map { case (lo, hi) => Array(lo, hi) }.toArray).toArray
}
