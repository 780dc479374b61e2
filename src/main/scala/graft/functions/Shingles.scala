package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string, as ONE native expression.
  *
  * Semantics are bit-compatible with the compositional form
  * `array_distinct(transform(sequence(0, size(w)-n), i ->
  * concat_ws(' ', slice(w, i+1, n))))` over `w = split(trim(text), "\s+")`
  * — but that form embeds the full `split` subtree inside the lambda body,
  * so interpreted evaluation re-splits the document once PER SHINGLE
  * (O(words²) work, and higher-order functions never enter whole-stage
  * codegen). Measured on the sf0.1 documents table this was ~7 s of the
  * MinHash pipeline; the single-pass version is ~100 ms.
  */
case class ShingleNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16, "n must be in [1, 16]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleNGrams.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val cls = ShingleNGrams.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.MODULE$$.shingle($text, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleNGrams =
    copy(child = newChild)
}

object ShingleNGrams {
  private val emptyArray = new GenericArrayData(Array.empty[Any])

  /** Single pass: trim → whitespace-split → n-gram join(" ") → distinct
    * (first-occurrence order, matching `array_distinct`).
    *
    * Whitespace semantics replicate Spark/DuckDB exactly, NOT Java's:
    * `trim` strips only ' ' (Java String.trim strips every char ≤ 0x20,
    * which would eat tabs/newlines at the edges), and the split keeps
    * leading/trailing empty tokens (Java's default limit-0 split drops
    * trailing empties; Spark's `split` and Postgres-style
    * `regexp_split_to_array` use limit -1). So `"a b\n"` tokenizes to
    * `["a","b",""]` and its 2-shingles are `["a b", "b "]` — byte-identical
    * to `TextOps.tokens` and the DuckDB oracles on any corpus, including
    * tab/newline edge whitespace. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    val s0 = text.toString
    var b = 0
    var e = s0.length
    while (b < e && s0.charAt(b) == ' ') b += 1
    while (e > b && s0.charAt(e - 1) == ' ') e -= 1
    if (b == e) return emptyArray
    val words = s0.substring(b, e).split("\\s+", -1)
    if (words.length < n) return emptyArray
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    var i = 0
    while (i + n <= words.length) {
      if (n == 1) seen.add(words(i))
      else {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
