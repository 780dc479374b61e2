package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990 — public), the
  * name-matching standard next to [[BoundedLevenshtein]]'s edit
  * distance: match window ⌊max(|a|,|b|)/2⌋ − 1, transpositions = half
  * the out-of-order matched pairs, and the Winkler prefix boost
  * jw = j + ℓ·0.1·(1 − j) applied only when j exceeds the standard 0.7
  * boost threshold (ℓ = common prefix ≤ 4). Exactly the semantics of
  * DuckDB's `jaro_winkler_similarity`, which makes the oracle a genuine
  * INDEPENDENT implementation of the same spec rather than a replay.
  * Either side empty (or null) → 0.0 (null propagates). Works on
  * Unicode code-point-ish level via Java chars — matches the oracle on
  * the ASCII identifiers entity resolution feeds it; document callers
  * should NFC-normalize first ([[NfcNormalize]]).
  *
  * One O(|a|·|b|)-bounded scalar per row, codegen'd via the shared
  * static helper (the [[UnscaledRound12]] discipline). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val j = (m.toDouble / la + m.toDouble / lb +
      (m - tr).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }
}
