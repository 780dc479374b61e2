package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded (banded) Levenshtein distance — Ukkonen's O(k·min(n,m)) band
  * instead of the O(n·m) full DP Spark's builtin `levenshtein` runs.
  * Returns the exact distance when it is ≤ `bound`, else `bound + 1`
  * (the caller only ever thresholds, so "how far past the bound" is
  * wasted work — the band prunes it).
  *
  * This is the entity-resolution hot path: inside a block every pair
  * pays an edit-distance call, and with bound 1–2 the band visits ≤
  * (2k+1)·n cells — ~6% of the full matrix on 18-char names at k=1.
  * Native codegen expression (eval and generated code share the static
  * helper), char-level on the JVM string (identifier/name semantics;
  * supplementary-plane text may count differently than the builtin's
  * codepoint walk — fine for the blocking filter this serves).
  */
case class BoundedLevenshtein(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {

  require(bound >= 0, s"bound must be non-negative, got $bound")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BoundedLevenshtein.dist($a, $b, $bound)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Exact distance if ≤ k, else k+1. Shared by eval and codegen. */
  def dist(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val s = ua.toString; val t = ub.toString
    val n = s.length; val m = t.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m // ≤ k by the gap check
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j0 = 0
    while (j0 <= math.min(m, k)) { prev(j0) = j0; j0 += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      var best = cur(0)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return inf // whole band over the bound: give up
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }
}
