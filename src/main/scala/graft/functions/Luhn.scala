package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Payment-card redaction with Luhn validation (ISO/IEC 7812 checksum —
  * public): replace every maximal digit run of 13–19 characters whose
  * Luhn checksum verifies with `<CARD>`, leaving non-validating runs
  * (order ids, timestamps) untouched — the PRECISION upgrade over
  * [[graft.ops.TextOps.redactPii]]'s blanket long-digit-run rule, which
  * can't tell a card from an order number.
  *
  * A conditional replace (match → validate → substitute) is not
  * expressible with builtin regexp functions without exploding the
  * document, so this is a native expression: one linear scan per
  * string, pure integer logic (engine- and locale-independent), the
  * same static helper backing eval and generated code (the
  * [[UnscaledRound12]] discipline; CodegenSpec pins eval == codegen).
  * Idempotent — the placeholder contains no digits. */
case class LuhnRedactCards(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LuhnRedactCards.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LuhnRedactCards.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnRedactCards =
    copy(child = newChild)
}

object LuhnRedactCards {

  /** Luhn checksum over an ASCII digit substring [from, until). */
  def luhnValid(s: String, from: Int, until: Int): Boolean = {
    var sum = 0
    var double = false
    var i = until - 1
    while (i >= from) {
      var d = s.charAt(i) - '0'
      if (double) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      double = !double
      i -= 1
    }
    sum % 10 == 0
  }

  /** Static helper shared by eval and generated code. */
  def redact(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val len = j - i
        if (len >= 13 && len <= 19 && luhnValid(s, i, j)) out.append("<CARD>")
        else out.append(s, i, j)
        i = j
      } else {
        out.append(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}
