package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The unscaled long of `round(x, 12).cast("decimal(38,12)")` — i.e. the
  * integer 10¹²·round₁₂(x) — as ONE native codegen expression.
  *
  * Motivation (measured, sf0.1 covariance pass): the declarative
  * `sum(round(x,12).cast("decimal(38,12)"))` spends its time allocating a
  * BigDecimal in `round`, ANOTHER in the double→decimal cast, and then
  * summing NON-COMPACT decimals (precision 38 exceeds the long-backed
  * fast path, so every add is a BigDecimal add) — 16 s where plain double
  * sums take 0.8 s. Summing the unscaled LONGS instead keeps the
  * aggregation in codegen'd long arithmetic; the decimal value is
  * reconstructed exactly afterwards (unscaled × 10⁻¹²) on the
  * group-count-sized result.
  *
  * Semantics are REPLICATED, not redefined: the helper performs the same
  * two Java steps Spark's `round` (BigDecimal.valueOf → setScale HALF_UP
  * → toDouble) and decimal cast (BigDecimal.valueOf → setScale HALF_UP)
  * perform, so the unscaled long is bit-for-bit the old pipeline's cell
  * term (differential-pinned in CodegenSpec over adversarial near-tie
  * values).
  *
  * Overflow: |x| beyond ~9.2·10⁶ would not fit scale-12 in a long —
  * `longValueExact` throws rather than wrapping. Aggregate sums of these
  * longs must be bounded by the caller (see
  * [[graft.ops.Projection.momentsUpper]]'s per-partition sub-aggregation
  * and its magnitude-bound scaladoc).
  */
case class UnscaledRound12(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    UnscaledRound12.unscaled(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnscaledRound12.unscaled($c)")

  override protected def withNewChildInternal(newChild: Expression): UnscaledRound12 =
    copy(child = newChild)
}

object UnscaledRound12 {
  /** Static helper shared by eval and generated code: Spark's
    * round(x, 12) followed by Spark's double→decimal(38,12) cast, as
    * unscaled long. */
  def unscaled(x: Double): Long = {
    val y = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    java.math.BigDecimal.valueOf(y)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }
}
