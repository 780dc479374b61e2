package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One IRLS moment pass of [[graft.stats.Logistic.fit]] as ONE
  * array-typed AGGREGATE: for rows (y, xs) and the current coefficient
  * vector β (an opaque operator parameter, NOT d expression nodes), the
  * aggregation buffer is the length d(d+1)/2 + d + 1 array
  *
  *   [ Σ w·xᵢ·xⱼ (i ≤ j row-major) | Σ r·xᵢ | Σ deviance term ]
  *
  * with p = clamp(σ(x·β), 1e-12), w = p(1−p), r = y − p per row —
  * exactly the per-row arithmetic of the driver-side solver
  * ([[graft.stats.Logistic.fitLocal]]), in the same accumulation
  * order, so the two paths agree to float-sum ordering (parity
  * spec-pinned at 1e-9).
  *
  * Why this shape: the original moment pass built d(d+3)/2 SEPARATE
  * aggregate expressions per iteration, so every IRLS step paid a d²
  * Catalyst ANALYSIS cost — measured 67–550 s on a fixture-sized
  * corpus (r17). With β carried as a plan reference the per-iteration
  * plan is O(1) in d. A first rewrite emitted the per-row moment array
  * through posexplode → hash-agg (the KMeans update shape) — planning
  * O(1), but it materializes rows × d(d+3)/2 aggregation-probe rows
  * per pass (measured 73 s/step at 500k rows, d = 25). This
  * TypedImperativeAggregate accumulates the SAME terms straight into
  * one double[] buffer per partition (the ApproximatePercentile
  * execution shape: ObjectHashAggregate, no grouping keys, one merge
  * of #partitions partials) — per-row cost is the unavoidable O(d²)
  * flops and nothing else, and the shuffle is #partitions × one
  * buffer.
  *
  * The buffer carries THREE bookkeeping cells past the moments —
  * [n used, min y, max y] — because pairwise-complete null handling
  * lives HERE, not in a pre-filter: a Filter over the projected
  * feature columns gets pushed below the projection and re-embeds the
  * full feature-expression tree into every null check (measured 72 s
  * vs 2.7 s for the bare feature pass at 100k rows × d = 25 — the
  * filter recompute, not just the d² analysis, was most of the r17
  * 67–550 s). A row with a null label or any null feature contributes
  * to NOTHING; n/min/max let the caller run its degenerate-input
  * checks from the same single pass. n counts in a double — exact to
  * 2^53 rows. */
case class LogisticMomentAgg(y: Expression, xs: Expression,
    beta: Array[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {
  require(beta.nonEmpty, "empty coefficient vector")
  // exact input types are the caller's contract ([[graft.stats
  // .Logistic.fit]] projects (double, array<double>) before the loop)

  private def d: Int = beta.length
  private def bufLen: Int = d * (d + 1) / 2 + d + 4

  override def children: Seq[Expression] = Seq(y, xs)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = {
    val b = new Array[Double](bufLen)
    b(bufLen - 2) = Double.PositiveInfinity // min y
    b(bufLen - 1) = Double.NegativeInfinity // max y
    b
  }

  override def update(buf: Array[Double],
      input: InternalRow): Array[Double] = {
    val yAny = y.eval(input)
    val xAny = xs.eval(input)
    if (yAny == null || xAny == null) return buf // dropped pairwise
    val yv = yAny.asInstanceOf[Double]
    val xv = xAny.asInstanceOf[ArrayData]
    require(xv.numElements() == d,
      s"feature vector has ${xv.numElements()} elements, beta has $d")
    var i = 0
    while (i < d) {
      if (xv.isNullAt(i)) return buf // dropped pairwise
      i += 1
    }
    var eta = 0.0
    i = 0
    while (i < d) { eta += xv.getDouble(i) * beta(i); i += 1 }
    val p0 = 1.0 / (1.0 + math.exp(-eta))
    val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
    val w = p * (1.0 - p)
    val r = yv - p
    var k = 0
    i = 0
    while (i < d) {
      val xi = xv.getDouble(i)
      var j = i
      while (j < d) {
        buf(k) += w * xi * xv.getDouble(j); k += 1; j += 1
      }
      i += 1
    }
    i = 0
    while (i < d) { buf(k) += r * xv.getDouble(i); k += 1; i += 1 }
    buf(k) += -2.0 * (yv * math.log(p) + (1.0 - yv) * math.log(1.0 - p))
    buf(k + 1) += 1.0 // n
    if (yv < buf(k + 2)) buf(k + 2) = yv
    if (yv > buf(k + 3)) buf(k + 3) = yv
    buf
  }

  override def merge(b1: Array[Double],
      b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen - 2) { b1(i) += b2(i); i += 1 }
    if (b2(bufLen - 2) < b1(bufLen - 2)) b1(bufLen - 2) = b2(bufLen - 2)
    if (b2(bufLen - 1) > b1(bufLen - 1)) b1(bufLen - 1) = b2(bufLen - 1)
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    var i = 0
    while (i < bufLen) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): LogisticMomentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): LogisticMomentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogisticMomentAgg =
    copy(y = newChildren(0), xs = newChildren(1))
}

object LogisticMomentAgg {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column form (fresh session function per call — the CharGramBow
    * naming discipline; one registration per IRLS step). The analyzer
    * wraps the returned AggregateFunction into its AggregateExpression
    * at resolution. */
  def apply(spark: SparkSession, y: Column, xs: Column,
      beta: Array[Double]): Column = {
    val snapshot = beta.clone()
    val fname = s"graft_logmom_${seq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => LogisticMomentAgg(exprs(0), exprs(1), snapshot),
      "built-in")
    org.apache.spark.sql.functions.call_function(fname, y, xs)
  }
}
