package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998,
  * public) over one query's candidate shortlist — the diversified re-rank
  * every RAG retrieval stack runs after ANN: pick argmax of
  * λ·cos(q,d) − (1−λ)·max_{s∈picked} cos(d,s), k times.
  *
  * A native expression because the greedy is sequential WITHIN a row but
  * embarrassingly parallel ACROSS queries: each query row carries its
  * shortlist (from `collect_list` after the ANN/brute top-k) and the whole
  * selection runs in one codegen'd eval — no per-step shuffle, no driver
  * loop over queries.
  *
  * Deterministic and SQL-mirrorable: candidates are sorted by id before
  * the greedy (collect_list order is physical-plan noise), ties take the
  * smallest id, the first pick's penalty term is an empty max (score =
  * λ·cos), and every cosine is the sequential-fold dot over index order —
  * so an unrolled-CTE oracle reproduces raw doubles. Zero-norm candidate
  * vectors cannot be scored and are skipped; λ must be in [0,1].
  *
  * Children: (queryVec array<double>,
  * candidates array<struct<nid:long, v:array<double>>>). Returns
  * array<struct<nid:long, score:double>> in pick order (≤ k elements).
  */
case class MmrSelect(left: Expression, right: Expression, k: Int,
    lambda: Double) extends BinaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("nid", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(q: Any, cands: Any): Any =
    MmrSelect.select(q.asInstanceOf[ArrayData],
      cands.asInstanceOf[ArrayData], k, lambda)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.MmrSelect.select($q, $c, $k, ${lambda}D)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mmr_select"
}

object MmrSelect {

  /** Sequential-fold cosine (index order, the DotProduct/list_sum
    * discipline); NaN marks an unscorable (zero-norm) pair. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0 || a.length != b.length) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Static helper shared by eval and generated code. */
  def select(qv: ArrayData, cands: ArrayData, k: Int,
      lambda: Double): ArrayData = {
    val q = qv.toDoubleArray()
    val n = cands.numElements()
    val entries = (0 until n).flatMap { i =>
      val row = cands.getStruct(i, 2)
      val id = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      val c = cos(q, v)
      if (c.isNaN) None else Some((id, v, c))
    }.sortBy(_._1).toArray
    val m = entries.length
    val picked = new Array[Boolean](m)
    // max cos to the picked set; -inf = "nothing picked yet" (candidates
    // here all share q's length and nonzero norms, so cos among them is
    // never NaN and every unpicked slot is real after the first pick)
    val maxSim = Array.fill(m)(Double.NegativeInfinity)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var step = 0
    while (step < math.min(k, m)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!picked(i)) {
          val penalty = if (step == 0) 0.0 else maxSim(i)
          val score = lambda * entries(i)._3 - (1.0 - lambda) * penalty
          // strict > over id-sorted entries = smallest-id tie-break
          if (score > bestScore) { bestScore = score; best = i }
        }
        i += 1
      }
      picked(best) = true
      out += InternalRow(entries(best)._1, bestScore)
      var j = 0
      while (j < m) {
        if (!picked(j)) {
          val c = cos(entries(j)._2, entries(best)._2)
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      step += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
