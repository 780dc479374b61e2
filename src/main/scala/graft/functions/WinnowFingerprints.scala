package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
  * 2003) as ONE native expression pass per document: hash every
  * k-code-point gram (32-bit md5 prefix — the engine-portable scheme the
  * DuckDB oracle mirrors), slide the w-gram window, keep each window's
  * minimal (hash, rightmost-position) gram, dedupe. Returns
  * array<struct<h: bigint, p: int>>.
  *
  * Exists because the compositional form — nested
  * `transform(sequence(...), ...)` with per-element md5/conv Columns —
  * runs interpreted (HOF lambdas never enter whole-stage codegen) at
  * ~300 µs per gram; this expression's tight loop with a thread-local
  * MessageDigest is the same selection at nanoseconds per comparison
  * (the [[graft.ops.Pq]] scaladoc's HOF lesson, third occurrence).
  * Semantics are IDENTICAL (bit-for-bit, spec-pinned): code-point gram
  * boundaries, md5 over the gram's UTF-8 bytes, rightmost-min ties. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("p", IntegerType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.select($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)

  override def prettyName: String = s"winnow_fingerprints_${k}_$w"
}

object WinnowFingerprints {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static helper shared by eval and generated code. */
  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    // code-point start offsets (UTF-16 indices): gram p covers code
    // points [p, p+k) — the same boundaries Column.substr / DuckDB
    // substr use, so the oracle reproduces every gram byte-for-byte
    val nCp = str.codePointCount(0, str.length)
    val n = nCp - k + 1 // gram count
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val cpOff = new Array[Int](nCp + 1)
    var (ci, cp) = (0, 0)
    while (cp < nCp) {
      cpOff(cp) = ci
      ci += Character.charCount(str.codePointAt(ci))
      cp += 1
    }
    cpOff(nCp) = ci
    val md = digests.get()
    val hs = new Array[Long](n)
    var p = 0
    while (p < n) {
      md.reset()
      val gram = str.substring(cpOff(p), cpOff(p + k))
      val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    val picked = new java.util.LinkedHashSet[Long]()
    var sIdx = 0
    val lastStart = math.max(n - w, 0)
    while (sIdx <= lastStart) {
      var best = sIdx
      var j = sIdx + 1
      val end = math.min(sIdx + w, n)
      while (j < end) {
        // smaller hash wins; equal hash -> RIGHTMOST position wins
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      picked.add((hs(best) << 32) | best.toLong)
      sIdx += 1
    }
    val out = new Array[Any](picked.size)
    val it = picked.iterator()
    var i = 0
    while (it.hasNext) {
      val packed = it.next()
      out(i) = new GenericInternalRow(Array[Any](
        packed >>> 32, (packed & 0xffffffffL).toInt))
      i += 1
    }
    new GenericArrayData(out)
  }
}
