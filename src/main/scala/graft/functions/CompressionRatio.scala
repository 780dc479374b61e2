package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string — `compressed_bytes / raw_bytes`,
  * (0, ~1.03] for document-length inputs (very short strings can exceed 1:
  * the deflate header dominates) — as a native Catalyst expression with
  * whole-stage codegen (the codegen body calls the same static helper as
  * eval, the standard pattern for library-backed expressions).
  *
  * The classic compressibility quality signal (Gopher / RefinedWeb /
  * CCNet lineage): highly repetitive machine-generated text compresses far
  * below natural prose (~0.3–0.6 for English), while random or encrypted
  * payloads sit near 1.0 — so both tails of the ratio distribution are
  * removal candidates. Level 6 (zlib default) matches what those pipelines
  * report; empty strings yield 1.0 (no evidence either way).
  *
  * Scale shape: stateless per-row work (one Deflater per call over the
  * row's bytes), fully map-side, no shuffle; cost is O(bytes) like any
  * other text feature here.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressionRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  /** Static helper shared by eval and generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}
