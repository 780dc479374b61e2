package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual difference hash of an image's BYTES as a native
  * Catalyst expression — the codegen'd, streaming-safe form of
  * [[graft.ops.Multimodal.dHash64]] (same pixels, same bits; the spec pins
  * equality). Null when the bytes don't decode as an image — undecodable
  * content is data, not an error, in a crawl pipeline.
  *
  * Being a pure expression (vs the mapPartitions batch path) is what lets
  * the SAME hash run inside Structured Streaming plans
  * ([[graft.streaming.NearDedup.phashDupEdgesStream]]) and fuse into any
  * scan. Decode cost is per-row and map-side; nothing shuffles pixels.
  */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"image_dhash needs BINARY, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ImageDHash.hashOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageDHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("dhash")
      s"""
        java.lang.Long $boxed = $cls.hashOrNull($c);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {
  // one-time per JVM: these are in-memory byte arrays — keep ImageIO off
  // its tmp-file stream cache
  javax.imageio.ImageIO.setUseCache(false)

  /** Static helper shared by eval and generated code (boxed: null =
    * undecodable). */
  def hashOrNull(bytes: Array[Byte]): java.lang.Long =
    if (bytes == null || bytes.isEmpty) null
    else graft.ops.Multimodal.dHash64(bytes)
      .map(java.lang.Long.valueOf).orNull
}
