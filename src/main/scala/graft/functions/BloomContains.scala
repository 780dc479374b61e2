package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a pre-built Bloom filter over 64-bit keys, as a
  * native Catalyst expression with whole-stage codegen.
  *
  * The filter travels as its serialized bytes (the case-class field), so
  * the expression is plan-serializable; each JVM deserializes it once
  * (transient lazy) and the generated code probes it directly — the same
  * shape Spark's own runtime-filter injection uses, but available as a
  * user-level operator for incremental dedup against a historical corpus
  * (see [[graft.ops.Dedup.novelAgainstBloom]]).
  *
  * Contract (from [[BloomFilter]]): no false negatives — a key that was
  * `put` always probes true; false positives at the filter's configured
  * fpp probe true without having been put.
  */
case class BloomContainsLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.catalogString}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the codegen references array — bytes
    // are not re-parsed per row or per partition
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"
}
