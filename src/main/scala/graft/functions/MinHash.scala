package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash values of an array<string> in ONE pass, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why an expression and not composition: `array(minhash_0, …, minhash_63)`
  * over higher-order functions makes Catalyst inline the shingle pipeline
  * into each of the 64 subtrees (CollapseProject) and none of it is
  * codegen'd — measured 94 ms/row on 100-shingle documents. This
  * expression hashes each element once (XXH64 over the UTF8 bytes) and
  * updates k running minima with a splitmix64 finalizer per hash function:
  * O(|array|·k) long mixes, fully JIT'd.
  */
case class MinHash64(child: Expression, k: Int, seed: Long) extends UnaryExpression {
  require(k > 0 && k <= 1024, "k must be in (0, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Per-function salt constants derived from the seed (splitmix64 chain). */
  private lazy val salts: Array[Long] = MinHash64.salts(k, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val v = MinHash64.mix(h ^ salts(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val saltsRef = ctx.addReferenceObj("salts", salts, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      val mh = MinHash64.getClass.getName.stripSuffix("$") + "$"
      s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
            long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $j = 0; $j < $k; $j++) {
              long $v = $mh.MODULE$$.mix($h ^ $saltsRef[$j]);
              if ($v < $mins[$j]) $mins[$j] = $v;
            }
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def salts(k: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](k)
    var s = seed
    var i = 0
    while (i < k) { s = mix(s); out(i) = s; i += 1 }
    out
  }
}
