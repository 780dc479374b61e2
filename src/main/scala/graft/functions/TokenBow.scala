package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word-token bag-of-words as ONE native codegen pass — the
  * vectorizer under [[graft.ops.Features.hashedBow]] (the hashing
  * trick, Weinberger et al. 2009). For each whitespace token of the
  * trimmed text, hashes the token's UTF8 bytes with XXH64(seed 42) and
  * counts pmod(h, dim) buckets into one int array — BIT-IDENTICAL
  * (spec-pinned) to the compositional
  * `bucketCounts(tokenBuckets(text, dim), dim)` form, including its
  * edge semantics:
  *  - `trim` strips 0x20 spaces ONLY (the engine's StringTrim), so a
  *    leading tab/newline survives the trim and Java's `\s+` split then
  *    yields a LEADING EMPTY token, which hashes and counts — replicated
  *    byte-for-byte;
  *  - `\s` is ASCII-only (tab, LF, VT, FF, CR, space) — Unicode spaces
  *    are token bytes, not separators;
  *  - blank text → the all-zero vector (the empty-array guard).
  *
  * Why native: the compositional form is the interpreted-HOF hazard
  * [[CharGramBow]] documents, PLUS a re-traversal: `bucketCounts`
  * filters the bucket array once per output bucket — O(dim · tokens)
  * per row with per-element closures (ops/Features.scala:33, the r17
  * verdict's named residue). This expression is O(token bytes) with
  * zero allocations per token: one scan, one output array. */
case class TokenBow(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2, s"dim must be >= 2, got $dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].trim() // 0x20 spaces only
    val counts = new Array[Int](dim)
    val n = t.numBytes
    if (n > 0) {
      val base = t.getBaseObject
      val off = t.getBaseOffset
      def ws(i: Int): Boolean = {
        val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
        b == 32 || (b >= 9 && b <= 13)
      }
      def count(start: Int, len: Int): Unit = {
        val h = XXH64.hashUnsafeBytes(base, off + start, len, 42L)
        counts((((h % dim) + dim) % dim).toInt) += 1
      }
      var i = 0
      if (ws(0)) count(0, 0) // Java split's leading empty token
      while (i < n) {
        while (i < n && ws(i)) i += 1
        if (i < n) {
          val start = i
          while (i < n && !ws(i)) i += 1
          count(start, i - start)
        }
      }
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val xxh = classOf[XXH64].getName
      val platform = "org.apache.spark.unsafe.Platform"
      val counts = ctx.freshName("counts")
      val t = ctx.freshName("t")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
        int[] $counts = new int[$dim];
        org.apache.spark.unsafe.types.UTF8String $t = $str.trim();
        int $n = $t.numBytes();
        if ($n > 0) {
          Object $base = $t.getBaseObject();
          long $off = $t.getBaseOffset();
          int $i = 0;
          byte $b = $platform.getByte($base, $off);
          if ($b == 32 || ($b >= 9 && $b <= 13)) {
            long $h = $xxh.hashUnsafeBytes($base, $off, 0, 42L);
            $counts[(int) ((($h % $dim) + $dim) % $dim)]++;
          }
          while ($i < $n) {
            while ($i < $n) {
              $b = $platform.getByte($base, $off + $i);
              if ($b == 32 || ($b >= 9 && $b <= 13)) { $i++; } else break;
            }
            if ($i < $n) {
              int $start = $i;
              while ($i < $n) {
                $b = $platform.getByte($base, $off + $i);
                if ($b == 32 || ($b >= 9 && $b <= 13)) break; else $i++;
              }
              long $h = $xxh.hashUnsafeBytes(
                $base, $off + $start, $i - $start, 42L);
              $counts[(int) ((($h % $dim) + $dim) % $dim)]++;
            }
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TokenBow =
    copy(child = newChild)
}

object TokenBow {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column form (fresh session function per call — the CharGramBow
    * naming discipline). */
  def apply(spark: SparkSession, text: Column, dim: Int): Column = {
    val fname = s"graft_tokenbow_${seq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => TokenBow(exprs.head, dim), "built-in")
    org.apache.spark.sql.functions.call_function(fname, text)
  }
}
