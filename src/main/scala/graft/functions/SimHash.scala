package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{expr, transform, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of 64-bit token hashes, as a native Catalyst
  * expression with whole-stage codegen (preferred over a Scala UDF —
  * SURVEY.md §2.8 / build-brief preference order).
  *
  * For each bit position b, counts tokens with bit b set vs unset; the
  * output has bit b set iff set-count > unset-count (majority vote).
  * Near-duplicate documents differ in few bit positions, so hamming
  * distance (`bit_count(a ^ b)` with built-ins) under a threshold ≈
  * high cosine similarity of token multisets.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            long $h = $arr.getLong($i);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object GraftFunctions {
  /** Registers graft's SQL-callable functions on the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compression_ratio", exprs => CompressionRatio(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
  }

  /** Unicode NFC canonical composition of a string column (pre-dedup text
    * canonicalization). Requires [[register]]. */
  def nfcNormalize(spark: SparkSession, text: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.call_function
    call_function("nfc_normalize", text)
  }

  /** Deflate compressed/raw byte ratio of a string column (the Gopher-
    * style compressibility quality signal). Requires [[register]]. */
  def compressionRatio(spark: SparkSession, text: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.call_function
    call_function("compression_ratio", text)
  }

  /** Full text canonicalization before any content hashing: NFC compose →
    * lowercase → collapse whitespace runs → trim. The explicit character
    * class `[ \t\n\r\f]` (not `\s`) keeps Java-regex and RE2 engines
    * byte-identical (Java's `\s` includes vertical tab; RE2's does not),
    * which is what lets a SQL oracle reproduce this bit-for-bit. */
  def normalizeText(spark: SparkSession, text: Column): Column = {
    import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
    trim(regexp_replace(lower(nfcNormalize(spark, text)), "[ \t\n\r\f]+", " "))
  }

  /** simhash64 over an array<string> token column (hashes each token with
    * xxhash64 first). Requires [[register]] on the session. */
  def simhash64(spark: SparkSession, tokenArray: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.call_function
    call_function("simhash64", transform(tokenArray, t => xxhash64(t)))
  }
}
