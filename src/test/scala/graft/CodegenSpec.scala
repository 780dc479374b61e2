package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CompressionRatio, MinHash64, ScriptCounts, SimHash64}

/** Hard-fails if any custom expression's doGenCode emits Java that Janino
  * cannot compile. Round 1 shipped a silent interpreted fallback (wrong FQCN
  * for UnsafeArrayData) that cost 17.5s on the hottest bench query — Spark
  * logs a WARN and interprets, so only a compile-the-codegen test catches it.
  */
class CodegenSpec extends SparkSpec {

  private def utf8Array(strs: String*): GenericArrayData =
    new GenericArrayData(strs.map(UTF8String.fromString).toArray[Any])

  test("MinHash64 codegen compiles and matches interpreted eval") {
    val expr = MinHash64(BoundReference(0, ArrayType(StringType), nullable = true), k = 64, seed = 42L)
    // generate() throws a JaninoRuntimeException/CompileException if the emitted code is bad
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val input = InternalRow(utf8Array("the quick", "quick brown", "brown fox"))
    val fromCodegen = proj(input).getArray(0).toLongArray()
    val fromInterp = expr.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(fromCodegen.toSeq == fromInterp.toSeq)
    assert(fromCodegen.length == 64)
    assert(fromCodegen.exists(_ != Long.MaxValue))
  }

  test("SimHash64 codegen compiles and matches interpreted eval") {
    val expr = SimHash64(BoundReference(0, ArrayType(LongType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val hashes = new GenericArrayData(Array[Any](0x0fL, 0x0eL, 0x1eL))
    val input = InternalRow(hashes)
    val fromCodegen = proj(input).getLong(0)
    val fromInterp = expr.eval(input).asInstanceOf[Long]
    assert(fromCodegen == fromInterp)
  }

  test("CompressionRatio codegen compiles and matches interpreted eval") {
    val expr = CompressionRatio(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    // "x" (1 byte -> 9-byte deflate frame -> 9.0) pins that tiny inputs
    // are passed through raw, not special-cased: filter length upstream
    for (s <- Seq("a" * 1000, "the quick brown fox jumps over the lazy dog",
        "x", "", "abc" * 50)) {
      val input = InternalRow(UTF8String.fromString(s))
      val fromCodegen = proj(input).getDouble(0)
      val fromInterp = expr.eval(input).asInstanceOf[Double]
      assert(fromCodegen == fromInterp, s"codegen/interp drift on '${s.take(20)}'")
      assert(fromCodegen > 0.0)
    }
    // the useful range claim holds at document length
    def ratio(s: String) = expr.eval(InternalRow(UTF8String.fromString(s)))
      .asInstanceOf[Double]
    assert(ratio("the quick brown fox jumps over the lazy dog " * 20) <= 1.03)
    // the signal's defining property: repetition crushes, entropy resists
    def r(s: String) = expr.eval(InternalRow(UTF8String.fromString(s)))
      .asInstanceOf[Double]
    assert(r("a" * 4000) < 0.05)
    val noise = Seq.tabulate(400)(i => f"${(i * 2654435761L) % 16777216L}%06x")
      .mkString(" ")
    assert(r(noise) > 0.5)
    assert(r("") == 1.0)
    // deterministic
    assert(r("hello world, hello world") == r("hello world, hello world"))
  }

  test("ScriptCounts codegen compiles and matches interpreted eval") {
    val expr = ScriptCounts(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    // latin + digits + cyrillic + cjk + an astral emoji (no bucket, and
    // the surrogate pair must advance as ONE code point)
    val s = "Ab3 привет 你好 😀!"
    val input = InternalRow(UTF8String.fromString(s))
    val fromCodegen = proj(input).getArray(0).toIntArray().toSeq
    val fromInterp = expr.eval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(fromCodegen == fromInterp)
    val byName = ScriptCounts.names.zip(fromCodegen).toMap
    assert(byName("latin") == 2 && byName("digit") == 1)
    assert(byName("cyrillic") == 6 && byName("cjk") == 2)
    assert(fromCodegen.sum == 11, "emoji/punctuation must count nowhere")
  }

  test("MmrSelect codegen compiles and matches interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val candType = ArrayType(StructType(Seq(
      StructField("nid", LongType), StructField("v", ArrayType(DoubleType)))))
    val expr = graft.functions.MmrSelect(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, candType, nullable = true), k = 2, lambda = 0.5)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    def arr(xs: Double*) = new GenericArrayData(xs.toArray[Any])
    val cands = new GenericArrayData(Array[Any](
      InternalRow(1L, arr(1.0, 0.0)),
      InternalRow(2L, arr(0.99, 0.01)),
      InternalRow(3L, arr(0.0, 1.0))))
    val input = InternalRow(arr(1.0, 0.05), cands)
    val fromCodegen = proj(input).getArray(0)
    val fromInterp = expr.eval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    def decode(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getDouble(1))
      }
    assert(decode(fromCodegen) == decode(fromInterp))
    val ids = decode(fromCodegen).map(_._1)
    // (0.99, 0.01) normalized lies closest to q = (1.0, 0.05), so 2 leads;
    // diversification then skips its near-duplicate 1 for the orthogonal 3
    assert(ids == Seq(2L, 3L),
      s"diversified second pick should skip the near-dup: $ids")
  }

  test("BoundedLevenshtein codegen compiles; banded == full DP within bound") {
    import graft.functions.BoundedLevenshtein
    val expr = BoundedLevenshtein(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true), bound = 2)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    def both(a: String, b: String): Int = {
      val row = InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))
      val cg = proj(row).getInt(0)
      val interp = expr.eval(row).asInstanceOf[Int]
      assert(cg == interp, s"codegen $cg != eval $interp for ($a, $b)")
      cg
    }
    // exact within the bound
    assert(both("kitten", "kitten") == 0)
    assert(both("kitten", "mitten") == 1)
    assert(both("kitten", "sitten") == 1)
    assert(both("kitten", "sittin") == 2)
    // past the bound: clamped to bound+1, not the true distance
    assert(both("kitten", "sitting") == 3)
    assert(both("abc", "xyz") == 3)
    assert(both("", "ab") == 2)
    assert(both("", "abc") == 3) // length gap alone exceeds the bound
    // randomized parity vs an unbanded reference implementation
    val rnd = new scala.util.Random(7)
    def full(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (_ <- 1 to 200) {
      val a = rnd.alphanumeric.take(3 + rnd.nextInt(10)).mkString
      val b = rnd.alphanumeric.take(3 + rnd.nextInt(10)).mkString
      assert(both(a, b) == math.min(full(a, b), 3),
        s"banded mismatch on ($a, $b)")
    }
  }

  test("NfcNormalize codegen compiles, composes combining marks, idempotent") {
    import graft.functions.NfcNormalize
    val expr = NfcNormalize(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val decomposed = "Cafe\u0301 du re\u0301sume\u0301" // e + combining acute (escapes: editor-normalization-proof)
    val composed = "Caf\u00e9 du r\u00e9sum\u00e9"        // precomposed \u00e9
    for (s <- Seq(decomposed, composed, "plain ascii", "")) {
      val input = InternalRow(UTF8String.fromString(s))
      assert(proj(input).getUTF8String(0) ==
        expr.eval(input).asInstanceOf[UTF8String], s"drift on '$s'")
    }
    def nfc(s: String) = expr.eval(InternalRow(UTF8String.fromString(s)))
      .asInstanceOf[UTF8String].toString
    assert(decomposed != composed) // byte-different inputs...
    assert(nfc(decomposed) == composed) // ...canonically equal after NFC
    assert(nfc(composed) == composed)   // already-NFC passes through
    assert(nfc(nfc(decomposed)) == nfc(decomposed)) // idempotent
  }

  test("DotProduct codegen matches interpreted eval and the compositional HOF form") {
    import org.apache.spark.sql.types.DoubleType
    val expr = graft.functions.DotProduct(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    def arr(xs: Any*) = new GenericArrayData(xs.toArray[Any])
    val cases = Seq(
      (arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0)),
      (arr(0.1, -0.2), arr(-0.3, 0.7)),
      (arr(), arr()))
    for ((a, b) <- cases) {
      val input = InternalRow(a, b)
      assert(proj(input).getDouble(0) == expr.eval(input).asInstanceOf[Double])
    }
    // null algebra: length mismatch and null elements null the sum (the
    // zip_with-pads-with-null / aggregate-propagates semantics)
    assert(expr.eval(InternalRow(arr(1.0), arr(1.0, 2.0))) == null)
    assert(expr.eval(InternalRow(arr(1.0, null), arr(1.0, 2.0))) == null)
    assert(proj(InternalRow(arr(1.0), arr(1.0, 2.0))).isNullAt(0))

    // bit-compatibility with the compositional form on real embeddings
    import org.apache.spark.sql.functions._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), reverse(col("v")), (x, y) => x * y),
      lit(0.0), (acc, p) => acc + p)
    val native = graft.ops.Similarity.dot(col("v"), reverse(col("v")))
    val diff = embs.select((hof =!= native).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0, s"native dot differs from HOF form on $diff rows")
  }

  test("BloomContainsLong codegen compiles and matches interpreted eval") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(1L, 42L, 9999L).foreach(bloom.putLong)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val expr = graft.functions.BloomContainsLong(
      BoundReference(0, LongType, nullable = true), bytes)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    for (v <- Seq(1L, 42L, 9999L, 7L, 123456L)) {
      val input = InternalRow(v)
      val fromCodegen = proj(input).getBoolean(0)
      val fromInterp = expr.eval(input).asInstanceOf[Boolean]
      assert(fromCodegen == fromInterp, s"codegen/interp disagree on $v")
    }
    // inserted keys always probe true (no false negatives)
    assert(expr.eval(InternalRow(1L)).asInstanceOf[Boolean])
    assert(expr.eval(InternalRow(42L)).asInstanceOf[Boolean])
    assert(expr.eval(InternalRow(9999L)).asInstanceOf[Boolean])
  }

  test("UnscaledRound12 codegen == eval == the declarative round/cast pipeline") {
    import org.apache.spark.sql.types.DoubleType
    import graft.functions.UnscaledRound12
    val expr = UnscaledRound12(BoundReference(0, DoubleType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    // adversarial values: exact scale-12 ties, near-ties from either side,
    // negatives, zero, subnormal-ish, and hash-derived noise
    val adversarial = Seq(0.0, 1.0, -1.0, 0.5e-12, 1.5e-12, -0.5e-12,
      0.1234567890125, 0.12345678901249999, 0.12345678901250001,
      -0.9999999999995, 1e-13, -1e-13, 0.1, 1.0 / 3.0, math.Pi, -math.E)
    val noise = (0 until 100000).map { i =>
      val h = ((i * 2654435761L) & 0xffffffffL).toDouble / 4294967296.0
      (h - 0.5) * 2000.0 * ((i % 7 + 1) / 7.0)
    }
    (adversarial ++ noise).foreach { x =>
      val fromCodegen = proj(InternalRow(x)).getLong(0)
      val fromInterp = expr.eval(InternalRow(x)).asInstanceOf[Long]
      // the declarative semantics it replaces, step for step
      val y = java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
      val declarative = org.apache.spark.sql.types.Decimal(y)
      assert(declarative.changePrecision(38, 12),
        s"reference cast overflowed for $x")
      val want = declarative.toJavaBigDecimal.unscaledValue().longValueExact()
      assert(fromCodegen == fromInterp && fromInterp == want,
        s"x=$x codegen=$fromCodegen interp=$fromInterp declarative=$want")
    }
    // out-of-range input fails loudly instead of wrapping
    intercept[ArithmeticException] {
      expr.eval(InternalRow(1e7.toDouble))
    }
  }

  test("LuhnRedactCards codegen matches interpreted eval on adversarial strings") {
    import graft.functions.LuhnRedactCards
    val expr = LuhnRedactCards(
      BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val cases = Seq(
      // valid 16-digit Visa test number -> redacted
      "pay 4111111111111111 now",
      // same digits, checksum broken -> untouched
      "pay 4111111111111112 now",
      // 12 digits (too short) and 20 digits (too long) -> untouched
      "a 411111111111 b 41111111111111111111 c",
      // run at string edges, adjacent runs, empty string
      "4111111111111111", "", "x1y2z",
      // valid run embedded between non-digits with no spaces
      "id=4111111111111111;ok")
    for (s <- cases) {
      val in = InternalRow(UTF8String.fromString(s))
      val fromCodegen = proj(in).getUTF8String(0).toString
      val fromInterp = expr.eval(in).asInstanceOf[UTF8String].toString
      assert(fromCodegen == fromInterp, s"codegen != eval for '$s'")
    }
    val redacted = expr.eval(
      InternalRow(UTF8String.fromString("pay 4111111111111111 now")))
      .asInstanceOf[UTF8String].toString
    assert(redacted == "pay <CARD> now")
    val untouched = expr.eval(
      InternalRow(UTF8String.fromString("pay 4111111111111112 now")))
      .asInstanceOf[UTF8String].toString
    assert(untouched == "pay 4111111111111112 now")
  }

  test("JaroWinkler codegen matches eval and the textbook values") {
    import graft.functions.JaroWinkler
    // textbook pairs (Winkler 1990 examples + edge cases)
    def jw(a: String, b: String) = JaroWinkler.similarity(a, b)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    // boost only above 0.7: CRATE/TRACE has prefix 0 -> jw == jaro
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    // below threshold: no boost despite a common prefix
    assert(jw("ABCDEFGHIJ", "ABZZZZZZZZ") == 0.4666666666666666)
    assert(jw("", "abc") == 0.0 && jw("ab", "ba") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    val expr = JaroWinkler(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    for ((a, b) <- Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
        ("", "x"), ("same", "same"))) {
      val in = InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))
      assert(proj(in).getDouble(0) == expr.eval(in).asInstanceOf[Double],
        s"codegen != eval for ($a, $b)")
    }
  }

  test("L2Normalize codegen compiles, matches interpreted eval AND the compositional HOF form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val expr = graft.functions.L2Normalize(
      BoundReference(0, ArrayType(DoubleType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val cases: Seq[Array[Any]] = Seq(
      Array[Any](3.0, 4.0),
      Array[Any](0.0, 0.0, 0.0),              // zero norm: input unchanged
      Array[Any](),                            // empty: norm 0 → unchanged
      Array[Any](1e-8, -2.5, 7.25, 0.125),
      Array[Any](Double.NaN, 1.0),             // NaN propagates per element
      Array[Any](null, 2.0))                   // null element → all-null
    for (c <- cases) {
      val in = InternalRow(new GenericArrayData(c))
      val fromInterp = expr.eval(in)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val fromCodegen = proj(in).getArray(0)
      val n = fromInterp.numElements()
      assert(fromCodegen.numElements() == n)
      for (i <- 0 until n) {
        assert(fromCodegen.isNullAt(i) == fromInterp.isNullAt(i),
          s"null drift at $i for ${c.toSeq}")
        if (!fromInterp.isNullAt(i))
          assert(java.lang.Double.doubleToLongBits(fromCodegen.getDouble(i)) ==
            java.lang.Double.doubleToLongBits(fromInterp.getDouble(i)),
            s"value drift at $i for ${c.toSeq}")
      }
    }
    // bit-parity against the compositional form it replaced, through the
    // full DataFrame path (same fold order ⇒ same doubles)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(64)(Seq.fill(16)(rnd.nextDouble() * 2 - 1)) ++
      Seq(Seq.fill(16)(0.0))
    val df = vecs.toDF("v")
    def hof(v: org.apache.spark.sql.Column) = {
      val nrm = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (a, b) => a + b))
      when(nrm === 0.0, v).otherwise(transform(v, x => x / nrm))
    }
    val rows = df.select(
      graft.ops.Similarity.l2normalize(col("v")).as("native"),
      hof(col("v")).as("compositional")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a.size == b.size)
      a.indices.foreach(i => assert(
        java.lang.Double.doubleToLongBits(a(i)) ==
          java.lang.Double.doubleToLongBits(b(i)),
        s"native/compositional drift at $i"))
    }
  }

  test("TokenQualityStats matches the compositional token-ratio forms bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stop = graft.ops.TextOps.LangMarkers.head._2
    // leading tab (split's leading empty token), unicode, multi-space runs,
    // all-space, empty, stopword-heavy, single token, CR/LF separators
    val texts = Seq(
      "the quick brown fox is in the den",
      "\tleading tab token",
      "  padded  with   spaces  ",
      "", "   ", "\t\n", "one", "ends with newline\n", "a\t",
      "a a a the the of to in is and",
      "naïve café 東京 emoji 😀 mix",
      "line1\nline2\rline3line4\fline5")
    val df = texts.toDF("text")
    def tokensC(c: org.apache.spark.sql.Column) =
      when(length(trim(c)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(c), "\\s+"))
    val w = tokensC(col("text"))
    val rows = df.select(
      graft.functions.TokenQualityStats(spark, col("text"), stop).as("s"),
      size(w).as("nt"),
      size(array_distinct(w)).as("nd"),
      size(filter(w, t => t.isin(stop.map(lit): _*))).as("ns"),
      aggregate(transform(w, t => length(t).cast("long")), lit(0L), _ + _)
        .as("sl")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      val s = r.getStruct(0)
      assert(s.getInt(0) == r.getInt(1), s"n_tokens drift on '$t'")
      assert(s.getInt(1) == r.getInt(2), s"n_distinct drift on '$t'")
      assert(s.getInt(2) == r.getInt(3), s"n_stop drift on '$t'")
      assert(s.getLong(3) == r.getLong(4), s"sum_len drift on '$t'")
    }
    // null text → null struct (UnaryExpression null contract)
    val nr = Seq[Option[String]](None).toDF("text")
      .select(graft.functions.TokenQualityStats(spark, col("text"), stop))
      .collect()
    assert(nr.head.isNullAt(0))
  }

  test("minhash pipeline runs end-to-end with codegen forced (no interpreter fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val docs = Seq(
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumped over the lazy dog"),
        ("c", "completely unrelated text about spark catalyst expressions")
      ).toDF("doc_id", "text")
      val pairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.4)
      assert(pairs.collect().nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
