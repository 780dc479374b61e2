package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-generated testdata.
  *
  * Round 7 broke because the environment regenerated `/root/testdata` with a
  * different parquet encoding for `events.ts` (TIMESTAMP(NANOS)-as-Long →
  * bare timestamp[us] = TIMESTAMP_NTZ) and the loader's type assumption was
  * implicit. This suite makes the assumption executable:
  *
  *  1. every live testdata table loads with the engine's canonical column
  *     types (in particular `ts` is ALWAYS TimestampType after Tables.load);
  *  2. the normalizer maps all three ts encodings ever shipped — nanos-as-
  *     long, µs NTZ, µs UTC — to the same TimestampType instants;
  *  3. the nanos-era `ts div 1000` arithmetic is provably NEVER applied to a
  *     non-Long column.
  */
class TestdataCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every testdata table loads and ts columns are canonical TimestampType") {
    for (name <- Tables.names) {
      val df = Tables.load(spark, sfDir, name)
      assert(df.limit(1).count() == 1, s"$name: empty or unreadable")
      df.schema.fields.filter(_.name == "ts").foreach { f =>
        assert(f.dataType == TimestampType,
          s"$name.ts loaded as ${f.dataType}, want TimestampType")
      }
    }
  }

  test("key column types the engine depends on are stable") {
    def types(name: String): Map[String, DataType] =
      Tables.load(spark, sfDir, name).schema.fields
        .map(f => f.name -> f.dataType).toMap

    val ev = types("events")
    assert(ev("event_id") == LongType && ev("user_id") == LongType)
    assert(ev("event_type") == StringType && ev("value") == DoubleType)
    assert(ev("props") == StringType)

    val doc = types("documents")
    assert(doc("doc_id") == LongType && doc("text") == StringType)

    val emb = types("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding").isInstanceOf[ArrayType],
      s"embeddings.embedding is ${emb("embedding")}, want array")

    val li = types("lineitem")
    assert(li("l_quantity") == DoubleType || li("l_quantity").isInstanceOf[DecimalType],
      s"l_quantity unexpected: ${li("l_quantity")}")
    assert(types("orders")("o_custkey") == LongType)
  }

  test("ts normalizer maps all three historical encodings to identical instants") {
    import spark.implicits._
    // one µs-aligned instant: 2024-03-01T12:34:56.789012Z
    val micros = 1709296496789012L

    // encoding 1: TIMESTAMP(NANOS) read via nanosAsLong → LongType nanos
    val fromNanos = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts"))
    // encoding 2: bare timestamp[us] → TIMESTAMP_NTZ
    val ntzDir = Files.createTempDirectory("graft-canary-ntz").toString
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    val fromNtz = Tables.normalizeTs(spark.read.parquet(ntzDir))
    // encoding 3: µs adjusted-to-UTC → TimestampType (already canonical)
    val utcDir = Files.createTempDirectory("graft-canary-utc").toString
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(utcDir)
    val fromUtc = Tables.normalizeTs(spark.read.parquet(utcDir))

    for ((df, label) <- Seq((fromNanos, "nanos"), (fromNtz, "ntz"), (fromUtc, "utc"))) {
      assert(df.schema("ts").dataType == TimestampType, s"$label: ${df.schema("ts").dataType}")
      val got = df.select(unix_micros(col("ts"))).as[Long].head()
      assert(got == micros, s"$label: instant drifted ($got != $micros)")
    }
  }

  test("nanos-era div-1000 arithmetic is never applied to a non-Long ts") {
    // tsNormalizer is the single routing point: a timestamp column must NOT
    // take the LongType (div 1000) branch, and the NTZ branch must be a pure
    // cast. If someone re-inlines unconditional `ts div 1000` logic, the
    // instant-parity test above fails; this pins the routing itself.
    assert(Tables.tsNormalizer(LongType).isDefined)
    assert(Tables.tsNormalizer(TimestampNTZType).isDefined)
    assert(Tables.tsNormalizer(TimestampType).isEmpty)
    assert(Tables.tsNormalizer(StringType).isEmpty)

    val ntz = Tables.tsNormalizer(TimestampNTZType).get.toString.toLowerCase
    assert(ntz.contains("cast"), s"ntz branch not a cast: $ntz")
    assert(!ntz.contains("div"), s"ntz branch must not divide: $ntz")
  }
}
