package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata (TESTDATA.md): TPC-H-ish star schema +
  * `events`/`documents`/`embeddings`, one parquet per table under a sf dir.
  *
  * Parquet scans are columnar and Catalyst prunes columns/pushes filters into
  * the scan, so per-query `spark.read.parquet` is cheap (footer metadata is
  * cached by the shared FileStatusCache); no driver-side caching layer needed
  * here. The reference's CSV-directory catalog lives in [[graft.catalog.TableCatalog]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  // Gate-mode memo: Verify runs 93 queries against the same handful of
  // tables in one session, so it opts into a shared (sfDir, table) →
  // persisted-DataFrame map (decode each table once instead of per entry).
  // Single-session only by construction — only Verify flips the switch;
  // Bench deliberately does NOT (it clearCache()s between queries to keep
  // timings cold, and a memoized handle would silently re-cache).
  private val cacheOn = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Enable the single-session shared table cache (gate/Verify mode). */
  def enableSharedCache(): Unit = cacheOn.set(true)

  /** True in gate/Verify mode. Gates use it to run EXTRA verification
    * work (differentials against an exact twin) that must not ride into
    * Bench's timed window — the bench line times the production path,
    * the gate proves it correct. */
  def gateMode: Boolean = cacheOn.get

  /** The events table's `ts` column has shipped under three parquet
    * encodings across testdata generations, and the engine canonicalizes
    * every one of them to a microsecond-precision `TimestampType` column:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; the legacy
    *    escape hatch reads nanos as Long and we integer-divide to µs
    *    (DuckDB's ns→µs cast truncates identically).
    *  - timestamp[us] with no UTC flag → Spark reads TIMESTAMP_NTZ; the
    *    session TZ is pinned UTC, so a cast to TimestampType is a pure
    *    type-tag change — identical instants, DuckDB hash-parity preserved.
    *  - timestamp[us] adjusted-to-UTC → already TimestampType; untouched.
    *
    * TestdataCanarySpec pins this contract against the live testdata. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (!cacheOn.get) loadRaw(spark, sfDir, name)
    else memo.computeIfAbsent((sfDir, name),
      _ => loadRaw(spark, sfDir, name).persist())

  /** Canonicalizing expression for one `ts` encoding (see [[load]]);
    * `None` = the column is already canonical (or absent). Shared with
    * StreamingSpec so batch and stream readers normalize identically. */
  def tsNormalizer(dt: DataType): Option[Column] = dt match {
    // integer division — a double divide here loses 1µs on some values
    case LongType         => Some(timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => Some(col("ts").cast(TimestampType))
    case _                => None
  }

  /** Apply [[tsNormalizer]] to a frame's `ts` column if one is present. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts")
      .flatMap(f => tsNormalizer(f.dataType))
      .map(e => df.withColumn("ts", e))
      .getOrElse(df)

  private def loadRaw(
      spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path(sfDir, name)))
  }
}
