package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** The events table is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright; the legacy escape hatch reads nanos as Long,
    * and we convert to a microsecond TimestampType column (the data is
    * µs-aligned; DuckDB's ns→µs cast truncates identically). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (!cacheOn.get) loadRaw(spark, sfDir, name)
    else memo.computeIfAbsent((sfDir, name),
      _ => loadRaw(spark, sfDir, name).persist())

  private def loadRaw(
      spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(sfDir, name))
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integer division — a double divide here loses 1µs on some values
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
