package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))
}
