package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{EngineConfig, MergeKeys}

/** Per-table metadata derived from one schema read + one aggregate pass
  * (reference: data_handling/metadata.py:87–178, but single-pass instead of
  * 100-row samples + 10k-row chunks — Spark's scan is the sample). */
final case class TableMeta(
    name: String,
    columns: Seq[String],
    /** column -> Spark DataType simple name; the engine's effective type
      * lattice is numeric vs categorical vs boolean (SURVEY.md §1.2). */
    dtypes: Map[String, String],
    numericColumns: Seq[String],
    /** column -> (min, max) over try-cast-to-double values (coerce-to-null
      * semantics, metadata.py:160). */
    numericRanges: Map[String, (Double, Double)])

/** The "directory of files is the database" catalog
  * (reference: data_handling/metadata.py + merge_strategy.py).
  *
  * - Scans `config.dataDir` for `*.csv` / `*.parquet` / `*.jsonl` /
  *   `*.orc` / `*.xml`; table name = file stem (metadata.py:32–50; the extra formats are
  *   our extensions — the corpus interchange format a training-data
  *   pipeline actually receives, and the columnar format half the
  *   warehouse world writes).
  * - Loads each table once and caches the DataFrame; invalidated when the
  *   directory's max mtime changes.
  *
  *   '''Cache-keying deviation (documented):''' the reference keeps a
  *   process-global FIFO(4) of metadata snapshots keyed on
  *   `(config md5, dir mtime)` (metadata.py:269–304), so ONE process can
  *   interleave several configs over the same directory and hit cache for
  *   each. Here the snapshot lives per `TableCatalog` INSTANCE (keyed on
  *   dir mtime only) and each instance binds exactly one `EngineConfig` —
  *   config-keying is therefore structural rather than hashed: running two
  *   configs over one directory means holding two catalog instances, each
  *   with its own snapshot. Same hit behavior as the reference for any
  *   fixed set of configs, without a global cache to size or invalidate;
  *   the difference is only that snapshots are not shared across instances
  *   built with an identical config.
  * - Detects cross-sectional vs longitudinal structure from the hub
  *   (demographics) schema via the reference's fallback ladder
  *   (merge_strategy.py:79–115).
  * - Derives the composite ID (`primary + "_" + session`) as a **computed
  *   column at load** — the reference rewrites user CSVs in place
  *   (merge_strategy.py:117–192); we deliberately do not mutate inputs
  *   (SURVEY.md §7.4 #8).
  *
  * Scale: storage format is pluggable (CSV for reference parity, Parquet for
  * the 100 TB path); all metadata comes from `df.schema` (free) plus one
  * column-pruned aggregate per table for ranges.
  */
final class TableCatalog(
    spark: SparkSession,
    val config: EngineConfig,
    /** Opt-in bucketed layout (SURVEY.md §7.4 #13): when set, [[table]]
      * serves merge-keyed tables from bucketed+sorted parquet so
      * [[graft.query.CohortQuery.basePlan]] runs the star join with zero
      * exchange (measured 2.3–5.5× at 1×–100× of sf0.1 — README
      * §bucketed-layout crossover). Tables without the merge column are
      * served raw. */
    val layout: Option[BucketedLayout] = None) {

  /** The same catalog with a bucketed layout attached (fresh snapshot). */
  def withLayout(l: BucketedLayout): TableCatalog =
    new TableCatalog(spark, config, Some(l))

  private val dir: Path = Paths.get(config.dataDir)

  /** One immutable view of the directory: the DataFrames, the detected
    * merge keys, and a PER-TABLE content version (mtime+size of that
    * table's file) — so layout maintenance is per-table, not per-catalog:
    * a daily ingest touching one table re-buckets ONE table, not all of
    * them (the maintain-once economics that matter at 100 TB). */
  private final case class Snapshot(
      version: Long,
      tables: Map[String, DataFrame],
      keys: MergeKeys,
      tableVersions: Map[String, String])

  @volatile private var snapshot: Option[Snapshot] = None

  /** Content version: for a table directory, fold every contained parquet
    * file's (mtime, size) — recursively, so Hive-partition subdirectories
    * count — because an in-place rewrite OR an added/removed slice must
    * invalidate caches and a directory's own mtime only tracks the latter. */
  private def fileVersion(p: Path): String =
    if (Files.isDirectory(p))
      // Using closes the walk stream (its directory fds) even on throw —
      // a long-lived session over partitioned trees must not leak handles
      // until GC (r9 ADVICE)
      Using.resource(Files.walk(p)) { st =>
        st.iterator().asScala
          .filter(c => Files.isRegularFile(c) &&
            c.getFileName.toString.endsWith(".parquet"))
          .map(c => p.relativize(c).toString ->
            s"${Files.getLastModifiedTime(c).toMillis}x${Files.size(c)}")
          .toSeq.sortBy(_._1).map(_._2)
          .mkString("d", "_", "")
      }
    else s"${Files.getLastModifiedTime(p).toMillis}x${Files.size(p)}"

  private def pathMtime(p: Path): Long =
    if (Files.isDirectory(p))
      Using.resource(Files.walk(p)) { st =>
        st.iterator().asScala
          .map(c => Files.getLastModifiedTime(c).toMillis)
          .foldLeft(Files.getLastModifiedTime(p).toMillis)(_ max _)
      }
    else Files.getLastModifiedTime(p).toMillis

  private def dirVersion(): Long =
    if (!Files.isDirectory(dir)) 0L
    else {
      val files = listFiles() // once — each call walks every table dir
      files.map(pathMtime).foldLeft(files.size.toLong)(_ max _)
    }

  /** True when `p` is a directory serving one table: parquet slices as
    * direct children, or Hive-style `key=value` partition subdirectories
    * holding parquet (nested partitioning included — Spark's reader
    * discovers the full tree). */
  private def isTableDir(p: Path): Boolean = {
    val children = Using.resource(Files.list(p))(_.iterator().asScala.toSeq)
    children.exists(_.getFileName.toString.endsWith(".parquet")) ||
      children.exists { c =>
        Files.isDirectory(c) && c.getFileName.toString.contains("=") &&
          Using.resource(Files.walk(c))(_.iterator().asScala.exists(f =>
            Files.isRegularFile(f) &&
              f.getFileName.toString.endsWith(".parquet")))
      }
  }

  /** Table sources: single files by extension, plus SUBDIRECTORIES holding
    * parquet slices or Hive partitions (one table per directory — see
    * [[loadRaw]]). Hidden/underscore names are skipped. */
  private def listFiles(): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          if (n.startsWith(".") || n.startsWith("_")) false
          else if (Files.isDirectory(p)) isTableDir(p)
          else
            n.endsWith(".csv") || n.endsWith(".parquet") ||
              n.endsWith(".jsonl") || n.endsWith(".orc") ||
              n.endsWith(".xml")
        }
        .toSeq.sortBy(_.getFileName.toString)
    }

  private def stem(p: Path): String = {
    val n = p.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot < 0) n else n.substring(0, dot)
  }

  private def loadRaw(p: Path): DataFrame = {
    val name = p.getFileName.toString
    if (Files.isDirectory(p)) {
      // A directory of parquet slices is ONE table. mergeSchema=true makes
      // the scan schema the union-by-name of every footer, so month-over-
      // month schema drift (a column added to new slices) reads as nulls in
      // old slices instead of failing the scan or silently dropping the
      // column (Spark's default takes one footer). Footer merging costs one
      // metadata pass; data is still pruned/pushed per file as usual.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.Tables.normalizeTs(
        spark.read.option("mergeSchema", "true").parquet(p.toString))
    } else if (name.endsWith(".parquet")) {
      // TIMESTAMP(NANOS) parquet is rejected by Spark's reader (read nanos
      // as Long), and bare timestamp[us] arrives as TIMESTAMP_NTZ; both are
      // canonicalized to TimestampType by the shared normalizer
      // (see graft.Tables.load).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.Tables.normalizeTs(spark.read.parquet(p.toString))
    } else if (name.endsWith(".orc"))
      // ORC columnar scan — schema comes from the file footer like
      // parquet's; the shared ts normalizer keeps timestamp semantics
      // identical across all four source formats
      graft.Tables.normalizeTs(spark.read.orc(p.toString))
    else if (name.endsWith(".xml"))
      // Spark 4's built-in XML source; <rows><row>...</row></rows> by the
      // Sinks.xmlExport convention (rowTag is mandatory for XML — there is
      // no self-describing record delimiter). Schema inferred like JSON.
      spark.read.format("xml").option("rowTag", "row").load(p.toString)
    else if (name.endsWith(".jsonl"))
      // JSON-Lines corpus format (inferred schema, one object per line);
      // PERMISSIVE keeps malformed lines as nulls instead of failing the
      // scan — same forgiving posture as the CSV path
      spark.read.option("mode", "PERMISSIVE").json(p.toString)
    else
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("mode", "PERMISSIVE")
        .csv(p.toString)
  }

  /** Structure-detection ladder (merge_strategy.py:85–110): longitudinal iff
    * hub has primary+session; else primary alone; else an existing composite
    * column; else the first `*id*`/`*ursi*` column; else fail. */
  private[catalog] def detectStructure(hubColumns: Seq[String]): MergeKeys = {
    val hasPrimary = hubColumns.contains(config.primaryIdColumn)
    val hasSession = hubColumns.contains(config.sessionColumn)
    val hasComposite = hubColumns.contains(config.compositeIdColumn)
    if (hasPrimary && hasSession)
      MergeKeys(config.primaryIdColumn, Some(config.sessionColumn),
        Some(config.compositeIdColumn), isLongitudinal = true)
    else if (hasPrimary) MergeKeys(config.primaryIdColumn)
    else if (hasComposite) MergeKeys(config.compositeIdColumn)
    else hubColumns.find(c =>
      c.toLowerCase.contains("id") || c.toLowerCase.contains("ursi")) match {
      case Some(c) => MergeKeys(c)
      case None => throw new IllegalStateException(
        s"No suitable ID column found in ${config.demographicsTable}")
    }
  }

  /** Composite-ID derivation as a computed column: `concat(primary, '_',
    * session)` over string casts — matches pandas `astype(str)` + `'_'`-join
    * (merge_strategy.py:147–150) for string and integer IDs. */
  private def withCompositeId(df: DataFrame, keys: MergeKeys): DataFrame =
    (keys.compositeId, keys.sessionId) match {
      case (Some(comp), Some(sess))
          if keys.isLongitudinal
            && df.columns.contains(keys.primaryId)
            && df.columns.contains(sess)
            && !df.columns.contains(comp) =>
        df.withColumn(comp,
          concat(col(keys.primaryId).cast(StringType), lit("_"), col(sess).cast(StringType)))
      case _ => df
    }

  private def build(): Snapshot = {
    val version = dirVersion()
    val files = listFiles()
    val raw = files.map(p => stem(p) -> loadRaw(p)).toMap
    val hub = raw.getOrElse(config.demographicsTable,
      throw new IllegalStateException(
        s"Hub table '${config.demographicsTable}' not found in ${config.dataDir}"))
    val keys = detectStructure(hub.columns.toSeq)
    val tables = raw.map { case (n, df) => n -> withCompositeId(df, keys) }
    Snapshot(version, tables, keys,
      files.map(p => stem(p) -> fileVersion(p)).toMap)
  }

  private def current(): Snapshot = {
    val v = dirVersion()
    snapshot match {
      case Some(s) if s.version == v => s
      case _ =>
        synchronized {
          snapshot match {
            case Some(s) if s.version == v => s
            case _ =>
              val s = build(); snapshot = Some(s); s
          }
        }
    }
  }

  def mergeKeys: MergeKeys = current().keys

  def tableNames: Seq[String] = current().tables.keys.toSeq.sorted

  def behavioralTableNames: Seq[String] =
    tableNames.filterNot(_ == config.demographicsTable)

  private val bucketedMemo =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  def table(name: String): DataFrame = {
    val snap = current()
    val raw = snap.tables.getOrElse(name,
      throw new IllegalArgumentException(s"Unknown table '$name'"))
    layout match {
      case Some(l) if raw.columns.contains(snap.keys.mergeColumn) =>
        // coarse lock: concurrent gate entries sharing one catalog must not
        // race the one-time bucketed write (ensureBucketed's exists-check is
        // check-then-act); reads after materialization stay on the fast map
        val tv = snap.tableVersions(name)
        bucketedMemo.get((tv, name)).getOrElse(synchronized {
          bucketedMemo.getOrElseUpdate((tv, name), {
            // Session-catalog table name keyed on THIS TABLE's content
            // version (mtime+size): a regenerated file can never serve
            // stale buckets (the old bucketed table is orphaned in the
            // scratch warehouse), and tables that did NOT change keep
            // their existing buckets — per-table layout maintenance.
            val safe = name.replaceAll("[^A-Za-z0-9_]", "_").toLowerCase
            Layout.ensureBucketed(spark, raw, snap.keys.mergeColumn, l.buckets,
              l.warehouseDir, s"${l.namePrefix}_${safe}_v$tv")
          })
        })
      case _ => raw
    }
  }

  def demographics: DataFrame = table(config.demographicsTable)

  /** Catalog validation replaces the reference's SQL-identifier sanitization
    * (security_utils.py): user-supplied names must exist in the catalog. */
  def validateColumn(tableName: String, column: String): Unit = {
    val df = table(tableName)
    if (!df.columns.contains(column))
      throw new IllegalArgumentException(
        s"Unknown column '$column' in table '$tableName'")
  }

  /** Distinct session values of the hub, sorted as strings
    * (metadata.py:435–467). Deviation: on empty/missing we report none
    * instead of the reference's hardcoded ['1','2','3','4'] fallback
    * (SURVEY.md §7.4 #12). */
  def sessionValues: Seq[String] = {
    val keys = mergeKeys
    keys.sessionId match {
      case Some(s) if demographics.columns.contains(s) =>
        demographics.select(col(s).cast(StringType).as(s))
          .na.drop().distinct()
          .collect().map(_.getString(0)).toSeq.sorted
      case _ => Seq.empty
    }
  }

  /** One-pass metadata for a table: schema-derived columns/dtypes plus a
    * single aggregate for all numeric ranges (vs the reference's chunked
    * 10k-row loop, metadata.py:131–178). ID columns are excluded from the
    * numeric set (metadata.py:96–101). */
  def meta(name: String): TableMeta = {
    val df = table(name)
    val keys = mergeKeys
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !keys.idColumns(f.name) => f.name
    }.toSeq
    val ranges: Map[String, (Double, Double)] =
      if (numericCols.isEmpty) Map.empty
      else {
        val aggs = numericCols.flatMap(c => Seq(
          min(col(c).cast(DoubleType)).as(s"min__$c"),
          max(col(c).cast(DoubleType)).as(s"max__$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numericCols.flatMap { c =>
          val lo = row.getAs[Any](s"min__$c")
          val hi = row.getAs[Any](s"max__$c")
          if (lo == null || hi == null) None
          else Some(c -> (
            lo.asInstanceOf[Number].doubleValue(),
            hi.asInstanceOf[Number].doubleValue()))
        }.toMap
      }
    TableMeta(name, df.columns.toSeq, dtypes, numericCols, ranges)
  }

  /** [[meta]] with the numeric ranges served from a [[StatsStore]] sketch
    * log instead of a full-table scan — the 100 TB form of the reference's
    * chunked min/max metadata pass (metadata.py): each ingest batch
    * appended its own sketch, so current ranges cost a read of the
    * KB-sized log. Columns the store has never sketched simply have no
    * range (same contract as all-null columns in [[meta]]). Schema-derived
    * fields still come from the (free) header read. */
  def metaFromStore(name: String, statsDir: String): TableMeta = {
    val df = table(name)
    val keys = mergeKeys
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !keys.idColumns(f.name) => f.name
    }.toSeq
    val stats = StatsStore.read(spark, statsDir)
      .select(col("col_name"), col("min_v"), col("max_v")).collect()
    val ranges = stats.flatMap { r =>
      val c = r.getAs[String]("col_name")
      if (!numericCols.contains(c) || r.isNullAt(1) || r.isNullAt(2)) None
      else Some(c -> (r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))
    }.toMap
    TableMeta(name, df.columns.toSeq, dtypes, numericCols, ranges)
  }
}
