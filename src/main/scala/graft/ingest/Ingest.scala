package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.MergeKeys

/** S6 upload ingestion (reference: file_handling/upload.py:47–162 +
  * csv_utils.py:23–227 + security.py:18–152): validate → sanitize column
  * names → derive composite ID → land in the data directory.
  *
  * Deviation from the reference's S7 prepare step: we NEVER rewrite user
  * files in place (SURVEY.md §7.4 #8); sanitization happens on the copy we
  * write into the managed data dir.
  */
object Ingest {

  final case class Validation(errors: Seq[String], warnings: Seq[String]) {
    def ok: Boolean = errors.isEmpty
  }

  val MaxFileBytes: Long = 50L * 1024 * 1024 // 50 MB (csv_utils.py:27)
  val MaxColumns: Int = 1000 // csv_utils.py:72

  /** Duplicate-file conflict (reference upload.py:20–27): an upload whose
    * secure filename already exists in the data dir. */
  final case class DuplicateFile(originalName: String, safeName: String, existingPath: String)

  /** Resolution for a duplicate upload (upload.py:29–33). */
  sealed trait DuplicateAction
  case object Replace extends DuplicateAction
  final case class Rename(newName: String) extends DuplicateAction
  case object Cancel extends DuplicateAction

  /** Duplicate-upload detection (reference upload.py:47–110): partitions
    * candidate uploads into conflicts (secure filename already present in
    * `dataDir`) and the indices of conflict-free ones. */
  def checkDuplicates(
      filenames: Seq[String], dataDir: String): (Seq[DuplicateFile], Seq[Int]) = {
    val dir = java.nio.file.Paths.get(dataDir)
    java.nio.file.Files.createDirectories(dir)
    val results = filenames.zipWithIndex.map { case (name, i) =>
      val safe = graft.report.Sinks.secureFilename(name)
      val target = dir.resolve(safe)
      if (java.nio.file.Files.exists(target))
        Left(DuplicateFile(name, safe, target.toString))
      else Right(i)
    }
    (results.collect { case Left(d) => d }, results.collect { case Right(i) => i })
  }

  /** File-level validation: extension, size cap, basic content security
    * scan for formula-injection prefixes (security.py:18–152). */
  def validateFile(path: java.nio.file.Path, ext: String = ".csv"): Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val name = path.getFileName.toString
    if (!name.toLowerCase.endsWith(ext)) errors += s"Not a $ext file: $name"
    if (!java.nio.file.Files.exists(path)) errors += s"File not found: $name"
    else {
      val size = java.nio.file.Files.size(path)
      if (size > MaxFileBytes) errors += s"File exceeds ${MaxFileBytes / 1024 / 1024} MB: $name"
      if (size == 0) errors += s"Empty file: $name"
    }
    Validation(errors.result(), warnings.result())
  }

  /** Column-name sanitization (csv_utils.py:96–140 / security_utils.py):
    * trim, non-alphanumerics → underscore, numeric-leading names prefixed,
    * length-capped at 64, de-duplicated with numeric suffixes. */
  def sanitizeColumnNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map[String, Int]()
    names.map { raw =>
      var n = raw.trim.replaceAll("[^A-Za-z0-9_]", "_")
        .replaceAll("_{2,}", "_").stripPrefix("_").stripSuffix("_")
      if (n.isEmpty) n = "col"
      if (n.head.isDigit) n = "c_" + n
      if (n.length > 64) n = n.substring(0, 64)
      seen.get(n.toLowerCase) match {
        case Some(k) =>
          seen(n.toLowerCase) = k + 1
          s"${n}_$k"
        case None =>
          seen(n.toLowerCase) = 1
          n
      }
    }
  }

  /** DataFrame-level validation: column cap, duplicate headers, cell-level
    * formula-injection scan on string columns. */
  def validateDataFrame(df: DataFrame): Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val cols = df.columns.toSeq
    if (cols.length > MaxColumns) errors += s"More than $MaxColumns columns (${cols.length})"
    val dups = cols.groupBy(_.toLowerCase).filter(_._2.length > 1).keys.toSeq.sorted
    if (dups.nonEmpty) warnings += s"Duplicate headers (case-insensitive): ${dups.mkString(", ")}"

    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.nonEmpty) {
      val checks = stringCols.map(c =>
        sum(when(col(c).rlike("^[=+@\\t\\r-]"), 1L).otherwise(0L)).as(c))
      val row = df.agg(checks.head, checks.tail: _*).head()
      stringCols.foreach { c =>
        val hits = Option(row.getAs[Any](c)).fold(0L)(_.asInstanceOf[Long])
        if (hits > 0) warnings += s"Column '$c': $hits cells start with a formula-injection character"
      }
    }
    Validation(errors.result(), warnings.result())
  }

  /** Full ingestion: validate file → load with sanitized headers → derive
    * composite ID when longitudinal → write CSV into `dataDir` under the
    * sanitized table name. Returns (validation, landed path). */
  def ingestCsv(
      spark: SparkSession,
      sourcePath: String,
      dataDir: String,
      keys: MergeKeys,
      /** Conflict policy when the secure filename already exists in
        * `dataDir` (upload.py:29–33, 47–110): Replace overwrites, Rename
        * lands under the given name, Cancel rejects the upload. */
      onDuplicate: DuplicateAction = Replace): (Validation, Option[String]) =
    ingest(spark, sourcePath, dataDir, keys, onDuplicate, jsonl = false)

  /** JSONL twin of [[ingestCsv]] (catalog extension — the corpus
    * interchange format [[graft.catalog.TableCatalog]] scans): identical
    * validate → sanitize-field-names → composite-ID → land flow, reading
    * JSON-Lines and landing a `.jsonl` the catalog serves directly. */
  def ingestJsonl(
      spark: SparkSession,
      sourcePath: String,
      dataDir: String,
      keys: MergeKeys,
      onDuplicate: DuplicateAction = Replace): (Validation, Option[String]) =
    ingest(spark, sourcePath, dataDir, keys, onDuplicate, jsonl = true)

  private def ingest(
      spark: SparkSession,
      sourcePath: String,
      dataDir: String,
      keys: MergeKeys,
      onDuplicate: DuplicateAction,
      jsonl: Boolean): (Validation, Option[String]) = {
    val ext = if (jsonl) ".jsonl" else ".csv"
    val src = java.nio.file.Paths.get(sourcePath)
    val fileCheck = validateFile(src, ext)
    if (!fileCheck.ok) return (fileCheck, None)

    val (dups, _) = checkDuplicates(Seq(src.getFileName.toString), dataDir)
    val renamedTo: Option[String] = if (dups.nonEmpty) onDuplicate match {
      case Cancel => return (Validation(
        Seq(s"Duplicate file: ${dups.head.safeName} already exists in $dataDir"),
        fileCheck.warnings), None)
      case Rename(newName) => Some(newName)
      case Replace => None
    } else None

    val raw =
      if (jsonl) spark.read.option("mode", "PERMISSIVE").json(sourcePath)
      else spark.read.option("header", "true").option("inferSchema", "true")
        .option("mode", "PERMISSIVE").csv(sourcePath)
    val renamed = raw.toDF(sanitizeColumnNames(raw.columns.toSeq): _*)
    val dfCheck = validateDataFrame(renamed)
    if (!dfCheck.ok) return (dfCheck, None)

    val withComposite = (keys.compositeId, keys.sessionId) match {
      case (Some(comp), Some(sess))
          if keys.isLongitudinal
            && renamed.columns.contains(keys.primaryId)
            && renamed.columns.contains(sess)
            && !renamed.columns.contains(comp) =>
        renamed.withColumn(comp,
          concat(col(keys.primaryId).cast(StringType), lit("_"), col(sess).cast(StringType)))
      case _ => renamed
    }

    val stem = graft.report.Sinks
      .secureFilename(renamedTo.getOrElse(src.getFileName.toString))
      .stripSuffix(ext)
    val target = s"$dataDir/$stem$ext"
    // Re-validate the FINAL landing name at write time (the reference
    // re-validates the resolved name; this also narrows the check→write
    // TOCTOU window): without it, Rename('existing.csv') silently overwrites
    // that file — Replace semantics under a Rename policy. Only an explicit
    // Replace may overwrite.
    if (onDuplicate != Replace
        && java.nio.file.Files.exists(java.nio.file.Paths.get(target)))
      return (Validation(
        Seq(s"Duplicate file: $stem$ext already exists in $dataDir" +
          renamedTo.fold("")(n => s" (rename target '$n' conflicts)")),
        fileCheck.warnings ++ dfCheck.warnings), None)
    if (jsonl) graft.report.Sinks.jsonlExport(withComposite, target)
    else graft.report.Sinks.csvExport(withComposite, target)
    (Validation(Seq.empty, fileCheck.warnings ++ dfCheck.warnings), Some(target))
  }
}
