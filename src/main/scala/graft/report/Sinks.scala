package graft.report

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

import graft.core.MergeKeys
import graft.stats.{ColumnStats, Correlation, DataQuality, FilterFunnel}

/** Report sinks (SURVEY.md §2.1 S8/S9/S11):
  *  - S8 CSV export with secure filenames;
  *  - S9 ZIP bundle of filtering report + final summary;
  *  - S11 data-profile JSON (T4 composition) — rendered with a tiny
  *    dependency-free JSON writer.
  */
object Sinks {

  /** Scratch-dir cleanup shared by the single-file exporters: after the
    * part file moves to its target, the temp dir still holds _SUCCESS and
    * checksum droppings — repeated exports must not accumulate them. */
  private def deleteRecursively(dir: Path): Unit =
    graft.core.Fs.deleteRecursively(dir)

  /** Filename sanitization (reference file_handling/security.py:36–49):
    * path components stripped, non [A-Za-z0-9._-] replaced, length-capped. */
  def secureFilename(name: String): String = {
    val base = name.replaceAll("^.*[/\\\\]", "")
    val cleaned = base.replaceAll("[^A-Za-z0-9._-]", "_")
      .replaceAll("_{2,}", "_").replaceAll("^[._]+", "")
    val capped = if (cleaned.length > 120) cleaned.substring(0, 120) else cleaned
    if (capped.isEmpty) "export.csv" else capped
  }

  /** S8: write a DataFrame as ONE headered CSV file at `outFile`.
    * `coalesce(1)` is a deliberate single-file download semantic (the
    * reference serves a browser download); large exports should use
    * `df.write.csv` with natural partitioning instead. */
  def csvExport(df: DataFrame, outFile: String): Path = {
    val target = Paths.get(outFile).toAbsolutePath
    val tmp = Files.createTempDirectory("graft-csv-export")
    try {
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException("no csv part written"))
      Files.createDirectories(target.getParent)
      Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursively(tmp) // _SUCCESS/.crc droppings + the dir
    target
  }

  /** Write a DataFrame as ONE JSON-Lines file at `outFile` (the corpus
    * interchange format every training-data pipeline speaks). Same
    * single-file download semantic as [[csvExport]]; large exports should
    * use `df.write.json` with natural partitioning. */
  def jsonlExport(df: DataFrame, outFile: String): Path = {
    val target = Paths.get(outFile).toAbsolutePath
    val tmp = Files.createTempDirectory("graft-jsonl-export")
    try {
      df.coalesce(1).write.mode("overwrite").json(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException("no json part written"))
      Files.createDirectories(target.getParent)
      Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursively(tmp) // _SUCCESS/.crc droppings + the dir
    target
  }

  /** Write a DataFrame as ONE XML file at `outFile` (Spark 4's built-in
    * XML source; `<rows><row>…</row></rows>` by convention — the rowTag
    * the catalog's `.xml` discovery reads back). Same single-file
    * download semantic as [[csvExport]]. */
  def xmlExport(df: DataFrame, outFile: String,
      rowTag: String = "row"): Path = {
    val target = Paths.get(outFile).toAbsolutePath
    val tmp = Files.createTempDirectory("graft-xml-export")
    try {
      df.coalesce(1).write.mode("overwrite")
        .format("xml").option("rowTag", rowTag).option("rootTag", "rows")
        .save(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException("no xml part written"))
      Files.createDirectories(target.getParent)
      Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursively(tmp)
    target
  }

  /** Write a DataFrame as ONE ORC file at `outFile` (the columnar
    * interchange format for Hive-lineage warehouses). Same single-file
    * download semantic as [[csvExport]]; large exports should use
    * `df.write.orc` with natural partitioning. */
  def orcExport(df: DataFrame, outFile: String): Path = {
    val target = Paths.get(outFile).toAbsolutePath
    val tmp = Files.createTempDirectory("graft-orc-export")
    try {
      df.coalesce(1).write.mode("overwrite").orc(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException("no orc part written"))
      Files.createDirectories(target.getParent)
      Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursively(tmp) // _SUCCESS/.crc droppings + the dir
    target
  }

  /** Render a small (driver-side) DataFrame to CSV text — for the report
    * bundle's summary tables, which are inherently small. */
  def toCsvString(df: DataFrame): String = {
    val sb = new StringBuilder
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") || s.contains("\n") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case other => other.toString
    }
    sb.append(df.columns.mkString(",")).append('\n')
    df.collect().foreach { row =>
      sb.append((0 until row.length).map(i => cell(row.get(i))).mkString(",")).append('\n')
    }
    sb.toString
  }

  /** S9: bundle named CSV texts into a ZIP at `outFile`. */
  def zipReport(outFile: String, entries: Seq[(String, String)]): Path = {
    val target = Paths.get(outFile).toAbsolutePath
    Files.createDirectories(target.getParent)
    val zos = new ZipOutputStream(new FileOutputStream(target.toFile))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(secureFilename(name)))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
    target
  }

  // ---------- tiny JSON writer ----------

  sealed trait Json
  object Json {
    final case class JStr(v: String) extends Json
    final case class JNum(v: Double) extends Json
    final case class JBool(v: Boolean) extends Json
    case object JNull extends Json
    final case class JArr(v: Seq[Json]) extends Json
    final case class JObj(v: Seq[(String, Json)]) extends Json

    def render(j: Json): String = j match {
      case JStr(s) => "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString } + "\""
      case JNum(d) =>
        if (d.isNaN || d.isInfinite) "null"
        else if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
        else d.toString
      case JBool(b) => b.toString
      case JNull => "null"
      case JArr(xs) => xs.map(render).mkString("[", ",", "]")
      case JObj(fields) => fields.map { case (k, v) =>
        render(JStr(k)) + ":" + render(v) }.mkString("{", ",", "}")
    }

    def num(v: Option[Double]): Json = v.fold[Json](JNull)(JNum)
    def lng(v: Option[Long]): Json = v.fold[Json](JNull)(x => JNum(x.toDouble))
  }

  /** T4 composed data profile: T1 column stats + T2 pearson correlations +
    * T3 quality report over one frame (reference analysis/statistics.py:
    * 409–492), with the reference's optional seeded n-row sample
    * (pages/profiling.py:291–293 — `random_state=42`). */
  /** One interaction pane: a 2-D equal-width histogram between two numeric
    * columns, `grid(binX)(binY)` = row count. */
  final case class Interaction(col1: String, col2: String, grid: Seq[Seq[Long]])

  /** One categorical pane: the column's top-k values with counts, or
    * `highCardinality = true` (and no table) when the column exceeded the
    * distinct-value guard. */
  final case class CategoryTable(
      column: String, values: Seq[(String, Long)], highCardinality: Boolean)

  final case class Profile(
      rowCount: Long,
      columnCount: Int,
      columns: Seq[ColumnStats.Stats],
      correlations: Seq[Correlation.Pair],
      quality: DataQuality.Report,
      histograms: Map[String, Seq[Long]] = Map.empty,
      interactions: Seq[Interaction] = Seq.empty,
      categories: Seq[CategoryTable] = Seq.empty)

  /** Profiling modes (reference pages/profiling.py:74–77): `Minimal` skips
    * the expensive passes (correlations, quality report) and keeps per-column
    * statistics only; `Full` is the complete profile; `Explorative` is the
    * reference's deep mode — it additionally computes pairwise interaction
    * histograms (ydata-profiling's interaction plots) over the numeric
    * columns, capped at the first [[MaxInteractionCols]] columns. */
  sealed trait ProfileMode
  object ProfileMode {
    case object Minimal extends ProfileMode
    case object Full extends ProfileMode
    case object Explorative extends ProfileMode
  }

  /** The reference's sample-size slider bounds (pages/profiling.py:279–345:
    * user-chosen 1,000–20,000 rows). UI layers should offer this range; the
    * library honors whatever `sampleN` the caller passes. */
  val MinSampleN = 1000
  val MaxSampleN = 20000

  /** Explorative interactions cover at most this many numeric columns
    * (C(8,2)=28 panes; ydata-profiling applies a similar practical cap) —
    * the single interaction pass shuffles ≤ pairs·nBins² rows, so the cap
    * bounds the pane count, not a scale risk. */
  val MaxInteractionCols = 8

  def profile(
      df: DataFrame,
      keys: MergeKeys,
      numericCols: Seq[String],
      sampleN: Option[Int] = None,
      seed: Long = 42,
      mode: ProfileMode = ProfileMode.Full,
      categoricalCols: Seq[String] = Seq.empty): Profile = {
    val base = sampleN match {
      case Some(n) =>
        val total = df.count()
        if (total <= n) df
        // Fraction clamped to 1.0: with n < total < 1.1·n the 1.1 oversample
        // factor (which keeps limit(n) honest) would exceed 1.0 and Spark's
        // Sample node rejects fractions > 1 without replacement.
        else df.sample(withReplacement = false,
          math.min(1.0, n.toDouble / total * 1.1), seed).limit(n)
      case None => df
    }
    val minimal = mode == ProfileMode.Minimal
    val stats = if (numericCols.isEmpty) Seq.empty
      else ColumnStats.describe(base, numericCols)
    val corr = if (minimal || numericCols.size < 2) Seq.empty
      else Correlation.pearson(base, numericCols)
    val quality =
      if (minimal) DataQuality.Report(Seq.empty, 0L, 0L, Seq.empty, Seq.empty)
      else DataQuality.report(base, keys)
    // Per-column bars for the HTML report (ydata-profiling shows these in
    // its per-variable panes); minimal mode keeps the cheap passes only.
    val hists =
      if (minimal || stats.isEmpty) Map.empty[String, Seq[Long]]
      else ColumnStats.equiWidthHistograms(base, stats)
    val interactions =
      if (mode != ProfileMode.Explorative || stats.size < 2) Seq.empty
      else {
        val cols = stats.map(_.column).take(MaxInteractionCols)
        ColumnStats.interactionHistograms(
            base, stats, cols.combinations(2).map(p => (p(0), p(1))).toSeq)
          .map { case (x, y, grid) => Interaction(x, y, grid) }
      }
    val categories =
      if (minimal || categoricalCols.isEmpty) Seq.empty
      else {
        val (tables, high) =
          ColumnStats.categoricalFrequencies(base, categoricalCols)
        categoricalCols.map(c =>
          CategoryTable(c, tables.getOrElse(c, Seq.empty), high.contains(c)))
      }
    Profile(base.count(), base.columns.length, stats, corr, quality, hists,
      interactions, categories)
  }

  /** S11/T4: composed data profile (column stats + correlations + quality)
    * as a JSON document. */
  def profileJson(df: DataFrame, keys: MergeKeys, numericCols: Seq[String]): String =
    renderProfileJson(profile(df, keys, numericCols))

  def renderProfileJson(p: Profile): String = {
    import Json._
    val stats = p.columns
    val corr = p.correlations
    val quality = p.quality

    val doc = JObj(Seq(
      "row_count" -> JNum(p.rowCount.toDouble),
      "column_count" -> JNum(p.columnCount.toDouble),
      "columns" -> JArr(stats.map(s => JObj(Seq(
        "column" -> JStr(s.column), "n" -> JNum(s.n.toDouble),
        "nulls" -> JNum(s.nulls.toDouble), "distinct" -> JNum(s.distinct.toDouble),
        "mean" -> num(s.mean), "std" -> num(s.std),
        "min" -> num(s.min), "max" -> num(s.max),
        "q25" -> num(s.q25), "median" -> num(s.median), "q75" -> num(s.q75),
        "skew" -> num(s.skew), "kurt" -> num(s.kurt),
        "iqr_outliers" -> lng(s.iqrOutliers))))),
      "correlations" -> JArr(corr.map(p => JObj(Seq(
        "col1" -> JStr(p.col1), "col2" -> JStr(p.col2),
        "r" -> num(p.r), "n" -> JNum(p.n.toDouble))))),
      "interactions" -> JArr(p.interactions.map(ix => JObj(Seq(
        "col1" -> JStr(ix.col1), "col2" -> JStr(ix.col2),
        "n_bins" -> JNum(ix.grid.size.toDouble),
        // Sparse (bin_x, bin_y, n) triples: empty cells dominate the grid.
        "cells" -> JArr(for {
          (row, bx) <- ix.grid.zipWithIndex if row.exists(_ > 0)
          (n, by) <- row.zipWithIndex if n > 0
        } yield JArr(Seq(JNum(bx.toDouble), JNum(by.toDouble), JNum(n.toDouble)))))))),
      "categories" -> JArr(p.categories.map(ct => JObj(Seq(
        "column" -> JStr(ct.column),
        "high_cardinality" -> JBool(ct.highCardinality),
        "values" -> JArr(ct.values.map { case (v, n) =>
          JObj(Seq("value" -> JStr(v), "n" -> JNum(n.toDouble))) }))))),
      "quality" -> JObj(Seq(
        "missing" -> JArr(quality.missing.map(m => JObj(Seq(
          "column" -> JStr(m.column), "count" -> JNum(m.missingCount.toDouble),
          "pct" -> JNum(m.missingPct), "severity" -> JStr(m.severity))))),
        "primary_id_duplicates" -> JNum(quality.primaryIdDuplicates.toDouble),
        "duplicate_rows" -> JNum(quality.duplicateRows.toDouble),
        "outlier_columns" -> JArr(quality.outliers.map(o => JObj(Seq(
          "column" -> JStr(o.column), "count" -> JNum(o.outlierCount.toDouble),
          "pct" -> JNum(o.outlierPct), "severity" -> JStr(o.severity))))),
        "total_issues" -> JNum(quality.totalIssues.toDouble)))))
    render(doc)
  }

  /** S11 HTML render (reference pages/profiling.py:279–345 serves an HTML
    * report alongside the JSON; theirs is ydata-profiling's, ours renders
    * OUR profile doc): a self-contained page with overview, per-column
    * statistics, correlation and quality tables. */
  def renderProfileHtml(p: Profile, title: String = "Data profile"): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def fmt(v: Option[Double]): String =
      v.fold("")(d => if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
                      else f"$d%.6g")
    def table(headers: Seq[String], rows: Seq[Seq[String]]): String =
      s"""<table><thead><tr>${headers.map(h => s"<th>${esc(h)}</th>").mkString}</tr></thead>
         |<tbody>${rows.map(r => s"<tr>${r.map(c => s"<td>${esc(c)}</td>").mkString}</tr>").mkString("\n")}</tbody></table>""".stripMargin

    val colRows = p.columns.map(s => Seq(
      s.column, s.n.toString, s.nulls.toString, s.distinct.toString,
      fmt(s.mean), fmt(s.std), fmt(s.min), fmt(s.q25), fmt(s.median),
      fmt(s.q75), fmt(s.max), fmt(s.skew), fmt(s.kurt),
      s.iqrOutliers.fold("")(_.toString)))
    val corrRows = p.correlations.map(c => Seq(
      c.col1, c.col2, fmt(c.r), c.n.toString))
    val missRows = p.quality.missing.map(m => Seq(
      m.column, m.missingCount.toString, f"${m.missingPct}%.2f%%", m.severity))
    val outRows = p.quality.outliers.map(o => Seq(
      o.column, o.outlierCount.toString, f"${o.outlierPct}%.2f%%", o.severity))

    // Per-column histogram bars (CSS only, no scripts): bar height scales
    // to the column's max bin; hover shows the bin range and count.
    val histBlocks = p.columns.flatMap { s =>
      p.histograms.get(s.column).filter(_.exists(_ > 0)).map { bins =>
        val peak = bins.max.toDouble
        val (mn, mx) = (s.min.getOrElse(0.0), s.max.getOrElse(0.0))
        val width = if (bins.size > 0) (mx - mn) / bins.size else 0.0
        val bars = bins.zipWithIndex.map { case (n, i) =>
          val hPx = math.max(1, math.round(n / peak * 60).toInt)
          val lo = mn + i * width
          s"""<span class="bar" style="height:${hPx}px" title="[${fmt(Some(lo))}, ${fmt(Some(lo + width))}): $n"></span>"""
        }.mkString
        s"""<div class="hist"><h3>${esc(s.column)}</h3><div class="bars">$bars</div></div>"""
      }
    }
    val histSection =
      if (histBlocks.isEmpty) ""
      else s"""<h2>Distributions</h2>\n${histBlocks.mkString("\n")}"""

    // Interaction heatmaps (explorative mode): one CSS grid per column
    // pair, cell opacity ∝ count / pane max. Rendered row-major with bin_y
    // descending so the y axis points up like a scatter plot.
    val interBlocks = p.interactions.flatMap { ix =>
      val peak = ix.grid.iterator.flatten.max.toDouble
      if (peak <= 0) None else Some {
        val nb = ix.grid.size
        val cells = (nb - 1 to 0 by -1).flatMap { by =>
          (0 until nb).map { bx =>
            val n = ix.grid(bx)(by)
            val op = if (n == 0) 0.0 else 0.15 + 0.85 * n / peak
            s"""<span class="cell" style="opacity:${f"$op%.3f"}" title="x=$bx y=$by: $n"></span>"""
          }
        }.mkString
        s"""<div class="inter"><h3>${esc(ix.col1)} &times; ${esc(ix.col2)}</h3>
           |<div class="grid" style="grid-template-columns:repeat($nb,10px)">$cells</div></div>""".stripMargin
      }
    }
    val interSection =
      if (interBlocks.isEmpty) ""
      else s"""<h2>Interactions</h2>\n${interBlocks.mkString("\n")}"""

    // Categorical value tables; high-cardinality columns get a notice
    // instead of a table (the distinct-value guard fired).
    val catBlocks = p.categories.map { ct =>
      val body =
        if (ct.highCardinality)
          "<p><em>high cardinality — value table suppressed</em></p>"
        else table(Seq("value", "n"),
          ct.values.map { case (v, n) => Seq(v, n.toString) })
      s"""<div class="cat"><h3>${esc(ct.column)}</h3>$body</div>"""
    }
    val catSection =
      if (catBlocks.isEmpty) ""
      else s"""<h2>Categorical columns</h2>\n${catBlocks.mkString("\n")}"""

    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |body{font-family:sans-serif;margin:2em;color:#222}
       |table{border-collapse:collapse;margin:1em 0}
       |th,td{border:1px solid #ccc;padding:4px 10px;text-align:right}
       |th{background:#f0f0f0}td:first-child,th:first-child{text-align:left}
       |h2{border-bottom:1px solid #ddd;padding-bottom:4px}
       |.hist{display:inline-block;margin:0 2em 1em 0;vertical-align:top}
       |.hist h3{margin:0 0 4px;font-size:0.9em;font-weight:normal}
       |.bars{display:flex;align-items:flex-end;height:64px;gap:1px}
       |.bar{display:inline-block;width:10px;background:#4878a8}
       |.inter,.cat{display:inline-block;margin:0 2em 1em 0;vertical-align:top}
       |.inter h3,.cat h3{margin:0 0 4px;font-size:0.9em;font-weight:normal}
       |.grid{display:grid;gap:1px}
       |.cell{width:10px;height:10px;background:#4878a8;display:block}
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<h2>Overview</h2>
       |<p>Rows: ${p.rowCount} &middot; Columns: ${p.columnCount} &middot;
       |Quality issues: ${p.quality.totalIssues}</p>
       |<h2>Columns</h2>
       |${table(Seq("column", "n", "nulls", "distinct", "mean", "std", "min",
          "q25", "median", "q75", "max", "skew", "kurt", "iqr_outliers"), colRows)}
       |$histSection
       |$interSection
       |$catSection
       |<h2>Correlations (pearson)</h2>
       |${table(Seq("col1", "col2", "r", "n"), corrRows)}
       |<h2>Missing data</h2>
       |${table(Seq("column", "missing", "pct", "severity"), missRows)}
       |<h2>IQR outlier columns</h2>
       |${table(Seq("column", "outliers", "pct", "severity"), outRows)}
       |<p>Duplicate primary IDs: ${p.quality.primaryIdDuplicates} &middot;
       |Duplicate rows: ${p.quality.duplicateRows}</p>
       |</body></html>""".stripMargin
  }

  def profileHtml(df: DataFrame, keys: MergeKeys, numericCols: Seq[String]): String =
    renderProfileHtml(profile(df, keys, numericCols))

  /** S9 composition: the reference's summary-report ZIP = filter funnel +
    * per-step CSVs (query/callbacks/export.py:449–476). */
  /** Deterministic sharded parquet export for training dataloaders: rows
    * land in `shards` shards by the engine-portable identity hash of
    * `keys` (a pure function of row identity — re-exports of the same
    * data give byte-identical shard MEMBERSHIP regardless of cluster
    * layout, the property a resumable dataloader needs), written as
    * `outDir/data/shard=N/` parquet plus `outDir/manifest.json` with
    * per-shard row counts and an order-insensitive content fingerprint
    * (bit_xor of xxhash64 over every exported column).
    *
    * SELF-VERIFYING: counts and fingerprints in the manifest are
    * computed from the files READ BACK, and required equal to the same
    * rollup of the input — a lost or doubled row fails the export
    * instead of poisoning the manifest. One hash-partitioned write plus
    * two shard-sized aggregations. Returns the manifest as a DataFrame
    * (shard, rows, fingerprint). */
  def shardedParquetExport(
      df: DataFrame, keys: Seq[String], shards: Int,
      outDir: String): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(keys.nonEmpty, "need identity key columns")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    val withShard = df.withColumn("shard",
      (conv(substring(graft.ops.Sampling.hashHex("graft/shard",
          keys.map(col)), 1, 8), 16, 10).cast("long") % shards).cast("int"))
    withShard.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/data")
    def rollup(d: DataFrame) = d
      .groupBy("shard")
      .agg(count(lit(1)).as("rows"),
        bit_xor(xxhash64(cols.map(col): _*)).as("fingerprint"))
    val expect = rollup(withShard).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val manifest = rollup(spark.read.parquet(s"$outDir/data")
        .withColumn("shard", col("shard").cast("int")))
      .orderBy("shard")
    val got = manifest.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(got == expect,
      s"read-back shards diverge from input: wrote ${expect.size} shards " +
        s"${expect.values.map(_._1).sum} rows, read ${got.size} shards " +
        s"${got.values.map(_._1).sum} rows")
    val body = got.toSeq.sortBy(_._1).map { case (s, (n, fp)) =>
      s"""{"shard":$s,"rows":$n,"fingerprint":$fp}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(outDir).resolve("manifest.json"),
      s"""{"shards":${got.size},"total_rows":${got.values.map(_._1).sum},""" +
        s""""entries":$body}""")
    manifest
  }

  def summaryReportZip(
      outFile: String,
      funnel: Seq[FilterFunnel.Step],
      finalSummary: DataFrame): Path = {
    val funnelCsv = {
      val sb = new StringBuilder("step,label,n,removed,removal_pct\n")
      funnel.foreach(s => sb.append(
        s"${s.step},${s.label},${s.n},${s.removed},${s.removalPct}\n"))
      sb.toString
    }
    zipReport(outFile, Seq(
      "filtering_report.csv" -> funnelCsv,
      "final_summary.csv" -> toCsvString(finalSummary)))
  }

  /** Dataset-card markdown (the Datasheets-for-Datasets / HF
    * dataset-card shape — public conventions): render the per-source
    * corpus table ([[graft.ops.CorpusReport.bySource]]) plus free-form
    * provenance fields into one markdown document — the artifact a
    * curated training corpus ships with. The NUMBERS come from the
    * oracle-checked table; this sink only formats. Totals row included;
    * markdown cells pipe-escaped so a hostile source name can't break
    * the table. Returns the rendered string (callers pick the file
    * sink); every column of the input lands in the table in schema
    * order. */
  def renderDatasetCard(
      bySource: DataFrame,
      title: String,
      description: String,
      provenance: Map[String, String] = Map.empty): String = {
    def esc(s: String) = s.replace("|", "\\|").replace("\n", " ")
    val cols = bySource.schema.fieldNames.toSeq
    val rows = bySource.collect()
    val sb = new StringBuilder
    sb.append(s"# ${esc(title)}\n\n${description.trim}\n\n")
    if (provenance.nonEmpty) {
      sb.append("## Provenance\n\n")
      provenance.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(s"- **${esc(k)}**: ${esc(v)}\n")
      }
      sb.append("\n")
    }
    sb.append("## Sources\n\n")
    sb.append(cols.mkString("| ", " | ", " |\n"))
    sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
    rows.foreach { r =>
      sb.append(cols.indices.map(i =>
        esc(Option(r.get(i)).map(_.toString).getOrElse("")))
        .mkString("| ", " | ", " |\n"))
    }
    val numeric = bySource.schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType] => i
    }
    sb.append(cols.indices.map { i =>
      if (i == 0) "**total**"
      else if (numeric.contains(i) && cols(i).startsWith("n_"))
        rows.map(r => Option(r.get(i)).map(_.toString.toDouble)
          .getOrElse(0.0)).sum.toLong.toString
      else ""
    }.mkString("| ", " | ", " |\n"))
    sb.append(s"\n_${rows.length} sources._\n")
    sb.toString
  }
}
