package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset fingerprints for versioning and audit — the "did anything
  * change, anywhere" primitive a 100 TB catalog needs before it can
  * trust incremental maintenance: a CONTENT digest that is invariant to
  * row order and partitioning (so a compaction or repartition doesn't
  * read as a data change) but moves on any cell edit, row add, or row
  * drop; and a SCHEMA digest over (name, type) pairs.
  *
  * Content digest: per row, the first 8 md5 hex chars of the canonical
  * row rendering (null cells as a sentinel that no real value renders
  * as) → a 32-bit value summed EXACTLY in decimal(38,0). Addition is
  * commutative/associative, hence order- and partitioning-invariant,
  * and the sum (not xor) makes duplicate multiplicity count: two copies
  * of a row digest differently than one (an xor fold would cancel
  * pairs). Both the hash and the sum are engine-portable — the md5
  * identity-hash family plus exact decimal addition — so the digest a
  * different engine computes over the same rows is bit-identical. The
  * fold stays decimal internally but is EMITTED as BIGINT (exact below
  * 2³¹ rows), because equal decimal values can carry engine-specific
  * physical encodings that a byte-level comparator rejects.
  *
  * Scale shape: one narrow map + one map-side-combined 1-row agg; no
  * shuffle beyond partition partials. Collision odds follow the sum of
  * 32-bit hashes; the digest is a CHANGE DETECTOR, not a cryptographic
  * commitment. */
object Fingerprint {

  /** Field separator in the canonical rendering: \u0001, a byte no
    * textual value carries — an EMPTY separator would glue cells and
    * make ("ab","c") digest identically to ("a","bc"). Mirrored in the
    * SQL oracle as chr(1). */
  private val Sep = "\u0001"

  /** The canonical per-row hash term over `cols` (order matters —
    * declare the column list explicitly so schema evolution is a
    * deliberate digest change). Columns named in `doubleScales` are
    * floating-point measures: a raw double's string rendering is
    * engine-specific (shortest-roundtrip vs %g), so those cells render
    * through the portable recipe double → DECIMAL(38,s) → string —
    * both engines round the cast identically away from any tie (a
    * 2-decimal money value stored in a double is never a cast
    * midpoint) and both render the decimal as plain `-?\d+\.\d{s}`. */
  private def rowTerm(
      cols: Seq[String], doubleScales: Map[String, Int]): Column = {
    val rendered = cols.map { c =>
      val cell = doubleScales.get(c) match {
        case Some(s) => col(c).cast(s"decimal(38,$s)").cast("string")
        case None    => col(c).cast("string")
      }
      coalesce(cell, lit("<NULL>"))
    }
    conv(substring(md5(
      concat_ws(Sep, rendered: _*).cast("binary")), 1, 8), 16, 10)
      .cast("long")
  }

  /** One row: (n_rows, content_digest) — the exact decimal sum of
    * 32-bit row hashes over the declared columns, emitted as BIGINT.
    * The sum of n 32-bit terms is < n·2³², so the long emission is
    * exact for any table under 2³¹ rows (~2.1e9); per-partition tables
    * beyond that should digest through [[contentDigestExact]], whose
    * decimal(38,0) output never overflows. The BIGINT emission exists
    * because a decimal's physical encoding is engine-specific (int128
    * vs unscaled bytes) even when the VALUE is identical — a byte-level
    * comparator sees two different decimals for the same number, where
    * a 64-bit long has one representation everywhere. */
  def contentDigest(
      df: DataFrame, cols: Seq[String],
      doubleScales: Map[String, Int] = Map.empty): DataFrame =
    contentDigestExact(df, cols, doubleScales).select(
      col("n_rows"),
      col("content_digest").cast("long").as("content_digest"))

  /** [[contentDigest]] with the sum left in decimal(38,0) — overflow-
    * free at any row count (38 digits holds 2³² × 10²⁸ rows). */
  def contentDigestExact(
      df: DataFrame, cols: Seq[String],
      doubleScales: Map[String, Int] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "declare the digest columns explicitly")
    require(doubleScales.keySet.subsetOf(cols.toSet),
      "every doubleScales key must appear in cols")
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum(rowTerm(cols, doubleScales).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("content_digest"))
  }

  /** Schema digest: one row (n_columns, schema_digest) over the frame's
    * (name, dataType) pairs in POSITION order — column renames, type
    * changes, reorders, adds and drops all move it. Driver-side (the
    * schema is metadata, not data). */
  def schemaDigest(df: DataFrame): (Int, String) = {
    val rendered = df.schema.fields
      .map(f => s"${f.name}\u0001${f.dataType.sql}")
      .mkString("")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(rendered.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (df.schema.fields.length, hex)
  }

  /** Convenience comparison: (changed, rows_a, rows_b, digest_a,
    * digest_b) for two snapshots over the same declared columns — the
    * cheap pre-check in front of [[graft.ops.CorpusDiff]]'s row-level
    * reconciliation. */
  def changed(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val da = contentDigest(a, cols)
      .select(col("n_rows").as("rows_a"),
        col("content_digest").as("digest_a"))
    val db = contentDigest(b, cols)
      .select(col("n_rows").as("rows_b"),
        col("content_digest").as("digest_b"))
    da.crossJoin(db)
      .select(
        (col("digest_a") =!= col("digest_b") ||
          col("rows_a") =!= col("rows_b")).as("changed"),
        col("rows_a"), col("rows_b"), col("digest_a"), col("digest_b"))
  }
}
