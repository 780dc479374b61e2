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
  * different engine computes over the same rows is bit-identical.
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
    * deliberate digest change). */
  private def rowTerm(cols: Seq[String]): Column = {
    val rendered = cols.map(c =>
      coalesce(col(c).cast("string"), lit("<NULL>")))
    conv(substring(md5(
      concat_ws(Sep, rendered: _*).cast("binary")), 1, 8), 16, 10)
      .cast("long")
  }

  /** One row: (n_rows, content_digest) — the exact decimal sum of
    * 32-bit row hashes over the declared columns. */
  def contentDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "declare the digest columns explicitly")
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum(rowTerm(cols).cast("decimal(38,0)")),
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
