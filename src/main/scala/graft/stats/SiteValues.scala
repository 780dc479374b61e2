package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** T15 multi-valued study-site cell parsing + T16 multisite detection
  * (reference: analysis/demographics.py:255–319, 445–504).
  *
  * The reference fakes multi-valued cells with string packing
  * (`"{Discovery, Longitudinal_Adult}"`, `"A;B"`, `"A B"`); the idiomatic
  * Spark model is a real ArrayType column — `tokens` exposes it, and
  * `distinctValues` reproduces the reference's sorted distinct site set.
  */
object SiteValues {

  /** Brace-stripped, comma/semicolon/whitespace-split token array. */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(
      split(regexp_replace(c.cast(StringType), "[{}]", ""), "[,;\\s]+"),
      t => length(trim(t)) > 0)

  /** Sorted distinct site values across the column (demographics.py:445–504). */
  def distinctValues(df: DataFrame, column: String): Seq[String] =
    df.select(explode(tokens(col(column))).as("site"))
      .select(trim(col("site")).as("site"))
      .distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** T16 heuristic: the dataset is "multisite" when a site-ish column
    * exists by name pattern (demographics.py:255–319). */
  private val sitePatterns = Seq("site", "study", "studies", "cohort", "center", "centre", "location")
  private val rocklandPatterns = Seq("rockland", "all_studies", "discovery", "longitudinal_adult", "longitudinal_child")

  def detectSiteColumn(columns: Seq[String], configured: Option[String]): Option[String] =
    configured.filter(columns.contains).orElse(
      columns.find(c => sitePatterns.exists(c.toLowerCase.contains)))

  def isRocklandLike(columns: Seq[String]): Boolean =
    columns.exists(c => rocklandPatterns.exists(c.toLowerCase.contains))
}
