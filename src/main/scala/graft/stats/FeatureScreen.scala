package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual-information feature screen — rank MANY categorical feature
  * columns against one label in a single pass, the triage step before
  * [[Contingency.association]]'s pairwise deep-dive: MI(label; feature)
  * says how much the feature carries; U(label|feature) = MI/H(label)
  * says what fraction of the label it explains, so U ≈ 1 is the
  * target-leakage alarm (reference analog: the profiling interactions
  * report, generalized to a ranked multi-column screen).
  *
  * Scale shape: the features MELT via one `stack` generator — no extra
  * pass per feature — and the very first aggregation collapses to
  * (feature, value, label) counts (map-side combined), so shuffle
  * volume is Σ per-feature level products, bounded by the categorical
  * premise, NOT features × rows. The margin windows partition by
  * feature (each partition is one feature's level-bounded cell table —
  * the [[Contingency]] exception, never the data). Per-feature null
  * labels are excluded globally; null feature VALUES are excluded per
  * feature (each feature is screened on its own observed slice, so n
  * varies by feature and is reported).
  *
  * Exactness: MI and entropy terms are per-cell rounded doubles summed
  * as decimals (the [[Contingency.miTerms]] recipe) — shard order
  * cannot perturb them; U is one double division rounded to 6.
  *
  * Returns one row per feature: (feature, n, levels, mi, h_feature,
  * h_label, u_label) ordered by feature; mi/h in nats rounded 9,
  * u_label rounded 6 and null when the label is constant on the
  * feature's slice. */
object FeatureScreen {

  def screen(
      df: DataFrame, labelCol: String, featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(!featureCols.contains(labelCol),
      s"label $labelCol cannot also be a screened feature")
    val stackArgs = featureCols
      .map(f => s"'${f.replace("'", "''")}', CAST(`$f` AS STRING)")
      .mkString(", ")
    val melted = df
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__y"),
        expr(s"stack(${featureCols.length}, $stackArgs) AS (__f, __v)"))
      .filter(col("__v").isNotNull)
    val counts = melted.groupBy("__f", "__v", "__y")
      .agg(count(lit(1)).as("__c"))
    val byF = Window.partitionBy(col("__f"))
    val byFV = Window.partitionBy(col("__f"), col("__v"))
    val byFY = Window.partitionBy(col("__f"), col("__y"))
    val cells = counts
      .withColumn("__n", sum(col("__c")).over(byF))
      .withColumn("__rv", sum(col("__c")).over(byFV))
      .withColumn("__ry", sum(col("__c")).over(byFY))
      .withColumn("__term",
        round((col("__c").cast("double") / col("__n")) *
          log((col("__c").cast("double") * col("__n")) /
            (col("__rv").cast("double") * col("__ry"))), 9))
    def entropyOf(margin: String, cnt: String) = cells
      .groupBy(col("__f"), col(margin))
      .agg(max(col(cnt)).as("c"), max(col("__n")).as("n"))
      .select(col("__f"),
        round(-(col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")), 9).as("t"))
      .groupBy("__f")
      .agg(coalesce(sum(col("t").cast("decimal(38,12)")), lit(0))
        .cast("double").as("h"))
    val mi = cells.groupBy("__f").agg(
      max(col("__n")).as("n"),
      countDistinct(col("__v")).as("levels"),
      round(coalesce(sum(col("__term").cast("decimal(38,12)")), lit(0))
        .cast("double"), 9).as("mi"))
    val hv = entropyOf("__v", "__rv").withColumnRenamed("h", "h_feature")
    val hy = entropyOf("__y", "__ry").withColumnRenamed("h", "h_label")
    mi.join(hv, "__f").join(hy, "__f")
      .select(col("__f").as("feature"), col("n"), col("levels"),
        col("mi"),
        round(col("h_feature"), 9).as("h_feature"),
        round(col("h_label"), 9).as("h_label"),
        when(col("h_label") > 0, round(col("mi") / col("h_label"), 6))
          .as("u_label"))
      .orderBy("feature")
  }

  /** Weight of Evidence + Information Value for one categorical feature
    * against a binary event flag (the credit-scorecard standard —
    * Siddiqi 2006, the method itself is folklore-public):
    * WoE_c = ln(distNonEvent_c / distEvent_c),
    * IV = Σ_c (distNonEvent_c − distEvent_c)·WoE_c. IV rule of thumb:
    * < 0.02 useless, < 0.1 weak, < 0.3 medium, else strong. The
    * monotone-encoding companion to [[screen]]'s MI ranking — WoE is
    * also directly usable as the feature's numeric encoding.
    *
    * Zero cells take the standard 0.5 adjustment on the NUMERATOR
    * count only (totals stay raw) so WoE stays finite on categories
    * pure in one class — 0.5 is exact in both decimal and double, so
    * the adjustment is engine-portable. Every IV term is ≥ 0 by
    * construction ((a−b) and ln(a/b) share sign — a property specs and
    * gates assert distributed).
    *
    * One groupBy(category) with map-side combine + a broadcast 1-row
    * total; per-category ln terms round to 9. Null categories form
    * their own level (missingness is signal in scorecards); null flags
    * are excluded. Returns (category, n, n_event, woe, iv_term)
    * ordered by category, woe round-6, iv_term round-9; fails loudly
    * when either class is globally empty. */
  def woeTable(df: DataFrame, catCol: String,
      flag: org.apache.spark.sql.Column): DataFrame = {
    val cells = df.filter(flag.isNotNull)
      .groupBy(col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n"),
        sum(when(flag, 1L).otherwise(0L)).as("n_event"))
    val tot = cells.agg(
        sum(col("n_event")).as("__te"),
        sum(col("n") - col("n_event")).as("__tn"))
      .head()
    val te = tot.getAs[Long]("__te"); val tn = tot.getAs[Long]("__tn")
    require(te > 0 && tn > 0,
      s"WoE needs both classes present: events=$te non-events=$tn")
    val eAdj = when(col("n_event") === 0L, lit(0.5))
      .otherwise(col("n_event").cast("double"))
    val nAdj = when(col("n") - col("n_event") === 0L, lit(0.5))
      .otherwise((col("n") - col("n_event")).cast("double"))
    val dE = eAdj / lit(te.toDouble)
    val dN = nAdj / lit(tn.toDouble)
    cells.select(col("category"), col("n"), col("n_event"),
        round(log(dN / dE), 6).as("woe"),
        round((dN - dE) * log(dN / dE), 9).as("iv_term"))
      .orderBy("category")
  }
}
