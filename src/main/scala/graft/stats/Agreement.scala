package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the acceptance gate of a labeling
  * pipeline (SFT preference raters, quality-label vendors, weak-label
  * ensembles): chance-corrected agreement coefficients, engineered the
  * house way — integer/decimal numerators end-to-end, ONE double
  * division at the finish, so DuckDB oracles hash-match without
  * tolerance games.
  *
  *  - Cohen's kappa (two fixed raters, categorical labels):
  *    κ = (n·Σ_k a_k − Σ_k r1_k·r2_k) / (n² − Σ_k r1_k·r2_k), the
  *    integer-cleared form of (p_o − p_e)/(1 − p_e).
  *  - Fleiss' kappa (N items each rated by the SAME number n of raters):
  *    κ = [(S₂ − Nn)·Nn − ΣT_k²·(n−1)] / [((Nn)² − ΣT_k²)·(n−1)] with
  *    S₂ = Σ_{i,k} n_ik², T_k the per-category totals — again the
  *    cleared form, exact in decimal(38,0) far past any labeling
  *    campaign's size.
  *
  * Scale shape: Cohen is one k²-bounded pair-count aggregation; Fleiss
  * is one (item, label) count pass then one category-bounded fold — no
  * window, no join, map-side combinable throughout. Perfect chance
  * agreement (p_e = 1: both raters constant and equal, or one category
  * overall) leaves κ undefined → null, never 0/0.
  */
object Agreement {

  /** Cohen's kappa over paired labels (one row = one item labeled by
    * both raters). Rows with either label null are excluded (an unrated
    * item is not a disagreement). Returns one row (n_items, observed
    * agreement, expected agreement, kappa), agreements rounded to 6. */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val base = df
      .filter(labelA.isNotNull && labelB.isNotNull)
      .select(labelA.cast("string").as("a"), labelB.cast("string").as("b"))
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("c"))
    def d(c: Column) = c.cast("decimal(38,0)")
    cells.agg(
        sum(col("c")).as("__n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("__agree"))
      .crossJoin(
        // Σ_k r1_k·r2_k from the same k²-bounded cell table: marginals
        // join on the category key (≤ k rows each side)
        cells.groupBy("a").agg(sum(col("c")).as("ca"))
          .join(cells.groupBy("b").agg(sum(col("c")).as("cb")),
            col("a") === col("b"))
          .agg(coalesce(sum(d(col("ca")) * d(col("cb"))),
            lit(0).cast("decimal(38,0)")).as("__e")))
      .select(
        col("__n").as("n_items"),
        round(col("__agree") / col("__n"), 6).as("p_observed"),
        round(col("__e").cast("double")
          / (col("__n").cast("double") * col("__n").cast("double")), 6)
          .as("p_expected"),
        when(d(col("__n")) * d(col("__n")) =!= col("__e"),
          round((d(col("__n")) * d(col("__agree")) - col("__e"))
            .cast("double")
            / (d(col("__n")) * d(col("__n")) - col("__e")).cast("double"),
            6)).as("kappa"))
  }

  /** Fleiss' kappa over long-format ratings (item, label) — one row per
    * individual rating; null labels are excluded. Every item must carry
    * the SAME number of ratings after exclusion (the statistic's
    * premise); ragged panels fail loudly rather than silently reweight.
    * Returns one row (n_items, n_raters, p_bar, p_expected, kappa),
    * probabilities rounded to 6. */
  def fleissKappa(df: DataFrame, itemCol: Column, labelCol: Column): DataFrame = {
    val perCell = df
      .filter(itemCol.isNotNull && labelCol.isNotNull)
      .select(itemCol.as("i"), labelCol.cast("string").as("l"))
      .groupBy("i", "l").agg(count(lit(1)).as("c"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val byItem = perCell.groupBy("i").agg(sum(col("c")).as("ni"))
    val raggedRow = byItem
      .agg(min(col("ni")).as("mn"), max(col("ni")).as("mx"),
        count(lit(1)).as("items")).head()
    require(raggedRow.getAs[Long]("items") > 0L, "no ratings to agree on")
    val (mn, mx) = (raggedRow.getAs[Long]("mn"), raggedRow.getAs[Long]("mx"))
    require(mn == mx,
      s"Fleiss' kappa needs a constant rater count per item; found $mn..$mx")
    require(mn >= 2, s"need at least 2 raters per item, got $mn")
    val bigN = raggedRow.getAs[Long]("items")
    val n = mn
    val nn = java.math.BigDecimal.valueOf(bigN).multiply(
      java.math.BigDecimal.valueOf(n))
    val catTotals = perCell.groupBy("l").agg(sum(col("c")).as("t"))
    val s2Row = perCell.agg(
      sum(d(col("c")) * d(col("c"))).as("s2")).head()
    val s2 = s2Row.getAs[java.math.BigDecimal]("s2")
    perCell.sparkSession.range(1).select(
        lit(bigN).as("n_items"), lit(n).as("n_raters"))
      .crossJoin(catTotals.agg(
        sum(d(col("t")) * d(col("t"))).as("__t2")))
      .select(
        col("n_items"), col("n_raters"),
        // P̄ = (S₂ − Nn) / (Nn(n−1)), exact numerator, one division
        round(lit(s2.subtract(nn)).cast("decimal(38,0)").cast("double")
          / (lit(nn).cast("decimal(38,0)")
            * lit(n - 1).cast("decimal(38,0)")).cast("double"), 6)
          .as("p_bar"),
        round(col("__t2").cast("double")
          / (lit(nn).cast("decimal(38,0)")
            * lit(nn).cast("decimal(38,0)")).cast("double"), 6)
          .as("p_expected"),
        when(lit(nn).cast("decimal(38,0)") * lit(nn).cast("decimal(38,0)")
            =!= col("__t2"),
          round(((lit(s2.subtract(nn)).cast("decimal(38,0)")
              * lit(nn).cast("decimal(38,0)"))
            - col("__t2") * lit(n - 1).cast("decimal(38,0)")).cast("double")
            / ((lit(nn).cast("decimal(38,0)")
                * lit(nn).cast("decimal(38,0)") - col("__t2"))
              * lit(n - 1).cast("decimal(38,0)")).cast("double"), 6))
          .as("kappa"))
  }

  /** Kendall's coefficient of concordance W over long-format ordinal
    * ratings (item, rater, score) with the standard tie correction —
    * "do m raters RANK the items the same way", the ordinal-scale
    * companion to Fleiss' categorical kappa. Every rater must score
    * every item (complete panel; ragged panels fail loudly).
    *
    * Exactness: per-rater midranks are carried DOUBLED
    * (2·rank + tie−1 — integer-valued, so rank sums fold exactly), and
    * with S4 = Σ_i (R2_i − m(n+1))² the tie-corrected statistic clears
    * to W = 3·S4 / (m²(n³−n) − m·ΣT), ΣT = Σ(t³−t) over tie groups —
    * exact integer numerator and denominator, ONE double division
    * (the [[cohenKappa]] discipline). Also returns Friedman's
    * χ² = m(n−1)·W. All-tied panels (denominator 0) yield null W.
    *
    * Scale contract: the per-rater rank window holds ONE RATER'S
    * complete ratings in a partition — right for annotation panels
    * (items in the thousands-to-millions, raters few), not for ranking
    * web-scale corpora; everything after the window is tie-group- or
    * item-sized. */
  def kendallW(
      df: DataFrame, itemCol: Column, raterCol: Column,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(itemCol.isNotNull && raterCol.isNotNull && scoreCol.isNotNull)
      .select(itemCol.as("i"), raterCol.cast("string").as("r"),
        scoreCol.cast("double").as("s"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val shape = base.groupBy("i").agg(count(lit(1)).as("mi"))
      .agg(min(col("mi")).as("mn"), max(col("mi")).as("mx"),
        count(lit(1)).as("items")).head()
    require(shape.getAs[Long]("items") > 0L, "no ratings to rank")
    val n = shape.getAs[Long]("items")
    val m = shape.getAs[Long]("mn")
    require(m == shape.getAs[Long]("mx"),
      s"Kendall's W needs a complete panel; items carry $m..${shape.getAs[Long]("mx")} ratings")
    require(m >= 2, s"need at least 2 raters, got $m")
    val perRater = base.groupBy("r").agg(count(lit(1)).as("ni"))
      .agg(min(col("ni")).as("mn"), max(col("ni")).as("mx")).head()
    require(perRater.getAs[Long]("mn") == n && perRater.getAs[Long]("mx") == n,
      s"every rater must rate all $n items; found ${perRater.getAs[Long]("mn")}..${perRater.getAs[Long]("mx")}")
    val wRank = Window.partitionBy(col("r")).orderBy(col("s"))
    val wTie = Window.partitionBy(col("r"), col("s"))
    val ranked = base.withColumn("r2",
      lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L))
    val s4 = ranked.groupBy("i").agg(sum(col("r2")).as("r2sum"))
      .agg(coalesce(sum((d(col("r2sum")) - d(lit(m * (n + 1))))
          * (d(col("r2sum")) - d(lit(m * (n + 1))))),
        lit(0).cast("decimal(38,0)")).as("s4"))
    val ties = ranked.groupBy("r", "s").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(d(col("t")) * d(col("t")) * d(col("t"))
          - d(col("t"))), lit(0).cast("decimal(38,0)")).as("st"))
    val den = d(lit(m)) * d(lit(m)) * (d(lit(n)) * d(lit(n)) * d(lit(n))
      - d(lit(n))) - d(lit(m)) * col("st")
    val w = (d(lit(3)) * col("s4")).cast("double") / den.cast("double")
    s4.crossJoin(ties)
      .select(lit(n).as("n_items"), lit(m).as("n_raters"),
        when(den =!= 0, round(w, 6)).as("w"),
        when(den =!= 0,
          round(lit(m * (n - 1)).cast("double") * w, 6)).as("chi2"))
  }

  /** Krippendorff's alpha, nominal scale (Krippendorff 2004 — public):
    * the agreement coefficient for RAGGED panels — any number of raters,
    * items rated by different subsets, missing labels simply absent —
    * which is the real shape of a labeling queue ([[cohenKappa]] needs
    * exactly two raters, [[fleissKappa]] a complete panel).
    *
    * α = 1 − D_o/D_e over pairable ratings (items with m_u ≥ 2 labels;
    * singleton items contribute nothing):
    *   D_o = (1/n) Σ_u Σ_c n_uc·(m_u − n_uc)/(m_u − 1),
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n−1)),  n = Σ_{m_u ≥ 2} m_u.
    * Per-item disagreement numerators A_u = Σ_c n_uc(m_u − n_uc) are
    * exact integers; the only fractions are A_u/(m_u−1), rounded to 12
    * and decimal-folded (summation-order-invariant, the established
    * recipe), D_e stays an integer ratio in decimal(38,0) until ONE
    * double division. A degenerate panel (every pairable rating the
    * same category → D_e = 0) yields null alpha.
    *
    * Scale shape: one (item,label) count, one item-sized aggregation,
    * one label-sized aggregation — shuffles bounded by items×labels,
    * never ratings². Returns one row
    * (n_items, n_ratings, n_categories, do_rate, de_rate, alpha). */
  def krippendorffAlpha(
      df: DataFrame, itemCol: Column, labelCol: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val base = df.filter(itemCol.isNotNull && labelCol.isNotNull)
      .select(itemCol.as("i"), labelCol.cast("string").as("l"))
    val cells = base.groupBy("i", "l").agg(count(lit(1)).as("c"))
    val items = cells.groupBy("i").agg(
        sum(col("c")).as("mu"),
        // A_u = Σ_c n_uc·(m_u − n_uc) = m_u² − Σ_c n_uc²
        sum(d(col("c")) * d(col("c"))).as("sq"))
      .filter(col("mu") >= 2)
      .select(col("i"), col("mu"),
        (d(col("mu")) * d(col("mu")) - col("sq")).as("au"))
    val doFold = items.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("mu")), lit(0L)).as("n"),
      coalesce(sum(round(col("au").cast("double") / (col("mu") - 1), 12)
        .cast("decimal(38,14)")), lit(0).cast("decimal(38,14)")).as("do_sum"))
    // category totals over the SAME pairable items only
    val nc = cells.join(items.select("i"), Seq("i"))
      .groupBy("l").agg(sum(col("c")).as("nc"))
    val deFold = nc.crossJoin(broadcast(doFold.select(col("n").as("__n"))))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(d(col("nc")) * (d(col("__n")) - d(col("nc")))),
          lit(0).cast("decimal(38,0)")).as("de_num"))
    doFold.crossJoin(deFold)
      .select(col("n_items"), col("n").as("n_ratings"), col("n_categories"),
        when(col("n") >= 2,
          round(col("do_sum").cast("double") / col("n"), 9)).as("do_rate"),
        when(col("n") >= 2,
          round(col("de_num").cast("double")
            / (d(col("n")) * (d(col("n")) - 1)).cast("double"), 9))
          .as("de_rate"),
        when(col("de_num") =!= 0,
          round(lit(1.0) - (col("n") - 1).cast("double")
            * col("do_sum").cast("double") / col("de_num").cast("double"),
            9)).as("alpha"))
  }

  /** Cronbach's alpha (Cronbach 1951) — internal consistency of k
    * parallel numeric items (rating columns, rubric dimensions, ensemble
    * scores): α = k/(k−1) · (1 − Σ itemVar / totalVar), the reliability
    * screen run before averaging item scores into one label. High α
    * says the items measure one construct; α near 0 says the composite
    * is noise.
    *
    * ONE moment aggregation (2k + 2 cells, map-side combined) of
    * round-12 decimal folds — the covariance recipe — then fixed double
    * arithmetic, so a SQL oracle replays every value. Rows with any
    * null item are excluded (an incomplete response has no total
    * score). Sample (n−1) variances; α is null when the total variance
    * is 0 (all respondents identical — reliability undefined), loud
    * below 2 complete rows or 2 items.
    *
    * Returns one row: (n_rows, k, sum_item_var, total_var, alpha),
    * variances and α rounded to 6. */
  def cronbachAlpha(df: DataFrame, itemCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = itemCols.size
    require(k >= 2, s"Cronbach's alpha needs >= 2 items, got $k")
    val items = itemCols.map(c => col(c).cast("double"))
    val complete = itemCols.map(col(_).isNotNull).reduce(_ && _)
    def fold(c: Column): Column =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val total = items.reduce(_ + _)
    val aggs = count(lit(1)).as("n") +:
      (items.zipWithIndex.flatMap { case (x, i) =>
        Seq(fold(x).as(s"s_$i"), fold(x * x).as(s"q_$i"))
      } ++ Seq(fold(total).as("st"), fold(total * total).as("qt")))
    val m = df.filter(complete).agg(aggs.head, aggs.tail: _*).head()
    val n = m.getAs[Long]("n")
    require(n >= 2, s"need >= 2 complete rows, got $n")
    def v(s: Double, q: Double): Double = (q - s * s / n) / (n - 1)
    val itemVarSum = (0 until k)
      .map(i => v(m.getAs[Double](s"s_$i"), m.getAs[Double](s"q_$i"))).sum
    val totalVar = v(m.getAs[Double]("st"), m.getAs[Double]("qt"))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val alpha =
      if (totalVar == 0.0) None
      else Some(r6(k.toDouble / (k - 1) * (1.0 - itemVarSum / totalVar)))
    Seq((n, k, r6(itemVarSum), r6(totalVar), alpha))
      .toDF("n_rows", "k", "sum_item_var", "total_var", "alpha")
  }

  /** Quadratic-weighted Cohen's kappa (Cohen 1968, public) for ORDINAL
    * integer labels — plain kappa treats "4 vs 5" and "1 vs 5" as
    * equally wrong; the quadratic weights charge disagreement by
    * (i−j)², which is what rating scales need. The (k−1)² weight
    * denominators cancel, leaving the integer-cleared form
    * κ_w = 1 − n·Σ(i−j)²·o_ij / Σ(i−j)²·r_i·c_j — exact integers up to
    * one double division (BigInt driver combine: the denominator
    * reaches n²·range²).
    *
    * One (a, b) cell aggregation; the cell table is level²-bounded (a
    * rating scale, loudly capped at 10 000 cells) and collects to the
    * driver. Null labels excluded. Returns one row (n, levels,
    * kappa_w round-6); null when the expected-disagreement denominator
    * is zero (either rater is constant — chance agreement undefined). */
  def weightedKappa(
      df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .filter(labelA.isNotNull && labelB.isNotNull)
      .select(labelA.cast("long").as("a"), labelB.cast("long").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .collect()
    require(cells.nonEmpty, "weighted kappa needs labeled rows")
    require(cells.length <= 10000,
      s"${cells.length} label cells - not a rating scale; cap is 10000")
    val triples = cells.map(r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c")))
    val n = triples.map(_._3).sum
    val rowM: Map[Long, Long] = triples.groupBy(_._1)
      .map { case (i, ts) => i -> ts.map(_._3).sum }
    val colM: Map[Long, Long] = triples.groupBy(_._2)
      .map { case (j, ts) => j -> ts.map(_._3).sum }
    val levels = (rowM.keySet ++ colM.keySet).toSeq.sorted
    val obs = triples.map { case (i, j, c) =>
      BigInt(i - j) * BigInt(i - j) * BigInt(c) }.sum
    val exp = (for { i <- levels; j <- levels } yield
      BigInt(i - j) * BigInt(i - j) *
        BigInt(rowM.getOrElse(i, 0L)) * BigInt(colM.getOrElse(j, 0L))).sum
    val kappa: Option[Double] =
      if (exp == 0) None
      else Some(BigDecimal(1.0 - (BigInt(n) * obs).toDouble / exp.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    Seq((n, levels.size, kappa)).toDF("n", "levels", "kappa_w")
  }

  /** Bowker's test of symmetry (Bowker 1948, public) — the k×k
    * generalization of McNemar: did the label DISTRIBUTION drift
    * between two paired annotations (model v1 vs v2 on the same rows,
    * yesterday's rubric vs today's)? Systematic off-diagonal asymmetry
    * (rows migrating 3→4 more than 4→3) is invisible to agreement
    * coefficients, which only price the diagonal.
    * χ² = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji), df = #pairs with any
    * discordance.
    *
    * One (a, b) cell aggregation → a least/greatest pair rollup →
    * round-9 decimal term fold: level-bounded shuffles end-to-end, no
    * driver state. Returns one row (n, n_pairs_tested, chi2, p_value):
    * χ² round-6; the χ²(df) p is library-only. Null when the raters
    * never disagree. */
  def bowker(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .filter(labelA.isNotNull && labelB.isNotNull)
      .select(labelA.cast("string").as("a"), labelB.cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val nRow = cells.agg(coalesce(sum(col("c")), lit(0L))).head()
    val n = nRow.getLong(0)
    require(n > 0, "Bowker needs labeled rows")
    val pairs = cells.filter(col("a") =!= col("b"))
      .groupBy(least(col("a"), col("b")).as("i"),
        greatest(col("a"), col("b")).as("j"))
      .agg(
        sum(when(col("a") < col("b"), col("c")).otherwise(0L)).as("nij"),
        sum(when(col("a") > col("b"), col("c")).otherwise(0L)).as("nji"))
    val agg = pairs.agg(
        count(lit(1)).as("df"),
        sum(round((col("nij") - col("nji")).cast("double")
            * (col("nij") - col("nji"))
            / (col("nij") + col("nji")), 9).cast("decimal(38,12)"))
          .cast("double").as("chi2"))
      .head()
    val dof = agg.getAs[Long]("df")
    if (dof == 0L) {
      Seq((n, 0L, Option.empty[Double], Option.empty[Double]))
        .toDF("n", "n_pairs_tested", "chi2", "p_value")
    } else {
      val chi2 = agg.getAs[Double]("chi2")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val p = r6(1.0 -
        new org.apache.commons.math3.distribution.ChiSquaredDistribution(
          dof.toDouble).cumulativeProbability(chi2))
      Seq((n, dof, Some(r6(chi2)), Some(p)))
        .toDF("n", "n_pairs_tested", "chi2", "p_value")
    }
  }

  /** Cochran's Q (Cochran 1950, public): do k PAIRED binary treatments
    * — k labelers' pass/fail verdicts, k filter versions applied to the
    * same corpus — succeed at the same rate? The k-treatment
    * generalization of McNemar (k = 2 reduces to McNemar without the
    * continuity correction). In the integer-cleared form
    * Q = (k−1)·(k·Σ_j c_j² − (Σ_j c_j)²) / (k·Σ_i r_i − Σ_i r_i²)
    * with c_j the per-treatment success totals and r_i the per-subject
    * success counts — every term is an exact integer from ONE
    * map-side-combined aggregation (k+2 cells), so a SQL oracle replays
    * Q bit-for-bit before the shared round.
    *
    * Rows with any null flag are excluded (a verdict must exist from
    * every rater for the pairing to mean anything); reported via n.
    * Returns one row (n, k, q_stat, p_value): Q rounded to 9; the
    * χ²(k−1) p is library-only. Q is null when every subject has
    * all-same verdicts (r_i ∈ {0, k} for all i — the denominator is 0
    * and there is no within-subject information). */
  def cochranQ(df: DataFrame, flagCols: Seq[String]): DataFrame = {
    val k = flagCols.size
    require(k >= 2, s"Cochran's Q needs >= 2 treatments, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val flags = flagCols.map(c => col(c))
    val complete = df.filter(flags.map(_.isNotNull).reduce(_ && _))
    val r = flags.map(f => when(f, 1L).otherwise(0L)).reduce(_ + _)
    val aggs =
      flags.zipWithIndex.map { case (f, i) =>
        sum(when(f, 1L).otherwise(0L)).as(s"c$i")
      } ++ Seq(
        count(lit(1)).as("n"),
        sum(r).as("sr"),
        sum(r * r).as("srr"))
    val row = complete.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    require(n > 0, "Cochran's Q needs at least one fully-rated row")
    // BigInt driver arithmetic: c_j² reaches n² (overflows Long past
    // ~3e9 rows) — the k+2 aggregate cells are exact Longs, the combine
    // must stay exact too.
    val cs = (0 until k).map(i => BigInt(row.getAs[Long](s"c$i")))
    val sc = cs.sum
    val scc = cs.map(c => c * c).sum
    val den = BigInt(k) * row.getAs[Long]("sr") - row.getAs[Long]("srr")
    // double division (not exact rational): the oracle's CAST/division
    // is IEEE double too, so the bit pattern matches before the round
    val q: Option[Double] =
      if (den == 0) None
      else Some(BigDecimal(
          (BigInt(k - 1) * (BigInt(k) * scc - sc * sc)).toDouble
            / den.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val p = q.map(v =>
      BigDecimal(1.0 -
        new org.apache.commons.math3.distribution.ChiSquaredDistribution(
          (k - 1).toDouble).cumulativeProbability(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    Seq((n, k, q, p)).toDF("n", "k", "q_stat", "p_value")
  }

  /** One-way random-effects intraclass correlation ICC(1,1) (Shrout &
    * Fleiss 1979 — public): the NUMERIC-rating reliability companion to
    * the κ family — how much of a score's variance is the item rather
    * than the rater draw. From the one-way ANOVA decomposition:
    * ICC = (MSB − MSW)/(MSB + (k−1)·MSW), with F = MSB/MSW the
    * associated test statistic (its p is library-territory and not
    * emitted — the t52 convention).
    *
    * Distributed shape: one groupBy(item) for per-item (count, sum,
    * sum-of-squares) with round-12 decimal folds, then one fold over
    * the per-item terms — two map-side-combined aggregations, no
    * window. The design must be BALANCED (every item rated exactly k
    * times — loud otherwise; subsample or impute upstream). Returns one
    * row (n_items, k_raters, msb, msw, f_stat, icc1), round-6; icc1 and
    * f null when MSW = 0 with MSB = 0 (all ratings identical). */
  def icc(df: DataFrame, itemCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(itemCol.as("i"), valueCol.cast("double").as("y"))
      .filter(col("i").isNotNull && col("y").isNotNull && !isnan(col("y")))
    def fold(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val perItem = base.groupBy("i").agg(
      count(lit(1)).as("k"), fold(col("y")).as("s"),
      fold(col("y") * col("y")).as("ss"))
    val kDistinct = perItem.select(countDistinct(col("k"))).head().getLong(0)
    require(kDistinct == 1L,
      "ICC(1,1) needs a balanced design - every item rated the same " +
        "number of times; subsample raters per item upstream")
    val kRow = perItem.select(max(col("k"))).head()
    val k = kRow.getLong(0)
    require(k >= 2, s"ICC needs >= 2 ratings per item, got $k")
    val tot = perItem.agg(
      count(lit(1)).as("n"),
      fold(col("s")).as("gs"),
      fold(col("ss")).as("gss"),
      fold(col("s") * col("s") / k).as("sbk")).head()
    val n = tot.getAs[Long]("n")
    require(n >= 2, s"ICC needs >= 2 items, got $n")
    val gs = tot.getAs[Double]("gs")
    val gss = tot.getAs[Double]("gss")
    val sbk = tot.getAs[Double]("sbk")
    val nk = (n * k).toDouble
    val ssb = sbk - gs * gs / nk
    // ssw = gss − sbk can round a hair negative from the round-12
    // decimal folds on near-tied data; clamping EVERY negative to 0
    // would misreport a not-quite-perfect design as exactly ICC = 1, so
    // only fold-tolerance-sized negatives clamp and anything larger
    // fails loudly (it means the inputs broke the fold contract).
    val sswRaw = gss - sbk
    val ssw =
      if (sswRaw < 0 && -sswRaw < 1e-9 * nk) 0.0
      else {
        require(sswRaw >= 0,
          s"ICC: within-item sum of squares is $sswRaw < 0 beyond fold " +
            "tolerance - ratings exceed the round-12 fold contract; " +
            "rescale or round the rating column upstream")
        sswRaw
      }
    val msb = ssb / (n - 1)
    val msw = ssw / (n.toDouble * (k - 1))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val (iccV, fV) =
      if (msw > 0) (Some(r6((msb - msw) / (msb + (k - 1) * msw))),
        Some(r6(msb / msw)))
      else if (msb > 0) (Some(1.0), None) // perfect item separation
      else (None, None)
    Seq((n, k, r6(msb), r6(msw), fV, iccV))
      .toDF("n_items", "k_raters", "msb", "msw", "f_stat", "icc1")
  }
}
