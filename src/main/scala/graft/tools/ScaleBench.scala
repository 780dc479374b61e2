package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup
import graft.stats.ColumnStats

/** Scale-evidence for the dedup/stats flagships (round-8 verdict item 5):
  * measures dd_minhash_lsh and t1_column_stats at K× of sf0.1 with the same
  * key-offset scaling discipline LayoutBench used for the join, so the
  * "near-linear, bucketed" claims are MEASURED, not asserted from plan
  * shape. Results land in README §perf (flagship scaling).
  *
  * Scaling discipline (what K× must and must not change):
  *  - documents: K copies with offset doc_ids AND every token suffixed
  *    `_i` per copy — shingle sets are DISJOINT across copies, so each
  *    copy keeps exactly the 1× near-dup structure (true pairs = K × the
  *    1× pairs; candidate buckets grow K×, not K²). A naive text-identical
  *    copy would make every doc a near-dup of its K−1 siblings — a K²
  *    adversarial input, not "more data".
  *  - lineitem: K unioned copies — value distributions (and therefore
  *    quantile/moment work per row) are unchanged; row volume is K×.
  *    Distinct counts stay constant (bounded value domains), which is the
  *    realistic shape for these columns.
  *
  *   sbt "runMain graft.tools.ScaleBench 1,20,100"   (SPARK_GRAFT_SF_DIR)
  * Prints one JSON line per (op, scale).
  */
object ScaleBench {

  /** Cheap content fingerprint (paths+sizes+mtimes) — scratch copies are
    * keyed on it so regenerated testdata invalidates them by construction
    * (same discipline as LayoutBench). */
  private def fingerprint(sfDir: String, tables: Seq[String]): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val sig = tables.flatMap { t =>
      val p = Paths.get(sfDir, t)
      if (!Files.exists(p)) Seq(s"$t:absent")
      else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => s"${p.relativize(f)}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .toSeq.sorted
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 20, 100))
    // optional second arg: comma-set of op names to run (default all) —
    // re-measuring one op must not re-pay the whole suite
    val onlyOps = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(op: String): Boolean = onlyOps.forall(_.contains(op))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-scale-bench",
      Map("spark.sql.adaptive.enabled" -> "true"))

    val fp = fingerprint(sfDir,
      Seq("documents.parquet", "lineitem.parquet", "events.parquet",
        "embeddings.parquet", "customer.parquet", "orders.parquet"))
    val base =
      s"${System.getProperty("java.io.tmpdir")}/graft_scale_bench/$fp"

    def timeMedian(f: => Unit): (Double, Seq[Double]) = {
      f // warm-up
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      (samples(samples.size / 2), samples)
    }
    def emit(op: String, k: Int, rows: Long, med: Double, s: Seq[Double],
        extra: String = ""): Unit = {
      val json = f"""{"op":"$op","scale":$k,"rows":$rows,"median_sec":$med%.3f,""" +
        s""""samples":${s.map(x => f"$x%.3f").mkString("[", ",", "]")}$extra}"""
      println(json); System.err.println(s"[scale-bench] $json")
    }

    for (k <- scales) {
      val dir = s"$base/x$k"
      // v5: adds customer/orders for the §3.2 cohort hot path — version
      // the marker so older scratch dirs
      // (same testdata fingerprint) regenerate instead of missing tables
      val done = new java.io.File(s"$dir/_done_v5")
      if (!done.exists()) {
        val docs = Tables.load(spark, sfDir, "documents")
        val stride = docs.agg(max("doc_id")).head.getLong(0) + 1
        (0 until k).map { i =>
          val d = docs.withColumn("doc_id", col("doc_id") + lit(i * stride))
          if (i == 0) d
          else d.withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit(s"_$i"))), " "))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/documents")
        val li = Tables.load(spark, sfDir, "lineitem")
        (0 until k).map(_ => li).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/lineitem")
        // events: K copies with offset user_id AND event_id — MORE USERS,
        // constant events-per-user. That is the realistic growth shape for
        // keyed window/state ops: per-key frame sizes stay fixed, key
        // cardinality scales. (Duplicating events per user instead would
        // measure frame growth, a different claim.)
        val ev = Tables.load(spark, sfDir, "events")
        val uStride = ev.agg(max("user_id")).head.getLong(0) + 1
        val eStride = ev.agg(max("event_id")).head.getLong(0) + 1
        (0 until k).map { i =>
          ev.withColumn("user_id", col("user_id") + lit(i * uStride))
            .withColumn("event_id", col("event_id") + lit(i * eStride))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/events")
        // pivot input: K copies with OFFSET group keys — more participants,
        // constant sessions-per-participant and pivot WIDTH (width is a
        // schema property; growing it would measure a different risk than
        // corpus growth). Only the pivot's four columns ride to disk.
        val liP = Tables.load(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        val oStride = liP.agg(max("l_orderkey")).head.getLong(0) + 1
        (0 until k).map(i =>
            liP.withColumn("l_orderkey", col("l_orderkey") + lit(i * oStride)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/lineitem_pivot")
        // embeddings: K copies with offset vec_ids and a per-copy
        // norm-preserving transform — cyclic dimension shift by (i % dim)
        // PLUS a whole-vector sign flip on every second wrap of the shift
        // cycle. Within-copy neighbor structure is preserved (shift is a
        // permutation; negating ALL dims keeps every pairwise cosine),
        // and copies stay pairwise distinct up to K = 2·dim (128 here) —
        // a bare shift wraps at K = dim and would plant exact duplicates
        // of every query's neighborhood, the K² adversarial input, for
        // copies ≥ dim (caught in review; the first 100× series measured
        // exactly that for copies 64..99 and was re-run).
        val em = Tables.load(spark, sfDir, "embeddings")
        val vStride = em.agg(max("vec_id")).head.getLong(0) + 1
        val dim = em.select(size(col("embedding"))).head.getInt(0)
        require(k <= 2 * dim,
          s"embedding scaling supports K <= ${2 * dim} distinct copies")
        (0 until k).map { i =>
          val sh = i % dim
          val flip = (i / dim) % 2 == 1
          val shifted =
            if (sh == 0) em
            else em.withColumn("embedding",
              concat(slice(col("embedding"), sh + 1, dim - sh),
                slice(col("embedding"), 1, sh)))
          val signed =
            if (!flip) shifted
            else shifted.withColumn("embedding",
              transform(col("embedding"), x => -x))
          signed.withColumn("vec_id", col("vec_id") + lit(i * vStride))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/embeddings")
        // customer/orders: K copies with offset custkey (orders keep
        // their per-customer fan-out and follow the offset) — MORE
        // customers at constant orders-per-customer, the realistic
        // growth shape for the reference's §3.2 cohort hot path (hub
        // cardinality scales, per-hub behavioral fan-out fixed)
        val cu = Tables.load(spark, sfDir, "customer")
        val cStride = cu.agg(max("c_custkey")).head.getLong(0) + 1
        (0 until k).map(i =>
            cu.withColumn("c_custkey", col("c_custkey") + lit(i * cStride)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/customer")
        val or = Tables.load(spark, sfDir, "orders")
        val orStride = or.agg(max("o_orderkey")).head.getLong(0) + 1
        (0 until k).map(i => or
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * orStride))
            .withColumn("o_custkey", col("o_custkey") + lit(i * cStride)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/orders")
        done.getParentFile.mkdirs()
        done.createNewFile()
      }

      def docs = spark.read.parquet(s"$dir/documents")
      def li = spark.read.parquet(s"$dir/lineitem")

      if (wanted("dd_minhash_lsh")) {
        var pairs = 0L
        val (mhMed, mhS) = timeMedian {
          pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.45)
            .count()
        }
        emit("dd_minhash_lsh", k, docs.count(), mhMed, mhS, s""","pairs":$pairs""")
      }

      if (wanted("dd_dedup_corpus")) {
        // the COMPOSED flagship (r16 verdict item 5): LSH pairs → cluster
        // resolve → canonical keep, end to end. Linearity witness: the
        // token-suffixed copies keep each copy's 1× near-dup structure,
        // so kept rows and merged duplicates must both scale exactly K×.
        var kept = 0L
        val rows = docs.count() // outside the timed window, like the neighbors
        val (ddMed, ddS) = timeMedian {
          kept = Dedup.deduplicateCorpus(docs, "doc_id", "text",
            threshold = 0.45).count()
        }
        emit("dd_dedup_corpus", k, rows, ddMed, ddS,
          s""","kept":$kept,"merged":${rows - kept}""")
      }

      if (wanted("wn_fingerprints")) {
        // linearity witness: the token-suffixed copies keep each copy's
        // 1x winnowing structure, so the selected-fingerprint count must
        // scale exactly with the corpus
        var fps = 0L
        val (wnMed, wnS) = timeMedian {
          fps = graft.ops.Winnow.fingerprints(docs, "doc_id", "text", 8, 8)
            .count()
        }
        emit("wn_fingerprints", k, docs.count(), wnMed, wnS,
          s""","fingerprints":$fps""")
      }

      if (wanted("bootstrap_b20")) {
        // the explode-B map-side-combine claim: B resamples in one pass,
        // shuffle bounded by partitions x B. Measured over EVENTS, whose
        // scaled copies carry OFFSET event_ids — unique keys, honoring
        // the identity-hash contract (lineitem copies are identical rows
        // and would couple their draws). B = 20 bounds the 100x leg.
        val evB = spark.read.parquet(s"$dir/events")
        var neff = 0L
        val (bMed, bS) = timeMedian {
          neff = graft.stats.Bootstrap.resampleMeans(
              evB, Seq("event_id"),
              org.apache.spark.sql.functions.col("value"),
              b = 20, seed = "graft-scale")
            .agg(org.apache.spark.sql.functions.sum("n_eff"))
            .head.getLong(0)
        }
        // linearity witness: total effective draws ~ B x N(K)
        emit("bootstrap_b20", k, evB.count(), bMed, bS,
          s""","n_eff_total":$neff""")
      }

      if (wanted("hll_sketch")) {
        // sketch-family scaling: ONE map-side-combined aggregation whose
        // shuffle is partitions x m regardless of row count; the
        // estimate must track the growing true cardinality (copies get
        // offset user_ids, so distincts scale exactly K x)
        var est = 0.0
        val (hMed, hS) = timeMedian {
          est = graft.ops.Hll.estimate(
              graft.ops.Hll.sketch(spark.read.parquet(s"$dir/events"),
                "user_id"))
            .head.getAs[Double]("hll_est")
        }
        emit("hll_sketch", k, spark.read.parquet(s"$dir/events").count(),
          hMed, hS, f""","hll_est":$est%.1f""")
      }

      if (wanted("t1_column_stats")) {
        val t1Cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val (t1Med, t1S) = timeMedian {
          ColumnStats.describe(li, t1Cols)
        }
        emit("t1_column_stats", k, li.count(), t1Med, t1S)
      }

      if (wanted("j1_a1_cohort")) {
        // the reference's §3.2 interactive hot path (r15 verdict item 4):
        // filtered hub star left-join (j1 gate shape, unhinted — the
        // plan regime is allowed to flip from broadcast to SMJ as the
        // fact side outgrows the threshold, which is exactly what a
        // 100 TB deployment would see) followed by the a1 live count.
        // Linearity witnesses: joined rows and live participants both
        // scale exactly K× (offset custkeys, fixed per-hub fan-out).
        val cu2 = spark.read.parquet(s"$dir/customer")
        val or2 = spark.read.parquet(s"$dir/orders")
        val na = Tables.load(spark, sfDir, "nation")
        var joined = 0L
        val (jMed, jS) = timeMedian {
          val c = cu2.filter(col("c_acctbal") < 0)
          joined = c
            .join(broadcast(na), c("c_nationkey") === na("n_nationkey"),
              "left")
            .join(or2, c("c_custkey") === or2("o_custkey"), "left")
            .select(c("c_custkey"), na("n_name"), or2("o_orderkey"),
              or2("o_totalprice"))
            .agg(count(col("o_orderkey"))).head.getLong(0)
        }
        emit("j1_star_join", k, cu2.count(), jMed, jS,
          s""","joined_rows":$joined""")
        var live = 0L
        val (aMed, aS) = timeMedian {
          live = cu2
            .join(or2, cu2("c_custkey") === or2("o_custkey"), "left")
            .filter(col("o_totalprice") > 200000.0 &&
              col("c_mktsegment") === "BUILDING")
            .agg(countDistinct(cu2("c_custkey"))).head.getLong(0)
        }
        emit("a1_live_count", k, or2.count(), aMed, aS,
          s""","n_participants":$live""")
      }

      if (wanted("langid_score")) {
        // r17 language-ID v2: the model is dim+1 doubles per language
        // and the scorer is a pure codegen column, so scoring must run
        // at scan speed — train ONCE on the tiny deterministic fixture
        // (driver-local IRLS, outside the timed window), then score the
        // K× corpus. Witness: every row classified (non-null pred).
        val model = graft.ops.LangId.train(
          graft.ops.LangId.syntheticCorpus(spark), "text", "lang")
        var scoredRows = 0L
        val (liMed, liS) = timeMedian {
          scoredRows = graft.ops.LangId.predict(docs, "text", model)
            .filter(col("lang_pred").isNotNull).count()
        }
        emit("langid_score", k, docs.count(), liMed, liS,
          s""","classified":$scoredRows""")
      }

      if (wanted("hashed_bow")) {
        // r18 native TokenBow: the hashing-trick vectorizer must run at
        // scan speed (the compositional HOF form was O(dim·tokens) with
        // per-element closures — the r17 verdict's named residue).
        // Witness: Σ bucket counts == Σ token counts (conservation),
        // rows exactly K×-linear.
        var bowTokens = 0L
        val (hbMed, hbS) = timeMedian {
          val (df, _) = graft.ops.Features.hashedBow(docs, "text", dim = 24)
          bowTokens = df.agg(sum(aggregate(col("__graft_bow"), lit(0L),
            (acc, c) => acc + c))).head().getLong(0)
        }
        val expectTokens = docs.agg(sum(
          graft.ops.TextOps.tokenCount(col("text")).cast("long")))
          .head().getLong(0)
        require(bowTokens == expectTokens,
          s"bow conservation broken: $bowTokens vs $expectTokens")
        emit("hashed_bow", k, docs.count(), hbMed, hbS,
          s""","tokens":$bowTokens""")
      }

      if (wanted("curation")) {
        // r18 end-to-end curation (rules → quality → exact dedup →
        // decontamination composed, the pipe_curation pipeline). The
        // scaled corpus here is K IDENTICAL copies at OFFSET doc_ids of
        // the 1× corpus (NOT the token-suffixed scratch copies — the
        // Gopher stop-list rules must see the same words in every
        // copy), against the CONSTANT 1× eval split: the realistic
        // duplicates-at-scale shape. Two-sided witness: input/rules/
        // quality counts run exactly K×-linear while the dedup stage
        // collapses every K-family to its lowest-id canonical — kept
        // docs and kept tokens stay EXACTLY the 1× constants at every
        // K.
        val d0 = Tables.load(spark, sfDir, "documents")
        val cuStride = d0.agg(max("doc_id")).head.getLong(0) + 1
        val corpus1 = d0.filter(col("doc_id") % 17 =!= 3)
        // small constant eval split (~10 docs): the fixture's 31-token
        // vocabulary means a large eval's 3-gram set covers the whole
        // corpus and the contamination stage would zero the funnel; a
        // bounded benchmark suite is also the realistic shape. A few
        // eval ids also sit in the corpus (%499 vs %17) - genuine
        // leakage the stage must catch (frac ~= 1).
        val evalDocs = d0.filter(col("doc_id") % 499 === 3)
        val corpusK = (0 until k).map(i =>
            corpus1.withColumn("doc_id", col("doc_id") + lit(i * cuStride)))
          .reduce(_ unionAll _)
        var f: org.apache.spark.sql.Row = null
        val (cuMed, cuS) = timeMedian {
          val rules = graft.ops.QualityRules.gopherFlags(
              corpusK, "doc_id", "text",
              stopwords = graft.ops.TextOps.LangMarkers.head._2)
            .select(col("doc_id").as("id"), col("keep").as("rules_pass"))
          f = graft.ops.Curation.funnelReport(
            graft.ops.Curation.stageFlags(corpusK, "doc_id", "text",
              evalDocs, "text", minQuality = 0.36,
              maxContamination = 0.2, ruleVerdicts = Some(rules))).head()
        }
        val (ni, nr, nq, nd, nc, tk) = (f.getLong(0), f.getLong(1),
          f.getLong(2), f.getLong(3), f.getLong(4), f.getLong(5))
        require(ni > nr && nr > nq && nq >= nd && nd > nc && nc > 0,
          s"funnel not discriminative: $ni -> $nr -> $nq -> $nd -> $nc")
        emit("curation", k, ni, cuMed, cuS,
          s""","n_rules":$nr,"n_quality":$nq,"n_dedup":$nd""" +
            s""","n_clean":$nc,"tokens_kept":$tk""")
      }

      if (wanted("logistic_fit")) {
        // r18 distributed IRLS rewrite: one array-typed moment
        // AGGREGATE per step (LogisticMomentAgg buffers, no per-row
        // array materialization) — planning O(1) in d (the old form
        // paid d(d+3)/2 Catalyst analyses per step: 67-550 s at
        // fixture scale). d = 25 (24 hashed-BoW features + intercept)
        // over the K× corpus, iteration count PINNED at 5 (tol below
        // reach) so every scale pays the same number of passes.
        // Witness: n == corpus rows, exactly 5 iterations.
        val (df, feats) = graft.ops.Features.hashedBow(docs, "text",
          dim = 24)
        val label = (col("doc_id") % 2).cast("double")
        var fitN = 0L; var fitIters = 0
        val (lfMed, lfS) = timeMedian {
          val fit = graft.stats.Logistic.fit(df, feats, label,
            lambda = 1e-3, maxIter = 5, tol = 1e-300).get
          fitN = fit.n; fitIters = fit.iterations
        }
        require(fitIters == 5, s"expected exactly 5 IRLS steps, ran $fitIters")
        emit("logistic_fit", k, fitN, lfMed, lfS,
          s""","d":25,"iters_irls":$fitIters""")
      }

      if (wanted("survival_scan")) {
        // r17 rewrite witness: the Kaplan-Meier family now runs
        // partition-offset scans instead of a single-task window. The
        // scaled events keep K× USERS at constant events/user, so the
        // duration table is K× subjects over a CONSTANT hour-grained
        // distinct-duration domain — time should be dominated by the
        // per-subject aggregation (row-linear, parallel), with the scan
        // itself constant-size. Witness: curve step count constant,
        // initial at-risk mass exactly K×.
        val ev2 = spark.read.parquet(s"$dir/events")
        var steps = 0L; var atRisk = 0L
        val (kmMed, kmS) = timeMedian {
          val durs = graft.stats.Survival.durationsFromLog(ev2,
            "user_id", "ts", "2024-01-31 00:00:00", gapSeconds = 86400L)
          val curve = graft.stats.Survival.kaplanMeier(durs,
            graft.stats.Survival.binDurations(col("duration"), 1.0),
            col("observed"))
          val r = curve.agg(count(lit(1)), max(col("n_risk"))).head()
          steps = r.getLong(0); atRisk = r.getLong(1)
        }
        emit("survival_scan", k, ev2.count(), kmMed, kmS,
          s""","curve_steps":$steps,"at_risk_max":$atRisk""")
      }

      if (wanted("rank_scan_family")) {
        // r16 distinct-value-scan ops: W1 and Brunner-Munzel run over
        // the MERGED DISTINCT-VALUE table (quantity's domain is
        // bounded, so their scan is constant-size at any K — time
        // should be scan-dominated and near-flat); Chatterjee's xi adds
        // a row-sized range-partitioned (x, tie) sort, the honest
        // ~linear leg. Witnesses: distinct-value counts constant for
        // W1/BM, xi's value stable in K (same distribution per copy).
        val liR = spark.read.parquet(s"$dir/lineitem")
          .filter(col("l_quantity").isNotNull)
        val aSide = liR.filter(col("l_returnflag") === "A")
          .select(col("l_quantity").cast("double").as("v"))
        val bSide = liR.filter(col("l_returnflag") === "N")
          .select((col("l_quantity") + 2).cast("double").as("v"))
        var w1V = 0.0; var nVals = 0L
        val (w1Med, w1S) = timeMedian {
          val r = graft.stats.Drift.wasserstein1(aSide, bSide, col("v"))
            .head()
          w1V = r.getAs[Double]("w1"); nVals = r.getAs[Long]("n_values")
        }
        emit("dq_wasserstein1", k, liR.count(), w1Med, w1S,
          f""","w1":$w1V%.4f,"n_values":$nVals""")
        var bmW = 0.0
        val (bmMed, bmS) = timeMedian {
          bmW = graft.stats.RankTests.brunnerMunzel(aSide, bSide, col("v"))
            .head().getAs[Double]("w_stat")
        }
        emit("t75_brunner_munzel", k, liR.count(), bmMed, bmS,
          f""","w_stat":$bmW%.2f""")
        // xi over the pivot copies (offset orderkeys keep ties unique)
        val bx = spark.read.parquet(s"$dir/lineitem_pivot")
          .filter(col("l_quantity").isNotNull &&
            col("l_extendedprice").isNotNull)
          .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("t"))
          .agg(max(col("l_quantity")).cast("double").as("x"),
            max(col("l_extendedprice")).cast("double").as("y"))
        var xiV = 0.0
        val (xiMed, xiS) = timeMedian {
          xiV = graft.stats.Correlation.xicor(bx, col("x"), col("y"),
            col("t")).head().getAs[Double]("xi")
        }
        emit("t77_xicor", k, bx.count(), xiMed, xiS, f""","xi":$xiV%.5f""")
      }

      def ev = spark.read.parquet(s"$dir/events")

      if (wanted("ev_anomaly_flags")) {
        // keyed running-frame + flag pipeline: K× users, fixed frame/user
        var flags = 0L
        val (anMed, anS) = timeMedian {
          flags = graft.streaming.Anomaly.flags(ev)
            .filter(col("is_anomaly")).count()
        }
        emit("ev_anomaly_flags", k, ev.count(), anMed, anS, s""","flags":$flags""")
      }

      if (wanted("ev_rolling_24h")) {
        // trailing RANGE frame: same shape, heavier per-row frame arithmetic.
        // Aggregate over the windowed column — a bare count() lets Catalyst
        // prune the window away and measures only the scan.
        val (rlMed, rlS) = timeMedian {
          graft.ops.EventAnalytics.rollingStats(ev, 86400L)
            .agg(sum(col("sum_cents_window"))).head()
        }
        emit("ev_rolling_24h", k, ev.count(), rlMed, rlS)
      }

      if (wanted("txt_heavy_hitters")) {
        // heavy hitters: suffixed copies give a K×-larger vocab at 1/K the
        // relative frequency — scale minFraction down so each copy's tokens
        // still clear the cut and the verify pass carries K× candidates
        // 0.032: sf0.1's flattest-topped token sits at fraction ≈0.0339 (the
        // gate's 0.034 would select zero here — measured work would be the
        // same, but a hitters count that scales exactly K× is the linearity
        // witness, like minhash's pairs)
        var hitters = 0L
        val (hhMed, hhS) = timeMedian {
          hitters = graft.ops.HeavyHitters
            .frequentTokens(docs, "text", minFraction = 0.032 / k).count()
        }
        emit("txt_heavy_hitters", k, docs.count(), hhMed, hhS,
          s""","hitters":$hitters""")
      }

      if (wanted("dd_paragraph_dedup")) {
        // paragraph dedup: suffixed copies keep cross-copy paragraphs
        // DISTINCT (no K² collision inflation). NB the kept-paragraph
        // count is NOT exactly K× the 1× count: token suffixing
        // lengthens copy i's texts, so later copies chunk into more
        // 120-char paragraphs — kept counts grow ~linearly in data
        // volume, and TIME is the scaling witness here
        var keptParas = 0L
        val (pdMed, pdS) = timeMedian {
          keptParas = Dedup.dedupParagraphs(docs, "doc_id", "text",
              graft.ops.TextOps.chunks(col("text"), size = 120, overlap = 0))
            .agg(sum(col("n_paragraphs_kept"))).head().getLong(0)
        }
        emit("dd_paragraph_dedup", k, docs.count(), pdMed, pdS,
          s""","kept_paragraphs":$keptParas""")
      }

      if (wanted("sim_topk")) {
        // ANN at corpus scale: a FIXED 100-query set (first-copy ids, so
        // query count is constant across K) against a K×-growing corpus.
        // Brute force is the exact baseline (cost ∝ N·Q — linear in K);
        // IVF probes nProbe/nLists of the corpus (the scale path). The
        // index build is one-time/amortized and reported separately, not
        // inside the search timing. Witness: IVF recall@10 vs brute.
        def em = spark.read.parquet(s"$dir/embeddings")
        val emCount = em.count()
        val isQuery = col("vec_id") < 2000 && col("vec_id") % 20 === 0
        var bruteRows = 0L
        val (bfMed, bfS) = timeMedian {
          bruteRows = graft.ops.Similarity
            .bruteForceTopK(em, "vec_id", "embedding", isQuery, k = 10)
            .count()
        }
        emit("sim_topk_bruteforce", k, emCount, bfMed, bfS,
          s""","result_rows":$bruteRows""")
        val tb0 = System.nanoTime()
        val index = graft.ops.Ivf.build(em, "vec_id", "embedding",
          nLists = 64, fitSampleRows = 20000)
        index.assigned.persist().count()
        val buildSec = (System.nanoTime() - tb0) / 1e9
        var ivfRows = 0L
        val (ivMed, ivS) = timeMedian {
          ivfRows = graft.ops.Ivf.search(index, isQuery, k = 10, nProbe = 16)
            .count()
        }
        // recall (untimed honesty witness): IVF hits ∩ brute hits
        val bf = graft.ops.Similarity
          .bruteForceTopK(em, "vec_id", "embedding", isQuery, k = 10)
          .select(col("qid"), col("nid"))
        val iv = graft.ops.Ivf.search(index, isQuery, k = 10, nProbe = 16)
          .select(col("qid").as("q2"), col("nid").as("n2"))
        val hits = bf.join(iv,
          bf("qid") === iv("q2") && bf("nid") === iv("n2")).count()
        val recall = hits.toDouble / bruteRows
        index.assigned.unpersist()
        emit("sim_topk_ivf", k, emCount, ivMed, ivS,
          f""","result_rows":$ivfRows,"recall":$recall%.3f,"build_sec":$buildSec%.3f""")
      }

      if (wanted("bitext_ivf")) {
        // corpus-scale bitext: BOTH sides grow K×, so the scale knob is
        // nLists ∝ K (constant expected cell size — the op's own "raise
        // nLists with corpus size" contract). Witness: the candidate-pair
        // count (Σ probed-cell sizes, counted directly off
        // ivfCandidatePairs) must grow ~K×; the exact miner's |X|·|Y|
        // grows K² and is exactly what this path exists to avoid.
        def em = spark.read.parquet(s"$dir/embeddings")
        val xs = em.filter(col("vec_id") % 2 === 0)
        val ys = em.filter(col("vec_id") % 2 === 1)
        val emCount = em.count()
        val nLists = 16 * k
        var candidates = 0L
        val (cMed, cS) = timeMedian {
          candidates = graft.ops.Bitext.ivfCandidatePairs(xs, ys,
            "vec_id", "embedding", nLists = nLists, nProbe = 4).count()
        }
        emit("bitext_ivf_candidates", k, emCount, cMed, cS,
          s""","candidates":$candidates,"n_lists":$nLists""")
        var mined = 0L
        val (mMed, mS) = timeMedian {
          mined = graft.ops.Bitext.marginMineIvf(xs, ys, "vec_id",
            "embedding", k = 4, minMargin = 1.0,
            nLists = nLists, nProbe = 4).count()
        }
        emit("bitext_ivf_mine", k, emCount, mMed, mS,
          s""","mined_pairs":$mined,"n_lists":$nLists""")
      }

      // (No exact-Jaccard scaling series: the synthetic corpus draws every
      // document from ONE tiny vocabulary, so each doc genuinely shares
      // rarest shingles with hundreds of others and ANY exact join —
      // prefix-filtered or naive — is inherently candidate-quadratic on
      // it. That is an adversarial input, not "more data"; the measured
      // scale path for near-dup at volume remains dd_minhash_lsh above,
      // and prefixJaccardPairs' win over the naive join is exactness
      // WITHOUT the maxPostings recall trade, verified by its gate.)

      if (wanted("unigram_train")) {
        // tokenizer-training scaling: the corpus pass is distributed but
        // EM is driver-side over DISTINCT words — the suffixed-token
        // discipline grows the distinct-word table ~K×, which is exactly
        // the honest cost driver (mitigation knobs: minWordCount /
        // maxWords). Witness: the trained vocab stays full-size.
        var vocab = 0
        val (ugMed, ugS) = timeMedian {
          vocab = graft.ops.UnigramLm.trainOn(docs, "text",
            vocabSize = 256, maxPieceLen = 6).logp.size
        }
        val distinctWords = graft.ops.UnigramLm.wordCounts(docs, "text").count()
        require(vocab >= 200, s"vocab collapsed at $k x: $vocab")
        emit("unigram_train", k, distinctWords, ugMed, ugS,
          s""","vocab":$vocab""")
      }

      if (wanted("kmeans")) {
        // distributed Lloyd at corpus scale: each iteration is one narrow
        // assignment map over the data plus one aggregation whose shuffle
        // is bounded by partitions × k × dim (independent of N), so fit
        // time should track N near-linearly. Witness: assignment mass —
        // cluster sizes must sum to N at every K (no rows lost or
        // duplicated by the argmin).
        def em = spark.read.parquet(s"$dir/embeddings")
        val emCount = em.count()
        var model: graft.ops.KMeans.Model = null
        val (kmMed, kmS) = timeMedian {
          model = graft.ops.KMeans.fit(em, "vec_id", "embedding",
            k = 8, iters = 3)
        }
        val mass = graft.ops.KMeans.clusterSizes(
            graft.ops.KMeans.assign(em, "embedding", model))
          .agg(sum("size")).head.getLong(0)
        require(mass == emCount, s"k-means lost rows: $mass vs $emCount")
        emit("kmeans_fit", k, emCount, kmMed, kmS)
      }

      if (wanted("prj_covariance")) {
        // the PCA feeder pass: one explode(d(d+1)/2) + hash aggregation
        // whose shuffle is partitions × d² partial rows regardless of N —
        // time should track N near-linearly. The JL projection is the
        // narrow-map counterpart measured in the same block. Witness:
        // moment count n equals the corpus size at every K.
        def em = spark.read.parquet(s"$dir/embeddings")
        val emCount = em.count()
        val dim = em.select(size(col("embedding"))).head.getInt(0)
        val (covMed, covS) = timeMedian {
          val n = graft.ops.Projection
            .covarianceUpper(em, "embedding", dim)
            .agg(min("n"), max("n")).head
          require(n.getLong(0) == emCount && n.getLong(1) == emCount,
            s"moment count ${n.getLong(0)}..${n.getLong(1)} != $emCount")
        }
        emit("prj_covariance", k, emCount, covMed, covS)
        val (jlMed, jlS) = timeMedian {
          val c = graft.ops.Projection
            .signProject(em, "embedding", dim, 16)
            .filter(col("proj").isNotNull).count()
          require(c == emCount, s"projection dropped rows: $c vs $emCount")
        }
        emit("prj_sign_project", k, emCount, jlMed, jlS)
      }

      if (wanted("txt_kneser_ney")) {
        // smoothing-LM scaling: the suffixed-token copies grow the bigram
        // type table ~K× (disjoint vocabularies), so training counts,
        // the three scoring joins, AND the per-doc means all scale
        // linearly — the honest cost shape for a corpus-relative model
        // retrained per snapshot. Witness: every doc scores (row count
        // preserved) and the discount stays in (0,1).
        var scored = 0L
        val (knMed, knS) = timeMedian {
          val lm = graft.ops.LanguageModel.trainKneserNey(docs, "text")
          // D = 0 is legitimate when the corpus has no singleton/doubleton
          // bigrams (this synthetic one repeats every bigram heavily)
          require(lm.discount >= 0 && lm.discount < 1,
            s"degenerate discount ${lm.discount} at ${k}x")
          scored = graft.ops.LanguageModel
            .scoreKneserNey(lm, docs, "doc_id", "text").count()
        }
        require(scored == docs.count(), s"KN dropped docs: $scored")
        emit("txt_kneser_ney", k, scored, knMed, knS)
      }

      if (wanted("ev_markov")) {
        // journey-model scaling: K× users with constant per-user history,
        // so the lead() window partitions stay fixed-size while their
        // count grows K× — the shape that parallelizes. The transition
        // matrix itself stays state-vocabulary-sized at every K.
        // Witness: Σn == events − users (every non-final event is
        // exactly one transition).
        val evM = spark.read.parquet(s"$dir/events")
        val nEvents = evM.count()
        val nUsers = evM.select("user_id").distinct().count()
        var trSum = 0L
        val (mkMed, mkS) = timeMedian {
          trSum = graft.ops.Markov.transitionMatrix(evM, "user_id", "ts",
              "event_id", "event_type")
            .agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
        }
        require(trSum == nEvents - nUsers,
          s"transition mass $trSum != ${nEvents - nUsers} at ${k}x")
        emit("ev_markov_transitions", k, nEvents, mkMed, mkS,
          s""","transitions":$trSum""")
      }

      if (wanted("j4_salted_skew_join")) {
        // hot-key join at scale: ~80% of lineitem rows share one synthetic
        // key; K× copies grow the hot key's absolute row count K×. Both
        // variants run with broadcast DISABLED (the regime the operator
        // exists for — a broadcastable dim needs no salting) and AQE on
        // (its skew split is the fair baseline). Witness: identical
        // output checksum between plain and salted at every K.
        val sparkConf = spark.conf
        val bhjPrev = sparkConf.get("spark.sql.autoBroadcastJoinThreshold")
        sparkConf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          def fact = li.select(
            when(col("l_orderkey") % 10 < 8, lit(0L))
              .otherwise(pmod(col("l_orderkey"), lit(97L))).as("k"),
            col("l_quantity"))
          val dim = spark.range(97).select(col("id").as("k"),
            concat(lit("seg_"), col("id").cast("string")).as("seg"))
          def agg(df: org.apache.spark.sql.DataFrame): Long =
            df.groupBy("k", "seg")
              .agg(count(lit(1)).as("n"))
              .agg(bit_xor(xxhash64(col("k"), col("seg"), col("n"))))
              .head().getLong(0)
          var plainSum = 0L
          val (plMed, plS) = timeMedian { plainSum = agg(fact.join(dim, Seq("k"))) }
          var saltSum = 0L
          val (slMed, slS) = timeMedian {
            saltSum = agg(graft.operators.SkewJoin
              .saltedJoin(fact, dim, Seq("k"), salt = 8))
          }
          require(plainSum == saltSum,
            s"salted output diverged from plain at $k x: $plainSum vs $saltSum")
          emit("j4_plain_skew_join", k, li.count(), plMed, plS)
          emit("j4_salted_skew_join", k, li.count(), slMed, slS)
        } finally {
          sparkConf.set("spark.sql.autoBroadcastJoinThreshold", bhjPrev)
        }
      }

      if (wanted("gr_pagerank")) {
        // link graph over the scaled corpus: K× nodes, 3 hash-derived
        // out-edges per non-dangling node (doc_id % 7 == 0 dangles), so
        // edges scale exactly K×. Iteration count is FIXED (5), so time
        // must scale ~linearly in edges — the iterative-join claim. The
        // rank mass is the correctness witness (sums to 1 at any K).
        var mass = 0.0
        var nodeCount = 0L
        val (prMed, prS) = timeMedian {
          val nodes = docs.select(col("doc_id").as("node"))
          // the gate's own edge builder: the bench measures exactly the
          // graph gr_pagerank verifies, on any corpus
          val edges =
            graft.queries.GraphQueries.linkEdges(docs, docs.count())
          val ranks = graft.ops.Graph.pageRank(edges, nodes, iters = 5)
          mass = ranks.agg(sum("rank")).head().getDouble(0)
          nodeCount = ranks.count()
        }
        emit("gr_pagerank", k, nodeCount, prMed, prS,
          f""","rank_mass":$mass%.9f""")
      }

      if (wanted("gr_label_propagation")) {
        // same K×-scaling link graph, FIXED 3 iterations: one label join
        // + one (node, lbl) groupBy per iteration, so time must scale
        // ~linearly in edges like pageRank. Witness: every node gets
        // exactly one community label at every K.
        var labeled = 0L
        var nodeCount = 0L
        val (lpMed, lpS) = timeMedian {
          val nodes = docs.select(col("doc_id").as("node"))
          val edges =
            graft.queries.GraphQueries.linkEdges(docs, docs.count())
          val comm = graft.ops.Graph.labelPropagation(edges, nodes, iters = 3)
          labeled = comm.count()
          nodeCount = nodes.count()
        }
        require(labeled == nodeCount,
          s"label propagation lost nodes at ${k}x: $labeled of $nodeCount")
        emit("gr_label_propagation", k, nodeCount, lpMed, lpS)
      }

      if (wanted("gr_triangles")) {
        // social graph (hash + window edges) over the scaled corpus: K×
        // nodes with identical local structure, so edges AND triangles
        // scale ~K× — degree-ordered orientation must keep the wedge
        // join linear in edges here (bounded degrees), not Σdeg².
        // Witness: the triangle count itself.
        var tri = 0L
        val (tMed, tS) = timeMedian {
          val edges =
            graft.queries.GraphQueries.socialEdges(docs, docs.count())
          tri = graft.ops.Graph.triangles(edges).count()
        }
        emit("gr_triangles", k, docs.count(), tMed, tS,
          s""","triangles":$tri""")
      }

      if (wanted("qz_encode")) {
        // int8 quantization over the scaled embeddings: one d-bounded
        // range agg + a narrow encode map — time must scale ~linearly in
        // rows. Witness: the code-grid checksum (sum of all codes) scales
        // with the corpus while staying in [0, 255]·rows·dim.
        def em = spark.read.parquet(s"$dir/embeddings")
        var checksum = 0L
        var rows = 0L
        val (qMed, qS) = timeMedian {
          val (lo, hi) = graft.ops.Quantize.collectRanges(
            graft.ops.Quantize.ranges(em, "embedding", 64), 64)
          val enc = graft.ops.Quantize.encode(em, "embedding", lo, hi)
          val r = enc.select(
            sum(aggregate(col("code"), lit(0L), (a, x) => a + x)).as("s"),
            count(lit(1)).as("n")).head()
          checksum = r.getAs[Long]("s"); rows = r.getAs[Long]("n")
        }
        emit("qz_encode", k, rows, qMed, qS, s""","code_sum":$checksum""")
      }

      if (wanted("dd_containment")) {
        // scaled docs carry per-copy token suffixes, so shingle sets are
        // DISJOINT across copies: containment pairs (and the postings
        // join behind them) must scale ~K×, never the K² a text-identical
        // copy would plant. Witness: the pair count.
        var pairs = 0L
        val (cMed, cS) = timeMedian {
          pairs = graft.ops.Dedup.containmentPairs(
            docs, "doc_id", "text", n = 2, threshold = 0.8,
            maxPostings = 1000).count()
        }
        emit("dd_containment", k, docs.count(), cMed, cS,
          s""","pairs":$pairs""")
      }

      if (wanted("gr_kcore")) {
        // k-core peel on the same social graph: per round two id-only
        // shuffles over the surviving edges, peel depth structure-
        // (not size-)dependent — time must scale ~linearly in edges.
        // Witness: surviving core size (~K× the 1× core).
        var core = 0L
        val (cMed, cS) = timeMedian {
          val c = graft.ops.Graph.kCore(
            graft.queries.GraphQueries.socialEdges(docs, docs.count()), 7)
          core = c.count()
          c.unpersist(blocking = false)
        }
        emit("gr_kcore", k, docs.count(), cMed, cS,
          s""","core_nodes":$core""")
      }

      if (wanted("a7_enwiden_pivot")) {
        // long→wide pivot (one classify + one pivot shuffle): K× groups,
        // fixed width. The measurement hashes EVERY output column into the
        // aggregate — referencing only one pivot column would let Catalyst
        // prune the other 13 pivot aggregates and measure a 1/14th pivot.
        def liPivot = spark.read.parquet(s"$dir/lineitem_pivot")
        val keys = graft.core.MergeKeys("l_orderkey", Some("l_linenumber"),
          None, isLongitudinal = true)
        var wideRows = 0L
        val (a7Med, a7S) = timeMedian {
          val wide = graft.transform.Enwiden
            .enwiden(liPivot, keys, cellAgg = graft.transform.Enwiden.MinNonNull)
          wideRows = wide
            .agg(count(lit(1)),
              // bit_xor: consumes every column's hash without ANSI long
              // overflow (sum() threw at 100×)
              bit_xor(xxhash64(wide.columns.map(col): _*)))
            .head().getLong(0)
        }
        emit("a7_enwiden_pivot", k, liPivot.count(), a7Med, a7S,
          s""","wide_rows":$wideRows""")
      }

      if (wanted("bh_fdr")) {
        // K× hypotheses with DISTINCT keys (offset orderkeys): the BH
        // pass is one distributed sort + two partition-offset scans —
        // time must scale ~K× (sort-dominated), no unpartitioned window.
        // Witness: discoveries at alpha = .05 (every 97th key planted
        // 1000× smaller) — deterministic, and SUBLINEAR in K by BH's own
        // step-up geometry: the threshold line 0.05·i/m tightens as m
        // grows at fixed signal density, so only the deepening extreme
        // tail clears it (measured 16 → 26 at 1× → 20×).
        def hyp = spark.read.parquet(s"$dir/lineitem_pivot")
          .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
          .withColumn("p", round(when(col("id") % 97 === 0,
            graft.ops.Sampling.hashFraction("graft-sb-p", Seq(col("id")))
              / 1000.0)
            .otherwise(graft.ops.Sampling.hashFraction("graft-sb-p",
              Seq(col("id")))), 9))
        var disc = 0L; var m = 0L
        val (bMed, bS) = timeMedian {
          val q = graft.stats.MultipleTesting
            .benjaminiHochberg(hyp, "p", "id")
          val r = q.agg(
            sum(when(col("q_value") <= 0.05, 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("n")).head()
          disc = r.getAs[Long]("d"); m = r.getAs[Long]("n")
        }
        emit("bh_fdr", k, m, bMed, bS, s""","discoveries":$disc""")
      }

      if (wanted("mann_whitney")) {
        // K× rows over a CONSTANT 53-value domain: the per-value count
        // aggregation (map-side combined) is the whole cost; the sorted
        // distinct-value table never grows. Witness: |z| grows ~√K under
        // the fixed +3 shift (same effect, K× the evidence).
        var z = 0.0
        val (mMed, mS) = timeMedian {
          val base = li.withColumn("__arm",
            graft.ops.Sampling.hashFraction("graft-mw",
              Seq(col("l_orderkey"), col("l_linenumber"))) < 0.5)
            .withColumn("__v",
              col("l_quantity") + when(col("__arm"), 0).otherwise(3))
          z = graft.stats.RankTests
            .mannWhitneyU(base, col("__arm"), col("__v"))
            .head().getAs[Double]("z")
        }
        emit("mann_whitney", k, li.count(), mMed, mS, s""","z":$z""")
      }

      if (wanted("textrank")) {
        // per-copy token suffixes make vocabulary AND edges scale K×
        // (disjoint word graphs per copy): the propagation state is the
        // K×-vocab rank table, so time must scale ~K× per iteration.
        // Witness: vertex (word) count.
        var words = 0L
        val (tMed, tS) = timeMedian {
          words = graft.ops.TextRank.keywords(docs, "text").count()
        }
        emit("textrank", k, docs.count(), tMed, tS, s""","words":$words""")
      }

      if (wanted("interevent")) {
        // per-stream lag window: K× users at CONSTANT events/user —
        // frame sizes fixed, key cardinality scales — plus the per-type
        // exact median over a K×-row gap table. Witness: total gaps.
        var gaps = 0L
        val (gMed, gS) = timeMedian {
          gaps = graft.ops.EventAnalytics.interEventGaps(ev)
            .agg(sum(col("n_gaps"))).head().getLong(0)
        }
        emit("ev_interevent_gaps", k, ev.count(), gMed, gS,
          s""","gaps":$gaps""")
      }

      if (wanted("rfm")) {
        // customer-grain quintile scoring on the scaled event ledger:
        // K× users, so the groupBy AND the 12-cell exact-percentile
        // aggregate both see K× customer rows. Witness: customer count.
        var custs = 0L
        val (rMed, rS) = timeMedian {
          custs = graft.ops.Segmentation
            .rfmScores(ev, "user_id", "ts", "value").count()
        }
        emit("seg_rfm_scores", k, ev.count(), rMed, rS,
          s""","customers":$custs""")
      }

      if (wanted("peak_concurrency")) {
        // the sweep-line partition-prefix scan: K× users → K× (user,
        // day) intervals → 2K× endpoints through ONE range-partitioned
        // sort; driver traffic stays |partitions| scalars regardless of
        // K. Witness: the peak itself scales ~K (all copies share the
        // same calendar, so peaks stack).
        var peak = 0L
        val (pMed, pS) = timeMedian {
          peak = graft.ops.EventAnalytics.peakConcurrency(ev)
            .head().getAs[Long]("peak_concurrency")
        }
        emit("ev_peak_concurrency", k, ev.count(), pMed, pS,
          s""","peak":$peak""")
      }

      if (wanted("turnover")) {
        // distinct (user, week) + the week-shifted full-outer join:
        // both sides shuffle on the scaled user key; the rollup output
        // stays calendar-bounded. Witness: Σ active (scales ~K).
        var active = 0L
        val (tMed, tS) = timeMedian {
          active = graft.ops.EventAnalytics.userTurnover(ev)
            .agg(sum(col("n_active"))).head().getLong(0)
        }
        emit("ev_user_turnover", k, ev.count(), tMed, tS,
          s""","sum_active":$active""")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
