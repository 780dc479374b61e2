package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology: every headline plan is executed once untimed (warm-up:
  * codegen compilation, JIT, parquet footer cache), then N timed
  * iterations (SPARK_GRAFT_BENCH_ITERS, default 3) with the per-query
  * MEDIAN reported — single-iteration timings on a 32-thread local JVM
  * proved too noisy to trust (the r2/r3 q5/j1/a1 swings). Results are
  * materialized through the noop sink so projections are actually
  * computed — a bare .count() lets Catalyst prune the work.
  */
object Bench {

  /** Representative operators across the engine's surface: TPC-H-style agg,
    * star join, cohort count, pivot, column stats, funnel, text quality,
    * MinHash dedup, similarity top-k, windowed/sessionized/as-of events. */
  val headline: Seq[String] = Seq(
    "q1_pricing_agg",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "j1_star_left_join",
    "j1_star_left_join_bucketed",
    "j1_star_left_join_merge",
    "a1_count_distinct",
    "a7_enwiden_pivot",
    "t1_column_stats",
    // the 100 TB DEFAULT stats path (sketch quantiles + HLL) tracked as its
    // own regression line, separate from the exact path's variance (r9 #4)
    "t1_column_stats_approx",
    "t2_corr_pearson",
    "t7_filter_funnel",
    "txt_quality",
    "dd_minhash_lsh",
    "sim_topk_bruteforce",
    "ev_windowed_agg",
    "ev_sessionize",
    "ev_asof_join",
    // round-9 session-3 flagships (totals not comparable to r8's 17-query set)
    "txt_heavy_hitters",
    "smp_quality_topfrac",
    "ev_anomaly_flags",
    // round-11: iterative-join family (PageRank) and the salted skew join
    // — new plan shapes the headline previously had no regression line for
    "gr_pagerank",
    "j4_salted_skew_join",
    // round-12: iterative clustering (Lloyd fit + assignment) — the last
    // iterative family without a regression line
    "km_lloyd_assign",
    // round-12 session 2: winnowing (per-doc O(n·w) array expression —
    // the heaviest narrow-map text shape in the engine)
    "wn_fingerprints",
    // round-12 session 2: the mergeable-sketch family's regression line
    // (one hash agg + windowed estimator) and the heaviest LM
    // composition (two trains + two scoring joins + Gumbel top-k)
    "hll_estimate_groups",
    "smp_importance_resample",
    // round-13: the projection/PCA family's regression line — the
    // d²-bounded covariance shuffle is the family's dominant plan shape
    "prj_covariance",
    // round-13: margin-based bitext mining — the |X|·|Y| scored-pair
    // shape (cross join + two window/aggregate passes). Round 14: the
    // gate pins its corpus to vec_id < 500, so this line is a FIXED-SIZE
    // correctness anchor at every sf; the family's scale line is the
    // corpus IVF miner below
    "sim_bitext_mine",
    // round-14: corpus-scale bitext — IVF candidate graph over the FULL
    // embeddings table; the line whose cost is Σ probed-cell sizes and
    // therefore the one that must track data growth
    "sim_bitext_corpus_ivf",
    // round-13 session 2: Kneser–Ney scoring (three vocab-keyed joins +
    // per-doc mean — the heaviest smoothing-LM plan) and the cross-doc
    // dup-ngram fraction (shingle explode → df groupBy → join-back —
    // the corpus-linear pairwise-avoidance shape)
    "txt_kneser_ney",
    "txt_dup_ngram_fraction",
    // round-13 session 3: exact triangle enumeration — the three-way
    // self-join (degree-ordered wedge close) is a new plan shape with
    // no prior regression line
    "gr_triangles",
    // round-14 session 2: the multi-cell exact-percentile aggregate
    // (RFM thresholds — a sort-based agg shape with no prior line) and
    // the per-stream lag window over the full event table (inter-event
    // gaps — the heaviest partitioned-window + percentile composition)
    "seg_rfm_scores",
    "ev_interevent_gaps")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.local(cpus.toInt, "graft-bench",
      Map("spark.sql.adaptive.enabled" -> "true"))

    val queries = SparkEntry.queries
    // SPARK_GRAFT_BENCH_ONLY=q1_pricing_agg,dd_cluster_resolve selects ANY
    // gate entries (not just headline) for local iteration; unset = full
    // headline (the driver contract).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(set) =>
        val unknown = set -- queries.keySet
        require(unknown.isEmpty,
          // a typo would otherwise time zero queries and write a
          // near-empty artifact that passes for a measurement
          s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
        queries.keys.filter(set.contains).toSeq.sorted
      case None => headline.filter(queries.contains)
    }

    def run(name: String): Unit =
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warm-up pass (uncounted): codegen + JIT + file metadata caches.
    selected.foreach { n =>
      try run(n) catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
    }
    // The warm-up executed EVERY query, so all their internally-pinned
    // caches (minhash signatures, semantic-dedup cells) are alive here —
    // drop them so the first timed query starts from the same cache state
    // as every later one (per-query clearCache below only covers timed runs).
    spark.catalog.clearCache()
    System.gc()

    // Default 5 (was 3): the host's sporadic 1–5 s stall events (see
    // README bench methodology) pollute ~one sample per run; with 5
    // samples the median is robust to one outlier and the contention flag
    // below can trim it.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt

    // Hypervisor steal ticks (field 8 of /proc/stat's cpu line, 10 ms
    // ticks, summed over all vCPUs): this host is a VM with bursty noisy
    // neighbors, and steal DURING a query is direct per-query evidence of
    // external contention — unlike the 1-minute load average, which can't
    // see a 2-second burst. Recorded per query in the artifact so a
    // contended:true flag is attributable to its cause.
    def stealTicks: Long =
      try {
        val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
        line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
      } catch { case _: Exception => 0L }

    def timeOnce(name: String, iter: Int): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(name); true } catch { case e: Throwable =>
        // A failed iteration must be loud: a query flaking 2-of-3 otherwise
        // reports the lone success as its median with rc=0 (r4/r5 ADVICE).
        System.err.println(s"[bench] FAILED $name iter $iter: ${e.getClass.getName}: ${e.getMessage}")
        false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }

    // Per-query median over `iters` runs; a query interleaves its own
    // iterations (not round-robin) so each median sees the same cache state.
    // All raw samples ship in the artifact so an environment-contention
    // episode (the BENCH_r05 57.5 s phantom) is self-diagnosing: wildly
    // spread samples on untouched queries = noisy machine, not a regression.
    // Cached blocks some operators pin internally (minhash signatures,
    // semantic-dedup cells) are dropped after each query so they cannot
    // pressure the heap of everything benched after them.
    val results = selected.map { name =>
      val steal0 = stealTicks
      val samples = (1 to iters).map(i => timeOnce(name, i)).filter(_ >= 0).sorted
      val stealMs = (stealTicks - steal0) * 10
      spark.catalog.clearCache()
      // GC hygiene (JMH-style): collect the garbage a query accumulated
      // OUTSIDE anyone's timed window. Without this, the heaviest allocator
      // eventually absorbs a major-GC pause inside one of its own
      // iterations — observed as a7_enwiden_pivot's LAST sample spiking
      // ~3x in three independent runs (r8 artifact included), which then
      // trips the contention self-flag on an otherwise quiet host.
      System.gc()
      val median =
        if (samples.isEmpty) -1.0
        else samples(samples.size / 2)
      (name, median, samples, stealMs)
    }

    // "queries" stays name -> median (driver contract); min/samples/steal
    // are additive keys the driver ignores.
    val qs = results.map { case (k, m, _, _) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, s, _) =>
        "\"" + k + "\":" + (if (s.isEmpty) -1.0 else s.head) }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, s, _) => "\"" + k + "\":" + s.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val steals = results.map { case (k, _, _, st) => "\"" + k + "\":" + st }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Contention self-diagnosis: on a quiet host, iterations of the same
    // query land within ~1.5× of each other; a spread beyond 3× on any
    // query means external load polluted the run, and the artifact says so
    // about itself instead of passing for a measurement. With >=5 samples
    // the single largest is TRIMMED before the ratio: the reported median
    // is robust to one outlier (the host's sporadic 1–5 s stall events hit
    // ~one sample per run — README bench methodology), so one hiccup must
    // not condemn an otherwise-quiet artifact; sustained contention
    // pollutes >=2 samples and still trips. Raw samples + per-query
    // steal_ms ship in the artifact either way — nothing is hidden.
    val spreads = results.collect { case (k, _, s, _) if s.nonEmpty && s.head > 0 =>
      val hi = if (s.size >= 5) s(s.size - 2) else s.last
      (k, hi / s.head) }
    val worst = spreads.sortBy(-_._2).take(3)
    val contended = worst.exists(_._2 > 3.0)
    if (contended) System.err.println(
      s"[bench] WARNING sample spread >3x on ${worst.filter(_._2 > 3.0).map(_._1).mkString(", ")}" +
        " — host contention suspected; re-run on a quiet machine before trusting medians")
    // A total that silently sums only the SURVIVING queries reads as a
    // phantom speed-up next to a full artifact (r7 ADVICE): when any query
    // has no successful iteration, publish value:-1 plus the failed set
    // instead of a misleading partial sum.
    val failed = results.collect { case (k, m, _, _) if m < 0 => k }
    val value = if (failed.isEmpty) total.toString else "-1"
    // Sum of per-query MINIMA beside the median total (r15 verdict item
    // 5): the min is the least-contended observation of each query, so
    // round-over-round comparisons on this host's bursty hypervisor can
    // anchor on a statistic one steal event cannot move — a contended
    // driver run inflates the median total while sum_of_mins stays put.
    val sumOfMins =
      if (failed.nonEmpty) -1.0
      else results.map { case (_, _, s, _) => s.head }.sum
    if (failed.nonEmpty) System.err.println(
      s"[bench] ${failed.size} queries produced no successful iteration " +
        s"(${failed.mkString(", ")}); total suppressed")
    // Full diagnostics (samples/min/steal/contention) — file + stderr ONLY.
    // The driver captures ~2 KB of stdout tail; this line grew to ~6 KB by
    // r15 and cut its own head off, leaving BENCH_r15..r18 "parsed": null
    // (r18 verdict item 1). Diagnostics therefore never touch stdout.
    val diagJson =
      s"""{"metric":"total","value":$value,"unit":"sec","queries":$qs,"min":$mins,"sum_of_mins":$sumOfMins,"samples":$raw,"steal_ms":$steals,"iters":$iters,"contended":$contended,""" +
      s""""failed_count":${failed.size},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // Contract-minimal line (metric/value/unit/queries/sf, ~1.3 KB for 35
    // queries) printed LAST on stdout so the tail window always holds its
    // start. Everything the driver parses is here; everything else is in
    // the artifact file.
    val contractJson =
      s"""{"metric":"total","value":$value,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    System.err.println(diagJson)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (diagJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // After spark.stop() so no stray INFO line can land after it.
    println(contractJson)
    System.out.flush()
  }
}
