package graft

import org.apache.spark.sql.SparkSession

/** The one local-session factory every `main` in this repo goes through.
  *
  * Centralized because two confs are correctness-bearing, not tuning:
  *
  *  - `spark.sql.session.timeZone=UTC` — [[Tables.tsNormalizer]]'s
  *    TIMESTAMP_NTZ→TimestampType cast is instant-preserving ONLY under a
  *    UTC session zone; an entry point that forgot the pin would silently
  *    shift every `events.ts` instant on a non-UTC host.
  *  - `spark.sql.shuffle.partitions` sized to the core count (not the 200
  *    default) — local[N] has N task slots; 200 shuffle partitions at this
  *    scale is pure scheduling overhead.
  */
object GraftSession {

  /** Build (or reuse) the local session. `extra` layers entry-point-specific
    * confs (AQE toggles, scheduler mode) over the shared base. */
  def local(
      cores: Int,
      appName: String,
      extra: Map[String, String] = Map.empty,
      logLevel: String = "WARN"): SparkSession = {
    // Validate rather than concatenate blindly: "64m" or "" would yield
    // "64mm"/"m" and throw at session construction (r18 ADVICE).
    val advisoryMb: Int = sys.env.get("SPARK_GRAFT_ADVISORY_MB") match {
      case Some(s) => s.toIntOption.filter(_ > 0).getOrElse {
        System.err.println(
          s"[graft] WARNING: SPARK_GRAFT_ADVISORY_MB='$s' is not a positive integer; using 64")
        64
      }
      case None => 64
    }
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE partition coalescing: keep Spark's default
      // parallelismFirst=TRUE. The r18 flip to false was reasoned from
      // "a KB-sized shuffle fans out to one partition per core under
      // true" — which is not what ShufflePartitionsUtil does: under true
      // the target is min(advisory, max(totalBytes/defaultParallelism,
      // minPartitionSize=1m)), so a KB-sized exchange coalesces to ONE
      // partition either way, while a mid-size CPU-heavy exchange
      // (windows, k-means assign, winnowing: a few MB of shuffle bytes
      // feeding expensive per-row work) keeps per-core parallelism under
      // true but serializes onto ceil(bytes/64m)=1 task under false —
      // exactly the r18 ADVICE warning. Measured r19 A/B (32 cores,
      // 9 iters, back-to-back, per-query minima vs best-of-two false
      // runs): true is geomean 0.93× (km_lloyd 0.78, wn_fingerprints
      // 0.78, ev_interevent 0.86, prj_covariance 0.91, others flat).
      // At 100 TB the two settings agree (bytes/cores >> advisory ⇒
      // target = advisory), so true is also the scale-neutral choice.
      // Env-overridable for future A/B.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      // Post-shuffle advisory size, env-overridable per environment
      // (SPARK_GRAFT_ADVISORY_MB, validated above; local default keeps
      // Spark's 64 MB).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        advisoryMb + "m")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    // getOrCreate may have handed back a pre-existing session whose builder
    // didn't pin the zone; timeZone is a runtime conf, so force it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
