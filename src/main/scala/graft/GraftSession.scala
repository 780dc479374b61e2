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
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Let AQE size post-shuffle partitions by BYTES (the advisory
      // target), not by core count: with the default
      // parallelismFirst=true every tiny exchange still fans out to one
      // partition per core, so a KB-sized shuffle pays `cores` tasks of
      // pure scheduling per stage (guide §2.2; Spark's own conf doc
      // recommends false). Scale-adaptive by construction — a 100 TB
      // shuffle still gets bytes/advisory partitions — and overridable
      // per environment via SPARK_GRAFT_ADVISORY_MB (the local default
      // keeps Spark's 64 MB advisory). Explicit repartition(n) calls
      // (e.g. Parallelism.widen's CPU-parallelism guard) are
      // REPARTITION_BY_NUM exchanges, which AQE never coalesces, so
      // compute-bound narrow maps keep their full fan-out.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_MB", "64") + "m")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    // getOrCreate may have handed back a pre-existing session whose builder
    // didn't pin the zone; timeZone is a runtime conf, so force it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
