package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The 93 entries are submitted CONCURRENTLY from a small thread pool —
  * Spark's scheduler multiplexes jobs from many threads over one session,
  * so at sf0.01 (where every query is dominated by job-scheduling overhead,
  * not data) the dump's wall time is ~pool-width shorter, and a noisy host
  * stalls one slot instead of the whole serial chain. Query functions are
  * pure plan builders over a thread-safe SparkSession; each entry writes
  * its own directory, so there is no shared mutable state between slots.
  * FAIR scheduling keeps a slow entry (k-means fits) from starving the
  * cheap ones behind it. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Default 16 task slots (not 4): the dump multiplexes ~8 concurrent
    // queries over ONE local executor pool, so the slot count — not the
    // data — is the throughput limit at sf0.01.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(16, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.local(cpus.toInt, "graft-verify",
      Map("spark.scheduler.mode" -> "FAIR"))
    Tables.enableSharedCache() // decode each table once across the 93 entries
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=a,b restricts the dump for local iteration
    // (same contract as Bench's BENCH_ONLY); unset = full dump (driver mode).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(set) =>
        val unknown = set -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY names unknown queries: ${unknown.mkString(", ")}")
        SparkEntry.queries.view.filterKeys(set).toMap
      case None => SparkEntry.queries
    }
    // oracle_sql.json is written BEFORE the dump, not after: if a
    // driver-side timeout kills this process mid-run, the completed query
    // directories plus the SQL map still let the oracle compare grade every
    // entry that landed — previously a timeout zeroed the whole round.
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared.json = the FULL declared query list (not just the
    // SQL-checkable subset), written before the dump: reconciliation can
    // then catch a rows-only entry that silently vanishes from the dump —
    // oracle_sql.json alone can't see those (r8 ADVICE).
    Files.writeString(Paths.get(s"$outDir/declared.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))

    val width = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt
    val pool = Executors.newFixedThreadPool(width)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    // A failed entry must be LOUD in the artifact, not silently absent
    // (round 7: ev_sessionize threw, wrote nothing, and the driver's gate
    // dropped it without a red row). On failure we (a) leave an _ERROR.txt
    // marker inside the entry's output directory — a downstream parquet
    // reader then errors visibly instead of "file not found" being
    // conflated with "not declared" — and (b) record every failure in
    // failed.json next to oracle_sql.json.
    val failures = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val dumps = selected.toSeq.map { case (name, fn) =>
      Future {
        val q0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(
            f"[verify] $name ok ${(System.nanoTime() - q0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
          failures.put(name, msg)
          System.err.println(s"[verify] $name FAILED: $msg")
          try {
            val d = Paths.get(s"$outDir/$name")
            Files.createDirectories(d)
            Files.writeString(d.resolve("_ERROR.txt"), msg + "\n")
          } catch { case _: Throwable => () }
        }
      }
    }
    Await.result(Future.sequence(dumps), Duration.Inf)
    pool.shutdown()
    locally {
      import scala.jdk.CollectionConverters._
      val failedJson = failures.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    }
    System.err.println(
      f"[verify] total ${selected.size} queries, ${failures.size} failed, " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    // Exit 0 even with failures: the driver must still grade the entries
    // that DID land — the loud markers above carry the failure signal.
    spark.stop()
  }
}
