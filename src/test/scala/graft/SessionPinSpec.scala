package graft

/** The driver-session contract (r13 verdict item 2): `SparkEntry.queries`
  * hands each gate a session the REPO did not construct — the grading
  * driver's. Every other environment (GraftSession mains, build.sbt's
  * forked test JVM) pins the semantics-bearing confs; these tests prove
  * the gate wrapper repairs a DELIBERATELY drifted session, so timestamp
  * rendering and cast semantics can never depend on the harness.
  */
class SessionPinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Collect a gate's result twice — once under the suite's pinned UTC
    * session, once after drifting the confs a driver could plausibly
    * carry — and require byte-identical rows. */
  private def runDrifted(gate: String): Unit = {
    val q = SparkEntry.queries(gate)
    val clean = q(spark, sf).collect().toSeq
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try {
      val drifted = q(spark, sf).collect().toSeq
      assert(drifted == clean,
        s"$gate must produce identical rows on a drifted session")
      // the wrapper leaves the session repaired, not just the one plan
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled") == "true")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    }
  }

  test("timestamp-digesting gate survives a drifted driver session") {
    // l_shipdate renders into the content digest as a string — the
    // exact cell a TZ- or NTZ-drifted session would silently move
    runDrifted("mnt_table_digest")
  }

  test("event-time gate survives a drifted driver session") {
    // daily active counts truncate event instants to dates — the
    // classic session-timezone casualty
    runDrifted("ev_dau_wau")
  }
}
