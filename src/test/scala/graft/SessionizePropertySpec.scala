package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.StreamingOps

/** ScalaCheck property for sessionization (round-8 verdict item 8): for
  * random per-user event sequences whose inter-event gaps cluster AROUND
  * the 30-minute boundary — just under, EXACTLY at, just over — the
  * streaming `session_window` twin must assign exactly the same sessions
  * as the batch lag/cumsum sessionizer. This pins the half-open boundary
  * contract (a gap of exactly 30:00 starts a new session in BOTH paths);
  * the r8 StreamingSpec fixture only covered one input.
  */
class SessionizePropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // gap distribution biased to the 1800 s boundary; whole seconds only
  // (the sessionizers' gap contract is second-granular: unix_seconds)
  private val gapGen: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(1795L, 1805L), // straddles the boundary, incl. exactly 1800
    2 -> Gen.choose(1L, 600L),     // clearly in-session
    1 -> Gen.choose(3600L, 7200L)) // clearly a break

  private val schema = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def eventsFor(trial: Int): DataFrame = {
    val base = 1700000000L // fixed whole-second epoch base
    val rows = (1 to 5).flatMap { u =>
      val nGaps = 3 + (trial + u) % 9
      val gaps = samples(gapGen, nGaps, seed = trial * 100L + u)
      gaps.scanLeft(0L)(_ + _).map(off =>
        Row(s"u$u", java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(base + off)), 1.0))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("property: stream session assignment == batch around the 30-min boundary") {
    (0 until 5).foreach { trial =>
      val df = eventsFor(trial)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sess-prop-$trial")
      df.write.mode("overwrite").parquet(dir.toString)

      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val name = s"sess_prop_$trial"
      val q = StreamingOps.sessionizeStream(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)

      def key(r: Row): (String, Long, Long) = (
        r.getAs[String]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[Long]("n_events"))
      val streamed = spark.table(name).collect().map(key).toSet
      val batch = StreamingOps.sessionize(df, gapMinutes = 30)
        .collect().map(key).toSet
      assert(streamed == batch,
        s"trial $trial: stream/batch session drift\n" +
          s"stream-only: ${streamed -- batch}\nbatch-only: ${batch -- streamed}")
      // the generator must actually have produced boundary gaps somewhere
      assert(streamed.nonEmpty)
      spark.streams.active.foreach(s => if (s.name == name) s.stop())
    }
  }

  test("exact 30:00 gap EXTENDS the session in both paths (pinned)") {
    // session_window's boundary is INCLUSIVE (an event at exactly
    // start+gap merges) — the property test above falsified the opposite
    // assumption; this pins the minimal case in both engines.
    val base = 1700000000L
    val rows = Seq(0L, 1800L, 3600L, 9000L).map(off => // two exact gaps, one break
      Row("u1", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(base + off)), 1.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val batch = StreamingOps.sessionize(df, gapMinutes = 30)
    assert(batch.count() == 2, "exact-gap events chain into one session")

    val dir = java.nio.file.Files.createTempDirectory("graft-sess-exact")
    df.write.mode("overwrite").parquet(dir.toString)
    val q = StreamingOps.sessionizeStream(
        spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_exact")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("sess_exact").count() == 2,
      "session_window must chain exact-gap events identically")
  }
}
