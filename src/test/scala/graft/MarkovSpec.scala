package graft

import graft.ops.Markov
import java.sql.Timestamp

/** Markov chain over event sequences: hand-counted transitions, the
  * known stationary distribution of a 2-state chain, absorbing-state
  * mass redistribution, and ordering determinism. */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("transition counts and MLE probabilities match hand counts") {
    // user 1: A B A B  → AB, BA, AB ; user 2: A A B → AA, AB
    val events = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "B"),
      (1L, ts(3), 12L, "A"), (1L, ts(4), 13L, "B"),
      (2L, ts(1), 20L, "A"), (2L, ts(2), 21L, "A"), (2L, ts(3), 22L, "B"),
      (3L, ts(9), 30L, "C") // singleton entity: no transitions
    ).toDF("user_id", "ts", "event_id", "event_type")
    val tr = Markov.transitionMatrix(events, "user_id", "ts", "event_id",
        "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(tr(("A", "B")) == ((3L, 0.75)))  // A out-total = 4
    assert(tr(("A", "A")) == ((1L, 0.25)))
    assert(tr(("B", "A")) == ((1L, 1.0)))
    assert(tr.size == 3)
  }

  test("2-state chain converges to the known stationary distribution") {
    // P(A->B)=1, P(B->A)=0.5, P(B->B)=0.5 → pi = (1/3, 2/3)
    val tr = Seq(("A", "B", 10L), ("B", "A", 5L), ("B", "B", 5L))
      .toDF("src", "dst", "n")
    val pi = Markov.stationary(tr, iters = 40).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi("A") - 1.0 / 3) < 1e-6, s"pi=$pi")
    assert(math.abs(pi("B") - 2.0 / 3) < 1e-6, s"pi=$pi")
  }

  test("absorbing state: leaked mass redistributes, total stays 1") {
    // C has no outgoing transitions — classic absorbing sink
    val tr = Seq(("A", "B", 1L), ("B", "C", 1L)).toDF("src", "dst", "n")
    val rows = Markov.stationary(tr, iters = 7).collect()
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("ties at equal timestamps break on the tie column") {
    val events = Seq(
      (1L, ts(5), 2L, "B"), (1L, ts(5), 1L, "A"), (1L, ts(5), 3L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val tr = Markov.transitionMatrix(events, "user_id", "ts", "event_id",
        "event_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(tr == Set(("A", "B"), ("B", "C")))
  }

  test("entropy rate: deterministic cycle 0, fair coin chain ln2-weighted") {
    import java.sql.Timestamp
    def ts(i: Int) = new Timestamp(i * 1000L)
    // a deterministic A->B->A->B... cycle: every row is certain
    val cycle = (0 until 20).map(i =>
      (1L, ts(i), i.toLong, if (i % 2 == 0) "A" else "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val c = Markov.entropyRate(cycle, "user_id", "ts", "event_id",
      "event_type").head()
    assert(c.getAs[Double]("entropy_rate") == 0.0, s"$c")
    // from A the chain flips fairly (A->A, A->B equally); B always
    // returns to A: H(A) = ln 2, H(B) = 0; rate = pi_A * ln 2
    val seq = "AABAABAAB" * 6 // A: ->A,->B alternating; B: ->A always
    val coin = seq.zipWithIndex.map { case (ch, i) =>
      (1L, ts(i), i.toLong, ch.toString) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Markov.entropyRate(coin, "user_id", "ts", "event_id",
      "event_type").head()
    val rate = r.getAs[Double]("entropy_rate")
    assert(rate > 0.3 && rate < math.log(2.0),
      s"mixed chain sits between 0 and ln2: $r")
    assert(math.abs(r.getAs[Double]("normalized")
      - rate / math.log(2.0)) < 1e-5)
  }
}
