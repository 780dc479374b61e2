package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov chain over per-entity event sequences — the
  * user-journey model behind "where does traffic settle" questions
  * (transition MLE + stationary distribution via power iteration, both
  * textbook-public). States are event types, so every table after the
  * one per-entity ordering window is state-vocabulary-sized: the 100 TB
  * event log reduces to a K×K matrix in a single pass.
  *
  * Scale shape: transitions come from ONE `lead()` window partitioned by
  * entity (bounded partitions — an entity's own history, never global);
  * the power iteration then runs entirely on K-sized tables with one
  * scalar (the dangling mass) crossing to the driver per iteration —
  * the [[Graph]] propagation discipline.
  */
object Markov {

  /** Adjacent-state transition counts and row-normalized MLE
    * probabilities: (src, dst, n, p) with p = n / Σ_dst n rounded to 8.
    * Ordering within an entity is (tsCol, tieCol) — the tiebreaker makes
    * simultaneous events deterministic. Entities with a single event
    * contribute nothing. */
  def transitionMatrix(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val tr = events
      .select(col(entityCol), col(stateCol).as("src"), col(tsCol), col(tieCol))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val totals = tr.groupBy("src").agg(sum(col("n")).as("tot"))
    tr.join(totals, "src")
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("tot"), 8).as("p"))
  }

  /** Stationary distribution of the transition-count table
    * (src, dst, n) by `iters` unrolled power iterations from the uniform
    * vector: π'(s) = Σ_src π(src)·p(src,s) + leak/K, where leak is the
    * mass sitting on absorbing states (states with no outgoing
    * transitions) — redistributed uniformly so total mass stays exactly
    * 1, the dangling-node treatment PageRank uses. Internal probabilities
    * are the UNROUNDED MLE; output π rounds to `roundTo`. Fixed `iters`
    * (not convergence-tested) keeps the recurrence oracle-replayable. */
  def stationary(
      transitions: DataFrame, iters: Int = 6, roundTo: Int = 8): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val states = transitions.select(col("src").as("state"))
      .union(transitions.select(col("dst").as("state")))
      .distinct().persist()
    val k = states.count()
    require(k > 0, "no transitions — stationary distribution undefined")
    val totals = transitions.groupBy("src").agg(sum(col("n")).as("tot"))
      .persist()
    val edges = transitions.join(totals, "src")
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("tot")).as("p"))
      .persist()
    var pi = states.withColumn("pi", lit(1.0 / k)).persist()
    for (_ <- 0 until iters) {
      val leak = pi
        .join(totals, pi("state") === totals("src"), "left_anti")
        .agg(coalesce(sum(col("pi")), lit(0.0))).head().getDouble(0)
      val contribs = pi.join(edges, pi("state") === edges("src"))
        .select(col("dst").as("state"), (col("pi") * col("p")).as("c"))
        .groupBy("state").agg(sum(col("c")).as("c"))
      val next = states.join(contribs, Seq("state"), "left")
        .select(col("state"),
          (coalesce(col("c"), lit(0.0)) + lit(leak / k)).as("pi"))
        .localCheckpoint(true)
      pi.unpersist()
      pi = next
    }
    pi.select(col("state"), round(col("pi"), roundTo).as("pi"))
  }

  /** Entropy rate of the fitted chain (Shannon 1948, public):
    * H = −Σ_s π(s) Σ_d p(s,d)·ln p(s,d) — how unpredictable the NEXT
    * event is given the current one, in nats. The one-number journey
    * summary beside the transition table: ≈ 0 means deterministic
    * funnels, ≈ ln k means the states carry no signal. Absorbing states
    * (no outgoing transitions) contribute zero, the standard
    * convention.
    *
    * Pure composition of [[transitionMatrix]]'s counts and
    * [[stationary]]: per-state conditional entropies fold round-9 from
    * the UNROUNDED MLE, the π-weighted rate folds round-12 against the
    * round-8 stationary vector — state-vocabulary-sized tables
    * end-to-end. Returns one row (k_states, entropy_rate, normalized =
    * rate/ln k), round-6. */
  def entropyRate(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      stateCol: String, iters: Int = 6): DataFrame = {
    val tr = transitionMatrix(events, entityCol, tsCol, tieCol, stateCol)
    val pi = stationary(tr, iters)
    val k = pi.count()
    require(k >= 2, s"entropy rate needs >= 2 states, got $k")
    val p = col("n").cast("double") / col("tot")
    val hs = tr
      .join(tr.groupBy("src").agg(sum(col("n")).as("tot")), "src")
      .groupBy("src")
      .agg(round(-sum(round(p * log(p), 9).cast("decimal(38,12)"))
        .cast("double"), 9).as("h"))
    val rate = pi.join(hs, pi("state") === hs("src"))
      .agg(coalesce(sum(round(col("pi") * col("h"), 12)
        .cast("decimal(38,14)")), lit(0)).cast("double").as("rate"))
      .head().getAs[Double]("rate")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = events.sparkSession
    import spark.implicits._
    Seq((k, r6(rate), r6(rate / math.log(k.toDouble))))
      .toDF("k_states", "entropy_rate", "normalized")
  }
}
