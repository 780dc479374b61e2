package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-token mining at corpus scale: all tokens whose global
  * occurrence count is at least `minFraction` of the total token stream,
  * with EXACT counts — but without ever shuffling the full token stream.
  *
  * Two passes:
  *
  *  1. **Candidates** — one scan, zero shuffle: each partition summarizes
  *     its token stream with a Misra-Gries sketch of `capacity` counters
  *     (decrement-all on overflow, amortized O(1)/token). The union of
  *     per-partition summaries is guaranteed to contain every token with
  *     global count > N/(capacity+1) [Misra & Gries 1982; merge bound from
  *     Agarwal et al., "Mergeable Summaries", PODS 2012], so with
  *     minCount = ceil(minFraction·N) > N/(capacity+1) the candidate set
  *     is a provable superset of the answer. Each partition also reports
  *     its token count; their sum is N.
  *  2. **Verify** — one scan + a shuffle that carries ONLY candidate-token
  *     rows: tokens are filtered against the candidate set BEFORE the
  *     groupBy (an `isInCollection` predicate for modest sets, a broadcast
  *     join past [[InSetLimit]]), then exactly counted and thresholded.
  *     Map-side combine bounds the shuffle at ≤ candidates × partitions
  *     rows regardless of data volume.
  *
  * If the caller picks a (minFraction, capacity) pair whose guarantee does
  * not hold (minCount ≤ N/(capacity+1)), the candidate step is discarded
  * and pass 2 counts every token exactly — still correct, loudly logged,
  * and the caller should raise `capacity` (≈ 2/minFraction is comfortable).
  *
  * 100 TB shape: pass 1 is embarrassingly parallel; the candidate union is
  * ≤ partitions × capacity entries (a few MB even at 10^5 partitions —
  * prefer a smaller capacity over a larger one when minFraction is loose).
  * Pass 2's shuffle is bounded by the candidate set, not the corpus.
  */
object HeavyHitters {

  /** Past this many candidates, pass 2 switches from an `isInCollection`
    * scan predicate to a broadcast join (InSet literal lists have driver
    * and codegen costs that grow with the set). */
  val InSetLimit = 65536

  /** (token, cnt) for every token with count ≥ ceil(minFraction·N), exact,
    * ordered by cnt desc then token. Tokenization = [[TextOps.tokens]]
    * (whitespace split, blank → empty). */
  def frequentTokens(
      df: DataFrame, textCol: String,
      minFraction: Double, capacity: Int = 4096): DataFrame = {
    require(minFraction > 0.0 && minFraction <= 1.0,
      s"minFraction must be in (0, 1], got $minFraction")
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._

    // Pass 1: per-partition Misra-Gries. The sentinel (null, n_p) row per
    // partition carries the token count; everything else is a candidate.
    val toks = df.select(TextOps.tokens(col(textCol)).as("w")).as[Seq[String]]
    val partial = toks.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](capacity * 2)
      var np = 0L
      it.foreach { ws =>
        if (ws != null) ws.foreach { t =>
          np += 1L
          if (counters.containsKey(t)) counters.put(t, counters.get(t) + 1L)
          else if (counters.size < capacity) counters.put(t, 1L)
          else {
            val eit = counters.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      counters.forEach((t, c) => out += ((t, c)))
      out += ((null, np))
      out.iterator
    }.collect() // bounded: partitions × (capacity + 1) rows

    val nTotal = partial.iterator.filter(_._1 == null).map(_._2).sum
    val minCount = math.ceil(minFraction * nTotal).toLong
    val exploded = df.select(explode(TextOps.tokens(col(textCol))).as("token"))

    // Guarantee check: the MG union only covers count > N/(capacity+1).
    val counted =
      if (nTotal == 0L || minCount > nTotal / (capacity + 1).toDouble) {
        val cands = partial.iterator.collect {
          case (t, _) if t != null => t
        }.toSet.toSeq
        val filtered =
          if (cands.isEmpty) exploded.limit(0)
          else if (cands.size <= InSetLimit)
            exploded.filter(col("token").isInCollection(cands))
          else exploded.join(broadcast(cands.toDF("token")), Seq("token"))
        filtered.groupBy("token").agg(count(lit(1)).as("cnt"))
      } else {
        System.err.println(
          s"[graft] HeavyHitters: minCount=$minCount ≤ N/(capacity+1)=" +
            f"${nTotal / (capacity + 1).toDouble}%.1f — candidate guarantee " +
            "void; counting every token exactly (raise capacity to " +
            f"≈${math.ceil(2.0 / minFraction).toLong})")
        exploded.groupBy("token").agg(count(lit(1)).as("cnt"))
      }
    counted.filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Mergeable Misra-Gries summary of a token stream [Agarwal et al.,
    * "Mergeable Summaries", PODS 2012]: counters UNDERESTIMATE true
    * counts by at most [[maxError]] = n/(capacity+1), and any token whose
    * true count exceeds that bound is guaranteed present. Merging
    * preserves the bound (errors add exactly as the n's do), which is
    * what makes the summary a STREAMING structure: per-micro-batch
    * summaries fold into one without ever revisiting the stream. */
  final case class TokenSummary(
      counters: Map[String, Long], n: Long, capacity: Int) {
    def maxError: Long = n / (capacity + 1)
    def estimate(token: String): Long = counters.getOrElse(token, 0L)
    /** Tokens whose TRUE count could meet ceil(minFraction·n): estimate +
      * maxError ≥ threshold — a guaranteed superset of the true hitters
      * (no false negatives; false positives bounded by the error). */
    def hitters(minFraction: Double): Seq[(String, Long)] = {
      val minCount = math.ceil(minFraction * n).toLong
      counters.toSeq.filter(_._2 + maxError >= minCount)
        .sortBy { case (t, c) => (-c, t) }
    }
  }

  /** One-pass distributed summary: per-partition Misra-Gries, partials
    * folded with [[merge]] on the driver (bounded: partitions × capacity
    * entries cross, never the token stream). */
  def summarize(
      df: DataFrame, textCol: String, capacity: Int = 4096): TokenSummary = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(TextOps.tokens(col(textCol)).as("w")).as[Seq[String]]
    val partials = toks.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](capacity * 2)
      var np = 0L
      it.foreach { ws =>
        if (ws != null) ws.foreach { t =>
          np += 1L
          if (counters.containsKey(t)) counters.put(t, counters.get(t) + 1L)
          else if (counters.size < capacity) counters.put(t, 1L)
          else {
            val eit = counters.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
      }
      val m = scala.collection.mutable.Map.empty[String, Long]
      counters.forEach((t, c) => m.update(t, c))
      Iterator.single((m.toMap, np))
    }.collect()
    partials.foldLeft(TokenSummary(Map.empty, 0L, capacity)) {
      case (acc, (m, np)) => merge(acc, TokenSummary(m, np, capacity))
    }
  }

  /** Agarwal-style MG merge: counter-wise sum, then — if over capacity —
    * subtract the (capacity+1)-th largest counter from all and drop the
    * non-positive. Error bounds add exactly as the stream lengths do, so
    * the merged summary keeps maxError = (n_a + n_b)/(capacity+1). */
  def merge(a: TokenSummary, b: TokenSummary): TokenSummary = {
    require(a.capacity == b.capacity,
      s"capacity mismatch: ${a.capacity} vs ${b.capacity}")
    val sum = scala.collection.mutable.Map.empty[String, Long]
    a.counters.foreach { case (t, c) => sum.update(t, c) }
    b.counters.foreach { case (t, c) =>
      sum.update(t, sum.getOrElse(t, 0L) + c)
    }
    val pruned =
      if (sum.size <= a.capacity) sum.toMap
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)
          .apply(a.capacity) // (capacity+1)-th largest
        sum.iterator.collect {
          case (t, c) if c - cut > 0L => t -> (c - cut)
        }.toMap
      }
    TokenSummary(pruned, a.n + b.n, a.capacity)
  }

  /** foreachBatch sink maintaining a running [[TokenSummary]] over an
    * unbounded stream — the streaming twin of [[summarize]]: each
    * micro-batch is summarized (one distributed pass over the batch) and
    * folded into the accumulator. Read the reference between/after
    * batches; the bound degrades only with total stream length, exactly
    * as the batch bound would. */
  def runningSummarySink(textCol: String, capacity: Int = 4096):
      (java.util.concurrent.atomic.AtomicReference[TokenSummary],
        (DataFrame, Long) => Unit) = {
    val ref = new java.util.concurrent.atomic.AtomicReference(
      TokenSummary(Map.empty, 0L, capacity))
    val fn = (batch: DataFrame, _: Long) => {
      val s = summarize(batch, textCol, capacity)
      ref.updateAndGet(prev => merge(prev, s))
      ()
    }
    (ref, fn)
  }
}
