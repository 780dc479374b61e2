package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Budgeted greedy maximum-coverage data selection (the classic
  * (1−1/e)-approximate greedy for submodular coverage — Nemhauser,
  * Wolsey & Fisher 1978, public): pick k documents maximizing the
  * DISTINCT vocabulary they jointly cover. The coverage flavor of data
  * selection — where [[Similarity.farthestPointSample]] spreads picks in
  * embedding space, max-cover spreads them in FEATURE space (vocabulary,
  * n-grams, domains), the standard recipe for seeding a diverse
  * fine-tuning or eval subset from a huge pool.
  *
  * Greedy round r: gain(d) = |tokens(d) \ covered|; pick the argmax
  * (ties to the smallest id); fold its tokens into `covered`. A doc
  * whose vocabulary is already fully covered has gain 0 and simply
  * drops out of the anti-join — if EVERY remaining doc is fully
  * covered, selection stops early with fewer than k picks (coverage is
  * complete; returning forced zero-gain picks would be noise).
  *
  * Scale shape: the (doc, token) distinct pair table is built ONCE and
  * persisted; each round is one broadcast anti-join against the covered
  * vocabulary + one map-side-combined count + a 1-row argmax. Driver
  * state is the selected docs' union vocabulary — bounded by k × the
  * largest doc's distinct tokens and capped loudly at
  * `maxCoveredTokens` (the bounded-collect contract every driver-side
  * table in this engine carries). */
object Coverage {

  final case class CoverPick(rank: Int, id: Long, gain: Long,
      coveredTotal: Long)

  /** `featuresCol` is any array<string> feature set per row — word
    * shingles ([[TextOps.shingles]]; single words saturate on small
    * vocabularies), domains, hashed n-grams. Null/empty feature arrays
    * contribute nothing and can never be picked. */
  def greedyMaxCover(
      df: DataFrame, idCol: String, featuresCol: String, k: Int,
      maxCoveredTokens: Long = 2000000L): Seq[CoverPick] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val docToks = df
      .select(col(idCol).cast("long").as("id"),
        explode(col(featuresCol).cast("array<string>")).as("t"))
      .filter(col("t").isNotNull && col("t") =!= "")
      .distinct()
      .persist()
    try {
      val covered = scala.collection.mutable.HashSet.empty[String]
      val picks = scala.collection.mutable.ArrayBuffer.empty[CoverPick]
      var r = 0
      var exhausted = false
      while (r < k && !exhausted) {
        val coveredDf = covered.toSeq.toDF("t")
        val fresh = docToks
          .join(broadcast(coveredDf), Seq("t"), "left_anti")
        val top = fresh.groupBy("id").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("id"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val id = top.head.getAs[Long]("id")
          val gain = top.head.getAs[Long]("gain")
          val newToks = fresh.filter(col("id") === id)
            .select("t").collect().map(_.getString(0))
          covered ++= newToks
          require(covered.size <= maxCoveredTokens,
            s"covered vocabulary ${covered.size} exceeds " +
              s"maxCoveredTokens=$maxCoveredTokens — raise the cap or " +
              "coarsen the feature (hash tokens to buckets)")
          picks += CoverPick(r, id, gain, covered.size.toLong)
          r += 1
        }
      }
      require(picks.nonEmpty, "no documents with any tokens to cover")
      picks.toSeq
    } finally docToks.unpersist(blocking = false)
  }
}
