package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH bucketed variant as the scale path (candidates ≈ bucket-mates, so
  * the pair space is ~n²/2^bits instead of n²; recall is tunable via bits
  * and multiprobe).
  *
  * Cosine is a pure `Column` expression — `zip_with` product + sequential
  * `aggregate` sum in double — mirrored exactly by the DuckDB oracle's
  * list arithmetic so results hash-match.
  */
object Similarity {

  /** Sequential left-fold sum of an array<double> column. */
  private def asum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column = asum(zip_with(a, b, (x, y) => x * y))

  def norm2(a: Column): Column = asum(transform(a, x => x * x))

  /** cosine = dot / (sqrt(||a||²) * sqrt(||b||²)); null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(norm2(a)); val nb = sqrt(norm2(b))
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))
  }

  /** Exact top-k neighbors for each query id: the query side is broadcast
    * (queries are few), the corpus scan streams — one pass, no shuffle of
    * the corpus. Returns (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, k: Int = 10): DataFrame = {
    val corpus = df.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
    val queries = df.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** Random-hyperplane signature buckets: `bits` seeded hyperplanes; bucket
    * = integer of sign bits. Deterministic via seed. Output keeps the
    * (cast) vector for downstream scoring. */
  def hyperplaneBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, seed: Long = 42): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val dim = v.select(size(col("v"))).head().getInt(0)
    val rnd = new java.util.Random(seed)
    val planes: Seq[Array[Double]] =
      Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(col("v"), planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    v.withColumn("bucket", bucket)
  }

  /** ANN top-k via hyperplane LSH with hamming-1 multiprobe: each query
    * probes its own bucket plus (when `multiprobe ≥ 1`) every bucket one
    * sign-flip away — near neighbors that straddle a single hyperplane are
    * recovered, lifting recall from ~0.3-0.5 to ≳0.8 while the candidate
    * set stays ~(bits+1)/2^bits of the corpus. Probing explodes only the
    * (broadcast) query side; each corpus row still has ONE bucket, so no
    * candidate dedup is needed. */
  def annTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, k: Int = 10, bits: Int = 6, seed: Long = 42,
      multiprobe: Int = 1): DataFrame = {
    val bucketed = hyperplaneBuckets(df, idCol, vecCol, bits, seed)
    val qids = df.filter(queryFilter).select(col(idCol).as("qid0"))
    val queries = bucketed.join(broadcast(qids), col("id") === col("qid0"))
      .select(col("id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
    val probeCols: Seq[Column] = col("qbucket") +:
      (if (multiprobe >= 1) (0 until bits).map(i =>
        col("qbucket").bitwiseXOR(lit(1L << i)))
      else Seq.empty)
    val probed = queries.select(col("qid"), col("qv"),
      explode(array(probeCols: _*)).as("qbucket"))
    val scored = bucketed.join(broadcast(probed),
        col("bucket") === col("qbucket") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cosine(col("qv"), col("v")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }
}
