package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/test decontamination: flag (or drop) training documents whose
  * word-n-gram overlap with a benchmark/evaluation corpus exceeds a
  * threshold — the standard leakage control run before every large
  * training-data build (reference pipelines describe it as n-gram collision
  * against held-out sets; the operator here is corpus-generic).
  *
  * Two paths, mirroring [[Dedup.novelAgainstExact]]/[[Dedup.novelAgainstBloom]]:
  *
  *  - [[overlapExact]]: benchmark's distinct shingles are broadcast and the
  *    corpus side is one scan → map-side broadcast join → one map-side-
  *    combinable count per doc. The only shuffle carries (doc_id, partial
  *    count) pairs — bytes ∝ documents, not shingles. This is the
  *    oracle-checkable semantics.
  *  - [[overlapBloom]]: the benchmark shingle set collapses to a Bloom
  *    filter probed by a codegen'd expression
  *    ([[graft.functions.BloomContainsLong]]) inside an array `filter` —
  *    ZERO shuffles, the corpus never moves. Error direction is the safe
  *    one for decontamination: no false negatives (a benchmark shingle
  *    always probes true, so truly contaminated docs can never under-count)
  *    while ~fpp of clean shingles over-count, slightly over-flagging.
  *
  * At 100 TB the benchmark side is small by construction (eval sets are
  * MB-scale), so both shapes keep the big side narrow; prefer the Bloom
  * path when even the (doc_id, count) shuffle matters or when the corpus
  * is a stream.
  */
object Decontaminate {

  /** Per-document overlap with the benchmark shingle set:
    * `(id, n_shingles, overlap, frac)` where `overlap` counts the doc's
    * DISTINCT n-grams that appear anywhere in `benchmark`, and
    * `frac = overlap / n_shingles` (0.0 for docs with < n words). */
  def overlapExact(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val bench = benchmark
      .select(explode(TextOps.shingles(col(benchTextCol), n)).as("sg"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      // explode_outer keeps short docs (< n words → empty shingle array) as
      // an overlap-0 row instead of silently dropping them from the report
      .select(col("id"), size(col("sh")).as("n_shingles"), explode_outer(col("sh")).as("sg"))
      .join(broadcast(bench), Seq("sg"), "left")
      .groupBy(col("id"))
      .agg(first(col("n_shingles")).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("overlap"))
      .withColumn("frac",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("overlap").cast("double") / col("n_shingles")))
  }

  /** The INVERSE report — per BENCHMARK document, how much of it the
    * training corpus already contains (GPT-3 appendix-C-style overlap
    * analysis; what decides whether an eval item is burned): for each
    * benchmark row, its distinct n-gram count, how many of those appear
    * anywhere in the corpus, and the fraction. Benchmark items shorter
    * than n words report 0/0 with frac 0.0 rather than vanishing.
    *
    * Scale shape: the benchmark's distinct shingle set is SMALL and
    * broadcasts; the corpus makes ONE pass whose join output is capped
    * by the benchmark set size (matched shingles only — never a
    * corpus-sized shuffle), then the tiny matched set joins back to the
    * per-eval-item shingles. */
  def evalContamination(
      corpus: DataFrame, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3): DataFrame = {
    val evalSh = benchmark
      .select(col(benchIdCol).as("eval_id"),
        explode_outer(TextOps.shingles(col(benchTextCol), n)).as("sg"))
    val evalSet = evalSh.filter(col("sg").isNotNull)
      .select("sg").distinct()
    val matched = corpus
      .select(explode(TextOps.shingles(col(textCol), n)).as("sg"))
      .join(broadcast(evalSet), Seq("sg"))
      .distinct()
      .withColumn("__hit", lit(1L))
    evalSh.join(broadcast(matched), Seq("sg"), "left")
      .groupBy(col("eval_id"))
      .agg(count(col("sg")).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("frac",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_contaminated").cast("double")
            / col("n_shingles")))
  }

  /** Corpus rows whose benchmark overlap stays below `maxOverlap` distinct
    * n-grams — the kept (clean) training set. */
  def cleanExact(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3, maxOverlap: Long = 1L): DataFrame = {
    val contaminated = overlapExact(corpus, idCol, textCol, benchmark, benchTextCol, n)
      .filter(col("overlap") >= maxOverlap)
      .select(col("id"))
    corpus.join(contaminated, corpus(idCol) === contaminated("id"), "left_anti")
  }

  /** Benchmark-overlap COUNT as a pure `Column` over `textCol`, probing a
    * Bloom filter of the benchmark's shingle hashes — a stateless map-side
    * expression, so it composes into BATCH and STREAMING plans alike
    * (`stream.filter(overlapBloomColumn(...) < k)` decontaminates a live
    * ingest feed with zero state). The filter is built eagerly from
    * `benchmark` (a batch DataFrame) when this is called. */
  def overlapBloomColumn(
      spark: SparkSession,
      benchmark: DataFrame, benchTextCol: String, textCol: String,
      n: Int = 3, expectedItems: Long = 0L, fpp: Double = 0.001): Column = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val benchSh = benchmark
      .select(explode(TextOps.shingles(col(benchTextCol), n)).as("sg"))
      .select(xxhash64(col("sg")).as("__h"))
    val items = if (expectedItems > 0) expectedItems else benchSh.distinct().count()
    val bloom = benchSh.stat.bloomFilter("__h", math.max(items, 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // keyed by filter content: re-building the probe for the same benchmark
    // REUSES its registry entry instead of leaking one per call (a daily
    // benchmark refresh in a long-lived session stays bounded by distinct
    // filters, not call count)
    val fname = "graft_decon_bloom_" +
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .take(8).map("%02x".format(_)).mkString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => graft.functions.BloomContainsLong(exprs.head, bytes),
      "built-in")
    size(filter(TextOps.shingles(col(textCol), n),
      s => call_function(fname, xxhash64(s)))).cast("long")
  }

  /** [[overlapExact]]'s shape with the benchmark set as a Bloom filter:
    * same output columns, zero shuffles, `overlap` may over-count by ~fpp
    * of each doc's clean shingles (never under-counts).
    *
    * `expectedItems` sizes the filter (pass the known benchmark shingle
    * cardinality at scale; <= 0 runs a count job first — fine for MB-scale
    * benchmark sets). */
  def overlapBloom(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3,
      expectedItems: Long = 0L, fpp: Double = 0.001): DataFrame = {
    val ov = overlapBloomColumn(corpus.sparkSession, benchmark, benchTextCol,
      textCol, n, expectedItems, fpp)
    corpus
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"),
        ov.as("overlap"))
      .select(col("id"), size(col("sh")).as("n_shingles"), col("overlap"))
      .withColumn("frac",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("overlap").cast("double") / col("n_shingles")))
  }

  /** Zero-shuffle clean-set filter via [[overlapBloom]]. Contract: every
    * doc [[cleanExact]] would flag is flagged here too (no contaminated doc
    * survives); ~fpp-level over-flagging drops a few clean docs. */
  def cleanBloom(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3, maxOverlap: Long = 1L,
      expectedItems: Long = 0L, fpp: Double = 0.001): DataFrame = {
    val flagged = overlapBloom(corpus, idCol, textCol, benchmark, benchTextCol,
      n, expectedItems, fpp)
      .filter(col("overlap") >= maxOverlap)
      .select(col("id"))
    corpus.join(flagged, corpus(idCol) === flagged("id"), "left_anti")
  }

  /** SEMANTIC contamination screen — the embedding-space companion to the
    * n-gram paths above (the SemDeDup/Phi-style decontamination recipe
    * from the public data-curation literature): a paraphrased eval item
    * shares no 3-grams with its source but sits at high cosine, so
    * n-gram decontamination alone leaves paraphrase leakage in the
    * training set. Per corpus document: the max cosine against ANY
    * benchmark embedding and the ≥ `threshold` verdict.
    *
    * Returns (id, max_cos, contaminated). Null corpus vectors report
    * (null, null) — "can't judge" is distinct from "clean". An empty
    * benchmark yields max_cos null / contaminated false for every doc
    * (nothing to leak).
    *
    * Scale shape: eval suites are small by nature, so the benchmark
    * broadcasts (capped loudly at `maxBenchRows`) and the corpus makes
    * ONE narrow pass — per-partition max-aggregation means the shuffle
    * carries corpus-id-sized partials, never the |corpus|×|bench| score
    * grid. A benchmark too large for the cap belongs in [[Ivf]]: index
    * the union and compare within probed cells ([[Dedup.semanticDedup]]'s
    * shape). */
  def semanticOverlap(
      corpus: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      threshold: Double, maxBenchRows: Long = 1000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold in (0,1]: $threshold")
    val bench = benchmark
      .select(col(benchVecCol).cast("array<double>").as("__bv"))
      .filter(col("__bv").isNotNull)
    val nb = bench.count()
    require(nb <= maxBenchRows,
      s"benchmark has $nb embeddings > maxBenchRows=$maxBenchRows — " +
        "use the IVF-bucketed path for giant benchmarks")
    val v = col(vecCol).cast("array<double>")
    val scored = corpus
      .select(col(idCol).as("id"), v.as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(broadcast(bench))
      .groupBy("id")
      .agg(max(Similarity.cosine(col("__v"), col("__bv"))).as("max_cos"))
    corpus
      .select(col(idCol).as("id"), v.isNotNull.as("__has"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), col("max_cos"),
        when(col("__has"),
          coalesce(col("max_cos") >= threshold, lit(false)))
          .as("contaminated"))
  }

  /** Corpus rows that pass the semantic screen: every doc whose max
    * benchmark cosine reaches `threshold` is dropped; docs with null
    * vectors are KEPT (route them through the n-gram paths instead —
    * silently dropping unjudgeable rows would shrink the corpus). */
  def semanticClean(
      corpus: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      threshold: Double, maxBenchRows: Long = 1000000L): DataFrame = {
    val flagged = semanticOverlap(corpus, idCol, vecCol, benchmark,
      benchVecCol, threshold, maxBenchRows)
      .filter(col("contaminated") === true)
      .select(col("id"))
    corpus.join(flagged, corpus(idCol) === flagged("id"), "left_anti")
  }
}
