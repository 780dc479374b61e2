package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for training-data pipelines, each designed
  * around its scale path:
  *
  *  - exact: hash-groupBy on a canonical fingerprint — one shuffle on the
  *    fingerprint key, map-side combinable.
  *  - n-gram Jaccard: exact set similarity via a shingle-postings self-join
  *    — the common-shingle join prunes the O(n²) pair space to pairs that
  *    share ≥1 shingle.
  *  - MinHash+LSH: k minhashes → b bands → bucket join. Only documents
  *    sharing a band bucket are paired, so the candidate set stays near-
  *    linear; estimated similarity then filters. The k hash functions are
  *    affine transforms of one xxhash64, evaluated as array expressions
  *    (codegen'd, no UDFs).
  *  - SimHash: 64-bit signature (custom Catalyst expression) + banded
  *    hamming join.
  *  - embedding cosine: see [[Similarity]]; `embeddingNearDups` wraps it.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact duplicate groups by fingerprint: keeper (min id) + copy count +
    * fingerprint. Use `dropDuplicatesByFingerprint` for the pruned data. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-source duplicate attribution — WHICH sources feed the dedup
    * stage its losses (the curation dashboard next to the dedup itself;
    * a source with a high duplicate rate is a scraping or syndication
    * problem upstream, not a corpus property): per source, total docs,
    * docs surviving exact dedup under the global min-id canonical rule,
    * dropped docs, and the drop rate. Note the attribution is
    * CROSS-SOURCE honest: a doc duplicated from another source's
    * canonical counts against the source that re-published it. Two
    * hash aggregations (fp-level, then source-level) — fp-table-sized
    * shuffles. Rate rounds to 9. */
  def dupAttribution(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val fp = df.select(col(idCol).as("__id"), col(sourceCol).as("source"),
      TextOps.fingerprint(col(textCol)).as("__fp"))
    val canon = fp.groupBy("__fp").agg(min(col("__id")).as("__keep"))
    fp.join(canon, Seq("__fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__id") === col("__keep"), 1L).otherwise(0L))
          .as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        round((col("n_docs") - col("n_kept"))
          / col("n_docs").cast("double"), 9).as("drop_rate"))
  }

  /** Daily novelty rate — what fraction of each day's documents the
    * corpus had never seen before (by exact fingerprint): the
    * growth-observability metric that separates a healthy expanding
    * crawl (high novelty) from one re-fetching itself (collapsing
    * novelty). A fingerprint is "new" on its FIRST day (min day over
    * occurrences; re-publications later that same day still count as
    * that day's novelty — first-day mass, the natural grain). Two hash
    * aggregations; fp-table-sized shuffles. */
  def noveltyByDay(df: DataFrame, textCol: String,
      dayCol: Column): DataFrame = {
    val fp = df.select(dayCol.cast("long").as("day"),
      TextOps.fingerprint(col(textCol)).as("__fp"))
    val firstDay = fp.groupBy("__fp").agg(min(col("day")).as("__first"))
    fp.join(firstDay, Seq("__fp"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("day") === col("__first"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("day"), col("n_docs"), col("n_novel"),
        round(col("n_novel") / col("n_docs").cast("double"), 9)
          .as("novelty_rate"))
  }

  /** Cross-corpus PARAGRAPH dedup (the CCNet shape): each document's
    * paragraph array dedups against the WHOLE corpus — only the first
    * occurrence of a normalized paragraph survives (corpus order =
    * (id, paragraph index)), and documents reassemble from their
    * surviving paragraphs (a document whose every paragraph already
    * appeared elsewhere disappears — that's the boilerplate case).
    *
    * `paragraphs` is any in-order array<string> Column — split on blank
    * lines for real prose, [[TextOps.chunks]] for unstructured text.
    *
    * Scale shape: paragraphs explode map-side; the first-occurrence
    * decision is ONE row_number window on the paragraph fingerprint (the
    * same min-keeper rule as [[exactGroups]]), and Catalyst lowers the
    * rn==1 filter to a PARTIAL WindowGroupLimit BEFORE the exchange
    * (plan-audited) — each map task forwards at most one paragraph per
    * fingerprint, so heavy boilerplate never floods the shuffle;
    * reassembly is one groupBy on the document id with an in-row sort of
    * that document's own surviving paragraphs. */
  def dedupParagraphs(
      df: DataFrame, idCol: String, textCol: String,
      paragraphs: Column, joinSep: String = "\n"): DataFrame = {
    val p = df
      .select(col(idCol).as("id"), posexplode(paragraphs))
      .select(col("id"), col("pos").as("idx"), col("col").as("para"))
      .withColumn("fp", TextOps.fingerprint(col("para")))
    val firstSeen = Window.partitionBy(col("fp"))
      .orderBy(col("id"), col("idx"))
    p.withColumn("__rn", row_number().over(firstSeen))
      .filter(col("__rn") === 1)
      .groupBy(col("id").as(idCol))
      .agg(
        concat_ws(joinSep,
          transform(array_sort(collect_list(struct(col("idx"), col("para")))),
            s => s.getField("para"))).as(textCol),
        count(lit(1)).as("n_paragraphs_kept"))
  }

  /** The dataset with only the first (min-id) row of each duplicate group. */
  def dropDuplicatesByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Rows of `incoming` whose content fingerprint does NOT appear in
    * `history` — the exact incremental-dedup baseline (left_anti on the
    * fingerprint; shuffles both sides on the fingerprint key). Oracle-
    * checkable; [[novelAgainstBloom]] is the shuffle-free scale path. */
  def novelAgainstExact(incoming: DataFrame, history: DataFrame,
      textCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    incoming.join(history.select(fp.as("__hfp")).distinct(),
      fp === col("__hfp"), "left_anti")
  }

  /** Rows of `incoming` whose content fingerprint is (probably) new vs
    * `history`, via a Bloom filter of the history's 64-bit fingerprints.
    *
    * Shape: history collapses to a byte-array sketch on the driver
    * (`stat.bloomFilter` treeAggregates partial filters — one pass, no
    * shuffle), incoming is filtered map-side by a codegen'd probe
    * ([[graft.functions.BloomContainsLong]]) — ZERO shuffles total, and
    * the incoming side never moves. That is the shape incremental crawl
    * dedup needs at 100 TB: the history is petabytes but its sketch is
    * `-1.44·n·log2(fpp)` bits (1B docs @ 1% fpp ≈ 1.2 GB — broadcast-
    * sized; beyond that, shard history by fingerprint range and AND the
    * per-shard verdicts, or fall back to [[novelAgainstExact]]).
    *
    * Error contract (direction matters for training data): NO false
    * negatives — every true duplicate is dropped; ~`fpp` of genuinely
    * novel rows are falsely dropped. Losing ~1% of novel docs is
    * acceptable; keeping duplicates would not be.
    *
    * `expectedItems` sizes the filter; pass the known history cardinality
    * at scale. `expectedItems <= 0` triggers a count job first (fine
    * interactively, an extra pass at scale). */
  def novelAgainstBloom(incoming: DataFrame, history: DataFrame,
      textCol: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val n = if (expectedItems > 0) expectedItems else history.count()
    val bloom = history
      .select(TextOps.fingerprint64(col(textCol)).as("__fp64"))
      .stat.bloomFilter("__fp64", math.max(n, 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val spark = incoming.sparkSession
    val fname = s"graft_bloom_${bloomSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => graft.functions.BloomContainsLong(exprs.head, bytes),
      "built-in")
    incoming.filter(
      !call_function(fname, TextOps.fingerprint64(col(textCol))))
  }

  private val bloomSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** End-to-end near-dup corpus deduplication: [[minhashLshPairs]]
    * candidate+confirm → [[Clusters.assignClusters]] connected components →
    * keep ONE canonical row per cluster (the min id — deterministic; to
    * prefer e.g. the highest-quality doc instead, renumber ids by that
    * ordering upstream). Returns the kept rows with `cluster_id` (== their
    * id) and `n_cluster` (how many documents the keeper represents —
    * singleton rows carry 1).
    *
    * Scale shape: pairs and clusters are id-only; the full-width document
    * rows are touched exactly twice (once for signatures, once for the
    * final keep-join), so document payload never rides a shuffle it
    * doesn't need. */
  def deduplicateCorpus(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, k: Int = 144, bands: Int = 48,
      threshold: Double = 0.5, seed: Long = 42,
      maxBucketSize: Int = 100): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold,
      seed, maxBucketSize)
    val assigned = Clusters.assignClusters(df.select(col(idCol)), idCol,
      pairs, a = "id1", b = "id2")
    val sizes = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cluster"))
    df.join(
        assigned.filter(col("id") === col("cluster_id"))
          .join(sizes, "cluster_id")
          .select(col("id").as(idCol), col("cluster_id"), col("n_cluster")),
        idCol)
  }

  /** [[deduplicateCorpus]] with quality-aware keeper selection: within each
    * near-dup cluster, keep the row with the HIGHEST `scoreCol` (ties →
    * lowest id, so the choice is deterministic). Scores ride the id-only
    * cluster shuffle as one extra column; payload rows are still touched
    * exactly twice. `scoreCol` is typically
    * [[TextOps.qualityScore]]-derived. */
  def deduplicateCorpusBy(
      df: DataFrame, idCol: String, textCol: String, scoreCol: String,
      n: Int = 2, k: Int = 144, bands: Int = 48,
      threshold: Double = 0.5, seed: Long = 42,
      maxBucketSize: Int = 100): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold,
      seed, maxBucketSize)
    val assigned = Clusters.assignClusters(df.select(col(idCol)), idCol,
      pairs, a = "id1", b = "id2")
    val keepers = assigned
      .join(df.select(col(idCol).as("id"),
        col(scoreCol).cast("double").as("__score")), "id")
      .groupBy(col("cluster_id"))
      .agg(
        // struct compare is lexicographic: best score wins, then (via the
        // negated id) the smallest id among equal scores
        max_by(col("id"), struct(col("__score"), -col("id"))).as("keep_id"),
        count(lit(1)).as("n_cluster"))
    df.join(
      keepers.select(col("keep_id").as(idCol), col("cluster_id"),
        col("n_cluster")),
      idCol)
  }

  /** EXACT Jaccard self-join via prefix filtering (Chaudhuri et al. 2006;
    * Xiao et al., PPJoin, 2008 — public): the same result set as
    * [[ngramJaccardPairs]], but each document enters the candidate
    * self-join only through its `|r| − ⌈t·|r|⌉ + 1` GLOBALLY RAREST
    * shingles (one total order — ascending document frequency, shingle
    * tie-break — shared by every document). If J(r,s) ≥ t, the smallest
    * shared shingle provably sits inside BOTH prefixes (fewer than
    * |r| − ⌈t·|r|⌉ + 1 non-shared shingles can precede it), so pruning
    * loses nothing: this is the exact algorithm, not an approximation —
    * the structural difference from MinHash-LSH, whose recall is
    * probabilistic. Stop-shingles (huge posting lists) only generate
    * candidates when they are some document's rarest-prefix tokens,
    * which at a high threshold removes the O(df²) cliff the naive join's
    * `maxPostings` cap exists to dodge — WITHOUT giving up exactness.
    *
    * Shape: one (id)-partitioned window pass ranks shingles by global
    * rarity (the frequency table joins in by shingle); the prefix
    * self-join ships only (id, shingle) pairs; verification joins the
    * candidate ids back to their full shingle arrays and intersects
    * in-row. At 100 TB verification can swap the array carry for a
    * postings-count join; the candidate math is unchanged. */
  def prefixJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, threshold: Double = 0.3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("sg"))
    val dfreq = sh.groupBy(col("sg")).agg(count(lit(1)).as("__df"))
    val byId = Window.partitionBy("id")
    val ranked = sh.join(dfreq, Seq("sg"))
      .withColumn("__pos",
        row_number().over(byId.orderBy(col("__df"), col("sg"))))
      .withColumn("__n", count(lit(1)).over(byId))
    val prefix = ranked
      .filter(col("__pos") <=
        col("__n") - ceil(lit(threshold) * col("__n")) + 1)
      .select("id", "sg")
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sg") === col("b.sg") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val sets = df.select(col(idCol).as("id"),
      TextOps.shingles(col(textCol), n).as("set"))
    cands
      .join(sets.select(col("id").as("id1"), col("set").as("s1")), "id1")
      .join(sets.select(col("id").as("id2"), col("set").as("s2")), "id2")
      .withColumn("n1", size(col("s1")))
      .withColumn("n2", size(col("s2")))
      .withColumn("intersection", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("n1") + col("n2") - col("intersection")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "n1", "n2", "intersection", "jaccard")
  }

  /** Word-n-gram Jaccard pairs with similarity ≥ `threshold`.
    * Returns (id1, id2, n1, n2, intersection, jaccard).
    *
    * `maxPostings` (OPT-IN; default = no cap, exact result) drops
    * stop-shingles (posting lists longer than the cap) before the self-join
    * — one ubiquitous bigram otherwise contributes O(df²) candidate pairs,
    * a quadratic blow-up on natural corpora, so large-corpus callers should
    * set it (~1000). Set sizes (n1/n2) are computed BEFORE the cap so
    * jaccard denominators stay exact; intersections through dropped
    * shingles can undercount, so a capped run is a recall-documented
    * approximation (spec asserts recall on a stop-shingled corpus). The
    * default stays exact so the operator silently matches its SQL
    * definition at any scale. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, threshold: Double = 0.3,
      maxPostings: Int = Int.MaxValue): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextOps.shingles(col(textCol), n)).as("sg"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val postings0 = sh.groupBy(col("sg")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxPostings && col("__df") > 1)
    // Uncapped runs get a runtime signal for the quadratic cliff: observe the
    // max posting-list df (CollectMetrics — no extra job) and warn once the
    // caller's action completes. Large-corpus callers should set maxPostings.
    val postings =
      if (maxPostings != Int.MaxValue) postings0
      else PlanWarnings.observe(postings0, "ngram_postings",
          Seq(max(col("__df")).as("max_df"))) { row =>
        val maxDf = Option(row.getAs[Any]("max_df"))
          .fold(0L)(v => v.asInstanceOf[Number].longValue())
        if (maxDf > 1000)
          log.warn(
            s"ngramJaccardPairs running uncapped with a posting list of df=$maxDf " +
              s"(> 1000): the common-shingle self-join generates O(df²) candidate " +
              s"pairs per stop-shingle. Set maxPostings (~1000) on large corpora.")
        // Stay armed until the warning actually fires: a partial action
        // (take/isEmpty) can see an unalarming max_df that a full run exceeds.
        maxDf > 1000
      }
    val pruned = sh.join(postings, Seq("sg")).drop("__df")
    val a = pruned.as("a"); val b = pruned.as("b")
    val inter = a.join(b, col("a.sg") === col("b.sg") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("intersection"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n_shingles", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n_shingles", "n2"), "id2")
      .withColumn("jaccard",
        col("intersection").cast("double") / (col("n1") + col("n2") - col("intersection")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "n1", "n2", "intersection", "jaccard")
  }

  /** Asymmetric-containment pairs — the QUOTE/SUBSET duplicate detector
    * a symmetric Jaccard threshold structurally misses: a tweet quoted
    * inside an article shares nearly all of ITS shingles
    * (containment ≈ 1) while the pair's Jaccard stays tiny (the
    * article's size dominates the union). Keeps pairs where
    * max(|A∩B|/|A|, |A∩B|/|B|) ≥ `threshold`; returns
    * (id1, id2, n1, n2, intersection, containment_1in2,
    * containment_2in1, jaccard) — both directions plus the Jaccard so
    * the caller can tell mutual near-dups from one-way quotation.
    *
    * Same postings shape (and the same `maxPostings` scale contract /
    * uncapped-df warning) as [[ngramJaccardPairs]] — shuffles ids, not
    * text. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, threshold: Double = 0.8,
      maxPostings: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val all = ngramJaccardPairs(df, idCol, textCol, n,
      threshold = Double.MinPositiveValue, maxPostings = maxPostings)
    all
      .withColumn("containment_1in2",
        col("intersection").cast("double") / col("n1"))
      .withColumn("containment_2in1",
        col("intersection").cast("double") / col("n2"))
      .filter(greatest(col("containment_1in2"),
        col("containment_2in1")) >= threshold)
      .select("id1", "id2", "n1", "n2", "intersection",
        "containment_1in2", "containment_2in1", "jaccard")
  }

  /** MinHash signatures: (id, sig array<long>[k]) from word-n-gram
    * shingles, via the native [[graft.functions.MinHash64]] expression —
    * one codegen'd pass over the shingle array computes all k minima.
    * (The compositional `array(array_min(transform(...)) × k)` form makes
    * Catalyst inline the shingle pipeline k times with no codegen: 94 ms/row
    * vs sub-µs here.) */
  def minhashSignatures(
      df0: DataFrame, idCol: String, textCol: String,
      n: Int = 2, k: Int = 64, seed: Long = 42): DataFrame = {
    // k hash passes per shingle are the heaviest narrow map in the dedup
    // family — widen a compact input so they parallelize (no-op on real
    // multi-split corpora; graft.core.Parallelism)
    val df = graft.core.Parallelism.widen(
      df0.select(col(idCol), col(textCol)))
    val spark = df.sparkSession
    val fname = s"graft_minhash64_${k}_$seed"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.MinHash64(exprs.head, k, seed), "built-in")
    val sigged = df.select(col(idCol).as("id"),
      TextOps.shingles(col(textCol), n).as("__sh"))
      .select(col("id"), call_function(fname, col("__sh")).as("sig"),
        size(col("__sh")).as("__nsh"))
    // empty shingle sets (blank/short docs) have no signature
    sigged.filter(col("__nsh") > 0).select("id", "sig")
  }

  /** MinHash+LSH candidate pairs with estimated Jaccard ≥ `threshold`.
    * bands·rows must equal k; pairs sharing ≥1 band bucket are candidates.
    * Returns (id1, id2, est_jaccard).
    *
    * Banding default is r=3 rows/band × 48 bands (k=144): the collision
    * s-curve midpoint sits at j = (1/b)^(1/r) ≈ 0.28, giving ≥0.96 recall
    * at j = 0.4 while keeping sub-threshold noise collisions ~20× lower
    * than r=2 (whose midpoint 0.15 makes every mildly-similar pair a
    * candidate — measured 347k candidates vs ~18k on the sf0.1 corpus for
    * the same 256 result pairs). Candidate count, not signature width, is
    * what explodes at 100 TB.
    *
    * `maxBucketSize` drops non-discriminative mega-buckets (classic LSH
    * noise control): a bucket shared by hundreds of documents carries no
    * near-dup signal but dominates the candidate pair count — on corpora
    * with high baseline similarity it is the difference between O(n) and
    * O(n²) candidates. True near-dup pairs still share a *small* bucket in
    * some band w.h.p. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, k: Int = 144, bands: Int = 48,
      threshold: Double = 0.5, seed: Long = 42,
      maxBucketSize: Int = 100): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, n, k, seed).cache()
    val bandCols = (0 until bands).map(bnd =>
      xxhash64(concat_ws("_", slice(col("sig"), bnd * r + 1, r))))
    val banded0 = sigs.select(col("id"), posexplode(array(bandCols: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // ONE groupBy materializes each bucket's member list; the size filter is
    // the mega-bucket cap (≤ maxBucketSize, classic LSH noise control) AND
    // the singleton drop, and pairs are expanded map-side from the sorted
    // in-bucket array — no bucket-size join, no self-join shuffle. The ids
    // array is projected to an attribute FIRST so the pair-expansion lambdas
    // don't re-evaluate sort_array per element.
    val buckets = banded0.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids0"))
      .filter(size(col("ids0")).between(2, maxBucketSize))
      .select(sort_array(col("ids0")).as("ids"))
    // Pair up bare ids and dedup BEFORE attaching signatures — the k-long
    // signature arrays would otherwise ride through the candidate shuffle
    // (k× the bytes for nothing).
    val candidates = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("id1"), y.as("id2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .dropDuplicates("id1", "id2")
    candidates
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select("id1", "id2", "est_jaccard")
  }

  /** Near-duplicate NOVELTY: rows of `incoming` with no MinHash near-dup
    * (est. Jaccard ≥ `threshold`) in `history` — the fuzzy third member
    * of the novelty family ([[novelAgainstExact]] exact,
    * [[novelAgainstBloom]] probabilistic-exact, this one NEAR-dup aware:
    * a lightly reworded copy of yesterday's document is not novel).
    *
    * Same banded-LSH shape as [[minhashLshPairs]], but the bucket join is
    * incoming × history instead of a self-join: history's banded bucket
    * table is the persistable index (at 100 TB, write it once per corpus
    * version bucketed by (band, bucket) and each day's incoming batch
    * joins against it), candidates carry bare ids, and signatures attach
    * only for the estimate. History mega-buckets above `maxBucketSize`
    * are dropped with the same contract as pair mining: a missed match
    * errs toward calling a document novel (keeping it), never toward
    * dropping a genuinely new one. Incoming docs with no shingles (blank
    * text) have no signature and are reported novel. */
  def novelAgainstMinhash(incoming: DataFrame, history: DataFrame,
      idCol: String, textCol: String, n: Int = 2, k: Int = 144,
      bands: Int = 48, threshold: Double = 0.5, seed: Long = 42,
      maxBucketSize: Int = 100): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def bandCols = (0 until bands).map(bnd =>
      xxhash64(concat_ws("_", slice(col("sig"), bnd * r + 1, r))))
    val inSigs = minhashSignatures(incoming, idCol, textCol, n, k, seed)
    val histSigs = minhashSignatures(history, idCol, textCol, n, k, seed)
    val inBands = inSigs.select(col("id"), posexplode(array(bandCols: _*)))
      .select(col("id").as("in_id"), col("pos").as("band"),
        col("col").as("bucket"))
    val histBuckets = histSigs
      .select(col("id"), posexplode(array(bandCols: _*)))
      .select(col("id").as("hist_id"), col("pos").as("band"),
        col("col").as("bucket"))
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("hist_id")).as("hist_ids"))
      .filter(size(col("hist_ids")) <= maxBucketSize)
    val candidates = inBands
      .join(histBuckets, Seq("band", "bucket"))
      .select(col("in_id"), explode(col("hist_ids")).as("hist_id"))
      .dropDuplicates("in_id", "hist_id")
    val matched = candidates
      .join(inSigs.select(col("id").as("in_id"), col("sig").as("sig1")), "in_id")
      .join(histSigs.select(col("id").as("hist_id"), col("sig").as("sig2")),
        "hist_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          b => b)).cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("in_id").as(idCol)).distinct()
    incoming.join(matched, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: signature via the custom Catalyst expression,
    * banded on 16-bit chunks (a pair within hamming distance d < chunks must
    * agree on ≥1 chunk), exact hamming filter with built-in bit_count.
    *
    * Candidate generation is ONE groupBy(chunk, piece) with map-side pair
    * expansion from each bucket's member array — same shape as
    * [[minhashLshPairs]], no self-join shuffle. `maxBucketSize` drops
    * mega-buckets: on skewed corpora (many empty/near-constant documents
    * sharing a chunk value) an uncapped bucket is O(bucket²) pairs — the one
    * remaining quadratic cliff this operator had. Signatures are 8 bytes so
    * members carry (id, sig) through the shuffle, saving the two re-attach
    * joins the minhash path needs for its k-long arrays.
    *
    * CAVEAT — the cap is lossy on mass-duplicate groups: a duplicate group
    * larger than `maxBucketSize` agrees on ALL four chunks, so every bucket
    * it occupies trips the cap and the group yields zero pairs. Run
    * [[exactGroups]]/[[dropDuplicatesByFingerprint]] first (exact duplicates
    * don't need a similarity join), raise the cap, or pass
    * `maxBucketSize = Int.MaxValue` for the exact banded join. A runtime
    * warning (observed metric, no extra job) fires whenever buckets are
    * dropped so the loss is never silent. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val sig = GraftFunctions.simhash64(spark, TextOps.tokens(col(textCol)))
    val sigs = df.select(col(idCol).as("id"), sig.as("sig"))
    hammingPairs64(sigs, maxHamming, maxBucketSize, warnTag = "simhash_buckets")
  }

  /** Banded hamming-distance self-join over ANY 64-bit signature column —
    * the shared engine under [[simhashPairs]] (text) and
    * [[Multimodal.phashPairs]] (image dHash). Input: columns `id`, `sig`.
    * Output: (id1, id2, hamming ≤ maxHamming), id1 < id2.
    *
    * The 64 bits split into `maxHamming + 1` near-equal bands (pigeonhole:
    * a pair within the hamming bound must agree EXACTLY on ≥1 band);
    * candidate generation is ONE groupBy(band, piece) with map-side pair
    * expansion from each bucket's member array — no self-join shuffle, and
    * signatures are 8 bytes so members carry (id, sig) through the shuffle
    * (no re-attach joins). `maxBucketSize` drops mega-buckets (near-
    * constant signatures sharing a band value are O(bucket²) pairs — the
    * one quadratic cliff); the same lossy-cap caveat as the minhash path
    * applies: run exact dedup first, and a runtime observed-metric warning
    * fires whenever buckets are dropped so the loss is never silent. */
  /** The `maxHamming + 1` near-equal bit bands of a 64-bit signature
    * column (pigeonhole: a pair within the hamming bound agrees exactly on
    * ≥1 band). Shared by [[hammingPairs64]] and the streaming twin
    * ([[graft.streaming.NearDedup.phashDupEdgesStream]]) so both bucket
    * identically. */
  private[graft] def hammingBandCols(sig: Column, maxHamming: Int): Seq[Column] = {
    require(maxHamming >= 0 && maxHamming < 64, "need 0 <= maxHamming < 64")
    val bands = maxHamming + 1
    val base = 64 / bands
    val rem = 64 % bands
    (0 until bands).map { i =>
      val width = if (i < rem) base + 1 else base
      val offset = i * base + math.min(i, rem)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftright(sig, offset).bitwiseAND(lit(mask))
    }
  }

  def hammingPairs64(
      sigs: DataFrame, maxHamming: Int, maxBucketSize: Int = 4096,
      warnTag: String = "hamming_buckets"): DataFrame = {
    val bandCols = hammingBandCols(col("sig"), maxHamming)
    val banded = sigs.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .select(col("id"), col("sig"), col("pos").as("chunk"), col("col").as("piece"))
    val grouped0 = banded.groupBy(col("chunk"), col("piece"))
      .agg(collect_list(struct(col("id"), col("sig"))).as("ms0"))
    // Dropped-bucket visibility: count the buckets the cap discards and the
    // largest one. A duplicate GROUP of more than maxBucketSize identical
    // signatures trips the cap in EVERY band at once and silently loses its
    // pairs — exactly the case the warning names.
    val grouped =
      if (maxBucketSize == Int.MaxValue) grouped0
      else PlanWarnings.observe(grouped0, warnTag,
          Seq(sum(when(size(col("ms0")) > maxBucketSize, 1).otherwise(0)).as("dropped"),
            max(size(col("ms0"))).as("max_bucket"))) { row =>
        val dropped = Option(row.getAs[Any]("dropped"))
          .fold(0L)(v => v.asInstanceOf[Number].longValue())
        if (dropped > 0) {
          val maxB = Option(row.getAs[Any]("max_bucket"))
            .fold(0L)(v => v.asInstanceOf[Number].longValue())
          log.warn(
            s"hammingPairs64[$warnTag] dropped $dropped (band, piece) buckets larger than " +
              s"maxBucketSize=$maxBucketSize (largest: $maxB). Duplicate groups " +
              s"beyond the cap yield NO pairs — run exactGroups/" +
              s"dropDuplicatesByFingerprint first, raise maxBucketSize, or pass " +
              s"Int.MaxValue for the exact banded join.")
        }
        dropped > 0 // fired -> unregister; else stay armed past partial actions
      }
    val buckets = grouped
      .filter(size(col("ms0")).between(2, maxBucketSize))
      .select(array_sort(col("ms0")).as("ms")) // struct sort = by id first
    buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))), y =>
          struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
            x.getField("sig").as("sig1"), y.getField("sig").as("sig2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.sig1"), col("p.sig2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Embedding-cosine near-duplicate pairs (see [[Similarity.cosine]]):
    * exact all-pairs join below `maxBruteRows`, hyperplane-LSH bucketed
    * above — the O(n²) join is only ever the small-corpus path, never the
    * default at scale. Pass `lsh = Some(...)` to force either path; when
    * unset the choice reads Catalyst's row-count estimate (one `count()`
    * fallback only when stats are absent — prefer the explicit hint).
    *
    * The LSH path is an OR-construction: `tables` independent hyperplane
    * signatures (one vector pass, see
    * [[Similarity.hyperplaneBucketTables]]), a pair is a candidate when ANY
    * table's buckets match, then exact cosine verifies. Bits per table are
    * tuned from the threshold so collision probability at cos == threshold
    * reaches `recallTarget`: p = 1-acos(t)/π, bits = ⌊log(1-(1-R)^{1/L}) /
    * log p⌋ — a loose threshold gets few wide tables, a 0.95 near-dup
    * threshold gets ~13-bit tables whose buckets stay tiny. When the
    * corpus-size floor widens tables past that tuned width, the table count
    * is re-tuned upward (t ≥ log(1-R)/log(1-p^bits), capped at 64 with a
    * runtime warning via [[PlanWarnings]]) so `recallTarget` still holds —
    * wider tables alone would silently cut recall. Candidates are
    * id-only through the shuffle (vectors re-attached after dedup), and
    * mega-buckets (> `maxBucketSize`) are dropped as carrying no near-dup
    * signal — both mirroring [[minhashLshPairs]]. Output is always a subset
    * of the brute-force pairs at the same threshold. */
  /** Resolved LSH shape for [[embeddingNearDups]]: signature width, OR-table
    * count, whether the table count hit its cap short of `recallTarget`, and
    * the recall the construction actually achieves for pairs AT the
    * threshold (pairs above it collide more often). */
  private[graft] final case class LshTuning(
      bits: Int, tables: Int, capped: Boolean, achievableRecall: Double)

  /** Tune (bits, tables) for hyperplane LSH so that expected recall at
    * `cos == threshold` meets `recallTarget`.
    *
    * Bits per table come from the OR-construction identity
    * 1-(1-p^bits)^tables >= R with p = 1-acos(threshold)/π. A corpus-size
    * FLOOR then widens tables so the expected bucket n/2^bits stays under
    * `maxBucketSize` — without it every bucket trips the mega-bucket cap and
    * the operator returns ~zero pairs. Widening COSTS recall (each table's
    * true-pair collision probability is p^bits), so whenever the floor wins
    * the table count is re-tuned upward to the smallest t restoring the
    * contract, capped at `maxTables`; past the cap `capped = true` and the
    * caller warns at run time instead of silently under-delivering. */
  private[graft] def tuneEmbeddingLsh(
      nEst: Long, threshold: Double, tables: Int, recallTarget: Double,
      maxBucketSize: Int, maxTables: Int = 64): LshTuning = {
    val p = 1.0 - math.acos(math.min(threshold, 0.999)) / math.Pi
    val tunedBits =
      (math.log(1.0 - math.pow(1.0 - recallTarget, 1.0 / tables)) / math.log(p)).toInt
    val floorBits =
      if (nEst > maxBucketSize)
        math.ceil(math.log(nEst.toDouble / maxBucketSize) / math.log(2.0)).toInt
      else 1
    val bits = math.max(1, math.min(24, math.max(tunedBits, floorBits)))
    val pBits = math.pow(p, bits)
    val neededTables =
      if (pBits >= 1.0) 1L
      else math.ceil(math.log(1.0 - recallTarget) / math.log(1.0 - pBits)).toLong
    val effTables = math.max(tables.toLong, math.min(maxTables.toLong, neededTables)).toInt
    val achievable = 1.0 - math.pow(1.0 - pBits, effTables.toDouble)
    LshTuning(bits, effTables, capped = neededTables > maxTables, achievable)
  }

  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, lsh: Option[Boolean] = None, seed: Long = 42,
      maxBruteRows: Long = 65536, tables: Int = 8, recallTarget: Double = 0.9,
      maxBucketSize: Int = 4096): DataFrame = {
    // Row-count estimate drives both the brute/LSH choice and the bits
    // floor: Catalyst stats first, count() only as fallback (and only when
    // actually needed — an explicit lsh=Some(false) hint never pays it).
    lazy val nEst: Long = df.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong).getOrElse(df.count())
    val useLsh = lsh.getOrElse(nEst > maxBruteRows)
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    if (!useLsh) {
      val a = v.as("a"); val b = v.as("b")
      a.join(b, col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
        .filter(col("cosine") >= threshold)
    } else {
      val t = tuneEmbeddingLsh(nEst, threshold, tables, recallTarget, maxBucketSize)
      val sigged0 = Similarity
        .hyperplaneBucketTables(df, idCol, vecCol, t.bits, t.tables, seed)
      val sigged1 = if (!t.capped) sigged0 else {
        PlanWarnings.observe(sigged0, "emb_lsh_recall",
          Seq(count(lit(1)).as("rows"))) { row =>
          log.warn(
            f"embeddingNearDups: corpus-size floor forced ${t.bits}-bit tables; " +
            f"even ${t.tables} tables (cap) reach ~${t.achievableRecall}%.3f recall < " +
            f"recallTarget=$recallTarget%.2f over ${row.getLong(0)} rows. " +
            "Raise maxBucketSize or lower recallTarget.")
          true // the cap is a plan-time fact; one warning is complete
        }
      }
      val sigged = sigged1
        .select(col("id"), posexplode(col("buckets")))
        .select(col("id"), col("pos").as("table"), col("col").as("bucket"))
      // ONE groupBy(table, bucket): size filter = mega-bucket cap +
      // singleton drop, pairs expanded map-side from the sorted member array
      // (the minhashLshPairs shape) — replaces the bucket-size join + banded
      // self-join, two fewer exchanges. Ids only through the shuffle;
      // vectors re-attach after dedup.
      val buckets = sigged.groupBy(col("table"), col("bucket"))
        .agg(collect_list(col("id")).as("ids0"))
        .filter(size(col("ids0")).between(2, maxBucketSize))
        .select(sort_array(col("ids0")).as("ids"))
      val candidates = buckets
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
            struct(x.as("id1"), y.as("id2")))))).as("p"))
        .select(col("p.id1"), col("p.id2"))
        .dropDuplicates("id1", "id2")
      candidates
        .join(v.select(col("id").as("id1"), col("v").as("v1")), "id1")
        .join(v.select(col("id").as("id2"), col("v").as("v2")), "id2")
        .select(col("id1"), col("id2"),
          Similarity.cosine(col("v1"), col("v2")).as("cosine"))
        .filter(col("cosine") >= threshold)
    }
  }

  /** Semantic deduplication over an embedding column, SemDeDup-style
    * (Abbas et al. 2023, arXiv:2303.09540): a k-means coarse quantizer
    * ([[Ivf.build]], spherical) partitions the corpus into `nLists` cells;
    * cosine comparisons happen ONLY within a cell (the clusters bound the
    * candidate set — O(Σ cell²) instead of O(n²)); pairs at
    * `cosine >= threshold` become edges, connected components resolve
    * transitive duplicate groups, and one canonical row per component is
    * kept (min id — to prefer quality keepers, renumber upstream or adapt
    * [[deduplicateCorpusBy]]). Returns kept rows + `cluster_id`/`n_cluster`
    * exactly like [[deduplicateCorpus]].
    *
    * Approximation contract: duplicates that k-means separates into
    * different cells are NOT detected (the published trade-off — raise
    * `nLists` quality via more iterations, or run [[embeddingNearDups]]
    * for cell-blind recall). The error direction is safe: a missed pair
    * keeps an extra document, never drops a unique one.
    *
    * Scale shape: cells are self-joined on the cell id, so size `nLists`
    * ∝ corpus / targetCellSize to bound the per-cell quadratic work; a
    * `maxCellSize` guard excludes degenerate mega-cells (k-means collapse)
    * from pairing — their documents are all KEPT, and a runtime
    * observed-metric warning ([[PlanWarnings]], zero extra jobs) reports
    * the exclusion so the loss of dedup coverage is never silent. */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nLists: Int = 16, seed: Long = 42,
      maxCellSize: Int = 65536, maxIter: Int = 8,
      fitSampleRows: Long = 0L): DataFrame = {
    // dedup needs STABLE cells, not optimal ones — fewer quantizer
    // iterations than a search-quality IVF index (maxIter 8 vs 20) and
    // seeded random init instead of the multi-pass k-means|| sweep.
    // fitSampleRows > 0 fits the quantizer on Ivf.build's deterministic
    // hash sample — the 100 TB shape (and the gate's: a full-corpus fit
    // is the dump's slowest stage for zero correctness benefit, since the
    // within-cell guarantee holds for whatever cells the quantizer picks).
    val index = Ivf.build(df, idCol, vecCol, nLists, seed, maxIter,
      initMode = "random", fitSampleRows = fitSampleRows)
    // cached: consumed by the size scan and BOTH sides of the cell
    // self-join (same precedent as minhashLshPairs' signature cache)
    val cells = index.assigned.cache()
    val cellSizes0 = cells.groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"))
    val cellSizes = PlanWarnings.observe(cellSizes0, "semantic_cells",
      Seq(sum(when(col("__n") > maxCellSize, 1).otherwise(0)).as("dropped"),
        max(col("__n")).as("max_cell"))) { row =>
      val dropped = Option(row.getAs[Any]("dropped"))
        .fold(0L)(v => v.asInstanceOf[Number].longValue())
      if (dropped > 0) {
        val maxC = Option(row.getAs[Any]("max_cell"))
          .fold(0L)(v => v.asInstanceOf[Number].longValue())
        log.warn(
          s"semanticDedup excluded $dropped cells larger than " +
            s"maxCellSize=$maxCellSize (largest: $maxC) from pairing — their " +
            "documents are all kept undeduplicated. Raise nLists (smaller " +
            "cells) or maxCellSize.")
      }
      dropped > 0
    }
    // vectors are L2-normalized by Ivf.build, so dot == cosine
    val bounded = cells
      .join(broadcast(cellSizes.filter(col("__n") <= maxCellSize)), "cell")
    val a = bounded.select(col("cell"), col("id").as("id1"), col("v").as("v1"))
    val b = bounded.select(col("cell"), col("id").as("id2"), col("v").as("v2"))
    val edges = a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(Similarity.dot(col("v1"), col("v2")) >= threshold)
      .select(col("id1"), col("id2"))
    val assigned = Clusters.assignClusters(df.select(col(idCol)), idCol,
      edges, a = "id1", b = "id2")
    // assignClusters materializes eagerly (driver collect or per-round
    // checkpoints), so the cell cache has served its three consumers —
    // release it instead of pinning vectors for the session lifetime
    cells.unpersist(blocking = false)
    val sizes = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cluster"))
    df.join(
      assigned.filter(col("id") === col("cluster_id"))
        .join(sizes, "cluster_id")
        .select(col("id").as(idCol), col("cluster_id"), col("n_cluster")),
      idCol)
  }

  /** Cross-corpus frequent-span removal — exact-substring deduplication at
    * word granularity (Lee et al. 2022, arXiv:2107.06499, with word
    * n-grams standing in for the suffix-array byte spans; the same span
    * family C4 and RefinedWeb strip as boilerplate). Any word n-gram that
    * occurs in ≥ `minDocFreq` DISTINCT documents is boilerplate; every
    * word covered by at least one such span is removed and each document
    * is reassembled in original word order. Unlike the whole-document
    * dedup ops above, documents survive — only their repeated spans go.
    *
    * Returns the input columns with `textCol` rewritten plus
    * `words_removed` (count of covered words dropped from this document).
    * A document whose every word is covered yields the empty string.
    *
    * Scale shape (no exploded-word shuffle anywhere):
    *  1. n-grams are built INSIDE the row as an array expression
    *     (`transform`/`slice` over the token array — narrow, codegen'd),
    *     then exploded only for the doc-frequency aggregation: one
    *     map-side-combinable shuffle keyed by gram.
    *  2. The surviving frequent set is SMALL by construction (its premise
    *     is "appears in many documents") → broadcast inner join marks
    *     covered start offsets; a corpus where it is NOT small is one
    *     you'd clean with whole-document dedup first.
    *  3. Covered starts are folded back per document (shuffle of id +
    *     small int arrays, not text), and the final rewrite is a narrow
    *     higher-order `filter(words, (w, i) -> no span covers i)` — the
    *     document text itself never shuffles at all.
    */
  def removeFrequentSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocFreq: Int = 2): DataFrame = {
    require(n >= 1, "span width n must be >= 1")
    require(minDocFreq >= 2,
      "minDocFreq must be >= 2 (1 would remove every word of every doc)")
    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    // start offsets are 0-based; slice() is 1-based
    val grams = when(size(col("__words")) >= n,
        transform(sequence(lit(0), size(col("__words")) - n),
          i => concat_ws(" ", slice(col("__words"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val withGrams = df
      .withColumn("__words",
        when(length(trim(coalesce(col(textCol), lit("")))) === 0,
          array().cast("array<string>")).otherwise(words))
      .withColumn("__grams", grams)
    val exploded = withGrams.select(col(idCol),
      posexplode(col("__grams")).as(Seq("__start", "__gram")))
    val frequent = exploded
      .groupBy(col("__gram"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__gram"))
    val coveredStarts = exploded
      .join(broadcast(frequent), "__gram")
      .groupBy(col(idCol))
      .agg(collect_set(col("__start")).as("__starts"))
    val covered = (i: Column) =>
      exists(col("__starts"), s => i >= s && i < s + n)
    withGrams
      .join(coveredStarts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("words_removed",
        size(filter(col("__words"), (_, i) => covered(i))).cast("long"))
      .withColumn(textCol,
        concat_ws(" ", filter(col("__words"), (_, i) => !covered(i))))
      .drop("__words", "__grams", "__starts")
  }

  /** Capture–recapture duplicate-coverage estimate (Chapman 1951,
    * public — the Lincoln–Petersen mark-recapture estimator with the
    * small-sample bias correction): run TWO independent duplicate
    * detectors over the same corpus (e.g. MinHash and SimHash, or two
    * band seeds), treat each detector's flagged-id set as a "capture",
    * and estimate the TOTAL duplicate population from the overlap —
    * N̂ = (n_a+1)(n_b+1)/(m+1) − 1. This is the observability answer to
    * "how many near-dups did we MISS": each detector alone reports what
    * it caught; their overlap calibrates the recall neither can measure
    * about itself. Assumes detector independence (different sketch
    * families / seeds — the documented contract; two band counts of the
    * SAME MinHash are correlated and will overestimate coverage).
    *
    * Scale shape: two distinct-id aggregations + one ids-only join for
    * the overlap; driver state is three scalars. The Wald 95% interval
    * uses Chapman's variance with z = 1.959964 (the zQuantile literal
    * convention); everything else is exact integer arithmetic the
    * oracle replays. Fails loudly on an empty detector or zero overlap
    * (the estimator is undefined — detectors that disjoint are either
    * broken or not independent).
    *
    * Returns one row: (n_a, n_b, n_overlap, est_total, ci_lo, ci_hi),
    * estimate and bounds rounded to 6. */
  def captureRecapture(
      detectorA: DataFrame, detectorB: DataFrame, idCol: String): DataFrame = {
    val spark = detectorA.sparkSession
    import spark.implicits._
    val a = detectorA.select(col(idCol).as("__id"))
      .filter(col("__id").isNotNull).distinct()
    val b = detectorB.select(col(idCol).as("__id"))
      .filter(col("__id").isNotNull).distinct()
    val nA = a.count()
    val nB = b.count()
    val m = a.join(b, "__id").count()
    require(nA > 0 && nB > 0,
      s"both detectors must flag something, got nA=$nA nB=$nB")
    require(m > 0,
      "detectors share NO flagged ids — either one is broken or they " +
        "are not independent captures of the same population")
    val est = (nA + 1.0) * (nB + 1.0) / (m + 1.0) - 1.0
    // Chapman variance: (nA+1)(nB+1)(nA−m)(nB−m) / ((m+1)²(m+2))
    val varEst = (nA + 1.0) * (nB + 1.0) * (nA - m).toDouble * (nB - m) /
      ((m + 1.0) * (m + 1.0) * (m + 2.0))
    val z = graft.stats.Experiment.zQuantile(0.975)
    val se = math.sqrt(varEst)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    Seq((nA, nB, m, r6(est),
        r6(math.max(est - z * se, math.max(nA, nB).toDouble)),
        r6(est + z * se)))
      .toDF("n_a", "n_b", "n_overlap", "est_total", "ci_lo", "ci_hi")
  }
}
