package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, splitting, and mixing — the selection operators
  * a training-data pipeline runs daily over the deduplicated corpus.
  *
  * Everything here keys on an ENGINE-PORTABLE hash: the first 8 hex chars
  * of md5 over the '|'-joined string renders of user-chosen key columns
  * (plus a seed string), scaled to [0,1). Unlike `rand(seed)` — whose
  * values depend on row-to-partition placement and thus change under
  * repartitioning, retries, or AQE — this fraction is a pure function of
  * the row's identity: the same row lands in the same split on every
  * engine, every run, every cluster size. That is what makes a train/test
  * split an auditable artifact instead of a run-time accident (and what
  * lets DuckDB reproduce these operators bit-for-bit in the oracle gate).
  *
  * md5 here is a partitioner, not cryptography; it is builtin, codegen'd,
  * and stateless, so every operator below is a narrow map or a single
  * per-stratum sort — nothing materializes on the driver.
  */
object Sampling {

  /** Deterministic [0,1) fraction of a row's identity. 2^32 buckets: split
    * boundaries are exact doubles, so threshold comparisons agree across
    * engines. */
  def hashFraction(seed: String, keys: Seq[Column]): Column =
    conv(substring(hashHex(seed, keys), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** Full 32-hex-char identity hash (for collision-free orderings). */
  def hashHex(seed: String, keys: Seq[Column]): Column =
    md5(concat_ws("|", (lit(seed) +: keys).map(_.cast("string")): _*)
      .cast("binary"))

  /** Strictly positive deterministic fraction in (0,1): the +0.5 half-step
    * keeps hash value 0 off the ln() singularity (Spark's ln(0) is null,
    * DuckDB's is -inf — a cross-engine divergence [[weightedSample]] must
    * never reach). */
  def hashFractionOpen(seed: String, keys: Seq[Column]): Column =
    (conv(substring(hashHex(seed, keys), 1, 8), 16, 10).cast("long") +
      lit(0.5)) / lit(4294967296.0)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * public): each row draws u = deterministic identity-hash fraction and
    * scores ln(u)/w (the monotone-log form of the classic u^(1/w) key —
    * avoids pow underflow for tiny weights); the k LARGEST keys are the
    * sample, distributionally identical to k sequential weighted draws
    * without replacement. Fully distributed and stateless: one narrow map
    * + one top-k (`TakeOrderedAndProject` — per-partition heads, k rows
    * per partition to the driver, never a full sort), deterministic given
    * `seed` — reproducible corpus sampling that is also oracle-able.
    * Rows with weight ≤ 0 or null are excluded (never drawn).
    *
    * `keys` MUST uniquely identify rows (the same contract every
    * identity-hash op here carries): both the draw u and the tie-break
    * derive solely from `keys`, so duplicate key tuples share one
    * ordering key and the limit(k) boundary between them would be
    * nondeterministic across runs and engines. */
  def weightedSample(df: DataFrame, keys: Seq[String], weightCol: String,
      k: Int, seed: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = hashFractionOpen(seed, keys.map(col))
    df.filter(col(weightCol) > 0)
      .withColumn("__graft_wkey", log(u) / col(weightCol))
      .orderBy(col("__graft_wkey").desc +: keys.map(col): _*)
      .limit(k)
      .drop("__graft_wkey")
  }

  /** Assign each row to a named split by hash fraction: `splits` are
    * (name, fraction) with fractions summing to ≤ 1 (rows beyond the sum
    * get `null` — an explicit holdout). Adds a `split` column; stateless
    * narrow map, no shuffle. */
  def hashSplit(df: DataFrame, keys: Seq[String],
      splits: Seq[(String, Double)], seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    require(splits.forall(_._2 > 0.0),
      // a negative fraction makes the cumulative thresholds non-monotonic
      // and its split (or a neighbor) silently receives zero rows
      "every split fraction must be positive")
    val f = hashFraction(seed, keys.map(col))
    // round the running sums to 12 decimals so 0.8+0.1 thresholds at the
    // double nearest 0.9 — i.e. exactly the literal a SQL mirror of this
    // split would write — not at 0.9000000000000001
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.rint(c * 1e12) / 1e12)
    // CASE WHEN f < c1 THEN n1 WHEN f < c2 THEN n2 ... ELSE null: built
    // from the last branch inward so the FIRST matching threshold wins
    val caseExpr = splits.zip(cum).reverse
      .foldLeft(lit(null).cast("string")) {
        case (els, ((name, _), hi)) => when(f < hi, name).otherwise(els)
      }
    df.withColumn("split", caseExpr)
  }

  /** Dedup-aware [[hashSplit]]: rows connected by duplicate/near-duplicate
    * `pairs` always land in the SAME split, because the split decision
    * hashes the row's duplicate-cluster representative
    * ([[graft.ops.Clusters.assignClusters]] min-id labeling) instead of
    * the row itself. This is the split a training pipeline must use after
    * near-dedup: a plain per-row split lets two near-identical documents
    * straddle train/test, and the eval set silently measures memorization
    * (exactly the leakage [[graft.ops.Decontaminate]] exists to catch
    * after the fact — this prevents it by construction). Rows in no pair
    * are their own cluster, so with empty `pairs` the assignment equals
    * `hashSplit(df, Seq(idCol), splits, seed)` row for row.
    *
    * Scale shape: cluster resolution is the scale-adaptive hash-min
    * resolver (edges-only shuffles), then ONE equi-join of df against the
    * (id, cluster_id) table on the id — the payload moves once. Adds
    * `cluster_id` and `split` columns. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], a: String = "a", b: String = "b",
      seed: String = "graft", maxDriverEdges: Long = 2000000L): DataFrame = {
    require(!df.columns.contains("split") && !df.columns.contains("cluster_id"),
      "df already has a split/cluster_id column")
    val clusters = graft.ops.Clusters.assignClusters(
      df.select(col(idCol)), idCol, pairs, a, b, maxDriverEdges)
    val assigned = hashSplit(clusters, Seq("cluster_id"), splits, seed)
      .withColumnRenamed("id", idCol)
    df.join(assigned, Seq(idCol))
  }

  /** Exactly `k` rows per stratum (fewer iff the stratum is smaller),
    * chosen as the k smallest identity hashes — a deterministic reservoir:
    * stable under reruns, repartitioning, and engine choice, and growing
    * the corpus only swaps individual rows in/out rather than reshuffling
    * the whole sample. One sort-shuffle partitioned by stratum; ties are
    * impossible because the full 128-bit hex plus the key columns order
    * totally. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], k: Int,
      keys: Seq[String], seed: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val ordering = (hashHex(seed, keys.map(col)) +: keys.map(col)).map(_.asc)
    val w = Window.partitionBy(strata.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Assign rows to fixed-budget bins (training batches bounded by a
    * token/char budget): rows are ordered deterministically (identity
    * hash) inside `groups` independent hash groups, and a row's bin is
    * `floor(exclusive-prefix-sum(weight) / budget)` — the standard
    * scalable greedy packing. Adds `pack_group` and `pack_seq`; a bin is
    * identified by the pair. One bounded-width sort per group (no global
    * sort), so packing 100 TB is `groups`-way parallel; bins can overshoot
    * the budget by at most one row's weight (oversize rows get a spanning
    * bin of their own — filter or truncate upstream if that matters). */
  def packByBudget(df: DataFrame, weightCol: String, budget: Long,
      keys: Seq[String], groups: Int = 1024,
      seed: String = "graft"): DataFrame = {
    require(budget > 0 && groups > 0, "budget and groups must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = hashHex(seed, keys.map(col))
    val grp = (conv(substring(h, 1, 8), 16, 10).cast("long") % groups)
      .as("pack_group")
    val w = Window.partitionBy(col("pack_group"))
      .orderBy((h +: keys.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_group", grp)
      .withColumn("pack_seq",
        floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) /
          lit(budget.toDouble)).cast("long"))
  }

  /** Pack BPE-tokenized documents into FIXED-LENGTH training sequences —
    * the step that turns a deduped corpus into model input: documents are
    * assigned to budget bins ([[packByBudget]] over REAL token counts,
    * [[graft.functions.Bpe]]), each bin concatenates its documents' token
    * ids in the bin's deterministic identity-hash order with `eosId`
    * after every document, and the concatenation slices into rows of
    * exactly `seqLen` ids (the final partial row right-pads with
    * `padId`). Default special ids sit just past the vocab
    * (`vocabSize`, `vocabSize + 1`) so they can never collide with
    * content tokens — strip them before [[graft.functions.BpeTokenizer.decode]].
    *
    * Scale shape: token ids are computed map-side (codegen'd expression);
    * the only shuffles are packByBudget's per-group window and one
    * groupBy per bin; a bin's in-memory array is bounded by
    * `binBudget` (+ one document's overshoot), and rows explode back out
    * map-side. Output: (pack_group, pack_seq, seq_index, token_ids,
    * n_real_tokens, doc_ids) — conservation invariant: Σ n_real_tokens =
    * Σ_docs (n_tokens + 1). `doc_ids` is the per-token provenance array
    * (length exactly n_real_tokens — padding has no entry; a document's
    * EOS carries its own id): cross-document attention masks derive from
    * it (mask attention where doc_ids[i] != doc_ids[j]), the detail that
    * separates naive concat-packing from packing a trainer can use
    * without cross-document leakage. */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      tok: graft.functions.BpeTokenizer, seqLen: Int, binBudget: Long,
      groups: Int = 1024, seed: String = "graft",
      eosId: Option[Int] = None, padId: Option[Int] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    val eos = eosId.getOrElse(tok.vocabSize)
    val pad = padId.getOrElse(tok.vocabSize + 1)
    val weighted = docs
      .select(col(idCol),
        graft.functions.Bpe.encodeIds(spark, col(textCol), tok).as("__ids"))
      .withColumn("__n", (size(col("__ids")) + 1).cast("long")) // +1: EOS
    val binned = packByBudget(weighted, "__n", binBudget, Seq(idCol), groups, seed)
      .withColumn("__h", hashHex(seed, Seq(col(idCol))))
    val flat = binned
      .groupBy(col("pack_group"), col("pack_seq"))
      .agg(
        // same (hash, id) order the budget window used — bin content and
        // order are both deterministic
        array_sort(collect_list(struct(col("__h"), col(idCol), col("__ids"))))
          .as("__sorted"))
      .withColumn("__flat", flatten(transform(col("__sorted"),
        s => concat(s.getField("__ids"), array(lit(eos))))))
      // parallel per-token provenance: each token position (incl. the
      // doc's own EOS) carries its source id — the column cross-document
      // attention masking is built from (mask where doc_ids[i] !=
      // doc_ids[j]); padding positions have no entry, so the array length
      // is exactly n_real_tokens
      .withColumn("__flatDoc", flatten(transform(col("__sorted"),
        s => transform(concat(s.getField("__ids"), array(lit(eos))),
          _ => s.getField(idCol)))))
    val nChunks = ceil(size(col("__flat")).cast("double") / seqLen).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), i => {
      val piece = slice(col("__flat"), i * seqLen + 1, lit(seqLen))
      val padded = concat(piece,
        transform(sequence(lit(1), lit(seqLen) - size(piece)), _ => lit(pad)))
      struct(when(size(piece) === seqLen, piece).otherwise(padded).as("ids"),
        size(piece).as("n_real"),
        slice(col("__flatDoc"), i * seqLen + 1, lit(seqLen)).as("docs"))
    })
    flat.select(col("pack_group"), col("pack_seq"), posexplode(chunks))
      .select(col("pack_group"), col("pack_seq"), col("pos").as("seq_index"),
        col("col.ids").as("token_ids"), col("col.n_real").as("n_real_tokens"),
        col("col.docs").as("doc_ids"))
  }

  /** Deterministic global shuffle — training-order randomization as a pure
    * function of row identity: sort by the seeded identity hash (ties
    * broken by the keys, so the order is total). Unlike `orderBy(rand)`,
    * the SAME permutation comes back on every engine, cluster size, rerun,
    * or retry — the training order is an auditable artifact. Changing
    * `seed` yields an independent permutation (fresh epoch order). At
    * scale this is ONE range-partitioned sort — the same cost as any
    * global sort, no single-partition window, no driver materialization;
    * `shuffle_key` stays in the output so downstream stages (or the
    * oracle) can verify the order without recomputing it. */
  def shuffle(df: DataFrame, keys: Seq[String],
      seed: String = "graft"): DataFrame =
    df.withColumn("shuffle_key", hashHex(seed, keys.map(col)))
      .orderBy(col("shuffle_key") +: keys.map(col): _*)

  /** Stride-scheduled domain interleaving (stride scheduling —
    * Waldspurger & Weihl 1995, public; the weighted-fair-queueing
    * virtual-time rule): a deterministic TRAINING ORDER in which domain
    * d's documents appear at cadence ∝ weights(d), instead of the domain
    * runs a plain hash [[shuffle]] leaves in the stream (run-length
    * clumping measurably hurts early training on mixture corpora — the
    * motivation for every data-order "mixing" knob in public recipes).
    *
    * Each domain's rows get a hash-ordered per-domain rank r and a
    * virtual time vt = (r − 0.5)/w_d; ascending vt is the interleaved
    * stream (ties break on domain then keys). Any prefix of the stream
    * then holds ≈ proportional-to-weight counts per domain — the stride
    * invariant. Rows whose domain is missing from `weights` FAIL LOUDLY
    * (a silent default weight would quietly starve or flood a domain).
    *
    * Exactness: with dyadic weights (0.5, 0.25, ...) vt is an exact
    * binary double; any positive weight still orders identically across
    * engines (one IEEE division per row). Scale shape: one per-domain
    * rank window (partitioned) + ONE range-partitioned global sort — no
    * unpartitioned window, no driver state; the emitted vt column lets
    * downstream stages (or the oracle) verify the order without
    * recomputing it. */
  def interleaveByWeight(df: DataFrame, keys: Seq[String],
      domainCol: String, weights: Map[String, Double],
      seed: String = "graft-interleave"): DataFrame = {
    require(weights.nonEmpty, "no domain weights")
    weights.foreach { case (d, w) =>
      require(w > 0.0 && w <= 1.0, s"domain '$d': weight must be in (0,1]: $w")
    }
    import org.apache.spark.sql.expressions.Window
    val d = col(domainCol).cast("string")
    val wKnown = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (dom, w)) =>
        when(d === dom, lit(w)).otherwise(acc)
      }
    val wChecked = when(d.isNull || wKnown.isNull,
        raise_error(concat(lit("interleaveByWeight: no weight for domain "),
          coalesce(d, lit("<null>")))).cast("double"))
      .otherwise(wKnown)
    val wRank = Window.partitionBy(d)
      .orderBy(hashHex(seed, keys.map(col)) +: keys.map(col): _*)
    df.withColumn("domain_rank", row_number().over(wRank))
      .withColumn("vt", (col("domain_rank") - lit(0.5)) / wChecked)
      .orderBy(col("vt") +: d +: keys.map(col): _*)
  }

  /** Temperature-based domain rebalancing (the multinomial mixture rule
    * of GPT-3 / XLM-R / LLaMA data recipes): target proportions
    * q_i ∝ n_i^alpha flatten the domain distribution as alpha → 0, and
    * the corpus is thinned BY DOWNSAMPLING ONLY to the largest total that
    * realizes them exactly — keep-rate r_i = q_i·T / n_i with
    * T = min_j n_j/q_j, so the scarcest-relative-to-target domain is kept
    * whole (rate 1) and every other domain is deterministically thinned
    * to match. Per-row keeps are [[hashFraction]] decisions: auditable,
    * rerun-stable, engine-portable.
    *
    * Scale shape: one map-side-combinable count per domain (a tiny
    * aggregate — domains are things like source or language, not keys),
    * rate arithmetic on that tiny table, then a broadcast join back and a
    * stateless filter. The full corpus never shuffles; there is no
    * window over the data itself.
    *
    * Cross-engine exactness: rates are floor-rounded to 6 decimals so
    * pow()'s last-ulp differences between libm implementations cannot
    * move a threshold; the rate-1 domain is identified by its own
    * engine's argmin (exact by construction on both sides).
    *
    * Returns the kept rows plus `keep_rate` (the applied per-domain
    * rate). `alpha` = 1 keeps everything; alpha = 0 targets a uniform
    * mix. */
  def temperatureSample(df: DataFrame, domainCol: String, alpha: Double,
      keys: Seq[String], seed: String = "graft"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val q = counts.withColumn("__qi",
      pow(col("__n"), alpha) / sum(pow(col("__n"), alpha)).over(all))
    val rates = q.withColumn("__t", min(col("__n") / col("__qi")).over(all))
      .withColumn("keep_rate",
        when(col("__n") / col("__qi") <= col("__t"), lit(1.0))
          .otherwise(least(lit(1.0),
            floor(col("__qi") * col("__t") / col("__n") * 1e6) / 1e6)))
      .select(col(domainCol), col("keep_rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashFraction(seed, keys.map(col)) < col("keep_rate"))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * floor(identityFraction · k). Same identity-hash discipline as
    * [[hashSplit]] — a row's fold survives repartitioning, retries, and
    * engine changes, and keying on an entity id (not the row) keeps all
    * of an entity's rows in one fold (the group-aware split that stops
    * leakage across folds). Narrow map, no shuffle. */
  def kfold(df: DataFrame, keys: Seq[String], k: Int,
      seed: String = "graft"): DataFrame = {
    require(k >= 2, s"need k ≥ 2 folds, got $k")
    df.withColumn("fold",
      floor(hashFraction(seed, keys.map(col)) * k).cast("int"))
  }

  /** Horvitz–Thompson estimation from a deterministic Bernoulli sample
    * (Horvitz & Thompson 1952 — public): every row enters the sample
    * independently with probability π = `rate` via the identity hash, and
    * population totals are estimated as T̂ = Σ_sampled y/π with the
    * Bernoulli-design variance estimator V̂(T̂) = Σ_sampled y²(1−π)/π² —
    * the math that makes "profile 1% of the corpus, report corpus-level
    * numbers WITH error bars" an estimate instead of a guess. The z
    * multiplier is the shared inline literal (zQuantile convention).
    *
    * Because the sample is the hash-deterministic set (not `sample()`),
    * the estimate is reproducible on any engine — the gate emits the
    * TRUE total beside the interval and the computed coverage verdict.
    * One filtered aggregation with round-9 decimal folds + one exact
    * total pass. Returns one row (n, n_sampled, total_hat, se_total,
    * ci_lo, ci_hi, true_total, covered), round-6. */
  def horvitzThompson(df: DataFrame, keys: Seq[String], valueCol: Column,
      rate: Double, seed: String = "graft-ht",
      z: Double = 1.959963984540054): DataFrame = {
    require(rate > 0.0 && rate < 1.0, s"rate must be in (0,1): $rate")
    val y = valueCol.cast("double")
    val base = df.filter(y.isNotNull)
    def fold9(c: Column) =
      sum(round(c, 9).cast("decimal(38,12)")).cast("double")
    val inSample = hashFraction(seed, keys.map(col)) < rate
    val agg = base.agg(
      count(lit(1)).as("n"),
      fold9(y).as("true_total"),
      sum(when(inSample, 1L).otherwise(0L)).as("n_sampled"),
      fold9(when(inSample, y / rate)).as("total_hat"),
      fold9(when(inSample, y * y * ((1.0 - rate) / (rate * rate))))
        .as("var_hat"))
    agg.select(col("n"), col("n_sampled"),
        round(col("total_hat"), 6).as("total_hat"),
        round(sqrt(greatest(col("var_hat"), lit(0.0))), 6).as("se_total"),
        round(col("total_hat") - lit(z) *
          sqrt(greatest(col("var_hat"), lit(0.0))), 6).as("ci_lo"),
        round(col("total_hat") + lit(z) *
          sqrt(greatest(col("var_hat"), lit(0.0))), 6).as("ci_hi"),
        round(col("true_total"), 6).as("true_total"))
      .withColumn("covered",
        col("ci_lo") <= col("true_total") && col("true_total") <= col("ci_hi"))
  }

  /** GLOBAL exact top-fraction cut — keep the best ⌈frac·N⌉ rows of the
    * whole corpus by (score desc, tie asc), with NO unpartitioned window
    * anywhere in the plan. The selection rank k = ⌈frac·N⌉ (the same
    * double `ceil` an oracle's `ceil(frac * count(*))` evaluates) is
    * located by exact order statistic: a range-partitioned distributed
    * sort of ONLY the (score, tie) pair — an ids-and-scores shuffle, the
    * payload never moves — a partition-sizes pass, and a one-row fetch
    * from the single partition holding rank k. The returned frame is the
    * ORIGINAL df under a pure broadcast-threshold filter
    * (score > s_k OR (score = s_k AND tie ≤ t_k)): a narrow scan+filter
    * plan, lazily re-evaluable, with no task ever seeing more than its
    * own partition of the sort.
    *
    * `tieCol` must be a row-unique key (a doc id): it makes the boundary
    * deterministic when scores tie and the cut order total, so the kept
    * SET is a pure function of the data. Null scores are never kept (the
    * boundary comparison is null-rejecting; an oracle's DESC would sort
    * them first — filter them upstream when they exist). */
  def topFractionExact(
      df: DataFrame, scoreCol: Column, tieCol: Column,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val keys = df.select(scoreCol.as("__s"), tieCol.as("__t"))
      .filter(col("__s").isNotNull)
    val n = keys.count()
    if (n == 0) return df.filter(lit(false))
    val k = math.ceil(frac * n).toLong
    val sorted = keys.repartitionByRange(
        math.max(1, keys.rdd.getNumPartitions),
        col("__s").desc, col("__t").asc)
      .sortWithinPartitions(col("__s").desc, col("__t").asc)
      .rdd
    sorted.persist()
    try {
      val sizes = sorted.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.size.toLong))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = sizes.scanLeft(0L)(_ + _)
      // the single partition holding global rank k, and k's local index
      val p = offsets.indexWhere(_ >= k) - 1
      val local = (k - offsets(p) - 1).toInt
      val boundary = sorted.mapPartitionsWithIndex { (i, it) =>
        if (i == p) it.slice(local, local + 1) else Iterator.empty
      }.collect().head
      val (bs, bt) = (boundary.get(0), boundary.get(1))
      df.filter(scoreCol > lit(bs) ||
        (scoreCol === lit(bs) && tieCol <= lit(bt)))
    } finally sorted.unpersist(blocking = false)
  }

  /** Per-domain top-fraction selection — keep the best `frac` of each
    * domain by a score column (the FineWeb/DCLM-style "classifier top-X%"
    * quality cut, applied per source so a strong domain cannot crowd out
    * a weak one).
    *
    * Exact semantics: rows ranked inside each domain by (score desc,
    * tie-break id asc); keep ranks ≤ ceil(frac·n_domain). One shuffle on
    * the domain key; rank and domain size come from two window functions
    * over the SAME partitioning, so Catalyst plans a single Exchange.
    *
    * Scale note: a window sort puts each domain's full row set through one
    * task's sort — fine for domains ≤ a few hundred million rows, a skew
    * hazard past that. [[thresholdTopFraction]] is the 100 TB shape: it
    * replaces the per-domain sort with one aggregate computing an
    * approximate score threshold per domain and a broadcast-joined filter
    * (no sort, no skew), at the cost of an approximate cut line. */
  def topFractionByGroup(
      df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = byGroup.orderBy(col(scoreCol).desc, col(tieCol))
    df.withColumn("__rn", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Approximate per-domain top-fraction cut for corpora where a single
    * domain is too large to sort: one aggregate computes each domain's
    * (1−frac) score quantile with a mergeable percentile sketch, then a
    * broadcast join + filter keeps rows at or above their domain's
    * threshold. Two scans, zero sorts; the kept fraction lands within the
    * sketch's rank error of `frac` (tighten with `accuracy`). Domains are
    * few by premise — the threshold table stays broadcast-sized. */
  def thresholdTopFraction(
      df: DataFrame, groupCol: String, scoreCol: String, frac: Double,
      accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val thresholds = df.groupBy(col(groupCol)).agg(
      percentile_approx(col(scoreCol), lit(1.0 - frac), lit(accuracy))
        .as("__thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Weighted corpus mixture: each source is thinned to its weight (a
    * deterministic per-row keep decision, NOT an approximate `sample()`)
    * and tagged with its name. Weights are independent keep-probabilities
    * per source, so a 0.5/0.25 mix of equal-sized corpora yields a 2:1
    * blend. Schemas must union by name. */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)],
      keys: Seq[String], seed: String = "graft"): DataFrame = {
    require(sources.nonEmpty, "no sources")
    sources.map { case (name, df, weight) =>
      require(weight > 0.0 && weight <= 1.0, s"$name: weight must be in (0,1]")
      // fold the source name into the seed: the same document kept in one
      // source is an independent draw in another
      df.filter(hashFraction(s"$seed/$name", keys.map(col)) < weight)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** DSIR-style importance resampling (Xie et al. 2023 "Data Selection
    * for Language Models via Importance Resampling" — public; unigram
    * variant): draw k documents from the corpus with probability
    * ∝ p_target(doc)/p_proposal(doc), pulling the selection toward a
    * target domain's distribution. The per-document log ratio is
    * n_tokens · (mean target logprob − mean proposal logprob) from two
    * add-one-smoothed unigram LMs ([[LanguageModel]]); sampling without
    * replacement happens in the LOG domain via the Gumbel top-k
    * identity (Vieira 2014, public): key = log w + Gumbel(0,1) with the
    * Gumbel drawn as −ln(−ln u) from the strictly-positive identity-hash
    * fraction — exp(log w) would overflow doubles on long documents, the
    * log-domain key cannot. Deterministic, engine-portable,
    * DuckDB-oracle-checkable end to end.
    *
    * Shape (r18, fused): ONE tokenize of the scored corpus feeds the
    * proposal wordcount AND both scoring sides (the generic train→score
    * composition tokenized it three times), both vocab joins ride one
    * exploded-token table, and both per-doc means come from ONE groupBy
    * (two avg cells instead of two shuffles); the target LM trains on
    * its own frame (it is an arbitrary corpus, not necessarily a slice
    * of `df`). One narrow key map, TakeOrderedAndProject; the k-row
    * result is materialized before the token cache is released.
    * Documents with no tokens carry log ratio 0 and compete on pure
    * Gumbel noise (uniform among themselves). At extreme vocabulary
    * sizes substitute [[Features]] hashed n-gram counts for the exact
    * vocab join — the paper's own variant. */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      seed: String = "graft-dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tLm = LanguageModel.train(target, targetTextCol)
    val tok = df.select(col(idCol).as("id"),
        explode(graft.ops.TextOps.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
      .persist()
    try {
      val pVocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      val pStats = pVocab.agg(
        coalesce(sum(col("c")), lit(0L)).as("tt"),
        count(lit(1)).as("vs")).head()
      val tDenom = lit(math.max(tLm.totalTokens + tLm.vocabSize, 1L).toDouble)
      val pDenom = lit(math.max(pStats.getLong(0) + pStats.getLong(1), 1L).toDouble)
      val perDoc = tok
        .join(tLm.vocab.select(col("t"), col("c").as("__ct")), Seq("t"), "left")
        .join(pVocab.select(col("t"), col("c").as("__cp")), Seq("t"), "left")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"),
          avg(log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) / tDenom)).as("__lpt"),
          avg(log((coalesce(col("__cp"), lit(0L)) + lit(1.0)) / pDenom)).as("__lpp"))
      val u = hashFractionOpen(seed, Seq(col("id")))
      df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          round(coalesce(col("__lpt"), lit(0.0)), 6).as("lp_target"),
          round(coalesce(col("__lpp"), lit(0.0)), 6).as("lp_proposal"))
        .withColumn("log_ratio",
          round((col("lp_target") - col("lp_proposal")) * col("n_tokens"), 6))
        .withColumn("gumbel_key",
          round(col("log_ratio") - log(-log(u)), 9))
        .orderBy(col("gumbel_key").desc, col("id"))
        .limit(k)
        .localCheckpoint()
    } finally { tok.unpersist(blocking = false); () }
  }

  /** χ² goodness-of-fit of a realized dataset mix against its TARGET
    * weights (Pearson 1900, public) — the acceptance check after
    * [[mix]]/temperature sampling: did the assembled dataset actually
    * hit the recipe? χ² = Σ_k (o_k − n·w_k)²/(n·w_k) over the target
    * keys, df = k − 1. Keys in the data but NOT in the target fail
    * loudly (the recipe must cover the data); target keys absent from
    * the data contribute their full expected count.
    *
    * One groupBy(key) with map-side combine; the k-bounded χ² terms
    * round to 9 and fold in decimal. Returns one row (n, k, chi2,
    * p_value): χ² round-6; the χ²(k−1) p is library-only. */
  def mixFitTest(df: DataFrame, keyCol: Column,
      targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.size >= 2, "need >= 2 target components")
    require(targetWeights.values.forall(_ > 0), "weights must be positive")
    val wSum = targetWeights.values.sum
    require(math.abs(wSum - 1.0) < 1e-9, s"weights must sum to 1: $wSum")
    val counts = df.filter(keyCol.isNotNull)
      .groupBy(keyCol.cast("string").as("key"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("o")).toMap
    val stray = counts.keySet -- targetWeights.keySet
    require(stray.isEmpty, s"keys outside the target recipe: $stray")
    val n = counts.values.sum
    require(n > 0, "mix fit needs rows")
    // k-bounded driver fold in SORTED key order with round-9 terms —
    // the exact decimal fold a SQL oracle replays
    var acc = java.math.BigDecimal.ZERO
    targetWeights.keys.toSeq.sorted.foreach { k =>
      val e = n * targetWeights(k)
      val o = counts.getOrElse(k, 0L)
      val term = (o - e) * (o - e) / e
      acc = acc.add(java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP))
    }
    val chi2 = acc.doubleValue
    val k = targetWeights.size
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val p = r6(1.0 -
      new org.apache.commons.math3.distribution.ChiSquaredDistribution(
        (k - 1).toDouble).cumulativeProbability(chi2))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, k, r6(chi2), p)).toDF("n", "k", "chi2", "p_value")
  }

  /** Effective sample size of an importance-weighted dataset (Kong
    * 1992, public): ESS = (Σw)²/Σw² — the diagnostic every weighted
    * estimate (DSIR resampling, temperature mixing, IPW) must report
    * beside its mean: n weighted rows with ESS ≈ 30 carry thirty rows'
    * worth of evidence, and a CI pretending otherwise lies. ess_frac =
    * ESS/n is the one-glance health number (→ 1 uniform weights, → 0 a
    * handful of rows dominating).
    *
    * ONE aggregation: weights fold as round-9/round-12 decimals, the
    * ratio is fixed double arithmetic. Negative weights fail loudly
    * (ESS assumes a proper weighting); zero total weight fails loudly.
    * Returns one row (n, sum_w, ess, ess_frac), round-6. */
  def effectiveSampleSize(df: DataFrame, wCol: Column): DataFrame = {
    val w = wCol.cast("double")
    val r = df.filter(w.isNotNull).agg(
        count(lit(1)).as("n"),
        min(w).as("wmin"),
        sum(round(w, 9).cast("decimal(38,12)")).cast("double").as("sw"),
        sum(round(w * w, 12).cast("decimal(38,14)")).cast("double")
          .as("sww"))
      .head()
    val n = r.getAs[Long]("n")
    require(n > 0, "ESS needs weighted rows")
    require(r.getAs[Double]("wmin") >= 0.0,
      s"negative weight: ${r.getAs[Double]("wmin")}")
    val sw = r.getAs[Double]("sw"); val sww = r.getAs[Double]("sww")
    require(sww > 0.0, "all weights are zero - nothing is sampled")
    val ess = sw * sw / sww
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, r6(sw), r6(ess), r6(ess / n)))
      .toDF("n", "sum_w", "ess", "ess_frac")
  }

  /** Deterministic class-balanced downsample: every label keeps exactly
    * min-class-count rows, selected by identity-hash order — the
    * majority-class fix before training any classifier on skewed labels
    * (a 99:1 corpus teaches the model to say "no"). Hash selection
    * makes the subset reproducible, seed-switchable, and oracle-able —
    * the [[hashFraction]] family's contract.
    *
    * One groupBy counts classes (loud when any class is empty-ish
    * input); the cut is a rank over a window PARTITIONED by label and
    * ordered by (full 32-hex identity hash, id) — collision-free, so
    * the boundary row is deterministic. Scale: the window partitions on
    * the label key; skew rides the label distribution itself (the
    * majority class IS the hot partition — pre-salt the rank via
    * a composite label when one label dominates a 10¹¹-row corpus).
    * Returns the selected (id, label) rows ordered by (label, id). */
  def classBalance(
      df: DataFrame, idCol: String, labelCol: String,
      seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(idCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).as("label"))
    val counts = base.groupBy("label").agg(count(lit(1)).as("n"))
    val minRow = counts.agg(min(col("n")), count(lit(1))).head()
    require(!minRow.isNullAt(0) && minRow.getLong(1) >= 2,
      s"class balance needs >= 2 non-empty classes")
    val m = minRow.getLong(0)
    val w = Window.partitionBy(col("label"))
      .orderBy(hashHex(seed, Seq(col("id"))), col("id"))
    base.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m)
      .select(col("id"), col("label"))
      .orderBy("label", "id")
  }
}
