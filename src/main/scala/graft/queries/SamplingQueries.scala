package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic selection operators ([[graft.ops.Sampling]]). These are
  * oracle-checkable PRECISELY because the hash is engine-portable (md5 of
  * the row identity): DuckDB reproduces every keep/order decision
  * bit-for-bit, which is also the property that makes the splits
  * reproducible artifacts at 100 TB. */
object SamplingQueries extends QueryModule {

  /** 80/10/10 train/val/test split of lineitem keyed on the line identity;
    * the gate compares per-split row counts. */
  val smpHashSplit: Q = Q(
    "smp_hash_split",
    Some("""
      WITH h AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|', 'graft',
            CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT)
          / 4294967296.0 AS f
        FROM lineitem)
      SELECT CASE WHEN f < 0.8 THEN 'train' WHEN f < 0.9 THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n
      FROM h
      GROUP BY 1
      ORDER BY split"""),
    (s, dir) =>
      Sampling.hashSplit(Tables.load(s, dir, "lineitem"),
          keys = Seq("l_orderkey", "l_linenumber"),
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split"))

  /** Exact-100-per-stratum deterministic sample (k smallest identity
    * hashes per l_returnflag); the gate compares the SELECTED ROWS, so
    * both engines must make identical per-row choices. */
  val smpStratified: Q = Q(
    "smp_stratified",
    Some("""
      WITH r AS (
        SELECT l_returnflag, l_orderkey, l_linenumber,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY md5(concat_ws('|', 'graft',
                CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
              l_orderkey, l_linenumber) AS rn
        FROM lineitem)
      SELECT l_returnflag, l_orderkey, l_linenumber
      FROM r
      WHERE rn <= 100
      ORDER BY l_returnflag, l_orderkey, l_linenumber"""),
    (s, dir) =>
      Sampling.stratifiedSample(
          Tables.load(s, dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber"),
          strata = Seq("l_returnflag"), k = 100,
          keys = Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber"))

  /** Greedy budget packing of documents into ~4096-char bins inside 8
    * hash groups; the gate compares every row's (group, bin) assignment. */
  val smpPack: Q = Q(
    "smp_pack_budget",
    Some("""
      WITH h AS (
        SELECT doc_id, n_chars,
          md5(concat_ws('|', 'graft', CAST(doc_id AS VARCHAR))) AS hx
        FROM documents),
      g AS (
        SELECT doc_id, n_chars, hx,
          CAST(concat('0x', substr(hx, 1, 8)) AS BIGINT) % 8 AS pack_group
        FROM h)
      SELECT doc_id, pack_group,
        CAST(floor(COALESCE(SUM(n_chars) OVER (PARTITION BY pack_group
          ORDER BY hx, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0) AS BIGINT)
          AS pack_seq
      FROM g
      ORDER BY doc_id"""),
    (s, dir) =>
      Sampling.packByBudget(
          Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
          weightCol = "n_chars", budget = 4096L,
          keys = Seq("doc_id"), groups = 8)
        .select("doc_id", "pack_group", "pack_seq")
        .orderBy("doc_id"))

  /** Weighted two-corpus mixture (en-heavy blend): each source thins by an
    * independent per-row hash draw, so the gate compares the exact kept
    * (mix_source, doc_id) set — both engines must agree on every draw. */
  val smpMix: Q = Q(
    "smp_mix",
    Some("""
      WITH en AS (
        SELECT 'en' AS mix_source, doc_id FROM documents
        WHERE lang = 'en'
          AND CAST(concat('0x', substr(md5(concat_ws('|', 'graft/en',
              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.8),
      multi AS (
        SELECT 'multi' AS mix_source, doc_id FROM documents
        WHERE lang <> 'en'
          AND CAST(concat('0x', substr(md5(concat_ws('|', 'graft/multi',
              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.4)
      SELECT mix_source, doc_id FROM en
      UNION ALL SELECT mix_source, doc_id FROM multi
      ORDER BY mix_source, doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Sampling.mixCorpora(
          Seq(
            ("en", docs.filter(col("lang") === "en"), 0.8),
            ("multi", docs.filter(col("lang") =!= "en"), 0.4)),
          keys = Seq("doc_id"))
        .select("mix_source", "doc_id")
        .orderBy("mix_source", "doc_id")
    })

  /** Temperature-based domain rebalancing (alpha = 0.5 over `lang`): the
    * scarcest-relative-to-target language keeps rate 1, the en-heavy head
    * is thinned toward n^0.5 proportions. The gate compares the exact
    * kept (doc_id, lang) set, so both engines must agree on every rate
    * (floor-rounded to 6 decimals against libm pow ulps) and every
    * per-row hash draw. */
  val smpTemperature: Q = Q(
    "smp_temperature_mix",
    Some("""
      WITH c AS (
        SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
      q AS (
        SELECT lang, n, pow(n, 0.5) / sum(pow(n, 0.5)) OVER () AS qi FROM c),
      t AS (SELECT lang, n, qi, min(n / qi) OVER () AS tt FROM q),
      r AS (
        SELECT lang,
          CASE WHEN n / qi <= tt THEN 1.0
               ELSE least(1.0, floor(qi * tt / n * 1e6) / 1e6) END AS keep_rate
        FROM t)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN r USING (lang)
      WHERE CAST(concat('0x', substr(md5(concat_ws('|', 'graft',
          CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
        < r.keep_rate
      ORDER BY d.doc_id"""),
    (s, dir) =>
      Sampling.temperatureSample(Tables.load(s, dir, "documents"),
          domainCol = "lang", alpha = 0.5, keys = Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"))

  /** Deterministic global shuffle (training-order randomization): the full
    * permutation is oracle-checked POSITIONALLY — DuckDB derives the same
    * seeded identity hash and must produce the identical row order, which
    * is the whole claim (a training order that is a pure function of row
    * identity, not of cluster layout). */
  val smpShuffle: Q = Q(
    "smp_shuffle",
    Some("""
      SELECT md5(concat_ws('|', 'graft', CAST(doc_id AS VARCHAR))) AS shuffle_key,
             doc_id
      FROM documents
      ORDER BY shuffle_key, doc_id"""),
    (s, dir) =>
      Sampling.shuffle(
        Tables.load(s, dir, "documents").select("doc_id"), Seq("doc_id")))

  /** Keep the top 20% of each source domain by the surface quality score —
    * the per-domain classifier cut. Both engines rank by the ROUNDED score
    * (ties broken by doc_id) and keep ranks ≤ ceil(0.2·n_domain); the
    * quality arithmetic mirrors txt_quality term-for-term. */
  val smpQualityTopFrac: Q = Q(
    "smp_quality_topfrac",
    Some {
      val enList = graft.ops.TextOps.LangMarkers.head._2
        .map(w => s"'$w'").mkString(", ")
      s"""
      WITH d AS (
        SELECT source, doc_id,
          ROUND(0.3 * least(1.0, len(w) / 100.0)
            + 0.4 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END)
            + 0.3 * (CASE WHEN len(w) = 0 THEN 0.0
                ELSE CAST(len(list_filter(w, t -> t IN ($enList))) AS DOUBLE)
                     / len(w) END), 6) AS q
        FROM (SELECT source, doc_id,
                CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
              FROM documents)),
      r AS (
        SELECT source, doc_id, q,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY q DESC, doc_id) AS rn,
          count(*) OVER (PARTITION BY source) AS n
        FROM d)
      SELECT source, doc_id, q
      FROM r
      WHERE rn <= CAST(ceil(0.2 * n) AS BIGINT)
      ORDER BY source, doc_id"""
    },
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("source"),
        col("doc_id"),
        round(graft.ops.TextOps.qualityScore(col("text")), 6).as("q"))
      Sampling.topFractionByGroup(d, "source", "q", "doc_id", frac = 0.2)
        .orderBy("source", "doc_id")
    })

  /** Deterministic 5-fold CV assignment keyed on the ORDER (all lines of
    * an order share a fold — the group-aware anti-leakage split); the
    * gate compares per-fold row counts. */
  val smpKfold: Q = Q(
    "smp_kfold",
    Some("""
      WITH h AS (
        SELECT CAST(floor(
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft',
            CAST(l_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
          / 4294967296.0 * 5) AS INT) AS fold
        FROM lineitem)
      SELECT fold, count(*) AS n
      FROM h
      GROUP BY fold
      ORDER BY fold"""),
    (s, dir) =>
      Sampling.kfold(Tables.load(s, dir, "lineitem"),
          keys = Seq("l_orderkey"), k = 5)
        .groupBy("fold").agg(count(lit(1)).as("n"))
        .orderBy("fold"))

  /** Fixed-length training-sequence packing over REAL BPE token ids
    * ([[Sampling.packSequences]]). PROMOTED to oracle-checked (r18, the
    * mnt_token_export replay): everything in the packer EXCEPT the BPE
    * encode is engine-portable hash arithmetic, and the replay supplies
    * the missing piece — DuckDB re-derives every document's token count
    * from the recursive merge replay (+1 EOS), reassigns every doc to
    * its (pack_group, pack_seq) bin with the same md5 identity hash and
    * exclusive-prefix-sum window the packer used, and slices each bin's
    * token mass into seqLen chunks — so every output row's
    * (pack_group, pack_seq, seq_index, n_real_tokens) is independently
    * rebuilt, not hashed back. The raw digests (xxhash64 has no DuckDB
    * mirror) remain the bench/raw-mode output; the in-gate self-asserts
    * stay and their verdicts are pinned TRUE by the oracle:
    * every row exactly seqLen ids, Σ n_real_tokens == Σ_docs
    * (bpe_tokens + 1) — token CONSERVATION end to end — and per-token
    * provenance alignment (the spec additionally decodes the packed
    * stream back to the original corpus text multiset). */
  val smpPackSequences: Q = Q(
    "smp_pack_sequences",
    Some {
      val losslessPat =
        graft.functions.Bpe.LosslessSplitPattern.replace("'", "''")
      TextQueries.bpeReplayPrelude + s""",
      plen AS (SELECT piece, len(syms) AS ntok FROM final),
      dp AS (
        SELECT doc_id,
          unnest(regexp_extract_all(text, '$losslessPat')) AS piece
        FROM documents),
      doclen AS (
        SELECT d.doc_id, COALESCE(t.n, 0) + 1 AS n
        FROM documents d LEFT JOIN (
          SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS n
          FROM dp JOIN plen USING (piece) GROUP BY doc_id) t
          USING (doc_id)),
      hashed AS (
        SELECT doc_id, n,
          md5(concat_ws('|', 'graft', CAST(doc_id AS VARCHAR))) AS h
        FROM doclen),
      binned AS (
        SELECT pack_group, h, doc_id, n,
          CAST(floor(COALESCE(SUM(n) OVER (PARTITION BY pack_group
            ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / 512.0) AS BIGINT) AS pack_seq
        FROM (SELECT CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 16
                AS pack_group, h, doc_id, n
              FROM hashed)),
      bins AS (
        SELECT pack_group, pack_seq, CAST(SUM(n) AS BIGINT) AS mass
        FROM binned GROUP BY pack_group, pack_seq),
      chunks AS (
        SELECT pack_group, pack_seq, CAST(i AS INT) AS seq_index,
          CAST(LEAST(64, mass - 64 * i) AS INT) AS n_real_tokens
        FROM (SELECT pack_group, pack_seq, mass,
                unnest(range(0, CAST(ceil(mass / 64.0) AS BIGINT))) AS i
              FROM bins))
      SELECT pack_group, pack_seq, seq_index, n_real_tokens,
        TRUE AS len_exact, TRUE AS conservation,
        TRUE AS provenance_aligned
      FROM chunks
      ORDER BY pack_group, pack_seq, seq_index"""
    },
    (s, dir) => {
      val tok = graft.functions.Bpe.fromResource()
      val docs = Tables.load(s, dir, "documents")
      val seqLen = 64
      val packed = Sampling.packSequences(
        docs, "doc_id", "text", tok, seqLen = seqLen, binBudget = 512,
        groups = 16)
      if (!Tables.gateMode)
        // bench/raw mode: the production output, digested for the dump
        // (the driver harness can't sort raw arrays)
        packed
          .withColumn("ids_digest",
            xxhash64(concat_ws(",", transform(col("token_ids"),
              i => i.cast("string")))))
          .withColumn("docs_digest",
            xxhash64(concat_ws(",", transform(col("doc_ids"),
              i => i.cast("string")))))
          .drop("token_ids", "doc_ids")
          .orderBy("pack_group", "pack_seq", "seq_index")
      else {
        packed.persist()
        val bad = packed.filter(size(col("token_ids")) =!= seqLen).count()
        require(bad == 0, s"$bad packed rows are not exactly $seqLen ids")
        val real = packed.agg(sum(col("n_real_tokens"))).head().getLong(0)
        val expected = docs.agg(sum(
          size(graft.functions.Bpe.encodeIds(s, col("text"), tok)) + 1))
          .head().getLong(0)
        require(real == expected,
          s"token conservation broken: packed $real, corpus+eos $expected")
        // per-token provenance: doc_ids covers exactly the real tokens,
        // and the total token count per source doc matches its encoded
        // length + 1 (the doc's own EOS) — alignment proven corpus-wide
        val misaligned = packed
          .filter(size(col("doc_ids")) =!= col("n_real_tokens")).count()
        require(misaligned == 0,
          s"$misaligned rows with doc_ids length drift")
        val perDoc = packed
          .select(explode(col("doc_ids")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_packed"))
        val docLens = docs.select(col("doc_id"),
          (size(graft.functions.Bpe.encodeIds(s, col("text"), tok)) + 1)
            .cast("long").as("n_enc"))
        val drift = perDoc.join(docLens, "doc_id")
          .filter(col("n_packed") =!= col("n_enc")).count()
        require(drift == 0, s"$drift documents with provenance-count drift")
        packed.select(col("pack_group"), col("pack_seq"), col("seq_index"),
            col("n_real_tokens"),
            lit(true).as("len_exact"), lit(true).as("conservation"),
            lit(true).as("provenance_aligned"))
          .orderBy("pack_group", "pack_seq", "seq_index")
      }
    })

  /** Weighted sampling without replacement
    * ([[Sampling.weightedSample]], Efraimidis–Spirakis keys over the
    * engine-portable identity hash): both engines draw the same u per
    * doc, score ln(u)/n_chars, and keep the 50 largest — the gate
    * compares the SELECTED ROWS, so the per-row keys and the selection
    * boundary must agree exactly across engines. The key uses ln(), a
    * transcendental with no correctly-rounded guarantee — this gate
    * leans on the same JVM/libm ln parity the LM-scoring gates
    * (txt_unigram_logprob, txt_bigram_logprob) already hash bit-exactly;
    * a 1-ulp divergence could only flip the selection if the rank-50/51
    * keys landed within that ulp (measure-zero on continuous keys, and
    * any flip would be deterministic per corpus, not flaky). */
  val smpWeighted: Q = Q(
    "smp_weighted_sample",
    Some("""
      WITH w AS (
        SELECT doc_id, n_chars,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-ws',
              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0),
      s AS (SELECT doc_id, n_chars FROM w
            ORDER BY ln(u) / n_chars DESC, doc_id LIMIT 50)
      SELECT doc_id, n_chars FROM s ORDER BY doc_id"""),
    (s, dir) =>
      Sampling.weightedSample(
          Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
          keys = Seq("doc_id"), weightCol = "n_chars", k = 50,
          seed = "graft-ws")
        .orderBy("doc_id"))

  /** Dedup-aware split: documents sharing a 60-char prefix (the gate's
    * duplicate-cluster definition — 22 multi-document clusters at sf0.01)
    * must land in one split. The gate compares every row's
    * (cluster_id, split) assignment, so both engines must agree on the
    * cluster resolution AND the per-cluster hash draw. */
  val smpLeakageSafe: Q = Q(
    "smp_leakage_safe_split",
    Some("""
      WITH rep AS (
        SELECT doc_id,
          MIN(doc_id) OVER (PARTITION BY substr(text, 1, 60)) AS cluster_id
        FROM documents),
      s AS (
        SELECT doc_id, cluster_id,
          CAST(concat('0x', substr(md5(concat_ws('|', 'graft',
              CAST(cluster_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 AS f
        FROM rep)
      SELECT doc_id, cluster_id,
        CASE WHEN f < 0.8 THEN 'train' WHEN f < 0.9 THEN 'val'
             ELSE 'test' END AS split
      FROM s
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val keyed = docs.select(col("doc_id"), substring(col("text"), 1, 60).as("p"))
      val reps = keyed.groupBy("p").agg(min("doc_id").as("rep"))
      val pairs = keyed.join(reps, Seq("p"))
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"))
      Sampling.leakageSafeSplit(docs, "doc_id", pairs,
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    })

  /** Water-filling token budget over the 20 per-source character
    * supplies ([[graft.ops.Mixture.waterFill]]): a 60k budget against a
    * ~149k total, so small sources cap out and large ones share one
    * level — the oracle rebuilds the sorted prefix scan, the first
    * feasible level, and every allocation; the gate asserts exhaustion
    * and per-domain feasibility. */
  val smpWaterFill: Q = Q(
    "smp_water_fill",
    Some("""
      WITH d AS (
        SELECT source AS domain, CAST(SUM(n_chars) AS DOUBLE) AS available
        FROM documents WHERE n_chars > 0 GROUP BY 1),
      r AS (
        SELECT domain, available,
          row_number() OVER (ORDER BY available, domain) AS i,
          SUM(available) OVER (ORDER BY available, domain
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
          count(*) OVER () AS n
        FROM d),
      lam AS (
        SELECT (60000.0 - (pre - available)) / (n - i + 1) AS l
        FROM r
        WHERE (60000.0 - (pre - available)) / (n - i + 1) <= available
        ORDER BY i LIMIT 1)
      SELECT domain, available,
        round(CASE WHEN (SELECT l FROM lam) IS NULL THEN available
          ELSE least(available, (SELECT l FROM lam)) END, 6) AS allocated,
        ((SELECT l FROM lam) IS NULL
          OR available <= (SELECT l FROM lam)) AS capped
      FROM r ORDER BY domain"""),
    (s, dir) => {
      val domains = graft.Tables.load(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .groupBy(col("source").as("domain"))
        .agg(sum(col("n_chars")).cast("double").as("avail"))
      val out = graft.ops.Mixture.waterFill(domains, "domain", "avail",
        budget = 60000.0)
      val rows = out.collect()
      val total = rows.map(_.getAs[Double]("allocated")).sum
      require(math.abs(total - 60000.0) < 1e-3,
        s"water level must exhaust the budget, allocated $total")
      require(rows.forall(r =>
          r.getAs[Double]("allocated") <= r.getAs[Double]("available") + 1e-9),
        "no domain may be allocated beyond its supply")
      out.orderBy("domain")
    })

  /** DSIR-style importance resampling toward the doc_id % 5 slice's
    * distribution ([[graft.ops.Sampling.importanceResample]]): the
    * oracle retrains BOTH unigram LMs, rescores every document, and
    * reproduces the Gumbel top-k selection — LM training, smoothing,
    * the likelihood-ratio weights, the identity-hash Gumbel draws, and
    * the cut must all agree at once. */
  val smpImportanceResample: Q = Q(
    "smp_importance_resample",
    Some("""
      WITH d AS (
        SELECT doc_id, list_filter(
          CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE regexp_split_to_array(trim(lower(text)), '\s+') END,
          x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS t FROM d),
      vt AS (SELECT t, count(*) AS c FROM tok WHERE doc_id % 5 = 0
             GROUP BY t),
      vp AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      st AS (SELECT (SELECT count(*) FROM tok WHERE doc_id % 5 = 0) AS tt,
               (SELECT count(*) FROM vt) AS vs),
      sp AS (SELECT (SELECT count(*) FROM tok) AS tt,
               (SELECT count(*) FROM vp) AS vs),
      lt AS (
        SELECT tok.doc_id,
          avg(ln((COALESCE(vt.c, 0) + 1.0) / (st.tt + st.vs))) AS lp
        FROM tok LEFT JOIN vt USING (t), st GROUP BY tok.doc_id),
      lpp AS (
        SELECT tok.doc_id,
          avg(ln((COALESCE(vp.c, 0) + 1.0) / (sp.tt + sp.vs))) AS lp
        FROM tok LEFT JOIN vp USING (t), sp GROUP BY tok.doc_id),
      sc AS (
        SELECT d.doc_id AS id, len(d.w) AS n_tokens,
          round(COALESCE(lt.lp, 0.0), 6) AS lp_target,
          round(COALESCE(lpp.lp, 0.0), 6) AS lp_proposal
        FROM d LEFT JOIN lt ON d.doc_id = lt.doc_id
          LEFT JOIN lpp ON d.doc_id = lpp.doc_id),
      kx AS (
        SELECT id, n_tokens, lp_target, lp_proposal,
          round((lp_target - lp_proposal) * n_tokens, 6) AS log_ratio,
          round(round((lp_target - lp_proposal) * n_tokens, 6)
            - ln(-ln((CAST(concat('0x', substr(md5(concat_ws('|',
                'graft-dsir', CAST(id AS VARCHAR))), 1, 8)) AS BIGINT)
                + 0.5) / 4294967296.0)), 9) AS gumbel_key
        FROM sc)
      SELECT id, n_tokens, lp_target, lp_proposal, log_ratio, gumbel_key
      FROM kx ORDER BY gumbel_key DESC, id LIMIT 50"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val out = graft.ops.Sampling.importanceResample(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0), "text", k = 50)
      val rows = out.collect()
      require(rows.length == 50, s"expected 50 draws, got ${rows.length}")
      out.orderBy(col("gumbel_key").desc, col("id"))
    })

  /** Horvitz–Thompson corpus-total estimation
    * ([[graft.ops.Sampling.horvitzThompson]]): a 20% deterministic
    * Bernoulli sample of documents estimates the corpus character
    * total with the design variance and a 95% band — the oracle
    * replays the hash inclusion, both round-9 folds, the interval, and
    * the coverage verdict against the exact total. In-gate: the true
    * total is covered and the point estimate lands within 4 relative
    * SEs. */
  val smpHorvitzThompson: Q = Q(
    "smp_horvitz_thompson",
    Some("""
      WITH b AS (
        SELECT CAST(n_chars AS DOUBLE) AS y,
          (CAST(concat('0x', substr(md5(concat_ws('|', 'graft-ht',
            CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0 < 0.2) AS ins
        FROM documents WHERE n_chars IS NOT NULL),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS tt,
          CAST(SUM(CASE WHEN ins THEN 1 ELSE 0 END) AS BIGINT) AS ns,
          CAST(SUM(CASE WHEN ins THEN
            CAST(round(y / 0.2, 9) AS DECIMAL(38,12)) END) AS DOUBLE)
            AS th,
          CAST(SUM(CASE WHEN ins THEN
            CAST(round(y * y * ((1.0 - 0.2) / (0.2 * 0.2)), 9)
              AS DECIMAL(38,12)) END) AS DOUBLE) AS vh0
        FROM b),
      f AS (SELECT n, ns, th, greatest(vh0, 0.0) AS vh, tt FROM a)
      SELECT n, ns AS n_sampled, round(th, 6) + 0.0 AS total_hat,
        round(sqrt(vh), 6) + 0.0 AS se_total,
        round(th - 1.959963984540054 * sqrt(vh), 6) + 0.0 AS ci_lo,
        round(th + 1.959963984540054 * sqrt(vh), 6) + 0.0 AS ci_hi,
        round(tt, 6) + 0.0 AS true_total,
        round(th - 1.959963984540054 * sqrt(vh), 6) <= round(tt, 6)
          AND round(tt, 6)
            <= round(th + 1.959963984540054 * sqrt(vh), 6) AS covered
      FROM f"""),
    (s, dir) => {
      val out = graft.ops.Sampling.horvitzThompson(
        graft.Tables.load(s, dir, "documents")
          .filter(col("n_chars").isNotNull),
        Seq("doc_id"), col("n_chars"), rate = 0.2)
      val r = out.head()
      require(r.getAs[Boolean]("covered"),
        s"the 95% band must cover the exact total on this fixture: $r")
      require(math.abs(r.getAs[Double]("total_hat")
          - r.getAs[Double]("true_total"))
        <= 4.0 * r.getAs[Double]("se_total"),
        s"point estimate implausibly far from the truth: $r")
      out
    })

  /** Integration: quantile-normalize per-source scores, then ONE global
    * top-30% cut over the now-comparable values — the reason
    * [[graft.transform.Standardize.quantileNormalizeByGroup]] exists
    * (a raw global cut favors domains whose scorer runs hot). The
    * oracle splices the full normalization CTEs into the global rank
    * cut, so one hash proves both subsystems compose identically; the
    * gate additionally asserts every source survives the cut. The Spark
    * side cuts via [[graft.ops.Sampling.topFractionExact]] — the exact
    * order-statistic threshold + broadcast filter, NOT a global window
    * (PropertySpec pins the plan window-free). */
  val smpNormalizedTopFrac: Q = Q(
    "smp_normalized_topfrac",
    Some("""
      WITH base AS (
        SELECT source AS g, doc_id, CAST(n_chars AS DOUBLE) AS val
        FROM documents WHERE n_chars IS NOT NULL),
      rk AS (
        SELECT g, doc_id, val,
          rank() OVER (PARTITION BY g ORDER BY val) AS r,
          count(*) OVER (PARTITION BY g) AS n,
          count(*) OVER () AS nt
        FROM base),
      kq AS (
        SELECT g, doc_id, val,
          ((2 * r - 1) * nt + 2 * n - 1) // (2 * n) AS k
        FROM rk),
      pooled AS (
        SELECT val AS pv, row_number() OVER (ORDER BY val) AS k
        FROM base),
      norm AS (
        SELECT g, doc_id, val, pv AS normalized
        FROM kq JOIN pooled USING (k)),
      cut AS (
        SELECT g, doc_id, val, normalized,
          row_number() OVER (ORDER BY normalized DESC, doc_id) AS rn,
          count(*) OVER () AS m
        FROM norm)
      SELECT g AS source, doc_id, val AS score, normalized
      FROM cut
      WHERE rn <= CAST(ceil(CAST(0.3 AS DOUBLE) * m) AS BIGINT)
      ORDER BY doc_id"""),
    (s, dir) => {
      val norm = graft.transform.Standardize.quantileNormalizeByGroup(
        graft.Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars")),
        "source", "n_chars")
      val out = graft.ops.Sampling.topFractionExact(
          norm, col("normalized"), col("doc_id"), frac = 0.3)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("double").as("score"), col("normalized"))
        .orderBy("doc_id")
      val perSource = out.groupBy("source").count().count()
      require(perSource == 20,
        s"the normalized cut must keep every source in play, got $perSource")
      out
    })

  /** Neyman allocation ([[graft.ops.Mixture.neymanAllocation]]): a
    * 200-row sample budget split across (lang, source) strata of the
    * documents table ∝ N_h·σ_h of n_chars, integerized by largest
    * remainder — DuckDB rebuilds the moments, shares, floors and the
    * remainder ranking; Σ alloc == budget required in-gate. */
  val smpNeyman: Q = Q(
    "smp_neyman_allocation",
    Some("""
      WITH m AS (
        SELECT source, count(*) AS n_rows,
          SUM(CAST(round(CAST(n_chars AS DOUBLE), 6) AS DECIMAL(38,12)))
            AS s1,
          SUM(CAST(round(round(CAST(n_chars AS DOUBLE), 6)
            * round(CAST(n_chars AS DOUBLE), 6), 6) AS DECIMAL(38,12)))
            AS s2
        FROM documents WHERE n_chars IS NOT NULL
        GROUP BY source),
      sg AS (
        SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
          round(sqrt(greatest(0.0,
            (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / n_rows) / (n_rows - 1))), 12) AS sigma
        FROM m),
      tot AS (
        SELECT CAST(SUM(CAST(round(n_rows * sigma, 6) AS DECIMAL(38,12)))
          AS DOUBLE) AS wsum FROM sg),
      sh AS (
        SELECT source, n_rows, sigma,
          round(n_rows * sigma, 6) AS weight,
          200.0 * round(n_rows * sigma, 6) / wsum AS share
        FROM sg, tot),
      f AS (
        SELECT source, n_rows, sigma, weight,
          least(CAST(floor(share) AS BIGINT), n_rows) AS alloc0,
          CASE WHEN least(CAST(floor(share) AS BIGINT), n_rows) < n_rows
            THEN share - floor(share) ELSE -1.0 END AS rem2
        FROM sh),
      sp AS (SELECT CAST(SUM(alloc0) AS BIGINT) AS spent FROM f),
      rk AS (
        SELECT f.*, row_number() OVER (ORDER BY rem2 DESC, source)
          AS r
        FROM f)
      SELECT source, n_rows, sigma, weight,
        CAST(alloc0 + CASE WHEN r <= 200 - sp.spent THEN 1 ELSE 0 END
          AS BIGINT) AS alloc
      FROM rk, sp ORDER BY source"""),
    (s, dir) => {
      val out = graft.ops.Mixture.neymanAllocation(
        Tables.load(s, dir, "documents").filter(col("n_chars").isNotNull),
        Seq("source"), col("n_chars"), budget = 200L)
      val spent = out.agg(sum(col("alloc"))).head().getLong(0)
      require(spent == 200L, s"allocation spent $spent of 200")
      val over = out.filter(col("alloc") > col("n_rows")).count()
      require(over == 0, s"$over strata allocated beyond their rows")
      out.orderBy("source")
    })

  private val CoverK = 5

  /** DuckDB mirror of the greedy max-cover recurrence: `rounds` unrolled
    * pick/cover layers (MATERIALIZED — each layer references its parent
    * more than once). A selected doc's tokens are all covered, so it
    * self-excludes from later gains; no explicit id blacklist needed. */
  private def maxCoverSql(rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH w AS (
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          ELSE regexp_split_to_array(trim(text), '\s+') END AS w
        FROM documents),
      toks AS MATERIALIZED (
        SELECT DISTINCT doc_id, t FROM (
          SELECT doc_id, unnest(CASE WHEN len(w) < 2 THEN []
            ELSE list_transform(generate_series(1, len(w) - 1),
              i -> w[i] || ' ' || w[i + 1]) END) AS t
          FROM w)
        WHERE t <> ''),
      p1 AS MATERIALIZED (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        FROM toks GROUP BY doc_id
        ORDER BY gain DESC, doc_id LIMIT 1),
      c1 AS MATERIALIZED (
        SELECT DISTINCT t FROM toks JOIN p1 USING (doc_id))""")
    for (i <- 2 to rounds) {
      sb.append(s""",
      p$i AS MATERIALIZED (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        FROM toks WHERE t NOT IN (SELECT t FROM c${i - 1})
        GROUP BY doc_id
        ORDER BY gain DESC, doc_id LIMIT 1),
      c$i AS MATERIALIZED (
        SELECT t FROM c${i - 1}
        UNION
        SELECT t FROM toks JOIN p$i USING (doc_id))""")
    }
    sb.append(s""",
      sel AS (${(1 to rounds).map(i =>
        s"SELECT ${i - 1} AS sel_rank, doc_id, gain FROM p$i")
        .mkString("\n        UNION ALL ")})
      SELECT CAST(sel_rank AS INT) AS sel_rank, doc_id, gain,
        CAST(SUM(gain) OVER (ORDER BY sel_rank) AS BIGINT) AS covered_total
      FROM sel ORDER BY sel_rank""")
    sb.toString
  }

  /** Greedy max-coverage selection ([[graft.ops.Coverage.greedyMaxCover]])
    * over word-BIGRAM features (the 31-word synthetic vocabulary
    * saturates in one pick on unigrams; bigrams give a real greedy
    * trajectory): the k docs that jointly cover the most distinct
    * shingles, with per-round gains and the cumulative covered count —
    * all integers, so the unrolled oracle is exact end to end. */
  val smpMaxCover: Q = Q(
    "smp_max_cover",
    Some(maxCoverSql(CoverK)),
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .withColumn("__sh", graft.ops.TextOps.shingles(col("text"), 2))
      val picks = graft.ops.Coverage.greedyMaxCover(
        docs, "doc_id", "__sh", CoverK)
      require(picks.size == CoverK,
        s"coverage exhausted after ${picks.size} picks at this corpus size")
      require(picks.map(_.gain).sliding(2).forall(p =>
        p.length < 2 || p.head >= p.last),
        "greedy gains must be non-increasing (submodularity)")
      picks.map(p => (p.rank, p.id, p.gain, p.coveredTotal))
        .toDF("sel_rank", "doc_id", "gain", "covered_total")
        .orderBy("sel_rank")
    })

  /** Stride-scheduled domain interleaving
    * ([[graft.ops.Sampling.interleaveByWeight]]): sources get DYADIC
    * weights (0.5/0.25/0.125 by source index mod 3), so every virtual
    * time (r − 0.5)/w is an exact binary double — the full interleaved
    * stream hash-compares raw. The gate also asserts the stride
    * invariant the operator exists to provide: in the first 200
    * positions, each weight class's share tracks its weight share. */
  val smpInterleave: Q = Q(
    "smp_interleave_stride",
    Some("""
      WITH b AS (
        SELECT doc_id, source,
          CASE CAST(substr(source, 4) AS INT) % 3
            WHEN 0 THEN 0.5 WHEN 1 THEN 0.25 ELSE 0.125 END AS w,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(concat_ws('|', 'graft-interleave',
              CAST(doc_id AS VARCHAR))), doc_id) AS domain_rank
        FROM documents)
      SELECT doc_id, source, domain_rank,
        (domain_rank - 0.5) / w AS vt
      FROM b
      ORDER BY vt, source, doc_id"""),
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val sources = docs.select("source").distinct()
        .collect().map(_.getString(0))
      val weights = sources.map(src =>
        src -> (src.drop(3).toInt % 3 match {
          case 0 => 0.5
          case 1 => 0.25
          case _ => 0.125
        })).toMap
      val out = Sampling.interleaveByWeight(docs.select("doc_id", "source"),
        Seq("doc_id"), "source", weights)
      // stride invariant: prefix shares track weight shares (loose band —
      // integer rounding and per-domain exhaustion blur the exact ratio)
      val wTotal = sources.map(weights).sum
      val prefix = out.limit(200).collect()
      val byClass = prefix.groupBy(r => weights(r.getAs[String]("source")))
        .view.mapValues(_.length.toDouble / 200).toMap
      for ((w, share) <- byClass) {
        val expected = sources.count(weights(_) == w) * w / wTotal
        require(math.abs(share - expected) < 0.08,
          s"weight-$w class holds $share of the prefix, expected ~$expected")
      }
      out.select("doc_id", "source", "domain_rank", "vt")
    })

  /** 2-D Pareto front ([[graft.ops.Skyline.paretoFront2D]]) over orders
    * — maximize (totalprice, order recency): the rows no tradeoff
    * argument can exclude. Spark computes the front with the
    * value-level partition-offset pass (no unpartitioned window); the
    * oracle with a plain strict-predecessor window — two independent
    * formulations of the same dominance test. The gate also brute-force
    * verifies no surviving row is dominated and no excluded row is
    * undominated (on the distinct-value level). */
  val smpParetoFront: Q = Q(
    "smp_pareto_front",
    Some("""
      WITH b AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(o_orderdate AS DATE)) AS DOUBLE) AS recency
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
      g AS (SELECT price, max(recency) AS ymax FROM b GROUP BY price),
      r AS (
        SELECT price, ymax, max(ymax) OVER (ORDER BY price DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        FROM g),
      f AS (SELECT price, ymax FROM r
            WHERE prior IS NULL OR ymax > prior)
      SELECT b.o_orderkey, b.price, b.recency
      FROM b JOIN f ON b.price = f.price AND b.recency = f.ymax
      ORDER BY o_orderkey"""),
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("price"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("double").as("recency"))
      val front = graft.ops.Skyline.paretoFront2D(orders, "price", "recency")
        .select("o_orderkey", "price", "recency")
      // independent dominance check on the (price, recency) value level
      val pts = orders.filter(col("price").isNotNull &&
          col("recency").isNotNull)
        .select("price", "recency").distinct().collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      def dominated(p: (Double, Double)) = pts.exists(q =>
        q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
      val got = front.select("price", "recency").distinct().collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSet
      val wantFront = pts.filterNot(dominated).toSet
      require(got == wantFront,
        s"front mismatch: got ${got.size}, brute-force ${wantFront.size}")
      front.orderBy("o_orderkey")
    })

  /** Effective sample size of a weighted dataset
    * ([[graft.ops.Sampling.effectiveSampleSize]]) with document length
    * as the weight — the diagnostic the importance/temperature samplers
    * must report beside their estimates. The oracle replays the weight
    * folds and the Kong ratio; in-gate, ESS must sit in (0, n] (Jensen)
    * and strictly below n (lengths are not uniform). */
  val smpEss: Q = Q(
    "smp_effective_sample_size",
    Some("""
      WITH b AS (
        SELECT CAST(n_chars AS DOUBLE) AS w FROM documents
        WHERE n_chars IS NOT NULL),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(w, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sw,
          CAST(SUM(CAST(round(w * w, 12) AS DECIMAL(38,14))) AS DOUBLE)
            AS sww
        FROM b)
      SELECT n, round(sw, 6) AS sum_w,
        round(sw * sw / sww, 6) + 0.0 AS ess,
        round(sw * sw / sww / n, 6) + 0.0 AS ess_frac
      FROM a"""),
    (s, dir) => {
      val out = graft.ops.Sampling.effectiveSampleSize(
        Tables.load(s, dir, "documents"), col("n_chars"))
      val r = out.head()
      val frac = r.getAs[Double]("ess_frac")
      require(frac > 0.0 && frac < 1.0,
        s"non-uniform lengths must give 0 < ESS < n: $r")
      out
    })

  /** Mix goodness-of-fit ([[graft.ops.Sampling.mixFitTest]]) of the
    * document corpus against its own uniform 20-source recipe: the
    * synthetic corpus IS exactly uniform, so χ² must read 0 — asserted
    * in-gate; the oracle replays every round-9 term from the same
    * target literals; the χ²(k−1) p is library-only. */
  val smpMixFit: Q = {
    val srcs = (0 until 20).map(i => s"src$i")
    val tw = srcs.map(s => s"('$s', 0.05)").mkString(", ")
    Q(
      "smp_mix_fit",
      Some(s"""
        WITH tw(key, w) AS (SELECT * FROM (VALUES $tw)),
        c AS (
          SELECT CAST(source AS VARCHAR) AS key,
            CAST(count(*) AS BIGINT) AS o
          FROM documents WHERE source IS NOT NULL GROUP BY 1),
        nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
        terms AS (
          SELECT round((COALESCE(c.o, 0) - nn.n * tw.w)
            * (COALESCE(c.o, 0) - nn.n * tw.w) / (nn.n * tw.w), 9) AS term
          FROM tw LEFT JOIN c ON tw.key = c.key, nn)
        SELECT nn.n, 20 AS k,
          round(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) + 0.0
            AS chi2
        FROM terms, nn GROUP BY nn.n"""),
      (s, dir) => {
        val out = graft.ops.Sampling.mixFitTest(
          Tables.load(s, dir, "documents"), col("source"),
          srcs.map(_ -> 0.05).toMap)
        val r = out.head()
        require(r.getAs[Double]("chi2") == 0.0,
          s"the synthetic corpus is exactly uniform: $r")
        out.drop("p_value")
      })
  }

  /** Class-balanced downsample ([[graft.ops.Sampling.classBalance]]) of
    * the labeled embedding corpus — the oracle replays the min-class
    * count and the per-label (md5 identity hash, id) rank cut. */
  val smpClassBalance: Q = Q(
    "smp_class_balance",
    Some("""
      WITH b AS (
        SELECT vec_id AS id, label FROM embeddings
        WHERE vec_id IS NOT NULL AND label IS NOT NULL),
      m AS (SELECT CAST(MIN(n) AS BIGINT) AS m
        FROM (SELECT COUNT(*) AS n FROM b GROUP BY label)),
      r AS (
        SELECT id, label, row_number() OVER (PARTITION BY label
          ORDER BY md5(concat_ws('|', 'graft-bal', CAST(id AS VARCHAR))),
            id) AS rn
        FROM b)
      SELECT id, label FROM r, m WHERE rn <= m.m ORDER BY label, id"""),
    (s, dir) => {
      val out = graft.ops.Sampling.classBalance(
        Tables.load(s, dir, "embeddings"), "vec_id", "label", "graft-bal")
      val counts = out.groupBy("label").count()
        .select(col("count")).distinct().collect()
      require(counts.length == 1,
        s"every class must end at the same size, got ${counts.length}")
      out
    })

  override def queries: Seq[Q] =
    Seq(smpClassBalance,
      smpHashSplit, smpStratified, smpPack, smpMix, smpTemperature,
      smpShuffle, smpQualityTopFrac, smpKfold, smpPackSequences,
      smpWeighted, smpLeakageSafe, smpWaterFill, smpImportanceResample,
      smpNormalizedTopFrac, smpHorvitzThompson, smpNeyman, smpMaxCover,
      smpInterleave,
      smpParetoFront, smpEss, smpMixFit)
}
