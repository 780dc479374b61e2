package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{Quantize, Similarity}
import org.apache.spark.sql.functions._

/** Scalar-quantization gates ([[graft.ops.Quantize]]).
  *
  * Every number in the code/error tables is engine-portable by
  * construction (exact min/max, single IEEE ops, round-half-up on
  * non-negative quotients — see the operator scaladoc), so `qz_codes`
  * and `qz_reconstruction_error` hash-compare the FULL 500 × 64 grid
  * against DuckDB rebuilding the quantizer from the same formula; the
  * end-to-end retrieval contract (top-k recall after 4× compression)
  * is self-asserted in `qz_recall`, where no SQL mirror exists.
  */
object QuantizeQueries extends QueryModule {

  private val Dim = 64
  private val Bits = 8

  /** DuckDB mirror of the full quantizer: per-dim min/max ranges over the
    * same vectors, then the identical clamp(round((x−lo)/step)) per cell. */
  private val codesPrelude = s"""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = $Dim),
      ii AS (SELECT CAST(unnest(range($Dim)) AS INT) AS i),
      x AS (SELECT vec_id, ii.i, e[ii.i + 1] AS x FROM v, ii),
      r AS (SELECT i, min(x) AS lo, max(x) AS hi FROM x GROUP BY i),
      c AS (
        SELECT x.vec_id, x.i, x.x, r.lo, r.hi,
          CASE WHEN r.hi = r.lo THEN 0
            ELSE CAST(least(greatest(
              round((x.x - r.lo) / ((r.hi - r.lo) / 255.0)), 0.0), 255.0)
              AS INT) END AS code
        FROM x JOIN r USING (i))"""

  /** Full long-form int8 code grid: both engines fit the same per-dim
    * affine quantizer and must agree on every one of the 32,000 codes. */
  val codes: Q = Q(
    "qz_codes",
    Some(codesPrelude + """
      SELECT vec_id, i, code FROM c
      ORDER BY vec_id, i"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val (lo, hi) = Quantize.collectRanges(
        Quantize.ranges(embs, "embedding", Dim), Dim)
      Quantize.encode(embs, "embedding", lo, hi, Bits)
        .select(col("vec_id"), posexplode(col("code")).as(Seq("i", "code")))
        .orderBy("vec_id", "i")
    })

  /** Per-dimension reconstruction error of the fitted quantizer —
    * decimal-folded MSE and the exact max abs error, every row rebuilt
    * by DuckDB through the same decode formula. */
  val reconstructionError: Q = Q(
    "qz_reconstruction_error",
    Some(codesPrelude + """,
      d AS (
        SELECT i, x,
          CASE WHEN hi = lo THEN lo
            ELSE lo + CAST(code AS DOUBLE) * ((hi - lo) / 255.0) END AS xd
        FROM c)
      SELECT i, CAST(count(*) AS BIGINT) AS n,
        round(CAST(SUM(CAST(round((x - xd) * (x - xd), 12)
            AS DECIMAL(38,12))) AS DOUBLE) / count(*), 12) AS mse,
        max(abs(x - xd)) AS max_abs_err
      FROM d GROUP BY i
      ORDER BY i"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val (lo, hi) = Quantize.collectRanges(
        Quantize.ranges(embs, "embedding", Dim), Dim)
      Quantize.reconstructionError(embs, "embedding", lo, hi, Bits)
        .orderBy("i")
    })

  /** End-to-end retrieval contract — PROMOTED to FULLY oracle-checked
    * (r17): unlike the hash-based ANN gates, the int8 path is
    * deterministic arithmetic end to end, so DuckDB rebuilds the WHOLE
    * experiment — the quantizer (the qz_codes mirror), the dequantized
    * vectors, brute-force cosine top-10 over BOTH corpora, and the
    * hit-count join — and the emitted recall@10 is an exact-value
    * match, not a pinned verdict. The ≥ 0.8 floor stays loud
    * in-gate. */
  val recall: Q = Q(
    "qz_recall",
    Some(codesPrelude + s""",
      d AS (
        SELECT vec_id, i,
          CASE WHEN hi = lo THEN lo
            ELSE lo + CAST(code AS DOUBLE) * ((hi - lo) / 255.0) END AS xd
        FROM c),
      dv AS (SELECT vec_id, list(xd ORDER BY i) AS e FROM d GROUP BY vec_id),
      qx AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 20),
      sx AS (
        SELECT qid, v.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM qx, v WHERE v.vec_id != qid),
      rx AS (SELECT qid, nid,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM sx),
      ex AS (SELECT qid, nid FROM rx WHERE rank <= 10),
      qd AS (SELECT vec_id AS qid, e AS qe FROM dv WHERE vec_id < 20),
      sd AS (
        SELECT qid, dv.vec_id AS nid,
          list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(qe, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
        FROM qd, dv WHERE dv.vec_id != qid),
      rd AS (SELECT qid, nid,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        FROM sd),
      ax AS (SELECT qid, nid FROM rd WHERE rank <= 10),
      hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
               FROM ex JOIN ax USING (qid, nid)),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex)
      SELECT 'int8' AS method,
        (SELECT CAST(count(*) AS BIGINT) FROM qx) AS n_queries,
        tot.n_exact, hits.n_hits,
        round(CAST(hits.n_hits AS DOUBLE) / tot.n_exact, 6) + 0.0
          AS recall_at_10
      FROM hits, tot"""),
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val (lo, hi) = Quantize.collectRanges(
        Quantize.ranges(embs, "embedding", Dim), Dim)
      val qFilter = col("vec_id") < 20
      val k = 10
      val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
        qFilter, k).select("qid", "nid")
      val deq = Quantize.decode(
        Quantize.encode(embs, "embedding", lo, hi, Bits), "code",
        lo, hi, Bits, "dec").select(col("vec_id"), col("dec"))
      val approx = Similarity.bruteForceTopK(deq, "vec_id", "dec", qFilter, k)
        .select("qid", "nid")
      val nQueries = exact.select("qid").distinct().count()
      val nExact = exact.count()
      val hits = exact.join(approx, Seq("qid", "nid")).count()
      val recall = hits.toDouble / nExact
      require(recall >= 0.8,
        s"int8 recall@10 collapsed to $recall — quantizer broken")
      import s.implicits._
      Seq(("int8", nQueries, nExact, hits,
          BigDecimal(recall).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble + 0.0))
        .toDF("method", "n_queries", "n_exact", "n_hits", "recall_at_10")
    })

  override def queries: Seq[Q] = Seq(codes, reconstructionError, recall)
}
