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

  /** End-to-end retrieval contract: brute-force cosine top-10 over the
    * DEQUANTIZED int8 corpus vs the exact top-10 over raw doubles —
    * recall@10 must survive 4× compression (the property the operator
    * exists to provide; self-asserted, no SQL mirror for the top-k). */
  val recall: Q = Q(
    "qz_recall",
    None,
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
      val hits = exact.join(approx, Seq("qid", "nid")).count()
      val recall = hits.toDouble / exact.count()
      require(recall >= 0.8,
        s"int8 recall@10 collapsed to $recall — quantizer broken")
      import s.implicits._
      Seq(("int8", math.rint(recall * 1000) / 1000))
        .toDF("method", "recall_at_10").orderBy("method")
    })

  override def queries: Seq[Q] = Seq(codes, reconstructionError, recall)
}
