package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
  * the MOSS algorithm; public): hash every k-character gram of a
  * document, slide a w-gram window, and keep each window's minimal hash
  * (rightmost on ties). Guarantees: any shared substring of length
  * ≥ k + w − 1 produces at least one SHARED fingerprint, and the
  * selected density is ~2/(w+1) of all grams — position-robust overlap
  * detection that survives insertions/reorderings which break whole-doc
  * fingerprints, and catches partial containment that document-level
  * MinHash ([[Dedup]]) dilutes away.
  *
  * Cross-engine: gram hashes are the portable 32-bit md5 prefix of the
  * raw k-gram (character-based substring — both engines index code
  * points), and the rightmost-min rule is a lexicographic struct min on
  * (hash, −position), so DuckDB rebuilds the exact fingerprint set via a
  * window row_number. Selection is a pure doc-local array expression —
  * ONE narrow codegen'd map, no explode before the final fingerprint
  * rows, no shuffle; the only shuffled rows are the selected
  * fingerprints (~2/(w+1) of grams), ids+hashes only.
  */
object Winnow {

  /** Distinct winnowing fingerprints per document: (idCol, h, p) rows
    * where h is the selected gram hash and p its 0-based code-point
    * offset. Documents shorter than k have no grams and emit nothing;
    * documents with fewer than w grams get a single window over all
    * their grams (the standard boundary rule). Selection runs through
    * the native [[graft.functions.WinnowFingerprints]] expression — the
    * compositional nested-transform form computed identical output
    * interpreted at ~300 µs/gram (measured 14 s at sf0.1; the native
    * pass is the same plan shape minus the HOF tax). */
  def fingerprints(df0: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    // the O(n·w) per-document expression is pure map work — widen a
    // compact input so it parallelizes (graft.core.Parallelism)
    val df = graft.core.Parallelism.widen(
      df0.select(col(idCol), col(textCol)))
    val spark = df.sparkSession
    val fname = s"graft_winnow_${k}_$w"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => graft.functions.WinnowFingerprints(exprs.head, k, w),
      "built-in")
    df.filter(length(col(textCol)) >= k)
      .select(col(idCol),
        explode(call_function(fname, col(textCol).cast("string")))
          .as("__fp"))
      .select(col(idCol), col("__fp.h").as("h"), col("__fp.p").as("p"))
  }

  /** Document pairs sharing at least `minShared` distinct fingerprint
    * hashes, with the shared count — the winnowing overlap join. Join is
    * on fingerprint hash with the posting-list cap `maxPostings`
    * (hashes appearing in more than that many documents are boilerplate
    * for THIS corpus and are dropped — the same recall trade the naive
    * shingle join documents; raise it to keep ubiquitous content).
    * Output (id_a, id_b, shared) with id_a < id_b. */
  def overlapPairs(fps: DataFrame, idCol: String, minShared: Int = 2,
      maxPostings: Int = 64): DataFrame = {
    require(minShared >= 1 && maxPostings >= 2,
      s"bad minShared=$minShared maxPostings=$maxPostings")
    val dfp = fps.select(col(idCol).as("__id"), col("h")).distinct()
    val keep = dfp.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxPostings)
      .select("h")
    val posted = dfp.join(keep, Seq("h"))
    posted.select(col("h"), col("__id").as("id_a"))
      .join(posted.select(col("h"), col("__id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
