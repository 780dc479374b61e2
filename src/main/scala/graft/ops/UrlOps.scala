package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/host canonicalization for web-crawl pipelines — the normalization
  * every crawl dedup and per-domain quality rollup depends on (two fetches
  * of one page must canonicalize to one key before [[Dedup]] sees them).
  *
  * All pure `Column` regexp expressions (codegen'd, no UDFs), RE2-safe
  * (no lookarounds/backrefs in patterns) so the DuckDB oracle in
  * [[graft.queries.UrlQueries]] mirrors them byte-for-byte. Steps and
  * their order:
  *
  *  1. strip the fragment (`#...`)
  *  1. lowercase scheme + authority (path/query case is significant, so
  *     only the prefix up to the first `/`, `?` or `#` lowers)
  *  1. drop default ports (`http://…:80`, `https://…:443`)
  *  1. remove tracking query params (utm_*, gclid, fbclid, msclkid,
  *     mc_eid, igshid) — one scan: a run of consecutive tracking params
  *     collapses to its leading separator, then dangling `?`/`&` strip
  *  1. (documented non-goals: no IDN/percent-encoding normalization, no
  *     IPv6 authority, no path dot-segment resolution — each is a
  *     deterministic extension of the same regexp chain)
  *
  * Registrable-domain extraction uses an explicit multi-part-suffix
  * alternation (co.uk, com.au, …) — the honest heuristic core of the
  * public-suffix list; a production system swaps in the full PSL as a
  * broadcast table keyed on the longest matching suffix, same plan shape.
  */
object UrlOps {

  /** Query params that identify campaigns/clicks, not content. */
  val TrackingParamPattern: String =
    "utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid"

  /** Multi-part public suffixes recognized by [[registrableDomain]]. */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.mx",
    "com.cn", "com.sg")

  private val schemeAuthority = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  /** Everything before the first `#` (URLs are single-line by RFC 3986). */
  def stripFragment(c: Column): Column = regexp_replace(c, "#.*$", "")

  /** Lowercased scheme+authority, rest untouched; scheme-less input passes
    * through unchanged. */
  def lowerSchemeAuthority(c: Column): Column = {
    val prefix = regexp_extract(c, schemeAuthority, 1)
    val rest = regexp_replace(c, schemeAuthority, "")
    when(length(prefix) > 0, concat(lower(prefix), rest)).otherwise(c)
  }

  /** Drop `:80` on http and `:443` on https authorities. Non-participating
    * trailing group substitutes as "" in both Java and RE2 replacement. */
  def stripDefaultPort(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")

  /** Remove tracking params. A run of consecutive tracking params (with
    * its internal separators) matches as ONE region and is replaced by its
    * leading `?`/`&`; a then-dangling trailing separator strips. A
    * tracking-looking name embedded inside a VALUE (`?next=utm_x%3D1`) is
    * not preceded by a separator and never matches. */
  def stripTrackingParams(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        s"([?&])(($TrackingParamPattern)=[^&#]*(&|$$))+", "$1"),
      "[?&]+$", "")

  /** Full canonicalization chain (see object doc for step order). */
  def canonicalUrl(c: Column): Column =
    stripTrackingParams(stripDefaultPort(lowerSchemeAuthority(stripFragment(c))))

  /** Lowercased host (authority minus port/userinfo‑free form); null when
    * the input has no `scheme://host` prefix. */
  def host(c: Column): Column = {
    val h = lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    when(length(h) > 0, h)
  }

  /** Registrable domain of a HOST column: last two labels, or last three
    * when the trailing two are a known multi-part suffix; single-label
    * hosts (localhost, intranet names) pass through. */
  def registrableDomain(h: Column): Column = {
    val multi = MultiPartSuffixes.map(_.replace(".", "\\.")).mkString("|")
    val m3 = regexp_extract(h, s"([^.]+\\.($multi))$$", 1)
    val m2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(h.isNull, lit(null).cast("string"))
      .when(length(m3) > 0, m3)
      .when(length(m2) > 0, m2)
      .otherwise(h)
  }

  /** Registrable domain against a PROVIDED suffix table — the full
    * public-suffix-list path the regex heuristic [[registrableDomain]]
    * documents (plug the ~10k-rule PSL in as a DataFrame with one
    * `suffix` column). PSL semantics: the longest listed suffix matching
    * a host's trailing labels wins, and the registrable domain is that
    * suffix plus one label; a host that IS a listed suffix has no
    * registrable domain (null); a host matching NO rule falls to the
    * implicit `*` default — last two labels (single-label hosts → null).
    *
    * Returns the (host, domain) mapping for the DISTINCT hosts of the
    * input — domain resolution is per-host, not per-row, so the explode
    * (≤ label-count candidates per host) and the broadcast suffix join
    * run over host cardinality (~10^8 web-scale), never corpus row count;
    * callers join the mapping back (broadcast when it fits). */
  def registrableDomainByTable(
      hosts: DataFrame, hostCol: String, suffixes: DataFrame,
      suffixCol: String = "suffix"): DataFrame = {
    val h = hosts.where(col(hostCol).isNotNull)
      .select(col(hostCol).as("host")).distinct()
    def labels = split(col("host"), "\\.")
    val cand = h.select(col("host"),
        posexplode(transform(sequence(lit(1), size(labels)),
          i => concat_ws(".", slice(labels, i, size(labels))))))
      .select(col("host"), (col("pos") + 1).as("s"), col("col").as("cand"))
    val matched = cand
      .join(broadcast(suffixes.select(col(suffixCol).as("cand"))), "cand")
      .groupBy("host").agg(min(col("s")).as("__suf_start"))
    h.join(matched, Seq("host"), "left")
      .withColumn("domain",
        when(col("__suf_start") > 1,
          concat_ws(".", slice(labels, col("__suf_start") - 1, size(labels))))
          .when(col("__suf_start") === 1, lit(null).cast("string"))
          .otherwise(when(size(labels) >= 2,
            concat_ws(".", slice(labels, size(labels) - 1, lit(2))))))
      .drop("__suf_start")
  }

  /** Per-registrable-domain quality rollup — the aggregation feeding the
    * existing per-domain ops ([[graft.stats.Drift.psiByGroup]] drift,
    * [[Sampling.temperatureSample]] mixing): document count, mean
    * composite quality, token volume. One groupBy on a derived key; the
    * domain cardinality is web-host-sized (millions), far below row count,
    * so the shuffle is the small side of the pipeline. */
  def domainQualityRollup(
      df: DataFrame, urlCol: String, textCol: String,
      roundTo: Int = 6): DataFrame =
    df.groupBy(registrableDomain(host(canonicalUrl(col(urlCol)))).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        // per-row round → exact decimal sum → one double division: the mean
        // is bit-identical in any engine/partition order (a double avg()
        // would drift in its last bits with summation order)
        round(
          sum(round(TextOps.qualityScore(col(textCol)), roundTo)
            .cast("decimal(18,6)")).cast("double") / count(lit(1)),
          roundTo).as("mean_quality"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
}
