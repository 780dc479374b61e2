package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.ops.{TextOps, UrlOps}
import org.apache.spark.sql.functions._

/** URL canonicalization + per-domain rollup gate entries
  * ([[graft.ops.UrlOps]]). The corpus tables carry no URL column, so both
  * engines derive the SAME deterministic URL per document from `doc_id`
  * (CASE over doc_id % 6 — each branch exercises one canonicalization
  * feature: mixed-case scheme/host, default ports, fragments, tracking
  * runs, multi-part public suffixes, tracking-only query strings), then
  * canonicalize independently: Spark through the codegen'd regexp Columns,
  * DuckDB through its own RE2 regexp functions. Differential testing of
  * the chain, not of a shared implementation.
  */
object UrlQueries extends QueryModule {

  /** The six synthetic URL shapes, Spark side. */
  private[queries] def urlCol = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(6))
    when(m === 0, concat(lit("HTTP://WWW.Example.COM:80/p/"), id,
        lit("?utm_source=news&id="), id, lit("#top")))
      .when(m === 1, concat(lit("https://News.Site.co.uk:443/a/"), id,
        lit("?gclid=XyZ&q=spark")))
      .when(m === 2, concat(lit("http://sub.shop.example.com/item?id="), id,
        lit("&utm_campaign=sale&utm_term=x&keep=1")))
      .when(m === 3, lit("https://example.org/?fbclid=abc123"))
      .when(m === 4, concat(lit("http://Archive.Example.NET:8080/x/"), id,
        lit("#frag")))
      .otherwise(concat(lit("https://data.GOV.UK/dataset/"), id,
        lit("?utm_medium=m&utm_term=t")))
  }

  /** The same six shapes, DuckDB side. */
  private[queries] val urlSql =
    """CASE CAST(doc_id % 6 AS INT)
       WHEN 0 THEN 'HTTP://WWW.Example.COM:80/p/' || CAST(doc_id AS VARCHAR)
         || '?utm_source=news&id=' || CAST(doc_id AS VARCHAR) || '#top'
       WHEN 1 THEN 'https://News.Site.co.uk:443/a/' || CAST(doc_id AS VARCHAR)
         || '?gclid=XyZ&q=spark'
       WHEN 2 THEN 'http://sub.shop.example.com/item?id='
         || CAST(doc_id AS VARCHAR) || '&utm_campaign=sale&utm_term=x&keep=1'
       WHEN 3 THEN 'https://example.org/?fbclid=abc123'
       WHEN 4 THEN 'http://Archive.Example.NET:8080/x/'
         || CAST(doc_id AS VARCHAR) || '#frag'
       ELSE 'https://data.GOV.UK/dataset/' || CAST(doc_id AS VARCHAR)
         || '?utm_medium=m&utm_term=t' END"""

  /** DuckDB mirror of the canonicalization chain over column `url`. */
  private[queries] val canonSql = {
    val track = UrlOps.TrackingParamPattern
    s"""regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               CASE WHEN regexp_extract(nofrag,
                   '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) <> ''
                 THEN lower(regexp_extract(nofrag,
                     '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                   || regexp_replace(nofrag,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
                 ELSE nofrag END,
               '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2'),
             '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2'),
           '([?&])(($track)=[^&#]*(&|$$))+', '\\1', 'g'),
         '[?&]+$$', '')"""
  }

  private[queries] val multiSql =
    UrlOps.MultiPartSuffixes.map(_.replace(".", "\\.")).mkString("|")

  val txtUrlCanonical: Q = Q(
    "txt_url_canonical",
    Some(s"""
      WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
      nf AS (SELECT doc_id, url,
               regexp_replace(url, '#.*$$', '') AS nofrag FROM u),
      c AS (SELECT doc_id, url, $canonSql AS canonical_url FROM nf),
      h AS (SELECT doc_id, url, canonical_url,
              CASE WHEN regexp_extract(canonical_url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1) <> ''
                THEN lower(regexp_extract(canonical_url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                ELSE NULL END AS host
            FROM c)
      SELECT doc_id, url, canonical_url, host,
        CASE WHEN host IS NULL THEN NULL
             WHEN regexp_extract(host, '([^.]+\\.($multiSql))$$', 1) <> ''
               THEN regexp_extract(host, '([^.]+\\.($multiSql))$$', 1)
             WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) <> ''
               THEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
             ELSE host END AS domain
      FROM h
      ORDER BY doc_id"""),
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val canon = UrlOps.canonicalUrl(col("url"))
      d.select(col("doc_id"), urlCol.as("url"))
        .withColumn("canonical_url", canon)
        .withColumn("host", UrlOps.host(col("canonical_url")))
        .withColumn("domain", UrlOps.registrableDomain(col("host")))
        .orderBy("doc_id")
    })

  val txtDomainRollup: Q = Q(
    "txt_domain_rollup",
    Some {
      val enList = TextOps.LangMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""
      WITH u AS (SELECT doc_id, text, $urlSql AS url FROM documents),
      nf AS (SELECT doc_id, text,
               regexp_replace(url, '#.*$$', '') AS nofrag FROM u),
      c AS (SELECT doc_id, text, $canonSql AS canonical_url FROM nf),
      h AS (SELECT doc_id, text,
              lower(regexp_extract(canonical_url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
            FROM c),
      d AS (SELECT doc_id, text,
              CASE WHEN regexp_extract(host, '([^.]+\\.($multiSql))$$', 1) <> ''
                     THEN regexp_extract(host, '([^.]+\\.($multiSql))$$', 1)
                   WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) <> ''
                     THEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
                   ELSE host END AS domain,
              CASE WHEN length(trim(text)) = 0 THEN []
                   ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
            FROM h)
      SELECT domain, count(*) AS n_docs,
        ROUND(CAST(SUM(CAST(ROUND(0.3 * least(1.0, len(w) / 100.0)
          + 0.4 * (CASE WHEN len(w) = 0 THEN 0.0
              ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END)
          + 0.3 * (CASE WHEN len(w) = 0 THEN 0.0
              ELSE CAST(len(list_filter(w, t -> t IN ($enList))) AS DOUBLE)
                / len(w) END), 6) AS DECIMAL(18,6))) AS DOUBLE)
          / count(*), 6) AS mean_quality,
        CAST(SUM(len(w)) AS BIGINT) AS n_tokens
      FROM d
      GROUP BY domain
      ORDER BY domain"""
    },
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      UrlOps.domainQualityRollup(
          d.withColumn("url", urlCol), "url", "text")
        .orderBy("domain")
    })

  /** PSL-table registrable domains ([[UrlOps.registrableDomainByTable]]):
    * both engines derive the same synthetic hosts, resolve them against
    * the same 5-rule suffix table (longest-match + suffix-plus-one-label,
    * bare suffixes null, unlisted TLDs fall to the `*` default of last
    * two labels) — Spark via candidate-explode + broadcast join over
    * DISTINCT hosts, DuckDB via an independent UNNEST/MIN CTE chain. */
  val txtDomainPsl: Q = Q(
    "txt_domain_psl",
    Some("""
      WITH d AS (SELECT doc_id,
        CASE CAST(doc_id % 6 AS INT)
          WHEN 0 THEN 'a' || CAST(doc_id AS VARCHAR) || '.b.site.co.uk'
          WHEN 1 THEN 'www.example' || CAST(doc_id AS VARCHAR) || '.com'
          WHEN 2 THEN 'data.gov.uk'
          WHEN 3 THEN 'node' || CAST(doc_id AS VARCHAR) || '.cluster.internal'
          WHEN 4 THEN 'localhost'
          ELSE 'co.uk' END AS host
        FROM documents),
      sfx(suffix) AS (VALUES ('co.uk'), ('gov.uk'), ('com'), ('uk'), ('org')),
      lab AS (SELECT DISTINCT host FROM d),
      cand AS (SELECT host, u.i AS s,
                 array_to_string(string_split(host, '.')[u.i:], '.') AS cand
               FROM lab, UNNEST(range(1, len(string_split(host, '.')) + 1)) AS u(i)),
      m AS (SELECT host, MIN(s) AS suf_start
            FROM cand JOIN sfx ON cand.cand = sfx.suffix GROUP BY host)
      SELECT d.doc_id, d.host,
        CASE WHEN m.suf_start > 1
               THEN array_to_string(string_split(d.host, '.')[m.suf_start - 1:], '.')
             WHEN m.suf_start = 1 THEN NULL
             WHEN len(string_split(d.host, '.')) >= 2
               THEN array_to_string(string_split(d.host, '.')[-2:], '.')
             ELSE NULL END AS domain
      FROM d LEFT JOIN m USING (host)
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val m = pmod(col("doc_id"), lit(6))
      val host = when(m === 0, concat(lit("a"), id, lit(".b.site.co.uk")))
        .when(m === 1, concat(lit("www.example"), id, lit(".com")))
        .when(m === 2, lit("data.gov.uk"))
        .when(m === 3, concat(lit("node"), id, lit(".cluster.internal")))
        .when(m === 4, lit("localhost"))
        .otherwise(lit("co.uk"))
      val hosts = d.select(col("doc_id"), host.as("host"))
      val sfx = Seq("co.uk", "gov.uk", "com", "uk", "org").toDF("suffix")
      val mapping = UrlOps.registrableDomainByTable(hosts, "host", sfx)
      hosts.join(mapping, Seq("host"), "left")
        .select(col("doc_id"), col("host"), col("domain"))
        .orderBy("doc_id")
    })

  override def queries: Seq[Q] =
    Seq(txtUrlCanonical, txtDomainRollup, txtDomainPsl)
}
