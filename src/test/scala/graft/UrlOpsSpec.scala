package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.zipWithIndex.toDF("u", "i").orderBy("i")
      .select(UrlOps.canonicalUrl(col("u"))).as[String].collect().toSeq

  test("canonicalUrl: case, default ports, fragments, tracking params") {
    val out = canon(
      "HTTP://WWW.Example.COM:80/Path/X?utm_source=a&id=7#frag",
      "https://News.Site.co.uk:443/a?gclid=X&q=1",
      "http://h.example.com/p?id=3&utm_a=1&utm_b=2&fbclid=z",
      "https://example.org/?fbclid=abc",
      "http://Example.NET:8080/x#y",
      "http://example.com:800/x",
      "https://example.com:80/x")
    assert(out == Seq(
      // authority lowers, :80 drops, fragment + tracking go, Path case kept
      "http://www.example.com/Path/X?id=7",
      "https://news.site.co.uk/a?q=1",
      // a RUN of tracking params collapses; dangling separator strips
      "http://h.example.com/p?id=3",
      // tracking-only query leaves a clean bare path
      "https://example.org/",
      // non-default port survives; fragment goes
      "http://example.net:8080/x",
      // :800 is not :80 — the port regex must not prefix-match
      "http://example.com:800/x",
      // :80 on httpS is not the default — stays
      "https://example.com:80/x"))
  }

  test("canonicalUrl: tracking name inside a VALUE survives; scheme-less passes through") {
    val out = canon(
      "http://a.com/p?next=utm_source%3Dx&id=1",
      "relative/path?utm_source=x",
      "HTTP://UPPER.COM/KEEP?utm_x=1&Keep=V")
    assert(out(0) == "http://a.com/p?next=utm_source%3Dx&id=1")
    // no scheme: authority lowering skipped, tracking still stripped
    assert(out(1) == "relative/path")
    assert(out(2) == "http://upper.com/KEEP?Keep=V")
  }

  test("host and registrableDomain: multi-part suffixes, single labels, nulls") {
    val cases = Seq(
      "https://a.b.site.co.uk/x" -> ("a.b.site.co.uk", "site.co.uk"),
      "http://www.example.com/" -> ("www.example.com", "example.com"),
      "http://data.gov.uk/d" -> ("data.gov.uk", "data.gov.uk"),
      "http://localhost:9000/x" -> ("localhost", "localhost"),
      "no-scheme.example.com/x" -> (null, null))
    val df = cases.map(_._1).zipWithIndex.toDF("u", "i")
    val got = df.orderBy("i")
      .select(UrlOps.host(col("u")).as("h"),
        UrlOps.registrableDomain(UrlOps.host(col("u"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == cases.map(_._2))
  }

  test("registrableDomainByTable: longest suffix wins, bare suffixes null, * default") {
    val sfx = Seq("co.uk", "gov.uk", "com", "uk", "org").toDF("suffix")
    val cases = Seq(
      // 'a.b.site.co.uk' matches both 'uk' and 'co.uk' — longest wins
      "a.b.site.co.uk" -> "site.co.uk",
      "www.example.com" -> "example.com",
      // host = suffix + 1 label exactly
      "data.gov.uk" -> "data.gov.uk",
      // host IS a listed suffix → no registrable domain
      "co.uk" -> null,
      // no rule matches → implicit * default: last two labels
      "node.cluster.internal" -> "cluster.internal",
      // single label, no rule → null
      "localhost" -> null)
    val hosts = cases.map(_._1).toDF("host")
    val got = UrlOps.registrableDomainByTable(hosts, "host", sfx)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((h, want) <- cases) assert(got(h) == want, s"$h -> ${got(h)}, want $want")
  }

  test("canonicalUrl is idempotent over a URL-shaped fuzz battery") {
    val rnd = new scala.util.Random(42) // seeded: failures reproduce
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = (0 until 300).map { _ =>
      val scheme = pick(Seq("http://", "HTTPS://", "HtTp://", ""))
      val host = pick(Seq("Example.COM", "a.b.site.co.uk", "localhost",
        "x-y.example.org", "WWW.Shop.NET"))
      val port = pick(Seq("", ":80", ":443", ":8080"))
      val path = pick(Seq("", "/", "/A/b", "/p%20q", "/trail/"))
      val params = (0 until rnd.nextInt(4)).map(_ =>
        pick(Seq("utm_source=a", "utm_a=", "gclid=Z", "id=7", "q=x+y",
          "next=utm_x%3D1", "fbclid=f")))
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#utm_source=x"))
      s"$scheme$host$port$path$query$frag"
    }
    val df = urls.zipWithIndex.toDF("u", "i")
    val twice = df.orderBy("i").select(
      UrlOps.canonicalUrl(col("u")).as("once"),
      UrlOps.canonicalUrl(UrlOps.canonicalUrl(col("u"))).as("twice"))
      .collect()
    for (r <- twice)
      assert(r.getString(0) == r.getString(1),
        s"not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'")
  }

  test("domainQualityRollup groups by canonical registrable domain") {
    val df = Seq(
      ("HTTP://WWW.Shop.COM:80/a?utm_x=1", "the quick fox"),
      ("http://sub.shop.com/b", "a b c d"),
      ("https://Other.ORG/c#f", "x y z")).toDF("url", "text")
    val r = UrlOps.domainQualityRollup(df, "url", "text")
      .orderBy("domain").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("other.org", "shop.com"))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(r.forall(x => x.getDouble(2) > 0 && x.getLong(3) > 0))
  }
}
