package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(payload: String) = Seq(payload).toDF("p")

  test("http split: status, headers (case-insensitive, param-stripped), body") {
    val p = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "X-Custom: hello\r\n" +
      "\r\n" +
      "<html>body text</html>"
    val row = one(p).select(
      Web.httpStatus(col("p")).as("status"),
      Web.httpHeader(col("p"), "content-type").as("ct"),
      Web.httpHeader(col("p"), "x-custom").as("xc"),
      Web.httpHeader(col("p"), "missing").as("miss"),
      Web.httpBody(col("p")).as("body")).head()
    assert(row.getInt(0) == 200)
    assert(row.getString(1) == "text/html")
    assert(row.getString(2) == "hello")
    assert(row.isNullAt(3))
    assert(row.getString(4) == "<html>body text</html>")
  }

  test("http split survives non-HTTP and headerless payloads") {
    val rows = Seq("just plain text, no protocol",
        "HTTP/1.0 404 Not Found\r\nServer: x\r\n\r\n")
      .toDF("p")
      .select(Web.httpStatus(col("p")), Web.httpBody(col("p"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(0).getString(1) == "") // no CRLFCRLF -> empty body
    assert(rows(1).getInt(0) == 404)
    assert(rows(1).getString(1) == "") // empty body after headers
  }

  test("html strip: blocks out, tags out, entities decoded, whitespace collapsed") {
    val html = """<html><head><title>T</title>
      |<style type="text/css">body { color: red }</style>
      |<script>var x = "<p>not text</p>";</script>
      |</head><body>
      |<!-- a comment with <b>tags</b> -->
      |<h1>Header</h1>
      |<p>first &amp; second &lt;third&gt;, &quot;quoted&quot; &#39;q&#39;&nbsp;end</p>
      |</body></html>""".stripMargin
    val got = one(html).select(Web.stripHtml(col("p"))).as[String].head()
    assert(got == "T Header first & second <third>, \"quoted\" 'q' end")
  }

  test("script/style bodies never leak, double-encoded entities stay text") {
    val html = "<script>if (a < b && c > d) alert('leak')</script>" +
      "<p>&amp;lt; stays literal</p>"
    val got = one(html).select(Web.stripHtml(col("p"))).as[String].head()
    assert(got == "&lt; stays literal")
  }

  test("url parts: scheme/host across case, userinfo, ports, non-urls") {
    val rows = Seq(
      "HTTPS://User:Pw@WWW.Example.COM:8443/Path?q=1#frag",
      "http://example.org",
      "not a url at all").toDF("u")
      .select(Web.urlScheme(col("u")), Web.urlHost(col("u"))).collect()
    assert(rows(0).getString(0) == "https")
    assert(rows(0).getString(1) == "www.example.com")
    assert(rows(1).getString(0) == "http")
    assert(rows(1).getString(1) == "example.org")
    assert(rows(2).getString(0) == "")
    assert(rows(2).getString(1) == "")
  }

  test("registrable domain honors multi-label suffixes and degenerate hosts") {
    val cases = Seq(
      "www.example.co.uk" -> "example.co.uk",
      "a.b.example.com" -> "example.com",
      "example.com" -> "example.com",
      "deep.sub.project.github.io" -> "project.github.io",
      "co.uk" -> "co.uk", // a bare suffix registers nothing below it
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("PSL rules: wildcard and exception rules the compact subset gets wrong") {
    // the published grammar's canonical hard cases (*.ck / !www.ck),
    // plus a comment line, an inline annotation, and a normal 2-label rule
    val psl =
      """// ===BEGIN ICANN DOMAINS===
        |com
        |uk
        |co.uk
        |ck
        |*.ck
        |!www.ck
        |jp
        |""".stripMargin
    val cases = Seq(
      // wildcard: every <label>.ck is a public suffix...
      "a.b.test.ck" -> "b.test.ck",
      "test.ck" -> "test.ck",       // IS a public suffix -> itself (repo convention)
      // ...except www.ck, carved back out by the exception rule
      "www.ck" -> "www.ck",
      "www.www.ck" -> "www.ck",
      "foo.www.ck" -> "www.ck",
      // normal rules still work alongside
      "www.example.co.uk" -> "example.co.uk",
      "a.b.example.com" -> "example.com",
      // unlisted TLD falls to the implicit default rule `*`
      "example.xyz" -> "example.xyz",
      "sub.example.xyz" -> "example.xyz",
      // case + trailing dot normalization — INCLUDING the
      // host-is-a-public-suffix path, which must return the normalized
      // form, not the raw input (equal domains -> equal dedup keys)
      "WWW.Example.COM." -> "example.com",
      "Test.CK." -> "test.ck",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("h")
      .select(Web.registrableDomainPsl(col("h"), psl)).as[String].collect()
    got.zip(cases).foreach { case (g, (h, w)) => assert(g == w, s"$h: $g != $w") }
    // the compact subset really does get the ck cases wrong (the reason
    // this operator exists): *.ck is not expressible there
    val subset = cases.take(1).map(_._1).toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect()
    assert(subset.head == "test.ck") // wrong answer without the PSL
  }

  test("url normalize: case, default ports, fragments, tracking params, param order") {
    val cases = Seq(
      // default https port dropped, host lowered, fragment dropped,
      // utm/fbclid stripped, params sorted
      "HTTPS://WWW.Ex.COM:443/a/b?utm_source=tw&b=2&a=1&fbclid=xyz#sec"
        -> "https://www.ex.com/a/b?a=1&b=2",
      // non-default port kept; empty path becomes /
      "http://ex.com:8080?z=1" -> "http://ex.com:8080/?z=1",
      // nothing but tracking params -> no query at all
      "http://ex.com/p?utm_campaign=x&gclid=1" -> "http://ex.com/p",
      // equal resources, different param order -> equal keys
      "http://ex.com/p?b=2&a=1" -> "http://ex.com/p?a=1&b=2")
    val got = cases.map(_._1).toDF("u")
      .select(Web.urlNormalize(col("u"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("url ops survive pathological inputs without throwing") {
    val nasty = Seq(
      "", "://", "http://", "https://:8080", "http://@/",
      "ftp://user@host.com:21/file", "http://[::1]:8080/v6",
      "https://example.com#only-fragment",
      "https://example.com?&&&", "https://example.com?=v&k=",
      "a" * 2000, "http://" + "b" * 500 + ".com",
      "https://exa mple.com/space", "https://example.com/%2e%2e/up")
    // the contract under garbage: never throw, never return null for
    // non-null input — parse what matches, empty-string what doesn't
    val rows = nasty.toDF("u").select(
      Web.urlScheme(col("u")), Web.urlHost(col("u")),
      Web.registrableDomain(Web.urlHost(col("u"))),
      Web.urlNormalize(col("u"))).collect()
    rows.foreach { r => (0 until 4).foreach(i => assert(!r.isNullAt(i))) }
    // spot checks: empty-query forms normalize without trailing '?'
    val norm = nasty.toDF("u").select(Web.urlNormalize(col("u")))
      .as[String].collect()
    assert(norm(nasty.indexOf("https://example.com?&&&")) ==
      "https://example.com/")
    assert(norm(nasty.indexOf("https://example.com#only-fragment")) ==
      "https://example.com/")
    // degenerate ipv6 bracket form: host keeps the bracket text, no port
    // confusion crash (full ipv6 support is out of contract, documented
    // by this pin)
    assert(!norm(nasty.indexOf("http://[::1]:8080/v6")).contains("8080/v6/v6"))
  }

  test("end-to-end: warc response payload -> http body -> text") {
    val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>the real content</p></body></html>"
    val got = one(payload).select(
      Web.stripHtml(Web.httpBody(col("p")))).as[String].head()
    assert(got == "the real content")
  }

  test("extractLinks: quote styles, attribute case, document order; non-href attrs ignored") {
    val html = """<a href="https://a.com/x">1</a>""" +
      """<img src="https://ignored.com/i.png">""" +
      """<link HREF='http://b.org/style.css'>""" +
      """<a href = "/relative">2</a>""" +
      """<a data-href="https://not-an-href.com">3</a>""" +
      """<area Href='mailto:x@y.z'>"""
    val links = Seq(html).toDF("h")
      .select(Web.extractLinks(col("h"))).as[Seq[String]].head()
    // data-href is NOT an href (the lookbehind rejects attribute names
    // that merely end in "href"); mailto/relative ARE extracted — the
    // scheme policy belongs to the caller (linkGraph filters them)
    assert(links == Seq("https://a.com/x", "http://b.org/style.css",
      "/relative", "mailto:x@y.z"))
  }

  test("robotsAllowed: groups, agent precedence, wildcard/$ patterns, longest-match, tie->allow") {
    val robots =
      """# corpus crawler policy
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/press/
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /tmp/
        |Allow: /tmp/keep$
        |Disallow: /*.pdf$
        |Disallow:
        |Sitemap: https://x.com/sitemap.xml
        |""".stripMargin
    def verdict(path: String, agent: String): Boolean =
      Seq((robots, path)).toDF("r", "p")
        .select(Web.robotsAllowed(col("r"), col("p"), agent))
        .as[Boolean].head()
    // exact-agent group wins: the * group's /private/ rule is IGNORED
    // for graftbot (RFC 9309 §2.2.1)
    assert(verdict("/private/x", "graftbot"))
    assert(!verdict("/private/x", "strangerbot"))
    // * group: longest match flips back to allow under /private/press/
    assert(verdict("/private/press/a", "strangerbot"))
    // graftbot rules (stacked UA lines bind both agents)
    assert(!verdict("/tmp/x", "graftbot"))
    assert(!verdict("/tmp/x", "OTHERBOT")) // case-insensitive token
    assert(verdict("/tmp/keep", "graftbot"))   // $-anchored allow, longer
    assert(!verdict("/tmp/keepX", "graftbot")) // anchor must hold
    assert(!verdict("/docs/a.pdf", "graftbot")) // * wildcard + $ anchor
    assert(verdict("/docs/a.pdf.html", "graftbot"))
    assert(verdict("/anything", "graftbot")) // empty Disallow: no rule
    // equal-length allow/disallow tie resolves to allow
    val tie = "User-agent: *\nDisallow: /a/\nAllow: /a*\n"
    val tied = Seq((tie, "/a/")).toDF("r", "p")
      .select(Web.robotsAllowed(col("r"), col("p"), "graftbot"))
      .as[Boolean].head()
    assert(tied) // "/a/" (3) vs "/a*" (3): tie -> allow
    // no robots rules at all -> allowed
    assert(Seq(("", "/x")).toDF("r", "p")
      .select(Web.robotsAllowed(col("r"), col("p"), "graftbot"))
      .as[Boolean].head())
  }

  test("robotsCrawlDelay: group-resolved, exact shadows star, first value wins, absent -> null") {
    def delay(robots: String, agent: String): Option[Double] = {
      val r = Seq(robots).toDF("r")
        .select(Web.robotsCrawlDelay(col("r"), agent)).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val robots =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Crawl-delay: 7
        |Disallow: /x/
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    // exact group's FIRST delay binds graftbot; * delay binds others
    assert(delay(robots, "graftbot").contains(2.5))
    assert(delay(robots, "otherbot").contains(10.0))
    // exact group without a delay SHADOWS the * group's (group
    // resolution, not fallback)
    val noExactDelay = "User-agent: graftbot\nDisallow: /x/\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(delay(noExactDelay, "graftbot").isEmpty)
    // absent everywhere, malformed values ignored
    assert(delay("User-agent: *\nDisallow: /x/\n", "graftbot").isEmpty)
    assert(delay("User-agent: *\nCrawl-delay: soon\n", "graftbot").isEmpty)
  }

  test("linkGraph: absolute http(s) only, eTLD+1 aggregation, self-edges kept, counts correct") {
    val psl = "com\nuk\nco.uk\n"
    val pages = Seq(
      ("https://www.me.com/p1",
        """<a href="https://a.site.com/x">.</a>""" +
          """<a href="http://b.site.com/y">.</a>""" +        // same eTLD+1 -> n=2
          """<a href="https://www.example.co.uk/z">.</a>""" +
          """<a href="/rel">.</a>""" +                        // relative: no edge
          """<a href="mailto:a@b.c">.</a>""" +                // non-http: no edge
          """<a href="ftp://files.site.com/f">.</a>"""),      // non-http: no edge
      ("https://sub.me.com/p2",
        """<a href="https://me.com/self">.</a>""")            // self-edge at eTLD+1
    ).toDF("url", "html")
    val edges = Web.linkGraph(pages, "url", "html", psl)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("me.com", "site.com", 2L),
      ("me.com", "example.co.uk", 1L),
      ("me.com", "me.com", 1L)))
  }
}
