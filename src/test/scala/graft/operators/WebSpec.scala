package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class WebSpec extends SparkTestBase {

  private lazy val pages = df("id BIGINT, url STRING", Seq(
    Row(1L, "https://ads.tracker.net/pixel?x=1"),
    Row(2L, "https://sub.ads.tracker.net:8443/deep/path"),
    Row(3L, "https://docs.example.org/guide"),
    Row(4L, "http://user:pw@tracker.net/login"),
    Row(5L, "ftp://files.example.org/data.bin"),
    Row(6L, "not a url at all"),
    Row(7L, null),
    Row(8L, "https://Ads.Tracker.NET/case"),          // DNS is case-insensitive
    Row(9L, "https://ads.tracker.net./fqdn"),          // trailing-dot FQDN
    Row(10L, "https://ads.tracker.net?next=@cdn.ok.org"))) // @ in a pathless query

  test("host: scheme/userinfo/port stripped; junk and null → NULL") {
    val out = pages.select(col("id"), Web.host(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1) == "ads.tracker.net")
    assert(out(2) == "sub.ads.tracker.net")
    assert(out(4) == "tracker.net")
    assert(out(5) == "files.example.org")
    assert(out(6) == null && out(7) == null)
    // normalization: lowercase, trailing dot stripped; an @ after ? stays
    // in the query (RFC 3986 ends the authority at /, ? or #)
    assert(out(8) == "ads.tracker.net")
    assert(out(9) == "ads.tracker.net")
    assert(out(10) == "ads.tracker.net")
  }

  test("domainSuffixes yields the full parent chain") {
    val s = pages.where(col("id") === 2L)
      .select(Web.domainSuffixes(Web.host(col("url"))))
      .head().getSeq[String](0)
    assert(s == Seq("sub.ads.tracker.net", "ads.tracker.net", "tracker.net", "net"))
  }

  test("blockByDomain drops exact hosts and all subdomains; unparseable URLs stay") {
    val kept = Web.blockByDomain(pages, "url", "id", Seq("tracker.net"))
      .collect().map(_.getLong(0)).toSet
    // 8/9/10 are case/FQDN-dot/query-@ spellings of tracker.net hosts —
    // all blocked
    assert(kept == Set(3L, 5L, 6L, 7L))
    // a leaf block only removes that exact host
    val leaf = Web.blockByDomain(pages, "url", "id", Seq("sub.ads.tracker.net"))
      .collect().map(_.getLong(0)).toSet
    assert(leaf == Set(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
    // blocklist entries get the same normalization as hosts
    val cased = Web.blockByDomain(pages, "url", "id", Seq("Tracker.NET."))
      .collect().map(_.getLong(0)).toSet
    assert(cased == kept)
    // empty blocklist is the identity
    assert(Web.blockByDomain(pages, "url", "id", Nil).count() == 10L)
  }

  test("blockByDomainInline equals the join formulation on every blocklist") {
    for (bl <- Seq(Seq("tracker.net"), Seq("sub.ads.tracker.net", "example.org"),
        Seq("net"), Nil)) {
      val joined = Web.blockByDomain(pages, "url", "id", bl)
        .collect().map(_.getLong(0)).toSet
      val inline = Web.blockByDomainInline(pages, "url", bl)
        .collect().map(_.getLong(0)).toSet
      assert(inline == joined, s"blocklist $bl: inline $inline vs join $joined")
    }
  }

  test("blockByDomain plans broadcast equi-joins, no nested-loop product") {
    val plan = Web.blockByDomain(pages, "url", "id", Seq("tracker.net"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("canonicalUrl: case, ports, fragments, tracking params; path case preserved") {
    import org.apache.spark.sql.functions.col
    val urls = df("id BIGINT, u STRING", Seq(
      Row(1L, "HTTP://WWW.Example.com:80/A/x?utm_campaign=z&page=2"),
      Row(2L, "https://Example.com/p?a=1&fbclid=99&b=2#sec"),
      Row(3L, "FTP://Host.Example:21/data"),      // non-http port kept
      Row(4L, "relative/path"),                   // pass-through
      Row(5L, "https://h.com/x?utm_a=1&utm_b=2"), // all params tracking
      Row(6L, "https://h.com:443/x")))
    val out = urls.select(col("id"), Web.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "http://www.example.com/A/x?page=2")
    assert(out(2L) == "https://example.com/p?a=1&b=2")
    assert(out(3L) == "ftp://host.example:21/data")
    assert(out(4L) == "relative/path")
    assert(out(5L) == "https://h.com/x")
    assert(out(6L) == "https://h.com/x")
    // dedup consequence: variant spellings of one page now hash together
    val variants = df("u STRING", Seq(
      Row("https://A.com/p?utm_source=m"), Row("HTTPS://a.com:443/p#top")))
    assert(variants.select(Web.canonicalUrl(col("u"))).distinct().count() == 1L)
  }

  test("canonicalUrl never rewrites URLs that carry no tracking params") {
    import org.apache.spark.sql.functions.col
    val odd = df("id BIGINT, u STRING", Seq(
      Row(1L, "https://h.com/p?q=a?&b=1"),      // '?' inside a query value
      Row(2L, "https://h.com/a&fbclid=1"),      // '&…' in the PATH, no query
      Row(3L, "https://h.com/p?a=1&&b=2"),      // literal double separator
      Row(4L, "https://h.com/p?"),              // bare trailing '?'
      Row(5L, "https://h.com/p?a=1&utm_x=2?y"))) // tracker value containing '?'
    val out = odd.select(col("id"), Web.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "https://h.com/p?q=a?&b=1")
    assert(out(2L) == "https://h.com/a&fbclid=1")
    assert(out(3L) == "https://h.com/p?a=1&&b=2")
    assert(out(4L) == "https://h.com/p?")
    assert(out(5L) == "https://h.com/p?a=1")
  }

  test("extractText strips blocks/tags, decodes entities one level, keeps structure") {
    import org.apache.spark.sql.functions.col
    val html = df("id BIGINT, h STRING", Seq(
      Row(1L, "<html><head><script>if (1 < 2) alert('x')</script>" +
        "<style>p { color: red }</style></head><body>" +
        "<h1>Title</h1><p>one   two</p><div>three</div>" +
        "<!-- secret --><span>four</span></body></html>"),
      Row(2L, "a &amp;amp; b &lt;i&gt;it&lt;/i&gt; &quot;q&quot; &#39;s&#39;&nbsp;z &#x2019;"),
      Row(3L, "<P CLASS='x'>upper</P><BR/>case"),
      Row(4L, "")))
    val out = html.select(col("id"), Web.extractText(col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // script/style/comment gone, block tags become line breaks, spaces collapse
    assert(out(1L) == "Title\none two\nthree\nfour")
    // one-level entity decode; numeric character references pass through
    assert(out(2L) == "a &amp; b <i>it</i> \"q\" 's' z &#x2019;")
    // tag matching is case-insensitive
    assert(out(3L) == "upper\ncase")
    assert(out(4L) == "")
  }

  test("extractLinks: both quote styles, attribute order, fragments/empties excluded") {
    import org.apache.spark.sql.functions.col
    val html = df("id BIGINT, h STRING", Seq(
      Row(1L, """<a href="http://a.com/x">1</a> <a class="z" href='/rel'>2</a>"""),
      Row(2L, """<A HREF="https://B.org">up</A><a href="#frag">skip</a>"""),
      Row(3L, """<a name="no-href">skip</a><a href="">empty skip</a>"""),
      Row(4L, "no links at all")))
    val out = html.select(col("id"), Web.extractLinks(col("h")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("http://a.com/x", "/rel"))
    assert(out(2L) == Seq("https://B.org")) // case-insensitive tag, fragment skipped
    assert(out(3L) == Nil)
    assert(out(4L) == Nil)
  }
}
