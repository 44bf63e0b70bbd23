package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-corpus curation: URL → host extraction and domain blocklisting —
 * the C4-style cleanup a crawl-derived corpus runs before anything else
 * (drop documents from listed domains, including all their subdomains).
 *
 * Host parsing is a single portable regex (RE2- and Java-compatible, so
 * the DuckDB oracle states the same pattern) rather than a URL library:
 * scheme://host[:port]/… with userinfo tolerated. Blocklisting matches
 * the host's DOMAIN-SUFFIX CHAIN (`a.b.c` is blocked by `a.b.c`, `b.c`,
 * or `c`), the semantics of real blocklists.
 *
 * Scale shape: the suffix chain of a host is bounded by its label count
 * (≤ ~10), so [[blockByDomain]] explodes each row into a handful of
 * (id, suffix) pairs, BROADCAST hash semi-joins them against the
 * blocklist, and anti-joins the hit ids back — every join is an
 * equi-join. The tempting one-step formulation
 * `anti-join ON array_contains(suffixes, blocked)` is a nested-loop
 * product (|corpus| × |blocklist| comparisons) and is exactly what this
 * operator avoids.
 */
object Web {

  /** Host of a URL, NULL when `url` has no `scheme://host` shape; strips
    * port and userinfo, lowercases (DNS names are case-insensitive) and
    * drops a trailing-dot FQDN marker. The userinfo group excludes
    * `?`/`#` as well as `/` — RFC 3986 ends the authority at any of
    * them, so an `@` in a pathless URL's query can't steal the host. */
  def host(url: Column): Column =
    regexp_replace(
      lower(nullif(regexp_extract(url,
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1), lit(""))),
      "\\.$", "")

  /** All dot-suffixes of a host: a.b.c → [a.b.c, b.c, c]; NULL host →
    * NULL (propagates through transform, kept by [[blockByDomain]]). */
  def domainSuffixes(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /**
   * Drop every row whose URL's host falls under a blocked domain
   * (exact host or any parent domain). `idCol` must be unique per row —
   * it carries the verdict back from the exploded suffix join. Rows
   * whose URL has no parseable host are KEPT (they're not on any list).
   */
  def blockByDomain(df: DataFrame, urlCol: String, idCol: String,
                    blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = broadcast(normalizeList(blocked).toDF("__blocked"))
    val hits = df
      .select(col(idCol), explode_outer(domainSuffixes(host(col(urlCol)))).as("__sfx"))
      .join(bl, col("__sfx") === col("__blocked"), "left_semi")
      .select(idCol)
      .distinct()
    df.join(hits, Seq(idCol), "left_anti")
  }

  /** Per-row blocked verdict — NULL when the URL has no parseable host. */
  def isBlocked(url: Column, blocked: Seq[String]): Column =
    arrays_overlap(domainSuffixes(host(url)), typedlit(normalizeList(blocked)))

  /** Blocklist entries get the same normalization as extracted hosts. */
  private def normalizeList(blocked: Seq[String]): Seq[String] =
    blocked.map(b => b.toLowerCase.stripSuffix("."))

  /**
   * Join-free variant of [[blockByDomain]]: the blocklist ships as a
   * literal array and each row answers for itself — a pure filter, so it
   * applies UNCHANGED to a stream (the join formulation's hit set is
   * stream-derived, and stream-stream anti-joins aren't a thing).
   * Right for lists up to ~10k domains (≤ label-count × |list| string
   * compares per row); beyond that, the exploded-join form with its
   * broadcast hash table wins — same trade as Decontaminate's semi-join.
   */
  def blockByDomainInline(df: DataFrame, urlCol: String,
                          blocked: Seq[String]): DataFrame =
    df.where(!coalesce(isBlocked(col(urlCol), blocked), lit(false)))

  /**
   * Canonical URL normalization — the dedup-prep pass that makes "the
   * same page" hash the same: drop the fragment, lowercase scheme and
   * authority (DNS is case-insensitive; the PATH stays case-sensitive),
   * strip the scheme's default port (:80/:443), and remove the common
   * tracking parameters (utm_*, fbclid, gclid, mc_cid/mc_eid) with
   * separator cleanup. Non-absolute inputs pass through unchanged.
   * Pure regex chain in the portable Java/RE2 subset (the oracle states
   * the same chain — only the backreference spelling differs, `$1`
   * vs `\1`).
   */
  def canonicalUrl(url: Column): Column = {
    val u2 = regexp_replace(url, "(?s)#.*$", "")
    val scheme = lower(regexp_extract(u2, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(u2, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val rest = regexp_extract(u2,
      "(?s)^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    // Tracking-param removal touches ONLY the query (after the first `?`)
    // and each pattern consumes its own separator, so a URL with no
    // tracking params comes through byte-identical — a `&` in a path or a
    // stray `?` inside a query value must not be rewritten (canonicalUrl
    // is a dedup key; over-normalizing merges distinct pages). Three
    // separator cases, no lookaround (RE2 has none): `&p=v` anywhere,
    // `?p=v&` at the front (keeps `?`), `?p=v` alone (drops `?`).
    val trackers = "utm_[A-Za-z0-9_]+|fbclid|gclid|mc_cid|mc_eid"
    val path = regexp_extract(rest, "(?s)^([^?]*)", 1)
    val query = regexp_extract(rest, "(?s)^[^?]*(\\?.*)$", 1)
    val cleanedQuery = regexp_replace(regexp_replace(regexp_replace(query,
      s"&(?:$trackers)=[^&]*", ""),
      s"^\\?(?:$trackers)=[^&]*&", "?"),
      s"^\\?(?:$trackers)=[^&]*$$", "")
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), authNoPort, path, cleanedQuery))
  }

  /**
   * HTML → text extraction: strip script/style/comment blocks, turn
   * block-level tags into newlines (paragraph structure feeds the
   * line-level operators — [[Lines]], quality line fractions), drop the
   * remaining tags, decode the named XML entities (+&nbsp;), and collapse
   * runs of whitespace. Numeric character references (&#x2019;) pass
   * through untouched — decoding them needs a real parser, and a corpus
   * pass that guesses gets mojibake; they are rare enough to leave to the
   * quality filter.
   *
   * Every step is a codegen'd `regexp_replace`/`replace` over one row —
   * no shuffle, no UDF — and each pattern is written in the common
   * Java-regex/RE2 subset so the DuckDB oracle can state the identical
   * chain. Entity decode runs AFTER tag removal (`&lt;script&gt;` in text
   * must not become a live tag) and `&amp;` decodes last (double-encoded
   * entities resolve one level, the HTML rule).
   */
  /**
   * All `<a href>` targets of an HTML page, in document order — the
   * edge-list extractor for crawl-graph work (outlink counts, host
   * graphs, PageRank over [[graft.operators.Graph]]). Matches double-
   * OR single-quoted hrefs; fragment-only links (`#top`) and empty
   * hrefs are excluded (they aren't navigation). One codegen'd
   * `regexp_extract_all`, no shuffle; the pattern lives in the common
   * Java-regex/RE2 subset so the DuckDB oracle states it verbatim.
   */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a\\s[^>]*href\\s*=\\s*[\"']([^\"'#>][^\"'>]*)[\"']"), lit(1))

  def extractText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", ""),
      "(?s)<!--.*?-->", "")
    val structural = regexp_replace(noBlocks,
      "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>", "\n")
    val noTags = regexp_replace(structural, "<[^>]*>", "")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        call_function("replace", c, lit(from), lit(to)) }
    // trim() strips spaces only, so edge newlines (a leading block tag)
    // need their own pass after the \n+ collapse.
    regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \\t]+", " "),
      " ?\\n ?", "\n"),
      "\\n+", "\n")),
      "^\\n|\\n$", "")
  }
}
