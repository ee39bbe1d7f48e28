package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.urlHost]] / [[TextAnalysis.urlDomain]] /
  * [[TextAnalysis.domainStats]] / [[TextAnalysis.filterByDomainBlocklist]]
  * — the crawl-side domain battery.
  */
class DomainSpec extends SparkSpec {
  import spark.implicits._

  test("urlHost strips scheme-default ports and www prefixes; urlDomain keeps last two labels") {
    val rows = Seq(
      "https://WWW.Sub.Example.com:443/p",   // default port + www
      "http://example.com:8080/x",           // NON-default port kept
      "https://www.www.deep.co.uk/",         // repeated www; PSL boundary
      "ftp://Host.Org:443/f",                // non-http scheme: port kept
      "http://Example0.com./x",              // FQDN trailing dot: SAME host,
                                             // must not bypass a blocklist
      "not a url").toDF("url")
      .select(TextAnalysis.urlHost(col("url")).as("h"),
        TextAnalysis.urlDomain(col("url")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("sub.example.com", "example.com"),
      // non-default port kept (a distinct origin), rides along in the domain
      ("example.com:8080", "example.com:8080"),
      ("deep.co.uk", "co.uk"), // last-two-labels heuristic, needs PSL for eTLD+1
      ("host.org:443", "host.org:443"),
      ("example0.com", "example0.com"), // trailing dot stripped
      ("", "")))
  }

  test("domainStats counts docs and tokens per domain; blocklist anti-join drops exactly its hits") {
    val docs = Seq(
      (1L, "https://a.example.com/x", "one two three"),
      (2L, "https://b.example.com/y", "four five"),
      (3L, "http://bad.site.org/z", "six"),
      (4L, "plain text", "seven eight")
    ).toDF("doc_id", "url", "text")
    val stats = TextAnalysis.domainStats(docs, "url", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats == Map(
      "example.com" -> ((2L, 5L)), "site.org" -> ((1L, 1L)), "" -> ((1L, 2L))))

    val bl = Seq("site.org", "never.seen").toDF("domain")
    val kept = TextAnalysis.filterByDomainBlocklist(docs, "url", bl)
    assert(kept.columns.toSeq == Seq("doc_id", "url", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("registrableDomain follows PSL semantics where last-two-labels breaks") {
    val cases = Seq(
      // multi-label exact suffixes: eTLD+1 keeps THREE labels
      "https://www.shop.co.uk/p" -> "shop.co.uk",
      "http://a.b.news.com.au/" -> "news.com.au",
      // exact suffix equal to the whole host: no registrable domain
      "http://co.uk/" -> "",
      // wildcard *.ck: any label under ck is itself a public suffix
      "https://thing.b.ck/x" -> "thing.b.ck",
      // exception !city.kobe.jp prevails over *.kobe.jp
      "http://deep.sub.city.kobe.jp/" -> "city.kobe.jp",
      "http://city.kobe.jp/" -> "city.kobe.jp",
      // sibling WITHOUT the exception stays under the wildcard
      "http://a.other.kobe.jp/" -> "a.other.kobe.jp",
      // unknown TLD falls to the implicit `*` rule
      "https://blog.foo.example/post" -> "foo.example",
      "https://plain.com/" -> "plain.com",
      // IPv4 literal, single label, and non-URL: none
      "https://203.0.113.7/x" -> "",
      "http://localhost/" -> "",
      "not a url" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.registrableDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2),
      cases.map(_._1).zip(got).mkString("; "))
  }

  test("domainStatsPsl aggregates by registrable domain, not by label count") {
    val docs = Seq(
      (1L, "https://a.shop.co.uk/x", "one two"),
      (2L, "https://b.shop.co.uk/y", "three"),
      (3L, "https://other.co.uk/z", "four five six")
    ).toDF("doc_id", "url", "text")
    val stats = TextAnalysis.domainStatsPsl(docs, "url", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // last-two-labels would have collapsed all three into one 'co.uk' row
    assert(stats == Map(
      "shop.co.uk" -> ((2L, 3L)), "other.co.uk" -> ((1L, 3L))))
  }

  test("PslRules.fromRules parses published-list syntax and a custom list overrides the default") {
    val custom = graft.functions.PslRules.fromRules(Seq(
      "// comment line", "", "mytld", "*.wild.mytld", "!except.wild.mytld"))
    assert(custom.exact == Set("mytld") &&
      custom.wildcard == Set("wild.mytld") &&
      custom.exception == Set("except.wild.mytld"))
    val got = Seq("http://a.b.wild.mytld/", "http://x.except.wild.mytld/")
      .toDF("url")
      .select(TextAnalysis.registrableDomain(col("url"), custom).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("a.b.wild.mytld", "except.wild.mytld"))
  }
}
