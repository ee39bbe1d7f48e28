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
}
