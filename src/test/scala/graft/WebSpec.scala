package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** URL/domain screening — including the messy-URL semantics (ports,
  * userinfo, query strings, fragments) the clean-URL oracle query can't
  * exercise.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  test("urlFeatures parses messy URLs: port, query, fragment, userinfo") {
    val out = Web.urlFeatures(Seq(
      ("a", "https://Sub.News.Example.com:8443/World/us/story.html?id=1#top"),
      ("b", "http://user:pw@example.org/path//x/"),
      ("c", "https://example.net"),
      ("d", "https://example.net/?q=2")
    ).toDF("id", "url"))
      .select("id", "host", "registered_domain", "path_depth", "is_https")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
      .toMap

    // port, query, and fragment are stripped; host is lowercased
    out("a") shouldBe (("sub.news.example.com", "example.com", 3L, true))
    // userinfo stripped; empty path segments don't count toward depth
    out("b") shouldBe (("example.org", "example.org", 2L, false))
    // no path at all -> depth 0
    out("c") shouldBe (("example.net", "example.net", 0L, true))
    // query-only path -> depth 0
    out("d") shouldBe (("example.net", "example.net", 0L, true))
  }

  test("single-label host yields empty registered_domain, not a crash") {
    val out = Web.urlFeatures(Seq(("a", "http://localhost/x")).toDF("id", "url"))
      .select("registered_domain").head.getString(0)
    out shouldBe ""
  }

  test("domainScreen blocks by registered domain across subdomains") {
    val docs = Seq(
      (1L, "https://a.bad.com/x"),
      (2L, "https://b.bad.com/y"),
      (3L, "https://a.good.com/z")
    ).toDF("doc_id", "url")
    val out = Web.domainScreen(docs, Seq("bad.com"))
      .select("doc_id", "blocked").as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> true, 3L -> false)
  }

  test("domainStats aggregates docs and distinct hosts per domain") {
    val docs = Seq(
      (1L, "https://a.bad.com/x"),
      (2L, "https://b.bad.com/y"),
      (3L, "https://b.bad.com/z"),
      (4L, "https://www.good.com/w")
    ).toDF("doc_id", "url")
    val out = Web.domainStats(docs, Seq("bad.com"))
      .select("registered_domain", "blocked", "n_docs", "n_hosts")
      .as[(String, Boolean, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("bad.com") shouldBe (("bad.com", true, 3L, 2L))
    out("good.com") shouldBe (("good.com", false, 1L, 1L))
  }

  test("canonicalUrl: case, ports, tracking params, order, slash, fragment") {
    val canon = Seq(
      ("a", "HTTPS://WWW.Example.COM:443/Docs/?b=2&utm_source=tw&a=1#frag"),
      ("b", "https://www.example.com/Docs?a=1&b=2"),
      ("c", "https://www.example.com:8443/Docs?a=1&b=2"), // non-default port kept
      ("d", "http://example.org:80"),                      // empty path -> "/"
      ("e", "http://example.org/?utm_campaign=x&gclid=1&fbclid=2&ref=h")
    ).toDF("id", "url")
      .select(col("id"), Web.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    canon("a") shouldBe "https://www.example.com/Docs?a=1&b=2"
    canon("b") shouldBe "https://www.example.com/Docs?a=1&b=2"
    canon("c") shouldBe "https://www.example.com:8443/Docs?a=1&b=2"
    canon("d") shouldBe "http://example.org/"
    canon("e") shouldBe "http://example.org/"
  }

  test("canonicalUrlDedup groups cosmetic variants under the lowest doc_id") {
    val out = Web.canonicalUrlDedup(Seq(
      (10L, "https://www.example.com/x?b=2&a=1"),
      (11L, "HTTPS://WWW.EXAMPLE.COM:443/x/?utm_source=s&a=1&b=2#f"),
      (12L, "https://www.example.com/y")
    ).toDF("doc_id", "url"))
      .orderBy("keep_id")
      .as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("https://www.example.com/x?a=1&b=2", 10L, 2L),
      ("https://www.example.com/y", 12L, 1L))
  }

  test("urlFeatures is a pure projection: no shuffle in the plan") {
    val docs = tables.documents.withColumn("url",
      concat(lit("https://"), col("source"), lit(".example.com/"),
        col("doc_id")))
    plan(Web.urlFeatures(docs)) should not include "Exchange"
  }
}
