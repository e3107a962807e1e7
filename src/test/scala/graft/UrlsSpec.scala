package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Urls

/** [[Urls]] — canonicalization and registered-domain extraction against
  * hand-written messy-URL fixtures (each case targets one rule).
  */
class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalize: case, www, default port, tracking params, fragment") {
    assert(canon(
      "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&id=3#frag") ===
      Seq("https://news.example.com/a/b?id=3"))
  }

  test("canonicalize: non-default port kept, root path rendered /") {
    assert(canon("http://site.com:8080/") === Seq("http://site.com:8080/"))
    assert(canon("http://example.com:80") === Seq("http://example.com/"))
    assert(canon("https://example.com") === Seq("https://example.com/"))
  }

  test("canonicalize: every tracking param stripped, query dropped when emptied") {
    assert(canon("https://a.co.uk/x?utm_a=1&utm_b=2") ===
      Seq("https://a.co.uk/x"))
    // multi-match strip with separator repair, non-tracking params survive
    assert(canon("http://x.com/p?a=1&fbclid=zz&b=2") ===
      Seq("http://x.com/p?a=1&b=2"))
    assert(canon("http://x.com/p?gclid=1&a=2") ===
      Seq("http://x.com/p?a=2"))
  }

  test("canonicalize: path case and param order are preserved (contract)") {
    assert(canon("http://x.com/CaseSensitive/Path?b=2&a=1") ===
      Seq("http://x.com/CaseSensitive/Path?b=2&a=1"))
  }

  test("host and registeredDomain: public-suffix stub and plain TLDs") {
    val rows = Seq(
      "https://WWW.a.blog.example.CO.UK:443/x",
      "http://deep.sub.test.org/y",
      "http://single.com/z").toDF("u")
      .select(Urls.host(col("u")).as("h"))
      .withColumn("d", Urls.registeredDomain(col("h")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      ("a.blog.example.co.uk", "example.co.uk"),
      ("deep.sub.test.org", "test.org"),
      ("single.com", "single.com")))
  }

  test("registeredDomain: hosts below two labels pass through") {
    val d = Seq("localhost").toDF("h")
      .select(Urls.registeredDomain(col("h"))).head().getString(0)
    assert(d === "localhost")
  }
}
