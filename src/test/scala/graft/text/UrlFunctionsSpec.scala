package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlFunctionsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case, default ports, fragments, tracking params, trailing slashes") {
    assert(canon(
      "HTTPS://Example.COM:443/a/b/?utm_campaign=x&b=2&a=1#frag",
      "http://example.com:80/",
      "https://example.com/a?fbclid=1&gclid=2&ref=3&utm_x=4",
      "https://example.com/a//") === Seq(
      "https://example.com/a/b?a=1&b=2",
      "http://example.com",
      "https://example.com/a",
      "https://example.com/a"))
  }

  test("non-default ports and unknown schemes are preserved") {
    assert(canon(
      "https://example.com:8443/x",
      "http://example.com:443/x",
      "ftp://Example.com:80/x") === Seq(
      "https://example.com:8443/x",
      "http://example.com:443/x",
      "ftp://example.com:80/x"))
  }

  test("query param order is canonical and empty queries drop the separator") {
    assert(canon(
      "https://example.com/x?z=1&y=2&a=3",
      "https://example.com/x?utm_source=only") === Seq(
      "https://example.com/x?a=3&y=2&z=1",
      "https://example.com/x"))
  }

  test("canonicalHost strips default ports per scheme") {
    import spark.implicits._
    val hosts = Seq("https://A.B.com:443/x", "http://a.b.com:8080/x")
      .toDF("url")
      .select(UrlFunctions.canonicalHost(col("url"))).collect().map(_.getString(0))
    assert(hosts.toSeq === Seq("a.b.com", "a.b.com:8080"))
  }
}
