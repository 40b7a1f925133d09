package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url").orderBy("id")
      .select(UrlCanon.canonicalize(col("url")))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host lowering, www and default-port stripping") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a/b",
      "https://www.example.com:443/a/b",
      "https://example.com:8080/a/b",
      "http://example.com:443/a/b") === Seq(
      "http://example.com/a/b",
      "https://example.com/a/b",
      "https://example.com:8080/a/b", // non-default port survives
      "http://example.com:443/a/b")) // :443 is NOT http's default
  }

  test("path normalization: empty -> /, trailing slash stripped off non-root") {
    assert(canon(
      "http://example.com",
      "http://example.com/",
      "http://example.com/a/b/",
      "http://example.com/a/b") === Seq(
      "http://example.com/",
      "http://example.com/",
      "http://example.com/a/b",
      "http://example.com/a/b"))
  }

  test("tracking params dropped, survivors sorted, fragment dropped") {
    assert(canon(
      "http://example.com/p?utm_source=x&b=2&a=1#frag",
      "http://example.com/p?b=2&a=1",
      "http://example.com/p?gclid=zz",
      "http://example.com/p?fbclid=1&utm_medium=m&ref=r") === Seq(
      "http://example.com/p?a=1&b=2",
      "http://example.com/p?a=1&b=2",
      "http://example.com/p",
      "http://example.com/p"))
  }

  test("query without path attaches to root") {
    assert(canon("http://example.com?b=2&a=1") ===
      Seq("http://example.com/?a=1&b=2"))
  }

  test("hostStats collapses variants per canonical host") {
    val df = Seq(
      (1L, "http://www.example.com/a/", 10L),
      (2L, "HTTP://Example.COM:80/a", 20L),
      (3L, "http://example.com/a?utm_source=x", 30L),
      (4L, "https://other.org/x", 5L)
    ).toDF("id", "url", "w")
    val out = UrlCanon.hostStats(df, "url", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // three raw variants of example.com collapse to ONE canonical url
    assert(out("example.com") === ((3L, 3L, 1L, 60L)))
    assert(out("other.org") === ((1L, 1L, 1L, 5L)))
  }
}
