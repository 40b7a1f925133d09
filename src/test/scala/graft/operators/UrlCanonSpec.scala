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

  test("outlink extraction: case-insensitive scheme, canonicalized targets") {
    val docs = Seq(
      (1L, "intro HTTP://WWW.Example.COM/a/ and https://example.com/a?utm_source=z end"),
      (2L, "no links here"))
      .toDF("id", "text")
    val links = UrlCanon.extractOutlinks(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(links.length === 2)
    // schemes survive (distinct canonicals) but casing/www/tracking
    // fold away; both point at the one canonical host
    assert(links.map(_._2).toSet ===
      Set("http://example.com/a", "https://example.com/a"))
    assert(links.map(_._3).distinct.toSeq === Seq("example.com"))
  }

  test("url rules: longest prefix wins, no match defaults allowed") {
    val urls = Seq(
      (1L, "http://example.com/a/b/c"), // /a disallow, /a/b re-allow
      (2L, "http://example.com/about"), // /a prefix-matches 'about'!
      (3L, "http://example.com/zzz"),   // no rule
      (4L, "http://other.org/a/b"))     // host without rules
      .toDF("id", "url")
    val rules = Seq(
      ("example.com", "/a", false),
      ("example.com", "/a/b", true)).toDF("host", "path_prefix", "allow")
    val out = UrlCanon.applyUrlRules(urls, "id", "url", rules)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(3)), r.getBoolean(4)))).toMap
    assert(out(1L) === ((Some("/a/b"), true)))
    assert(out(2L) === ((Some("/a"), false))) // robots prefix semantics
    assert(out(3L) === ((None, true)))
    assert(out(4L) === ((None, true)))
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
