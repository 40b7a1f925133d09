package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(htmls: String*): Seq[String] =
    htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html").orderBy("id")
      .select(HtmlExtract.extractText(col("html")))
      .collect().map(_.getString(0)).toSeq

  test("script/style/comment bodies vanish, including markup inside them") {
    assert(extract(
      "<p>keep</p><script>var a = \"<b>no</b>\";</script><p>this</p>",
      "<style>p > span { color: red }</style>word",
      "before<!-- a <i>hidden</i> note -->after") === Seq(
      "keep this", "word", "before after"))
  }

  test("multiple script blocks each close lazily (no greedy overrun)") {
    assert(extract(
      "<script>a</script>ALIVE<script>b</script>") === Seq("ALIVE"))
  }

  test("entities decode once, &amp; last (no double decode)") {
    assert(extract(
      "a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;b &amp; c",
      "literal &amp;lt; stays") === Seq(
      "a <tag> \"q\" 's' b & c",
      "literal &lt; stays"))
  }

  test("anchors: absolute canonicalized, relative surfaced, markup stripped") {
    val html = "<a href=\"HTTP://WWW.Example.COM/a/?utm_source=x\">" +
      "<b>bold</b> &amp; text</a><a href=\"/rel\">r</a>" +
      "<a class=\"x\" href=\"https://other.org/p\" id=\"y\">two</a>"
    val out = HtmlExtract.anchors(Seq((1L, html)).toDF("id", "html"),
        "id", "html")
      .collect().map(r => (r.getString(1), r.getBoolean(2),
        Option(r.getString(3)), r.getString(4)))
    assert(out.length === 3)
    assert(out(0) === (("HTTP://WWW.Example.COM/a/?utm_source=x", true,
      Some("http://example.com/a"), "bold & text")))
    assert(out(1) === (("/rel", false, None, "r")))
    assert(out(2)._3 === Some("https://other.org/p"))
  }

  test("pageMeta: title/description fold entities; canonical canonicalizes") {
    val html = "<html><head><title>A &amp; B</title>" +
      "<meta name=\"description\" content=\"C &quot;D&quot;\">" +
      "<link rel=\"canonical\" href=\"https://www.Example.com/x/\">" +
      "</head><body></body></html>"
    val r = HtmlExtract.pageMeta(Seq((1L, html)).toDF("id", "html"),
      "id", "html").collect()(0)
    assert(r.getString(1) === "A & B")
    assert(r.getString(2) === "C \"D\"")
    assert(r.getString(4) === "https://example.com/x")
    // no canonical -> null
    val r2 = HtmlExtract.pageMeta(
      Seq((1L, "<title>t</title>")).toDF("id", "html"), "id", "html")
      .collect()(0)
    assert(r2.isNullAt(4))
  }

  test("attributes and uppercase tags strip; whitespace collapses") {
    assert(extract(
      "<DIV CLASS=\"x\">a</DIV>\n\n  <a href='u'>b</a>\t c") ===
      Seq("a b c"))
  }
}
