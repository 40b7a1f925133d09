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

  test("attributes and uppercase tags strip; whitespace collapses") {
    assert(extract(
      "<DIV CLASS=\"x\">a</DIV>\n\n  <a href='u'>b</a>\t c") ===
      Seq("a b c"))
  }
}
