package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cp(codes: Int*): String = codes.map(_.toChar).mkString

  private def norm(texts: String*): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").orderBy("id")
      .select(TextNormalize.normalize(org.apache.spark.sql.functions
        .col("text")))
      .collect().map(_.getString(0)).toSeq

  test("typographic quotes, dashes and guillemets fold to ASCII") {
    assert(norm(
      cp(0x201C) + "hi" + cp(0x201D) + " " + cp(0x2018) + "yo" +
        cp(0x2019),
      "a" + cp(0x2013) + "b" + cp(0x2014) + "c" + cp(0x2015) + "d",
      cp(0x00AB) + "q" + cp(0x00BB)) === Seq(
      "\"hi\" 'yo'", "a-b-c-d", "\"q\""))
  }

  test("invisibles delete; exotic spaces and runs collapse; ellipsis expands") {
    assert(norm(
      "a" + cp(0x200B) + "b" + cp(0xFEFF) + "c" + cp(0x00AD) + "d",
      "x" + cp(0x00A0) + "y" + cp(0x3000) + "z",
      "  lots   of\t\nspace  ",
      "wait" + cp(0x2026)) === Seq(
      "abcd", "x y z", "lots of space", "wait..."))
  }

  test("already-clean ASCII is a fixed point (changed = false)") {
    val out = TextNormalize.stats(
        Seq((1L, "plain ascii text."), (2L, "a" + cp(0x2014) + "b"))
          .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(5)))).toMap
    assert(out(1L) === (("plain ascii text.", false)))
    assert(out(2L) === (("a-b", true)))
  }

  test("invisible count is exact") {
    val out = TextNormalize.stats(
        Seq((1L, "a" + cp(0x200B, 0x200C, 0x200D, 0xFEFF, 0x00AD) + "b"))
          .toDF("id", "text"), "id", "text")
      .collect()(0)
    assert(out.getLong(4) === 5L)
    assert(out.getString(1) === "ab")
  }
}
