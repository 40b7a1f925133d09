package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RepeatedSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a 10-token passage planted in docs 1 and 2; doc 3 is clean
  private val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  private def docs = Seq(
    (1L, s"one two three $passage tail1 tail2"),
    (2L, s"$passage closing words here now extra"),
    (3L, "totally different text with no shared passage at all ok")
  ).toDF("doc_id", "text")

  test("planted shared passage becomes one maximal span per doc") {
    val spans = RepeatedSpans.repeatedSpans(docs, "doc_id", "text",
        k = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
      .sortBy(_._1)
    // doc 1: passage occupies tokens [3, 13) → flagged 8-gram starts
    // at 3..5 merge into one span [3, 13); doc 2: [0, 10)
    assert(spans.toSeq === Seq((1L, 3, 13, 3L), (2L, 0, 10, 3L)))
  }

  test("gap > k splits spans; gap = k merges") {
    // two copies of an 8-token phrase separated by exactly 8 tokens of
    // unique filler in doc 10 → flagged starts at 0 and 16: gap 16 > 8
    // splits; doc 11 has them back-to-back → starts 0 and 8: gap 8 merges
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val df = Seq(
      (10L, s"$p f1 f2 f3 f4 f5 f6 f7 f8 $p"),
      (11L, s"$p $p"),
      (12L, s"$p only one copy of the phrase here")
    ).toDF("doc_id", "text")
    val spans = RepeatedSpans.repeatedSpans(df, "doc_id", "text",
        k = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2))
    assert(spans.toSeq === Seq(
      (10L, 0, 8), (10L, 16, 24), // split: two exact-phrase spans
      (11L, 0, 16),               // merged: one contiguous span
      (12L, 0, 8)))
  }

  test("budget accounts every document, including span-free ones") {
    val b = RepeatedSpans.repeatedTokenBudget(docs, "doc_id", "text",
        k = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(b.length === 3)
    assert(b(0) === ((1L, 15L, 10L, 1L, 0.666667))) // round(10/15, 6)
    assert(b(1)._3 === 10L)
    assert(b(2) === ((3L, 10L, 0L, 0L, 0.0)))
  }

  test("no repeats → empty spans") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    assert(RepeatedSpans.repeatedSpans(df, "doc_id", "text").count() === 0L)
  }
}
