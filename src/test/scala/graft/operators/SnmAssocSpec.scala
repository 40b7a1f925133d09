package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnmAssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sorted neighborhood: adjacent-sorting duplicates found, O(nw) bound") {
    val df = Seq(
      (1L, "apple banana cherry date elderberry fig"),
      (2L, "apple banana cherry date elderberry fig"), // dup of 1
      (3L, "zebra yak xylophone walrus vulture"),
      (4L, "zebra yak xylophone walrus vulture"),      // dup of 3
      (5L, "middle of the alphabet words here")
    ).toDF("doc_id", "text")
    val out = SortedNeighborhood.nearDupPairs(df, "doc_id", "text",
        window = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq((1L, 2L, 1.0), (3L, 4L, 1.0)))
  }

  test("sorted neighborhood: pairs beyond the window are not candidates") {
    // 5 identical docs: window 2 sees only rank-distance ≤ 2 pairs —
    // 4+3 = 7 of the 10 all-pairs (the documented SNM trade-off)
    val df = (1L to 5L).map(i => (i, "same text in every document"))
      .toDF("doc_id", "text")
    val out = SortedNeighborhood.nearDupPairs(df, "doc_id", "text",
      window = 2, threshold = 0.5)
    assert(out.count() === 7L)
  }

  test("association rules: planted implication has confidence 1 and lift > 1") {
    // baskets: {a,b} ×4, {a} ×2, {c} ×4 — b ⇒ a always
    val rows = (1 to 4).flatMap(i => Seq((s"k$i", "a"), (s"k$i", "b"))) ++
      (5 to 6).map(i => (s"k$i", "a")) ++
      (7 to 10).map(i => (s"k$i", "c"))
    val out = AssociationRules.pairRules(
        rows.toDF("bk", "item"), col("bk"), "item")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9)))).toMap
    val ab = out(("a", "b"))
    assert(ab._1 === 10L && ab._2 === 4L) // 10 baskets, 4 co-occurrences
    assert(ab._3 === 0.4)                 // support
    assert(ab._5 === 1.0)                 // conf b→a
    assert(ab._6 > 1.0, s"positive association lifts: $ab")
    assert(out.size === 1, "no pair row for never-co-occurring items")
  }

  test("vocab coverage: cumulative shares are monotone and end at 1") {
    val tf = Seq(("the", 50L), ("of", 30L), ("cat", 15L), ("dog", 5L))
      .toDF("term", "f")
    val out = Profiling.vocabCoverage(tf, "term", "f", topK = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq("the", "of", "cat", "dog"))
    assert(out.map(_._3).toSeq === Seq(0.5, 0.8, 0.95, 1.0))
  }
}
