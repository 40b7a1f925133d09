package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreferenceAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("length bias, ties and overlap on hand-built preference pairs") {
    val df = Seq(
      // chosen longer, half the distinct tokens shared
      ("a", "alpha beta gamma delta", "alpha beta"),
      // rejected longer, disjoint
      ("a", "one two", "three four five six"),
      // exact tie
      ("a", "same response text", "same response text"),
      // both empty — tie with overlap pinned to 1
      ("b", "", "")
    ).toDF("source", "chosen", "rejected")
    val out = PreferenceAudit.audit(df, "source", "chosen", "rejected")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // source a: 1/3 chosen-longer, 1/3 ties,
    // mean delta = ((4-2)+(2-4)+0)/3 = 0,
    // overlaps = 0.5, 0.0, 1.0 → mean 0.5
    assert(out("a") === ((3L, 0.333333, 0.333333, 0.0, 0.5)))
    assert(out("b") === ((1L, 0.0, 1.0, 0.0, 1.0)))
  }
}
