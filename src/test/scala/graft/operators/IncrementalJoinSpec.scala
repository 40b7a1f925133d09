package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The delta decomposition must reconstruct the from-scratch join
  * exactly, over any disjoint slicing.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = (1L to 200L).map(i => (i % 40, i)).toDF("k", "av")
  private val b = (1L to 300L).map(i => (i % 50, i * 10)).toDF("k", "bv")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"av", $"bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap // multiset equality

  test("base ∪ viewDelta equals the from-scratch join for several pivots") {
    val full = canon(a.join(b, Seq("k")))
    for (pivot <- Seq(1L, 57L, 150L, 299L)) {
      val (a0, da) = (a.filter($"av" < pivot), a.filter($"av" >= pivot))
      val (b0, db) = (b.filter($"bv" < pivot * 10), b.filter($"bv" >= pivot * 10))
      val maintained = canon(
        IncrementalJoin.viewDelta(a0, da, b0, db, Seq("k"))
          .unionByName(a0.join(b0, Seq("k"))))
      assert(maintained == full, s"pivot=$pivot")
    }
  }

  test("empty deltas contribute nothing") {
    val empty = a.filter(lit(false))
    val got = canon(IncrementalJoin.viewDelta(
      a, empty, b, b.filter(lit(false)), Seq("k"))
      .unionByName(a.join(b.filter(lit(false)), Seq("k"))))
    assert(got.isEmpty)
  }
}
