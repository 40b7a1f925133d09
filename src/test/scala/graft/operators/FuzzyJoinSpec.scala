package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Length-banded edit-distance join vs the brute-force baseline. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val a = Seq(
    (1L, "red widget"), (2L, "blue bolt"), (3L, "tiny gear"), (4L, "x")
  ).toDF("id_a", "name_a")
  private lazy val b = Seq(
    (10L, "red widget"),  // dist 0 to 1
    (11L, "red widgets"), // dist 1 to 1
    (12L, "blue belt"),   // dist 1 to 2
    (13L, "completely different phrase"), // pruned by length band
    (14L, "xy")           // dist 1 to 4
  ).toDF("id_b", "name_b")

  test("matches brute-force levenshtein filter; band pruning loses nothing") {
    val got = FuzzyJoin.editDistanceJoin(a, b, "name_a", "name_b", maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val expected = a.crossJoin(b)
      .filter(levenshtein($"name_a", $"name_b") <= 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 12L), (4L, 14L)))
  }

  test("no duplicate pairs from bucket replication") {
    val got = FuzzyJoin.editDistanceJoin(a, b, "name_a", "name_b", maxDist = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size)
  }

  test("plans as an equi join, not nested-loop") {
    val plan = FuzzyJoin.editDistanceJoin(a, b, "name_a", "name_b", 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("NestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
