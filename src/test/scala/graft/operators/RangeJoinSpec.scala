package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Bucketed interval join vs the brute-force cross-join-and-filter
  * baseline: identical pair sets, no duplicates, equi-join plan.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val a = Seq(
    (1L, 10L, ts(0)), (1L, 11L, ts(100)), (1L, 12L, ts(3600)),
    (2L, 20L, ts(50))
  ).toDF("key", "a_id", "a_ts")

  private lazy val b = Seq(
    (1L, 100L, ts(30)),   // within 60 of a10; 70 from a11
    (1L, 101L, ts(160)),  // within 60 of a11
    (1L, 102L, ts(3540)), // within 60 of a12 (bucket boundary)
    (2L, 200L, ts(111)),  // 61 from a20 → excluded at tol=60
    (3L, 300L, ts(0))     // key mismatch
  ).toDF("key", "b_id", "b_ts")

  test("matches the cross-join baseline exactly, no duplicate pairs") {
    val got = RangeJoin.withinTolerance(a, b, Seq("key"), "a_ts", "b_ts", 60L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val expected = a.join(b, "key")
      .filter(abs(unix_timestamp(col("a_ts")) - unix_timestamp(col("b_ts"))) <= 60)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got == got.distinct, "pair duplicated by bucket replication")
    assert(got == Seq((10L, 100L), (11L, 101L), (12L, 102L)))
  }

  test("boundary: exactly tol apart is included") {
    val l = Seq((1L, 1L, ts(0))).toDF("key", "a_id", "a_ts")
    val r = Seq((1L, 2L, ts(60))).toDF("key", "b_id", "b_ts")
    val got = RangeJoin.withinTolerance(l, r, Seq("key"), "a_ts", "b_ts", 60L)
    assert(got.count() == 1)
  }

  test("plans as a shuffled equi join, not a nested-loop join") {
    val plan = RangeJoin.withinTolerance(a, b, Seq("key"), "a_ts", "b_ts", 60L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("NestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
