package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fellegi–Sunter probabilistic record linkage. */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = RecordLinkage.FsWeights(
    nameExact = 6856462L, nameApprox = 3500000L, nameDis = -2994732L,
    numAgree = 2890372L, numDis = -2251292L,
    nameMaxEdits = 2, numTol = 1.0)

  test("blocking: candidates never cross a block key") {
    val a = Seq((1L, "alice", 10.0, "k1"), (2L, "bob", 20.0, "k2"))
      .toDF("id", "name", "bal", "blk")
    val b = Seq((10L, "alice", 10.2, "k1"), (20L, "bob", 20.0, "k3"))
      .toDF("id", "name", "bal", "blk")
    val cands = RecordLinkage.blockedCandidates(a, b, Seq("blk"))
    val got = cands.select($"id_a", $"id_b").as[(Long, Long)].collect()
    // k2/k3 never meet; only the k1 pair survives
    assert(got.toSet === Set((1L, 10L)))
  }

  test("scoring: 3-level name gamma, exact integer score, decisions") {
    val cands = Seq(
      // exact name + close balance -> 6856462 + 2890372 = link
      (1L, "carol", 5.0, 1L, "carol", 5.5),
      // 1-edit name + close balance -> 3500000 + 2890372 = link
      (2L, "carol", 5.0, 2L, "carom", 5.5),
      // exact name + far balance -> 6856462 - 2251292 = possible
      (3L, "carol", 5.0, 3L, "carol", 50.0),
      // 3-edit name + close balance -> -2994732 + 2890372 = non_link
      (4L, "carol", 5.0, 4L, "cXYZl", 5.0),
      // 2-edit name + far balance -> 3500000 - 2251292 = possible
      (5L, "carol", 5.0, 5L, "caXYl", 50.0)
    ).toDF("id_a", "name_a", "bal_a", "id_b", "name_b", "bal_b")
    val out = RecordLinkage.fellegiSunter(cands,
        "name_a", "name_b", "bal_a", "bal_b", w,
        tLink = 6000000L, tNonLink = 0L)
      .select($"id_a", $"name_level", $"num_agree", $"score_points",
        $"decision")
      .as[(Long, Int, Boolean, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((2, true, 9746834L, "link")))
    assert(out(2L) === ((1, true, 6390372L, "link")))
    assert(out(3L) === ((2, false, 4605170L, "possible")))
    assert(out(4L) === ((0, true, -104360L, "non_link")))
    assert(out(5L) === ((1, false, 1248708L, "possible")))
  }

  test("numeric tolerance boundary: |a-b| == tol agrees") {
    val cands = Seq((1L, "x", 4.0, 1L, "x", 5.0))
      .toDF("id_a", "name_a", "bal_a", "id_b", "name_b", "bal_b")
    val out = RecordLinkage.fellegiSunter(cands,
        "name_a", "name_b", "bal_a", "bal_b", w, 6000000L, 0L)
      .select($"num_agree").as[Boolean].collect()
    assert(out.head)
  }
}
