package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BradleyTerrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two items reach the exact 3:1 fixed point on the lattice") {
    // A beats B 3-1: MLE has p_A/(p_A+p_B) = 3/4. Round 1 on the
    // lattice: s = 2e6, t = (2·4·10¹² + 2e6) div 4e6 = 2_000_000,
    // p_A = (2·3·10¹² + 2e6) div 4e6 = 1_500_000, p_B = 500_000 —
    // and s is again 2e6, so every later round is identical.
    val m = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val out = BradleyTerry.ratings(m, "winner", "loser", rounds = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("A") === ((3L, 4L, 1500000L, 1.5, 0.75)))
    assert(out("B") === ((1L, 4L, 500000L, 0.5, 0.25)))
  }

  test("an all-losing item is clamped to the lattice floor, not zero") {
    val m = Seq(("A", "B"), ("A", "B")).toDF("winner", "loser")
    val out = BradleyTerry.ratings(m, "winner", "loser", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("B") >= 1L)
    assert(out("A") > out("B"))
  }

  test("transitive strengths order correctly and ignore match order") {
    val base = Seq.fill(4)(("c", "b")) ++ Seq.fill(4)(("b", "a")) ++
      Seq.fill(4)(("c", "a")) ++ Seq(("a", "c"), ("b", "c"), ("a", "b"))
    val r1 = BradleyTerry.ratings(base.toDF("winner", "loser"),
      "winner", "loser", rounds = 5).collect()
    val r2 = BradleyTerry.ratings(
      scala.util.Random.shuffle(base).toDF("winner", "loser"),
      "winner", "loser", rounds = 5).collect()
    assert(r1.map(_.getString(0)).toSeq === Seq("c", "b", "a"))
    // batch MM is order-independent — shuffled matches, same board
    assert(r1.map(r => (r.getString(0), r.getLong(3))).toSeq ===
      r2.map(r => (r.getString(0), r.getLong(3))).toSeq)
  }
}
