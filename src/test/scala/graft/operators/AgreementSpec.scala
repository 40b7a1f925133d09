package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed Fleiss kappa: partial agreement") {
    // 3 items, 2 raters: unanimous A, split, unanimous B
    // A = 2+0+2 = 4, D1 = 3·2·1 = 6 → P̄ = 2/3
    // C_A = C_B = 3, T = 6, B = 18, D2 = 36 → P̄e = 1/2
    // kappa = (2/3 − 1/2) / (1 − 1/2) = 1/3
    val df = Seq(
      (1, 1, "A"), (1, 2, "A"),
      (2, 1, "A"), (2, 2, "B"),
      (3, 1, "B"), (3, 2, "B")
    ).toDF("item", "rater", "cat")
    val out = Agreement.fleissKappa(df, "item", "rater", "cat")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(out.keySet === Set("A", "B"))
    val (cA, pA, n, rr, pBar, pE, kappa) = out("A")
    assert(cA === 3L && pA === 0.5)
    assert(n === 3L && rr === 2L)
    assert(pBar === 4.0 / 6.0)
    assert(pE === 0.5)
    assert(kappa === (4.0 * 36 - 18.0 * 6) / (6.0 * (36 - 18)))
    assert(math.abs(kappa - 1.0 / 3.0) < 1e-12)
  }

  test("perfect agreement across two categories gives kappa 1") {
    val df = Seq(
      (1, 1, "A"), (1, 2, "A"), (1, 3, "A"),
      (2, 1, "B"), (2, 2, "B"), (2, 3, "B")
    ).toDF("item", "rater", "cat")
    val rows = Agreement.fleissKappa(df, "item", "rater", "cat").collect()
    assert(rows.forall(_.getDouble(7) === 1.0))
    assert(rows.forall(_.getDouble(5) === 1.0)) // p_bar
  }

  test("chance-impossible case (one category only) yields null kappa") {
    val df = Seq((1, 1, "A"), (1, 2, "A"), (2, 1, "A"), (2, 2, "A"))
      .toDF("item", "rater", "cat")
    val rows = Agreement.fleissKappa(df, "item", "rater", "cat").collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(7)) // 0/0 → null, pinned in the oracle too
  }
}
