package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Double, Int)], bins: Int = 10) =
    Calibration.reliability(rows.toDF("score", "label"), "score", "label",
      bins).collect().map(r => r.getInt(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))).toMap

  test("perfectly calibrated bins have zero gap and zero ECE") {
    // bin 2 (scores .25): 1 of 4 positive; bin 7 (.75): 3 of 4
    val rows = Seq.fill(3)((0.25, 0)) ++ Seq((0.25, 1)) ++
      Seq.fill(3)((0.75, 1)) ++ Seq((0.75, 0))
    val out = run(rows)
    assert(out.keySet === Set(2, 7))
    val (n2, conf2, acc2, gap2, ece, _) = out(2)
    assert(n2 === 4L && conf2 === 0.25 && acc2 === 0.25 && gap2 === 0.0)
    assert(ece === 0.0)
  }

  test("overconfident classifier: gap, ECE and Brier surface it") {
    // all scores 0.9 but only half positive: gap = 0.4 in bin 9
    val rows = Seq.fill(5)((0.9, 1)) ++ Seq.fill(5)((0.9, 0))
    val out = run(rows)
    val (n, conf, acc, gap, ece, brier) = out(9)
    assert(n === 10L && conf === 0.9 && acc === 0.5)
    assert(math.abs(gap - 0.4) < 1e-12)
    assert(math.abs(ece - 0.4) < 1e-12) // single bin -> ECE = gap
    // brier = mean of 5*(0.1)^2 + 5*(0.9)^2 over 10 = 0.41
    assert(math.abs(brier - 0.41) < 1e-12)
  }

  test("score 1.0 lands in the top bin, not an overflow bin") {
    val out = run(Seq((1.0, 1), (0.0, 0)))
    assert(out.keySet === Set(0, 9))
  }

  test("ECE weights bins by mass (common-denominator identity)") {
    // bin 0: 9 rows gap 0; bin 9: 1 row gap 1.0 -> ECE = 0.1... with
    // exact micro-units: bin0 conf 0 acc 0; bin9 conf 0.9 acc 0 ->
    // ece = (1 * |0*1e6 - 900000|) / (10 * 1e6) = 0.09
    val rows = Seq.fill(9)((0.0, 0)) ++ Seq((0.9, 0))
    val (_, _, _, _, ece, _) = run(rows)(9)
    assert(math.abs(ece - 0.09) < 1e-12)
  }
}
