package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AuditingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("source influence: removing the bad source raises the mean") {
    val df = (Seq.fill(8)(("good", 0.9)) ++ Seq.fill(2)(("bad", 0.1)))
      .toDF("source", "score")
    val out = Auditing.sourceInfluence(df, "source", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    // mean_all = (8·0.9 + 2·0.1)/10 = 0.74
    assert(out.forall(_._3 === 0.74))
    val bad = out(0); val good = out(1)
    assert(bad._4 === 0.9 && bad._5 === 0.16, s"drop bad → mean 0.9: $bad")
    assert(good._4 === 0.1 && good._5 === -0.64)
  }

  test("benford: constructed 1-heavy data deviates positively on digit 1") {
    val vals = (1 to 300).map(i => 1.0 + (i % 9) * 0.01) ++ // all digit 1
      (1 to 100).map(i => 2.0 + (i % 5) * 0.1) // digit 2
    val out = Auditing.benfordAudit(vals.map(Tuple1(_)).toDF("value"), "value")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1, 2))
    assert(out(0)._2 === 300L && out(0)._3 === 0.75)
    assert(math.abs(out(0)._4 - 0.30103) < 1e-6) // Benford digit-1 share
  }

  test("lead-lag: a planted 1-day lead shows up at lag +1") {
    def ts(day: Long) = new Timestamp(day * 86400000L + 1000L)
    // clicks on day d count (d % 5 + 1); purchases REPLAY that curve
    // one day later → corr at lag +1 is exactly 1, other lags lower
    val clicks = (0L until 30L).flatMap(d =>
      Seq.fill((d % 5 + 1).toInt)(("click", ts(d))))
    val purchases = (0L until 30L).flatMap(d =>
      Seq.fill((d % 5 + 1).toInt)(("purchase", ts(d + 1))))
    val df = (clicks ++ purchases).toDF("event_type", "ts")
    val out = Auditing.leadLagCorr(df, "ts", "event_type",
        "click", "purchase", maxLag = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(1) === 1.0, s"purchases replay clicks shifted by 1: $out")
    assert(out.filter(_._1 != 1).values.forall(_ < 1.0))
  }
}
