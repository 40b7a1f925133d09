package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LlrSurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("llr: perfectly-associated pair scores far above independent pair") {
    // a+b always co-occur; c+d co-occur at the independence rate
    val docs = ((0 until 10).map(i => (i.toLong, Seq("a", "b", "c"))) ++
      (10 until 20).map(i => (i.toLong, Seq("a", "b", "d"))) ++
      (20 until 30).map(i => (i.toLong, Seq("c", "d", "e"))))
      .toDF("doc_id", "toks")
    val out = Cooccurrence.llrPairs(docs, "doc_id", "toks",
        dfTimes = 10, pairTimes = 25)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5)))
      .toMap
    assert(out(("a", "b")) > 20.0, s"perfect collocation: $out")
    assert(out(("a", "b")) > out(("c", "d")), s"assoc beats mixed: $out")
    // all G² values are non-negative (it is a likelihood RATIO)
    out.values.foreach(g => assert(g >= -1e-6, s"negative G²: $out"))
  }

  test("survival: life table from planted lifetimes") {
    def ts(day: Long) = new Timestamp(day * 86400000L + 5000L)
    // 4 users with lifetime 0 (one event), 3 with lifetime 2, 3 with 5
    val rows =
      (0 until 4).map(u => (u.toLong, ts(0))) ++
      (4 until 7).flatMap(u => Seq((u.toLong, ts(0)), (u.toLong, ts(2)))) ++
      (7 until 10).flatMap(u => Seq((u.toLong, ts(0)), (u.toLong, ts(5))))
    val out = Retention.survivalCurve(rows.toDF("user_id", "ts"),
        "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, 10L, 4L, 0.4), (2L, 6L, 3L, 0.5), (5L, 3L, 3L, 1.0)))
    val lnS = Retention.survivalCurve(rows.toDF("user_id", "ts"),
        "user_id", "ts")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).sortBy(_._1)
    // S(0) = 0.6, S(2) = 0.3; terminal row (hazard 1) → null
    assert(math.abs(lnS(0)._2.get - math.log(0.6)) < 1e-6)
    assert(math.abs(lnS(1)._2.get - math.log(0.3)) < 1e-6)
    assert(lnS(2)._2.isEmpty)
  }
}
