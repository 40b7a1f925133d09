package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dsir / Unimax / HeuristicFilters / Kmv fixture semantics. */
class TrainingMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DSIR: target-typical docs score above raw-typical docs") {
    // target slice speaks "aa bb", the raw remainder speaks "yy dd";
    // docs are 60 tokens so corpus counts dominate the add-one
    // smoothing mass (B=16), and the 4 tokens hash to distinct
    // buckets mod 16 (7, 0, 5, 6 — checked against md5)
    val docs = Seq(
      (1L, Seq.fill(30)("aa bb").mkString(" "), true),
      (2L, Seq.fill(30)("bb aa").mkString(" "), true),
      (3L, Seq.fill(30)("yy dd").mkString(" "), false),
      (4L, Seq.fill(30)("aa yy").mkString(" "), false)
    ).toDF("doc_id", "text", "is_target")
    val w = Dsir.importanceLogWeights(docs, "doc_id", "text",
        targetPred = col("is_target"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1) > 0.0 && w(2) > 0.0, s"target-like docs must score > 0: $w")
    assert(w(3) < 0.0, s"off-target doc must score < 0: $w")
    assert(w(3) < w(4) && w(4) < w(1),
      s"mixed doc sits between pure docs: $w")
  }

  test("DSIR: weights are an exact integer lattice dot product") {
    val docs = Seq((1L, "aa aa aa", true), (2L, "bb", false))
      .toDF("doc_id", "text", "is_target")
    val out = Dsir.importanceLogWeights(docs, "doc_id", "text",
      targetPred = col("is_target"), buckets = 16)
    // repeated token = one bucket hit 3 times: weight scales exactly 3×
    val w = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val one = Dsir.importanceLogWeights(
        Seq((1L, "aa", true), (2L, "bb", false))
          .toDF("doc_id", "text", "is_target"),
        "doc_id", "text", col("is_target"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // same model (counts differ) — just check sign structure holds
    assert(w(1) > 0.0 && one(1) > 0.0)
  }

  test("gopher rules: clean prose keeps, degenerate text fails with reasons") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over that lazy dog and it runs off to be free with friends"),
      (2L, "### ### ### ### ### ### ### ### ### ### ### ###"), // symbols
      (3L, "a b"), // too short
      (4L, "one two three four five six seven eight nine ten eleven twelve") // no stopwords
    ).toDF("doc_id", "text")
    val out = HeuristicFilters.gopherRules(docs, "doc_id", "text",
        minWords = 10)
      .collect().map(r => (r.getLong(0),
        r.getAs[Boolean]("keep"), r.getAs[Boolean]("ok_symbols"),
        r.getAs[Boolean]("ok_words"), r.getAs[Boolean]("ok_stopwords")))
      .sortBy(_._1)
    assert(out(0)._2, "clean prose must pass the battery")
    assert(!out(1)._2 && !out(1)._3, "symbol wall fails ok_symbols")
    assert(!out(2)._2 && !out(2)._4, "two words fails ok_words")
    assert(!out(3)._2 && !out(3)._5, "stopword-free fails ok_stopwords")
  }

  test("encoding audit: clean ASCII is clean; planted artifacts counted") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "caf\u00C3\u00A9 na\u00C3\u00AFve"), // 2 mojibake digraphs
      (3L, "bad\uFFFDchar\uFFFD"),              // 2 replacement chars
      (4L, "ctl\u0085end")                      // 1 C1 control
    ).toDF("doc_id", "text")
    val out = HeuristicFilters.encodingAudit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Boolean]("clean"))).sortBy(_._1)
    assert(out(0) === ((1L, 0L, 0L, 0L, true)))
    assert(out(1) === ((2L, 0L, 0L, 2L, false)))
    assert(out(2) === ((3L, 2L, 0L, 0L, false)))
    assert(out(3) === ((4L, 0L, 1L, 0L, false)))
  }

  test("unimax: small sources fully capped, large sources split the rest") {
    // tokens: a=2, b=4, c=100; E=2 → caps 4, 8, 200; budget = 0.5·106 = 53
    // a and b capped (4+8=12), c gets floor((53−12)/1)=41 < 200
    val docs = Seq(
      ("a", "t1 t2"), ("b", "t1 t2 t3 t4"),
      ("c", Seq.fill(100)("w").mkString(" "))
    ).toDF("source", "text")
    val out = Unimax.allocate(docs, "source", "text",
        budgetFrac = 0.5, maxEpochs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(out.toSeq === Seq(("a", 2L, 4L, 4L), ("b", 4L, 8L, 8L),
      ("c", 100L, 200L, 41L)))
  }

  test("unimax: budget above total caps saturates every source") {
    val docs = Seq(("a", "t1 t2"), ("b", "t1 t2 t3 t4"))
      .toDF("source", "text")
    val out = Unimax.allocate(docs, "source", "text",
        budgetFrac = 3.0, maxEpochs = 3) // budget 18 ≥ Σcaps 18
      .collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(("a", 6L, 3.0), ("b", 12L, 3.0)))
  }

  test("kmv: exact below k, within relative bound above k") {
    val rows = (0 until 2000).map(i => ("big", i.toLong)) ++
      (0 until 20).map(i => ("small", i.toLong))
    val out = Kmv.distinctEstimate(rows.toDF("g", "v"), "g", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getAs[Boolean]("within_bound"))).sortBy(_._1)
    val big = out(0); val small = out(1)
    assert(small === (("small", 20L, 20.0, true)), "below k ⇒ exact")
    assert(big._2 === 2000L)
    assert(math.abs(big._3 / 2000.0 - 1.0) <= 0.375, s"bound: $big")
    assert(big._4)
  }

  test("sqrt temperature weights: perfect-square corpus is exact, " +
      "allocation is the half-up lattice division") {
    // tokens: a=100, b=400 -> r4 = 100000 / 200000 (exact sqrt)
    // budget 999: a -> round(999/3)=333, b -> round(666.0)=666
    val docs = Seq(
      ("a", Seq.fill(100)("w").mkString(" ")),
      ("b", Seq.fill(400)("w").mkString(" "))
    ).toDF("source", "text")
    val got = Unimax.sqrtTemperatureWeights(docs, "source", "text",
        budget = 999L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got("a") === ((100L, 0.2, 1.0 / 3.0, 333L)))
    assert(got("b") === ((400L, 0.8, 2.0 / 3.0, 666L)))
    // temperature upsamples the small source: w > p on the tail
    assert(got("a")._3 > got("a")._2 && got("b")._3 < got("b")._2)
  }
}
