package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReadabilityBurstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sentence stats: boundaries, terminal punctuation, syllable runs") {
    val df = Seq(
      (1L, "One sentence here. Another one! And a third?"),
      (2L, "no punctuation at all"),
      (3L, ""),
      (4L, "Done now!   ")
    ).toDF("doc_id", "text")
    val out = Readability.sentenceStats(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // doc 1: boundaries after "here." and "one!" (terminal "?" closes
    // the last sentence without a following space) → 3 sentences
    assert(out(0) === ((1L, 8L, 3L, 15L)))
    assert(out(1)._3 === 1L) // one sentence without punctuation
    assert(out(2) === ((3L, 0L, 0L, 0L)))
    // doc 4: terminal run + trailing whitespace is NOT an extra
    // boundary — sentence counting is whitespace-insensitive
    assert(out(3)._3 === 1L, s"trailing whitespace overcounted: ${out(3)}")
  }

  test("flesch: long dense sentences score lower than short simple ones") {
    val simple = "The cat sat. The dog ran. It was fun."
    val dense = "Concatenating multitudinous polysyllabic terminology " +
      "overwhelmingly complicates comprehensibility assessments " +
      "notwithstanding orthographic regularity"
    val out = Readability.sentenceStats(
        Seq((1L, simple), (2L, dense)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) > 80.0, s"simple prose reads easy: $out")
    assert(out(2L) < 0.0, s"the dense wall must score negative: $out")
  }

  test("template clusters: shared 8-token header groups, bodies distinct") {
    val header = "common header tokens one two three four five"
    val df = Seq(
      (1L, s"$header body alpha beta"),
      (2L, s"$header completely different body text"),
      (3L, "unrelated document with its own words here entirely")
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.templateClusters(df, "doc_id", "text",
        prefixTokens = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 2L))) // one family, 2 distinct bodies
  }

  test("burstiness: regular arrivals ≈ -1, one huge gap pushes it up") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val regular = (0L until 20L).map(i => (1L, i, ts(i * 60)))
    val bursty = (0L until 19L).map(i => (2L, 100 + i, ts(i))) :+
      ((2L, 119L, ts(100000L)))
    val df = (regular ++ bursty).toDF("user_id", "event_id", "ts")
    val out = TimeSeries.arrivalBurstiness(df, "user_id", "event_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    assert(out(1L)._1 === 19L)
    assert(out(1L)._2 === -1.0, s"metronome gaps: ${out(1L)}") // zero variance
    assert(out(2L)._2 > 0.5, s"one dominant gap is bursty: ${out(2L)}")
  }
}
