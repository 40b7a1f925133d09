package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordNgrams emits distinct lowercased n-grams, none under n tokens") {
    val docs = Seq(
      (1L, "The quick brown fox the QUICK brown fox"),
      (2L, "too short"),
      (3L, "a  b\tc   d")). // mixed whitespace collapses
      toDF("doc_id", "text")
    val got = Decontamination.wordNgrams(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "the quick brown"), (1L, "quick brown fox"),
      (1L, "brown fox the"), (1L, "fox the quick"),
      (3L, "a b c"), (3L, "b c d")))
    // doc 2 has 2 tokens < n=3 → no grams; duplicates collapsed
    assert(!got.exists(_._1 == 2L))
  }

  test("overlap counts distinct shared grams and applies the threshold") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // 4 shared 3-grams w/ eval 1
      (11L, "alpha beta gamma nope nope2 nope3"),   // 1 shared
      (12L, "totally different words here now ok")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val got = Decontamination.overlap(train, eval, "doc_id", "text", 3, 2L)
      .as[(Long, Long, Long)].collect().toSet
    // train 10 shares its all 4 grams; train 11 only 1 (< threshold)
    assert(got == Set((10L, 1L, 4L)))
  }

  test("overlap matches a brute-force set intersection on random docs") {
    val words = Vector("a", "b", "c", "d", "e", "f")
    def text(seed: Int) = (0 until 12).map(i =>
      words((seed * 31 + i * 17) % words.length)).mkString(" ")
    val train = (0 until 20).map(i => (i.toLong, text(i)))
    val eval = (0 until 5).map(i => (100L + i, text(i * 3)))
    def grams(t: String, n: Int) =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(n)
        .filter(_.length == n).map(_.mkString(" ")).toSet
    val expected = (for {
      (ti, tt) <- train; (ei, et) <- eval
      shared = (grams(tt, 3) & grams(et, 3)).size
      if shared >= 2
    } yield (ti, ei, shared.toLong)).toSet
    val got = Decontamination.overlap(
      train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
      "doc_id", "text", 3, 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("semantic gate: exact integer cosine threshold, negative-dot " +
      "guard, boundary inclusion") {
    // eval = (1000, 0); tau = 0.7
    //   v1 = eval        -> cos 1        hit
    //   v2 = (707, 707)  -> cos ~0.7071  hit (just above)
    //   v3 = (0, 1000)   -> cos 0        miss
    //   v4 = (-1000, 0)  -> cos -1       miss (dot < 0 guard)
    val corpus = Seq(
      (1L, Seq(1000L, 0L)), (2L, Seq(707L, 707L)),
      (3L, Seq(0L, 1000L)), (4L, Seq(-1000L, 0L))
    ).toDF("vec_id", "v")
    val ev = Seq((100L, Seq(1000L, 0L))).toDF("eval_id", "e")
    val got = Decontamination.semanticGate(corpus, "vec_id", "v",
        ev, "eval_id", "e", tauNum = 7, tauDen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(got(1L) === ((1L, Some(100L), true)))
    assert(got(2L) === ((1L, Some(100L), true)))
    assert(got(3L) === ((0L, None, false)))
    assert(got(4L) === ((0L, None, false)))
  }
}
