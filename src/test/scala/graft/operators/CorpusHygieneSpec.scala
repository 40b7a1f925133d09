package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical dedup separates exact copies from formatting variants") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), // formatting variants
      (3L, "Hello, World!"),                      // exact copy of 1
      (4L, "something else entirely")
    ).toDF("doc_id", "text")
    val g = CorpusHygiene.canonicalDuplicates(df, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // group {1,2,3}: 3 copies, 2 raw variants; group {4}: singleton
    assert(g.toSeq === Seq((1L, 3L, 2L), (4L, 1L, 1L)))
  }

  test("cross-source matrix counts shared texts once per source pair") {
    val df = Seq(
      ("dup text", "a"), ("dup text", "b"), ("dup text", "b"), // a-b share 1
      ("other dup", "a"), ("other dup", "c"),                  // a-c share 1
      ("unique", "a")
    ).toDF("text", "source")
    val m = CorpusHygiene.crossSourceDupMatrix(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(m.toSeq === Seq(("a", "b", 1L), ("a", "c", 1L)))
  }

  test("split leakage flags duplicated text straddling splits") {
    // same text under many ids — md5 spreads ids across train/val/test,
    // so at least one cross-split pair must appear
    val df = (1L to 60L).map(i => (i, "the one duplicated document"))
      .toDF("doc_id", "text")
    val leaks = CorpusHygiene.splitLeakage(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(leaks.nonEmpty)
    leaks.foreach { case (a, b, n) =>
      assert(a < b); assert(n === 1L) // one distinct leaked text
    }
  }

  test("language mix: monolingual clean, mixed flagged, und for no votes") {
    val df = Seq(
      (1L, "the cat and the dog of the house is here"), // en only
      (2L, "the house is der haus und die katze ist"),  // en + de mixed
      (3L, "qqq www rrr")                               // no markers
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.languageMix(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getAs[String]("top_lang"),
        r.getAs[Long]("top_votes"), r.getAs[String]("second_lang"),
        r.getAs[Boolean]("is_mixed"))).sortBy(_._1)
    assert(out(0)._2 === "en" && !out(0)._5)
    assert(out(1)._2 === "de" || out(1)._2 === "en")
    assert(out(1)._5, s"code-switched doc must flag mixed: ${out(1)}")
    assert(out(2)._2 === "und" && out(2)._4 === null && !out(2)._5)
  }

  test("boilerplate prefix: recovers the shared header length per source") {
    val df = Seq(
      (1L, "daily brief :: markets rallied strongly today", "wire"),
      (2L, "daily brief :: storms battered the coast", "wire"),
      (3L, "daily brief :: election results are in", "wire"),
      (4L, "no shared header on this one", "blog"),
      (5L, "a different opening over here", "blog"),
      // a 50/50 split source: k=1 modal share exactly 0.5 qualifies
      (6L, "alpha one two", "split"),
      (7L, "alpha three four", "split"),
      (8L, "beta five six", "split"),
      (9L, "gamma seven eight", "split")
    ).toDF("doc_id", "text", "source")
    val out = CorpusHygiene.boilerplatePrefix(df, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getInt(2),
        r.getAs[String](3), if (r.isNullAt(4)) -1.0 else r.getDouble(4))))
      .toMap
    // the wire header is 3 tokens; k=4 modal share drops to 1/3
    assert(out("wire") === ((3L, 3, "daily brief ::", 1.0)))
    assert(out("blog") === ((2L, 0, null, -1.0)))
    // alpha leads half the split source — exactly at the threshold
    assert(out("split") === ((4L, 1, "alpha", 0.5)))
  }

  test("sentence dedup: corpus-frequency >= 2 flags, within-doc repeats count") {
    val df = Seq(
      // doc 1: unique sentence + shared boilerplate
      (1L, "A truly unique observation. All rights reserved."),
      // doc 2: different unique sentence + the same boilerplate
      (2L, "Another novel remark! All rights reserved."),
      // doc 3: repeats its own sentence twice (within-doc dup)
      (3L, "Echo echo echo. Echo echo echo. Fresh ending here"),
      // doc 4: all unique, no terminal punctuation on the last
      (4L, "One thing. Two thing")
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.sentenceDedup(df, "doc_id", "text",
        maxDupFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4))).sortBy(_._1)
    assert(out(0) === ((1L, 2L, 1L, true)))   // 1/2 dup → keep at 0.5
    assert(out(1) === ((2L, 2L, 1L, true)))
    assert(out(2) === ((3L, 3L, 2L, false)))  // 2/3 dup → drop
    assert(out(3) === ((4L, 2L, 0L, true)))
  }
}
