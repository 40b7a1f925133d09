package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The BPE training loop on the classic Sennrich-style fixture
  * (low·5, lower·2, newest·6, widest·3) — the 6-round merge sequence
  * is hand-derivable: es(9), est(9), lo(7), low(7), ew(6), ew+est(6),
  * exercising max selection, count ties broken by left symbol,
  * merged-symbol pairs (multi-char left AND right), and re-counting
  * after fusion.
  */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("six hand-derived merge rounds over the Sennrich vocabulary") {
    val doc = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val out = BpePairs.learnMerges(Seq(doc).toDF("text"), "text", rounds = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1, "e", "s", 9L),   // es 9 ties st 9 → left tie-break
      (2, "es", "t", 9L),  // newest/widest now end in ⟨es⟩⟨t⟩
      (3, "l", "o", 7L),   // lo 7 ties ow 7 → left tie-break
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L),   // 6-way tie ew/ne/w·est → 'e' smallest
      (6, "ew", "est", 6L) // merged symbols on BOTH sides
    ))
  }

  test("encode: token counts under the learned merges, hand-computed") {
    val doc = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val out = BpePairs.encodeTokenCounts(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", rounds = 6)
      .collect()(0)
    // per word: low→⟨low⟩ (1), lower→⟨low⟩⟨e⟩⟨r⟩ (3),
    // newest→⟨n⟩⟨ewest⟩ (2), widest→⟨w⟩⟨i⟩⟨d⟩⟨est⟩ (4)
    // doc: 5·1 + 2·3 + 6·2 + 3·4 = 35 tokens over 79 non-space chars
    assert(out.getLong(1) === 35L, s"token count: $out")
    assert(out.getLong(2) === 79L, s"char count: $out")
    assert(out.getDouble(3) === 2.257143, s"compression: $out")
  }

  test("degenerate corpus: rounds past full merge emit nothing, no nulls") {
    // vocabulary {ab, ab ab} fully merges in round 1; rounds 2-3 have
    // an EMPTY pair set — the guard must skip them (no (round, null,
    // null) rows) and must NOT null-poison the words frame
    val docs = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = BpePairs.learnMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(merges.toSeq === Seq((1, "a", "b", 3L)), s"got: ${merges.toSeq}")
    val enc = BpePairs.encodeTokenCounts(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // doc 1: two ⟨ab⟩ tokens over 4 chars; doc 2: one token, 2 chars
    assert(enc.toSeq === Seq((1L, 2L, 4L), (2L, 1L, 2L)), s"enc: ${enc.toSeq}")
  }

  test("greedy left-to-right non-overlap: aaaa → aa,aa; aaa → aa,a") {
    val out = BpePairs.learnMerges(
        Seq("aaaa aaa").toDF("text"), "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    // round 1: (a,a) appears 3+2 = 5 times pre-merge
    assert(out(0) === ((1, "a", "a", 5L)))
    // after fusion: "aaaa"→⟨aa⟩⟨aa⟩, "aaa"→⟨aa⟩⟨a⟩ — so round 2's top
    // pair is (aa,aa)·1 tying (aa,a)·1, left equal, right 'a' < 'aa'
    assert(out(1) === ((2, "aa", "a", 1L)))
  }
}
