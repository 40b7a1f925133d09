package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], size: Int, stride: Int) =
    Chunking.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", size, stride)
      .as[(Long, Int, Int, String, Int)].collect()
      .sortBy(t => (t._1, t._2)).toSeq

  test("short doc yields exactly one full-text chunk") {
    assert(run(Seq((1L, "abc")), 10, 5) ==
      Seq((1L, 0, 1, "abc", 3)))
  }

  test("exact multiple: no empty trailing chunk") {
    // len 10, size 10 → 1 chunk regardless of stride
    assert(run(Seq((1L, "0123456789")), 10, 5) ==
      Seq((1L, 0, 1, "0123456789", 10)))
  }

  test("overlap and trailing partial chunk") {
    val got = run(Seq((1L, "abcdefghijk")), 5, 3) // len 11
    // starts 1,4,7,10 → ceil((11-5)/3)=2 → ix 0..2 → starts 1,4,7
    assert(got == Seq(
      (1L, 0, 1, "abcde", 5),
      (1L, 1, 4, "defgh", 5),
      (1L, 2, 7, "ghijk", 5)))
    // every adjacent pair overlaps by size - stride = 2 chars
    got.sliding(2).foreach { case Seq(p, n) =>
      assert(p._4.takeRight(2) == n._4.take(2))
    }
  }

  test("reconstruction: concatenating stride-prefixes + last chunk = text") {
    val text = (1 to 257).map(i => ('a' + i % 26).toChar).mkString
    val chunks = run(Seq((7L, text)), 64, 48)
    val rebuilt = chunks.init.map(_._4.take(48)).mkString + chunks.last._4
    assert(rebuilt == text)
    // full coverage: last chunk reaches the end
    assert(chunks.last._3 - 1 + chunks.last._5 == text.length)
  }

  test("content-defined chunks tile the text and re-synchronize after edits") {
    import org.apache.spark.sql.functions.col
    val text = "the quick brown fox jumps over the lazy dog " * 8 // 352 chars
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.contentDefined(docs, "doc_id", "text", 16, "10")
      .orderBy(col("chunk_ix")).collect()
    // tiling: concatenation reconstructs the text exactly
    assert(chunks.map(_.getString(3)).mkString == text)
    assert(chunks.map(_.getInt(1)).toSeq == (1 to chunks.length))
    assert(chunks.length > 2, "threshold should produce several chunks")
    // self-healing: prepend a char — boundaries past the first window
    // re-synchronize, so at most the chunks touching the edit change
    val edited = Seq((1L, "X" + text)).toDF("doc_id", "text")
    val a = chunks.map(_.getString(3)).toSet
    val b = Chunking.contentDefined(edited, "doc_id", "text", 16, "10")
      .collect().map(_.getString(3)).toSet
    assert((a intersect b).size >= a.size - 2,
      s"lost ${a.size - (a intersect b).size} of ${a.size} chunks")
  }

  test("content-defined chunking: short docs yield one whole-doc chunk") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.contentDefined(docs, "doc_id", "text", 16, "04")
      .select(col("doc_id"), col("chunk_text"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "tiny"))) // the empty doc yields nothing
  }

  /** Independent gear reference: same definition, plain Scala — the
    * FULL-history rolling form (not the closed trailing-window form
    * the oracle uses), so agreement here plus the oracle check proves
    * the two forms coincide.
    */
  private def refGearChunks(s: String, maskBits: Int): Seq[(Int, Int, String)] = {
    def gearVal(cp: Int): Int =
      java.security.MessageDigest.getInstance("MD5")
        .digest(("g:" + new String(Character.toChars(cp))).getBytes("UTF-8"))(0) & 0xff
    val mask = (1 << maskBits) - 1
    var h = 0
    val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
    for ((cp, i) <- s.codePoints().toArray.zipWithIndex) {
      h = ((h << 1) + gearVal(cp)) & 0xffff
      if (i + 1 >= maskBits && (h & mask) == 0) bs += i + 1
    }
    if (s.nonEmpty && (bs.isEmpty || bs.last != s.length)) bs += s.length
    bs.toSeq.zipWithIndex.map { case (end, k) =>
      val start = if (k == 0) 1 else bs(k - 1) + 1
      (k + 1, start, s.substring(start - 1, end))
    }
  }

  test("gear CDC matches the independent rolling reference and tiles") {
    import org.apache.spark.sql.functions.col
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq((1L, text), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val got = Chunking.gearContentDefined(docs, "doc_id", "text", maskBits = 6)
      .orderBy(col("doc_id"), col("chunk_ix"))
      .as[(Long, Int, Int, String)].collect().toSeq
    val expect = refGearChunks(text, 6).map { case (ix, st, t) => (1L, ix, st, t) } ++
      Seq((2L, 1, 1, "tiny")) // empty doc yields nothing
    assert(got == expect)
    assert(got.filter(_._1 == 1L).map(_._4).mkString == text) // tiling
    assert(got.count(_._1 == 1L) > 2, "mean ~64 chars should chunk a 352-char doc")
  }

  test("gear CDC re-synchronizes after an edit (self-healing)") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 12)
    val a = refGearChunks(text, 6).map(_._3).toSet
    val b = refGearChunks("X" + text, 6).map(_._3).toSet
    assert((a intersect b).size >= a.size - 2,
      s"lost ${a.size - (a intersect b).size} of ${a.size} chunks")
  }

  test("sentence chunks: greedy budget, one-sentence overlap, " +
      "overflow sentences stand alone, no-overlap fallback") {
    val df = Seq((1L, Seq(4L, 5L, 3L, 12L, 2L, 9L)))
      .toDF("doc_id", "stok")
    val got = Chunking.sentenceChunks(df, "doc_id", "stok", budget = 10L)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
      .sortBy(_._2).toSeq
    // hand-walked: (1,2,9) close on s3; overlap s2 → (2,3,8) close on
    // s4; 3+12>10 so fresh → (4,4,12) the own-chunk overflow;
    // 12+2>10 fresh → (5,5,2); 2+9>10 fresh → (6,6,9)
    assert(got === Seq(
      (1L, 1, 1L, 2L, 9L, 2L),
      (1L, 2, 2L, 3L, 8L, 2L),
      (1L, 3, 4L, 4L, 12L, 1L),
      (1L, 4, 5L, 5L, 2L, 1L),
      (1L, 5, 6L, 6L, 9L, 1L)))
    // a sentence-less doc yields no chunks; a lone overbudget
    // sentence is its own chunk
    val edge = Seq((1L, Seq.empty[Long]), (2L, Seq(30L)))
      .toDF("doc_id", "stok")
    val e = Chunking.sentenceChunks(edge, "doc_id", "stok", budget = 10L)
      .as[(Long, Int, Long, Long, Long, Long)].collect().toSeq
    assert(e === Seq((2L, 1, 1L, 1L, 30L, 1L)))
  }
}
