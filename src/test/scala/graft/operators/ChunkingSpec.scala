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
}
