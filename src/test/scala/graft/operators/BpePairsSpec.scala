package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pair counts are word-frequency-weighted and exact") {
    // "ab ab ab cd" -> words {ab:3, cd:1}; pairs (a,b):3, (c,d):1
    val docs = Seq((1L, "ab ab AB"), (2L, "ab cd x")).toDF("doc_id", "text")
    val got = BpePairs.pairCounts(docs, "text", minCount = 1L)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 4L), ("c", "d", 1L)))
    // 1-char word "x" contributes nothing; threshold drops (c,d)
    val thresholded = BpePairs.pairCounts(docs, "text", minCount = 2L)
      .as[(String, String, Long)].collect().toSet
    assert(thresholded == Set(("a", "b", 4L)))
  }

  test("overlapping pairs within a word all count") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = BpePairs.pairCounts(docs, "text", 1L)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "a", 2L)))
  }
}
