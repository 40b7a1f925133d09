package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedMinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted jaccard sees frequency where set jaccard cannot") {
    val docs = Seq(
      (1L, "spam spam spam spam"),
      (2L, "spam"),
      (3L, "spam spam spam spam"),
      (4L, "alpha beta beta gamma"),
      (5L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = WeightedMinHash.pairJaccard(docs, "doc_id", "text", pairs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // set jaccard of 1-2 is 1.0; capped-weighted exact = 1/4
    val (est12, ex12, n12) = out((1L, 2L))
    assert(ex12 === 0.25 && n12 === 1L)
    assert(est12 >= 0.0 && est12 <= 1.0)
    // identical multisets: every seed min matches — est exactly 1
    assert(out((1L, 3L)) === ((1.0, 1.0, 1L)))
    // alpha+beta shared (min 1+1), union alpha1 beta2 delta1 gamma1
    val (_, ex45, n45) = out((4L, 5L))
    assert(ex45 === 0.4 && n45 === 4L) // 2 / 5
  }
}
