package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer-lattice HITS. */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-walked 2-round fixed point on a bipartite graph; pure " +
      "hubs/authorities score exact zero on the other side") {
    // s1 -> {p1, p2}, s2 -> {p1}; N = 4, scale = 4e6
    // unnormalized: r1 a=(2e6,1e6) h=(3e6,2e6);
    //               r2 a=(5e6,3e6) h=(8e6,5e6)
    // closing L1 normalization: a = (2500000, 1500000),
    //   h = (8·4e12 div 13e6, 5·4e12 div 13e6) = (2461538, 1538461)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("src", "dst")
    val out = Hits.microHits(edges, iterations = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2461538L, 0L)))
    assert(out(2L) === ((1538461L, 0L)))
    assert(out(10L) === ((0L, 2500000L)))
    assert(out(11L) === ((0L, 1500000L)))
  }

  test("duplicate edges collapse before the rounds") {
    val edges = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("src", "dst")
    val once = Hits.microHits(Seq((1L, 10L), (2L, 10L))
      .toDF("src", "dst"), 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dup = Hits.microHits(edges, 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once === dup)
  }
}
