package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed rounds must match an independent in-memory
  * implementation of the same deterministic recurrence exactly, and
  * behave like community detection (dense groups converge).
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference of the identical synchronous recurrence. */
  private def reference(
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val e = edges.distinct
    var l = e.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      l = e.groupBy(_._2).map { case (dst, es) =>
        val counts = es.groupBy(x => l(x._1)).view.mapValues(_.size)
        dst -> counts.toSeq.sortBy { case (lab, c) => (-c, lab) }.head._1
      }
    }
    l
  }

  // two triangles bridged by one edge: {1,2,3} and {4,5,6}, bridge 3-4
  private val undirected = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
  private val edges = undirected ++ undirected.map(_.swap)

  test("matches the in-memory reference exactly over several round counts") {
    for (rounds <- Seq(1, 3, 4, 6)) {
      val got = LabelPropagation.propagate(edges.toDF("src", "dst"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == reference(edges, rounds), s"rounds=$rounds")
    }
  }

  test("triangles converge to intra-community labels") {
    val got = LabelPropagation.propagate(edges.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), got.toString)
    assert(got(5L) == got(6L), got.toString)
  }
}
