package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.perNode(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("triangle + pendant edge, mixed directions, dup edges, self-loop") {
    // triangle 1-2-3 (edge 3-1 given reversed + duplicated), pendant 3-4,
    // self-loop 5-5 must vanish entirely
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L), (5L, 5L)))
    assert(got == Map(
      1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((3L, 1L)), 4L -> ((1L, 0L))))
  }

  test("two triangles sharing an edge") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(got.view.mapValues(_._2).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("matches brute-force enumeration on a random graph") {
    // deterministic pseudo-random graph on 12 nodes
    val edges = (for {
      i <- 0 until 12; j <- (i + 1) until 12
      if (i * 31 + j * 17 + i * j) % 3 == 0
    } yield (i.toLong, j.toLong)).toSeq
    val es = edges.toSet
    def hasEdge(x: Long, y: Long) = es.contains((math.min(x, y), math.max(x, y)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map { v =>
      val deg = edges.count(e => e._1 == v || e._2 == v).toLong
      val tri = (for {
        x <- nodes; y <- nodes
        if x < y && hasEdge(v, x) && hasEdge(v, y) && hasEdge(x, y)
      } yield 1).size.toLong
      v -> ((deg, tri))
    }.toMap
    assert(run(edges) == expected)
  }
}
