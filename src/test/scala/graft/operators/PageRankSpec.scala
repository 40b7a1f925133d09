package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed iteration must match an independent in-memory
  * implementation of the same fixed-point recurrence bit-for-bit, and
  * behave like PageRank (hubs outrank leaves, mass ≈ N·10⁶).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference of the identical integer recurrence. */
  private def reference(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val sums = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(x => r(x._1) / outdeg(x._1)).sum
      }
      r = nodes.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  // star around hub 1 plus a chain: 1<->2, 1<->3, 1<->4, 4<->5
  private val undirected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
  private val edges = undirected ++ undirected.map(_.swap)

  test("matches the independent fixed-point reference exactly") {
    val got = PageRank.microPageRank(edges.toDF("src", "dst"), iterations = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 8))
  }

  test("undirected fast-path flags are bit-equal to the default path") {
    val got = PageRank.microPageRank(edges.toDF("src", "dst"), 8,
      everyNodeHasOutEdge = true, everyNodeHasInEdge = true)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 8))
  }

  test("shuffle-hash regime (broadcastThreshold=1) is bit-equal") {
    val got = PageRank.microPageRank(edges.toDF("src", "dst"), 8,
      broadcastThreshold = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 8))
  }

  test("shuffle-hash regime with undirected flags is bit-equal") {
    val got = PageRank.microPageRank(edges.toDF("src", "dst"), 8,
      everyNodeHasOutEdge = true, everyNodeHasInEdge = true,
      broadcastThreshold = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 8))
  }

  test("hub outranks leaves and micro-mass stays near N*1e6") {
    val got = PageRank.microPageRank(edges.toDF("src", "dst"), 8)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L) && got(1L) > got(5L))
    // floor leaks at most a few micro-units per node per round
    assert(math.abs(got.values.sum - 5000000L) < 1000L)
  }
}
