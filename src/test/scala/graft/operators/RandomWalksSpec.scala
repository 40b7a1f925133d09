package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The walk corpus must equal an independent plain-Scala replay of
  * the md5-draw recurrence, and determinism must hold across
  * partitionings (the property RNG-state walks lose under retry).
  */
class RandomWalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a small graph with mixed degrees and a dead end (node 9)
  private val edgeList: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 3L), (3L, 1L),
    (4L, 9L), (3L, 4L), (2L, 3L) /* duplicate edge */)
  private val Seeds = Seq(1L, 2L)
  private val WPS = 2
  private val Steps = 3
  private val Salt = "walk_v1"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def reference(): Set[(String, Int, Long)] = {
    val adj = edgeList.distinct.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).distinct.sorted }
    val out = scala.collection.mutable.Set.empty[(String, Int, Long)]
    for (seed <- Seeds; r <- 0 until WPS) {
      val id = s"${seed}_$r"
      var cur = seed
      out += ((id, 0, cur))
      var t = 1
      var alive = true
      while (t <= Steps && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val draw = java.lang.Long.parseLong(
              md5hex(s"$Salt:$seed:$r:$t").substring(0, 6), 16) % nbrs.size
            cur = nbrs(draw.toInt)
            out += ((id, t, cur))
          case None => alive = false // dead end: walk stops
        }
        t += 1
      }
    }
    out.toSet
  }

  private def run(parts: Int): Set[(String, Int, Long)] =
    RandomWalks.walks(
        edgeList.toDF("src", "dst").repartition(parts),
        "src", "dst", Seeds.toDF("seed"), "seed",
        walksPerSeed = WPS, steps = Steps, salt = Salt)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("walk corpus equals the independent md5 replay, dead ends stop") {
    val got = run(3)
    assert(got == reference())
    // the dead-end node is reachable and some walk dies there early
    assert(got.exists(_._3 == 9L))
  }

  test("identical corpus under a different partitioning") {
    assert(run(1) == run(5))
  }
}
