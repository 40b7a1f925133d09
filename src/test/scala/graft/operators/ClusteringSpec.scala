package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer Lloyd's: bit-equality with an independent reference. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  /** Plain-Scala reference: same quantization, init, argmin and
    * integer-mean update — no Spark involved.
    */
  private def ref(rows: Seq[(Long, Seq[Float])], k: Int,
      rounds: Int): Map[Long, (Int, Long)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong + 1000L) }
    var cents: Seq[(Int, Seq[Long])] = q
      .sortBy { case (id, _) => (md5hex(id + ":km_v1"), id) }
      .take(k).map(_._2).zipWithIndex.map { case (c, i) => (i, c) }
    var result: Map[Long, (Int, Long)] = Map.empty
    for (r <- 1 to rounds) {
      val assigned = q.map { case (id, vq) =>
        val (d, ci) = cents.map { case (ci, c) =>
          (vq.lazyZip(c).map((a, b) => (a - b) * (a - b)).sum, ci) }.min
        (id, vq, ci, d)
      }
      if (r < rounds) {
        cents = assigned.groupBy(_._3).toSeq.map { case (ci, grp) =>
          // non-negative sums: Long '/' truncation == floor here
          (ci, grp.head._2.indices
            .map(i => grp.map(_._2(i)).sum / grp.size))
        }.sortBy(_._1)
      } else result = assigned.map(a => a._1 -> ((a._3, a._4))).toMap
    }
    result
  }

  test("matches the reference over several round counts") {
    // deterministic pseudo-embeddings in [-0.5, 0.5), 8 dims
    val rows = (0L until 60L).map { id =>
      (id, (0 until 8).map { d =>
        (((id * 31 + d * 17 + 7) % 100) / 100.0f) - 0.5f })
    }
    val df = rows.toDF("id", "vec")
    for (rounds <- Seq(1, 2, 3)) {
      val got = Clustering.quantizedKMeans(df, "id", "vec", k = 3,
          rounds = rounds)
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == ref(rows, 3, rounds), s"rounds=$rounds")
    }
  }

  test("distance ties break to the lower centroid index") {
    // two identical init centroids (duplicate points win init):
    // every point is equidistant -> all land on the lower cidx
    val rows = Seq((1L, Seq(0.1f, 0.1f)), (2L, Seq(0.1f, 0.1f)),
      (3L, Seq(0.3f, 0.3f)))
    val df = rows.toDF("id", "vec")
    val got = Clustering.quantizedKMeans(df, "id", "vec", k = 2, rounds = 1)
      .as[(Long, Int, Long)].collect()
    val byId = got.map(r => r._1 -> r._2).toMap
    val initIds = rows.map(_._1)
      .sortBy(id => (md5hex(id + ":km_v1"), id)).take(2)
    // whichever two seeded: the duplicate pair (1,2) are equidistant
    // to any centroid pair containing both of their quantized vectors
    if (initIds.toSet == Set(1L, 2L)) {
      assert(byId(1L) == 0 && byId(2L) == 0)
    }
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("coordinates below -shift/scale fail fast (floor/trunc parity " +
      "guard)") {
    // -1.5 quantizes to floor(-1500) + 1000 = -500 < 0: the integer
    // mean's floor-vs-truncate agreement (and the oracle's `//`
    // parity) would silently break, so the quantizer must raise
    val df = Seq((1L, Seq(-1.5f, 0.0f)), (2L, Seq(0.5f, 0.5f)))
      .toDF("id", "vec")
    val e = intercept[Exception] {
      Clustering.quantizedKMeans(df, "id", "vec", k = 1, rounds = 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("coordinate below")))
  }
}
