package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemanticDedup must equal an independent plain-Scala replay of its
  * own contract: md5-rank centroid draw, index-order squared-L2
  * argmin with lower-cell ties, within-cell-only lower-id cosine
  * prune, smallest qualifying partner wins.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // two tight clusters plus an outlier; ids chosen so both clusters
  // have intra-cluster near-duplicates
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1.0f, 0.1f, 0.0f),
    1L -> Seq(1.0f, 0.12f, 0.0f),  // near-dup of 0
    2L -> Seq(0.9f, 0.1f, 0.05f),  // near-dup of 0/1
    3L -> Seq(0.0f, 1.0f, 0.1f),
    4L -> Seq(0.0f, 1.0f, 0.12f),  // near-dup of 3
    5L -> Seq(0.1f, -0.9f, 0.9f))  // outlier

  private val Nlist = 2
  private val T = 0.95
  private val Salt = "semdedup_v1"

  /** Independent replay in plain Scala. */
  private def reference(): Map[Long, (Int, Option[Long], Boolean)] = {
    val byId = vecs.toMap.map { case (k, v) => k -> v.map(_.toDouble) }
    val centIds = vecs.map(_._1)
      .sortBy(id => (md5hex(s"$id:$Salt"), id)).take(Nlist)
    val cents = centIds.map(byId)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val cell = byId.map { case (id, v) =>
      id -> cents.zipWithIndex.minBy { case (c, i) => (d2(v, c), i) }._2
    }
    byId.keys.map { id =>
      val dups = byId.keys.filter(o =>
        o < id && cell(o) == cell(id) && cos(byId(o), byId(id)) >= T).toSeq
      val dupOf = if (dups.isEmpty) None else Some(dups.min)
      id -> ((cell(id), dupOf, dupOf.isEmpty))
    }.toMap
  }

  test("matches the independent replay: cells, dup_of, keep") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = SemanticDedup.semanticDedup(df, "vec_id", "embedding",
        nlist = Nlist, threshold = T, salt = Salt)
      .select("vec_id", "cell", "dup_of", "keep")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3))))
      .toMap
    assert(got == reference())
    // fixture sanity: at least one duplicate found and one survivor
    assert(got.values.exists(!_._3) && got.values.exists(_._3))
  }

  test("keep is exactly dup_of IS NULL and dup_of is a lower id") {
    val df = vecs.toDF("vec_id", "embedding")
    SemanticDedup.semanticDedup(df, "vec_id", "embedding",
        nlist = Nlist, threshold = T, salt = Salt)
      .collect().foreach { r =>
        val id = r.getLong(0)
        val dupOf = if (r.isNullAt(2)) None else Some(r.getLong(2))
        assert(r.getBoolean(4) == dupOf.isEmpty)
        dupOf.foreach(d => assert(d < id))
      }
  }
}
