package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The k-center trajectory must equal an independent plain-Scala
  * farthest-point replay, and the greedy property must hold: each
  * selected point was the farthest (by min distance to the selected
  * set) among the not-yet-selected at its round.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated groups plus satellites: the traversal must
  // visit each group before densifying any one of them
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(0.0f, 0.0f),
    1L -> Seq(0.1f, 0.1f),
    2L -> Seq(10.0f, 0.0f),
    3L -> Seq(10.1f, 0.2f),
    4L -> Seq(0.0f, 10.0f),
    5L -> Seq(0.3f, 10.2f),
    6L -> Seq(5.0f, 5.0f))
  private val K = 4

  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  private def reference(): Seq[(Int, Long, Option[Double])] = {
    val byId = vecs.toMap.map { case (k, v) => k -> v.map(_.toDouble) }
    var selected = List(byId.keys.min)
    var out = List[(Int, Long, Option[Double])]((1, selected.head, None))
    for (r <- 2 to K) {
      val (id, dist) = byId.keys.filterNot(selected.contains).map { id =>
        id -> selected.map(s => d2(byId(id), byId(s))).min
      }.minBy { case (id, d) => (-d, id) }
      selected = selected :+ id
      out = out :+ ((r, id, Some(BigDecimal(dist).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }
    out
  }

  test("trajectory equals the independent farthest-point replay") {
    val got = Coreset.kCenterCoreset(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = K)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toList
    assert(got == reference())
  }

  test("the traversal visits every separated group before densifying") {
    val picks = Coreset.kCenterCoreset(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4)
      .collect().map(_.getLong(1)).toSeq
    // one pick from each of the three corners plus the middle point —
    // never two picks from the same tight pair in the first four
    val groups = picks.take(4).map {
      case 0L | 1L => "a"; case 2L | 3L => "b"; case 4L | 5L => "c"
      case 6L => "mid"
    }
    assert(groups.distinct.size == 4, s"picks $picks")
  }
}
