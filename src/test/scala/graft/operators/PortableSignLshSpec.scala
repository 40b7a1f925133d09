package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The md5 planes and sign buckets must match an independent JVM-side
  * reimplementation, and the multi-probe pair set must equal the
  * closed-form Hamming ≤ 2 predicate the oracle states — the blocking
  * equivalence the operator's oracle check rests on.
  */
class PortableSignLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 4
  private val Planes = 6

  private def md5FirstNibble(s: String): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (h(0) >> 4) & 0xf
  }

  /** Independent reference: same definitions, plain Scala. */
  private def refBucket(v: Seq[Float]): Long =
    (0 until Planes).map { h =>
      val s = (0 until Dim).map { d =>
        val w = if (md5FirstNibble(s"$h:$d") >= 8) 1.0 else -1.0
        v(d).toDouble * w
      }.sum
      if (s >= 0) 1L << h else 0L
    }.sum

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private lazy val vecs: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1f, 0f, 0f, 0f),
    2L -> Seq(1f, 0.01f, 0f, 0f),    // near dup of 1
    3L -> Seq(0f, 1f, 0f, 0f),
    4L -> Seq(-1f, 0f, 0f, 0f),      // opposite of 1
    5L -> Seq(0.9f, 0.1f, 0.05f, 0f) // close-ish to 1
  )

  test("planes and buckets match the independent JVM reference") {
    val planes = PortableSignLsh.md5SignPlanes(Planes, Dim)
    for (h <- 0 until Planes; d <- 0 until Dim) {
      val expect = if (md5FirstNibble(s"$h:$d") >= 8) 1.0 else -1.0
      assert(planes(h)(d) == expect, s"plane ($h,$d)")
    }
    val got = PortableSignLsh.buckets(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", Planes, Dim)
      .select("vec_id", "bucket0").as[(Long, Long)].collect().toMap
    for ((id, v) <- vecs) assert(got(id) == refBucket(v), s"vec $id")
  }

  test("emitted pairs = Hamming(bucket) <= 2 AND cosine >= threshold") {
    val threshold = 0.4
    val byId = vecs.toMap
    val expected = (for {
      a <- byId.keys; b <- byId.keys if a < b
      if java.lang.Long.bitCount(refBucket(byId(a)) ^ refBucket(byId(b))) <= 2
      c = refCosine(byId(a), byId(b)) if c >= threshold
    } yield (a, b, BigDecimal(c).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val got = PortableSignLsh.nearDupPairs(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", Dim, Planes, threshold)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L }) // near dup found
  }
}
