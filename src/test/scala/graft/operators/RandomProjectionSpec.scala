package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JL projection against an independent plain-JVM re-computation
  * (MessageDigest md5 + integer arithmetic — no Spark expressions),
  * plus the distortion audit's degenerate edges.
  */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sign(salt: String, i: Int, j: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$salt:$i:$j".getBytes("UTF-8"))
    val nibble = (d(0) >> 4) & 0xf
    if (nibble >= 8) -1L else 1L
  }

  private def lat6(x: Double): Long =
    Math.round(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble * 1e6)

  private def jvmProject(v: Array[Double], outDims: Int,
      salt: String): Array[Double] = {
    val r = math.sqrt(outDims.toDouble).toInt
    Array.tabulate(outDims) { j =>
      val s = v.indices.map(i => lat6(v(i)) * sign(salt, i, j)).sum
      val y6 = if (s >= 0) (s + r / 2) / r else -((-s + r / 2) / r)
      y6.toDouble / 1e6
    }
  }

  test("project matches an independent JVM md5+integer re-computation") {
    val vecs = Seq(
      (0L, Array(0.5f, -1.25f, 2.0f, 0.333333f)),
      (1L, Array(-0.000001f, 0.000002f, 10.0f, -9.5f)))
    val out = RandomProjection.project(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        inDims = 4, outDims = 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    for ((id, v) <- vecs) {
      val exp = jvmProject(v.map(_.toDouble), 4, "jl_v1")
      for (j <- 0 until 4)
        assert(out((id, j)) === exp(j),
          s"vec $id dim $j: got ${out((id, j))}, expected ${exp(j)}")
    }
  }

  test("distortion: identical pair → zero distances, null ratio") {
    val v = Array.tabulate(8)(i => (i * 0.25f) - 1.0f)
    val df = Seq((0L, v), (1L, v), (2L, v), (3L, v.map(x => x + 1.0f)))
      .toDF("vec_id", "embedding")
    val out = RandomProjection.distortionPairs(
        df, "vec_id", "embedding", inDims = 8, outDims = 4, maxId = 4L)
      .collect().map(r => (r.getLong(0),
        (r.getDouble(2), r.getDouble(3), r.isNullAt(4)))).toMap
    assert(out(0L) === ((0.0, 0.0, true))) // identical pair
    val (d2o, d2p, isNull) = out(2L)
    assert(d2o === 8.0 && !isNull) // 8 dims × 1.0² shift
    assert(d2p >= 0.0)
  }
}
