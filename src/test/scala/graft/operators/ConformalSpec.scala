package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Split-conformal calibration against a plain-Scala replay. */
class ConformalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5mod(key: String, m: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (BigInt(hex.take(15), 16) % m).toLong
  }

  test("threshold is the ceil((n+1)(1-alpha)) order statistic and " +
      "coverage is the exact held-out fraction") {
    val ids = 0L until 200L
    val score = ids.map(d => d -> md5mod(s"$d:sc_v1", 1000001L)).toMap
    val isCal = ids.map(d => d -> (md5mod(s"$d:sc_split", 2L) == 0L)).toMap

    val calScores = ids.filter(isCal).map(score).sorted
    val nCal = calScores.length.toLong
    val k = ((nCal + 1) * 9 + 9) / 10
    val qhat = calScores((k - 1).toInt)
    val test = ids.filterNot(isCal).map(score)
    val covered = test.count(_ <= qhat).toLong

    val out = Conformal.splitConformal(
        ids.map(d => (d, score(d))).toDF("id", "s6"),
        "id", "s6", alphaNum = 1, alphaDen = 10,
        splitSalt = "sc_split")
      .collect()(0)
    assert(out.getLong(0) === nCal)
    assert(out.getLong(1) === test.length.toLong)
    assert(out.getLong(2) === k)
    assert(out.getLong(3) === qhat)
    assert(out.getDouble(4) === qhat.toDouble / 1000000.0)
    assert(out.getLong(5) === covered)
    assert(out.getDouble(6) === covered.toDouble / test.length)
    // the guarantee direction on this fixture: coverage near 1-alpha
    assert(out.getDouble(6) >= 0.8 && out.getDouble(6) <= 1.0)
  }
}
