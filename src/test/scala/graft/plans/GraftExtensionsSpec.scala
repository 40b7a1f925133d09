package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  // Extensions apply at session construction: clear the default/active
  // bookkeeping so getOrCreate builds a NEW SparkSession (sharing the
  // JVM's SparkContext) with the extensions installed. Other suites
  // keep their direct reference to the shared TestSpark session.
  private lazy val spark: SparkSession = {
    graft.TestSpark.spark // ensure the shared context exists first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("custom kernels callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  graft_word_shingles(array('a','b','c'), 2) AS ws,
        |  graft_char_shingles('abcd', 3) AS cs,
        |  size(graft_minhash_sig(array('x','y'), 16)) AS sig_len,
        |  graft_simhash64(array('tok')) AS sh,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  round(graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cos
        |""".stripMargin).first()
    assert(row.getAs[collection.Seq[String]]("ws").toSet == Set("a b", "b c"))
    assert(row.getAs[collection.Seq[String]]("cs").toSet == Set("abc", "bcd"))
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Double]("cos") == 1.0)
  }
}
