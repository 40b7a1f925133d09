package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The portable fingerprint must match an independent JVM-side
  * reimplementation (md5 → nibble bits → majority vote), and the
  * banded pair join must equal the exhaustive Hamming filter — the
  * pigeonhole losslessness the operator's oracle check rests on.
  */
class PortableSimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: same definition, plain Scala. */
  private def referenceFp(text: String): Long = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    val sums = new Array[Int](60)
    for (t <- toks) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      for (p <- 0 until 60) {
        val nib = Integer.parseInt(hex.charAt(p / 4).toString, 16)
        val bit = (nib >> (3 - p % 4)) & 1
        sums(p) += 2 * bit - 1
      }
    }
    (0 until 60).map(p => if (sums(p) > 0) 1L << p else 0L).sum
  }

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
    (3L, "alpha beta gamma delta zeta"),    // near dup of 1
    (4L, "totally different text here now"),
    (5L, "   ")                             // no tokens -> no fingerprint
  ).toDF("doc_id", "text")

  test("fingerprints match the independent JVM reference bit-for-bit") {
    val got = PortableSimHash.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // doc 5 dropped
    assert(got(1L) == referenceFp("alpha beta gamma delta epsilon"))
    assert(got(3L) == referenceFp("alpha beta gamma delta zeta"))
    assert(got(4L) == referenceFp("totally different text here now"))
    assert(got(1L) == got(2L))
  }

  test("banded pairs equal the exhaustive Hamming filter (lossless)") {
    val base = (0 until 50).map(j => s"tok$j")
    val corpus = (0 until 20).map { i =>
      // docs 0-9 identical (Hamming 0 pairs); docs 10-19 each carry one
      // single-token edit on the 50-token base => a spread of small and
      // mid Hamming distances around the <=3 cutoff
      val words = if (i < 10) base
        else base.updated(i - 10, s"tok${i - 10}z")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val banded = PortableSimHash.nearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3, nBands = 4).as[(Long, Long, Long)].collect().toSet
    val fps = PortableSimHash.fingerprints(corpus, "doc_id", "text")
      .as[(Long, Long)].collect()
    val exhaustive = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(exhaustive.nonEmpty, "fixture should produce close pairs")
    assert(banded == exhaustive)
  }

  test("rejects lossy configurations") {
    intercept[IllegalArgumentException] {
      PortableSimHash.nearDupPairs(docs, "doc_id", "text",
        maxHamming = 4, nBands = 4)
    }
  }
}
