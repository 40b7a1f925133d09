package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The logit must equal the hand-computed pinned-weight formula over
  * independently recomputed features, and `keep` must be the sign of
  * the UNROUNDED logit.
  */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stops = Set("the", "and", "of", "to", "a", "in", "is", "it")

  /** Independent feature + logit replay in plain Scala. */
  private def refLogit(text: String): Double = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val len = text.length.toDouble
    val fLen = if (n == 0) 0.0 else n.toDouble / (n + 100).toDouble
    val fDist = if (n == 0) 0.0 else toks.distinct.length.toDouble / n
    val fStop = if (n == 0) 0.0 else toks.count(stops).toDouble / n
    val nChars = text.replaceAll("\\s+", "").length.toDouble
    val fMean = if (n == 0) 0.0 else nChars / n
    val nPunct = (text.length -
      text.replaceAll("[\\p{Punct}]", "").length).toDouble
    val fPunct = if (len == 0) 0.0 else nPunct / len
    val nUpper = (text.length - text.replaceAll("[A-Z]", "").length).toDouble
    val fUpper = if (len == 0) 0.0 else nUpper / len
    QualityModel.Intercept +
      QualityModel.WLen * fLen +
      QualityModel.WDistinct * fDist +
      QualityModel.WStop * fStop +
      QualityModel.WMeanLen * fMean +
      QualityModel.WPunct * fPunct +
      QualityModel.WUpper * fUpper
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and it is fine"),
    (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"), // punctuation bomb
    (3L, "SHOUTING VERY LOUD CAPITAL TEXT HERE NOW"),
    (4L, "a a a a a a a a a a a a a a a a"),          // degenerate repeat
    (5L, ""),                                          // empty
    (6L, "supercalifragilisticexpialidocious" * 3))    // one huge token

  test("logit matches the independent replay to 6 dp; keep = sign") {
    val got = QualityModel.score(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.length == docs.size)
    got.foreach { case (id, logit, keep) =>
      val text = docs.find(_._1 == id).get._2
      val ref = refLogit(text)
      assert(math.abs(logit -
        BigDecimal(ref).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9, s"doc $id: got $logit want ~$ref")
      assert(keep == (ref >= 0.0), s"doc $id keep")
    }
  }

  test("the fixture separates good text from junk") {
    val byId = QualityModel.score(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byId(1L), "clean english sentence should pass")
    assert(!byId(2L), "pure punctuation should fail")
  }
}
