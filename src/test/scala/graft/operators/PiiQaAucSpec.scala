package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PiiQaAucSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Luhn validation gates the card mask; shape alone does not") {
    val df = Seq(
      (1L, "pay 4111111111111111 now"),          // valid → masked
      (2L, "pay 4111111111111112 now"),          // invalid → kept
      (3L, "run 12345678901234567 over"),        // 17 digits → no candidate
      (4L, "amex 378282246310005 ok")            // 15-digit valid
    ).toDF("id", "t")
    val out = PiiValidate.audit(df, "id", "t")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(5)))).toMap
    assert(out(1L) === ((1L, 1L, "pay <CARD> now")))
    assert(out(2L) === ((1L, 0L, "pay 4111111111111112 now")))
    assert(out(3L) === ((0L, 0L, "run 12345678901234567 over")))
    assert(out(4L) === ((1L, 1L, "amex <CARD> ok")))
  }

  test("IP octet validation: 300.1.2.3 is not an IP") {
    val df = Seq(
      (1L, "from 10.0.0.1 and 300.1.2.3 end"),
      (2L, "from 255.255.255.255 end")
    ).toDF("id", "t")
    val out = PiiValidate.audit(df, "id", "t")
      .collect().map(r => (r.getLong(0),
        (r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) === ((2L, 1L, "from <IP> and 300.1.2.3 end")))
    assert(out(2L) === ((1L, 1L, "from <IP> end")))
  }

  test("QA eval: SQuAD normalization, clipped F1, empty conventions") {
    val df = Seq(
      (1L, "The Eiffel Tower!", "eiffel tower"),      // EM after norm
      (2L, "eiffel tower paris", "eiffel tower"),      // partial
      (3L, "", ""),                                    // both empty → 1.0
      (4L, "", "eiffel"),                              // pred empty → 0.0
      (5L, "a a the", "an")                            // all articles → empty
    ).toDF("id", "pred", "gold")
    val out = QaEval.score(df, "id", "pred", "gold")
      .collect().map(r => (r.getLong(0), (r.getBoolean(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(out(1L) === ((true, 1.0, 1.0, 1.0)))
    // overlap 2, |p|=3, |g|=2 → P=2/3, R=1, F1=2·2/5
    assert(out(2L) === ((false, 2.0 / 3.0, 1.0, 0.8)))
    assert(out(3L) === ((true, 1.0, 1.0, 1.0)))
    assert(out(4L) === ((false, 0.0, 0.0, 0.0)))
    assert(out(5L) === ((true, 1.0, 1.0, 1.0))) // both normalize to []
  }

  test("QA eval clips repeated prediction tokens") {
    val df = Seq((1L, "yes yes yes yes", "yes no")).toDF("id", "p", "g")
    val r = QaEval.score(df, "id", "p", "g").collect().head
    assert(r.getLong(3) === 1L) // overlap clipped to min(4, 1)
    assert(r.getDouble(7) === 2.0 * 1.0 / 6.0)
  }

  test("ROC-AUC: tie-aware hand case and the degenerate null") {
    val df = Seq(
      (0.9, 1), (0.8, 0), (0.8, 1), (0.1, 0)
    ).toDF("score", "label")
    val r = RocAuc.auc(df, "score", "label").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 2L)))
    // pairs: (.9,.1)=1 (.9,.8)=1 (.8+,.1)=1 (.8+,.8-)=½ → 3.5/4
    assert(r.getDouble(3) === 0.875)
    val onlyPos = Seq((0.5, 1), (0.7, 1)).toDF("score", "label")
    assert(RocAuc.auc(onlyPos, "score", "label").collect().head.isNullAt(3))
  }

  test("ROC-AUC: perfect separation scores 1.0") {
    val df = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    assert(RocAuc.auc(df, "score", "label")
      .collect().head.getDouble(3) === 1.0)
  }
}
