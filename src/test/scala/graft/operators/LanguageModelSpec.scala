package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kneser-Ney bigram estimates must equal hand-computed values on a
  * corpus small enough to derive every count on paper, and the
  * smoothed mass over observed continuations must stay below 1
  * (the held-out mass goes to unseen continuations by construction).
  */
class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: "a b a c" + "b a b"
  // bigram counts: (a,b)=2, (b,a)=2, (a,c)=1
  // c(a·)=3, c(b·)=2; N1+(a·)=2, N1+(b·)=1
  // N1+(·a)=1, N1+(·b)=1, N1+(·c)=1; N1+(··)=3; D=0.75
  // P(b|a) = 1.25/3 + (1.5/3)·(1/3)  = 0.583333
  // P(c|a) = 0.25/3 + (1.5/3)·(1/3)  = 0.25
  // P(a|b) = 1.25/2 + (0.75/2)·(1/3) = 0.75
  private val docs = Seq((1L, "a b a c"), (2L, "b a b"))

  test("hand-computed KN probabilities on the paper corpus") {
    val got = LanguageModel.knBigramProbs(docs.toDF("doc_id", "text"), "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(got(("a", "b")) == ((2L, 0.583333)))
    assert(got(("a", "c")) == ((1L, 0.25)))
    assert(got(("b", "a")) == ((2L, 0.75)))
  }

  test("observed-continuation mass per prefix stays in (0, 1)") {
    val rows = LanguageModel.knBigramProbs(
        docs.toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (w1, ps) =>
      val mass = ps.map(_._2).sum
      assert(mass > 0.0 && mass < 1.0, s"prefix $w1 mass $mass")
    }
  }

  test("rejects out-of-range discounts") {
    intercept[IllegalArgumentException] {
      LanguageModel.knBigramProbs(docs.toDF("doc_id", "text"), "text",
        discount = 1.0)
    }
  }

  test("perplexity score: hand-derived lattice means on the paper corpus") {
    def lt(p: Double): Long = math.round(math.log(p) * 1e8)
    def score(lts: Seq[Long]): Double =
      BigDecimal(-((lts.sum.toDouble / 1e8) / lts.size.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 "a b a c": (a,b),(b,a),(a,c); doc 2 "b a b": (b,a),(a,b)
    val expected = Map(
      1L -> ((3L, score(Seq(lt(0.583333), lt(0.75), lt(0.25))))),
      2L -> ((2L, score(Seq(lt(0.75), lt(0.583333))))))
    val got = LanguageModel.perplexityScore(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // the repetitive doc 2 must be more predictable than doc 1
    assert(got(2L)._2 < got(1L)._2)
  }

  test("windowed perplexity: doc mean equals the flat perplexityScore, " +
      "worst >= avg >= best, and an oversized window collapses to one") {
    // corpus with enough bigrams for several 4-bigram windows
    val docs = Seq(
      (1L, "a b a c a b a c a b a c a b"),
      (2L, "b a b a b a b"),
      (3L, "a b")).toDF("doc_id", "text")
    val flat = LanguageModel.perplexityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val win = LanguageModel.windowedPerplexity(docs, "doc_id", "text",
      windowTokens = 4).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_neg_logp"),
        r.getAs[Int]("worst_window"), r.getAs[Int]("worst_start"),
        r.getAs[Int]("worst_end"), r.getAs[Double]("worst_neg_logp"),
        r.getAs[Int]("best_window"), r.getAs[Double]("best_neg_logp")))
    }.toMap
    for ((id, (n, avg)) <- flat) {
      val (nw, nb, wavg, wwin, wst, wen, worst, bwin, best) = win(id)
      assert(nb == n, s"doc $id bigram count $nb vs flat $n")
      assert(nw == (n + 3) / 4, s"doc $id windows $nw for $n bigrams")
      assert(wavg == avg, s"doc $id mean $wavg vs flat $avg")
      assert(worst >= wavg - 1e-9 && wavg >= best - 1e-9,
        s"doc $id order: worst=$worst avg=$wavg best=$best")
      assert(wwin >= 0 && wwin < nw && bwin >= 0 && bwin < nw)
      // span bounds: window w scores bigram positions [w·4, min((w+1)·4, n))
      assert(wst == wwin * 4, s"doc $id worst_start $wst for window $wwin")
      assert(wen == math.min((wwin + 1) * 4L, nb),
        s"doc $id worst_end $wen for window $wwin, $nb bigrams")
      assert(wen > wst, s"doc $id empty span [$wst, $wen)")
    }
    // window wider than any doc: one window, worst == best == avg,
    // span = the whole bigram stream
    val one = LanguageModel.windowedPerplexity(docs, "doc_id", "text",
      windowTokens = 64).collect()
    assert(one.forall(r => r.getAs[Long]("n_windows") == 1L))
    assert(one.forall(r =>
      r.getAs[Double]("worst_neg_logp") == r.getAs[Double]("avg_neg_logp") &&
        r.getAs[Double]("best_neg_logp") == r.getAs[Double]("avg_neg_logp")))
    assert(one.forall(r => r.getAs[Int]("worst_start") == 0 &&
      r.getAs[Int]("worst_end") == r.getAs[Long]("n_bigrams")))
  }

  test("worstWindowCut: margin gates the cut; a cut drops exactly the " +
      "[worst_start, worst_end] token span and the kept digest matches") {
    val docs = Seq(
      (1L, "a b a c a b a c a b a c a b"),
      (2L, "a b")).toDF("doc_id", "text")
    // unreachable margin: nothing cuts, kept = the full token stream
    val none = LanguageModel.worstWindowCut(docs, "doc_id", "text",
      windowTokens = 4, margin = 1000.0).collect()
    assert(none.nonEmpty)
    assert(none.forall(!_.getAs[Boolean]("cut")))
    for (r <- none)
      assert(r.getAs[Int]("n_tokens_kept") == r.getAs[Int]("n_tokens"))
    // margin 0: every multi-window doc cuts its worst window
    val cut = LanguageModel.worstWindowCut(docs, "doc_id", "text",
        windowTokens = 4, margin = 0.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = cut(1L)
    assert(r1.getAs[Boolean]("cut"))
    val ws = r1.getAs[Int]("worst_start")
    val we = r1.getAs[Int]("worst_end")
    assert(r1.getAs[Int]("n_tokens_kept") ===
      r1.getAs[Int]("n_tokens") - (we - ws + 1))
    val toks = "a b a c a b a c a b a c a b".split(" ").toSeq
    val kept = toks.take(ws) ++ toks.drop(we + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(kept.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getAs[String]("kept_md5") === md)
    // a single-window doc never cuts, even at margin 0
    assert(!cut(2L).getAs[Boolean]("cut"))
  }

  test("worstWindowCutCalibration: the profile-once margin table is " +
      "monotone in margin and equals worstWindowCut's own aggregate " +
      "at every margin") {
    val docs = Seq(
      (1L, "a b a c a b a c a b a c a b"),
      (2L, "a b"),
      (3L, "a c a c b b a b a c b a")).toDF("doc_id", "text")
    val margins = Seq(0.125, 0.25, 0.5, 1.0)
    val cal = LanguageModel.worstWindowCutCalibration(docs, "doc_id",
        "text", windowTokens = 4, margins = margins)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(cal.keySet === margins.toSet)
    // the population and token totals are margin-independent
    assert(margins.map(cal(_)._1).distinct.size === 1)
    assert(margins.map(cal(_)._3).distinct.size === 1)
    // cut-rate and removal are monotone non-increasing in margin
    val cuts = margins.map(cal(_)._2)
    assert(cuts === cuts.sorted.reverse, s"docs_cut not monotone: $cuts")
    val rms = margins.map(cal(_)._4)
    assert(rms === rms.sorted.reverse, s"tokens_removed not monotone: $rms")
    // every margin row equals the cut operator's own aggregate — the
    // q337-consistency contract, checked at all four margins
    for (m <- margins) {
      val ww = LanguageModel.worstWindowCut(docs, "doc_id", "text",
        windowTokens = 4, margin = m).collect()
      val (nDocs, docsCut, tokTotal, tokRemoved, share) = cal(m)
      assert(nDocs === ww.length.toLong, s"margin $m n_docs")
      assert(docsCut === ww.count(_.getAs[Boolean]("cut")).toLong,
        s"margin $m docs_cut")
      assert(tokTotal === ww.map(_.getAs[Int]("n_tokens").toLong).sum,
        s"margin $m tokens_total")
      assert(tokRemoved === ww.map(r => (r.getAs[Int]("n_tokens")
        - r.getAs[Int]("n_tokens_kept")).toLong).sum,
        s"margin $m tokens_removed")
      assert(share === tokRemoved.toDouble / tokTotal.toDouble)
    }
    // margins must be distinct ascending and positive
    intercept[IllegalArgumentException] {
      LanguageModel.worstWindowCutCalibration(docs, "doc_id", "text",
        windowTokens = 4, margins = Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      LanguageModel.worstWindowCutCalibration(docs, "doc_id", "text",
        windowTokens = 4, margins = Seq.empty)
    }
  }

  test("min-K%: bottom-ceil(n/5) mean over the lattice log-probs") {
    def lt(p: Double): Long = math.round(math.log(p) * 1e8)
    def score(lts: Seq[Long]): Double =
      BigDecimal(-((lts.sum.toDouble / 1e8) / lts.size.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = LanguageModel.minKProbScore(
        docs.toDF("doc_id", "text"), "doc_id", "text", kNum = 1, kDen = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // doc 1: n=3 → k=1; rarest position is (a,c) at p=0.25
    assert(got(1L)._1 === 3L && got(1L)._2 === 1L)
    assert(got(1L)._3 === score(Seq(lt(0.25))))
    // doc 2: n=2 → k=1; rarest is (a,b) at p=0.583333
    assert(got(2L)._2 === 1L)
    assert(got(2L)._3 === score(Seq(lt(0.583333))))
    // min-K% is always at least as surprising as the full mean
    assert(got.values.forall(v => v._3 >= v._4))
  }
}
