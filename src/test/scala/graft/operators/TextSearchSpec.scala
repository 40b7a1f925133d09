package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25/TF-IDF pinned against hand-computed values on a 4-doc corpus,
  * plus the ranking properties the retrieval use-case rests on.
  */
class TextSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1: "spark" x2 + 2 fillers (dl=4); doc 2: "spark" x1 (dl=3);
  // doc 3: no query terms (dl=2); doc 4: "rare" + "spark" (dl=2)
  private lazy val docs = Seq(
    (1L, "spark spark fast engine"),
    (2L, "spark is here"),
    (3L, "nothing else"),
    (4L, "rare spark")
  ).toDF("doc_id", "text")

  test("termFrequencies counts occurrences after lowercase/whitespace split") {
    val tf = TextSearch.termFrequencies(
        Seq((1L, "A a  b\tA")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(tf == Set((1L, "a", 3L), (1L, "b", 1L)))
  }

  test("bm25 matches the hand-computed score and ranks tf-heavy docs first") {
    // n=4 docs, df(spark)=3, avgdl=11/4. idf = ln(1 + 1.5/3.5)
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    def w(tf: Long, dl: Long): BigDecimal = {
      val avgdl = 11.0 / 4.0
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val got = TextSearch.bm25(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no query term
    assert(got(1L) == w(2, 4).toDouble)
    assert(got(2L) == w(1, 3).toDouble)
    assert(got(4L) == w(1, 2).toDouble)
    assert(got(1L) > got(2L)) // higher tf wins at comparable length
    assert(got(4L) > got(2L)) // shorter doc wins at equal tf
  }

  test("tfidf = tf * ln(N/df) over the restricted vocabulary") {
    val got = TextSearch.tfidf(docs, "doc_id", "text", Seq("spark", "rare"))
      .as[(Long, String, Double)].collect().toSet
    val sparkW = math.log(4.0 / 3.0)
    val rareW = math.log(4.0 / 1.0)
    assert(got == Set(
      (1L, "spark", 2 * sparkW), (2L, "spark", 1 * sparkW),
      (4L, "spark", 1 * sparkW), (4L, "rare", 1 * rareW)))
  }

  test("bm25 plan broadcasts the query-side stats, never the corpus") {
    val plan = TextSearch.bm25(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("vocabOovRate: top-V by (count desc, term asc), occurrence-level rate") {
    // corpus counts: spark=4; else/engine/fast/here/is/nothing/rare=1
    // vocabSize=2 → vocab = {spark, else}: the seven-way count tie at 1
    // resolves by term ASC ("else" first) — the tie-break under test
    val got = TextSearch.vocabOovRate(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 2L, 0.5)))      // fast, engine OOV
    assert(got(2L) == ((3L, 2L, 0.666667))) // is, here OOV
    assert(got(3L) == ((2L, 1L, 0.5)))      // nothing OOV, else in-vocab
    assert(got(4L) == ((2L, 1L, 0.5)))      // rare OOV (doc 4: "rare spark")
  }

  test("unigramSurprisal: hand-computed mean -ln p per doc, decimal-carried") {
    // t=11 occurrences; spark n=4, seven singletons n=1.
    // s(spark) = round(ln(11/4), 6) = 1.011601; s(singleton) = 2.397895
    val got = TextSearch.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4L, 1.704748))) // (2*1.011601 + 2*2.397895)/4
    assert(got(2L) == ((3L, 1.935797))) // (1.011601 + 2*2.397895)/3
    assert(got(3L) == ((2L, 2.397895))) // two singletons
    assert(got(4L) == ((2L, 1.704748))) // (2.397895 + 1.011601)/2
  }

  test("bigramSurprisal: hand-computed mean -ln p(w2|w1) per doc") {
    // Every bigram in the fixture is unique (n12=1); left counts:
    // spark->3 (spark spark|fast|is), all others->1. So weights are
    // ln(3)=1.098612 for spark-led bigrams, 0 for the rest.
    val got = TextSearch.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 0.732408))) // (2*1.098612 + 0)/3
    assert(got(2L) == ((2L, 0.549306))) // (1.098612 + 0)/2
    assert(got(3L) == ((1L, 0.0)))      // singleton bigram
    assert(got(4L) == ((1L, 0.0)))
  }

  test("domainDivergence: hand-checked KL against a driver-side mirror; zero for a representative domain") {
    // domain A = two copies of the same text, domain B = different text:
    // P_A != P_corpus and P_B != P_corpus, both KLs > 0. A third
    // single-domain corpus gives KL = 0 exactly (P_dom == P_corpus).
    val d = Seq(
      ("a", "x x y"), ("a", "x x y"),
      ("b", "y z z z")
    ).toDF("source", "text")
    val got = TextSearch.domainDivergence(d, "source", "text")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus: x=4, y=3, z=3, t=10. domain a: x=4,y=2, t_a=6; b: y=1,z=3, t_b=4
    def w(n: Long, ts: Long, nt: Long, t: Long): BigDecimal = {
      val p = n.toDouble / ts.toDouble
      val q = nt.toDouble / t.toDouble
      BigDecimal(p * math.log(p / q)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def fin(x: BigDecimal): Double = (x.toDouble * 1e6).round / 1e6
    assert(got("a") == ((2L, fin(w(4, 6, 4, 10) + w(2, 6, 3, 10)))))
    assert(got("b") == ((2L, fin(w(1, 4, 3, 10) + w(3, 4, 3, 10)))))
    val single = TextSearch.domainDivergence(
      Seq(("solo", "p q r")).toDF("source", "text"), "source", "text")
      .as[(String, Long, Double)].collect()
    assert(single.toSeq == Seq(("solo", 3L, 0.0)))
  }

  test("domainDivergence plan shuffles the term join, never broadcasts the vocab") {
    val plan = TextSearch.domainDivergence(docs.withColumnRenamed("doc_id", "source"),
      "source", "text").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
  }

  test("charEntropy: uniform alphabet = ln(k); single char = 0; empty absent") {
    val d = Seq(
      (1L, "abcd"),     // uniform over 4 chars: 4·round(-0.25·ln 0.25)
      (2L, "aaaa"),     // single char: 0
      (3L, ""),         // empty: absent
      (4L, "aab")       // -(2/3)ln(2/3) - (1/3)ln(1/3) = 0.636514
    ).toDF("doc_id", "text")
    val got = TextSearch.charEntropy(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // bins round to 6 dp BEFORE the sum (the determinism recipe):
    // 4 x 0.346574 = 1.386296, one ulp-in-the-6th-dp above ln(4)
    assert(got(1L) == ((4L, 1.386296)))
    assert(got(2L) == ((1L, 0.0)))
    assert(!got.contains(3L))
    // 0.270310 + 0.366204 (6-dp rounded bins) = 0.636514
    assert(got(4L) == ((2L, 0.636514)))
  }

  test("ngramNovelty: first doc all-new, exact copy zero, half-overlap halved") {
    val sets = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")), // exact copy of 1 -> novelty 0
      (3L, Seq("a", "b", "x", "y")), // half old, half new
      (4L, Seq("z"))                 // all new
    ).toDF("doc_id", "grams")
    val got = TextSearch.ngramNovelty(sets, "doc_id", "grams")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 0L, 0.0)))
    assert(got(3L) == ((4L, 2L, 0.5)))
    assert(got(4L) == ((1L, 1L, 1.0)))
  }

  test("bigramSurprisal: docs with fewer than 2 tokens are absent") {
    val d = Seq((1L, "one"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val got = TextSearch.bigramSurprisal(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("bigramSurprisal plan shuffles the pair->weight join (bigram vocab never broadcast)") {
    val plan = TextSearch.bigramSurprisal(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
  }

  test("unigramSurprisal plan shuffles by term, never broadcasts the vocab") {
    // vocabularies follow Heaps' law at corpus scale: the term-weight
    // side must arrive via a shuffled (sort-merge/shuffled-hash) join;
    // the only broadcast is the 1-row total
    val plan = TextSearch.unigramSurprisal(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
  }

  test("vocabOovRate plan broadcasts the vocabulary, never the corpus") {
    val plan = TextSearch.vocabOovRate(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the vocab build is a bounded top-V, not a full sort of the term space
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
