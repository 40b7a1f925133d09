package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ANN operators: brute-force exactness vs a driver-side oracle, and
  * IVF recall against brute force.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val dim = 16
  private val corpusLocal: Seq[(Long, Seq[Float])] =
    (0L until 200L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))

  private def cosineLocal(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("brute-force top-k matches a local oracle") {
    val corpus = corpusLocal.toDF("vec_id", "embedding")
    val queries = corpusLocal.take(3)
      .map { case (i, v) => (i, v) }.toDF("query_id", "qvec")
    val got = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }

    corpusLocal.take(3).foreach { case (qid, qv) =>
      val expected = corpusLocal
        .map { case (i, v) => (i, cosineLocal(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(5).map(_._1)
      assert(got(qid) == expected, s"query $qid")
    }
  }

  test("self-similarity ranks first with cosine 1") {
    val corpus = corpusLocal.toDF("vec_id", "embedding")
    val queries = corpusLocal.take(1).toDF("query_id", "qvec")
    val top = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 1).first()
    assert(top.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.getAs[Double]("cosine_sim") - 1.0) < 1e-6)
  }

  test("IVF achieves >=60% recall of brute-force top-10") {
    val corpus = corpusLocal.toDF("vec_id", "embedding")
    val queries = corpusLocal.take(5).toDF("query_id", "qvec")
    val bf = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 10,
      nlist = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("quantizeInt8: matches the scalar definition; bounded roundtrip error") {
    val vecs = Seq(
      1L -> Seq(1.0f, -0.5f, 0.25f, 0.0f),
      2L -> Seq(0.0f, 0.0f, 0.0f, 0.0f), // zero vector -> scale 0, codes 0
      3L -> Seq(-2.0f, 2.0f, 1.0f, -1.0f))
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    for ((id, v) <- vecs) {
      val maxabs = v.map(x => math.abs(x.toDouble)).max
      val scale = maxabs / 127.0
      val rows = got(id)
      assert(rows.map(_._2).toSeq == (0 until v.length))
      for (((_, d, code, s), x) <- rows.zip(v)) {
        val expect =
          if (scale == 0.0) 0L
          else math.floor(x.toDouble / scale + 0.5).toLong
        assert(code == expect, s"vec $id dim $d")
        assert(s == scale)
        assert(math.abs(code) <= 127L)
        // dequantization error bound: |code*scale - x| <= scale/2
        assert(math.abs(code * scale - x.toDouble) <= scale / 2 + 1e-12)
      }
    }
  }
}
