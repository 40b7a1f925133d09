package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The portable signature must match an independent JVM-side
  * reimplementation (15-hex-digit md5 base, affine family mod 2³¹−1,
  * min per slot — recomputed here through the HEX-STRING parse the
  * SQL oracle uses, not the kernel's digest-byte fast path), and the
  * emitted pairs must equal the reference predicate — band collision
  * AND exact Jaccard — computed exhaustively in plain Scala.
  */
class PortableMinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NumHashes = 16
  private val Bands = 8
  private val K = 2 // shingle words
  private val P = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent reference: same definitions, plain Scala. */
  private def refShingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < K) Set.empty
    else toks.sliding(K).map(_.mkString(" ")).toSet
  }

  private def refSig(sh: Set[String]): IndexedSeq[Long] =
    (0 until NumHashes).map { j =>
      sh.map { t =>
        // the oracle's formulation: parse the first 15 hex digits
        val base = java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16) % P
        (((j + 1) * 2654435761L % P) * base + j * 40503L + 12345L) % P
      }.min
    }

  private def refBandCollide(a: IndexedSeq[Long], b: IndexedSeq[Long]): Boolean = {
    val rows = NumHashes / Bands
    (0 until Bands).exists(band =>
      (0 until rows).forall(r => a(band * rows + r) == b(band * rows + r)))
  }

  private def refJaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size.toDouble

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
    (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near dup
    (4L, "totally different words appear in this document"),
    (5L, "single"),                                        // too short
    (6L, "  ")                                             // no tokens
  ).toDF("doc_id", "text")

  test("signatures match the independent JVM reference slot-for-slot") {
    val got = PortableMinHash.signatures(docs, "doc_id", "text", NumHashes, K)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // 5 and 6 dropped
    for (id <- Seq(1L, 3L, 4L)) {
      val text = Seq(
        1L -> "alpha beta gamma delta epsilon zeta eta theta",
        3L -> "alpha beta gamma delta epsilon zeta eta iota",
        4L -> "totally different words appear in this document").toMap
      assert(got(id) == refSig(refShingles(text(id))), s"doc $id")
    }
    assert(got(1L) == got(2L))
  }

  test("band-plan calibration: identical docs give the exact bucket " +
      "arithmetic and the S-curve cells behave like an S-curve") {
    // 4 byte-identical docs: every signature is equal, so each plan
    // sees exactly `bands` buckets of size 4 -> C(4,2) = 6 pairs each
    val docs = (1L to 4L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val got = PortableMinHash.bandPlanCalibration(docs, "doc_id", "text",
      numHashes = 128, shingleWords = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet == Set(32, 16, 8, 4))
    for ((b, (r, nb, pairs, s50, s70, s80, s90)) <- got) {
      assert(b * r == 128)
      assert(nb == b.toLong, s"plan $b: $nb buckets")
      assert(pairs == 6L * b, s"plan $b: $pairs pairs")
      // more similar -> caught more often; every cell a probability
      assert(s50 <= s70 && s70 <= s80 && s80 <= s90)
      assert(s50 >= 0L && s90 <= 1000000L)
    }
    // more bands catch low-similarity pairs more often
    assert(got(32)._4 > got(4)._4)
    // the pinned chain matches an independent BigDecimal evaluation
    // loosely (the chain is IEEE, the reference exact): within 1e-9
    val ref = 1.0 - math.pow(1.0 - math.pow(0.7, 8.0), 16.0)
    assert(math.abs(got(16)._5 / 1e6 - ref) < 1e-6)
  }

  test("band-plan select: cheapest qualifying plan wins; an impossible " +
      "bar falls back to best recall with the downgrade flagged") {
    val docs = (1L to 4L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val cal = PortableMinHash.bandPlanCalibration(docs, "doc_id", "text",
      numHashes = 128, shingleWords = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(3), r.getLong(6)))).toMap // bands -> (pairs, s80)
    val pick = PortableMinHash.bandPlanSelect(docs, "doc_id", "text",
      numHashes = 128, shingleWords = 2).collect()
    assert(pick.length === 1)
    val chosen = pick.head
    assert(chosen.getAs[Boolean]("qualified"))
    val qualifying = cal.filter(_._2._2 >= 900000L)
    assert(qualifying.nonEmpty)
    val bestPairs = qualifying.map(_._2._1).min
    assert(chosen.getAs[Long]("bucket_pairs") === bestPairs)
    assert(chosen.getAs[Long]("scurve_80") >= 900000L)
    // a bar above 10^6 is unsatisfiable: fallback = best recall,
    // qualified = false
    val fb = PortableMinHash.bandPlanSelect(docs, "doc_id", "text",
      numHashes = 128, shingleWords = 2, minCatch = 1000001L).collect()
    assert(fb.length === 1)
    assert(!fb.head.getAs[Boolean]("qualified"))
    assert(fb.head.getAs[Long]("scurve_80") === cal.values.map(_._2).max)
  }

  test("apply-at-committed-plan: pairs equal nearDupPairs at exactly " +
      "the committed (bands, rows), with the commit carried on every row") {
    val commit = PortableMinHash.bandPlanSelect(docs, "doc_id", "text",
      numHashes = 128, shingleWords = K).collect().head
    val (cb, cr, cq) = (commit.getAs[Int]("bands"),
      commit.getAs[Int]("rows_per_band"), commit.getAs[Boolean]("qualified"))
    assert(cb * cr === 128)
    val got = PortableMinHash.nearDupPairsAtCommittedPlan(docs, "doc_id",
      "text", numHashes = 128, shingleWords = K, threshold = 0.5).collect()
    // every output row records the plan that ran = the committed plan
    got.foreach { r =>
      assert(r.getAs[Int]("bands") === cb)
      assert(r.getAs[Int]("rows_per_band") === cr)
      assert(r.getAs[Boolean]("qualified") === cq)
    }
    // the emitted pairs are EXACTLY nearDupPairs compiled at that plan
    val viaStatic = PortableMinHash.nearDupPairs(docs, "doc_id", "text",
        numHashes = 128, bands = cb, shingleWords = K, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val viaApply = got.map(r => (r.getAs[Long]("id_a"),
      r.getAs[Long]("id_b"), r.getAs[Double]("jaccard_sim"))).toSet
    assert(viaApply === viaStatic)
    // fixture sanity: the exact-dup pair survives any plan
    assert(viaApply.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("emitted pairs = band-collision AND jaccard, exhaustively checked") {
    val texts = Map(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "alpha beta gamma delta epsilon zeta eta iota",
      4L -> "totally different words appear in this document")
    val threshold = 0.5
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = refShingles(texts(a)); sb = refShingles(texts(b))
      if refBandCollide(refSig(sa), refSig(sb))
      j = refJaccard(sa, sb) if j >= threshold
    } yield (a, b, BigDecimal(j).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val got = PortableMinHash.nearDupPairs(docs, "doc_id", "text",
        NumHashes, Bands, K, threshold)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    // sanity: the exact dup pair is present with jaccard 1.0
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }
}
