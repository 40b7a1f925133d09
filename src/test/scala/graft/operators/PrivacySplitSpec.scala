package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Leakage-safe group-level split + k-anonymity generalization. */
class PrivacySplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leakage-safe split: cluster members never straddle splits") {
    // 3000 docs in 1000 clusters of 3 — a per-doc draw would scatter
    // most triples across splits; the cluster draw must not
    val membership = (0L until 3000L).map(i => (i, i / 3L))
      .toDF("doc_id", "cluster_id")
    val got = Sampling.leakageSafeSplit(membership, "doc_id", "cluster_id")
    val perCluster = got.groupBy("cluster_id")
      .agg(countDistinct($"split").as("k"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perCluster.forall { case (_, k, n) => k == 1L && n == 3L })
    // fractions land near nominal at the CLUSTER level
    val clusterSplits = got.select($"cluster_id", $"split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(clusterSplits("train") - 800L) < 80)
    // and the assignment equals the row-level rule applied to the key
    val expect = membership.select($"doc_id", $"cluster_id",
      Sampling.splitColumn($"cluster_id", "cluster_split_v1").as("split"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("k-anonymity: smallest level whose group reaches k wins") {
    // qi=g, num=v, widths 10/100, k=3, suppression level = 2
    // g=a: v in {1,2,3} -> level-0 bucket 0 has 3 rows (passes k)
    // g=b: v in {5,15,25} -> level-0 buckets distinct (1 each);
    //      level-1 bucket 0 has all 3 (passes at level 1)
    // g=c: v in {5, 205} -> fails level 0 and 1; suppressed with
    //      group_n=2 < k -> anonymous=false
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 5.0), (5L, "b", 15.0), (6L, "b", 25.0),
      (7L, "c", 5.0), (8L, "c", 205.0)
    ).toDF("id", "g", "v")
    val got = Privacy.kAnonymityGeneralize(rows, "id", Seq("g"), "v",
        widths = Seq(10.0, 100.0), k = 3)
      .as[(Long, String, Int, Option[Long], Long, Boolean)]
      .collect().map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((0, Some(0L), 3L, true)))
    assert(got(4L) == ((1, Some(0L), 3L, true)))
    assert(got(5L) == ((1, Some(0L), 3L, true)))
    assert(got(7L) == ((2, None, 2L, false)))
    assert(got(8L) == ((2, None, 2L, false)))
  }

  test("k-anonymity: negative values bucket by floor, not truncation") {
    val rows = Seq((1L, "a", -5.0), (2L, "a", -7.0),
      (3L, "a", 4.0), (4L, "a", 6.0)).toDF("id", "g", "v")
    val got = Privacy.kAnonymityGeneralize(rows, "id", Seq("g"), "v",
        widths = Seq(10.0), k = 2)
      .as[(Long, String, Int, Option[Long], Long, Boolean)]
      .collect().map(r => r._1 -> ((r._3, r._4))).toMap
    // floor(-5/10) = -1 groups with floor(-7/10) = -1 (truncation
    // toward zero would put both in bucket 0); both buckets have 2
    // rows, so the whole group releases at level 0
    assert(got(1L) == ((0, Some(-1L))))
    assert(got(2L) == ((0, Some(-1L))))
    assert(got(3L) == ((0, Some(0L))))
    assert(got(4L) == ((0, Some(0L))))
  }

  test("k-anonymity: one level per QI group — a lone-bucket row drags " +
      "its whole group up (release-level guarantee)") {
    // g=a: bucket -1 has 2 rows but bucket 0 has only 1 -> level 0
    // does NOT qualify for the group; all three rows are suppressed
    // together (per-row minimal levels would release row 3 as the
    // unique ('a', '*') tuple — the broken release the full-domain
    // rule exists to prevent)
    val rows = Seq((1L, "a", -5.0), (2L, "a", -7.0), (3L, "a", 4.0))
      .toDF("id", "g", "v")
    val released = Privacy.kAnonymityGeneralize(rows, "id", Seq("g"), "v",
        widths = Seq(10.0), k = 2)
    val got = released
      .as[(Long, String, Int, Option[Long], Long, Boolean)]
      .collect().map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((1, None, 3L, true)))
    assert(got(2L) == ((1, None, 3L, true)))
    assert(got(3L) == ((1, None, 3L, true)))
    // the released table itself satisfies k-anonymity: every
    // (QI, bucket, level) combination among anonymous rows has >= k
    val tupleCounts = released.filter($"anonymous")
      .groupBy($"g", $"bucket", $"level").count()
      .as[(String, Option[Long], Int, Long)].collect()
    assert(tupleCounts.nonEmpty && tupleCounts.forall(_._4 >= 2L))
  }

  test("l-diversity: homogeneous cells fail, dominant share is exact") {
    val df = Seq(
      // cell a: 3 distinct sensitive values, dominant 2/4
      ("a", "s1"), ("a", "s1"), ("a", "s2"), ("a", "s3"),
      // cell b: homogeneous — k-anonymous but leaks
      ("b", "s1"), ("b", "s1"), ("b", "s1"),
      // cell c: 2 distinct, below l=3; tie broken on value string
      ("c", "s2"), ("c", "s1")
    ).toDF("g", "sens")
    val out = Privacy.lDiversity(df, Seq("g"), "sens", l = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out("a") === ((4L, 3L, "s1", 0.5, true)))
    assert(out("b") === ((3L, 1L, "s1", 1.0, false)))
    assert(out("c") === ((2L, 2L, "s1", 0.5, false)))
  }

  test("t-closeness: exact variational distance vs the global " +
      "distribution, absent values contribute their global mass") {
    // global: x=7, y=5, N=12
    //   a: (4x, 0y) -> ½(|1-7/12| + |0-5/12|) = 5/12 (y absent — the
    //      |0 - N_v/N| term must still fire)
    //   b: (2x, 2y) -> ½(1/12 + 1/12) = 1/12
    //   c: (1x, 3y) -> ½(4/12 + 4/12) = 1/3
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "x"), ("b", "y"), ("b", "y"),
      ("c", "x"), ("c", "y"), ("c", "y"), ("c", "y")
    ).toDF("g", "sens")
    val out = Privacy.tCloseness(df, Seq("g"), "sens", t = 0.2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out("a") === ((4L, 5.0 / 12.0, false)))
    assert(out("b") === ((4L, 1.0 / 12.0, true)))
    assert(out("c") === ((4L, 1.0 / 3.0, false)))
  }

  test("laplace release: portable draw, exact lattice noise, clamp") {
    // independent JVM recomputation of the whole mechanism
    def expectNoise(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val r = (BigInt(md.take(15), 16) % 1000000L).toLong
      val odd = (r - 500000L) * 2 + 1
      val arg = (1000000L - math.abs(odd)).toDouble / 1000000.0
      val lnE8 = new java.math.BigDecimal(math.log(arg) * 1e8)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      -(if (odd > 0) 1L else -1L) * 2L * lnE8
    }
    val rows = Seq.fill(5)(("en", "web")) ++ Seq(("de", "wiki"))
    val out = Privacy.laplaceHistogram(rows.toDF("lang", "source"),
        Seq("lang", "source"), invEps = 2, seedTag = "dp_v1")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    for (((lang, src), (n, u6, noise, rel, clamped)) <- out) {
      assert(u6 >= 0L && u6 < 1000000L)
      assert(noise === expectNoise(s"$lang:$src:dp_v1"))
      assert(rel === (n * 100000000L + noise).toDouble / 1.0e8)
      assert(clamped === math.max(rel, 0.0))
    }
    assert(out(("en", "web"))._1 === 5L)
    assert(out(("de", "wiki"))._1 === 1L)
    // the two cells draw different noise (key includes the cell)
    assert(out(("en", "web"))._3 !== out(("de", "wiki"))._3)
  }
}
