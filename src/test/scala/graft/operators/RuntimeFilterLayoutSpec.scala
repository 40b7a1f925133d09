package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The round-6 pruning/layout operators: every one must be EXACT —
  * sketches and curves only reshape the plan, never the answer.
  */
class RuntimeFilterLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom-pruned join equals the plain join exactly") {
    val probe = (1L to 5000L).map(i => (i % 500, i)).toDF("k", "v")
    val build = (0L to 499L by 7L).toDF("bk").withColumn("tag", col("bk") * 10)
    val got = RuntimeFilter
      .bloomPrunedJoin(probe, build, "k", "bk", expectedItems = 100L)
      .select($"k", $"v", $"tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = probe.join(build, probe("k") === build("bk"))
      .select($"k", $"v", $"tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("sketch probes accept int key columns (widened to long at the API)") {
    val probe = (1 to 100).toDF("k") // IntegerType, not LongType
    val build = Seq(1, 2, 3).toDF("bk")
    assert(RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk", 10L)
      .count() == 3L)
    val hh = HeavyHitters.exactOverThreshold(
      (1 to 50).map(_ % 5).toDF("k"), "k", threshold = 10L)
    assert(hh.count() == 5L)
  }

  test("bloom-pruned join with an empty build side returns empty, no NPE") {
    val probe = (1L to 100L).toDF("k")
    val build = Seq.empty[Long].toDF("bk")
    assert(RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk", 10L)
      .count() == 0L)
  }

  test("bloom prunes most non-matching probe rows at the scan") {
    val probe = (1L to 10000L).toDF("k")
    val build = Seq(1L, 2L, 3L).toDF("bk")
    val bloom = build.stat.bloomFilter("bk", 100L, 0.01)
    val kept = probe.filter(
      graft.functions.expressions.SketchExpressions
        .bloomMightContain($"k", bloom)).count()
    // 3 true keys + ~1% fp of the other 9997
    assert(kept >= 3 && kept < 500, s"kept $kept of 10000")
  }

  test("CMS-prefiltered heavy hitters equal the plain GROUP BY HAVING") {
    val rows = (1L to 60L).flatMap(k => Seq.fill(if (k % 9 == 0) 80 else 20)(k))
    val df = rows.toDF("k")
    val got = HeavyHitters.exactOverThreshold(df, "k", threshold = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp && got.size == 6) // keys 9,18,...,54
  }

  test("cms estimate never underestimates") {
    val df = (1L to 1000L).map(i => i % 10).toDF("k")
    val cms = df.stat.countMinSketch("k", 0.001, 0.99, 42)
    val ests = df.distinct().select($"k",
        graft.functions.expressions.SketchExpressions.cmsEstimate($"k", cms))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ests.forall(_._2 >= 100L)) // true count is exactly 100 each
  }

  test("duplicated spans: shared 32-char window found, unique text not") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "AAAA " + shared),
      (2L, "BBBBBBBB " + shared),
      (3L, "completely unrelated text with no overlap at all whatsoever xyz")
    ).toDF("doc_id", "text")
    val out = SpanOverlap.duplicatedSpans(docs, "doc_id", "text", k = 32, stride = 1)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == 2L)) // n_docs == 2
    // stride=1 over the shared suffix: doc 3 contributes nothing
  }

  test("z-order fixed grid: interleave is exact and buckets are equal-population") {
    // cell (3, 5) = binary x=011, y=101 -> z = 100111 = 39
    val one = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.functions.expressions.TextExpressions
        .interleave_bits($"x", $"y", 10).as("z")).as[Long].head()
    assert(one == 39L)
    val pts = (1L to 640L).map(i =>
      (i, (i % 37).toDouble, (i % 53).toDouble)).toDF("c_custkey", "lat", "lon")
    val out = graft.lake.ZOrder.assignFixedGrid(
      pts, "lon", "lat", 0.0, 53.0, 0.0, 37.0,
      cells = 64, buckets = 16, tieBreak = "c_custkey")
    val sizes = out.groupBy($"bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 16 && sizes.values.forall(_ == 40L))
    // z-locality sanity: consecutive z-values share buckets far more
    // than random assignment would
    val byZ = out.orderBy($"zval", $"c_custkey").select($"bucket").as[Long].collect()
    val switches = byZ.sliding(2).count(p => p(0) != p(1))
    assert(switches == 15, s"contiguous z-ranges => exactly 15 switches, got $switches")
  }
}
