package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewAndSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    // hot key: 10k rows of 'hot', a few cold keys
    val df = ((1 to 10000).map(_ => ("hot", 1.0)) ++
      (1 to 50).map(i => (s"cold$i", 2.0))).toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = SkewTools.saltedAgg(df, Seq("k"), 16,
      partial = Seq(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).as("s")),
      fin = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == direct)
  }

  test("daily HLL sketches union-merge to within 5% of exact distinct") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map { _ =>
      (rnd.nextInt(14), rnd.nextInt(3000).toLong) // (day, user)
    }
    val df = rows.toDF("day", "user_id")
    val exact = rows.map(_._2).distinct.size.toDouble
    val merged = df.groupBy($"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].first().toDouble
    assert(math.abs(merged - exact) / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("salted broadcast join equals plain join") {
    val left = ((1 to 5000).map(_ => "hot") ++ Seq("a", "b")).toDF("k")
    val right = Seq(("hot", 1), ("a", 2), ("b", 3), ("unused", 4)).toDF("k", "dim")
    val plain = left.join(right, "k").groupBy($"k", $"dim").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val salted = SkewTools.saltedBroadcastJoin(left, right, "k", 8)
      .groupBy($"k", $"dim").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("approx sketches land within tolerance of exact answers") {
    val events = graft.queries.RelationalQueries.events(
      spark, "/root/testdata/sf0.001")
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.queries.RelationalQueries.q26Approx(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      // the exact column must be exact, and every sketch must have
      // landed inside its documented error bound (the oracle contract)
      assert(r.getLong(2) == exact(et), s"$et exact_users mismatch")
      assert(r.getBoolean(3), s"$et hll outside 3*rsd")
      assert(r.getBoolean(4), s"$et approx median outside [p45,p55]")
      assert(r.getBoolean(5), s"$et approx p99 outside [p98,p99.9]")
    }
  }
}
