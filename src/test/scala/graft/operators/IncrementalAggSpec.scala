package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The partial states must be a commutative monoid under `merge`:
  * any slicing / merge order of the input reproduces the single-pass
  * aggregate exactly.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = (1 to 97).map(i =>
    (s"k${i % 5}", (i * 37 % 100) + i / 10.0))
  private lazy val df = rows.toDF("k", "v")

  private def finalized(src: org.apache.spark.sql.DataFrame): Map[String, (Long, Double, Double, Double, Double)] =
    IncrementalAgg.finalize(src)
      .select(col("k"), col("n"), col("sum"), col("min"), col("max"), col("avg"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  test("merge of sliced partials equals the single-pass partials") {
    val whole = finalized(IncrementalAgg.partials(df, Seq("k"), "v"))
    val a = IncrementalAgg.partials(df.filter(col("v") < 50), Seq("k"), "v")
    val b = IncrementalAgg.partials(
      df.filter(col("v") >= 50 && col("v") < 80), Seq("k"), "v")
    val c = IncrementalAgg.partials(df.filter(col("v") >= 80), Seq("k"), "v")
    // two different merge tree shapes, both must be exact
    assert(finalized(IncrementalAgg.merge(a, b, c)) == whole)
    assert(finalized(IncrementalAgg.merge(IncrementalAgg.merge(c, a), b)) == whole)
  }

  test("finalize derives the expected values") {
    val got = finalized(IncrementalAgg.partials(df, Seq("k"), "v"))
    val exp = rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2)
      // the operator carries the sum as decimal(18,2); mirror that
      val dsum = xs.map(x =>
        BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      k -> ((xs.size.toLong, dsum.toDouble, xs.min, xs.max,
        (dsum / xs.size).toDouble))
    }
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (n, s, mn, mx, avg)) =>
      val (en, es, emn, emx, eavg) = exp(k)
      assert(n == en && s == es && mn == emn && mx == emx, k)
      assert(math.abs(avg - eavg) < 1e-9, k)
    }
  }
}
