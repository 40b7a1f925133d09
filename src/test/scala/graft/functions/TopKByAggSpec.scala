package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.expressions.TopKByAgg

/** Bounded top-k aggregate vs the window row_number baseline,
  * including ties, groups smaller than k, and the partial/merge path
  * across many partitions.
  */
class TopKByAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches window top-k on random data with ties, across partitions") {
    val rnd = new scala.util.Random(7)
    // scores drawn from a small set to force plenty of ties
    val rows = (0L until 5000L).map(i => (i % 7, rnd.nextInt(50).toDouble, i))
    val df = rows.toDF("g", "score", "id").repartition(16)

    val got = df.groupBy($"g")
      .agg(TopKByAgg.topKBy($"score", $"id", 10).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.score", $"col.id")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val expected = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"g", $"rank".cast("long"), $"score", $"id")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq

    assert(got == expected)
  }

  test("group smaller than k returns all rows, sorted") {
    val df = Seq((1L, 5.0, 1L), (1L, 9.0, 2L), (1L, 9.0, 0L)).toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKByAgg.topKBy($"score", $"id", 10).as("top"))
      .select(posexplode($"top"))
      .select($"col.id").as[Long].collect().toSeq
    assert(got == Seq(0L, 2L, 1L)) // 9.0 tie → id asc, then 5.0
  }

  test("null scores and ids are ignored") {
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, 2.0, 10L), (1L, null, 11L), (1L, 3.0, null))
      .toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKByAgg.topKBy($"score", $"id", 5).as("top"))
      .select(size($"top")).as[Int].first()
    assert(got == 1)
  }
}
