package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-bucketed tables must join with no shuffle: the Exchange is paid
  * once at write time, not per query.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-table join plans without an exchange and matches the plain join") {
    val facts = (0L until 1000L).map(i => (i % 97, i, i * 2.0))
      .toDF("k", "fact_id", "amount")
    val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "label")

    Bucketing.writeBucketed(facts, "graft_bucketed_facts", "k", 8)
    Bucketing.writeBucketed(dims, "graft_bucketed_dims", "k", 8)
    try {
      val joined = Bucketing.coLocatedJoin(
        spark, "graft_bucketed_facts", "graft_bucketed_dims", "k")

      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      val got = joined.select("fact_id", "label").as[(Long, String)]
        .collect().sorted.toSeq
      val expected = facts.join(dims, "k").select("fact_id", "label")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got == expected)
      assert(got.size == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }
}
