package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KeywordProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keywords: group-exclusive bigrams outrank shared ones") {
    val docs = Seq(
      ("news", "breaking news today and breaking news tonight"),
      ("news", "more breaking news from the desk"),
      ("code", "pull request merged and pull request opened"),
      ("code", "new pull request from the bot")
    ).toDF("source", "text")
    val out = KeywordExtraction.topTerms(docs, "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(out.find(t => t._1 == "news" && t._2 == 1).get._3
      === "breaking news")
    assert(out.find(t => t._1 == "code" && t._2 == 1).get._3
      === "pull request")
    // the shared bigram "from the" has gf = 2 = G → idf 0 → filtered
    assert(!out.exists(_._3 == "from the"))
  }

  test("column profile: exact stats, nulls excluded from the mean") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.5, 10L), (2.5, 20L), (null, 30L), (4.0, 20L))
      .toDF("x", "y")
    val out = Profiling.columnProfile(df, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(out(0) === (("x", 4L, 1L, 3L, 1.5, 4.0,
      round6((1.5 + 2.5 + 4.0) / 3))))
    assert(out(1) === (("y", 4L, 0L, 3L, 10.0, 30.0, 20.0)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mergeable profile: merge of shard profiles == direct whole profile") {
    import org.apache.spark.sql.functions.{col, pmod, when, lit}
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 200L).map { i =>
      (i, if (i % 7 == 0) None else Some((i % 13).toDouble * 1.5))
    }.toDF("id", "v")
    val whole = Profiling.mergeableProfile(df, Seq("v"), k = 64)
    val shards = Profiling.mergeableProfile(
        df.filter(pmod(col("id"), lit(2)) === 0), Seq("v"), k = 64)
      .unionByName(Profiling.mergeableProfile(
        df.filter(pmod(col("id"), lit(2)) === 1), Seq("v"), k = 64))
    val a = whole.collect()(0)
    val b = Profiling.mergeProfiles(shards, k = 64).collect()(0)
    // every sufficient stat AND the KMV array must match exactly
    for (f <- Seq("n_rows", "n_null", "min_value", "max_value", "sum6"))
      assert(a.getAs[Any](f) === b.getAs[Any](f), f)
    val ka = a.getSeq[Double](a.fieldIndex("kmv")).toList
    val kb = b.getSeq[Double](b.fieldIndex("kmv")).toList
    assert(ka === kb, "merged KMV sketch must equal the whole-corpus sketch")
    assert(ka.size === 13) // exact below k
  }
}
