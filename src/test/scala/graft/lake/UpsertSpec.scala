package graft.lake

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Keyed merge: one row per key after every merge, newest wins,
  * update beats current on ord ties, no temp dirs left behind.
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("merge keeps newest per key; update wins ord ties; creates table") {
    val dir = Files.createTempDirectory("graft-upsert").toString + "/state"

    // first batch (creates) — includes an in-batch dup for key 1
    Upsert.mergeByKey(spark, dir,
      Seq((1L, ts(10), "a1"), (1L, ts(20), "a2"), (2L, ts(10), "b1"))
        .toDF("id", "updated", "payload"),
      key = "id", ord = col("updated"))
    val after1 = spark.read.parquet(dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(after1 == Map(1L -> "a2", 2L -> "b1"))

    // second batch: newer key 1, STALE key 2 (must not regress),
    // equal-ts key 3 collision handled, new key 4
    Upsert.mergeByKey(spark, dir,
      Seq((1L, ts(30), "a3"), (2L, ts(5), "bStale"), (4L, ts(1), "d1"))
        .toDF("id", "updated", "payload"),
      key = "id", ord = col("updated"))
    val after2 = spark.read.parquet(dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(after2 == Map(1L -> "a3", 2L -> "b1", 4L -> "d1"))

    // equal-ord tie: the update wins over the current row
    Upsert.mergeByKey(spark, dir,
      Seq((2L, ts(10), "bTie")).toDF("id", "updated", "payload"),
      key = "id", ord = col("updated"))
    val after3 = spark.read.parquet(dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(after3(2L) == "bTie")

    val siblings = new java.io.File(dir).getParentFile.listFiles.map(_.getName)
    assert(!siblings.exists(_.contains("_merging")), siblings.mkString(","))
    assert(!siblings.exists(_.contains("_premerge")), siblings.mkString(","))
  }
}
