package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compaction rewrites a many-file partition into few files without
  * changing its rows, and the swap leaves no temp dirs behind.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collapses many small files, preserves rows exactly") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/part"
    val df = (0L until 2000L).map(i => (i, s"row_$i")).toDF("id", "payload")
    df.repartition(40).write.parquet(dir)

    val filesBefore = new java.io.File(dir)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(filesBefore == 40)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq

    val filesAfter = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(filesAfter == 1)
    val after = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    assert(after == before)

    // no leftover work dirs
    val siblings = new java.io.File(dir).getParentFile.listFiles.map(_.getName)
    assert(!siblings.exists(_.contains("_compacting")), siblings.mkString(","))
    assert(!siblings.exists(_.contains("_precompact")), siblings.mkString(","))
  }
}
