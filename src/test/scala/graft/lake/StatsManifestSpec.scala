package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The manifest must (a) prune strictly below the full file count for
  * selective ranges, (b) never lose rows — pruned scan + exact
  * residual filter ≡ full scan + filter, (c) prune on BOTH z-clustered
  * dimensions, and (d) refuse to serve a manifest older than the data.
  */
class StatsManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (String, org.apache.spark.sql.DataFrame) = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20000).map(_ => (rnd.nextInt(10000), rnd.nextInt(10000)))
    val df = rows.toDF("x", "y")
    val dir = Files.createTempDirectory("graft-manifest").toString + "/t"
    ZOrder.clusterByZ(df, "x", "y", numFiles = 16).write.parquet(dir)
    (dir, df)
  }

  test("write records one row per file; selective ranges prune on both z dims") {
    val (dir, _) = freshTable()
    val nFiles = StatsManifest.write(spark, dir, Seq("x", "y"))
    assert(nFiles == 16)
    val manifest = StatsManifest.read(spark, dir)
    assert(manifest.size == 16 && manifest.map(_.rows).sum == 20000L)

    val onX = StatsManifest.selectFiles(manifest, Seq(("x", 100.0, 400.0)))
    val onY = StatsManifest.selectFiles(manifest, Seq(("y", 100.0, 400.0)))
    val onBoth = StatsManifest.selectFiles(
      manifest, Seq(("x", 100.0, 400.0), ("y", 100.0, 400.0)))
    assert(onX.size < 16, s"x-range should prune, kept ${onX.size}")
    assert(onY.size < 16, s"y-range should prune, kept ${onY.size}")
    assert(onBoth.size <= math.min(onX.size, onY.size))
    assert(onBoth.nonEmpty)
  }

  test("pruned scan + residual filter loses no rows vs full scan") {
    val (dir, df) = freshTable()
    StatsManifest.write(spark, dir, Seq("x", "y"))
    val pred = col("x").between(100, 400) && col("y").between(100, 400)
    val pruned = StatsManifest.scan(spark, dir,
      Seq(("x", 100.0, 400.0), ("y", 100.0, 400.0)))
      .filter(pred).select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1)))
    val full = df.filter(pred)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(pruned.sorted.toSeq == full.sorted.toSeq)
    assert(pruned.nonEmpty)
  }

  test("all-null stats keep the file; empty selection yields empty frame with schema") {
    val dir = Files.createTempDirectory("graft-manifest-null").toString + "/t"
    Seq((Option.empty[Int], 1), (None, 2)).toDF("x", "y")
      .coalesce(1).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("x"))
    val m = StatsManifest.read(spark, dir)
    // x is all-null: min/max absent, file must survive any range
    assert(StatsManifest.selectFiles(m, Seq(("x", 0.0, 1.0))).size == 1)
    // y has no recorded stats at all: also conservative-keep
    assert(StatsManifest.selectFiles(m, Seq(("y", -5.0, -4.0))).size == 1)
    val out = StatsManifest.scan(spark, dir, Seq(("x", 0.0, 1.0)))
    assert(out.columns.toSeq == Seq("x", "y") && out.count() == 2)
  }

  test("stale manifest (data newer than stats) is refused") {
    val (dir, df) = freshTable()
    StatsManifest.write(spark, dir, Seq("x"))
    Thread.sleep(1100) // FS mtime granularity
    df.limit(10).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      StatsManifest.scan(spark, dir, Seq(("x", 0.0, 100.0)))
    }
    assert(e.getMessage.contains("older than the data"))
    // re-writing the manifest heals it
    StatsManifest.write(spark, dir, Seq("x"))
    assert(StatsManifest.scan(spark, dir, Seq(("x", 0.0, 10000.0))).count() == 20010)
  }
}
