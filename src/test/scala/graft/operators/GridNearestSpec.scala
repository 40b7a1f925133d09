package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.TestSpark

/** Grid-bucketed nearest join must equal brute-force nearest for every
  * point — including points whose 3×3 ring is empty or whose ring
  * winner is not provably global (both routed through the fallback).
  */
class GridNearestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grid nearest == brute-force nearest on random points, sparse sites") {
    val rnd = new scala.util.Random(13)
    // France-ish box; sites sparse enough that some rings are empty
    val points = (0L until 2000L).map { i =>
      (i, 41.5 + rnd.nextDouble() * 9.5, -4.5 + rnd.nextDouble() * 13.5)
    }.toDF("pid", "lat", "lon")
    val sites = (0L until 25L).map { j =>
      (j, 41.5 + rnd.nextDouble() * 9.5, -4.5 + rnd.nextDouble() * 13.5)
    }.toDF("sid", "s_lat", "s_lon")

    val dist = GeoFunctions.haversineKm($"lat", $"lon", $"s_lat", $"s_lon")

    val grid = NearestJoin.nearestByGrid(points, sites, Seq("pid"),
      "lat", "lon", "s_lat", "s_lon", tieBreak = $"sid", cellDeg = 0.5)
      .select($"pid", $"sid", round($"dist_km", 6).as("d"))
      .as[(Long, Long, Double)].collect().sorted.toSeq

    val brute = NearestJoin.nearestByMinBy(points, sites, Seq("pid"), dist, $"sid")
      .select($"pid", $"sid", round($"dist_km", 6).as("d"))
      .as[(Long, Long, Double)].collect().sorted.toSeq

    assert(grid.size == 2000)
    assert(grid == brute)
  }

  test("auto regime guard: dense sites take the grid path, sparse the broadcast pass") {
    val rnd = new scala.util.Random(29)
    val points = (0L until 500L).map { i =>
      (i, 41.5 + rnd.nextDouble() * 9.5, -4.5 + rnd.nextDouble() * 13.5)
    }.toDF("pid", "lat", "lon")
    val dense = (0L until 2000L).map { j =>
      (j, 41.5 + rnd.nextDouble() * 9.5, -4.5 + rnd.nextDouble() * 13.5)
    }.toDF("sid", "s_lat", "s_lon")
    val sparse = dense.filter($"sid" < 10)

    // grid path plans a union (confirmed ∪ fallback); broadcast pass doesn't
    val densePlan = NearestJoin.nearestByGridAuto(points, dense, Seq("pid"),
      "lat", "lon", "s_lat", "s_lon", tieBreak = $"sid")
      .queryExecution.optimizedPlan.toString
    assert(densePlan.contains("Union"), s"dense sites should take the grid path:\n$densePlan")
    val sparsePlan = NearestJoin.nearestByGridAuto(points, sparse, Seq("pid"),
      "lat", "lon", "s_lat", "s_lon", tieBreak = $"sid")
      .queryExecution.optimizedPlan.toString
    assert(!sparsePlan.contains("Union"), s"sparse sites should skip the grid:\n$sparsePlan")

    // and the adaptive grid result is still exact vs brute force
    val dist = GeoFunctions.haversineKm($"lat", $"lon", $"s_lat", $"s_lon")
    val auto = NearestJoin.nearestByGridAuto(points, dense, Seq("pid"),
      "lat", "lon", "s_lat", "s_lon", tieBreak = $"sid")
      .select($"pid", $"sid", round($"dist_km", 6).as("d"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val brute = NearestJoin.nearestByMinBy(points, dense, Seq("pid"), dist, $"sid")
      .select($"pid", $"sid", round($"dist_km", 6).as("d"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(auto == brute)
  }

  test("every point appears exactly once even with all-empty rings") {
    // sites far outside every point's ring at this tiny cell size
    val points = Seq((1L, 45.0, 2.0), (2L, 46.0, 3.0)).toDF("pid", "lat", "lon")
    val sites = Seq((9L, 50.0, 8.0)).toDF("sid", "s_lat", "s_lon")
    val out = NearestJoin.nearestByGrid(points, sites, Seq("pid"),
      "lat", "lon", "s_lat", "s_lon", tieBreak = $"sid", cellDeg = 0.1)
      .select("pid", "sid").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 9L, 2L -> 9L))
  }
}
