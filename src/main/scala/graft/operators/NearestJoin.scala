package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Spatial nearest-neighbor join: attach, to every left row, the single
  * closest right row by a distance expression (J1+J2+W1 in SURVEY.md
  * §2.3/§2.5; reference `src/combine_spark.py:104-124`).
  *
  * Strategy notes for scale:
  *  - The right side (weather stations) is tiny → `broadcast` +
  *    `BroadcastNestedLoopJoin`: no shuffle of the big side at all.
  *  - Winner selection uses map-side `min_by(struct(...), dist)` via
  *    `groupBy` when the left key is unique per row, which partial-
  *    aggregates before the exchange — strictly cheaper than the
  *    reference's window (`row_number` forces a full shuffle + sort of
  *    N×M rows). A window variant is kept for parity testing.
  *  - Ties: the reference's `row_number` over `orderBy(dist)` breaks
  *    ties nondeterministically; we pin a secondary ordering on the
  *    right-side key columns (SURVEY.md §7.4).
  */
object NearestJoin {

  /** Prefix every column of `df` (reference `src/combine_spark.py:94-101`
    * does N withColumnRenamed calls; one `select` projection is a single
    * plan node).
    */
  def prefixColumns(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)).toSeq: _*)

  /** Window implementation — mirrors the reference's plan shape:
    * cross join → dist column → row_number per left key → rank==1.
    *
    * @param tieBreak columns on the joined frame that make the ordering
    *                 total (appended after dist ascending).
    */
  def nearestByWindow(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      dist: Column,
      tieBreak: Seq[Column]): DataFrame = {
    val joined = left.crossJoin(broadcast(right))
      .withColumn("dist_km", dist)
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col("dist_km").asc +: tieBreak: _*)
    joined
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") === 1)
      .drop("_rank")
  }

  /** Aggregation implementation — same result, cheaper plan: the
    * min_by partial-aggregates map-side, so the exchange carries one
    * row per left key instead of one per (left × right) pair.
    * Requires a total order on (dist, tieBreak) — callers pass a
    * struct-ordered tie-break expression.
    */
  def nearestByMinBy(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      dist: Column,
      tieBreak: Column): DataFrame = {
    val joined = left.crossJoin(broadcast(right))
      .withColumn("dist_km", dist)
    val others = joined.columns.filterNot(c => leftKeys.contains(c))
    // min_by on a struct gives lexicographic (dist, tieBreak) ordering —
    // deterministic winner per key.
    val ordKey = struct(col("dist_km"), tieBreak)
    joined
      .groupBy(leftKeys.map(col).toSeq: _*)
      .agg(min_by(struct(others.map(col).toSeq: _*), ordKey).as("_best"))
      .select((leftKeys.map(col) ++ others.map(c => col(s"_best.$c").as(c))).toSeq: _*)
  }

  /** The reference's concrete use: flights × weather stations by
    * Haversine km, weather columns prefixed `w_`.
    */
  def flightsToNearestWeather(flights: DataFrame, weather: DataFrame): DataFrame = {
    val w = prefixColumns(weather, "w_")
    nearestByWindow(
      flights, w, "icao24",
      GeoFunctions.haversineKm(
        col("latitude"), col("longitude"),
        col("w_latitude"), col("w_longitude")),
      tieBreak = Seq(col("w_latitude"), col("w_longitude")))
  }

  /** Grid-bucketed nearest join — the LARGE-site-set path (SURVEY.md
    * §2.3 J2's "geohash-bucketed" alternative). Broadcast cross join
    * stops scaling once the site table does; here both sides bucket
    * into `cellDeg`-degree grid cells, each site replicates into its
    * 3×3 cell neighborhood, and candidates come from an EQUI join on
    * the cell — per point, only nearby sites are scored.
    *
    * Exactness: any site OUTSIDE a point's 3×3 ring is at least
    * `cellDeg` degrees away in some axis, i.e. at least
    * `cellDeg · 110 km · cos(|lat|+cellDeg)` away. A ring winner at or
    * under that radius is therefore provably the global nearest; ring
    * winners beyond it — and points with an empty ring — fall back to
    * the exhaustive broadcast path, so the result equals brute-force
    * nearest for EVERY point, with the fallback sized by `cellDeg`
    * against site density (tiny when cells are chosen sensibly).
    *
    * Longitude cells are not wrapped at ±180°; near the poles the safe
    * radius collapses and everything falls back (conservative).
    */
  /** [[nearestByGrid]] with the cell size DERIVED from site density —
    * the regime guard the fixed-cell form lacks. One bounded agg over
    * the site table (count + bounding box, O(1) to the driver) picks:
    *
    *  - fewer than `minGridSites` sites (or a degenerate bounding box):
    *    the broadcast exhaustive pass wins outright — grid bucketing
    *    would pay its candidate join AND send most points to the
    *    fallback, so skip it entirely;
    *  - dense sites: `cellDeg = pad · sqrt(area / n)` targets ~1 site
    *    per cell, so each 3×3 ring holds ~9 candidates and its safe
    *    radius (≈ cellDeg · 110 km) covers the typical nearest-site
    *    distance (≈ 0.5 · sqrt(area/n) · 111 km) with margin — the
    *    grid pass confirms nearly every point and the exhaustive
    *    fallback stays a sliver.
    */
  def nearestByGridAuto(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      latL: String, lonL: String,
      latR: String, lonR: String,
      tieBreak: Column,
      minGridSites: Int = 64,
      pad: Double = 2.0): DataFrame = {
    val s = right.agg(
      count(lit(1)).as("n"),
      min(col(latR).cast("double")).as("la0"),
      max(col(latR).cast("double")).as("la1"),
      min(col(lonR).cast("double")).as("lo0"),
      max(col(lonR).cast("double")).as("lo1")).first()
    val n = s.getAs[Long]("n")
    val dist = GeoFunctions.haversineKm(col(latL), col(lonL), col(latR), col(lonR))
    val area =
      if (n == 0) 0.0
      else (s.getAs[Double]("la1") - s.getAs[Double]("la0")) *
        (s.getAs[Double]("lo1") - s.getAs[Double]("lo0"))
    if (n < minGridSites || area <= 0.0)
      nearestByMinBy(left, right, leftKeys, dist, tieBreak)
    else
      nearestByGrid(left, right, leftKeys, latL, lonL, latR, lonR, tieBreak,
        cellDeg = pad * math.sqrt(area / n))
  }

  def nearestByGrid(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      latL: String, lonL: String,
      latR: String, lonR: String,
      tieBreak: Column,
      cellDeg: Double): DataFrame = {
    require(cellDeg > 0, "cellDeg must be positive")
    val dist = GeoFunctions.haversineKm(col(latL), col(lonL), col(latR), col(lonR))

    def cellOf(lat: Column, lon: Column): (Column, Column) =
      (floor(lat / cellDeg).cast("long"), floor(lon / cellDeg).cast("long"))

    val (pLat, pLon) = cellOf(col(latL), col(lonL))
    val points = left.withColumn("_cla", pLat).withColumn("_clo", pLon)

    val (sLat, sLon) = cellOf(col(latR), col(lonR))
    val sites = right
      .withColumn("_cla0", sLat).withColumn("_clo0", sLon)
      .withColumn("_cla", explode(array(col("_cla0") - 1, col("_cla0"), col("_cla0") + 1)))
      .withColumn("_clo", explode(array(col("_clo0") - 1, col("_clo0"), col("_clo0") + 1)))
      .drop("_cla0", "_clo0")

    val candidates = points.join(sites, Seq("_cla", "_clo"))
      .drop("_cla", "_clo")
      .withColumn("dist_km", dist)
    val others = candidates.columns.filterNot(c => leftKeys.contains(c))
    val ordKey = struct(col("dist_km"), tieBreak)
    val gridWinners = candidates
      .groupBy(leftKeys.map(col).toSeq: _*)
      .agg(min_by(struct(others.map(col).toSeq: _*), ordKey).as("_best"))
      .select((leftKeys.map(col) ++ others.map(c => col(s"_best.$c").as(c))).toSeq: _*)

    // provably-exact winners: closer than any possible out-of-ring site
    // (110 km/deg is a lower bound on the meridian degree; longitude
    // degrees shrink by cos(lat), taken at the band's worst latitude)
    val safeKm = lit(cellDeg * 110.0) *
      greatest(cos(radians(abs(col(latL)) + lit(cellDeg))), lit(0.0))
    val confirmed = gridWinners.filter(col("dist_km") <= safeKm)

    // remainder: empty ring, or winner not provably global → exhaustive.
    // The anti-join output is tiny, so AQE coalesces it to ~1 partition
    // — but the broadcast cross join EXPANDS each row |right|-fold, and
    // an expansion processed in one task serializes the whole fallback.
    // Re-spread the small side first: partition count must be sized to
    // the post-join row count, not the input byte count.
    val unmatched = points.drop("_cla", "_clo")
      .join(confirmed.select(leftKeys.map(col).toSeq: _*), leftKeys, "left_anti")
      .repartition(left.sparkSession.sessionState.conf.numShufflePartitions)
    val fallback = nearestByMinBy(unmatched, right, leftKeys, dist, tieBreak)

    confirmed.unionByName(fallback)
  }
}
