package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Typed serving-layer mapping enforcement.
  *
  * The reference pins serving types at the Elasticsearch index —
  * `keyword`/`float`/`geo_point`/`date` per field
  * (`src/index_elastic.py:22-62`) — so a mis-typed document corrupts
  * the dashboard at read time. The engine-side analog validates the
  * DataFrame schema against the pinned contract BEFORE any document
  * leaves the engine: a mis-typed, missing, or unexpected column fails
  * fast at the sink boundary.
  */
object ServingContract {

  /** The flight serving-document contract — the exact shape
    * `UsageProjection.documents(usage(enriched))` emits: 26 scalar
    * fields + the `location` geo-point struct (reference mapping
    * `src/index_elastic.py:22-62`; datetimes are ISO-8601 strings per
    * the doc transform, `:138-158`).
    */
  val flightDocuments: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("callsign", StringType),
    StructField("origin_country", StringType),
    StructField("baro_altitude", DoubleType),
    StructField("geo_altitude", DoubleType),
    StructField("velocity", DoubleType),
    StructField("true_track", DoubleType),
    StructField("vertical_rate", DoubleType),
    StructField("on_ground", BooleanType),
    StructField("observation_time", StringType),
    StructField("wind_speed_10m", DoubleType),
    StructField("wind_direction_10m", DoubleType),
    StructField("wind_gusts_10m", DoubleType),
    StructField("precipitation", DoubleType),
    StructField("rain", DoubleType),
    StructField("cloud_cover", DoubleType),
    StructField("weather_code", DoubleType),
    StructField("visibility", DoubleType),
    StructField("temperature_2m", DoubleType),
    StructField("risk_score", IntegerType),
    StructField("risk_category", StringType),
    StructField("flight_phase", StringType),
    StructField("flight_phase_id", IntegerType),
    StructField("is_anomaly", BooleanType),
    StructField("anomaly_score", DoubleType),
    StructField("extracted_at", StringType),
    StructField("location", StructType(Seq(
      StructField("lat", DoubleType),
      StructField("lon", DoubleType))))))

  /** Mismatches of `schema` against `contract`: missing fields,
    * unexpected fields, type mismatches — empty means conformant.
    * Field ORDER is not part of the contract (serving documents are
    * name-addressed) and nullability is not enforced (Spark
    * nullability is advisory); types compare by `catalogString`.
    */
  def violations(schema: StructType, contract: StructType): Seq[String] = {
    val want = contract.fields.map(f => f.name -> f.dataType).toMap
    val got = schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = (want.keySet -- got.keySet).toSeq.sorted
      .map(k => s"missing field: $k (${want(k).catalogString})")
    val extra = (got.keySet -- want.keySet).toSeq.sorted
      .map(k => s"unexpected field: $k (${got(k).catalogString})")
    val mistyped = (want.keySet & got.keySet).toSeq.sorted
      .filter(k => want(k).catalogString != got(k).catalogString)
      .map(k => s"mis-typed field: $k is ${got(k).catalogString}, " +
        s"contract requires ${want(k).catalogString}")
    missing ++ extra ++ mistyped
  }

  /** Throws with every violation listed when `df` does not conform. */
  def enforce(df: DataFrame, contract: StructType): Unit = {
    val errs = violations(df.schema, contract)
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        s"serving-contract violation (${errs.length}):\n  " + errs.mkString("\n  "))
  }
}

/** Decorator sink: validates every batch against the serving contract
  * before delegating — the engine-side equivalent of the reference's
  * typed index mapping rejecting a malformed bulk request, but at plan
  * time (schema check, no data pass) instead of at the serving store.
  */
final class ContractSink(inner: DocumentSink, contract: StructType) extends DocumentSink {
  override def upsert(docs: DataFrame, keyCol: String): Unit = {
    ServingContract.enforce(docs, contract)
    require(contract.fieldNames.contains(keyCol),
      s"upsert key '$keyCol' is not a contract field")
    inner.upsert(docs, keyCol)
  }
}
