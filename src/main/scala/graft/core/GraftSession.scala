package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * The reference builds one tiny session per Airflow task
  * (`src/helpers.py:197-225`: local[1], 512 MB, shuffle.partitions=2).
  * We instead size for the actual hardware and let AQE adapt partition
  * counts at runtime — the static `shuffle.partitions` is only the
  * pre-AQE upper bound. Session timezone is pinned UTC exactly like the
  * reference (`src/format_flights.py:138`, `tests/conftest.py:20`) so
  * epoch→timestamp conversions agree across engines.
  */
object GraftSession {

  /** Build a local session. `cores` defaults to 32 to match the
    * driver's local[32] run profile; tests pass a smaller value.
    */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
