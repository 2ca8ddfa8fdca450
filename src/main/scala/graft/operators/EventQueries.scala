package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** H7 string/path and H8 JSON-reshaping probes (promised in SURVEY §2
  * and previously missing), plus the batch twin of the streaming
  * tumbling-window aggregate (§2 J extension).
  */
object EventQueries {

  /** q53 H8: parse `events.props` JSON and aggregate per event type. */
  def q53(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** q54 H7: suffix-accretion path synthesis + regex zone extraction
    * (the gdalos naming scheme, `gdalos_trans.py:658-738` /
    * `gdalos_selector.py:15`).
    */
  def q54(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .withColumn("path", concat(lit("srtm_w84u"),
        lpad((col("s_suppkey") % 60 + 1).cast("string"), 2, "0"),
        lit("_x"), col("s_suppkey").cast("string"), lit(".cog.tif")))
      .withColumn("zone", regexp_extract(col("path"), "w84u([0-9]+)", 1).cast("int"))
      .withColumn("ext", regexp_extract(col("path"), "\\.([a-z]+)$", 1))
      .withColumn("stem", regexp_replace(col("path"), "\\.cog\\.tif$", ""))
      .select("s_suppkey", "path", "zone", "ext", "stem")
      .orderBy("s_suppkey")

  /** q55 J: tumbling 1-hour event counts — the batch equivalent of
    * [[graft.streaming.EventStream.tumblingCounts]]; hour keyed as
    * epoch-hours so the oracle compares integers, not timestamps.
    */
  def q55(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour", floor(unix_timestamp(col("ts")) / 3600).cast("long"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_events_json" -> q53 _,
    "q54_string_paths" -> q54 _,
    "q55_events_hourly" -> q55 _,
  )

  val oracles: Map[String, String] = Map(
    "q53_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        |       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q54_string_paths" ->
      """WITH p AS (
        |  SELECT s_suppkey,
        |         'srtm_w84u' || lpad(CAST(s_suppkey % 60 + 1 AS VARCHAR), 2, '0')
        |           || '_x' || CAST(s_suppkey AS VARCHAR) || '.cog.tif' AS path
        |  FROM supplier)
        |SELECT s_suppkey, path,
        |       CAST(regexp_extract(path, 'w84u([0-9]+)', 1) AS INTEGER) AS zone,
        |       regexp_extract(path, '\.([a-z]+)$', 1) AS ext,
        |       regexp_replace(path, '\.cog\.tif$', '') AS stem
        |FROM p ORDER BY s_suppkey""".stripMargin,

    "q55_events_hourly" ->
      """SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
