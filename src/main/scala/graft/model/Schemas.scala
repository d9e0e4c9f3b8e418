package graft.model

import org.apache.spark.sql.types._

/** Canonical record of the engine's weather data model.
  *
  * Mirrors the reference's 14-field ingest dataclass
  * (reference: src/ingest.py:20-37) and the storage DDL
  * (reference: sql/schema.sql:9-39). One explicit schema shared by
  * readers, transform stages and writers — no inference anywhere.
  */
case class WeatherRecord(
    city: String,
    country: String,
    timestamp: java.sql.Timestamp,
    temperature: Double,
    feels_like: Double,
    humidity: Int,
    pressure: Int,
    description: String,
    wind_speed: Double,
    wind_direction: Int,
    cloudiness: Int,
    visibility: Double,
    lat: Double,
    lon: Double)

object Schemas {

  /** Flat ingest schema (reference: src/ingest.py:20-37). */
  val weather: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("timestamp", TimestampType),
    StructField("temperature", DoubleType),
    StructField("feels_like", DoubleType),
    StructField("humidity", IntegerType),
    StructField("pressure", IntegerType),
    StructField("description", StringType),
    StructField("wind_speed", DoubleType),
    StructField("wind_direction", IntegerType),
    StructField("cloudiness", IntegerType),
    StructField("visibility", DoubleType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))

  /** Nested OpenWeatherMap-style API response
    * (reference: src/ingest.py:152-169, tests/conftest.py:122-145).
    * `weather` is an ARRAY of structs — the parser takes element 0.
    */
  val weatherApiJson: StructType = StructType(Seq(
    StructField("coord", StructType(Seq(
      StructField("lon", DoubleType), StructField("lat", DoubleType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("main", StringType),
      StructField("description", StringType), StructField("icon", StringType))))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType), StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType), StructField("temp_max", DoubleType),
      StructField("pressure", IntegerType), StructField("humidity", IntegerType)))),
    StructField("visibility", DoubleType),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType), StructField("deg", IntegerType)))),
    StructField("clouds", StructType(Seq(StructField("all", IntegerType)))),
    StructField("dt", LongType),
    StructField("sys", StructType(Seq(
      StructField("country", StringType),
      StructField("sunrise", LongType), StructField("sunset", LongType)))),
    StructField("name", StringType)))

  /** Per-load quality metrics side table (reference: sql/schema.sql:42-55). */
  val qualityMetrics: StructType = StructType(Seq(
    StructField("load_timestamp", TimestampType),
    StructField("total_records_processed", LongType),
    StructField("records_after_cleaning", LongType),
    StructField("data_retention_rate", DoubleType),
    StructField("avg_quality_score", DoubleType),
    StructField("cities_count", LongType),
    StructField("countries_count", LongType),
    StructField("date_range_start", TimestampType),
    StructField("date_range_end", TimestampType),
    StructField("metrics_json", StringType)))

  /** Per-load audit log side table (reference: sql/schema.sql:58-68). */
  val loadHistory: StructType = StructType(Seq(
    StructField("load_timestamp", TimestampType),
    StructField("records_loaded", LongType),
    StructField("records_updated", LongType),
    StructField("records_failed", LongType),
    StructField("load_duration_seconds", DoubleType),
    StructField("load_status", StringType),
    StructField("error_message", StringType)))

  /** Cities config (reference: config/cities.json, src/ingest.py:192-213). */
  val citiesConfig: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("country_code", StringType)))
}
