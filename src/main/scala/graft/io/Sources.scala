package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Readers. Every reader takes an explicit schema — never infer
  * (inference is a full extra scan at 100 TB and can drift types).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Corpus table loader: `<dir>/<name>.parquet`.
    *
    * The corpus `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; it is read as a nanos-since-epoch long
    * (`nanosAsLong`) and converted with integer division to micros —
    * `ts div 1000`, never `/` (double division would lose precision at
    * 1e18 nanos). DuckDB's reader does the same ns→µs truncation, so
    * the oracle sees identical values.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** src_csv — header CSV with declared schema; the reference re-parses
    * timestamp/date columns on every inter-stage read
    * (reference: airflow_dag/weather_etl_dag.py:182,251-255); with a
    * declared schema Spark parses them once at scan time.
    */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def json(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** src_json_parse — flatten one nested API JSON document per row into
    * the 14-column weather schema (reference: src/ingest.py:152-169):
    * missing wind/visibility default to 0 and visibility converts m→km.
    * Input: a DataFrame with a string column holding the raw JSON.
    * Runs as pure Catalyst expressions (from_json + projections), so at
    * scale it stays inside whole-stage codegen — no UDF, no driver loop.
    */
  def parseWeatherJson(raw: DataFrame, jsonCol: String): DataFrame = {
    val j = from_json(col(jsonCol), Schemas.weatherApiJson)
    raw.select(
      j.getField("name").as("city"),
      j.getField("sys").getField("country").as("country"),
      to_timestamp(from_unixtime(j.getField("dt"))).as("timestamp"),
      j.getField("main").getField("temp").as("temperature"),
      j.getField("main").getField("feels_like").as("feels_like"),
      j.getField("main").getField("humidity").as("humidity"),
      j.getField("main").getField("pressure").as("pressure"),
      element_at(j.getField("weather"), 1).getField("description").as("description"),
      coalesce(j.getField("wind").getField("speed"), lit(0.0)).as("wind_speed"),
      coalesce(j.getField("wind").getField("deg"), lit(0)).as("wind_direction"),
      coalesce(j.getField("clouds").getField("all"), lit(0)).as("cloudiness"),
      (coalesce(j.getField("visibility"), lit(0.0)) / 1000.0).as("visibility"),
      j.getField("coord").getField("lat").as("lat"),
      j.getField("coord").getField("lon").as("lon"))
  }

  /** src_config_json — cities list with hard-coded fallback on a
    * missing/corrupt file (reference: src/ingest.py:192-213).
    */
  def citiesConfig(spark: SparkSession, path: String): DataFrame = {
    val fallback: Seq[(String, String)] = Seq(
      "London" -> "GB", "New York" -> "US", "Tokyo" -> "JP",
      "Paris" -> "FR", "Sydney" -> "AU", "Berlin" -> "DE",
      "Moscow" -> "RU", "Beijing" -> "CN", "Mumbai" -> "IN",
      "Cairo" -> "EG")
    try {
      val df = spark.read.schema(Schemas.citiesConfig).json(path)
      if (df.limit(1).count() == 0) throw new RuntimeException("empty config")
      df
    } catch {
      // NonFatal only: a corrupt/missing config falls back, but OOM or
      // interrupts must still propagate
      case scala.util.control.NonFatal(_) =>
        import spark.implicits._
        fallback.toDF("city", "country_code")
    }
  }
}
