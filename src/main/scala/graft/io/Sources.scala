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

  /** Normalize an events `ts` column to TIMESTAMP whatever unit the
    * parquet footer declared. The corpus has shipped both
    * TIMESTAMP(NANOS) — which Spark's vectorized reader only surfaces
    * as a nanos-since-epoch long under `nanosAsLong` — and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads natively as
    * TIMESTAMP_NTZ. Dispatch on the READ type, never assume a unit:
    *  - LongType: nanos → integral `div 1000` to micros (double
    *    division would lose precision at 1e18 nanos; DuckDB truncates
    *    ns→µs the same way);
    *  - TimestampNTZType: value-preserving cast (session TZ pinned
    *    UTC);
    *  - TimestampType: passthrough.
    * One output type for every unit means downstream plans never
    * re-encode unit knowledge. The target is TIMESTAMP (not NTZ)
    * because streaming watermarks REQUIRE it
    * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE rejects NTZ event time).
    */
  def normalizeTs(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType =>
        timestamp_micros(call_function("div", c, lit(1000L)))
      case TimestampNTZType => c.cast(TimestampType)
      case TimestampType    => c
      case other => throw new IllegalArgumentException(
        s"unsupported events ts type: $other")
    }
  }

  /** Corpus table loader: `<dir>/<name>.parquet`. The events table's
    * `ts` is normalized to TIMESTAMP via [[normalizeTs]] — unit
    * detection from the footer's read type, not a hardcoded unit.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.TimestampType)
      df.withColumn("ts", normalizeTs(col("ts"), df.schema("ts").dataType))
    else df
  }

  /** Streaming twin of [[table]] for the events corpus: a streaming
    * file source needs a DECLARED schema, so the footer is probed with
    * a schema-only batch read (no data scan) and the stream declares
    * exactly what the footer stores, then normalizes `ts` through the
    * same [[normalizeTs]] the batch reader uses. One reader family owns
    * the unit; query code never does timestamp arithmetic on raw longs.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val dt = schema("ts").dataType
    if (dt == org.apache.spark.sql.types.TimestampType) stream
    else stream.withColumn("ts", normalizeTs(col("ts"), dt))
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
