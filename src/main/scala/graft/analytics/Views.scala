package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four SQL views + summary query as DataFrame
  * functions over the weather schema (reference: sql/schema.sql:82-140,
  * src/load.py:556-588). Each is a single hash-aggregate or ranking
  * window — partial aggregation and top-k come from Spark for free.
  */
object Views {

  /** daily_weather_summary (reference: sql/schema.sql:82-97). */
  def dailyWeatherSummary(df: DataFrame): DataFrame = df
    .groupBy(col("city"), col("country"), col("date"))
    .agg(
      avg("temperature").as("avg_temperature"),
      min("temperature").as("min_temperature"),
      max("temperature").as("max_temperature"),
      avg("humidity").as("avg_humidity"),
      avg("pressure").as("avg_pressure"),
      avg("wind_speed").as("avg_wind_speed"),
      count(lit(1)).as("record_count"),
      avg("quality_score").as("avg_quality_score"))
    .orderBy(col("date").desc, col("city").asc)

  /** latest_weather (reference: sql/schema.sql:100-115) — PostgreSQL
    * DISTINCT ON (city,country) ... ORDER BY timestamp DESC. PG's
    * winner is underdetermined on timestamp ties; we pin a total order.
    * row_number + filter = one shuffle, no global sort.
    */
  def latestWeather(df: DataFrame, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col("city"), col("country"))
      .orderBy(col("timestamp").desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("city"), col("country"))
  }

  /** data_quality_summary (reference: sql/schema.sql:118-127). */
  def dataQualitySummary(metrics: DataFrame): DataFrame = metrics
    .groupBy(to_date(col("load_timestamp")).as("load_date"))
    .agg(
      avg("data_retention_rate").as("avg_retention_rate"),
      avg("avg_quality_score").as("avg_quality_score"),
      sum("records_after_cleaning").as("total_records"),
      count(lit(1)).as("load_count"))
    .orderBy(col("load_date").desc)

  /** seasonal_weather_trends (reference: sql/schema.sql:130-140). */
  def seasonalTrends(df: DataFrame): DataFrame = df
    .groupBy(col("season"), col("temp_category"))
    .agg(
      count(lit(1)).as("record_count"),
      avg("temperature").as("avg_temperature"),
      avg("humidity").as("avg_humidity"),
      avg("wind_speed").as("avg_wind_speed"))
    .orderBy(col("season"), col("temp_category"))

  /** get_data_summary (reference: src/load.py:556-588). Two distinct
    * counts in one aggregate → a single expand-based pass.
    */
  def dataSummary(df: DataFrame): DataFrame = df.agg(
    count(lit(1)).as("total_records"),
    countDistinct(col("city")).as("unique_cities"),
    countDistinct(col("country")).as("unique_countries"),
    min(col("timestamp")).as("earliest_record"),
    max(col("timestamp")).as("latest_record"),
    avg(col("temperature")).as("avg_temperature"),
    avg(col("humidity")).as("avg_humidity"),
    avg(col("quality_score")).as("avg_quality_score"))
}
