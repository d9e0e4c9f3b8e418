package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment stage (reference: src/transform.py:153-184, 218-299).
  *
  * Every reference categorizer is a pure `when`-chain / arithmetic
  * Column expression — native Catalyst, fully codegen'd; no UDFs
  * anywhere (the reference's `.apply`-based categorizers fall back to
  * Python row loops; these do not).
  */
object Enrich {

  /** derive_date (reference: src/transform.py:160). */
  def deriveDate(ts: Column): Column = to_date(ts)

  /** derive_hour (reference: src/transform.py:161). */
  def deriveHour(ts: Column): Column = hour(ts)

  /** derive_day_name (reference: src/transform.py:162) — English names. */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** derive_month_name (reference: src/transform.py:163). */
  def monthName(ts: Column): Column = date_format(ts, "MMMM")

  /** derive_season (reference: src/transform.py:218-227). */
  def season(ts: Column): Column = {
    val m = month(ts)
    when(m.isin(12, 1, 2), "Winter")
      .when(m.isin(3, 4, 5), "Spring")
      .when(m.isin(6, 7, 8), "Summer")
      .otherwise("Autumn")
  }

  /** cat_temp (reference: src/transform.py:229-242) — order-sensitive
    * half-open bands.
    */
  def tempCategory(t: Column): Column =
    when(t < 0, "Freezing")
      .when(t < 10, "Cold")
      .when(t < 20, "Cool")
      .when(t < 25, "Mild")
      .when(t < 30, "Warm")
      .otherwise("Hot")

  /** cat_humidity (reference: src/transform.py:244-251). */
  def humidityCategory(h: Column): Column =
    when(h < 30, "Low").when(h < 60, "Moderate").otherwise("High")

  /** cat_wind (reference: src/transform.py:253-268) — Beaufort-ish bands. */
  def windCategory(w: Column): Column =
    when(w < 1, "Calm")
      .when(w < 6, "Light")
      .when(w < 12, "Gentle")
      .when(w < 20, "Moderate")
      .when(w < 29, "Fresh")
      .when(w < 39, "Strong")
      .otherwise("Gale")

  /** comfort_index (reference: src/transform.py:270-282):
    * temperature, +0.1·(humidity−70) when humid, −0.05·(30−humidity)
    * when dry; rounded to 1 dp.
    */
  def comfortIndexRaw(t: Column, h: Column): Column =
    t + when(h > 70, (h - 70) * 0.1).otherwise(0.0) -
      when(h < 30, (lit(30) - h) * 0.05).otherwise(0.0)

  def comfortIndex(t: Column, h: Column): Column =
    graft.functions.Parity.roundAt(comfortIndexRaw(t, h), 1)

  /** concat_location (reference: src/transform.py:178) — "City, CC". */
  def location(city: Column, country: Column): Column =
    concat_ws(", ", city, country)

  /** concat_coord (reference: src/transform.py:179) — "lat,lon". */
  def coordString(lat: Column, lon: Column): Column =
    concat(lat.cast("string"), lit(","), lon.cast("string"))

  /** quality_score (reference: src/transform.py:284-299): 100 minus
    * fixed penalties, clipped to [0,100].
    */
  def qualityScore(windSpeed: Column, visibility: Column, temperature: Column): Column = {
    val raw = lit(100.0) -
      when(windSpeed.isNull, 5.0).otherwise(0.0) -
      when(visibility === 0.0, 3.0).otherwise(0.0) -
      when(temperature > 45.0, 5.0).otherwise(0.0) -
      when(temperature < -30.0, 5.0).otherwise(0.0) -
      when(windSpeed > 100.0, 10.0).otherwise(0.0)
    least(greatest(raw, lit(0.0)), lit(100.0))
  }

  /** Full enrichment over the weather schema
    * (reference: src/transform.py:153-184, 12 derived columns).
    */
  def enrichWeather(df: DataFrame): DataFrame = df
    .withColumn("date", deriveDate(col("timestamp")))
    .withColumn("hour", deriveHour(col("timestamp")))
    .withColumn("day_of_week", dayName(col("timestamp")))
    .withColumn("month", monthName(col("timestamp")))
    .withColumn("season", season(col("timestamp")))
    .withColumn("temp_category", tempCategory(col("temperature")))
    .withColumn("humidity_category", humidityCategory(col("humidity")))
    .withColumn("wind_category", windCategory(col("wind_speed")))
    .withColumn("comfort_index", comfortIndex(col("temperature"), col("humidity")))
    .withColumn("location", location(col("city"), col("country")))
    .withColumn("coord_string", coordString(col("lat"), col("lon")))
    .withColumn("quality_score",
      qualityScore(col("wind_speed"), col("visibility"), col("temperature")))
}
