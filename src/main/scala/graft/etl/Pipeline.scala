package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage composition — the lazy-plan analogue of the reference's eager
  * 5-stage pandas pipeline (reference: src/transform.py:40-69). Each
  * stage is a pure DataFrame => DataFrame; the pipeline is their fold.
  * Nothing materializes until an action, so Catalyst optimizes across
  * stage boundaries (e.g. pushes the validation filter below the 12
  * enrichment projections).
  */
object Pipeline {

  def stages(dedupTieBreak: Seq[String] = Nil): Seq[DataFrame => DataFrame] = Seq(
    df => Clean.dedupFirstPerKeyHour(df, Seq("city", "country"), "timestamp",
      dedupTieBreak),
    df => Clean.fillConst(df, Map("wind_speed" -> 0.0, "wind_direction" -> 0)),
    df => Clean.fillMedianLazy(df, "visibility"),
    df => Clean.dropNullCritical(df,
      Seq("temperature", "humidity", "pressure", "lat", "lon")),
    Clean.cleanWeatherText,
    Normalize.normalizeWeather,
    Enrich.enrichWeather,
    Validate.validateWeather)

  /** transform_weather_data (reference: src/transform.py:40-69).
    * `dedupTieBreak` pins the keep-first winner when two rows share the
    * key AND the exact timestamp (pandas keeps input order; a shuffle
    * has no input order, so ties need a total order to be stable).
    */
  def transform(df: DataFrame, dedupTieBreak: Seq[String] = Nil): DataFrame =
    stages(dedupTieBreak).foldLeft(df)((d, s) => s(d))

  /** Deterministic adapter: project the corpus `events` table into the
    * weather schema so the full reference pipeline can run against the
    * driver corpus (the reference's own weather table does not exist
    * there — FIXTURES.md §C). Pure column arithmetic; used by
    * SparkEntry.entry and the test suites.
    */
  def weatherFromEvents(events: DataFrame): DataFrame = {
    val v = col("value")
    events.select(
      concat_ws(" ", lit(" city"), (col("user_id") % 50).cast("string")).as("city"),
      substring(col("event_type"), 1, 2).as("country"),
      col("ts").as("timestamp"),
      (v / 4 - 20).as("temperature"),
      (v / 4 - 22).as("feels_like"),
      (floor(v).cast("int") % 101).as("humidity"),
      (lit(800) + (floor(v * 7).cast("int") % 300)).as("pressure"),
      col("event_type").as("description"),
      when(col("user_id") % 13 === 0, lit(null))
        .otherwise(Normalize.roundTo(v / 8, 2)).as("wind_speed"),
      (floor(v * 13).cast("int") % 720 - 360).as("wind_direction"),
      (floor(v).cast("int") % 120).as("cloudiness"),
      when(v < 50, lit(null))
        .otherwise(Normalize.roundTo(v / 20, 2)).as("visibility"),
      (pmod(v, lit(180.0)) - 90 + 0.1234567).as("lat"),
      (pmod(v * 2, lit(360.0)) - 180).as("lon"))
  }
}
