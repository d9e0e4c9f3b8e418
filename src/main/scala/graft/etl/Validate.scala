package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation stage (reference: src/transform.py:186-216). */
object Validate {

  /** filter_outliers (reference: src/transform.py:193-210). The
    * reference applies 4 sequential boolean masks; here it is ONE
    * conjunctive filter so Catalyst can push the whole predicate to the
    * scan. Because validation references only pre-enrichment columns,
    * running it before enrichment is a legal, free reordering — the
    * pipeline relies on Catalyst's PushDownPredicate for that.
    */
  val weatherBounds: Column =
    col("temperature").between(-60, 60) &&
      col("pressure").between(800, 1100) &&
      (col("wind_speed") <= 200) &&
      col("lat").between(-90, 90) &&
      col("lon").between(-180, 180)

  def validateWeather(df: DataFrame): DataFrame = df.filter(weatherBounds)

  /** Generic bounds conjunction for arbitrary columns. */
  def withinBounds(bounds: Seq[(String, Double, Double)]): Column =
    bounds.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduce(_ && _)
}
