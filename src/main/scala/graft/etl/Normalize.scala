package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization stage (reference: src/transform.py:125-151). */
object Normalize {

  /** clip_range (reference: src/transform.py:132-141). */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  def clipLower(c: Column, lo: Double): Column = greatest(c, lit(lo))

  /** mod_wind_dir (reference: src/transform.py:138). Python `%` is
    * always non-negative → `pmod`, NOT `%` (Scala/SQL `%` keeps sign).
    */
  def wrapDegrees(c: Column): Column = pmod(c, lit(360))

  /** round_precision (reference: src/transform.py:144-149). Uses the
    * cross-engine-deterministic half-up formula (Parity.roundAt): the
    * reference's numpy round is half-even on the decimal repr, which
    * NO SQL engine reproduces exactly on binary doubles (SURVEY §7.4);
    * graft standardizes on one bit-stable rounding everywhere instead.
    */
  def roundTo(c: Column, scale: Int): Column =
    graft.functions.Parity.roundAt(c, scale)

  /** Reference normalization over the weather schema. */
  def normalizeWeather(df: DataFrame): DataFrame = df
    .withColumn("humidity", clip(col("humidity"), 0, 100).cast("int"))
    .withColumn("cloudiness", clip(col("cloudiness"), 0, 100).cast("int"))
    .withColumn("visibility", clipLower(col("visibility"), 0))
    .withColumn("wind_direction", wrapDegrees(col("wind_direction")))
    .withColumn("temperature", roundTo(col("temperature"), 1))
    .withColumn("feels_like", roundTo(col("feels_like"), 1))
    .withColumn("wind_speed", roundTo(col("wind_speed"), 1))
    .withColumn("visibility", roundTo(col("visibility"), 1))
    .withColumn("lat", roundTo(col("lat"), 6))
    .withColumn("lon", roundTo(col("lon"), 6))
}
