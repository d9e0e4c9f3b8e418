package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an IRREGULAR per-key
  * observation series onto a fixed hourly grid, forward-filling each
  * gap with the last observation at or before the slot — the
  * resample-and-fill every downstream window/rolling/as-of consumer
  * of sensor-style data (the reference's weather series is exactly
  * this shape) wants as input.
  *
  * Scale shape, stage by stage:
  *  1. hourly close: one map-side-combined `max_by(value, (ts, id))`
  *     per (key, hour) — the deterministic winner discipline
  *     (`min_by`/`max_by`, never `dropDuplicates`), and the (key,
  *     hour) granularity splits even a zipfian-hot key across its
  *     hours before the exchange;
  *  2. grid: per-key `sequence(min hour, max hour, 1h)` + explode —
  *     output is grid-sized (keys × hours), never observation-sized,
  *     and the sequence bounds come from one bounded aggregate;
  *  3. forward fill: `last(value, ignoreNulls)` over an
  *     unbounded-preceding frame per key — Spark executes growing
  *     frames incrementally (O(n) per key, see [[Rolling]]'s frame
  *     note), and per-key sequential order is inherent to
  *     forward-fill semantics. A key's fill task is bounded by ITS
  *     OWN grid span (hours between first and last observation), not
  *     by its observation count — the hot-key row count collapses at
  *     stage 1.
  *
  * `filled` marks imputed slots (no observation in that hour) so a
  * consumer can weight or drop carried values — the gap REPORT and
  * the gap FILL are one pass.
  */
object Resample {

  def resampleHourlyFfill(obs: DataFrame, keyCol: String, tsCol: String,
                          idCol: String, valCol: String): DataFrame = {
    val k = col(keyCol)
    // a null-valued observation is NO observation: without this filter
    // max_by could pick a null close, which last(ignoreNulls) would
    // then skip — the slot would carry the previous value while
    // reading as observed (filled=false), a silent semantic fork
    val hourly = obs.filter(col(valCol).isNotNull)
      .withColumn("__h", date_trunc("hour", col(tsCol)))
      .groupBy(k, col("__h"))
      .agg(expr(s"max_by($valCol, struct($tsCol, $idCol))").as("__close"))
    val grid = hourly.groupBy(k)
      .agg(min(col("__h")).as("__mn"), max(col("__h")).as("__mx"))
      .select(k, explode(sequence(col("__mn"), col("__mx"),
        expr("INTERVAL 1 HOUR"))).as("slot"))
    val joined = grid.join(hourly,
      grid(keyCol) === hourly(keyCol) && col("slot") === col("__h"), "left")
      .select(grid(keyCol), col("slot"), col("__close"))
    val wFill = Window.partitionBy(k).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("value", last(col("__close"), ignoreNulls = true).over(wFill))
      .withColumn("filled", col("__close").isNull)
      .select(k, col("slot"), col("value"), col("filled"))
  }
}
