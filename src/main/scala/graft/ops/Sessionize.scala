package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch form): a new session starts when
  * the gap to the previous event of the same key exceeds `gapSeconds`.
  * Classic two-window composition — lag to flag session starts, then a
  * running sum to number them — one shuffle on the key, sort within
  * partitions, no iteration.
  */
object Sessionize {

  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(byKey))
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(run))
      .drop("__new_session")
  }

  /** Per-session rollup: event count + duration in seconds. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long): DataFrame =
    sessions(events, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_s"))
}
