package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-range rolling aggregates, restated to survive hot keys.
  *
  * The direct form — `SUM(v) OVER (PARTITION BY k ORDER BY t RANGE
  * BETWEEN W PRECEDING AND CURRENT ROW)` — is what every engine's SQL
  * says, but Spark executes a bounded-preceding frame with
  * `SlidingWindowFunctionFrame`, which RE-AGGREGATES the frame buffer
  * every time the lower bound moves (sum has no retract): cost
  * O(rows × frame size) per partition. On a uniform corpus frames are
  * small and nobody notices; on a zipfian corpus the hot key's
  * partition is both the biggest AND has the widest frames — measured
  * 52 s for one 34 k-event user at sf0.1 (tools/gen_skew.py), a
  * single-task quadratic straggler that 100 TB turns into hours.
  *
  * Restatement (exact, not approximate): a trailing sum is a
  * difference of two CUMULATIVE sums —
  *
  *   result(t) = cum(t) − cum(t − W − 1)
  *
  * and growing (unbounded-preceding) frames are O(n) incremental in
  * Spark (`UnboundedPrecedingWindowFunctionFrame` only ever adds).
  * The frame-start lookup needs cum at t − W − 1, which lands between
  * event times — solved with the union-merge trick ([[AsOf]]): each
  * event row also emits a PROBE row at t − W − 1; one window over the
  * union (per key, ordered by time, range-unbounded-preceding) gives
  * every row — real and probe — the cumulative count/sum at its
  * position; a final hash aggregate on the row id pairs each event
  * with its probe and subtracts. All decimal arithmetic, so the
  * difference is bit-identical to the direct frame's sum.
  *
  * Cost: one shuffle on the key, one per-key sort of 2n rows with an
  * O(n) growing frame, one map-side-combined aggregate on the unique
  * row id. The hot key still owns one task (a value-range window is
  * sequential per key by definition) but the work is linear —
  * measured 52 s → ~1 s on the zipfian probe corpus.
  */
object Rolling {

  /** (idCol, keyCol, n, sum_dec) per input row: count and exact
    * DECIMAL(18,2) sum of `valueCol` over rows of the same key with
    * `secsCol` in [t − windowSec + 1, t] — i.e. SQL's
    * `RANGE BETWEEN (windowSec−1) PRECEDING AND CURRENT ROW` on an
    * integer-seconds order column, timestamp-tie peers included.
    */
  def trailingCountSum(events: DataFrame, idCol: String, keyCol: String,
                       secsCol: String, valueCol: String,
                       windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val zero = lit(0).cast(DecimalType(18, 2))
    val real = events.select(
      col(idCol).as("__id"), col(keyCol).as("__k"),
      col(secsCol).cast("long").as("__t"), lit(1).as("__tag"),
      col(valueCol).cast(DecimalType(18, 2)).as("__v"))
    val probe = events.select(
      col(idCol).as("__id"), col(keyCol).as("__k"),
      (col(secsCol).cast("long") - windowSec).as("__t"), lit(0).as("__tag"),
      lit(null).cast(DecimalType(18, 2)).as("__v"))
    // RANGE (not ROWS) growing frame: all rows at the same __t — tie
    // peers and the co-located probes — see the same cumulative, which
    // is exactly the RANGE-frame tie semantics of the direct form
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = real.unionByName(probe)
      .withColumn("__cn",
        sum(when(col("__tag") === 1, 1L).otherwise(0L)).over(w))
      .withColumn("__cv", sum(when(col("__tag") === 1, col("__v"))).over(w))
    cum.groupBy(col("__id"), col("__k"))
      .agg(
        (max(when(col("__tag") === 1, col("__cn"))) -
          coalesce(max(when(col("__tag") === 0, col("__cn"))), lit(0L)))
          .as("n"),
        (coalesce(max(when(col("__tag") === 1, col("__cv"))), zero) -
          coalesce(max(when(col("__tag") === 0, col("__cv"))), zero))
          .as("sum_dec"))
      .select(col("__id").as(idCol), col("__k").as(keyCol),
        col("n"), col("sum_dec"))
  }
}
