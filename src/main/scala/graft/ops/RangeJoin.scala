package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-proximity (range) join via bucketing.
  *
  * A naive `|t_a − t_b| ≤ Δ` predicate plans as a nested-loop join —
  * O(n·m) and a 100-TB death sentence. Bucketing makes it an equi-join:
  * left rows land in bucket ⌊t/Δ⌋, right rows are replicated to their
  * bucket ± 1 (any pair within Δ differs by at most one bucket), the
  * join runs on (keys, bucket) and an exact residual filter removes
  * the boundary false positives. Shuffle = 3× the right side, never
  * the pair space. Each qualifying pair matches exactly once (the
  * replica in the left row's bucket).
  */
object RangeJoin {

  /** Micros-since-epoch for either timestamp flavor: `unix_micros`
    * rejects TIMESTAMP_NTZ, so NTZ casts to TIMESTAMP first — the
    * session TZ is pinned UTC, making the cast value-preserving.
    */
  private def micros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col(tsCol))
    }

  def withinInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     maxDeltaSeconds: Long): DataFrame = {
    val width = maxDeltaSeconds * 1000000L // µs buckets
    val lb = left.withColumn("__lus", micros(left, leftTs))
      .withColumn("__bucket", floor(col("__lus") / width))
    val rb = right.withColumn("__rus", micros(right, rightTs))
      .withColumn("__bucket", explode(array(
        floor(col("__rus") / width) - 1,
        floor(col("__rus") / width),
        floor(col("__rus") / width) + 1)))
    lb.join(rb, keys :+ "__bucket")
      .filter(abs(col("__rus") - col("__lus")) <= width)
      .drop("__bucket")
  }
}
