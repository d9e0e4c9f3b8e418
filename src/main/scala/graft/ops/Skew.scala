package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation: two-phase salted aggregation.
  *
  * A groupBy on a hot key (few distinct values, e.g. event_type) sends
  * each key's entire volume to one reducer. Salting splits phase 1
  * across (key, salt) — `buckets` reducers per key — and phase 2 merges
  * the tiny partials. Both phases are exact: counts and decimal sums
  * compose associatively, so the result is identical to the unsalted
  * aggregate (which is what the oracle runs).
  *
  * The salt is spark_partition_id() — free, and purely physical: it
  * never appears in the result, so determinism is preserved because
  * the merged aggregates are order-independent.
  */
object Skew {

  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16, scale: Int = 2): DataFrame = {
    val salted = df.withColumn("__salt", spark_partition_id() % buckets)
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast(DecimalType(18, scale))).as("__s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_value"))
  }
}
