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

  /** Salted equi-join for hot keys — the 100-TB join failure mode
    * saltedCountSum does not cover: one hot key (a dominant user,
    * domain, or event type) sends its entire pair volume to ONE
    * reducer of a shuffle join. The large `left` side gets a physical
    * salt, the small `right` side is REPLICATED across all `buckets`
    * salt values, and the join key becomes (keys, salt): a hot key's
    * rows now spread over `buckets` reducers. Exact — each left row
    * meets each matching right row exactly once (the replica carrying
    * its salt) — so the result equals the unsalted join and the oracle
    * is the plain JOIN.
    *
    * The trade: the right side shuffles/broadcasts `buckets`× larger.
    * Worth it when the right side is too big to broadcast but far
    * smaller than the left (dimension-vs-fact); a broadcastable right
    * side needs no salting at all, and symmetric-skew joins belong to
    * AQE's skew-join splitting. The salt is spark_partition_id() —
    * free, purely physical, never in the result.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt", spark_partition_id() % buckets)
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
