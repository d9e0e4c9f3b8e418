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
  *
  * WHEN TO REACH FOR WHICH LEVER — measured on a 20M-row zipfian
  * corpus, 85% of rows on one key (artifacts/skew_pairs_r16.json;
  * SCALING.md round 16):
  *   1. Broadcast first: a dim that fits the broadcast threshold
  *      makes every shuffle-join skew question moot.
  *   2. Algebraic aggregation (count/sum/avg): do NOTHING — partial
  *      aggregation collapses the hot key map-side (busiest reducer
  *      read 64 records for 17M hot rows). [[saltedCountSum]] is for
  *      payloads with weak partials, not plain count/sum.
  *   3. Pure shuffle join: prefer AQE skew-join (zero code; 17.2M →
  *      538k max task read, 2.7× wall). [[saltedJoin]] matches it.
  *   4. Join FEEDING a same-key aggregate: AQE silently declines the
  *      split (it would break the partitioning the agg reuses) and
  *      the fused hot reducer gets 2× worse — either set
  *      spark.sql.adaptive.forceOptimizeSkewedJoin or use
  *      [[saltedJoin]], whose (key, salt) output partitioning gives
  *      the agg its partial split for free (both ~10× vs declined).
  *   5. Window-shaped skew (as-of joins, per-key ordered ops): AQE
  *      does not apply to window exchanges — time-bucketed salting
  *      ([[graft.ops.AsOf.joinAsOfSalted]]) is the only lever
  *      (measured 8.1×).
  */
object Skew {

  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16, scale: Int = 2): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
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
    // buckets = 0 would be a runtime `% 0` error and sequence(0, -1)
    // replicas; negative buckets silently under-replicate — refuse both
    require(buckets > 0, s"buckets must be positive: $buckets")
    val salted = left.withColumn("__salt", spark_partition_id() % buckets)
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** The composed join→same-key-aggregate shape, salted END TO END —
    * the case the skew_pairs probe measured as AQE's blind spot
    * (artifacts/skew_pairs_r16.json: AQE silently declines to split a
    * skewed join whose output partitioning a same-key aggregate
    * reuses — splitting would break the reuse — so the fused hot
    * reducer runs the join AND the aggregate, 12.7 s vs 1.2 s
    * salted). Salting fixes it structurally: the join keys on
    * (keys, salt), so its output partitioning already splits the hot
    * key `buckets` ways, and the aggregate runs its PARTIAL phase per
    * (keys, salt) on those same partitions — no second exchange of
    * hot rows — before the final per-key merge of `buckets` partial
    * rows. Exact: the salted join is exact ([[saltedJoin]]) and
    * count/sum re-aggregate associatively (the sum in decimal, like
    * [[saltedCountSum]], so the double result is order-independent);
    * the oracle is the plain join + GROUP BY.
    */
  def saltedJoinAgg(left: DataFrame, right: DataFrame, keys: Seq[String],
                    valueCol: String, buckets: Int = 16,
                    scale: Int = 2): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val salted = left.withColumn("__salt", spark_partition_id() % buckets)
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val joined = salted.join(replicated, keys :+ "__salt")
    val partial = joined
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast(DecimalType(18, scale))).as("__s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_value"))
  }

  /** Skew-AWARE variant of [[saltedJoin]]: only keys whose left-side
    * row count exceeds `hotThreshold` get salted; cold keys join with
    * salt 0 on both sides, and the right side is replicated ONLY for
    * the hot keys — replication overhead is |hot ∩ right| × buckets
    * rows instead of |right| × buckets, which is what makes salting
    * affordable when the right side is itself large. Detection is one
    * ids-only count aggregate over the left (map-side combined, output
    * = distinct keys), broadcast to tag both sides. Exact: a hot left
    * row meets each matching right row exactly once (the replica with
    * its salt); a cold row meets the single salt-0 copy.
    */
  def saltedJoinSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       hotThreshold: Long, buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val kcols = keys.map(col)
    val hot = left.groupBy(kcols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(kcols: _*).withColumn("__hot", lit(true))
    val l = left.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, spark_partition_id() % buckets)
          .otherwise(lit(0)))
      .drop("__hot")
    val rCold = right.join(broadcast(hot), keys, "left_anti")
      .withColumn("__salt", lit(0))
    val rHot = right.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(rCold.unionByName(rHot), keys :+ "__salt").drop("__salt")
  }
}
