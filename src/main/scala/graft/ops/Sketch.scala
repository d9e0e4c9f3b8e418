package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Parity

/** Deterministic sketches — the cardinality-estimation family with a
  * twist the probabilistic built-ins (`approx_count_distinct` HLL,
  * checked oracle-less in agg_approx) can't offer: a KMV sketch over a
  * FIXED hash is a pure function of the value set, so its estimate is
  * bit-identical across engines, partitionings, and re-runs — it can
  * be ORACLE-CHECKED exactly, while still being a genuine sublinear
  * sketch (state = k hashes regardless of cardinality).
  */
object Sketch {

  /** KMV (k-minimum-values) distinct-count estimate: keep the k
    * smallest distinct 60-bit hashes of the value; with hashes uniform
    * on [0, 2^60), the k-th minimum h_k estimates the cardinality as
    * (k−1) · 2^60 / h_k (the classic KMV estimator, ±O(1/√k)
    * relative error — bounds asserted in the spec, exact value in the
    * oracle).
    *
    * Scale shape: the distinct() is a hash aggregate on 8-byte keys
    * (map-side combined), and the k-smallest selection plans as
    * TakeOrderedAndProject — per-partition heaps of k rows merged on
    * the driver, never a global sort. The sketch is MERGEABLE (union
    * the min-k sets, keep the k smallest), which is what makes it a
    * sketch rather than a distinct-count: per-partition / per-day
    * states compose.
    *
    * Returns one row: (k, k_actual, kth_min, est_distinct) —
    * `k_actual` < k flags the degenerate under-populated case where
    * the estimate should not be trusted (the exact count is k_actual).
    */
  def kmvDistinct(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k > 1, s"kmvDistinct: k must exceed 1: $k")
    finalizeKmv(kmvState(df, value, k), k)
  }

  /** The sketch STATE: the min-k distinct 60-bit hash set (≤ k rows —
    * this is the whole point of a KMV sketch: the state is k longs no
    * matter how large the input). MERGEABLE exactly:
    * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), because any hash in
    * the combined min-k must already be in its own shard's min-k.
    * NULL values hash to NULL, and the engines disagree on where an
    * ascending sort puts NULLs (Spark: first, DuckDB: last) — a NULL
    * sneaking into the min-k set would silently skew kth_min on one
    * side only. A sketch of the VALUE set ignores NULLs, explicitly.
    */
  def kmvState(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(Parity.md5_60(value.cast("string")).as("h"))
      .filter(col("h").isNotNull).distinct()
      .orderBy(col("h").asc).limit(k)

  /** Fold shard states into the combined estimate — the distributed
    * cadence: per-shard (per-day, per-partition) sketches are k-row
    * relations, merging is a union + min-k over Σ shards × k rows,
    * and the estimate must equal the direct whole-input sketch (the
    * registered query proves it against the direct oracle).
    */
  def kmvFromStates(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "kmvFromStates: no states")
    finalizeKmv(states.reduce(_ unionByName _).distinct()
      .orderBy(col("h").asc).limit(k), k)
  }

  private def finalizeKmv(minK: DataFrame, k: Int): DataFrame = {
    // 2^60 and (k−1) are exactly representable doubles; the int64 →
    // double cast of h_k rounds to nearest identically in both engines
    val two60 = lit(1152921504606846976L).cast("double")
    minK.agg(max(col("h")).as("kth_min"), count(lit(1)).as("k_actual"))
      .select(lit(k.toLong).as("k"), col("k_actual"), col("kth_min"),
        (lit((k - 1).toDouble) * two60 / col("kth_min").cast("double"))
          .as("est_distinct"))
  }
}
