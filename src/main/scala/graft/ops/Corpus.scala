package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Parity

/** Corpus-construction operators a pretraining-data pipeline needs
  * beyond cleaning and dedup: reproducible sampling, vocabulary
  * statistics, and sequence packing. All pure Column expressions over
  * one narrow shuffle each — no RNG state, no driver loops.
  */
object Corpus {

  /** Deterministic hash sampling: keep a row iff
    * md5_60(id) mod 100 < pct. Unlike `df.sample` (partition-layout- and
    * seed-dependent RNG), the decision is a pure function of the row
    * key, so the sample is REPRODUCIBLE across engines, re-runs, and
    * repartitioning — the property that matters when a 100-TB corpus
    * snapshot must be re-derivable. The md5_60 digest is uniform enough
    * that pct ≈ the realized rate.
    */
  def hashSample(df: DataFrame, idCol: String, pct: Column): DataFrame =
    df.filter(Parity.md5_60(col(idCol).cast("string")) % 100 < pct)

  /** Stratified variant: per-stratum percentages expressed as a Column
    * (e.g. a when-chain over a language column) — upsample rare
    * strata, downsample dominant ones, still fully deterministic.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String,
                           pctByStratum: Column): DataFrame =
    hashSample(df, idCol, pctByStratum)

  /** Top-k vocabulary: token frequencies over the normalized corpus,
    * ties broken lexicographically (deterministic). Explode + count is
    * one shuffle on the token; the global top-k plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextOps.tokens(TextOps.normalized(col(textCol))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Greedy sequence packing — concatenate-and-chop: docs are laid out
    * in a deterministic order (id) per group (language), and each doc
    * is assigned to the context-window bin its STARTING token offset
    * falls in (bin = start_offset div budget). This is the standard
    * pretraining packing approximation; the whole layout is one
    * running-sum window over (group, id) — a single shuffle, no
    * sequential driver pass, reproducible at any parallelism.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, budgetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(groupCol),
        TextOps.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div $budgetTokens"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
  }
}
