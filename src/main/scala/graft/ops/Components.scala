package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * that turns pairwise matches into dedup GROUPS (keep one
  * representative per component).
  *
  * Iterative minimum-label propagation with pointer jumping: each
  * round every node adopts the smallest label among itself and its
  * neighbors, then follows its label two more hops
  * (label ← m(m(m(node))) where m is the propagate map). Each jump
  * multiplies the distance a minimum travels per round, so rounds are
  * O(log diameter) instead of O(diameter) — and the extra hop is one
  * more equi-join inside the SAME checkpointed job, so on local/driver-
  * latency-bound runs it halves the dominant cost (rounds × job
  * latency) rather than adding work.
  *
  * Each round is a fixed number of distributed joins + one aggregate;
  * the driver only ever sees a converged flag. Lineage is truncated
  * with localCheckpoint every round (the labels relation is
  * re-materialized anyway for the convergence check), so plan depth
  * and analysis time stay constant no matter how many rounds run —
  * without it, iteration 20's logical plan nests all 19 predecessors.
  *
  * The loop runs on a FORKED session (`spark.newSession()` — shared
  * SparkContext and cache, isolated SQL conf): its shuffles are sized
  * to the GRAPH, not the session default, and flipping
  * `spark.sql.shuffle.partitions` on the caller's session would leak
  * the tiny loop parallelism into any query planned concurrently.
  */
object Components {

  /** Re-wrap an (already materialized, e.g. localCheckpointed)
    * DataFrame as a bare scan of its RDD, DISCARDING the logical
    * plan's inherited statistics. localCheckpoint truncates lineage
    * but carries the child plan's ESTIMATED sizeInBytes forward, so
    * an iterative loop that feeds round N's checkpoint into round
    * N+1's joins compounds the estimate multiplicatively per round —
    * by round ~9 of the components loop Catalyst's size-only stats
    * visitor was multiplying ten-million-digit BigIntegers on the
    * driver (the r16/r17 docs-ladder dedup_multi_signal ≥480 s
    * "timeouts"). The rewrap is not a data COPY, but it is not free
    * either (ADVICE r17): `df.rdd` deserializes InternalRow →
    * external Row and createDataFrame re-encodes it, one full
    * conversion round-trip per call on top of the checkpoint
    * materialization. On the narrow (long, long) label relations the
    * loop carries this is noise next to the shuffle it sits behind
    * (sf3 merged graph: 38 rounds in 14–22 s total); on a WIDE
    * relation prefer stripping stats before the expensive columns
    * are attached, or checkpoint less often.
    */
  def stripStats(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** edges: (src, dst) undirected pairs. Returns (node, component)
    * where component = min node id reachable. Deterministic.
    *
    * maxIters is a RUNAWAY BACKSTOP, not a tuning knob: hitting it
    * throws (an unconverged label relation is silently-wrong dedup
    * groups — the one thing worse than failing). 64 is far above any
    * measured need — the 999-diameter chain spec converges in ≤9
    * rounds and the worst observed real graph (the sf3 docs rung's
    * merged 37k-edge lexical∪semantic graph, whose near-critical
    * random semantic part has long thin filaments) takes 38.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 64): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIters)._1

  /** As [[connectedComponents]], additionally returning the number of
    * propagate+jump rounds the loop ran (for convergence assertions).
    */
  def connectedComponentsWithRounds(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 64): (DataFrame, Int) = {
    // materialize the edge list ONCE before mirroring it: the union's
    // two branches are renamed copies of the same subplan, and Spark
    // does not reuse exchanges across renamed branches — an expensive
    // upstream (e.g. a Jaccard pair join) would run twice
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .localCheckpoint(true)
    // size the loop's shuffles to the graph: every round is a handful
    // of stages, and on a small near-dup graph (thousands of edges)
    // 32-partition stages are pure task-scheduling overhead ×
    // O(log diameter) rounds. The edge count is free — e0 is already
    // materialized. Large graphs keep the session parallelism.
    val spark = edges.sparkSession
    val partsKey = "spark.sql.shuffle.partitions"
    val sessionParts = spark.conf.get(partsKey).toInt
    val loopParts = math.max(2L, math.min(sessionParts.toLong,
      e0.count() / 50000L + 1L)).toInt
    val loopSpark = spark.newSession()
    // newSession() starts from the BASE conf, not the caller's runtime
    // conf — AQE/ANSI/timezone settings the caller set at runtime (the
    // loop's exchange-reuse note depends on AQE) would silently not
    // apply inside the loop. Copy the caller's modifiable runtime conf
    // over, THEN override the loop's shuffle parallelism.
    spark.conf.getAll.foreach { case (key, v) =>
      if (loopSpark.conf.isModifiable(key)) loopSpark.conf.set(key, v)
    }
    loopSpark.conf.set(partsKey, loopParts.toString)
    // re-home the checkpointed edges onto the forked session (the RDD is
    // context-level and already materialized; createDataFrame re-wraps
    // it with a row-conversion step, not a data copy), run the loop
    // there, and re-home the materialized result back onto the caller's
    // session so downstream plans compose with caller DataFrames
    val eLoop = loopSpark.createDataFrame(e0.rdd, e0.schema)
    val (labels, rounds) = connectedLoop(eLoop, maxIters)
    (spark.createDataFrame(labels.rdd, labels.schema), rounds)
  }

  private def connectedLoop(e0: DataFrame, maxIters: Int): (DataFrame, Int) = {
    val und = e0
      .unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().cache()
    // seed with round 1 for free: label = min(self, neighbors) is a
    // plain aggregate over the edge list, no join needed
    var labels = und.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("label"))
      .select(col("u").as("node"), col("label")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // 1) propagate: adopt the min label among self and neighbors.
      // The jumps self-join `mid`, but its expensive part (the
      // neighbor-min aggregate) terminates in an exchange, which AQE's
      // ReuseExchange dedupes across the renamed branches (measured:
      // checkpointing `mid` here bought nothing) — only `next` is
      // materialized, which both cuts per-round lineage and feeds the
      // convergence check.
      val neighborMin = und
        .join(labels, und("v") === labels("node"))
        .groupBy(und("u").as("node"))
        .agg(min(col("label")).as("nmin"))
      val mid = labels.withColumnRenamed("label", "old")
        .join(neighborMin, "node")
        .select(col("node"), col("old"),
          least(col("old"), col("nmin")).as("mid"))
      // 2) jump twice: label ← m(m(m(node))). Every label IS a node id
      // present in `mid` (labels only ever hold reachable node ids), so
      // both inner joins are total; jumped labels can only shrink.
      val jm1 = mid.select(col("node").as("__jn1"), col("mid").as("__jl1"))
      val jm2 = mid.select(col("node").as("__jn2"), col("mid").as("__jl2"))
      // eager localCheckpoint EVERY round: measured against the
      // cache-and-count-per-round alternative (checkpoint every 4th),
      // which re-evaluated the cached round chain and ran 4-6× slower —
      // constant plan depth per round is what keeps O(log d) rounds at
      // O(log d) cost. The convergence signal rides the SAME job as an
      // observed metric (CollectMetrics fires on the checkpoint's
      // materializing action), so each round costs ONE driver action,
      // not a checkpoint + a second count scan — at ~15 rounds on
      // high-diameter graphs the per-action latency dominated local
      // wall time. Convergence (no label shrank through the full
      // composition) implies mid == old AND old is idempotent — i.e.
      // the true fixed point, where every label is its component's min.
      val obs = new org.apache.spark.sql.Observation()
      val nextCp = mid
        .join(jm1, mid("mid") === jm1("__jn1"))
        .join(jm2, col("__jl1") === jm2("__jn2"))
        .select(mid("node").as("node"), col("old"), col("__jl2").as("label"))
        .observe(obs, sum(when(col("label") < col("old"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint(true)
      val changed = obs.get("changed").asInstanceOf[Long]
      // STRIP the checkpoint's inherited size ESTIMATE before the next
      // round reads it. localCheckpoint truncates lineage but carries
      // the child plan's estimated sizeInBytes forward — and this
      // round's estimate is a product of SIX copies of last round's
      // (labels appears twice in mid, mid three times in next), so the
      // carried number grows as s^(6^round): by round ~9 Catalyst's
      // size-only visitor is multiplying ten-million-digit BigIntegers
      // on the driver, single-threaded, minutes per join-selection
      // pass (measured: the r16/r17 docs-ladder dedup_multi_signal
      // ≥480 s timeouts were THIS, not the pair relation — the merged
      // 37k-edge graph runs more rounds than either edge alone).
      // Re-wrapping the materialized RDD ([[stripStats]]) resets the
      // leaf to a constant default estimate, so per-round stats stay
      // constant-size.
      val next = stripStats(nextCp)
      labels.unpersist()
      labels = next.drop("old")
      converged = changed == 0
      i += 1
    }
    und.unpersist()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(s"[cc] rounds=$i converged=$converged")
    // an unconverged label relation is WRONG dedup groups (a component
    // split in two keeps a duplicate) — refuse to return it
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "raise maxIters; a partial label relation is not an answer")
    (labels.withColumnRenamed("label", "component"), i)
  }
}
