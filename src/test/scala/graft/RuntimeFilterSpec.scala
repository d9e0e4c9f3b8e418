package graft

import org.apache.spark.sql.functions._
import graft.ops.RuntimeFilter

/** Bloom runtime pruning: never drops a real match (false negatives
  * impossible), actually prunes non-matching fact rows, and composed
  * with the exact join is byte-identical to the plain semi join —
  * which is why join_bloom_pruned's oracle can be stated as one.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact =
    (1L to 20000L).map(i => (i % 4096, i)).toDF("k", "fid")
  private lazy val dim =
    (0L until 4096L by 64).map(Tuple1(_)).toDF("dk")

  test("bloomPruned keeps every exact match and prunes most of the rest") {
    val pruned = RuntimeFilter.bloomPruned(fact, "k", dim, "dk")
    val exact = fact.join(dim, $"k" === $"dk", "left_semi")
    // superset invariant: exact ⊆ pruned (no false negatives, ever)
    assert(exact.join(pruned, Seq("k", "fid"), "left_anti").count() == 0,
      "bloom dropped a real match")
    // and it genuinely prunes: 64 keys × 3 hashes in 1024 bits ≈ 17%
    // fill → FP rate ~0.5%, so kept ≈ matches + a handful
    val total = fact.count()
    val kept = pruned.count()
    val matches = exact.count()
    assert(kept >= matches && kept < total / 2,
      s"expected real pruning: kept $kept of $total (matches $matches)")
    // composed with the exact join → identical to the plain semi join
    val composed = pruned.join(dim, $"k" === $"dk", "left_semi")
    assert(composed.except(exact).count() == 0 &&
      exact.except(composed).count() == 0,
      "bloom-pruned + exact join must equal the plain semi join")
  }

  test("the probe is a scan-side filter fed by a one-row broadcast") {
    val pruned = RuntimeFilter.bloomPruned(fact, "k", dim, "dk")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"),
      s"probe filter missing from the plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row bloom should arrive by broadcast:\n$plan")
    // the only hash exchange allowed is the bloom BUILD side's ≤16-row
    // (word, bits) combine — the fact relation itself is never shuffled
    val factExchanges = "Exchange hashpartitioning\\((?!word)".r.findAllIn(plan).size
    assert(factExchanges == 0,
      s"pruning must not shuffle the fact (only the word-keyed bloom build may):\n$plan")
  }

  test("a bloom over an empty dim prunes everything") {
    val empty = Seq.empty[Long].toDF("dk")
    assert(RuntimeFilter.bloomPruned(fact, "k", empty, "dk").count() == 0)
  }

  test("NULL keys never produce a false negative for real matches") {
    // NULLs on either side are join-neutral (NULL = x is never true),
    // so whatever the bloom does with them, the composed result must
    // still equal the plain semi join
    val factN = fact.union(
      spark.sql("SELECT CAST(NULL AS BIGINT) AS k, CAST(99999 AS BIGINT) AS fid"))
    val dimN = dim.union(spark.sql("SELECT CAST(NULL AS BIGINT) AS dk"))
    val exact = factN.join(dimN, $"k" === $"dk", "left_semi")
    val composed = RuntimeFilter.bloomPruned(factN, "k", dimN, "dk")
      .join(dimN, $"k" === $"dk", "left_semi")
    assert(composed.except(exact).count() == 0 &&
      exact.except(composed).count() == 0)
  }

  test("parameter guards") {
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomBits(dim, "dk", nBits = 100))
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomBits(dim, "dk", nBits = 0))
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomBits(dim, "dk", nHashes = 0))
  }
}
