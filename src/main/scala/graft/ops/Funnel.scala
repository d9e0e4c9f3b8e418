package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed funnel analysis — the classic event-analytics workload
  * (view → click → purchase): for each user, take the FIRST step-1
  * event, then the first step-2 event after it within the conversion
  * window, then the first step-3 event after THAT, and report how far
  * each user got. Greedy-first-match is the semantics every funnel
  * product ships (a conversion window per hop), and it is
  * deterministic — no exists-quantified search over event
  * combinations.
  *
  * Scale: each step materializes only a (user, ts) relation — one
  * narrow aggregate over the events of that step's type (filter
  * pushed to the scan), co-partitioned equi-joins on the user key
  * between steps. Events are never self-joined and never collected;
  * total shuffle is steps × (narrow per-user rows). The step count is
  * a query constant, so the plan depth is fixed — at 100 TB this is
  * k filtered scans (or one scan reused k times by the same
  * partition layout), not an event-to-event pair space.
  */
object Funnel {

  /** Per-user funnel progress: (userCol, reached) where reached ∈
    * 1..steps.size counts completed steps (users with no step-1
    * event have no row). `windowSec` is the per-hop conversion
    * window in seconds; hop timestamps compare strictly (the next
    * step must be strictly later).
    */
  def windowed(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, steps: Seq[String],
               windowSec: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val sec = unix_timestamp(col(tsCol))
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(sec).as("t1"))
    var k = 1
    steps.tail.foreach { step =>
      val prevT = s"t$k"
      val nextT = s"t${k + 1}"
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), sec.as("__s"))
        .join(cur.select(col(userCol), col(prevT)), Seq(userCol))
        .filter(col("__s") > col(prevT) &&
          col("__s") <= col(prevT) + windowSec)
        .groupBy(col(userCol)).agg(min(col("__s")).as(nextT))
      cur = cur.join(nxt, Seq(userCol), "left")
      k += 1
    }
    // build ascending so the HIGHEST completed step wins the when
    // chain (t3 is checked outermost after folding 2, then 3)
    val reached = (2 to steps.size).foldLeft(lit(1)) {
      case (acc, n) => when(col(s"t$n").isNotNull, n).otherwise(acc)
    }
    cur.select(col(userCol), reached.cast("int").as("reached"))
  }
}
