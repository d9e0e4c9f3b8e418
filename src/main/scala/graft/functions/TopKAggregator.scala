package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for the top-k aggregate. */
final case class Scored(id: Long, score: Double)

/** Typed bounded top-k aggregate (Aggregator[IN, BUF, OUT]) — the
  * custom-UDAF slot SURVEY §2.7 reserves for similarity top-k.
  *
  * The buffer is a bounded array ordered by (score desc, id asc); that
  * total order makes the retained set independent of partial-merge
  * order, so the aggregate is deterministic under any partitioning.
  * Map-side partials keep only k rows, so the shuffle carries
  * (partitions × k) rows — a global ORDER BY ... LIMIT k without a
  * global sort (the typed analogue of TakeOrderedAndProject, usable
  * inside groupBy/agg where that operator can't reach).
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Array[Scored], Array[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by(s => (-s.score, s.id))

  override def zero: Array[Scored] = Array.empty

  private def bounded(arr: Array[Scored]): Array[Scored] = {
    val sorted = arr.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def reduce(buf: Array[Scored], s: Scored): Array[Scored] =
    bounded(buf :+ s)

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] =
    bounded(a ++ b)

  override def finish(buf: Array[Scored]): Array[Scored] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
}
