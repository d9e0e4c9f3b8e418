package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One candidate for the bounded per-key sample: the row's seeded
  * shuffle hash and its id.
  */
final case class HashedId(h: Long, id: Long)

/** Bounded k-smallest-by-(hash, id) aggregate — the deterministic
  * equivalent of per-key reservoir sampling. Keeping the k smallest
  * seeded hashes per key IS a uniform k-sample of the key's rows
  * (every row's rank under an independent hash is exchangeable), but
  * unlike a reservoir it is deterministic for a fixed seed and
  * independent of partitioning or arrival order: the retained set is
  * a pure function of the (hash, id) total order, so partial merges
  * commute.
  *
  * Map-side partials hold at most k rows, so a hot key ships
  * (mappers × k) rows through the exchange instead of its full row
  * set — the skew-safe alternative to the row_number window, which
  * would drag EVERY row of the hot key into one task
  * ([[TopKAggregator]]'s shape, ordered ascending and keyed by the
  * seeded hash).
  */
class KSmallestAggregator(k: Int)
    extends Aggregator[HashedId, Array[HashedId], Array[HashedId]] {
  require(k > 0, s"sample size must be positive, got $k")

  private val ord: Ordering[HashedId] = Ordering.by(s => (s.h, s.id))

  override def zero: Array[HashedId] = Array.empty

  private def bounded(arr: Array[HashedId]): Array[HashedId] = {
    val sorted = arr.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def reduce(buf: Array[HashedId], s: HashedId): Array[HashedId] =
    bounded(buf :+ s)

  override def merge(a: Array[HashedId], b: Array[HashedId]): Array[HashedId] =
    bounded(a ++ b)

  override def finish(buf: Array[HashedId]): Array[HashedId] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Array[HashedId]] =
    ExpressionEncoder[Array[HashedId]]()
  override def outputEncoder: Encoder[Array[HashedId]] =
    ExpressionEncoder[Array[HashedId]]()
}
