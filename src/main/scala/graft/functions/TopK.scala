package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[TopKAgg]]: the ordering value and a unique tiebreaker
  * id (G4 — top-k must be a deterministic function of the data).
  */
case class TopKIn(value: Double, id: Long)

/** Bounded per-group top-k as a typed `Aggregator` — the scale
  * alternative to the `row_number() OVER (PARTITION BY …)` form.
  *
  * The window form must shuffle and sort EVERY row of every group to
  * rank them; this aggregator keeps at most k rows of state per group
  * and, because `Aggregator` participates in two-phase aggregation,
  * the map side already cuts each partition's contribution to ≤ k rows
  * per group before the shuffle. For a hot group with 10⁹ rows across
  * 1000 partitions, the shuffle carries 1000·k rows instead of 10⁹ —
  * the same partial/final shape as a native `max`.
  *
  * Total order: value DESC, id ASC (ties broken by the unique id), so
  * the result is reproducible across partitionings and retries.
  * `reduce` fast-path: a row that cannot displace the current k-th
  * element is dropped without re-sorting (the common case once the
  * buffer saturates).
  */
object TopK {
  /** Merge new items into a bounded top-k buffer under the (value DESC,
    * id ASC) total order — the one kernel the batch Aggregator and the
    * streaming StatefulProcessor both ride.
    */
  def merge(buf: Seq[(Double, Long)], items: IterableOnce[(Double, Long)],
      k: Int): Seq[(Double, Long)] =
    (buf ++ items).sortBy { case (v, id) => (-v, id) }.take(k)
}

class TopKAgg(k: Int)
    extends Aggregator[TopKIn, Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def cut(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    TopK.merge(Nil, s, k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: TopKIn): Seq[(Double, Long)] =
    if (b.size == k) {
      val (lv, lid) = b.last
      if (a.value < lv || (a.value == lv && a.id > lid)) b
      else cut(b :+ ((a.value, a.id)))
    } else cut(b :+ ((a.value, a.id)))

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    cut(x ++ y)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
