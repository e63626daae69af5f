package graft.functions

import graft.core.NeighborVec
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k of (id, dist, vec) rows — [[TopKAggregator]] with the
  * candidate's vector carried along, for the distributed graph build where
  * the downstream occlusion prune needs candidate↔candidate distances.
  * Partial/final: at most `numPartitions × k` vector rows per group reach
  * the exchange, and — unlike a plain `collect_list` — a node with a huge
  * reverse fan-in (hub) cannot blow up its group buffer: the per-partition
  * buffer is capped at k throughout. Ties break by ascending id
  * (include/efanna2e/neighbor.h:29-33). */
final class TopKVecAggregator(k: Int)
    extends Aggregator[NeighborVec, Array[NeighborVec], Array[NeighborVec]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Array[NeighborVec] = Array.empty

  private def insertSorted(buf: Array[NeighborVec], n: NeighborVec): Array[NeighborVec] = {
    if (buf.length == k && NeighborVec.ordering.lteq(buf(k - 1), n)) buf
    else {
      val out = new Array[NeighborVec](math.min(buf.length + 1, k))
      var i = 0
      while (i < buf.length && NeighborVec.ordering.lt(buf(i), n)) i += 1
      System.arraycopy(buf, 0, out, 0, math.min(i, out.length))
      if (i < out.length) {
        out(i) = n
        var j = i + 1
        while (j < out.length) { out(j) = buf(j - 1); j += 1 }
      }
      out
    }
  }

  override def reduce(buf: Array[NeighborVec], n: NeighborVec): Array[NeighborVec] =
    insertSorted(buf, n)

  override def merge(a: Array[NeighborVec], b: Array[NeighborVec]): Array[NeighborVec] = {
    val out = new Array[NeighborVec](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && NeighborVec.ordering.lteq(a(i), b(j)))) {
        out(o) = a(i); i += 1
      } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(r: Array[NeighborVec]): Array[NeighborVec] = r
  override def bufferEncoder: Encoder[Array[NeighborVec]] =
    ExpressionEncoder[Array[NeighborVec]]()
  override def outputEncoder: Encoder[Array[NeighborVec]] =
    ExpressionEncoder[Array[NeighborVec]]()
}

object TopKVecAggregator {
  def apply(k: Int): TopKVecAggregator = new TopKVecAggregator(k)

  /** DataFrame-level aggregate over (id: long, dist: double,
    * vec: array<float>) columns. */
  def topKVec(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKVecAggregator(k),
      Encoders.product[NeighborVec])
}
