package graft.functions

import graft.core.Neighbor
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a first-class Spark aggregate (SURVEY.md §2.8): the
  * partial/final aggregation mirror of the reference's bounded
  * NeighborPriorityQueue (include/efanna2e/neighbor.h:138-223) — partial
  * top-k per partition, top-k-of-top-ks at merge, so at most
  * numPartitions×k rows reach the final reduce regardless of input size.
  * Ties break by ascending id (neighbor.h:29-33). Usable as a typed
  * `Dataset` aggregate or registered for DataFrame/SQL via
  * `functions.udaf`. */
final class TopKAggregator(k: Int)
    extends Aggregator[Neighbor, Array[Neighbor], Array[Neighbor]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Array[Neighbor] = Array.empty

  /** Buffers stay sorted ascending (dist, id) and bounded by k. */
  private def insertSorted(buf: Array[Neighbor], n: Neighbor): Array[Neighbor] = {
    if (buf.length == k && Neighbor.ordering.lteq(buf(k - 1), n)) buf
    else {
      val out = new Array[Neighbor](math.min(buf.length + 1, k))
      var i = 0
      // position of the new element
      while (i < buf.length && Neighbor.ordering.lt(buf(i), n)) i += 1
      System.arraycopy(buf, 0, out, 0, math.min(i, out.length))
      if (i < out.length) {
        out(i) = n
        var j = i + 1
        while (j < out.length) { out(j) = buf(j - 1); j += 1 }
      }
      out
    }
  }

  override def reduce(buf: Array[Neighbor], n: Neighbor): Array[Neighbor] =
    insertSorted(buf, n)

  override def merge(a: Array[Neighbor], b: Array[Neighbor]): Array[Neighbor] = {
    // merge two sorted bounded arrays — O(k)
    val out = new Array[Neighbor](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && Neighbor.ordering.lteq(a(i), b(j)))) {
        out(o) = a(i); i += 1
      } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(r: Array[Neighbor]): Array[Neighbor] = r
  override def bufferEncoder: Encoder[Array[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Neighbor]]()
  override def outputEncoder: Encoder[Array[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Neighbor]]()
}

object TopKAggregator {
  def apply(k: Int): TopKAggregator = new TopKAggregator(k)

  /** DataFrame-level aggregate column over struct(dist, id) input. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.product[Neighbor])
}
