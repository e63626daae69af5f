package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of an array<double> column as a partial/final
  * aggregate: each partition folds its rows into one running (sum, count)
  * pair, so the shuffle carries `numPartitions` array rows per group instead
  * of `rows × dim` exploded scalars — the scale shape for mean-pooling
  * embedding columns (SURVEY.md §2.3 A5; reference mean-pool
  * prepare_for_clip_webvid.py:93-101). Arithmetic is double throughout,
  * matching the engine-wide float64 convention. */
final class VecMeanAggregator
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (sum.isEmpty) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < s.length) { s(i) = v(i); i += 1 }
      (s, n + 1)
    } else {
      require(sum.length == v.length,
        s"ragged vectors in mean-pool: ${sum.length} != ${v.length}")
      var i = 0
      while (i < sum.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      require(a._1.length == b._1.length,
        s"ragged vectors in mean-pool merge: ${a._1.length} != ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.empty
    else {
      val out = new Array[Double](r._1.length)
      var i = 0
      while (i < out.length) { out(i) = r._1(i) / r._2; i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VecMeanAggregator {
  /** DataFrame-level aggregate column over an array<double> input. */
  def meanVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VecMeanAggregator,
      ExpressionEncoder[Seq[Double]]())
}
