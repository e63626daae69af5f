package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Codegen'd dense matrix-vector rotation `y_i = (sum_j M_ij * x_j) *
  * scale` over a float-array column — the hot kernel of the OPQ-style
  * Hadamard rotation ([[graft.ops.Quantize.opqRotate]]).
  *
  * The HOF formulation (`transform(sequence, i => aggregate(zip_with(
  * element_at(matLit, i+1), vec, ...)))`) is CodegenFallback in Spark:
  * every row interprets d lambda trees and allocates d intermediate
  * zipped arrays, which at the reference's 200-d regime (padded to 256 —
  * prepare_data.sh:22-28) costs ~65k interpreted ops/row and dominated
  * the ann_pq200_codes chain (~10 s of its ~20 s at sf0.1). This
  * expression is ONE fused nested loop inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the HOF form: per output dim, a
  * left-to-right double fold of `M_ij * (double) x_j` starting at 0.0,
  * then one multiply by `scale`, then a cast to float — so DuckDB oracle
  * hashes are unchanged when swapping implementations.
  *
  * The matrix rides along as one flattened row-major Array[Double]
  * reference object per plan (512 KiB at 256-d) — NOT a Catalyst literal:
  * a 65536-element nested array literal inflates the serialized task
  * binary and is re-walked per element_at. */
case class MatVecRotate(child: Expression, mat: IndexedSeq[Double],
                        dim: Int, scale: Double)
    extends UnaryExpression {
  override def prettyName: String = "graft_mat_rotate"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString(10)}")
  }

  @transient private lazy val matArr: Array[Double] = mat.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    // An UnsafeArrayData shorter than `dim` would otherwise silently read
    // out-of-bounds buffer bytes and produce garbage floats.
    if (x.numElements() < dim)
      throw new IllegalArgumentException(
        s"$prettyName: input array has ${x.numElements()} elements, " +
          s"expected >= $dim")
    val m = matArr
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) {
        s += m(off + j) * x.getFloat(j).toDouble
        j += 1
      }
      out(i) = (s * scale).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("rotMat", matArr, "double[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |if ($x.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_mat_rotate: input array has " + $x.numElements() +
         |    " elements, expected >= $dim");
         |}
         |float[] $out = new float[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $s = 0.0;
         |  int $off = $i * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $s += $m[$off + $j] * ((double) $x.getFloat($j));
         |  }
         |  $out[$i] = (float) ($s * $scale);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecRotate {
  /** `rotate(vec, M, scale)` as a Column, M row-major dim×dim. */
  def rotate(vec: Column, mat: IndexedSeq[Double], dim: Int,
             scale: Double): Column =
    Bridge.column(MatVecRotate(Bridge.expression(vec), mat, dim, scale))
}
