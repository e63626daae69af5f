package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-level polynomial hash — the hot inner expression of the
  * whole near-dup/text family (shingle hashing, simhash token hashes,
  * n-gram Jaccard): `acc = (acc * 31 + codePoint) % 1000000007` over the
  * string's code points.
  *
  * Semantically identical to the higher-order-function chain
  * `aggregate(transform(split(s, ""), c -> ascii(c)), 0L,
  * (acc, x) -> (acc*31 + x) % M)` (split("") steps code points; ascii =
  * first code point; empty string hashes to 0) — but as ONE codegen'd
  * loop: the HOF form allocates a per-character string array plus a
  * lambda frame per element for every row, which dominated the dedup
  * pipeline's profile. Constants live in [[graft.ops.NearDup]] and are
  * mirrored into the DuckDB oracle SQL, which is unchanged by this
  * swap-in (values are bit-identical).
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_charhash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CharPolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharPolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPolyHash {
  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    val mod = graft.ops.NearDup.HashMod
    val base = graft.ops.NearDup.CharBase
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  def column(c: Column): Column = Bridge.column(CharPolyHash(Bridge.expression(c)))
}
