package graft

import graft.functions.{CharPolyHash, CosineDistance, L2SqDistance, NegIpDistance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native distance expressions: `graft_l2sq`,
  * `graft_negip`, `graft_cosine` become callable from `spark.sql(...)` /
  * `expr(...)`.
  *
  * Two registration paths:
  *   - [[GraftExtensions]] — the canonical plugin API: start the session
  *     with `spark.sql.extensions=graft.GraftExtensions`;
  *   - [[GraftFunctions.register]] — imperative, for sessions that already
  *     exist (the driver's own session, notebooks). Idempotent.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[L2SqDistance].getName, null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "graft_l2sq(a, b) - squared L2 distance between two float arrays"),
      (es: Seq[Expression]) => L2SqDistance(es(0), es(1))),
    (FunctionIdentifier("graft_negip"),
      info("graft_negip", "graft_negip(a, b) - negated inner product (smaller = closer)"),
      (es: Seq[Expression]) => NegIpDistance(es(0), es(1))),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - negated cosine similarity"),
      (es: Seq[Expression]) => CosineDistance(es(0), es(1))),
    (FunctionIdentifier("graft_charhash"),
      info("graft_charhash", "graft_charhash(s) - char-level polynomial rolling hash (the near-dup family's shingle/token hash)"),
      (es: Seq[Expression]) => CharPolyHash(es(0))),
  )

  /** Register into a live session (createOrReplace — idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (id, _, builder) =>
      registry.createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
