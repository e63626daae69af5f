package graft.plans

import graft.core.Metric
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Catalyst integration for the exact kNN join (SURVEY.md §7.3): a
  * first-class `KnnJoinNode` logical operator plus a planner `Strategy`
  * that LOWERS it into standard physical operators (broadcast-side scoring
  * + partial/final top-k aggregation). The node gives the optimizer a unit
  * whose output size (|Q|×k rows) it can reason about, while the lowering
  * keeps execution on battle-tested operators.
  *
  * A fully fused custom `KnnJoinExec` (hand-written doExecute over child
  * InternalRows) was built and reverted: interpreted
  * `Platform.getLong` reads over whole-stage-codegen-produced rows
  * SIGSEGV'd this environment's JVM (see NOTES.md). The Dataset-API
  * operator (ops.KnnJoin) remains the fused fast path; this planner node
  * is the declarative integration surface.
  */
final case class KnnJoinNode(left: LogicalPlan, right: LogicalPlan,
                             k: Int, metric: Metric,
                             // constructor member so tree copies PRESERVE
                             // expr ids (a body val would re-mint them on
                             // every copy and orphan upstream references)
                             override val output: Seq[Attribute] =
                               KnnJoinNode.freshOutput()) extends BinaryNode {
  // output attrs originate here, not from the children — without this the
  // analyzer treats them as unresolvable references to the inputs
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the operator consumes every child column (id + vec); declaring the
  // references stops column pruning from emptying the children
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): KnnJoinNode = copy(left = l, right = r)
  override def maxRows: Option[Long] = left.maxRows
}

object KnnJoinNode {
  val knnType: DataType = ArrayType(new StructType()
    .add("dist", DoubleType, nullable = false)
    .add("id", LongType, nullable = false), containsNull = false)
  private[plans] def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("knn", knnType, nullable = true)())
}

/** Lowers KnnJoinNode: score every (query, base) pair under the metric,
  * rank per query, keep k, re-nest as the knn array — then aliases the
  * result onto the node's original output attribute ids so upstream
  * references stay bound. */
object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnJoinNode(l, r, k, metric, out) =>
      val spark = SparkSession.active
      val q = Bridge.ofRows(spark, l)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val b = Bridge.ofRows(spark, r)
        .select(col("id").as("base_id"), col("vec").as("bvec"))
      val metricName = metric match {
        case Metric.L2 => "l2"; case Metric.InnerProduct => "ip"
        case Metric.Cosine => "cosine"
      }
      val scored = q.join(b)
        .withColumn("dist", graft.functions.DistanceExpressions
          .byMetric(metricName)(col("qvec"), col("bvec")))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("dist").asc, col("base_id").asc)))
        .filter(col("rank") <= k)
        .groupBy("query_id")
        .agg(sort_array(collect_list(struct(
          col("dist").as("dist"), col("base_id").as("id")))).as("knn"))
      val lowered = Bridge.analyzed(scored)
      // rebind the lowered plan's output onto the node's attribute ids
      val aliases = lowered.output.zip(out).map { case (a, o) =>
        Alias(a, o.name)(exprId = o.exprId)
      }
      planLater(Project(aliases, lowered)) :: Nil
    case _ => Nil
  }
}

/** Planner-integrated kNN join over two (id: long, vec: array<float>)
  * inputs; registers the strategy on the session (idempotent). */
object PlannedKnnJoin {
  def apply(queries: DataFrame, base: DataFrame, k: Int,
            metric: Metric): DataFrame = {
    val spark = queries.sparkSession
    ensureStrategy(spark)
    def shaped(df: DataFrame) =
      Bridge.analyzed(df.select(col("id").cast("long"), col("vec")))
    Bridge.ofRows(spark, KnnJoinNode(shaped(queries), shaped(base), k, metric))
  }

  def ensureStrategy(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = classic.experimental.extraStrategies
    if (!cur.contains(KnnJoinStrategy))
      classic.experimental.extraStrategies = cur :+ KnnJoinStrategy
  }
}
