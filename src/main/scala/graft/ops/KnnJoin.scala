package graft.ops

import graft.core.Metric
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Exact kNN join (SURVEY.md §2.3 A1): for every query vector, the k nearest
  * base vectors under a metric. The reference consumes this as a precomputed
  * file (src/index_bipartite.cpp:2622-2639 LoadLearnBaseKNN, built by external
  * DiskANN-era tooling); here it is a first-class distributed operator.
  *
  * Physical design (the Spark partial+final aggregation pattern):
  *   1. queries are tiled into broadcast-sized blocks (driver collects one
  *      block at a time — at 100 TB scale the base side is the big one and
  *      streams through executors exactly once per block);
  *   2. `mapPartitions` over the base: one bounded max-heap per query per
  *      partition (the analogue of the reference's NeighborPriorityQueue,
  *      include/efanna2e/neighbor.h:138-223) → partial top-k, so only
  *      numPartitions*k rows per query ever shuffle, never the cross product;
  *   3. `groupBy(query)` + flatten + sort_array + slice = final top-k, all
  *      codegen'd built-ins.
  *
  * Ties break by ascending id (reference: neighbor.h:29-33). Distances are
  * computed in float64 so results are reproducible and oracle-comparable.
  */
object KnnJoin {

  /** Bounded max-heap of (dist, id), keeping the k smallest; ties by id. */
  final class BoundedTopK(k: Int) {
    private val d = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0
    @inline private def less(i: Int, j: Int): Boolean =
      d(i) > d(j) || (d(i) == d(j) && ids(i) > ids(j)) // max-heap on (dist,id)
    private def swap(i: Int, j: Int): Unit = {
      val td = d(i); d(i) = d(j); d(j) = td
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }
    def push(dist: Double, id: Long): Unit = {
      if (n < k) {
        d(n) = dist; ids(n) = id; n += 1
        var i = n - 1
        while (i > 0 && less(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
      } else if (dist < d(0) || (dist == d(0) && id < ids(0))) {
        d(0) = dist; ids(0) = id
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < n && less(l, m)) m = l
          if (r < n && less(r, m)) m = r
          if (m == i) cont = false else { swap(i, m); i = m }
        }
      }
    }
    def result(): Array[(Double, Long)] = {
      val out = Array.tabulate(n)(i => (d(i), ids(i)))
      scala.util.Sorting.stableSort(out)
      out
    }
  }

  private[graft] def widen(v: Array[Float], normalize: Boolean): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
    if (normalize) {
      var s = 0.0; i = 0
      while (i < v.length) { s += out(i) * out(i); i += 1 }
      val n = math.sqrt(s)
      if (n != 0.0) { i = 0; while (i < v.length) { out(i) /= n; i += 1 } }
    }
    out
  }

  @inline private[graft] def distD(metric: Metric, a: Array[Double], b: Array[Double]): Double =
    metric match {
      case Metric.L2 =>
        var s = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }
        s
      case _ => // InnerProduct and Cosine (inputs pre-normalized for cosine)
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        -s
    }

  /** Shared lazy-block top-k drain (used by this join and
    * [[graft.ops.Quantize.adcTopK]]): stream query blocks through the
    * driver one at a time (`toLocalIterator` runs one job per partition
    * lazily — the driver never holds the whole query side), broadcast one
    * block, materialize its partial top-k eagerly (PlanUtil.cutDF:
    * reliable checkpoint when the session has a checkpoint dir, local
    * otherwise) so the block's broadcast can be destroyed before the next
    * block is drained — no accumulation of broadcasts or query bytes
    * across the job's lifetime.
    *
    * Blocks tile the QUERY set disjointly, so the per-query merge is
    * applied PER BLOCK and the block's per-(query, partition) partial
    * rows — the job's largest transient, partitions×k rows per query —
    * are released as soon as the block's merged top-k lands. What stays
    * pinned across blocks is only the final k rows per query (the result
    * itself); the shuffle volume is identical to one global merge (the
    * groupBy keys are disjoint across blocks). Pre-10M hardening: the
    * previous shape pinned EVERY block's partials until one global
    * groupBy at the end — partitions× the result size, all live at once.
    *
    * `partial(bc)` must return a [query_id: long,
    * partial: array<struct<_1: double, _2: long>>] DataFrame of per-block
    * per-partition partial top-k rows. The returned DataFrame is already
    * materialized (a union of per-block cuts). */
  private[graft] def blockedTopK[Q](spark: org.apache.spark.sql.SparkSession,
      qIt: Iterator[Q], blockRows: Int, k: Int, emptyMsg: String)(
      partial: org.apache.spark.broadcast.Broadcast[Array[Q]] => DataFrame)(
      implicit ct: scala.reflect.ClassTag[Q]): DataFrame = {
    require(qIt.hasNext, emptyMsg)
    val mergedBlocks = qIt.grouped(blockRows).map { blk =>
      val bc = spark.sparkContext.broadcast(blk.toArray)
      val (cutPartial, releasePartial) =
        graft.ops.graph.PlanUtil.cutDFReleasable(partial(bc))
      bc.destroy()
      val merged = graft.ops.graph.PlanUtil.cutDF(
        cutPartial.groupBy("query_id")
          .agg(slice(sort_array(flatten(collect_list(col("partial")))), 1, k)
            .as("knn0")))
      releasePartial() // merged is cut; this block's partials are dead
      merged
    }.toList
    mergedBlocks.reduce(_ union _)
      .select(col("query_id"),
        transform(col("knn0"),
          x => struct(x("_1").as("dist"), x("_2").as("id"))).as("knn"))
  }

  /** Exact kNN join. Inputs must expose (`id`: long, `vec`: array<float>).
    * Returns [query_id: long, knn: array<struct<dist: double, id: long>>],
    * `knn` sorted by (dist, id) ascending, length <= k.
    *
    * @param queryBlockRows max queries collected+broadcast per block; base
    *        side makes one pass per block (tune so a block is ~10s of MB).
    */
  def apply(queries: DataFrame, base: DataFrame, k: Int, metric: Metric,
            queryBlockRows: Int = 100000): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._

    val baseDs: Dataset[(Long, Array[Float])] =
      base.select(col("id").cast("long"), col("vec")).as[(Long, Array[Float])]
    import scala.jdk.CollectionConverters._
    val norm = metric.needNormalize
    val qIt = queries.select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])].toLocalIterator().asScala
      .map { case (id, v) => (id, widen(v, norm)) }

    blockedTopK(spark, qIt, queryBlockRows, k, "kNN join: empty query set") { bc =>
      baseDs.mapPartitions { it =>
        val qs = bc.value
        val heaps = Array.fill(qs.length)(new BoundedTopK(k))
        it.foreach { case (bid, bvec) =>
          val bv = widen(bvec, norm)
          var qi = 0
          while (qi < qs.length) {
            heaps(qi).push(distD(metric, qs(qi)._2, bv), bid)
            qi += 1
          }
        }
        Iterator.range(0, qs.length).flatMap { qi =>
          val r = heaps(qi).result()
          if (r.isEmpty) None else Some((qs(qi)._1, r))
        }
      }.toDF("query_id", "partial")
    }
  }

  /** Reference implementation via crossJoin + window — the oracle-shaped
    * plan (row_number over (partition by query order by dist, id) <= k).
    * O(|Q|*|B|) shuffle; used for tests and as the DuckDB-mirroring path. */
  def crossWindow(queries: DataFrame, base: DataFrame, k: Int, metric: Metric): DataFrame = {
    val metricName = metric match {
      case Metric.L2 => "l2"
      case Metric.InnerProduct => "ip"
      case Metric.Cosine => "cosine"
    }
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val b = base.select(col("id").as("base_id"), col("vec").as("bvec"))
    val scored = q.crossJoin(b)
      .withColumn("dist",
        VectorFunctions.distByMetric(metricName)(col("qvec"), col("bvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("base_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("base_id"), col("dist"))
  }

  /** Flatten [query_id, knn] to one row per neighbor with 1-based rank. */
  def explodeRanks(knn: DataFrame): DataFrame =
    knn.select(col("query_id"), posexplode(col("knn")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("n.id").as("base_id"), col("n.dist").as("dist"))
}
