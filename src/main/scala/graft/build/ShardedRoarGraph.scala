package graft.build

import graft.core.{BuildParams, SearchParams}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded RoarGraph — the path past broadcast-sized indexes (SCALE.md):
  * partition the base collection into `numShards` disjoint shards, build an
  * independent RoarGraph per shard, search every shard, merge per-query
  * top-k. The standard disk-scale ANN layout (one index per segment, a
  * top-k-of-top-ks reduce): recall can only improve over a single index of
  * the same parameters (each shard's exact neighbors compete in a smaller
  * pool), at the cost of `numShards`× search fan-out.
  *
  * Sharding is deterministic by id hash so builds are reproducible. Each
  * per-shard build/search only ever broadcasts one shard's index — peak
  * executor memory is O(|base| / numShards), independent of total corpus
  * size.
  */
object ShardedRoarGraph {

  final case class Sharded(shards: Seq[GraphIndex], numShards: Int)

  private def shardCol(numShards: Int) = pmod(hash(col("id")), lit(numShards))

  def build(base: DataFrame, queries: DataFrame, params: BuildParams,
            numShards: Int, maxConcurrent: Int = 2): Sharded = {
    require(numShards > 0 && maxConcurrent > 0)
    val withShard = base.withColumn("_shard", shardCol(numShards))
    // shard builds are independent — run them as concurrent jobs on the
    // shared SparkContext (the scheduler interleaves their stages across
    // executors). Concurrency is CAPPED (default 2): each in-flight build
    // holds its shard's vectors on the driver and broadcast to executors,
    // so unbounded concurrency would restore the O(|base|) peak footprint
    // sharding exists to avoid — the bound is O(maxConcurrent × |base| /
    // numShards) with wall ≈ sum/maxConcurrent. Determinism is untouched
    // (shard membership is id-hash, the per-shard build is deterministic,
    // and results are ordered by shard id).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(numShards, maxConcurrent))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val shards =
      try Await.result(Future.sequence((0 until numShards).map { s =>
        Future(RoarGraphBuilder.build(
          withShard.filter(col("_shard") === s).drop("_shard"),
          queries, params))
      }), Duration.Inf)
      finally pool.shutdown()
    Sharded(shards, numShards)
  }

  /** Search all shards, merge per-query: union of per-shard results →
    * explode → per-query (dist, id) sort → top-k. The merge shuffles only
    * `numShards × k` rows per query. */
  def searchBatch(index: Sharded, queries: DataFrame,
                  params: SearchParams): DataFrame = {
    val perShard = index.shards.map { sh =>
      RoarGraphBuilder.searchBatch(sh, queries, params)
        .select(col("query_id"),
          arrays_zip(col("dists"), col("ids")).as("hits"))
    }
    perShard.reduce(_ unionByName _)
      .select(col("query_id"), explode(col("hits")).as("h"))
      .select(col("query_id"), col("h.dists").as("dist"), col("h.ids").as("id"))
      .groupBy("query_id")
      .agg(slice(sort_array(collect_list(struct(col("dist"), col("id")))), 1,
        params.k).as("top"))
      .select(col("query_id"),
        transform(col("top"), _("id")).as("ids"),
        transform(col("top"), _("dist")).as("dists"))
  }
}
