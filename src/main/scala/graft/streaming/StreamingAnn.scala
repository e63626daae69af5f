package graft.streaming

import graft.build.DistRoarGraphBuilder
import graft.core.{BuildParams, Metric, SearchParams}
import graft.ops.KnnJoin
import graft.ops.graph.{GraphIO, GraphSearch}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN ingestion — continuously arriving embeddings become
  * searchable immediately, with the index refreshed periodically (the
  * standard freshness pattern for vector stores: INDEX + TAIL).
  *
  *   - ingest: every micro-batch appends (id, vec, batch_id) to a vector
  *     table; every `rebuildEvery` batches the graph index is rebuilt over
  *     everything ingested so far (the distributed builder — no driver
  *     materialization — so rebuild capacity matches corpus growth) and
  *     published with the batch watermark it covers.
  *   - search: beam search over the published index UNION a brute-force
  *     kNN over the un-indexed tail (batches after the watermark), merged
  *     per query by (dist, id) — new vectors are findable the moment their
  *     batch commits, at exact-kNN quality, while the bulk rides the
  *     index.
  *
  * At scale the tail is bounded by `rebuildEvery × batch size`, so the
  * brute-force term stays a small constant beside the indexed corpus.
  * Rebuilds happen inside foreachBatch — Structured Streaming's unit of
  * exactly-once batch side effects (a production deployment would publish
  * the index dir via atomic rename; the data layout is already
  * snapshot-shaped).
  */
object StreamingAnn {

  /** Start ingesting a stream of (id, vec) rows into `dir`. */
  def ingest(vectors: DataFrame, dir: String, params: BuildParams,
             rebuildEvery: Int = 4): StreamingQuery = {
    val spark = vectors.sparkSession
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.select(col("id").cast("long"), col("vec"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$dir/vectors")
        if (batchId % rebuildEvery == (rebuildEvery - 1))
          rebuild(spark, dir, params, upToBatch = batchId)
        ()
      }
      .start()
  }

  /** Rebuild the index over every batch ≤ `upToBatch` and publish it with
    * its coverage watermark. Sampled queries = the vectors themselves
    * (self-training, the |queries| ≈ |base| regime the bipartite path
    * uses; a deployment with a real query log passes it here instead). */
  def rebuild(spark: SparkSession, dir: String, params: BuildParams,
              upToBatch: Long): Unit = {
    val vecs = spark.read.parquet(s"$dir/vectors")
      .filter(col("batch_id") <= upToBatch)
      .select(col("id"), col("vec"))
    val di = DistRoarGraphBuilder.build(vecs, vecs, params)
    implicit val s: SparkSession = spark
    GraphIO.saveDist(di, s"$dir/index")
    import spark.implicits._
    Seq(upToBatch).toDF("indexed_up_to")
      .write.mode("overwrite").parquet(s"$dir/index_watermark")
  }

  /** Search the ingested corpus: indexed portion via beam search, the
    * un-indexed tail via exact kNN, merged per query by (dist, id).
    * Output [query_id, ids, dists] with ids/dists of length ≤ k. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             params: SearchParams): DataFrame = {
    implicit val s: SparkSession = spark
    val vecs = spark.read.parquet(s"$dir/vectors")
    // only "no index published yet" (path missing before the first
    // rebuild) maps to None; real read failures must surface, not silently
    // degrade every search to a full brute-force scan
    val watermark: Option[Long] =
      try Some(spark.read.parquet(s"$dir/index_watermark")
        .head().getLong(0))
      catch { case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("PATH_NOT_FOUND") ||
           e.getMessage.contains("Path does not exist") => None }

    val indexed: Option[DataFrame] = watermark.map { w =>
      val iv = vecs.filter(col("batch_id") <= w).select("id", "vec")
      val idx = GraphSearch.indexFromDist(GraphIO.loadDist(s"$dir/index"), iv)
      graft.build.RoarGraphBuilder.searchBatch(idx, queries, params)
        .select(col("query_id"),
          arrays_zip(col("dists"), col("ids")).as("hits"))
    }
    val tail = vecs.filter(col("batch_id") > watermark.getOrElse(-1L))
      .select("id", "vec")
    val tailHits: Option[DataFrame] =
      if (tail.isEmpty) None
      else Some(KnnJoin(queries, tail, params.k, params.metric)
        .select(col("query_id"),
          transform(col("knn"),
            h => struct(h("dist").as("dists"), h("id").as("ids"))).as("hits")))

    val parts = indexed.toSeq ++ tailHits.toSeq
    require(parts.nonEmpty, s"nothing ingested under $dir")
    parts.reduce(_ unionByName _)
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
