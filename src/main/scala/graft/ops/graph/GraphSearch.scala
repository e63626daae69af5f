package graft.ops.graph

import graft.build.{GraphIndex, RoarGraphBuilder}
import graft.core.Metric
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Assemble a searchable [[GraphIndex]] from DataFrame form: any adjacency
  * table [src, nbrs] over a vector table (id, vec) — the glue that lets the
  * one beam-search kernel (Q1/Q2/Q4) run over RoarGraph, bipartite 2-hop
  * projections, or any external graph. Entry point = centroid argmin
  * (G22), matching the reference. */
object GraphSearch {

  def indexFromDF(adj: DataFrame, vectors: DataFrame, metric: Metric): GraphIndex = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val vecRows = vectors.select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ids = vecRows.map(_._1)
    val dense = ids.zipWithIndex.toMap
    val vs = VecStore(vecRows.map(_._2), metric)
    val adjArr = Array.fill(ids.length)(Array.empty[Int])
    adj.select(col("src").cast("long"), col("nbrs"))
      .as[(Long, Array[Long])].collect()
      .foreach { case (src, nbrs) =>
        dense.get(src).foreach { d =>
          adjArr(d) = nbrs.flatMap(dense.get).map(_.toInt)
        }
      }
    GraphIndex(adjArr, RoarGraphBuilder.entryPoint(vs), ids, vs)
  }

  /** Load a distributed-build product ([[graft.build.DistIndex]]) into the
    * broadcast-search form, keeping the build's entry point. This is the
    * search-side load step (analogous to LoadProjectionGraph,
    * src/index_bipartite.cpp:2097-2117) — legitimate only when the index
    * fits executor memory; past that, search the DistIndex directly with
    * [[BspBeamSearch]]. */
  def indexFromDist(di: graft.build.DistIndex, vectors: DataFrame): GraphIndex = {
    val base = indexFromDF(di.adj, vectors, di.metric)
    val dense = base.ids.zipWithIndex.toMap
    base.copy(ep = dense(di.ep))
  }
}
