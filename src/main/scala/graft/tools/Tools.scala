package graft.tools

import graft.build.RoarGraphBuilder
import graft.core.{BuildParams, Metric, SearchParams}
import graft.eval.Eval
import graft.ops.KnnJoin
import graft.ops.graph.GraphIO
import graft.sources.FbinCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drop-in workflow parity with the reference's CLI drivers: a user of
  * `test_build_roargraph` / `test_search_roargraph`
  * (tests/test_build_roargraph.cpp:22-140, test_search_roargraph.cpp:64-250)
  * runs the same two steps here — build an index from vector files, then
  * sweep beam widths and get the same CSV columns
  * (L_pq, QPS, avg cmps, mean latency, recall@k, avg hops; :231-236).
  * Inputs may be the reference's `.fbin` files or parquet. */
object Tools {

  private[tools] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[graft] def readVectors(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".fbin")) FbinCodec.readFbin(spark, path)
    else spark.read.parquet(path).select(col("id"), col("vec"))

  /** `--key value` pairs plus valueless boolean flags (`--searchOnly`):
    * a `--key` followed by another `--key` (or nothing) parses as
    * `"true"`. Strict pair-sliding would silently shift every key after
    * a bare flag onto the wrong value — measured: a soak sweep ran at
    * l=100 against the wrong layout because `--searchOnly --db x`
    * consumed `--db` as searchOnly's value. */
  def parseArgs(args: Array[String]): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      if (args(i).startsWith("--")) {
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          m += args(i).drop(2) -> args(i + 1); i += 2
        } else { m += args(i).drop(2) -> "true"; i += 1 }
      } else i += 1
    }
    m.result()
  }
}

/** Build a RoarGraph index: mirrors run_roargraph_test.sh's invocation.
  *
  * {{{
  * runMain graft.tools.BuildTool --base base.fbin --queries train.fbin \
  *   --out /path/index --metric ip --M_sq 100 --M_pjbp 35 --L_pjpq 500 \
  *   [--tier memory|distributed]
  * }}}
  *
  * `--tier distributed` builds with [[graft.build.DistRoarGraphBuilder]]
  * (no driver/broadcast materialization of vectors or adjacency — for
  * collections beyond broadcast size) and saves the DataFrame-form index.
  */
object BuildTool {
  def main(args: Array[String]): Unit = {
    val a = Tools.parseArgs(args)
    implicit val spark: SparkSession = Tools.session()
    val params = BuildParams(
      mSq = a.getOrElse("M_sq", "100").toInt,
      mPjbp = a.getOrElse("M_pjbp", "35").toInt,
      lPjpq = a.getOrElse("L_pjpq", "500").toInt,
      metric = Metric.fromString(a.getOrElse("metric", "ip")))
    val base = Tools.readVectors(spark, a("base"))
    val queries = Tools.readVectors(spark, a("queries"))
    val t0 = System.nanoTime()
    a.getOrElse("tier", "memory") match {
      case "distributed" =>
        val di = graft.build.DistRoarGraphBuilder.build(base, queries, params)
        GraphIO.saveDist(di, a("out"))
        val sec = (System.nanoTime() - t0) / 1e9
        val stats = di.adj.select(
          count("*"), avg(size(col("nbrs"))),
          max(size(col("nbrs"))), min(size(col("nbrs")))).collect().head
        println(f"build_sec=$sec%.3f n=${stats.getLong(0)} ep=${di.ep} " +
          f"avg_degree=${stats.getDouble(1)}%.2f " +
          f"max_degree=${stats.getInt(2)} min_degree=${stats.getInt(3)}")
      case _ =>
        val index = RoarGraphBuilder.build(base, queries, params)
        val sec = (System.nanoTime() - t0) / 1e9
        GraphIO.save(index, a("out"))
        val (avg, mx, mn) = index.degreeStats
        // the reference's build-time stats (src/index_bipartite.cpp:1156-1179)
        println(f"build_sec=$sec%.3f n=${index.n} ep=${index.ids(index.ep)} " +
          f"avg_degree=$avg%.2f max_degree=$mx min_degree=$mn")
    }
    spark.stop()
  }
}

/** Search a saved index over a beam-width sweep; reference CSV columns.
  *
  * {{{
  * runMain graft.tools.SearchTool --graph /path/index --queries q.fbin \
  *   --k 10 --L_pq 10,50,100 [--gt gt.parquet]
  * }}}
  * `--gt` (parquet [query_id, ids]) enables recall@k; without it the exact
  * kNN join computes ground truth from the index's own vectors.
  * A distributed-tier index (saved by `BuildTool --tier distributed`)
  * stores adjacency only — pass `--base <vectors>` to search it (loaded
  * through the broadcast kernel via GraphSearch.indexFromDist).
  */
object SearchTool {
  def main(args: Array[String]): Unit = {
    val a = Tools.parseArgs(args)
    implicit val spark: SparkSession = Tools.session()
    val index =
      if (spark.read.parquet(s"${a("graph")}/adjacency").columns.contains("vec"))
        GraphIO.load(a("graph"))
      else graft.ops.graph.GraphSearch.indexFromDist(
        GraphIO.loadDist(a("graph")),
        Tools.readVectors(spark, a("base")))
    val queries = Tools.readVectors(spark, a("queries"))
    val k = a.getOrElse("k", "10").toInt
    val sweep = a.getOrElse("L_pq", "10,50,100").split(",").map(_.trim.toInt)
    val gt: DataFrame = a.get("gt") match {
      case Some(p) => spark.read.parquet(p).select("query_id", "ids")
      case None =>
        import spark.implicits._
        val base = index.ids.indices.map(i => (index.ids(i), index.vs.row(i)))
          .toDF("id", "vec")
        KnnJoin(queries, base, k, index.vs.metric)
          .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    }
    val nq = queries.count()
    println("L_pq,QPS,avg_cmps,mean_latency_ms,recall,avg_hops")
    sweep.foreach { lPq =>
      val t0 = System.nanoTime()
      val res = RoarGraphBuilder.searchBatch(index, queries,
        SearchParams(k, lPq, index.vs.metric)).cache()
      res.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = Eval.recallAtK(res.select(col("query_id"), col("ids")), gt, k)
        .collect().head.getAs[Double]("recall_at_k")
      val ch = res.agg(avg("cmps"), avg("hops")).collect().head
      res.unpersist()
      println(f"$lPq,${nq / sec}%.1f,${ch.getDouble(0)}%.1f," +
        f"${sec * 1000 / nq}%.3f,$recall%.4f,${ch.getDouble(1)}%.1f")
    }
    spark.stop()
  }
}
