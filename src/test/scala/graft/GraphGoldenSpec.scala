package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden pins for the rows-only graph queries (VERDICT r3 task 5): beam
  * traversal is not SQL-expressible, but it IS deterministic — so the
  * sf0.01 search RESULT IDS are hashed and compared against committed
  * values. A regression in traversal order, pruning, or merge policy now
  * fails a spec even though no DuckDB oracle exists for these paths.
  * (Recall/reachability/cap gates live in RoarGraphSpec /
  * DistRoarGraphSpec; this spec pins the exact output.)
  *
  * If an INTENTIONAL algorithm change shifts these hashes, re-derive with:
  * {{{ sbt "testOnly graft.GraphGoldenSpec" }}} — the failure message
  * prints the new hash.
  */
class GraphGoldenSpec extends SparkSpec {

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical (query_id -> ids) hash: rows sorted by query id. */
  private def idsHash(df: DataFrame): String = {
    val rows = df.select(col("query_id").cast("long"), col("ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
      .map { case (q, ids) => s"$q:${ids.mkString(",")}" }
    sha256(rows.mkString("\n"))
  }

  test("golden: roargraph in-memory search ids at sf0.01") {
    val h = idsHash(graft.queries.QueriesGraph.roargraphSearchResults(spark, sf001)
      .select(col("query_id"), col("ids")))
    assert(h == "bb71654727ecd4c44e99f8f0e07791002147d3cf066f09cd51a23796862c3685", s"roargraph search ids hash changed: $h")
  }

  test("golden: roargraph distributed-build search ids at sf0.01") {
    val h = idsHash(graft.queries.QueriesGraph.roargraphDistSearchIds(spark, sf001))
    assert(h == "24037a605b7666b02f4875556202d651a68e2ffa89e3f145b0c19927e6ef12c1", s"dist search ids hash changed: $h")
  }

  test("golden: bipartite 2-hop search ids at sf0.01") {
    val h = idsHash(graft.queries.QueriesGraph.bipartiteSearchIds(spark, sf001))
    assert(h == "1d7d2dd18f050d5884d3a390020377b9befb19f23f06a99ee42d673518754587", s"bipartite search ids hash changed: $h")
  }

  test("golden: in-memory build adjacency at sf0.01") {
    import graft.core.{BuildParams, Metric, Tables}
    val emb = Tables.vectors(spark, sf001)
    val idx = graft.build.RoarGraphBuilder.build(
      emb.filter(col("id") >= 20), emb.filter(col("id") < 20),
      BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2))
    val rows = idx.ids.indices
      .map(i => s"${idx.ids(i)}:${idx.adj(i).map(idx.ids(_)).mkString(",")}")
      .sorted
    val h = sha256(rows.mkString("\n"))
    assert(h == "d3bd16324132680a42022a023d183aa414d05fef56aa62dfe15db94979504097", s"build adjacency hash changed: $h")
  }
}
