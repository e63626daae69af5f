package graft.ops.graph

import graft.core.Metric
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BSP (bulk-synchronous) graph search — the 100 TB-scale path for Q1 when
  * the index does NOT fit executor memory (SURVEY.md §7.4 item 1). The
  * broadcast kernel (RoarGraphBuilder.searchBatch) is the fast path; this
  * variant keeps the graph and vectors as DataFrames (bucketed/partitioned
  * by node id at scale) and advances every query's beam one synchronized
  * hop per round:
  *
  *   round = explode frontiers → join adjacency (shuffle keyed by node) →
  *           join vectors (same key) → per-query merge into a bounded
  *           (dist,id)-sorted pool → next frontier = best unexpanded pool
  *           entries.
  *
  * The per-round dataflow is two keyed joins plus the cogroup merge — no
  * broadcast, no driver data, lineage cut per round via localCheckpoint.
  * The query VECTOR rides inside the per-query state row (|Q| × dim,
  * tiny beside the pool), so scoring happens inside the merge where the
  * query vector already is: candidate rows shuffle to the cogroup exactly
  * once, and the query-vector table is never re-joined after round 0
  * (re-joining it cost one extra keyed shuffle of the scored rows per
  * round). Policy difference vs
  * the single-node kernel: the visited set is the pool itself (entries
  * evicted past L may be revisited), which is the standard batch
  * approximation; the recall gate in BspBeamSearchSpec measures it.
  */
object BspBeamSearch {

  /** (dist, id, expanded) pool entry; pools stay sorted by (dist, id). */
  final case class Entry(dist: Double, id: Long, expanded: Boolean)

  /** Deterministic shared entry seeds — the `s` node ids with smallest
    * (xxhash64(id), id): uniform over the id universe regardless of
    * layout or partitioning. The BSP analogue of the broadcast kernel's
    * per-query random seeds (RoarGraphBuilder.seedsFor): seed DIVERSITY is
    * what rescues navigability on clustered corpora where a single global
    * entry point strands the beam in one region; a shared set keeps the
    * driver-side state a bounded id list (the same scalar class as the
    * entry point itself). */
  def pickSeeds(nodes: DataFrame, s: Int, idCol: String = "src"): Seq[Long] =
    nodes.select(col(idCol).cast("long").as("id"))
      .orderBy(xxhash64(col("id")), col("id")).limit(s)
      .collect().map(_.getLong(0)).toSeq

  /** @param adj      [src: long, nbrs: array<long>]
    * @param vectors  [id: long, vec: array<float>]
    * @param queries  [id: long, vec: array<float>]
    * @param ep       entry-point node id (external)
    * @param frontierWidth beams expand this many pool entries per round
    * @param excludeSelf  build-time self-search mode (Q4 semantics,
    *                     src/index_bipartite.cpp:1330): a query whose id
    *                     matches a candidate node never pools itself
    * @param extraSeeds   additional entry nodes seeded into every pool
    *                     (see [[pickSeeds]]); Nil preserves single-ep
    *                     behavior
    * @return [query_id, ids: array<long>, dists: array<double>] top-k
    */
  def search(adj: DataFrame, vectors: DataFrame, queries: DataFrame,
             k: Int, l: Int, ep: Long, metric: Metric,
             frontierWidth: Int = 4, maxRounds: Int = 64,
             excludeSelf: Boolean = false,
             extraSeeds: Seq[Long] = Nil,
             scope: CpScope = null): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    require(!metric.needNormalize,
      "BSP search expects pre-normalized inputs for cosine (normalize-then-IP)")

    val qvecs = queries.select(col("id").cast("long").as("qid"), col("vec").as("qvec"))

    def mergePool(pool: Array[Entry], cands: Iterator[(Long, Double)]): Array[Entry] = {
      val seen = new java.util.HashMap[Long, Entry]()
      pool.foreach(e => seen.put(e.id, e))
      cands.foreach { case (id, d) =>
        if (!seen.containsKey(id)) seen.put(id, Entry(d, id, expanded = false))
      }
      val arr = new Array[Entry](seen.size)
      val it = seen.values().iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      arr.sortBy(e => (e.dist, e.id)).take(l)
    }

    // ---- init: every pool = {ep} ∪ extraSeeds (seed vectors are a
    // bounded driver-side list, the same scalar class as epVec) ----
    val seedIds = (ep +: extraSeeds).distinct
    val seedVecs = vectors.filter(col("id").isin(seedIds: _*))
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().toMap
    require(seedVecs.contains(ep), s"entry point $ep not in vectors")
    val seeds: Array[(Long, Array[Float])] =
      seedIds.flatMap(id => seedVecs.get(id).map(v => (id, v))).toArray
    var state: Dataset[(Long, Array[Float], Array[Entry])] = qvecs
      .as[(Long, Array[Float])]
      .map { case (qid, qv) =>
        val pool = seeds.map { case (id, v) =>
          Entry(metric.dist(qv, v), id, expanded = false)
        }.sortBy(e => (e.dist, e.id)).take(l)
        (qid, qv, pool)
      }
    // Rolling checkpoint: round N's cut is the only live reader of round
    // N-1's blocks, so once N materializes (cut is eager) N-1 is freed —
    // heap holds ONE round of state, not O(rounds). The final round's
    // release goes to `scope` (the caller frees it after consuming the
    // returned DF) or is leaked session-lifetime when no scope is given.
    var releasePrev: () => Unit = () => ()
    locally {
      val (s0, rel0) = PlanUtil.cutReleasable(state)
      state = s0
      releasePrev = rel0
    }

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // frontier: best `frontierWidth` unexpanded entries per query
      val frontier = state.flatMap { case (qid, _, pool) =>
        pool.iterator.filter(!_.expanded).take(frontierWidth)
          .map(e => (qid, e.id))
      }.toDF("qid", "node")

      // candidate gathering: two keyed joins, one (query, nbr, nbr-vector)
      // row per candidate — scoring happens query-side in the cogroup,
      // where the state row already holds the query vector
      val cands = frontier
        .join(adj, col("node") === col("src"))
        .select(col("qid"), explode(col("nbrs")).as("nbr"))
        .filter(if (excludeSelf) col("nbr") =!= col("qid") else lit(true))
        .distinct()
        .join(vectors, col("nbr") === col("id")) // shuffle keyed by node id
        .select(col("qid"), col("nbr"), col("vec"))
        .as[(Long, Long, Array[Float])]

      // per-query merge: mark this round's frontier expanded, fold in cands.
      // Convergence is observed via an accumulator populated by the SAME job
      // that materializes the round (eager localCheckpoint) — no second
      // driver action per round (a `count()` here would double every
      // round's job count). Task retries can only over-count, and the
      // test is `== 0`, so the check stays exact.
      val fw = frontierWidth
      val unexpandedAcc = spark.sparkContext.longAccumulator(s"bsp_unexpanded_r$round")
      state = state
        .groupByKey(_._1)
        .cogroup(cands.groupByKey(_._1)) { (qid, st, cs) =>
          st.map { case (_, qv, pool) =>
            var budget = fw
            val marked = pool.map { e =>
              if (!e.expanded && budget > 0) { budget -= 1; e.copy(expanded = true) }
              else e
            }
            val merged = mergePool(marked,
              cs.map(c => (c._2, metric.dist(qv, c._3))))
            if (merged.exists(!_.expanded)) unexpandedAcc.add(1)
            (qid, qv, merged)
          }
        }
      locally { // materialize + cut lineage AND stats, then free round N-1
        val (sN, relN) = PlanUtil.cutReleasable(state)
        state = sN
        releasePrev()
        releasePrev = relN
      }

      done = unexpandedAcc.value == 0
      round += 1
    }
    if (scope ne null) scope.add(releasePrev)

    state.map { case (qid, _, pool) =>
      val top = (if (excludeSelf) pool.filter(_.id != qid) else pool).take(k)
      (qid, top.map(_.id), top.map(_.dist))
    }.toDF("query_id", "ids", "dists")
  }
}
