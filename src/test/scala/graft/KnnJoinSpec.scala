package graft

import graft.core.{Metric, Tables}
import graft.ops.KnnJoin
import org.apache.spark.sql.functions._

class KnnJoinSpec extends SparkSpec {

  private def roundTrip(metric: Metric): Unit = {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val fast = KnnJoin.explodeRanks(KnnJoin(q, b, 5, metric))
      .select("query_id", "rank", "base_id")
    val ref = KnnJoin.crossWindow(q, b, 5, metric)
      .select("query_id", "rank", "base_id")
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
      s"bruteForce != crossWindow for $metric")
  }

  test("bruteForce matches crossWindow reference plan (L2)") {
    roundTrip(Metric.L2)
  }
  test("bruteForce matches crossWindow reference plan (IP)") {
    roundTrip(Metric.InnerProduct)
  }
  test("bruteForce matches crossWindow reference plan (cosine)") {
    roundTrip(Metric.Cosine)
  }

  test("query blocking (tiled broadcast) gives identical results") {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val whole = KnnJoin(q, b, 5, Metric.L2, queryBlockRows = 100000)
    val tiled = KnnJoin(q, b, 5, Metric.L2, queryBlockRows = 3)
    val a = KnnJoin.explodeRanks(whole).select("query_id", "rank", "base_id")
    val c = KnnJoin.explodeRanks(tiled).select("query_id", "rank", "base_id")
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("knn results are sorted by (dist, id) and bounded by k") {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 5)
    val b = emb.filter(col("id") >= 5)
    val rows = KnnJoin(q, b, 7, Metric.L2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val knn = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("knn")
      assert(knn.length == 7)
      val pairs = knn.map(n => (n.getAs[Double]("dist"), n.getAs[Long]("id")))
      assert(pairs == pairs.sortBy(identity))
    }
  }

  test("ivfApprox at nprobe == nlist is row-identical to the exact join") {
    // full probe scores every (query, base) pair through the same widen /
    // distD / BoundedTopK kernel — the result must be the exact join's,
    // row for row, including (dist, id) tie-breaks
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    for (metric <- Seq(Metric.L2, Metric.Cosine)) {
      val exact = KnnJoin.explodeRanks(KnnJoin(q, b, 5, metric))
        .select("query_id", "rank", "base_id")
      val full = KnnJoin.explodeRanks(
        KnnJoin.ivfApprox(q, b, 5, metric, nlist = 8, nprobe = 8, kmIters = 2))
        .select("query_id", "rank", "base_id")
      assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty,
        s"full-probe ivfApprox != exact join for $metric")
    }
  }

  test("ivfApprox block checkpoints: resume is row-identical and a stale " +
       "slice is refused") {
    // the drain's per-block parquet checkpoints make the multi-hour 10M
    // prefix preemptible; contract: (a) checkpointed == uncheckpointed,
    // (b) a relaunch that lost some blocks recomputes ONLY those and
    // yields identical rows, (c) a marker/slice mismatch fails loudly
    // instead of serving a stale block
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 40)
    val b = emb.filter(col("id") >= 40)
    def rows(df: org.apache.spark.sql.DataFrame) =
      KnnJoin.explodeRanks(df).select("query_id", "rank", "base_id")
    val plain = rows(KnnJoin.ivfApprox(q, b, 5, Metric.L2,
      nlist = 8, nprobe = 8, kmIters = 2, queryBlockRows = 16))
    val cpDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "knn_cp_spec")
      .toString
    val cp = rows(KnnJoin.ivfApprox(q, b, 5, Metric.L2,
      nlist = 8, nprobe = 8, kmIters = 2, queryBlockRows = 16,
      checkpointDir = Some(cpDir)))
    assert(cp.exceptAll(plain).isEmpty && plain.exceptAll(cp).isEmpty,
      "checkpointed drain != plain drain")
    assert(new java.io.File(s"$cpDir/block_1/_SUCCESS").exists(),
      "expected multiple drained blocks")

    // simulated preemption: block_1 (and its marker) are gone, block_0
    // survives and must be served from parquet
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree); f.delete()
    }
    rmTree(new java.io.File(s"$cpDir/block_1"))
    new java.io.File(s"$cpDir/block_1.marker").delete()
    val marker0 = new java.io.File(s"$cpDir/block_0.marker")
    val m0 = marker0.lastModified()
    val resumed = rows(KnnJoin.ivfApprox(q, b, 5, Metric.L2,
      nlist = 8, nprobe = 8, kmIters = 2, queryBlockRows = 16,
      checkpointDir = Some(cpDir)))
    assert(resumed.exceptAll(plain).isEmpty && plain.exceptAll(resumed).isEmpty,
      "resumed drain != plain drain")
    assert(marker0.lastModified() == m0, "resume rewrote a completed block")

    // a different query slice under the same dir must be refused
    val e = intercept[Exception] {
      rows(KnnJoin.ivfApprox(emb.filter(col("id") < 39), b, 5, Metric.L2,
        nlist = 8, nprobe = 8, kmIters = 2, queryBlockRows = 16,
        checkpointDir = Some(cpDir))).count()
    }
    assert(e.getMessage.contains("refusing stale resume"), e.getMessage)
    rmTree(new java.io.File(cpDir))
  }

  test("ivfApprox checkpoint dir refuses knob and tiling changes " +
       "(stale-stage guard)") {
    // ADVICE r11: a reused checkpoint dir under different k/nprobe/nlist
    // (or a different block tiling) must fail LOUDLY — previously
    // completed blocks/stages would otherwise be served verbatim with
    // results computed under the old knobs.
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 40)
    val b = emb.filter(col("id") >= 40)
    def run(k: Int, nlist: Int, nprobe: Int, blockRows: Int, dir: String) =
      KnnJoin.ivfApprox(q, b, k, Metric.L2, nlist = nlist, nprobe = nprobe,
        kmIters = 2, queryBlockRows = blockRows,
        checkpointDir = Some(dir)).count()
    val cpDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "knn_cp_knobs")
      .toString
    run(5, 8, 8, 16, cpDir)

    // different k: refused at the dir FINGERPRINT, before any stage read
    val eK = intercept[Exception] { run(6, 8, 8, 16, cpDir) }
    assert(eK.getMessage.contains("refusing to mix stage outputs"),
      eK.getMessage)
    // different nprobe: same guard
    val eP = intercept[Exception] { run(5, 8, 4, 16, cpDir) }
    assert(eP.getMessage.contains("refusing to mix stage outputs"),
      eP.getMessage)
    // same knobs, different tiling (queryBlockRows): the dir fingerprint
    // matches but block_0's marker was written for a different slice
    // shape — refused at the marker, never served
    val eT = intercept[Exception] { run(5, 8, 8, 8, cpDir) }
    assert(eT.getMessage.contains("refusing stale resume"), eT.getMessage)
    // unchanged knobs still resume cleanly after the refused attempts
    assert(run(5, 8, 8, 16, cpDir) === q.count())

    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree); f.delete()
    }
    rmTree(new java.io.File(cpDir))
  }

  test("ivfApprox under partial probing keeps high agreement with exact") {
    // clustered corpus (the geometry IVF exists for): probing a quarter of
    // the lists must retain >= 0.9 mean overlap with the exact top-k
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(h: Long): Float =
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
    def vec(id: Long, seed: Long): Array[Float] = {
      val c = id % 8
      Array.tabulate(16)(j =>
        unit(mix(c * 131071L + j)) + 1.0f * unit(mix(seed ^ (id * 8191L + j))))
    }
    val b = spark.range(4000).map(i => (i, vec(i, 0xB0L))).toDF("id", "vec")
    val q = spark.range(64).map(i => (i + 100000L, vec(i * 7L, 0x70L)))
      .toDF("id", "vec")
    val k = 10
    val exact = KnnJoin(q, b, k, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("e"))
    val approx = KnnJoin.ivfApprox(q, b, k, Metric.L2,
      nlist = 32, nprobe = 8, kmIters = 3)
      .select(col("query_id"), transform(col("knn"), _("id")).as("a"))
    val agree = exact.join(approx, "query_id")
      .select(size(array_intersect(col("e"), col("a"))).as("ov"))
      .agg(avg(col("ov"))).head().getDouble(0) / k
    assert(agree >= 0.9, f"ivfApprox agreement $agree%.3f < 0.9 at nprobe/nlist = 1/4")
  }

  test("ivfApprox is invariant to query-side partitioning (distributed " +
      "probe assignment == any drain order)") {
    // probe sets are a pure function of (vector, centroid grid), so the
    // mapPartitions assignment pass must yield per-query results
    // independent of how the query side is partitioned / drained
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 16)
    val b = emb.filter(col("id") >= 16)
    val one = KnnJoin.explodeRanks(KnnJoin.ivfApprox(
      q, b, 5, Metric.L2, nlist = 8, nprobe = 3, kmIters = 2))
      .select("query_id", "rank", "base_id")
    val rep = KnnJoin.explodeRanks(KnnJoin.ivfApprox(
      q.repartition(7), b, 5, Metric.L2, nlist = 8, nprobe = 3, kmIters = 2))
      .select("query_id", "rank", "base_id")
    assert(one.exceptAll(rep).isEmpty && rep.exceptAll(one).isEmpty,
      "ivfApprox results changed under query repartitioning")
  }

  test("probesFor picks the nprobe nearest centroids, ties by centroid id") {
    val cents = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    // query at origin: dists 0, 1, 1, 1 -> top-3 = centroid 0, then the
    // dist-1 tie breaks ascending id: 1, 2 (never 3)
    val ps = KnnJoin.probesFor(Array(0.0, 0.0), cents, 3)
    assert(ps.toSeq == Seq(0, 1, 2))
  }

  test("ivfApprox emits exactly one row per query id (coverage)") {
    import spark.implicits._
    val b = spark.range(200).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("id", "vec")
    val q = spark.range(32).map(i => (i + 1000L, Array(i * 6f, 1f)))
      .toDF("id", "vec")
    val out = KnnJoin.ivfApprox(q, b, 5, Metric.L2,
      nlist = 16, nprobe = 2, kmIters = 2)
    val ids = out.select("query_id").as[Long].collect().sorted
    assert(ids.toSeq == (1000L until 1032L).toSeq,
      "ivfApprox must cover every query id exactly once")
  }

  test("ensureQueryCoverage re-attaches dropped queries with an empty knn") {
    import spark.implicits._
    val q = spark.range(4).map(i => (i, Array(i.toFloat))).toDF("id", "vec")
    val partial = Seq((0L, Seq((1.5, 7L))), (2L, Seq((0.5, 3L))))
      .toDF("query_id", "knn0")
      .select(col("query_id"),
        transform(col("knn0"),
          x => struct(x("_1").as("dist"), x("_2").as("id"))).as("knn"))
    val covered = KnnJoin.ensureQueryCoverage(q, partial)
      .orderBy("query_id").collect()
    assert(covered.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val sizes = covered.map(
      _.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("knn").length)
    assert(sizes.toSeq == Seq(1, 0, 1, 0),
      "dropped queries must carry an EMPTY knn array")
    // the filled rows keep the result schema (dist: double, id: long)
    assert(covered(0).schema("knn").dataType ==
      partial.schema("knn").dataType)
  }

  test("BoundedTopK keeps k smallest with (dist, id) tie-break") {
    val h = new KnnJoin.BoundedTopK(3)
    Seq((5.0, 1L), (1.0, 9L), (1.0, 2L), (3.0, 7L), (0.5, 4L), (9.0, 0L))
      .foreach { case (d, i) => h.push(d, i) }
    assert(h.result().toSeq == Seq((0.5, 4L), (1.0, 2L), (1.0, 9L)))
  }
}
