package graft

import graft.build.DistRoarGraphBuilder
import graft.core.{BuildParams, Metric, Tables}
import org.apache.spark.sql.functions._

/** Gates for the distributed build's durable stage checkpoints — what makes
  * a multi-window build (the 10M regime; any preempted cluster job)
  * resumable instead of restartable. The contract under test: checkpoints
  * are result-NEUTRAL (checkpointed == fresh, resumed == fresh, bit-for-bit
  * adjacency), completed stages are genuinely not recomputed on resume, and
  * a dir written under different knobs is refused rather than silently
  * mixed in. */
class DistCheckpointSpec extends SparkSpec {

  private lazy val emb = Tables.vectors(spark, sf0001)
  private lazy val queriesDf = emb.filter(col("id") < 100)
  private lazy val baseDf = emb.filter(col("id") >= 100)
  private lazy val params = BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60,
    metric = Metric.L2)

  private def adjacency(di: graft.build.DistIndex): Array[(Long, Seq[Long])] = {
    import spark.implicits._
    di.adj.as[(Long, Seq[Long])].collect().sortBy(_._1)
  }

  private def assertSame(a: Array[(Long, Seq[Long])],
                         b: Array[(Long, Seq[Long])]): Unit = {
    assert(a.length == b.length)
    a.zip(b).foreach { case ((s1, n1), (s2, n2)) =>
      assert(s1 == s2 && n1 == n2, s"adjacency differs at $s1")
    }
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  private def tempCpDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "build_cp_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("checkpointed build == fresh build, and resume after a simulated " +
       "preemption is exact without recomputing completed stages") {
    val fresh = DistRoarGraphBuilder.build(baseDf, queriesDf, params,
      selfSearchBatches = 3)
    val a = adjacency(fresh)

    val cpDir = tempCpDir()
    val cp = DistRoarGraphBuilder.build(baseDf, queriesDf, params,
      selfSearchBatches = 3, checkpointDir = Some(cpDir))
    assert(cp.ep == fresh.ep)
    assertSame(a, adjacency(cp))
    for (stage <- Seq("projection", "supply_b0_of3", "supply_b1_of3",
                      "supply_b2_of3", "adj_merged"))
      assert(new java.io.File(s"$cpDir/$stage/_SUCCESS").exists(),
        s"stage $stage missing from checkpoint dir")

    // simulate a kill between batch 1 and batch 2: the last batch and
    // everything after it are gone, earlier stages survive
    rmTree(new java.io.File(s"$cpDir/supply_b2_of3"))
    rmTree(new java.io.File(s"$cpDir/adj_merged"))
    val keptMarker = new java.io.File(s"$cpDir/supply_b0_of3/_SUCCESS")
    val keptMtime = keptMarker.lastModified()

    val resumed = DistRoarGraphBuilder.build(baseDf, queriesDf, params,
      selfSearchBatches = 3, checkpointDir = Some(cpDir))
    assert(resumed.ep == fresh.ep)
    assertSame(a, adjacency(resumed))
    // a completed stage was read, not recomputed: its marker is untouched
    assert(keptMarker.lastModified() == keptMtime,
      "resume rewrote a completed stage")
    rmTree(new java.io.File(cpDir))
  }

  test("a checkpoint dir written under different knobs is refused") {
    val cpDir = tempCpDir()
    DistRoarGraphBuilder.build(baseDf, queriesDf, params,
      selfSearchBatches = 2, checkpointDir = Some(cpDir))
    val e = intercept[IllegalArgumentException] {
      DistRoarGraphBuilder.build(baseDf, queriesDf,
        params.copy(lPjpq = params.lPjpq + 4),
        selfSearchBatches = 2, checkpointDir = Some(cpDir))
    }
    assert(e.getMessage.contains("refusing to mix stage outputs"))
    rmTree(new java.io.File(cpDir))
  }
}
