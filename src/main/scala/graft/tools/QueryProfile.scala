package graft.tools

/** Structural profile of individual SparkEntry queries: per-run job/stage/
  * task counts and shuffle bytes (deterministic for a fixed plan — the
  * noise-free counters this box requires), with each query run twice so
  * run1 − run2 isolates one-time codegen/compile cost.
  *
  * {{{ runMain graft.tools.QueryProfile <sfDir> <query> [<query> ...] }}}
  */
object QueryProfile {

  private final class Counters extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
    def snapshot: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shuffleRead.get)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <sfDir> <query> [<query>...]")
    val sfDir = args.head
    val spark = Tools.session()
    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)
    spark.range(100000).selectExpr("sum(id)").collect()

    args.tail.foreach { name =>
      (1 to 2).foreach { run =>
        val before = counters.snapshot
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let task-end events drain
        val a = counters.snapshot
        println(f"QPROF,$name,run$run,$sec%.2f s,jobs ${a._1 - before._1}," +
          f"stages ${a._2 - before._2},tasks ${a._3 - before._3}," +
          f"shufRd ${(a._4 - before._4) / 1024} KiB,rows $rows")
      }
    }
    spark.stop()
  }
}
