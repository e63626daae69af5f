package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: `runMain graft.tools.TimeQuery
  * <sfDir> <name> [<name> ...]` — prints one `name,seconds,rows` line per
  * query (after one untimed warmup of the session). The per-query
  * profiling loop behind BENCH_r{N} regressions. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <query> [<query>...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEQ,$name,${(System.nanoTime() - t0) / 1e9}%.2f,$rows")
    }
    spark.stop()
  }
}
