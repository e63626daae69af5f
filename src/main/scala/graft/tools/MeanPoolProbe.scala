package graft.tools

import org.apache.spark.sql.functions._

/** Where does vec_mean_pool's wall go? Splits DataFrame construction,
  * analysis/optimization/physical planning, and execution; twice, to
  * separate one-time costs. {{{ runMain graft.tools.MeanPoolProbe <sfDir> }}} */
object MeanPoolProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tools.session()
    spark.range(100000).selectExpr("sum(id)").collect()
    def lap[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MPP,$name,${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    (1 to 2).foreach { run =>
      val emb = graft.core.Tables.vectors(spark, dir)
      val df = lap(s"run$run construct") {
        graft.ops.VectorOps.meanPoolNormalized(emb, "label")
          .select(col("label"), col("pos"), round(col("v"), 6).as("v"))
          .orderBy("label", "pos")
      }
      lap(s"run$run plan") { df.queryExecution.executedPlan }
      lap(s"run$run execute") { df.count() }
    }
    spark.stop()
  }
}
