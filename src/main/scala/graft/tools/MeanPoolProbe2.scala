package graft.tools

import org.apache.spark.sql.functions._

/** Bisect vec_mean_pool's execution cost: which piece of the chain
  * (normalize HOF, typed-Aggregator mean, post-agg transform/explode)
  * owns the wall. {{{ runMain graft.tools.MeanPoolProbe2 <sfDir> }}} */
object MeanPoolProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tools.session()
    spark.range(100000).selectExpr("sum(id)").collect()
    def lap[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MPP2,$name,${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val emb = graft.core.Tables.vectors(spark, dir).cache()
    emb.count()
    (1 to 2).foreach { run =>
      lap(s"run$run scan+normalize only") {
        emb.withColumn("nvec", graft.functions.VectorFunctions.l2Normalize(col("vec")))
          .select(count(col("nvec"))).collect()
      }
      lap(s"run$run agg(meanVec) only") {
        emb.withColumn("dv", col("vec").cast("array<double>"))
          .groupBy("label")
          .agg(graft.functions.VecMeanAggregator.meanVec(col("dv")).as("m"))
          .count()
      }
      lap(s"run$run normalize+agg") {
        emb.withColumn("nvec", graft.functions.VectorFunctions.l2Normalize(col("vec")))
          .groupBy("label")
          .agg(graft.functions.VecMeanAggregator.meanVec(col("nvec")).as("m"))
          .count()
      }
      lap(s"run$run builtin-avg equivalent") {
        emb.withColumn("nvec", graft.functions.VectorFunctions.l2Normalize(col("vec")))
          .select(col("label"), posexplode(col("nvec")).as(Seq("pos", "x")))
          .groupBy("label", "pos").agg(avg("x").as("mx"))
          .count()
      }
      lap(s"run$run full meanPoolNormalized") {
        graft.ops.VectorOps.meanPoolNormalized(emb, "label").count()
      }
    }
    spark.stop()
  }
}
