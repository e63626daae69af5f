package graft.tools

import graft.build.DistRoarGraphBuilder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Post-hoc reachability repair of a PERSISTED bucketed layout — the ops
  * CLI over [[DistRoarGraphBuilder.repairLayout]]. Attaches the layout
  * (build-once/serve-elsewhere: works in a fresh session), runs the
  * convergent repair (beam rounds + exact-kNN backstop, BFS-verified),
  * and re-saves to `--outDb` (NEVER in place: saveDistBucketed drops
  * the target's tables before writing, and the source vectors table
  * must stay readable while the repaired layout streams out).
  *
  * {{{
  * java -cp "target/scala-2.13/classes:JARS" \
  *   graft.tools.RepairLayout --warehouse target/soak/warehouse \
  *   --db graft_soak_idx [--outDb graft_soak_idx_repaired]
  * }}}
  * (JARS = the Spark jars directory glob.)
  */
object RepairLayout {
  def main(args: Array[String]): Unit = {
    val a = Tools.parseArgs(args)
    val db = a.getOrElse("db", sys.error("--db required"))
    val outDb = a.getOrElse("outDb", s"${db}_repaired")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", a.getOrElse("shuffle", "96"))
      .config("spark.sql.warehouse.dir",
        a.getOrElse("warehouse", "target/soak/warehouse"))
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark

    graft.ops.graph.GraphIO.attachDistBucketed(db)
    val (di, vecs) = graft.ops.graph.GraphIO.loadDistBucketed(db)
    val t0 = System.nanoTime()
    val repaired = DistRoarGraphBuilder.repairLayout(di, vecs,
      frontierWidth = a.getOrElse("fw", "8").toInt,
      maxRounds = a.getOrElse("rounds", "64").toInt)
    val wall = (System.nanoTime() - t0) / 1e9
    val buckets = spark.table(s"$db.meta").select(col("buckets"))
      .head().getInt(0)
    graft.ops.graph.GraphIO.saveDistBucketed(repaired, vecs, outDb, buckets)
    val maxDeg = spark.table(s"$outDb.adjacency")
      .select(max(size(col("nbrs")))).head().getInt(0)
    println(f"""[repair-layout] {"db":"$db","out_db":"$outDb","repair_sec":$wall%.1f,"max_degree":$maxDeg,"degree_cap":${di.degreeCap.get}}""")
    spark.stop()
  }
}
