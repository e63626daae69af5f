package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions are callable from spark.sql") {
    GraftFunctions.register(spark)
    Tables.vectors(spark, sf0001).limit(50).createOrReplaceTempView("v_graft_fn")
    val rows = spark.sql(
      """SELECT a.id, graft_l2sq(a.vec, b.vec) AS l2,
        |       graft_negip(a.vec, b.vec) AS ip,
        |       graft_cosine(a.vec, b.vec) AS cos
        |FROM v_graft_fn a JOIN v_graft_fn b ON b.id = a.id + 1""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0)
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    // registration is idempotent
    GraftFunctions.register(spark)
  }

  test("graft_charhash is callable from SQL and equals the Column API") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf0001).limit(100)
      .createOrReplaceTempView("d_graft_fn")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_charhash(text) AS h FROM d_graft_fn")
    val viaCol = spark.table("d_graft_fn")
      .select(col("doc_id"), graft.ops.NearDup.charHash(col("text")).as("h"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("SQL function results equal the Column-API expressions") {
    GraftFunctions.register(spark)
    val e = Tables.vectors(spark, sf0001).limit(50)
    val a = e.select(col("id"), col("vec").as("va"))
    val b = e.select((col("id") - 1).as("id"), col("vec").as("vb"))
    val j = a.join(b, "id")
    val viaSql = j.selectExpr("id", "graft_l2sq(va, vb) AS d")
    val viaCol = j.select(col("id"),
      graft.functions.VectorFunctions.l2Sq(col("va"), col("vb")).as("d"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }
}
