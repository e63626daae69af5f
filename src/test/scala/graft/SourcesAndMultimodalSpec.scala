package graft

import graft.core.Tables
import graft.ops.MultimodalOps
import graft.sources.FbinCodec
import org.apache.spark.sql.functions._

class SourcesAndMultimodalSpec extends SparkSpec {

  test("fbin round-trip preserves ids and float vectors exactly") {
    val emb = Tables.vectors(spark, sf0001).select("id", "vec").limit(50)
    val dir = java.nio.file.Files.createTempDirectory("graft-fbin").toString
    FbinCodec.writeFbin(emb, s"$dir/test.fbin")
    val back = FbinCodec.readFbin(spark, s"$dir/test.fbin")
    // codec ids are positional (0..n-1); compare vectors in id order
    val orig = emb.orderBy("id").collect().map(_.getSeq[Float](1))
    val rt = back.orderBy("id").collect().map(_.getSeq[Float](1))
    assert(orig.length == rt.length)
    orig.zip(rt).foreach { case (a, b) => assert(a == b) }
  }

  test("ibin round-trip preserves int lists exactly") {
    import spark.implicits._
    val knn = Seq((0L, Array(3, 1, 4)), (1L, Array(1, 5, 9)), (2L, Array(2, 6, 5)))
      .toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("graft-ibin").toString
    FbinCodec.writeIbin(knn, s"$dir/test.ibin")
    val back = FbinCodec.readIbin(spark, s"$dir/test.ibin")
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
    assert(back.toSeq == Seq(Seq(3, 1, 4), Seq(1, 5, 9), Seq(2, 6, 5)))
  }

  test("fbin header matches (npts, dim) and reads are parallel-safe") {
    val emb = Tables.vectors(spark, sf0001).select("id", "vec").limit(32)
    val dir = java.nio.file.Files.createTempDirectory("graft-fbin2").toString
    FbinCodec.writeFbin(emb, s"$dir/t.fbin")
    val back = FbinCodec.readFbin(spark, s"$dir/t.fbin").repartition(8)
    assert(back.count() == 32)
    assert(back.select(size(col("vec"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(64))
  }

  test("multimodal pack → extractFeatures: features sum to 1 and are deterministic") {
    val mm = MultimodalOps.packFromText(Tables.documents(spark, sf0001))
    assert(mm.schema("payload").dataType.typeName == "binary")
    val f1 = MultimodalOps.extractFeatures(mm, bins = 16)
    val rows = f1.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val fs = r.getSeq[Float](1)
      assert(fs.length == 16)
      assert(math.abs(fs.sum - 1.0f) < 1e-3)
    }
    val f2 = MultimodalOps.extractFeatures(mm, bins = 16)
    assert(f1.exceptAll(f2).isEmpty)
  }

  test("multimodal frame sampling covers the payload exactly once") {
    val mm = MultimodalOps.packFromText(Tables.documents(spark, sf0001))
    val frames = MultimodalOps.sampleFrames(mm, k = 4)
    val byDoc = frames.groupBy("doc_id")
      .agg(count("*").as("n"), sum("frame_bytes").as("covered"))
      .join(mm.select(col("doc_id"), col("meta.n_bytes")), "doc_id")
    assert(byDoc.filter(col("n") =!= 4 || col("covered") =!= col("n_bytes")).isEmpty)
  }
}
