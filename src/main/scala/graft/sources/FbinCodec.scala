package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader/writer for the reference's binary vector formats (SURVEY.md §1.4):
  *
  *   - `.fbin`: `uint32 npts, uint32 dim, npts*dim float32 row-major`
  *     (include/efanna2e/util.h:107-127 load_meta, :180-211 load_data)
  *   - `.ibin`: same header, uint32 payload — kNN id lists
  *     (src/index_bipartite.cpp:2622-2639 LoadLearnBaseKNN)
  *
  * Parquet is the engine's primary format; these codecs exist for
  * compatibility with existing ANN fixtures. The read path is
  * scale-correct: the header is read once, then each Spark task opens the
  * file via the Hadoop FS API and reads only its row range (parallel
  * ranged reads, like a parquet scan — no single-executor whole-file
  * ingest). Little-endian, as written by numpy/the reference tooling.
  */
object FbinCodec {

  private def readHeader(spark: SparkSession, path: String): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](8)
      in.readFully(0L, b)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (bb.getInt(0), bb.getInt(4))
    } finally in.close()
  }

  private def readRows[T](spark: SparkSession, path: String, elemBytes: Int,
                          decode: java.nio.ByteBuffer => T)
                         (implicit enc: org.apache.spark.sql.Encoder[(Long, T)]): DataFrame = {
    val (npts, dim) = readHeader(spark, path)
    val rowBytes = dim.toLong * elemBytes
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    spark.range(npts).mapPartitions { it =>
      val ids = it.map(_.toLong).toArray
      if (ids.isEmpty) Iterator.empty
      else {
        val p = new Path(path)
        val fs = p.getFileSystem(conf.value)
        val in = fs.open(p)
        val buf = new Array[Byte](rowBytes.toInt)
        val out = ids.iterator.map { id =>
          in.readFully(8L + id * rowBytes, buf)
          val bb = java.nio.ByteBuffer.wrap(buf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (id, decode(bb))
        }
        new Iterator[(Long, T)] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) in.close(); h }
          def next(): (Long, T) = out.next()
        }
      }
    }.toDF("id", "vec")
  }

  /** `.fbin` → DataFrame [id: long, vec: array<float>]. */
  def readFbin(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (_, dim) = readHeader(spark, path)
    readRows[Array[Float]](spark, path, 4, bb => {
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getFloat(i * 4); i += 1 }
      v
    })
  }

  /** `.ibin` → DataFrame [id: long, vec: array<int>] (kNN id lists). */
  def readIbin(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (_, dim) = readHeader(spark, path)
    readRows[Array[Int]](spark, path, 4, bb => {
      val v = new Array[Int](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getInt(i * 4); i += 1 }
      v
    })
  }

  /** Write [id, vec: array<float>] as `.fbin`, rows ordered by id.
    * Driver-side stream (a compat fixture tool, not the primary sink —
    * the single-file format is inherently unsplittable on write). */
  def writeFbin(df: DataFrame, path: String): Unit =
    writeBinary(df, path, (bb, row) =>
      row.getSeq[Float](1).foreach(bb.putFloat))

  /** Write [id, vec: array<int>] as `.ibin`. */
  def writeIbin(df: DataFrame, path: String): Unit =
    writeBinary(df, path, (bb, row) =>
      row.getSeq[Int](1).foreach(bb.putInt))

  private def writeBinary(df: DataFrame, path: String,
                          put: (java.nio.ByteBuffer, org.apache.spark.sql.Row) => Unit): Unit = {
    val rows = df.orderBy("id").collect()
    require(rows.nonEmpty, "writeFbin/writeIbin: empty input")
    val dim = rows.head.getSeq[Any](1).length
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val bb = java.nio.ByteBuffer.allocate(8 + rows.length * dim * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(rows.length).putInt(dim)
      rows.foreach { r =>
        require(r.getSeq[Any](1).length == dim, "ragged rows")
        put(bb, r)
      }
      out.write(bb.array())
    } finally out.close()
  }
}
