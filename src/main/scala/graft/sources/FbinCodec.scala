package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader/writer for the reference's binary vector formats (SURVEY.md §1.4):
  *
  *   - `.fbin`: `uint32 npts, uint32 dim, npts*dim float32 row-major`
  *     (include/efanna2e/util.h:107-127 load_meta, :180-211 load_data)
  *   - `.ibin`: same header, uint32 payload — kNN id lists
  *     (src/index_bipartite.cpp:2622-2639 LoadLearnBaseKNN)
  *   - gt-with-dists `.ibin`: `uint32 npts, uint32 k`, then an npts×k
  *     uint32 id block followed by a parallel npts×k float32 distance
  *     block (include/efanna2e/util.h:84-105 load_gt_meta size check,
  *     :129-155 load_gt_data_with_dist); rows are positional — row i is
  *     query index i.
  *
  * Parquet is the engine's primary format; these codecs exist for
  * compatibility with existing ANN fixtures. The read path is
  * scale-correct: the header is read once, then each Spark task opens the
  * file via the Hadoop FS API and reads only its row range (parallel
  * ranged reads, like a parquet scan — no single-executor whole-file
  * ingest). Streams are closed via a task-completion listener, so a
  * downstream `limit`/`take` that abandons the iterator early cannot leak
  * a file handle per partition. Little-endian, as written by numpy/the
  * reference tooling.
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

  /** Open `path` inside a task, closing on task completion (success OR
    * failure/early-abandon — the iterator may never be exhausted). */
  private def openForTask(path: String,
                          conf: org.apache.spark.util.SerializableConfiguration) = {
    val p = new Path(path)
    val in = p.getFileSystem(conf.value).open(p)
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    in
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
      if (!it.hasNext) Iterator.empty
      else {
        val in = openForTask(path, conf)
        val buf = new Array[Byte](rowBytes.toInt)
        it.map { boxed =>
          val id = boxed.toLong
          in.readFully(8L + id * rowBytes, buf)
          val bb = java.nio.ByteBuffer.wrap(buf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (id, decode(bb))
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

  /** Ground-truth-with-distances `.ibin`
    * (include/efanna2e/util.h:129-155 load_gt_data_with_dist) →
    * DataFrame [id: long, ids: array<int>, dists: array<float>]. `id` is
    * the positional query index (row i of the file). Each task reads only
    * its row ranges from the two parallel blocks. */
  def readGtWithDist(spark: SparkSession, path: String): DataFrame = {
    val (npts, k) = readHeader(spark, path)
    val rowBytes = k.toLong * 4
    val distBlockOff = 8L + npts.toLong * rowBytes
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    spark.range(npts).mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val in = openForTask(path, conf)
        val ibuf = new Array[Byte](rowBytes.toInt)
        val dbuf = new Array[Byte](rowBytes.toInt)
        it.map { boxed =>
          val id = boxed.toLong
          in.readFully(8L + id * rowBytes, ibuf)
          in.readFully(distBlockOff + id * rowBytes, dbuf)
          val ib = java.nio.ByteBuffer.wrap(ibuf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val db = java.nio.ByteBuffer.wrap(dbuf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val ids = new Array[Int](k)
          val ds = new Array[Float](k)
          var i = 0
          while (i < k) { ids(i) = ib.getInt(i * 4); ds(i) = db.getFloat(i * 4); i += 1 }
          (id, ids, ds)
        }
      }
    }.toDF("id", "ids", "dists")
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

  /** Write [id, ids: array<int>, dists: array<float>] as a
    * gt-with-dists `.ibin` (ids block then parallel float32 dists block),
    * rows ordered by id — the positional query index on read-back. */
  def writeGtWithDist(df: DataFrame, path: String): Unit = {
    val rows = df.select("id", "ids", "dists").orderBy("id").collect()
    require(rows.nonEmpty, "writeGtWithDist: empty input")
    val k = rows.head.getSeq[Int](1).length
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val bb = java.nio.ByteBuffer.allocate(8 + rows.length * k * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(rows.length).putInt(k)
      rows.foreach { r =>
        val ids = r.getSeq[Int](1)
        require(ids.length == k, "ragged id rows")
        ids.foreach(bb.putInt)
      }
      rows.foreach { r =>
        val ds = r.getSeq[Float](2)
        require(ds.length == k, "ragged dist rows")
        ds.foreach(bb.putFloat)
      }
      out.write(bb.array())
    } finally out.close()
  }

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
