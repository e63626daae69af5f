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
    * the single-file format is inherently unsplittable on write). Rows
    * stream through the driver in bounded chunks (`toLocalIterator` +
    * per-chunk buffers), so a reference-scale file (10M×200d ≈ 8 GB,
    * prepare_data.sh:22-28) writes without ever sizing a buffer from the
    * total row count — all whole-file sizes stay in Long arithmetic. */
  def writeFbin(df: DataFrame, path: String, chunkRows: Int = 8192): Unit =
    writeBinary(df, path, (bb, row) =>
      row.getSeq[Float](1).foreach(bb.putFloat), chunkRows)

  /** Write [id, vec: array<int>] as `.ibin`. */
  def writeIbin(df: DataFrame, path: String, chunkRows: Int = 8192): Unit =
    writeBinary(df, path, (bb, row) =>
      row.getSeq[Int](1).foreach(bb.putInt), chunkRows)

  /** The `uint32 npts, uint32 dim` header; rejects anything the format
    * (or a signed-Int reader) cannot represent. */
  private def headerBytes(npts: Long, dim: Int, what: String): Array[Byte] = {
    require(npts > 0, s"$what: empty input")
    require(npts <= Int.MaxValue,
      s"$what: npts=$npts exceeds the format's uint32 header (readers use signed Int)")
    require(dim > 0, s"$what: dim must be positive, got $dim")
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(npts.toInt).putInt(dim)
    bb.array()
  }

  /** Write [id, ids: array<int>, dists: array<float>] as a
    * gt-with-dists `.ibin` (ids block then parallel float32 dists block),
    * rows ordered by id — the positional query index on read-back. Two
    * streamed passes over the sorted rows (the blocks are physically
    * disjoint), chunked like [[writeFbin]]. */
  def writeGtWithDist(df: DataFrame, path: String, chunkRows: Int = 8192): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val sorted = df.select("id", "ids", "dists").orderBy("id")
    val npts = sorted.count()
    require(npts > 0, "writeGtWithDist: empty input")
    val k = sorted.head().getSeq[Int](1).length
    require(chunkRows > 0 && chunkRows.toLong * k * 4 <= Int.MaxValue,
      s"writeGtWithDist: chunkRows=$chunkRows x k=$k chunk buffer exceeds Int range")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write(headerBytes(npts, k, "writeGtWithDist"))
      var seen = 0L
      sorted.toLocalIterator().asScala.grouped(chunkRows).foreach { chunk =>
        val bb = java.nio.ByteBuffer.allocate(chunk.length * k * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        chunk.foreach { r =>
          val ids = r.getSeq[Int](1)
          require(ids.length == k, "ragged id rows")
          ids.foreach(bb.putInt)
          seen += 1
        }
        out.write(bb.array(), 0, bb.position())
      }
      require(seen == npts, s"writeGtWithDist: row count changed mid-write ($seen != $npts)")
      sorted.toLocalIterator().asScala.grouped(chunkRows).foreach { chunk =>
        val bb = java.nio.ByteBuffer.allocate(chunk.length * k * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        chunk.foreach { r =>
          val ds = r.getSeq[Float](2)
          require(ds.length == k, "ragged dist rows")
          ds.foreach(bb.putFloat)
        }
        out.write(bb.array(), 0, bb.position())
      }
    } finally out.close()
  }

  private def writeBinary(df: DataFrame, path: String,
                          put: (java.nio.ByteBuffer, org.apache.spark.sql.Row) => Unit,
                          chunkRows: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val sorted = df.orderBy("id")
    val npts = sorted.count()
    require(npts > 0, "writeFbin/writeIbin: empty input")
    val dim = sorted.head().getSeq[Any](1).length
    require(chunkRows > 0 && chunkRows.toLong * dim * 4 <= Int.MaxValue,
      s"writeFbin/writeIbin: chunkRows=$chunkRows x dim=$dim chunk buffer exceeds Int range")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write(headerBytes(npts, dim, "writeFbin/writeIbin"))
      var seen = 0L
      sorted.toLocalIterator().asScala.grouped(chunkRows).foreach { chunk =>
        val bb = java.nio.ByteBuffer.allocate(chunk.length * dim * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        chunk.foreach { r =>
          require(r.getSeq[Any](1).length == dim, "ragged rows")
          put(bb, r)
          seen += 1
        }
        out.write(bb.array(), 0, bb.position())
      }
      require(seen == npts, s"writeFbin/writeIbin: row count changed mid-write ($seen != $npts)")
    } finally out.close()
  }
}
