package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run partition-wise over
  * the binary payloads.
  *
  * The ACTUAL media decoders (JPEG/PNG, PCM, video containers) are not in
  * this environment — the decode step is a clearly-marked deterministic
  * STUB (byte-level statistics standing in for pixel/sample decoding). The
  * Spark-side plumbing is real and tested: schema (binary + struct
  * metadata), typed `mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas` batches), fixed-width float feature output, and
  * oracle-checked determinism.
  */
object MultimodalOps {

  /** Build a multimodal table from the documents fixture: UTF-8 payload
    * bytes + typed metadata. At 100 TB the payload column is the dominant
    * mass — everything downstream is written so payloads are scanned once
    * and never shuffled. */
  def packFromText(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("utf8-text").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  /** STUB DECODE — stands in for image decoding. A real deployment would
    * replace `decodeToFeatures` with e.g. JPEG decode + CNN embedding; the
    * operator contract (binary in, fixed-width float vector out, computed
    * partition-wise with no shuffle) is unchanged. */
  private[graft] def decodeToFeatures(payload: Array[Byte], bins: Int): Array[Float] = {
    val counts = new Array[Int](bins)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % bins) += 1
      i += 1
    }
    val out = new Array[Float](bins)
    val n = math.max(payload.length, 1)
    i = 0
    while (i < bins) { out(i) = counts(i).toFloat / n; i += 1 }
    out
  }

  /** Feature extraction over the payload column: one fixed-width float
    * vector per row. Typed mapPartitions — each task processes its rows as
    * a batch (the `mapInPandas` shape), payloads never shuffle. */
  def extractFeatures(mm: DataFrame, bins: Int = 16,
                      idCol: String = "doc_id"): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Array[Byte])] =
      mm.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    typed.mapPartitions { it =>
      it.map { case (id, payload) => (id, decodeToFeatures(payload, bins)) }
    }.toDF(idCol, "features")
  }

  /** STUB frame sampling — stands in for video frame extraction: split the
    * payload into `k` evenly-sized spans ("frames"), reduce each to a
    * summary feature (mean byte value; a real pipeline would decode the
    * frame and embed it). Output one row per (row, frame). */
  def sampleFrames(mm: DataFrame, k: Int = 4,
                   idCol: String = "doc_id"): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Array[Byte])] =
      mm.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    typed.flatMap { case (id, payload) =>
      val n = payload.length
      (0 until k).iterator.map { f =>
        val lo = f * n / k
        val hi = (f + 1) * n / k
        var s = 0L
        var i = lo
        while (i < hi) { s += (payload(i) & 0xff); i += 1 }
        val mean = if (hi > lo) s.toDouble / (hi - lo) else 0.0
        (id, f, hi - lo, mean)
      }
    }.toDF(idCol, "frame", "frame_bytes", "mean_byte")
  }
}
