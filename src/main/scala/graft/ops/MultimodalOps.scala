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

  // ---- REAL pure-JVM decoders (P6 PPM images, PCM16 RIFF/WAVE audio) ----
  // The environment has no media libraries, but these two containers need
  // none: the parsers below are complete, real implementations (comment-
  // aware PPM headers, RIFF chunk walking). Formats beyond these still hit
  // the labeled stub.

  val PpmW = 16; val PpmH = 16
  val WavSampleRate = 8000; val WavBase = 200; val WavMod = 56

  /** Synthetic-but-real media fixtures over a documents table: even
    * doc_ids become a PpmW×PpmH binary PPM whose pixel byte i is
    * (doc_id*131 + i*7919) mod 256; odd doc_ids become a PCM16 mono WAV
    * at 8 kHz with n = WavBase + doc_id mod WavMod samples
    * s_i = (doc_id*31 + i*17) mod 2003 - 1001. Real containers,
    * formula-defined content — which is what makes a REAL parser
    * oracle-checkable: DuckDB recomputes the statistics straight from the
    * formulas, so a header mis-parse or byte-order bug breaks the hash. */
  def synthMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val payload = if (id % 2 == 0) ppmBytes(id) else wavBytes(id)
      val fmt = if (id % 2 == 0) "ppm" else "wav"
      (id, payload, fmt, payload.length.toLong)
    }.toDF(idCol, "payload", "true_format", "n_bytes")
      .select(col(idCol), col("payload"),
        struct(col("true_format").as("format"), col("n_bytes")).as("meta"))
  }

  private[graft] def ppmBytes(docId: Long): Array[Byte] = {
    val header = s"P6\n# graft synthetic fixture\n$PpmW $PpmH\n255\n"
      .getBytes("US-ASCII")
    val n = PpmW * PpmH * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = ((docId * 131 + i * 7919) % 256).toByte
      i += 1
    }
    out
  }

  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val n = (WavBase + docId % WavMod).toInt
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavSampleRate).putInt(WavSampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort(((docId * 31 + i * 17) % 2003 - 1001).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real binary-PPM (P6) parser: magic, whitespace- and comment-tolerant
    * header (width, height, maxval), raw RGB payload. Returns
    * (width, height, rgb bytes) or None if the payload is not P6. */
  private[graft] def decodePpm(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var p = 2
    def skipWs(): Unit = {
      var in = true
      while (in && p < b.length) {
        val c = b(p)
        if (c == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') p += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0'); p += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 || p >= b.length) return None
    p += 1 // exactly one whitespace byte after maxval, per spec
    val need = w * h * 3
    if (b.length - p < need) return None
    Some((w, h, java.util.Arrays.copyOfRange(b, p, p + need)))
  }

  /** Real RIFF/WAVE parser: walks chunks to `fmt ` and `data`, accepts
    * PCM16 mono, returns (sampleRate, samples) or None. */
  private[graft] def decodeWav(b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(b, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var p = 12
    var sampleRate = -1
    var bits = -1
    var channels = -1
    var data: Array[Short] = null
    while (p + 8 <= b.length) {
      val id = tag(p)
      val len = buf.getInt(p + 4)
      if (len < 0 || p + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val fmtCode = buf.getShort(p + 8)
          channels = buf.getShort(p + 10)
          sampleRate = buf.getInt(p + 12)
          bits = buf.getShort(p + 22)
          if (fmtCode != 1) return None // PCM only
        case "data" =>
          if (bits != 16 || channels != 1) return None
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(p + 8 + i * 2); i += 1 }
          data = out
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      p += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate > 0 && data != null) Some((sampleRate, data)) else None
  }

  /** Media decode over a multimodal table: sniffs the container from the
    * BYTES (not trusting metadata), parses with the real parser, and emits
    * per-format statistics computed from the DECODED content —
    *   ppm: (w, h, mean R, mean G, mean B)
    *   wav: (sampleRate, nSamples, mean, rms, zero-crossing rate)
    * Unknown formats fall back to the byte-histogram stub (first three
    * bins), keeping the operator total. Partition-wise, payloads never
    * shuffle. Output (idCol, format, dim1, dim2, feat1, feat2, feat3). */
  def decodeMedia(mm: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        decodePpm(payload) match {
          case Some((w, h, rgb)) =>
            val sums = new Array[Long](3)
            var i = 0
            while (i < rgb.length) { sums(i % 3) += rgb(i) & 0xff; i += 1 }
            val npix = (w * h).toDouble
            (id, "ppm", w.toLong, h.toLong,
              sums(0) / npix, sums(1) / npix, sums(2) / npix)
          case None => decodeWav(payload) match {
            case Some((sr, s)) =>
              var sum = 0L; var sumSq = 0L; var cross = 0
              var i = 0
              while (i < s.length) {
                sum += s(i); sumSq += s(i).toLong * s(i)
                if (i > 0 && ((s(i - 1) < 0 && s(i) >= 0) ||
                  (s(i - 1) >= 0 && s(i) < 0))) cross += 1
                i += 1
              }
              val n = s.length.toDouble
              (id, "wav", sr.toLong, s.length.toLong, sum / n,
                math.sqrt(sumSq / n), cross.toDouble / (s.length - 1))
            case None =>
              val h = decodeToFeatures(payload, 16)
              (id, "unknown", 0L, 0L, h(0).toDouble, h(1).toDouble, h(2).toDouble)
          }
        }
      }.toDF(idCol, "format", "dim1", "dim2", "feat1", "feat2", "feat3")
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
