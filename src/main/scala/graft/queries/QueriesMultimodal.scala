package graft.queries

import graft.core.Tables
import graft.ops.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: the binary-payload pipeline (pack → decode
  * stub → features / frame samples) hash-checked against DuckDB computing
  * the same statistics from the source text (the corpus is ASCII, so
  * byte == char code — which is what makes the stub oracle-checkable). */
object QueriesMultimodal {

  private val Bins = 16
  private val Frames = 4

  private def mm(s: SparkSession, dir: String) =
    MultimodalOps.packFromText(Tables.documents(s, dir))

  // ---- feature extraction (stub image-decode path) ------------------------

  private def featuresQuery(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.extractFeatures(mm(s, dir), Bins)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("bin", "v")))
      .select(col("doc_id"), col("bin"),
        round(col("v").cast("double"), 6).as("v"))
      .orderBy("doc_id", "bin")

  private val featuresOracle =
    s"""WITH c AS (SELECT doc_id, length(text) AS n,
       |             list_transform(string_split(text, ''), ch -> ascii(ch) % $Bins) AS bs
       |           FROM documents),
       |e AS (SELECT doc_id, n, unnest(bs) AS b FROM c),
       |h AS (SELECT doc_id, b AS bin, count(*) AS cnt FROM e GROUP BY doc_id, b)
       |SELECT c.doc_id, CAST(bins.bin AS INT) AS bin,
       |       round(CAST(coalesce(h.cnt, 0) AS FLOAT) / c.n, 6) AS v
       |FROM c CROSS JOIN (SELECT unnest(range(0, $Bins)) AS bin) bins
       |LEFT JOIN h ON h.doc_id = c.doc_id AND h.bin = bins.bin
       |ORDER BY c.doc_id, bin""".stripMargin

  // ---- frame sampling (stub video path) -----------------------------------

  private def framesQuery(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.sampleFrames(mm(s, dir), Frames)
      .select(col("doc_id"), col("frame"), col("frame_bytes").cast("long"),
        round(col("mean_byte"), 6).as("mean_byte"))
      .orderBy("doc_id", "frame")

  private val framesOracle =
    s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |f AS (SELECT doc_id, text, n, unnest(range(0, $Frames)) AS frame FROM t),
       |s AS (SELECT doc_id, frame,
       |        (frame + 1) * n // $Frames - frame * n // $Frames AS frame_bytes,
       |        substring(text, frame * n // $Frames + 1,
       |                  (frame + 1) * n // $Frames - frame * n // $Frames) AS seg
       |      FROM f)
       |SELECT doc_id, CAST(frame AS INT) AS frame, CAST(frame_bytes AS BIGINT) AS frame_bytes,
       |       round(CASE WHEN frame_bytes > 0
       |         THEN CAST(list_sum(list_transform(string_split(seg, ''), ch -> ascii(ch))) AS DOUBLE) / frame_bytes
       |         ELSE 0.0 END, 6) AS mean_byte
       |FROM s ORDER BY doc_id, frame""".stripMargin

  // ---- REAL media decode (P6 PPM + PCM16 WAV, pure JVM) -------------------
  // The fixtures are real containers whose CONTENT follows integer
  // formulas of (doc_id, i); the engine builds payload bytes, then the
  // real parsers (MultimodalOps.decodePpm/decodeWav) recover pixels/
  // samples and compute statistics from the DECODED data. The oracle
  // recomputes the same statistics straight from the formulas — a header
  // mis-parse, byte-order bug, or channel mix-up breaks the hash.

  private def decodeQuery(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeMedia(
      MultimodalOps.synthMedia(Tables.documents(s, dir)))
      .select(col("doc_id"), col("format"), col("dim1"), col("dim2"),
        round(col("feat1"), 6).as("feat1"), round(col("feat2"), 6).as("feat2"),
        round(col("feat3"), 6).as("feat3"))
      .orderBy("doc_id")

  private val decodeOracle = {
    import MultimodalOps.{PpmW, PpmH, WavSampleRate, WavBase, WavMod}
    val npix = PpmW * PpmH
    s"""WITH pix AS (SELECT doc_id, i.range AS i,
       |         (doc_id * 131 + i.range * 7919) % 256 AS v
       |       FROM documents, range(${3 * npix}) i WHERE doc_id % 2 = 0),
       |ppm AS (SELECT doc_id, 'ppm' AS format,
       |         CAST($PpmW AS BIGINT) AS dim1, CAST($PpmH AS BIGINT) AS dim2,
       |         round(CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS DOUBLE) / $npix, 6) AS feat1,
       |         round(CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS DOUBLE) / $npix, 6) AS feat2,
       |         round(CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS DOUBLE) / $npix, 6) AS feat3
       |       FROM pix GROUP BY doc_id),
       |smp AS (SELECT doc_id, i.range AS i,
       |         (doc_id * 31 + i.range * 17) % 2003 - 1001 AS s,
       |         (doc_id * 31 + (i.range - 1) * 17) % 2003 - 1001 AS sp,
       |         $WavBase + doc_id % $WavMod AS n
       |       FROM documents, range(${WavBase + WavMod}) i
       |       WHERE doc_id % 2 = 1 AND i.range < $WavBase + doc_id % $WavMod),
       |wav AS (SELECT doc_id, 'wav' AS format,
       |         CAST($WavSampleRate AS BIGINT) AS dim1, CAST(any_value(n) AS BIGINT) AS dim2,
       |         round(CAST(sum(s) AS DOUBLE) / any_value(n), 6) AS feat1,
       |         round(sqrt(CAST(sum(s * s) AS DOUBLE) / any_value(n)), 6) AS feat2,
       |         round(CAST(sum(CASE WHEN i > 0 AND ((sp < 0 AND s >= 0) OR (sp >= 0 AND s < 0)) THEN 1 ELSE 0 END) AS DOUBLE) / (any_value(n) - 1), 6) AS feat3
       |       FROM smp GROUP BY doc_id)
       |SELECT * FROM ppm UNION ALL SELECT * FROM wav ORDER BY doc_id""".stripMargin
  }

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (featuresQuery _),
    "mm_frames" -> (framesQuery _),
    "mm_decode" -> (decodeQuery _),
  )

  val oracles: Map[String, String] = Map(
    "mm_features" -> featuresOracle,
    "mm_frames" -> framesOracle,
    "mm_decode" -> decodeOracle,
  )
}
