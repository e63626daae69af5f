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

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (featuresQuery _),
    "mm_frames" -> (framesQuery _),
  )

  val oracles: Map[String, String] = Map(
    "mm_features" -> featuresOracle,
    "mm_frames" -> framesOracle,
  )
}
