package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding storage: per-dimension min/max
  * affine mapping onto 0..255 — the standard 4× memory/IO cut for vector
  * search at corpus scale (the reference's PQ enum is vestigial; SQ8 is
  * the simplest member of the same compression family, and the one that
  * keeps distances computable with plain arithmetic).
  *
  * Everything is relational and deterministic: bounds are a per-dimension
  * aggregate, encode/decode are column expressions, so the quantized
  * search path is DuckDB-oracle-checkable end to end. */
object Quantize {

  /** Per-dimension (pos, lo, hi) bounds over a vector column. */
  def sq8Bounds(vectors: DataFrame): DataFrame =
    vectors.select(posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))

  /** Encode: code_d = round(255 * (x_d - lo_d) / (hi_d - lo_d)), constant
    * dims → 0. Output (id, codes: array<int> 0..255). Bounds are joined in
    * exploded form and re-assembled — one broadcastable join, no UDF. */
  def sq8Encode(vectors: DataFrame, bounds: DataFrame): DataFrame = {
    val ex = vectors.select(col("id"), posexplode(col("vec")).as(Seq("pos", "x")))
    ex.join(broadcast(bounds), "pos")
      .select(col("id"), col("pos"),
        when(col("hi") > col("lo"),
          round(lit(255.0) * (col("x").cast("double") - col("lo"))
            / (col("hi") - col("lo"))).cast("int"))
          .otherwise(lit(0)).as("code"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("pos"), col("code")))).as("cs"))
      .select(col("id"), transform(col("cs"), _("code")).as("codes"))
  }

  /** Decode a codes column back to doubles given aligned lo/hi arrays. */
  def sq8Decode(codes: Column, lo: Column, hi: Column): Column =
    zip_with(codes, zip_with(lo, hi, (l, h) => struct(l.as("l"), h.as("h"))),
      (c, b) => b("l") + (c.cast("double") / 255.0) * (b("h") - b("l")))
}
