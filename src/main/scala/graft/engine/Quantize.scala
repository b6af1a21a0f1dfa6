package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-vector int8 scalar quantization — the storage/bandwidth step of a
  * large-scale vector pipeline: a 64-dim float32 embedding (256 B)
  * becomes 64 codes + 2 doubles (~80 B), and ANN candidate scans read
  * codes instead of floats (exact re-rank on the float originals, same
  * pattern as the IVF probe). Map-only: every output is a projection of
  * the row itself — no shuffle, no model state, no driver involvement at
  * any corpus size.
  *
  * Determinism across engines (G2/G4 discipline): codes use FLOOR, never
  * round() — Spark/Java rounds half-up, DuckDB half-even, so round()
  * would flip codes on exact .5 boundaries; floor of the identically-
  * associated double expression is bit-stable in both engines. Casts
  * happen AFTER floor (Spark's double→int cast truncates while DuckDB's
  * rounds — another half-boundary trap).
  */
object Quantize {
  import graft.functions.GraftExpressions.dotProduct
  type Q = (SparkSession, String) => DataFrame

  /** code_i = floor((x_i − mn)·255/(mx − mn)) clamped to [0, 255]; a
    * constant vector (mx = mn) quantizes to all-zero codes. The clamp
    * guards the x = mx edge, where the rounded double ratio can land an
    * ulp above 255.
    */
  private def codeExpr(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0.0))
      .otherwise(least(floor((x - mn) * lit(255.0) / (mx - mn)), lit(255.0)))

  /** Dequantized midpoint: mn + (code + ½)·(mx − mn)/255. */
  private def dequantExpr(code: Column, mn: Column, mx: Column): Column =
    mn + (code + lit(0.5)) * (mx - mn) / lit(255.0)

  /** Graded surface: quantize every embedding, emit the codes (joined as
    * a string — the harness's rows-check cannot hash arrays), the
    * per-vector scale bounds, and the L2 reconstruction error of the
    * midpoint dequantization. The error fold goes through DotProduct
    * (left-to-right, bit-identical to DuckDB's list_dot_product), so the
    * oracle reproduces every output exactly.
    *
    * The mn/mx subexpressions are O(dim) and appear once per lambda —
    * Catalyst inlines them per element (G12), costing O(dim²) ≈ 4096
    * flops/row at dim 64: constant per row, irrelevant next to the scan.
    */
  val qEmbedQuantize: Q = (s, d) => {
    val v = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .select(col("vec_id"), v.as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
      .withColumn("codes",
        transform(col("v"), x => codeExpr(x, col("mn"), col("mx")).cast("long")))
      .withColumn("errs",
        transform(col("v"), x =>
          x - dequantExpr(codeExpr(x, col("mn"), col("mx")), col("mn"), col("mx"))))
      .select(col("vec_id"),
        array_join(col("codes"), ",").as("codes"),
        round(col("mn"), 6).as("qmin"),
        round(col("mx"), 6).as("qmax"),
        round(sqrt(dotProduct(col("errs"), col("errs"))), 6).as("recon_err"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_embed_quantize" -> qEmbedQuantize
  )
}
