package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar int8 embedding quantization — the 4× storage/bandwidth cut that
 * makes billion-vector ANN indexes fit: per-vector max-abs scale, values
 * mapped to [-127, 127]. Pure expression work (one projection), and the
 * arithmetic is deliberately engine-portable: `floor(x + 0.5)` instead
 * of `round(x)` so both engines apply the identical half-up rule to the
 * identical double (native `round` semantics differ across engines on
 * ties; `floor` never does).
 *
 * Reconstruction error per component is ≤ scale/254, which preserves
 * cosine/top-k ordering for the near-dup and search regimes the ANN
 * operators target (spec-asserted on the real embeddings).
 */
object Quantize {

  private def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** (id, scale, q) — q is the int8 code array (stored as int;
    * all-zero vectors quantize to zeros with scale 0). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = maxAbs(col(vecCol))
    df.select(col(idCol), scale.as("scale"),
      transform(col(vecCol), x =>
        when(scale === 0.0, lit(0))
          .otherwise(floor(x / scale * 127.0 + 0.5).cast("int"))).as("q"))
  }

  /** Approximate reconstruction of a quantized vector column. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127.0)
}
