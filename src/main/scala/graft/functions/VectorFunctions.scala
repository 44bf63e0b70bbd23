package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CatalystBridge

/**
 * Embedding-vector primitives over `array<float|double>` columns, built
 * from higher-order built-ins (`zip_with` + `aggregate`) so they run inside
 * whole-stage codegen — no UDF boxing on the ANN hot path.
 */
object VectorFunctions {

  /** Cast to array<double> (parquet embeddings are float32). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: sequential left-fold, deterministic across runs. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /**
   * Random-hyperplane LSH signature (Charikar, STOC'02): bit i = sign of
   * dot(v, r_i) where r_i is a deterministic pseudo-random ±1 hyperplane
   * derived from MurmurHash3(seed, i, dimension). `nBits` ≤ 64. The
   * dimensionality is read from the array at runtime.
   *
   * sign-agreement probability = 1 - angle/π, so bucketing on the signature
   * (or bands of it) yields cosine-ANN candidates without a model fit.
   * Native one-pass expression — see graft.functions.NativeVector.
   */
  def hyperplaneSignature(v: Column, nBits: Int, seed: Long = 42L): Column =
    CatalystBridge.column(HyperplaneSig(CatalystBridge.expression(v), nBits, seed))
}
