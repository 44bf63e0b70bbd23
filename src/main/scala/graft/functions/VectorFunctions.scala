package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CatalystBridge

/**
 * Embedding-vector primitives over `array<double>` columns.
 *
 * The hot-path versions are native Catalyst expressions (one fused loop
 * per row, codegen'd — see [[NativeVector]]); the `*Hof` variants keep the
 * equivalent `zip_with` + `aggregate` higher-order formulations, which
 * evaluate their lambdas interpreted (~1000× slower per SCALING.md) but
 * serve as the executable spec: VectorFunctionsSpec pins the native
 * results bit-identical to them.
 */
object VectorFunctions {

  private def expr(c: Column) = CatalystBridge.expression(c)

  /** Cast to array<double> (parquet embeddings are float32). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: sequential left-fold, deterministic across runs. */
  def dot(a: Column, b: Column): Column =
    CatalystBridge.column(NativeDot(expr(a), expr(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    CatalystBridge.column(NativeCosine(expr(a), expr(b)))

  def l2Distance(a: Column, b: Column): Column =
    CatalystBridge.column(NativeL2Distance(expr(a), expr(b)))

  // ------------------------- interpreted reference formulations (specs)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dotHof(a, b) / (na * nb))
  }

  def l2DistanceHof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  // ----------------------------------------------------- LSH signatures

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
    CatalystBridge.column(HyperplaneSig(expr(v), nBits, seed))

  /**
   * Banded LSH keys: `bands` keys of `bandBits` bits each (total
   * bands×bandBits hyperplanes, not capped at 64). Buckets per band =
   * 2^bandBits — size it so accidental collisions stay rare at the target
   * corpus cardinality; recall at similarity s is 1-(1-p^bandBits)^bands
   * with p = 1 - acos(s)/π (SCALING.md).
   */
  def bandKeys(v: Column, bands: Int, bandBits: Int, seed: Long = 42L): Column =
    CatalystBridge.column(BandKeys(expr(v), bands, bandBits, seed))

  /** The `n` nearest of `centroids` (unit-normalized) by cosine, as an
    * array<int> of cell ids, descending similarity. */
  def nearestCells(v: Column, centroids: Array[Array[Double]], n: Int): Column =
    CatalystBridge.column(NearestCells(expr(v),
      centroids.flatten.toIndexedSeq, centroids.length, n))

  /** The single nearest of `centroids` by squared L2 distance, as an
    * int index (ties → lower index) — the PQ code assignment. */
  def nearestCellL2(v: Column, centroids: Array[Array[Double]]): Column =
    CatalystBridge.column(NearestCellL2(expr(v),
      centroids.flatten.toIndexedSeq, centroids.length))
}
