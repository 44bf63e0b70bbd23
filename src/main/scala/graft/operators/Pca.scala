package graft.operators

import graft.plans.Checkpoints.LineageOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed covariance + principal-component extraction for embedding
 * columns — the anisotropy toolkit: embedding spaces from real encoders
 * concentrate mass in a few directions (Ethayarajh 2019), which
 * inflates raw cosine similarity and hides near-duplicate structure.
 * The covariance matrix quantifies it; the top principal component is
 * what "all-but-the-top" post-processing (Mu & Viswanath, ICLR 2018)
 * subtracts before cosine-based dedup/ANN.
 *
 * Scale shape: the corpus is touched ONCE — each vector explodes to its
 * d(d+1)/2 upper-triangle products inside the scan (no self-join, no
 * per-id shuffle) and everything reduces to a d²-cell aggregate. For
 * d=1024 that is ~500k cells per partial — executor-memory bounded, and
 * the only shuffle is the d²-sized cell table. Power iteration then
 * runs entirely on that d²-row matrix: each step is a broadcast-sized
 * join + d-cell reduce; the 100 TB corpus is never re-read.
 *
 * Determinism policy (deliberately SPARSER rounding than the repo's
 * usual 9-dp-everywhere): a 9-dp round is applied ONLY where needed to
 * make a sum order-independent (products entering a decimal SUM), and
 * only to values whose decimal expansion is long — rounding a value
 * that is itself a short decimal (e.g. the product of two already-9-dp
 * numbers) manufactures exact .5 ties, where Spark's HALF_UP and
 * DuckDB's float rounding disagree. Everything else (means, norms,
 * normalized components) carries full IEEE-double precision, which both
 * engines compute bit-identically; publishes round once to 6 dp with a
 * `+ 0.0` to collapse -0.0.
 */
object Pca {

  /**
   * Upper-triangle sample covariance of `vecCol`: one row per (i, j)
   * with i <= j (1-based dims), cov = E[xy] − E[x]E[y] (population
   * normalization, /n). Output `(i, j, n, cov)` — callers order.
   * Rows with NULL vectors are dropped.
   */
  def covariance(df: DataFrame, vecCol: String): DataFrame =
    covarianceFull(df, vecCol)
      .select(col("i"), col("j"), col("n"),
        (round(col("cov"), 6) + lit(0.0)).as("cov"))

  /**
   * Top principal component of `vecCol` by power iteration on the
   * covariance matrix: v₀ = uniform 1/√d, then `iterations` rounds of
   * w = C·v; v = w/‖w‖ — all on the d²-row matrix from [[covariance]],
   * never re-reading the corpus. Returns `(dim, loading, eigenvalue)` —
   * `eigenvalue` is ‖w‖ of the final round (the Rayleigh estimate at
   * convergence), identical on every row. Fixed iteration count keeps
   * the result a pure function of the data, reproducible by an
   * unrolled SQL oracle.
   */
  def topComponent(df: DataFrame, vecCol: String,
                   iterations: Int): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    // full matrix: mirror the upper triangle (full-precision cov).
    // Materialized EAGERLY: the corpus-sized covariance pass runs
    // exactly once — a lazy .cache() would recompute it for each
    // downstream subtree (the d lookup, v0, and every iteration's
    // join race to fill the cache), and the matrix is only d² rows.
    val cmat = {
      val upper = covarianceFull(df, vecCol)
      upper.select(col("i"), col("j"), col("cov"))
        .union(upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cov")))
        .truncateLineage(eager = true)
    }
    val d = cmat.select(max(col("j")).as("d"))
    var v = cmat.select(col("i").as("dim")).distinct()
      .crossJoin(broadcast(d))
      .select(col("dim"), (lit(1.0) / sqrt(col("d").cast("double"))).as("x"))
    var lastNorm = v.select(lit(0.0).as("nrm")).limit(1)
    for (_ <- 1 to iterations) {
      val w = cmat.join(v, cmat("j") === v("dim"))
        .groupBy(cmat("i").as("wdim"))
        .agg(sum(round(col("cov") * col("x"), 12).cast("decimal(38,12)"))
          .as("__s"))
        .select(col("wdim"), col("__s").cast("double").as("w"))
      val nrm = w.agg(
        sqrt(sum(round(col("w") * col("w"), 12).cast("decimal(38,12)"))
          .cast("double")).as("nrm"))
      lastNorm = nrm
      v = w.crossJoin(broadcast(nrm))
        .select(col("wdim").as("dim"), (col("w") / col("nrm")).as("x"))
    }
    v.crossJoin(broadcast(lastNorm))
      .select(col("dim"), (round(col("x"), 6) + lit(0.0)).as("loading"),
        (round(col("nrm"), 6) + lit(0.0)).as("eigenvalue"))
  }

  /**
   * "All-but-the-top" correction (Mu & Viswanath, ICLR 2018): subtract
   * each vector's projection onto a dominant component —
   * x' = x − (x·v)v — the standard fix before cosine-based
   * dedup/ANN on anisotropic embeddings. The component (typically
   * [[topComponent]]'s loadings, or a precomputed mean direction) is a
   * driver-side d-length constant baked into the plan as a literal
   * array, so the pass is a pure per-row projection — no join, no
   * shuffle, fully codegen'd via `zip_with`/`aggregate`; published
   * values round to 6 dp (+0.0 collapses -0.0).
   */
  def removeComponent(df: DataFrame, idCol: String, vecCol: String,
                      component: Seq[Double]): DataFrame = {
    require(component.nonEmpty, "component must be non-empty")
    val v = array(component.map(lit): _*)
    val x = col(vecCol).cast("array<double>")
    val proj = aggregate(zip_with(x, v, (a, b) => a * b),
      lit(0.0).cast("double"), (acc, e) => acc + e)
    df.select(col(idCol), x.as("__x"), proj.as("__p"))
      .select(col(idCol),
        transform(zip_with(col("__x"), v, (a, b) => a - col("__p") * b),
          e => round(e, 6) + lit(0.0)).as("v"))
  }

  /**
   * Per-dimension standardization (z-score whitening): x'ᵢ =
   * (xᵢ − μᵢ)/max(σᵢ, eps) — the cheap diagonal version of the
   * anisotropy correction ([[removeComponent]] handles the top
   * direction; this flattens per-dimension offset/scale so no single
   * dead or hot dimension dominates cosine). Population σ; `eps`
   * floors near-constant dimensions instead of dividing by ~0.
   *
   * Scale shape: one corpus pass reduces to a d-cell stats table
   * (posexplode + groupBy dim, decimal-summed), which is assembled
   * into two d-length arrays in a 1-row frame and broadcast back — the
   * corpus itself never shuffles; the correction is a zip_with
   * projection. Published values round once to 6 dp (+0.0 collapses
   * -0.0); means/σ are raw IEEE doubles (same sparse-rounding policy
   * as [[topComponent]]).
   */
  def standardize(df: DataFrame, idCol: String, vecCol: String,
                  eps: Double = 1e-9): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val stats = df.filter(col(vecCol).isNotNull)
      .select(posexplode(x).as(Seq("__d", "__x")))
      .groupBy("__d").agg(
        count(lit(1)).as("__n"),
        sum(round(col("__x"), 9).cast("decimal(38,9)")).as("__s"),
        sum(round(col("__x") * col("__x"), 9).cast("decimal(38,9)"))
          .as("__s2"))
      .select(col("__d"),
        (col("__s").cast("double") / col("__n")).as("__mu"),
        sqrt(greatest(
          col("__s2").cast("double") / col("__n") -
            (col("__s").cast("double") / col("__n")) *
            (col("__s").cast("double") / col("__n")),
          lit(0.0))).as("__sd"))
    val packed = stats
      .agg(sort_array(collect_list(struct(col("__d"), col("__mu"),
        col("__sd")))).as("__p"))
      .select(transform(col("__p"), e => e("__mu")).as("__mus"),
        transform(col("__p"), e => greatest(e("__sd"), lit(eps)))
          .as("__sds"))
    df.crossJoin(broadcast(packed))
      .select(col(idCol),
        transform(
          zip_with(zip_with(x, col("__mus"), (a, m) => a - m),
            col("__sds"), (c, s) => c / s),
          e => round(e, 6) + lit(0.0)).as("v"))
  }

  /** Covariance cells at full double precision — the only rounds are
    * the 9-dp product rounds that make the decimal sums
    * order-independent. */
  private def covarianceFull(df: DataFrame, vecCol: String): DataFrame = {
    // The marginal sums Σround(xᵢ,9) are independent of the pair
    // partner, so they reduce ONCE per dim (d cells) and broadcast-join
    // back — r6 summed them inside every (i,j) group, which tripled the
    // DECIMAL aggregation work on the d²-cell table for identical
    // values (decimal sums of the same operand set are exactly equal
    // under any grouping, so the published cov is bit-for-bit
    // unchanged and the oracles stay as they are). Measured: the
    // bench's slowest row, ~16s → ~9s at sf0.1.
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val dims = vecs
      .select(posexplode(col("__v")).as(Seq("__d0", "__x")))
      .groupBy((col("__d0") + 1).as("__d"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__x"), 9).cast("decimal(38,9)")).as("__s"))
    val cells = vecs
      .select(posexplode(col("__v")).as(Seq("__i0", "__xi")), col("__v"))
      .select(col("__i0"), col("__xi"),
        posexplode(col("__v")).as(Seq("__j0", "__xj")))
      .filter(col("__j0") >= col("__i0"))
      .groupBy((col("__i0") + 1).as("i"), (col("__j0") + 1).as("j"))
      .agg(sum(round(col("__xi") * col("__xj"), 9).cast("decimal(38,9)"))
        .as("__sxy"))
    cells
      .join(broadcast(dims.select(col("__d").as("i"),
        col("__n").as("n"), col("__s").as("__sx"))), Seq("i"))
      .join(broadcast(dims.select(col("__d").as("j"),
        col("__s").as("__sy"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        (col("__sxy").cast("double") / col("n") -
          (col("__sx").cast("double") / col("n")) *
          (col("__sy").cast("double") / col("n"))).as("cov"))
  }
}
