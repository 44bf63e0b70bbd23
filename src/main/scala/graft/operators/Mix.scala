package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus mixing — the "data recipe" step of a training
 * pipeline: combine N cleaned sources at exact target ratios
 * (web : code : books = 6 : 3 : 1), and repeat a small high-quality
 * source for several epochs up to a row budget. The reference has no
 * multi-corpus concept (SURVEY §1.1: named tables only); these compose
 * its UNION semantics with the sampling family's determinism rules.
 *
 * Both operators are REPRODUCIBLE BY CONSTRUCTION: row selection is
 * ranked by `md5(seed ‖ id)` via [[Sample.deterministicShuffle]] —
 * engine-portable (DuckDB computes the identical hex), seedless RNG-wise,
 * and stable under re-partitioning — so the same recipe over the same
 * corpus yields byte-identical mixes on any cluster size, and the DuckDB
 * oracle asserts the exact row set, not just counts.
 *
 * Scale shape: ranks are the shuffle's two-phase construction (rank
 * within 256 hash-prefix buckets + broadcast bucket offsets — a bare
 * per-source window would serialize each source through ONE task);
 * counts are map-side-combined stat rows; the 1-row budget broadcasts.
 * No driver-side collect anywhere.
 */
object Mix {

  /**
   * Exact-ratio downsampling mix: sources are `(df, parts)` with
   * integer ratio parts; the result takes `parts_i × T` rows from
   * source i, where `T = min_i ⌊n_i / parts_i⌋` is the largest budget
   * multiplier no source can exhaust — the biggest mix at EXACTLY the
   * requested ratio with no upsampling. Adds `mix_source` (the source's
   * index). All sources must share a schema.
   */
  def weightedMix(sources: Seq[(DataFrame, Int)], idCol: String,
                  salt: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._2 > 0), "ratio parts must be positive")
    val ranked = sources.zipWithIndex.map { case ((df, w), i) =>
      Sample.deterministicShuffle(df, idCol, seed = s"$salt:$i")
        .withColumn("mix_source", lit(i)).withColumn("__w", lit(w))
    }.reduce(_ unionByName _)
    // integer counts in double are exact below 2^53, so floor() is the
    // same integer in Spark and DuckDB
    val budget = ranked.groupBy("mix_source", "__w")
      .agg(count(lit(1)).as("__n"))
      .agg(min(floor(col("__n") / col("__w"))).cast("long").as("__T"))
    ranked.crossJoin(broadcast(budget))
      .filter(col("pos") <= col("__w") * col("__T"))
      .drop("pos", "__w", "__T")
  }

  /**
   * Epoch-repeat to a row budget: emits every input row
   * `⌊t / n⌋` times (full epochs) plus one more for the first
   * `t mod n` md5-ranked rows, where `t = min(targetRows,
   * maxEpochs × n)` — exactly t output rows. Adds `epoch` (0-based).
   * The standard treatment of a small high-quality corpus ("repeat
   * wikipedia ~4 epochs") with the repeat count capped and the partial
   * epoch chosen reproducibly instead of randomly.
   */
  def repeatToBudget(df: DataFrame, idCol: String, targetRows: Long,
                     maxEpochs: Int, salt: String): DataFrame = {
    require(targetRows >= 0, "targetRows must be >= 0")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val budget = df.agg(count(lit(1)).as("__n"))
      .select(least(lit(targetRows),
        lit(maxEpochs.toLong) * col("__n")).as("__t"), col("__n"))
    // row at 0-based global rank r repeats k = ⌈(t − r) / n⌉ times
    // (= ⌊t/n⌋, +1 for r < t mod n); both operands are exact in double,
    // and an integer-valued quotient divides exactly, so ceil is
    // engine-portable
    Sample.deterministicShuffle(df, idCol, seed = salt)
      .crossJoin(broadcast(budget))
      .withColumn("__k",
        ceil((col("__t") - (col("pos") - 1L)) / col("__n")).cast("long"))
      .filter(col("__k") >= 1L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__k") - 1L)))
      .drop("pos", "__t", "__n", "__k")
  }

  /**
   * Budget-constrained mixture realization with WATER-FILLING: draw
   * `budget` total rows from the groups of `keyCol` at target
   * proportions `weightOf`, redistributing the share a small group
   * cannot fill to the rest — the step that turns a data recipe
   * ("web:code:books at 6:3:1, 10B docs total") into an actual sample
   * when some sources are finite. [[weightedMix]] shrinks the WHOLE mix
   * to the scarcest source; this keeps the budget and bends the ratios
   * instead — the other standard resolution.
   *
   * The water level λ solves Σᵢ min(capᵢ, wᵢλ) = budget: groups with
   * cap < wλ contribute everything; the rest take ⌊wλ⌋. Solved
   * IN-PLAN, not on the driver: sort the per-group stats by cap/w
   * ascending — λ along a saturating prefix is strictly increasing, so
   * the first group whose cap/w reaches its prefix level is where
   * saturation stops — with prefix-sum windows over the stats table
   * (#groups rows; the single-partition window is a non-issue at that
   * size) and a 1-row broadcast of (stop-rank, λ). Row selection within
   * each group is the capPerKey md5 rank — deterministic, engine-
   * portable, re-run-identical. Total drawn is within #groups rows
   * under budget (per-group floors), never over.
   *
   * `weightOf` must be constant within a group; `budget` is evaluated
   * in one global aggregate over `df`, so both absolute (`lit(1000)`)
   * and relative (`floor(count(lit(1)) * 0.9)`) budgets express.
   */
  def budgetMix(df: DataFrame, idCol: String, keyCol: String,
                weightOf: org.apache.spark.sql.Column,
                budget: org.apache.spark.sql.Column,
                salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bRow = df.agg(budget.cast("double").as("__B"))
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("double").as("__cap"),
        max(weightOf).cast("double").as("__w"))
      .crossJoin(broadcast(bRow))
    // bounded-window: rules — one row per mixture domain key
    val ord = Window.orderBy(col("__ratio").asc, col(keyCol).asc)
    val s2 = stats
      .withColumn("__ratio", col("__cap") / col("__w"))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__capBefore", coalesce(
        sum(col("__cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("__wFrom",
        sum(col("__w")).over(ord.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
      .withColumn("__lam",
        (col("__B") - col("__capBefore")) / col("__wFrom"))
    // first group (in cap/w order) that does NOT saturate fixes λ; if
    // every group saturates (budget ≥ total), the left join yields NULL
    // and every allocation falls back to cap
    val stop = s2.filter(col("__ratio") >= col("__lam"))
      .orderBy(col("__rn")).limit(1)
      .select(col("__rn").as("__krn"), col("__lam").as("__klam"))
    val alloc = s2.join(broadcast(stop), lit(true), "left")
      .select(col(keyCol),
        when(col("__krn").isNull || col("__rn") < col("__krn"), col("__cap"))
          .otherwise(least(col("__cap"), floor(col("__w") * col("__klam"))))
          .as("__alloc"))
    val rank = Window.partitionBy(col(keyCol))
      .orderBy(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        1, 16).asc, col(idCol).asc)
    df.withColumn("__rnk", row_number().over(rank))
      .join(broadcast(alloc), keyCol)
      .filter(col("__rnk") <= col("__alloc"))
      .drop("__rnk", "__alloc")
  }

  /**
   * Temperature-based mixture reweighting — the standard multilingual /
   * multi-source LM sampling recipe (Conneau & Lample 2019 §3.1;
   * Arivazhagan et al. 2019 §4.2): raw group shares p_i are flattened to
   * q_i ∝ p_i^(1/T). T = 1 keeps natural proportions, T → ∞ approaches
   * uniform, T < 1 sharpens toward the head — the knob that stops a
   * 100× bigger English corpus from drowning low-resource groups.
   *
   * One row per group: `(group, n_rows, p_raw, p_temp,
   * target_rows)` where `target_rows = round(p_temp · Σn)` — the
   * sampling plan a caller feeds to [[Sample.capPerKey]] (or
   * [[repeatToBudget]] when a group's target exceeds its size).
   *
   * Determinism: counts are exact longs; each power/normalization is a
   * fixed-shape double expression rounded to 6 dp, so the oracle can
   * reproduce every row bit-for-bit. Scale shape: ONE map-side-combined
   * count to |groups| rows; the normalizing sum is a 1-row broadcast —
   * the corpus crosses the wire once as count partials.
   */
  def temperatureWeights(df: DataFrame, keyCol: String,
                         temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__N"),
      sum(pow(col("n_rows").cast("double"), lit(1.0 / temperature)))
        .as("__Z"))
    counts.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_rows"),
        round(col("n_rows").cast("double") / col("__N").cast("double"), 6)
          .as("p_raw"),
        round(pow(col("n_rows").cast("double"), lit(1.0 / temperature)) /
          col("__Z"), 6).as("p_temp"),
        round(pow(col("n_rows").cast("double"), lit(1.0 / temperature)) /
          col("__Z") * col("__N").cast("double"), 0).cast("long")
          .as("target_rows"))
  }

  /**
   * DoReMi-style multiplicative mixture reweighting (Xie et al. 2023,
   * Alg. 1's per-round update): given each domain's PROXY-model loss,
   * REFERENCE-model loss, and the baseline mixture weight, upweight
   * domains where the proxy still lags the reference —
   * `excess = max(0, proxy − ref)`, `raw = baseline · exp(η·excess)`,
   * `weight = (1−c)·raw/Σraw + c/k` (uniform smoothing c, k domains).
   * One row per domain: `(domain, excess, weight)`. The training loop
   * that PRODUCES the losses lives outside (that is the GPU half of
   * DoReMi); this is the distributable update the data pipeline owns —
   * feed the weights to [[budgetMix]] / [[interleave]].
   *
   * Determinism: exp snaps once to 9 dp (the transcendental
   * discipline), products/shares round to 9 dp with the normalizing sum
   * in DECIMAL, published weights at 6 dp. Scale shape: |domains| rows
   * end to end — the corpus never appears.
   */
  def doremiWeights(df: DataFrame, domainCol: String, proxyLossCol: String,
                    refLossCol: String, baselineCol: String,
                    eta: Double = 1.0, smoothing: Double = 0.0): DataFrame = {
    require(eta > 0, s"eta must be positive, got $eta")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing must be in [0,1), got $smoothing")
    val base = df
      .where(col(domainCol).isNotNull && col(proxyLossCol).isNotNull &&
        col(refLossCol).isNotNull && col(baselineCol).isNotNull)
      .select(col(domainCol).cast("string").as("domain"),
        round(greatest(col(proxyLossCol).cast("double") -
          col(refLossCol).cast("double"), lit(0.0)), 9).as("excess"),
        col(baselineCol).cast("double").as("__b"))
      .withColumn("__raw",
        round(col("__b") * round(exp(lit(eta) * col("excess")), 9), 9))
    val tot = base.agg(
      sum(col("__raw").cast("decimal(28,9)")).cast("double").as("__z"),
      count(lit(1)).as("__k"))
    base.crossJoin(broadcast(tot))
      .select(col("domain"), col("excess"),
        round(lit(1.0 - smoothing) *
          round(col("__raw") / col("__z"), 9) +
          lit(smoothing) / col("__k").cast("double"), 6).as("weight"))
  }

  /**
   * Deterministic stride-scheduled interleave — the DATA-LOADER order
   * for a weighted mixture: each row gets `mix_key = rank_in_source /
   * weight` (rank = the source-internal deterministic-shuffle position),
   * and reading rows by ascending (mix_key, source, id) yields the
   * smooth weighted round-robin of stride scheduling: after any prefix
   * of length L, source i has contributed ≈ wᵢ/Σw · L rows — no epoch
   * boundaries, no RNG, restartable from any offset.
   *
   * Emits `mix_source`, `mix_rank` (1-based within source) and
   * `mix_key`; the consumer sorts by the key (or range-partitions on it
   * for distributed readers — the key is uniformly dense in ranks/w).
   * `mix_key` divides a ≤2⁵³ integer rank by a literal weight — both
   * engines produce the identical IEEE double, rounded to 6 dp with the
   * (source, id) tiebreak carrying determinism at collisions.
   *
   * Scale shape: per-source [[Sample.deterministicShuffle]] (bucketed
   * offsets, no global sort) + a pure projection. The final ordering is
   * the CONSUMER's range partition/sort — deliberately not materialized
   * here.
   */
  def interleave(sources: Seq[(DataFrame, Double)], idCol: String,
                 salt: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._2 > 0), "weights must be positive")
    sources.zipWithIndex.map { case ((df, w), i) =>
      Sample.deterministicShuffle(df, idCol, seed = s"$salt:$i")
        .withColumn("mix_source", lit(i))
        .withColumnRenamed("pos", "mix_rank")
        .withColumn("mix_key",
          round(col("mix_rank").cast("double") / lit(w), 6))
    }.reduce(_ unionByName _)
  }
}
