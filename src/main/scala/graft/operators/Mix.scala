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
}
