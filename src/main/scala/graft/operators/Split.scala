package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic train/test splitting for dataset curation — the
 * anti-leakage primitive of training-data pipelines: the assignment must
 * be (a) reproducible across runs/engines, (b) a pure function of
 * CONTENT, so that exact duplicates land on the same side no matter
 * which copy survived dedup, and (c) free of coordination (no global
 * sample, no RNG state).
 *
 * Assignment: the first 8 hex chars of `md5(key)` — a uniform 32-bit
 * value — compared against `floor(frac · 2³²)` rendered in fixed-width
 * lowercase hex (lexicographic compare ≡ numeric compare for same-width
 * hex). Pure codegen built-ins, no shuffle, scale-invariant; and because
 * md5 is engine-portable, the exact assignment is DuckDB-oracle-checkable.
 */
object Split {

  /** The fixed-width hex threshold for a fraction (exposed so gates can
    * generate the oracle SQL from the same constant). frac = 1.0 returns
    * "g" — lexicographically above every 8-char hex string — because
    * saturating at "ffffffff" under the strict `<` comparison would
    * silently drop the ~2⁻³² of rows whose md5 prefix is exactly that
    * (expected occurrences at 10⁹-row scale); both engines compare the
    * strings identically, so keep-all stays keep-ALL. */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0, 1]")
    if (frac >= 1.0) "g"
    else f"${(frac * 4294967296.0).toLong}%08x"
  }

  /** 'train' iff the key hashes below the fraction threshold. */
  def splitColumn(key: Column, trainFrac: Double): Column =
    when(substring(md5(key), 1, 8) < lit(thresholdHex(trainFrac)), "train")
      .otherwise("test")

  /** Attach a deterministic content-hash split column. */
  def hashSplit(df: DataFrame, keyCol: String, trainFrac: Double,
                splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitColumn(col(keyCol), trainFrac))

  /** Three-way 'train'/'val'/'test' by two thresholds on the same hash —
    * the train set is IDENTICAL to [[hashSplit]]'s at the same
    * `trainFrac` (thresholds nest), so growing a 2-way split to 3-way
    * never moves a training example across the leakage boundary. */
  def splitColumn3(key: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to at most 1")
    val h = substring(md5(key), 1, 8)
    when(h < lit(thresholdHex(trainFrac)), "train")
      .when(h < lit(thresholdHex(trainFrac + valFrac)), "val")
      .otherwise("test")
  }

  def hashSplit3(df: DataFrame, keyCol: String, trainFrac: Double,
                 valFrac: Double, splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitColumn3(col(keyCol), trainFrac, valFrac))

  /** GROUP-level split: hash the GROUP key (domain, source, parent
    * document), not the row content, so every row of a group lands on
    * the same side. This is the anti-leakage boundary content hashing
    * can't give: near-duplicates and sibling chunks DIFFER in content
    * but share the group, and splitting them apart leaks test data into
    * training. Identical machinery to [[hashSplit]] — a distinct entry
    * point because choosing the hash INPUT is the design decision.
    * Note the achieved row fraction tracks trainFrac only as group sizes
    * allow (few/skewed groups → coarse steps); that is inherent to
    * group-level assignment, not a defect. */
  def groupSplit(df: DataFrame, groupCol: String, trainFrac: Double,
                 splitCol: String = "split"): DataFrame =
    hashSplit(df, groupCol, trainFrac, splitCol)

  /**
   * K-fold assignment for cross-validation: fold = (hex-digit value of
   * the key hash's first nibble) mod k — deterministic, content-keyed
   * (the same key lands in the same fold forever, so folds stay stable
   * across reruns and incremental appends), and engine-portable via a
   * single-nibble arithmetic both engines can state exactly (`conv`
   * here, `strpos` over the hex alphabet in the oracle — same value).
   * `k` must divide 16 so folds get EQUAL hash mass (k ∤ 16 would bias
   * low folds by one nibble value — fail loudly rather than skew
   * silently). Pure projection, zero shuffle.
   */
  def kFoldColumn(key: Column, k: Int): Column = {
    require(k >= 2 && 16 % k == 0, "k must be in {2, 4, 8, 16}")
    (conv(substring(md5(key), 1, 1), 16, 10).cast("int") % k).cast("int")
  }

  /** Attach the fold column. */
  def kFold(df: DataFrame, keyCol: String, k: Int,
            foldCol: String = "fold"): DataFrame =
    df.withColumn(foldCol, kFoldColumn(col(keyCol), k))

  /**
   * TEMPORAL split — train on the past, evaluate on the future, the
   * split that hash assignment cannot give: forecasting/drift evals are
   * invalid if training rows postdate test rows. The cutoff is the
   * earliest DAY whose cumulative row count reaches `trainFrac` of the
   * corpus, and whole days land on one side (splitting inside a day
   * leaks intra-day correlations across the boundary — the same
   * reasoning as [[groupSplit]], with the day as the group).
   *
   * The achieved train fraction overshoots `trainFrac` by at most the
   * cutoff day's mass — inherent to day-granularity assignment.
   *
   * Scale shape: one map-side-combined count per day (the corpus
   * crosses the wire as |days| longs), a cumulative window over that
   * |days|-sized table (bounded: years of data ≈ 10³ rows), and a
   * broadcast of the 1-row cutoff back onto the scan — rows never
   * shuffle. The rank arithmetic mirrors Profile.quantiles: 9-dp round
   * before ceil so IEEE `frac·n` cannot cross an integer boundary.
   */
  /**
   * Deterministic training-order shuffle + sharding — the last mile of
   * a curation pipeline: every example gets a `(shard, position)` so
   * the training job can stream shard files in position order and see a
   * seeded pseudo-random global order, reproducibly, with no RNG state
   * anywhere. Shard = the first md5 byte of `seed:id` mod `nShards`
   * (balanced in expectation); position = rank of the full md5 hex
   * within the shard (ties → id). Same content + same seed = same
   * order on any cluster, any partitioning, any engine — the md5/hex
   * discipline every Split/Sample operator here shares.
   *
   * Scale shape: ONE hash shuffle keyed by shard and a per-shard sort —
   * at 100 TB pick nShards so a shard fits a sort task comfortably
   * (e.g. 10⁴–10⁵ shards); there is no global sort and no driver
   * state. Downstream, `df.repartition(col("shard"))
   * .sortWithinPartitions("position")` + a partitioned write lays the
   * files out exactly as the trainer reads them.
   */
  def trainingOrder(df: DataFrame, idCol: String, nShards: Int,
                    seed: String = "graft"): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      "nShards must be in [1, 256] (shard id is the first md5 byte)")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 2), 16, 10).cast("int")
          % nShards).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__h")
  }

  def temporalSplit(df: DataFrame, tsCol: String, trainFrac: Double,
                    splitCol: String = "split"): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0, "trainFrac must be in (0,1)")
    val days = df.groupBy(to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__c"))
    val cum = days
      // bounded-window: calendar-grid — one row per observed day
      .withColumn("__cum", sum("__c").over(
        org.apache.spark.sql.expressions.Window.orderBy("__d")))
      .withColumn("__n", sum("__c").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val cutoff = cum
      .filter(col("__cum") >=
        ceil(round(lit(trainFrac) * col("__n"), 9)).cast("long"))
      .agg(min("__d").as("__cutoff"))
    df.crossJoin(broadcast(cutoff))
      .withColumn(splitCol,
        when(to_date(col(tsCol)) <= col("__cutoff"), lit("train"))
          .otherwise(lit("test")))
      .drop("__cutoff")
  }
}
