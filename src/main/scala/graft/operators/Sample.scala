package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic stratified sampling — the domain-mixture primitive of
 * training-data curation (sample each source/language/quality stratum at
 * its own rate to hit a target mixture, reproducibly).
 *
 * Same engine-portable mechanism as [[Split]]: a row is kept iff the
 * first 8 hex chars of `md5(key)` fall below the stratum's fraction
 * threshold. Properties that matter at 100 TB:
 *
 *  - pure per-row projection + filter — no shuffle, no global count, no
 *    RNG state; the filter pushes down to the scan;
 *  - content-keyed (hash of the text, not the row id), so exact
 *    duplicates are kept or dropped TOGETHER regardless of which copy a
 *    prior dedup pass left behind — resampling cannot reintroduce leakage;
 *  - composable with [[Split]]: hashing different columns (or salting the
 *    key) keeps sample membership independent of split side.
 */
object Sample {

  /** Keep-predicate for one fraction over a key column. */
  def keepColumn(key: Column, frac: Double): Column =
    substring(md5(key), 1, 8) < lit(Split.thresholdHex(frac))

  /** Uniform deterministic sample: keep ~`frac` of rows by content hash. */
  def hashSample(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(keepColumn(col(keyCol), frac))

  /**
   * Stratified sample: per-stratum keep fractions (e.g.
   * `Map("en" -> 0.5, "de" -> 0.2)`), `defaultFrac` for strata not in the
   * map. The stratum column only selects the threshold — membership still
   * depends solely on the key hash, so changing one stratum's rate never
   * perturbs which rows of another stratum are sampled.
   */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
                           fractions: Map[String, Double],
                           defaultFrac: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(Split.thresholdHex(defaultFrac))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(Split.thresholdHex(frac))).otherwise(acc)
    }
    df.filter(substring(md5(col(keyCol)), 1, 8) < threshold)
  }

  /**
   * Temperature-scaled mixture fractions (the multilingual "alpha
   * sampling" recipe: sample probability ∝ count^alpha, alpha ∈ [0, 1] —
   * alpha = 1 keeps natural proportions, alpha → 0 equalizes domains).
   * Returns per-domain KEEP fractions for [[stratifiedHashSample]] such
   * that the sampled total ≈ `targetRows`.
   *
   * Water-filling: a small domain whose share exceeds its size caps at
   * fraction 1.0 and releases its surplus budget to the remaining
   * domains (iterates until no new domain caps — ≤ |domains| rounds).
   * Driver-side arithmetic over a handful of (domain, count) pairs; the
   * 100 TB work stays in the hash-filter scan.
   */
  def temperatureFractions(counts: Map[String, Long], alpha: Double,
                           targetRows: Long): Map[String, Double] = {
    require(alpha >= 0.0 && counts.values.forall(_ > 0))
    var capped = Set.empty[String]
    var result = Map.empty[String, Double]
    var remaining = targetRows.toDouble
    var changed = true
    while (changed) {
      changed = false
      val open = counts.keySet -- capped
      val wSum = open.toSeq.map(k => math.pow(counts(k).toDouble, alpha)).sum
      result = result ++ open.map { k =>
        val share = if (wSum > 0) remaining * math.pow(counts(k).toDouble, alpha) / wSum else 0.0
        k -> math.min(1.0, share / counts(k).toDouble)
      }
      val newlyCapped = open.filter(k => result(k) >= 1.0)
      if (newlyCapped.nonEmpty) {
        capped = capped ++ newlyCapped
        remaining = math.max(0.0, targetRows.toDouble -
          capped.toSeq.map(counts(_).toDouble).sum)
        changed = true
      }
    }
    result
  }

  /**
   * Per-key document cap (C4-style domain balancing): keep at most
   * `maxPerKey` rows per key, chosen DETERMINISTICALLY by content-hash
   * order (md5 of `contentCol`; exact duplicates tie on the hash, so the
   * unique `idCol` breaks them totally) — an unbiased, reproducible
   * per-domain sample rather than "whichever rows arrived first".
   *
   * One window pass: the shuffle partitions by the cap key, so skew in
   * the capped dimension is bounded by the hottest key's row count;
   * for pathological hot keys pre-filter with [[hashSample]] to shed
   * volume before the window.
   */
  def capPerKey(df: DataFrame, keyCol: String, contentCol: String,
                idCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    // nulls LAST explicitly: Spark's ASC default is nulls-first, DuckDB's
    // is nulls-last — without this a null-content row would win the cap
    // in Spark and lose it in the oracle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(substring(md5(col(contentCol)), 1, 16).asc_nulls_last, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey)
      .drop("__rn")
  }

  /**
   * Keep the k BEST rows per key by `orderCol` (descending — quality
   * scores, token counts), ties broken on `idCol` ascending so the
   * selection is deterministic across engines and runs. Where
   * [[capPerKey]] caps with an unbiased random-order survivor set, this
   * is the curation move "best k documents per domain".
   *
   * One shuffle on the key + a per-group sort — the standard Spark
   * window shape. A key whose group outgrows a task's memory spills but
   * still sorts; if one key dominates the corpus, pre-aggregate with a
   * coarser score bucket or cap that key with [[capPerKey]] first.
   */
  def topPerKey(df: DataFrame, keyCol: String, orderCol: String,
                k: Int, idCol: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc_nulls_last, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Heap-based top-k per key — the custom-aggregate formulation of
   * [[topPerKey]] via [[graft.functions.TopKPairs]] (the repo's
   * bounded TypedImperativeAggregate): where the window form SORTS
   * every key's rows to keep k, this carries at most k `(score, id)`
   * entries per group through partial and final aggregation — a
   * 10⁹-row key ships k·partitions triples instead of sorting 10⁹
   * rows, the difference between a straggler and a non-event at
   * 100 TB. Returns `(keyCol, idCol, score)` rows (score = the cast
   * double of `orderCol`, 1-per-kept-id, NULL scores/ids skipped);
   * semi-join on the id to recover full rows — ranking triples and
   * re-joining is the scalable pattern, not ranking whole documents.
   * Row-for-row equal to [[topPerKey]]'s selection under the same
   * `(score desc, id asc)` total order (spec-proven, ties included).
   */
  def topPerKeyHeap(df: DataFrame, keyCol: String, orderCol: String,
                    k: Int, idCol: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.graftshim.CatalystBridge
    val agg = CatalystBridge.column(
      graft.functions.TopKPairs(
        CatalystBridge.expression(col(orderCol).cast("double")),
        CatalystBridge.expression(col(idCol).cast("long")), k)
        .toAggregateExpression())
    df.groupBy(col(keyCol))
      .agg(agg.as("__top"))
      .select(col(keyCol), explode(col("__top")).as("__e"))
      .select(col(keyCol), col("__e.id").as(idCol),
        col("__e.score").as("score"))
  }

  /**
   * Nucleus (top-p) selection per key — keep the MINIMAL highest-score
   * prefix carrying at least `p` of the key's total score MASS (not row
   * count): "the documents holding 90% of the quality mass", the
   * data-selection analogue of nucleus sampling (Holtzman et al. 2020).
   * The crossing row is included; ties resolve through the total
   * (score desc, id asc) order. Scores MUST be non-negative — negative
   * mass makes the cumulative share non-monotone and the "minimal
   * prefix" ill-defined (caller contract, same as any probability mass).
   *
   * Exactness: scores round to 6 dp and cumulate as DECIMAL, and the
   * keep predicate `mass-before < p·total` compares DECIMALs — no float
   * aggregation anywhere, so shuffle order and engine cannot move the
   * cut. Scale shape: one shuffle on the key, two window passes over the
   * same partitioning (running + total), same cost class as
   * [[topFraction]].
   */
  def topMassFraction(df: DataFrame, keyCol: String, idCol: String,
                      scoreCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, "p must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val s = round(col(scoreCol).cast("double"), 6).cast("decimal(24,6)")
    df.withColumn("__s", s)
      .withColumn("__cum", sum(col("__s")).over(w))
      .withColumn("__tot", sum(col("__s")).over(wAll))
      .filter(col("__cum") - col("__s") <
        col("__tot") * lit(p).cast("decimal(10,9)"))
      .drop("__s", "__cum", "__tot")
  }

  /**
   * Keep the top `frac` of each key's rows by `orderCol` (descending),
   * via `percent_rank <= frac` — the relative-threshold variant of
   * [[topPerKey]] ("top decile per language"), robust to groups of very
   * different sizes. percent_rank = (rank-1)/(n-1) is rank-based and
   * engine-portable (no float aggregation); a single-row group has
   * percent_rank 0 and is always kept, matching SQL semantics.
   */
  def topFraction(df: DataFrame, keyCol: String, orderCol: String,
                  frac: Double, idCol: String): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc_nulls_last, col(idCol).asc)
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") <= frac)
      .drop("__pr")
  }

  /**
   * Sample each key's documents up to a TOKEN budget, not a document
   * count — how pretraining mixtures are actually specified ("300 B
   * tokens of web, 50 B of code"). Documents are taken in deterministic
   * md5(id) order (unbiased w.r.t. content and insert order, identical
   * across engines/reruns); a document is kept iff the tokens BEFORE it
   * in that order leave budget open, so the budget may overshoot by at
   * most one document — the greedy rule every mixture script uses;
   * `sizeCol` is the per-document token count (precomputed, e.g.
   * `TextFunctions.tokenCount`). Keys missing from `budgets` are dropped.
   *
   * One window pass per the [[capPerKey]] shape: shuffle on the mixture
   * key, per-group sort, running DECIMAL-exact integer sum — no global
   * count, no RNG, no driver loop.
   */
  def tokenBudgetPerKey(df: DataFrame, keyCol: String, sizeCol: String,
                        idCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // literal map lookup: null for keys without a budget (→ dropped below)
    val budget = element_at(typedlit(budgets), col(keyCol))
    df.withColumn("__before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("__budget", budget)
      .filter(col("__budget").isNotNull && col("__before") < col("__budget"))
      .drop("__before", "__budget")
  }

  /**
   * Reproducible corpus shuffle — the "randomize training order, but the
   * same way every run" step before sharded export: a dense global
   * position by `md5(seed ‖ id)` (id tiebreak); different seeds give
   * independent permutations. No RNG state, no driver coordination.
   *
   * A bare global `row_number()` window would serialize the corpus
   * through ONE task, so positions are two-phase: rank within one of 256
   * hash-prefix buckets (the by-bucket window parallelizes), plus the
   * bucket's offset from a 256-row count aggregate that broadcasts back.
   * The composition equals the global rank because bucket prefix order
   * IS hash order.
   */
  /**
   * Per-key rate cap over tumbling event-time windows — keep at most
   * `maxPerWindow` events per key per window, FIRST-come by event time
   * (bot/abuse damping and per-source ingestion quotas). The window
   * bucket is integer microsecond division (engine-portable); ordering
   * within a bucket is (event time, `tieCol`) with a unique tiebreak,
   * so the kept set is deterministic under any shuffle order.
   *
   * Scale shape: one shuffle on (key, bucket) — finer than the key
   * alone, so a hot key's history spreads across buckets rather than
   * serializing through one partition.
   */
  def rateLimit(df: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, windowSeconds: Long,
                maxPerWindow: Int): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(maxPerWindow >= 1, "maxPerWindow must be >= 1")
    val bucket = expr(
      s"${graft.functions.TimeFunctions.epochMicrosSql(s"`$tsCol`")} " +
        s"div ${windowSeconds * 1000000L}")
    val w = Window.partitionBy(col(keyCol), bucket)
      .orderBy(graft.functions.TimeFunctions.epochMicros(col(tsCol)), col(tieCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerWindow)
      .drop("__rn")
  }

  /**
   * Deterministic negative-pair mining — contrastive training needs, for
   * every anchor row, `k` pseudo-random OTHER rows as negatives, the
   * same ones every run. True random sampling per anchor would need a
   * per-row RNG (order-dependent) or a cross join (quadratic); instead:
   * lay the corpus on the [[deterministicShuffle]] permutation (content-
   * independent, seed-keyed) and pair the anchor at position p with the
   * rows at `((p − 1 + i·stride) mod n) + 1`, `stride = max(n div
   * (k+1), 1)` — for n > k these offsets are distinct and never 0, so
   * each anchor gets k distinct non-self negatives, and because the
   * permutation is hash-ordered the strided picks are as good as random
   * with respect to any content attribute.
   *
   * Scale shape: n comes from a 1-row count that BROADCASTS (no
   * collect); the k-fold expansion is map-side (`explode(sequence)`);
   * the only shuffle is the position equi-join, whose key is dense and
   * skew-free by construction.
   */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
                    seed: String = "graft"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pos = deterministicShuffle(df.select(col(idCol)), idCol, seed)
    val nDf = pos.agg(count(lit(1)).as("__n"))
    pos.crossJoin(broadcast(nDf))
      .select(col(idCol).as("anchor_id"), col("pos"), col("__n"),
        explode(expr(s"sequence(1, $k)")).as("neg_idx"))
      .withColumn("neg_pos",
        pmod(col("pos") - 1 + col("neg_idx") * expr(s"greatest(__n div ${k + 1}, 1L)"),
          col("__n")) + 1)
      .join(pos.select(col("pos").as("neg_pos"), col(idCol).as("negative_id")),
        "neg_pos")
      // for n <= k the modular strides can wrap onto the anchor itself —
      // drop those rather than emit a degenerate self-pair
      .filter(col("anchor_id") =!= col("negative_id"))
      .select(col("anchor_id"), col("neg_idx"), col("negative_id"))
  }

  /**
   * HARD negative mining — the contrastive-training complement of
   * [[negativePairs]]: instead of random negatives, take each anchor's
   * highest-scoring retrieval candidates that are NOT known positives
   * (near-duplicates, paraphrases, labeled matches). `candidates` is
   * any ranked retrieval output (`Ann.bruteForceTopK` / `lshTopK` /
   * `Search.bm25TopK` — already top-k-per-anchor, so this pass is
   * bounded by k·|anchors| regardless of corpus size); `positives` is
   * the exclusion pair set. Output: `(anchor_id, neg_rank, neg_id,
   * score)` with ranks re-numbered 1..k after exclusion, ties broken
   * (score desc, id asc) as everywhere else.
   */
  def hardNegatives(candidates: DataFrame, queryCol: String, docCol: String,
                    scoreCol: String, positives: DataFrame,
                    posQueryCol: String, posDocCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pos = positives
      .select(col(posQueryCol).as("__pq"), col(posDocCol).as("__pd"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    candidates
      .join(pos, candidates(queryCol) === col("__pq") &&
        candidates(docCol) === col("__pd"), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col(queryCol).as("anchor_id"), col("neg_rank"),
        col(docCol).as("neg_id"), col(scoreCol).as("score"))
  }

  /**
   * 2-objective Pareto front (skyline): the rows NOT dominated in the
   * (maximize `xCol`, maximize `yCol`) sense — multi-objective data
   * selection without collapsing two signals into one weighted score
   * (quality vs diversity, length vs perplexity: any fixed weighting
   * silently buries one axis; the front is every defensible trade).
   * A row is dominated iff some other row is ≥ in both objectives and
   * > in at least one; exact duplicates of a front point all survive.
   *
   * Scale shape: objectives round to 6 dp and reduce to per-x cells
   * `(x, max y)` with map-side combine — the running-max walk runs
   * over that cell table through [[graft.plans.CumWalk]], so a
   * wide-range x objective (a corpus-sized cell table) stays
   * partition-parallel — and the front (≤ cell count, typically tiny:
   * it's a staircase) broadcasts back for the final membership join.
   * The corpus shuffles once by x-cell.
   */
  def paretoFront2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df
      .withColumn("__x", round(col(xCol).cast("double"), 6))
      .withColumn("__y", round(col(yCol).cast("double"), 6))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = pts.groupBy("__x").agg(max("__y").as("__my"))
    // strict-predecessor running max via CumWalk — the skyline walk
    // stays partition-parallel however wide the x-objective's range
    val front = graft.plans.CumWalk.walk(cells, "__x", asc = false,
        Seq(graft.plans.CumWalk.CumMax("__my", "__rm", inclusive = false)))
      .filter(col("__rm").isNull || col("__my") > col("__rm"))
      .select(col("__x"), col("__my").as("__y"))
    pts.join(broadcast(front), Seq("__x", "__y"))
      .drop("__x", "__y")
  }

  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: String = "graft"): DataFrame = {
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val keyed = df.withColumn("__h", h).withColumn("__b", substring(col("__h"), 1, 2))
    val offsets = keyed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        // bounded-window: fixed-fanout — 256 two-hex-char bucket offsets
        coalesce(sum("__n").over(org.apache.spark.sql.expressions.Window
          .orderBy("__b")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__b", "__offset")
    val wInBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col("__h").asc, col(idCol).asc)
    keyed.join(broadcast(offsets), "__b")
      .withColumn("pos", (col("__offset") + row_number().over(wInBucket)).cast("long"))
      .drop("__h", "__b", "__offset")
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ExpJ
   * keys, IPL 2006): each row draws an exponential clock
   * `key = −ln(u)/w` from a deterministic u ∈ (0,1] and the k SMALLEST
   * keys win — exactly the distribution of sequential weighted draws
   * without replacement, in one pass. Rows with non-positive weight are
   * excluded (they can never be drawn).
   *
   * u comes from the Knuth multiplicative hash of (id + seed) — pure
   * 64-bit integer arithmetic, reproducible across engines and runs
   * (same contract as [[hashSample]]'s md5 threshold: seeded
   * PSEUDO-randomness, chosen for engine portability; ids are already
   * hash-distributed after any upstream digest assignment). Keys round
   * to 9 dp BEFORE ordering, with the id as tiebreak, so the selected
   * set is identical across engines and partitionings.
   *
   * Scale shape: one projection + global top-k — Spark executes
   * orderBy+limit as TakeOrderedAndProject (per-partition heaps, k-row
   * merge on the driver), never a full sort.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = pmod((col(idCol) + lit(seed)) * lit(2654435761L), lit(2147483647L))
    val u = (h + lit(1)).cast("double") / lit(2147483648.0)
    df.filter(col(weightCol) > 0)
      .withColumn("samp_key",
        round(-log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("samp_key").asc, col(idCol).asc)
      .limit(k)
  }

  /**
   * [[weightedSample]] per stratum: the k smallest exponential-clock
   * keys WITHIN each key group — weighted sampling without replacement
   * from every stratum in one pass (per-language/per-source quota draws
   * where heavy documents should win proportionally to weight).
   *
   * Scale shape: one shuffle on the stratum + per-group top-k via
   * row_number (rank ≤ k prunes inside the window stage); the window
   * sorts each group once — the [[topPerKey]] shape.
   */
  def weightedSamplePerKey(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, k: Int,
                           seed: Long = 0L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = pmod((col(idCol) + lit(seed)) * lit(2654435761L), lit(2147483647L))
    val u = (h + lit(1)).cast("double") / lit(2147483648.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("samp_key").asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("samp_key",
        round(-log(u) / col(weightCol).cast("double"), 9))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Curriculum ordering — the easy-to-hard training schedule: rows land
   * in a difficulty `stage` by ascending score `edges` (stage 0 =
   * score ≤ edges(0), …, stage #edges = above the last edge), and get a
   * deterministic within-stage shuffle position `pos` (1-based). The
   * training consumer reads (stage, pos) lexicographically: stages in
   * order, each stage internally shuffled — curriculum without
   * correlated batches inside a stage.
   *
   * The shuffle order is the md5 of `seed:id` (engine-portable, same
   * idiom as [[capPerKey]]/[[deterministicShuffle]]); positions come
   * from the bucketed-offset construction of [[deterministicShuffle]]
   * (256 md5-prefix buckets per stage, broadcast cumulative offsets),
   * so no stage ever sorts through a single partition: `pos` equals
   * row_number within the stage ordered by (hash, id), computed with
   * per-(stage, bucket) parallelism.
   */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
                 edges: Seq[Double], seed: String = "graft"): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be ascending and distinct")
    val stage = edges.zipWithIndex.reverse.foldLeft(
      lit(edges.size): org.apache.spark.sql.Column) { case (acc, (e, i)) =>
      when(col(scoreCol) <= e, lit(i)).otherwise(acc)
    }
    val keyed = df.withColumn("stage", stage.cast("int"))
      .withColumn("__h", md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val offsets = keyed.groupBy("stage", "__b").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum("__n").over(org.apache.spark.sql.expressions.Window
          .partitionBy("stage").orderBy("__b")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("stage", "__b", "__offset")
    val wInBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("stage", "__b").orderBy(col("__h").asc, col(idCol).asc)
    keyed.join(broadcast(offsets), Seq("stage", "__b"))
      .withColumn("pos", (col("__offset") + row_number().over(wInBucket)).cast("long"))
      // the USING join fronts its keys; restore input order + (stage, pos)
      .select(df.columns.map(col) :+ col("stage") :+ col("pos"): _*)
  }
}
