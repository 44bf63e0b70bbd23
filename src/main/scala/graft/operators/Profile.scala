package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * One-pass column profiling — the engine-side version of the stats a
 * wrangling UI shows per column (row/null/distinct counts, value range):
 * every statistic for every column is computed in a SINGLE aggregation
 * over one scan (a wide `agg(...)` — partial aggregation map-side, one
 * tiny final row), then unpivoted driver-side into one row per column.
 * Profiling a 100 TB table costs exactly one scan, no shuffle of data
 * rows (the single-row exchange is bytes).
 *
 * `exactDistinct = false` (default) uses HyperLogLog++
 * (approx_count_distinct, ~2% error) — exact COUNT(DISTINCT) over many
 * columns at once forces either expand (rows × columns blowup) or
 * per-column passes; the sketch keeps the one-scan property. Flip it for
 * small/audit tables where the oracle needs exact counts.
 */
object Profile {

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    def statsFor(f: StructField): Seq[Column] = {
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__rows"),
        count(lit(1)).minus(count(c)).as(s"${f.name}__nulls"),
        (if (exactDistinct) countDistinct(c) else approx_count_distinct(c))
          .as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    val wide = df.agg(statsFor(cols.head).head,
      (statsFor(cols.head).tail ++ cols.tail.flatMap(statsFor)): _*)
    val row = wide.head()
    val spark = df.sparkSession
    val out = cols.toIndexedSeq.map { f =>
      (f.name,
        row.getAs[Long](s"${f.name}__rows"),
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        Option(row.getAs[String](s"${f.name}__min")).orNull,
        Option(row.getAs[String](s"${f.name}__max")).orNull)
    }
    spark.createDataFrame(out)
      .toDF("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /**
   * Fixed-width histogram of a numeric column over [lo, hi): bucket i
   * covers [lo + i·w, lo + (i+1)·w) with w = (hi − lo) / nBins; values
   * at or beyond `hi` clamp into the last bucket (so `hi` = max is
   * safe), values below `lo` into the first. NULLs drop. Output is one
   * row per NON-EMPTY bucket (bucket, lo_edge, count) — a groupBy on the
   * bucket id, so the cost is one scan + a tiny aggregate regardless of
   * table size; empty buckets are the reader's `generate_series` join,
   * not a 100-TB scan's job to materialize.
   *
   * Bounds are explicit, not discovered: a min/max pre-pass would double
   * the scans, and curation dashboards bin on known domains (score in
   * [0,1], tokens in [0, 8k]). Pair with [[profile]] when bounds are
   * genuinely unknown. Binning is plain floor arithmetic on doubles —
   * identical across engines (the oracle states the same expression).
   */
  /**
   * Top-k most frequent values of one column — the categorical half of
   * profiling (histogram covers numerics): `(value, n, rank)` ranked by
   * count DESC with a value-ASC tiebreak so the cut is deterministic;
   * NULL counts as a real value (its frequency is usually the finding).
   * One map-side-combined count + TakeOrderedAndProject — never a full
   * sort of the domain.
   */
  def topValues(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.groupBy(col(colName).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc_nulls_last)
      .limit(k)
      .withColumn("rank",
        // bounded-window: topk — re-ranks the limit(k) result
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("value").asc_nulls_last)).cast("long"))
  }

  def histogram(df: DataFrame, colName: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    require(hi > lo, "hi must exceed lo")
    val w = (hi - lo) / nBins
    val bucket = least(
      greatest(floor((col(colName).cast("double") - lit(lo)) / lit(w)), lit(0L)),
      lit(nBins - 1L))
    // NaN would otherwise land in bucket 0 (floor(NaN).toLong == 0 slips
    // through the clamp) and the engines disagree on NaN casts — drop it
    // with the NULLs
    df.where(col(colName).isNotNull && !isnan(col(colName).cast("double")))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", lit(lo) + col("bucket") * lit(w))
      .select("bucket", "lo_edge", "n")
  }

  /**
   * Exact discrete quantiles per key: for each p, the value at rank
   * ⌈p·n⌉ of the key's sorted non-null values — "p95 document length
   * per language" for curation cutoffs. Discrete (an actual data value,
   * no interpolation) because interpolation formulas differ across
   * engines by a ulp ((1−g)a+gb vs a+(b−a)g) and would break exact
   * parity; the rank itself is computed as ceil(round(p·n, 9)) so
   * double rounding in the product can't bump the rank either.
   *
   * The frame is compressed to per-(key, value) COUNTS before any
   * window: the groupBy map-side-combines rows down to distinct values,
   * and the cumulative-count window then ranks the compressed multiset
   * — the value at rank r is the first whose cumulative count reaches
   * r, identical to ranking raw rows. This matters precisely when a
   * caller wants GLOBAL quantiles (constant key): Catalyst folds the
   * constant partition key away and the window runs single-partition,
   * so what flows through it must be distinct values, not the corpus.
   * A truly continuous value domain (distinct ≈ rows) at extreme scale
   * should use [[quantileSketch]] — that trade-off is the sketch's
   * whole reason to exist.
   *
   * One pass computes every requested p (the p list is exploded against
   * each compressed row, then filtered to rank-interval hits): a single
   * shuffle on the key regardless of |ps|.
   */
  def quantiles(df: DataFrame, keyCol: String, valueCol: String,
                ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "each p must be in (0, 1]")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(valueCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(col(keyCol), col(valueCol), col("__c"), col("__cum"), col("__n"),
        explode(array(ps.map(lit): _*)).as("p"))
      // round before ceil: p·n in IEEE double can land a hair ABOVE the
      // exact product (0.07 × 100 = 7.000000000000001 → ceil 8, wrong
      // rank), while the DuckDB oracle multiplies exact decimals; 9
      // digits restores exactness for any p stated to ≤9 decimals
      .withColumn("__r", ceil(round(col("p") * col("__n"), 9)).cast("long"))
      // the value spanning ranks (cum−c, cum] holds rank r
      .where(col("__cum") - col("__c") < col("__r") && col("__r") <= col("__cum"))
      .select(col(keyCol), col("p"), col(valueCol).as("value"))
  }

  /**
   * Sketch-accuracy harness for per-key cardinality: exact
   * COUNT(DISTINCT) side by side with the HyperLogLog++ estimate and a
   * `within_tol` verdict. The same exact-twin pattern as
   * minhash exact/estimate: the EXACT column is the oracle contract,
   * the sketch is the 100 TB path (one scan, bounded-memory registers,
   * no expand), and the verdict pins the estimate to the exact value on
   * every run. Exact distinct shuffles the (key, value-digest) pairs
   * once; the sketch never shuffles values at all.
   */
  /**
   * Gini coefficient of a weight's concentration across groups — the
   * mixture-inequality audit ("how lopsided is my corpus across
   * sources/languages?"): 0 = perfectly even shares, → 1 = one group
   * holds everything. Computed over per-group totals with the sorted-
   * share identity G = (2·Σ rᵢtᵢ)/(n·Σt) − (n+1)/n, ranks ascending by
   * (total, key) — rank ties on equal totals don't move Σ rᵢtᵢ, so the
   * tie-break only pins determinism. One row: `(n_groups, total,
   * gini)`; NULL gini when the total weight is 0 or there's one group.
   *
   * Determinism: totals and rank products are exact — integral weight
   * columns accumulate as longs; fractional ones (double scores,
   * token-fraction mass) as DECIMAL(30,6), never silently truncated —
   * and DECIMAL-widened so rank·total cannot overflow. The two
   * divisions are fixed-shape doubles rounded at 6 dp. Scale shape: one
   * map-side-combining aggregate to |groups| rows, then a single
   * |groups|-sized window — the corpus crosses the wire once as group
   * partials.
   */
  def giniConcentration(df: DataFrame, keyCol: String,
                        weightCol: String): DataFrame = {
    val integral = df.schema(df.schema.fieldIndex(weightCol)).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val wExpr = if (integral) col(weightCol).cast("long")
                else col(weightCol).cast("decimal(30,6)")
    val totals = df
      .groupBy(col(keyCol).as("k"))
      .agg(sum(wExpr).as("t"))
    // bounded-window: key-domain — concentration ranks the declared grouping dimension (scaladoc above)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").asc, col("k").asc)
    totals
      .withColumn("r", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("t")).as("total"),
        sum(col("r").cast("decimal(38,0)") * col("t")).as("__rt"))
      .select(col("n_groups"), col("total"),
        when(col("total") <= 0 || col("n_groups") < 2,
          lit(null).cast("double"))
          .otherwise(round(
            lit(2.0) * col("__rt").cast("double") /
              (col("n_groups").cast("double") * col("total").cast("double")) -
              (col("n_groups").cast("double") + lit(1.0)) /
                col("n_groups").cast("double"), 6))
          .as("gini"))
  }

  def cardinalitySketch(df: DataFrame, keyCol: String, valueCol: String,
                        rsd: Double = 0.05,
                        tolerance: Double = 0.1): DataFrame =
    df.groupBy(col(keyCol)).agg(
        countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("n_approx"))
      .select(col(keyCol), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * lit(tolerance)).as("within_tol"))

  /**
   * Sketch-accuracy harness for per-key quantiles: the exact
   * rank-statistic quantile ([[quantiles]]) joined with
   * `approx_percentile` (Greenwald–Khanna) and a relative-error
   * verdict. GK guarantees rank error ≤ n/accuracy, so at any n the
   * returned element's rank is provably close; the verdict additionally
   * pins the VALUE within `tolerance` of exact on this corpus.
   */
  def quantileSketch(df: DataFrame, keyCol: String, valueCol: String,
                     ps: Seq[Double], accuracy: Int = 10000,
                     tolerance: Double = 0.1): DataFrame = {
    val exact = quantiles(df, keyCol, valueCol, ps)
    val approx = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol)).agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("__qs"))
      .select(col(keyCol).as("__k"),
        posexplode(col("__qs")).as(Seq("__i", "__approx")))
      .select(col("__k"),
        element_at(array(ps.map(lit): _*), col("__i") + 1).as("__p"),
        col("__approx"))
    // null-safe key match: NULL is a legal profiling key (a real level,
    // same rule as Drift), and === would silently drop its group
    exact.join(approx,
        exact(keyCol) <=> col("__k") && exact("p") === col("__p"))
      .select(exact(keyCol), col("p"), col("value"),
        (abs(col("__approx").cast("double") - col("value").cast("double")) <=
          abs(col("value").cast("double")) * lit(tolerance)).as("within_tol"))
  }

  /**
   * Exact heavy hitters (values with frequency strictly > n/k) via the
   * two-phase sketch-then-confirm pattern production systems actually
   * run: a per-partition Misra–Gries summary (k counters, O(k) memory,
   * one pass, no shuffle) nominates candidates, and an exact count
   * restricted to the candidate set confirms. Correctness is a
   * pigeonhole argument, not a heuristic: a value with global frequency
   * > n/k must exceed n_p/k in at least one partition p (else summing
   * the per-partition bounds caps the global at n/k), and k-counter
   * Misra–Gries retains every value with partition frequency
   * > n_p/(k+1) ⊇ > n_p/k — so the candidate union contains every true
   * heavy hitter, and the confirm's exact counts + threshold filter
   * leave exactly the true set with exact counts. Deterministic output
   * (the sketch's order-dependence only affects which EXTRA candidates
   * get nominated, and the confirm discards those), which is what makes
   * the gate oracle-expressible as plain GROUP BY ... HAVING.
   *
   * Scale shape: the sketch pass is mapPartitions with a k-entry map —
   * no shuffle, no driver state; candidates are ≤ partitions × k rows,
   * broadcast into the confirm's pre-aggregation filter, so the count
   * shuffle carries candidate values only (≤ k distinct keys survive
   * the filter's groupBy map-side combine, vs the full value domain for
   * a naive global count). n rides along as a broadcast 1-row frame
   * (the BM25 stats pattern), never a driver collect. NULLs are
   * excluded (their count is [[profile]]'s job; a null key would also
   * silently vanish from the confirm's equi-join).
   */
  def heavyHitters(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(colName).cast("string").as("value"))
      .where(col("value").isNotNull)
    val cands = vals.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        if (m.contains(v)) m(v) += 1L
        else if (m.size < k) m(v) = 1L
        else {
          m.mapValuesInPlace((_, c) => c - 1L)
          m.filterInPlace((_, c) => c > 0L)
        }
      }
      m.keysIterator
    }.toDF("value").distinct()
    val total = vals.agg(count(lit(1)).as("__n"))
    vals.join(broadcast(cands), "value")
      .groupBy("value").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") * lit(k) > col("__n"))
      .select(col("value"), col("n"))
  }

  /**
   * Per-key winsorization — clip values to their key's exact
   * [pLo, pHi] quantile band (the standard tail-taming step before
   * feature scaling or reward normalization). Bounds are [[quantiles]]'
   * rank statistics (actual data values, engine-exact), so the clipped
   * output is deterministic — no interpolated float thresholds. NULL
   * values pass through as NULL and never count as clipped.
   *
   * Scale shape: the bounds frame is one row per key (pivoted from the
   * quantile output) and joins back in a single key-shuffle; with few
   * keys AQE broadcasts it.
   */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0 && pLo < pHi && pHi <= 1.0, "need 0 < pLo < pHi <= 1")
    val bounds = quantiles(df, keyCol, valueCol, Seq(pLo, pHi))
      .groupBy(col(keyCol)).agg(
        min(when(col("p") === pLo, col("value"))).as("__lo"),
        max(when(col("p") === pHi, col("value"))).as("__hi"))
    val v = col(valueCol)
    df.join(bounds, Seq(keyCol), "left")
      // explicit NULL guard: greatest/least NULL-skipping would otherwise
      // "clip" a NULL value up to the lower bound
      .withColumn("value_clipped",
        when(v.isNull, lit(null))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .withColumn("was_clipped",
        coalesce(v < col("__lo") || v > col("__hi"), lit(false)))
      .drop("__lo", "__hi")
  }

  /**
   * Per-key z-score outlier flags — the monitoring primitive ("which
   * events are >3σ from their user's norm"). Naive mean/std via
   * `avg`/`stddev` over doubles is shuffle-order-dependent (FP addition
   * isn't associative); here both moments come from EXACT decimal sums
   * (Σv and Σv² as DECIMAL — associative, order-independent), cast to
   * double only for the final mean/variance/sqrt arithmetic, which is
   * then a pure function of exact inputs — deterministic on any engine
   * (IEEE division and sqrt are correctly rounded). Population variance
   * (÷ n); z is NULL when σ = 0 or n = 1 (no dispersion to score
   * against — those keys have no outliers by definition).
   *
   * Scale shape: one map-side-combined aggregate per key joined back to
   * the rows (two key-shuffles, no window), so a huge key costs its row
   * share, never a single-task sort.
   */
  def zscoreFlags(df: DataFrame, keyCol: String, valueCol: String,
                  threshold: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val stats = df.groupBy(col(keyCol)).agg(
        count(v).as("__n"),
        sum(v).as("__s"),
        sum(v * v).as("__ss"))
      .select(col(keyCol), col("__n"),
        (col("__s").cast("double") / col("__n")).as("__mean"),
        // clamp at 0 BEFORE sqrt: FP cancellation can leave a tiny
        // negative where true variance is 0, and sqrt(neg) = NaN whose
        // comparison semantics differ across engines
        sqrt(greatest((col("__ss").cast("double") -
          col("__s").cast("double") * col("__s").cast("double") / col("__n")) /
          col("__n"), lit(0.0))).as("__std"))
    df.join(stats, Seq(keyCol))
      .withColumn("z", when(col("__std") > 0,
        round((col(valueCol).cast("double") - col("__mean")) / col("__std"), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("z")) > lit(threshold), lit(false)))
      .drop("__n", "__mean", "__std")
  }

  /**
   * Percent-rank normalization within each key group — maps
   * heterogeneous score scales (per-domain quality, per-language
   * perplexity) onto [0,1] so they mix comparably: SQL `percent_rank`
   * = (rank−1)/(n−1), ties share a rank (equal values get equal
   * percentiles — adding a tiebreak would instead rank equal evidence
   * unequally), single-row groups map to 0. The division is
   * small-integer IEEE — identical across engines and partitionings.
   *
   * Scale shape: one exchange on the key + per-group sort (rank needs
   * order); the output adds one column, nothing materializes per group.
   */
  def rankNormalize(df: DataFrame, keyCol: String, idCol: String,
                    valueCol: String): DataFrame =
    df.select(col(idCol), col(keyCol), col(valueCol))
      .withColumn("pct_rank", round(percent_rank().over(
        Window.partitionBy(col(keyCol)).orderBy(col(valueCol))), 6))

  /**
   * Join-key overlap audit — the numbers to read BEFORE running a join:
   * how the two key sets intersect and what fraction of each side's
   * ROWS would find a partner. One row:
   * `(n_left_keys, n_right_keys, n_shared_keys, key_jaccard,
   *   left_key_containment, right_key_containment,
   *   n_left_rows, left_rows_matched, n_right_rows, right_rows_matched,
   *   max_fanout)` — `*_containment` = shared/|side| over DISTINCT keys,
   * `*_rows_matched` the row counts that survive an inner join's semi
   * filter, and `max_fanout` the largest per-key row-count product (the
   * worst-case output amplification a single hot key causes — the
   * number that predicts join skew). NULL keys never match (SQL join
   * semantics) and are excluded from key counts.
   *
   * Scale shape: each side collapses to per-key counts first (map-side
   * combine, key+long on the wire), then ONE full-outer join of the two
   * key-count tables and a global 1-row reduce. Strictly cheaper than
   * the join being audited; no row data moves. Fractions are exact-long
   * divisions rounded to 6 dp.
   */
  /**
   * Shannon entropy per column — the information-content profile that
   * separates near-constant columns (entropy ≈ 0, candidates for
   * dictionary encoding or dropping) from identifier-like ones
   * (entropy ≈ log2 n). One row per requested column:
   * `(column, n, n_distinct, entropy)`, entropy in bits over the
   * column's value distribution, NULL counted as a real value (SQL
   * GROUP BY semantics — absence is information too).
   *
   * FP determinism: each value's −p·log2(p) contribution is an
   * int/int-derived double rounded to 9 dp, summed as DECIMAL(20,9)
   * (associative — partitioning can't move the hash), final round to
   * 6 dp — the [[Drift]] policy.
   *
   * Scale shape: values stack into (column, value-string) pairs in the
   * scan projection, then ONE map-side-combined aggregate keyed by
   * (column, value) and a #columns-sized reduce. Cost ≈ one groupBy
   * over k·n rows; high-cardinality columns dominate by their distinct
   * count, exactly like the equivalent COUNT DISTINCT.
   */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.column").as("column"), col("s.v").as("v"))
    val counts = pairs.groupBy("column", "v").agg(count(lit(1)).as("c"))
    // per-column totals are #columns rows — broadcast back instead of
    // sorting each column's whole distinct set through one window
    // partition
    val totals = counts.groupBy("column")
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
    // bits via natural logs and a LITERAL 1/ln2 factor — the oracle SQL
    // interpolates the same literal, so both engines run the identical
    // IEEE expression (a built-in log2 may differ in the last ulp)
    counts.join(broadcast(totals), "column")
      .withColumn("term", round(
        (col("c").cast("double") / col("n")) *
          (log(col("n")) - log(col("c"))) / lit(math.log(2.0)), 9))
      .groupBy("column")
      .agg(max("n").as("n"),
        max("n_distinct").as("n_distinct"),
        round(sum(col("term").cast("decimal(20,9)")).cast("double"), 6)
          .as("entropy"))
  }

  /**
   * Approximate functional-dependency audit: for each candidate pair
   * A → B, the g3-style violation count — the minimum number of rows
   * to delete so A determines B exactly (Σ over A-groups of
   * group size − most-common-B count). `strength` = 1 − violations/n:
   * 1.0 is an exact FD, near-1 a almost-FD worth normalizing around,
   * near-0 independence. One row per pair: `(determinant, dependent,
   * n_rows, n_groups, n_violations, strength)`. NULLs group as values
   * on both sides.
   *
   * Scale shape: per pair, one aggregate keyed by (A, B) then one by A
   * (both map-side combined; the second input is |A×B distinct|, not
   * corpus rows) and a 1-row reduce. Exact integer arithmetic
   * throughout; the single division rounds to 6 dp. Pairs evaluate
   * independently (a pair per requested dependency — audit-sized
   * inputs, not a mining loop over all column pairs).
   */
  def functionalDeps(df: DataFrame,
                     pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (determinant, dependent) pair")
    pairs.map { case (a, b) =>
      df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("__a")
        .agg(sum("__c").as("__rows"), max("__c").as("__keep"))
        .agg(sum("__rows").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(col("__rows") - col("__keep")).as("n_violations"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"), col("n_rows"),
          col("n_groups"), col("n_violations"),
          round(lit(1.0) - col("n_violations").cast("double") /
            col("n_rows"), 6).as("strength"))
    }.reduce(_ unionByName _)
  }

  /**
   * Benford's-law audit of a numeric column — the fabrication/anomaly
   * screen for "organically grown" quantities (transaction amounts,
   * populations, file sizes): their leading significant digits follow
   * P(d) = log10(1 + 1/d), and systematic deviation flags synthetic or
   * truncated data. One row per digit 1–9:
   * `(digit, n, share, benford_p, deviation)` with `share` the observed
   * fraction and `deviation` = share − benford_p (both 6 dp).
   *
   * The leading digit is extracted from the DECIMAL(18,2) rendering
   * (first [1-9] character) — decimal stringification is canonical
   * across engines, unlike double formatting (scientific notation), and
   * avoids `floor(log10 x)` whose IEEE value can sit a hair below an
   * integer at powers of ten. Zero/NULL values carry no leading digit
   * and are excluded. Expected shares are Scala-computed literals, so
   * both engines compare against identical doubles.
   *
   * Scale shape: one projection + one 9-group map-side-combined
   * aggregate + a broadcast of the 1-row total. Digits with zero
   * observations still appear (the report is the full support).
   */
  def benford(df: DataFrame, colName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digit = regexp_extract(
      abs(col(colName).cast("decimal(18,2)")).cast("string"), "[1-9]", 0)
    val observed = df.select(digit.as("digit"))
      .filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val support = (1 to 9)
      .map(d => (d.toString, math.log10(1.0 + 1.0 / d))).toDF("digit", "benford_p")
    val total = observed.agg(coalesce(sum("n"), lit(0L)).as("__total"))
    support.join(observed, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") / col("__total"), 6)
          .as("share"),
        round(col("benford_p"), 6).as("benford_p"))
      .withColumn("deviation", round(col("share") - col("benford_p"), 6))
  }

  /**
   * One-row dataset card — the headline numbers a corpus release ships
   * with: `(n_docs, n_langs, n_sources, total_chars, total_tokens,
   * avg_doc_tokens, dup_docs, dup_doc_frac)`. `dup_docs` counts rows
   * beyond each exact-content group's first (what
   * [[Dedup.exactDedup]] would remove); averages are single divisions
   * of exact longs rounded to 6 dp.
   *
   * Scale shape: one global aggregate over the scan (counts, lengths,
   * native token counts, two exact distincts over small-domain
   * columns) plus one digest-keyed aggregate for the dup mass, crossed
   * as 1-row frames. Strictly two passes, no row data shuffles beyond
   * the 32-byte digests.
   */
  def datasetCard(df: DataFrame, idCol: String, textCol: String,
                  langCol: String, sourceCol: String): DataFrame = {
    val base = df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L))
        .as("total_chars"),
      coalesce(sum(graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long")), lit(0L)).as("total_tokens"))
    val dup = df.groupBy(md5(col(textCol)).as("__digest"))
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - lit(1)), lit(0L)).as("dup_docs"))
    base.crossJoin(broadcast(dup))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"), col("total_tokens"),
        round(col("total_tokens").cast("double") / col("n_docs"), 6)
          .as("avg_doc_tokens"),
        col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs"), 6)
          .as("dup_doc_frac"))
  }

  /**
   * Robust outlier flags via median/MAD — [[zscoreFlags]]'s
   * non-parametric sibling: `rz = (x − median) / (1.4826 · MAD)`
   * (the 1.4826 factor makes MAD consistent with σ under normality),
   * immune to the outliers themselves inflating the spread — the
   * standard choice when the contamination is heavy enough to mask
   * itself from a mean/σ z-score. Output = input + `rz` (6 dp, NULL
   * when MAD = 0 — degenerate spread flags nothing, like the σ = 0
   * case of zscoreFlags) + `is_outlier`.
   *
   * Both medians are EXACT (the [[quantiles]] rank-at-⌈n/2⌉ machinery,
   * not an approximate percentile), so the flags are deterministic and
   * oracle-checkable. Scale shape: two key-partitioned count-compressed
   * quantile passes (each shuffles (key, value) counts, not rows) and
   * two key joins back onto the data.
   */
  def madFlags(df: DataFrame, keyCol: String, valueCol: String,
               threshold: Double = 3.5): DataFrame = {
    val med = quantiles(df, keyCol, valueCol, Seq(0.5))
      .select(col(keyCol), col("value").cast("double").as("__med"))
    val withMed = df.join(med, Seq(keyCol))
    val mad = quantiles(
      withMed.withColumn("__dev",
        abs(col(valueCol).cast("double") - col("__med"))),
      keyCol, "__dev", Seq(0.5))
      .select(col(keyCol), col("value").as("__mad"))
    withMed.join(mad, Seq(keyCol))
      .withColumn("rz", when(col("__mad") > 0,
        round((col(valueCol).cast("double") - col("__med")) /
          (lit(1.4826) * col("__mad")), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("rz")) > lit(threshold), lit(false)))
      .drop("__med", "__mad")
  }

  def keyOverlap(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String): DataFrame = {
    val lk = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__nl"))
    val rk = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__nr"))
    lk.join(rk, Seq("__k"), "full_outer")
      .agg(
        count(col("__nl")).as("n_left_keys"),
        count(col("__nr")).as("n_right_keys"),
        count(when(col("__nl").isNotNull && col("__nr").isNotNull, 1))
          .as("n_shared_keys"),
        coalesce(sum(col("__nl")), lit(0L)).as("n_left_rows"),
        coalesce(sum(when(col("__nr").isNotNull, col("__nl"))), lit(0L))
          .as("left_rows_matched"),
        coalesce(sum(col("__nr")), lit(0L)).as("n_right_rows"),
        coalesce(sum(when(col("__nl").isNotNull, col("__nr"))), lit(0L))
          .as("right_rows_matched"),
        coalesce(max(col("__nl") * col("__nr")), lit(0L)).as("max_fanout"))
      .select(col("n_left_keys"), col("n_right_keys"), col("n_shared_keys"),
        round(col("n_shared_keys").cast("double") /
          (col("n_left_keys") + col("n_right_keys") - col("n_shared_keys")), 6)
          .as("key_jaccard"),
        round(col("n_shared_keys").cast("double") / col("n_left_keys"), 6)
          .as("left_key_containment"),
        round(col("n_shared_keys").cast("double") / col("n_right_keys"), 6)
          .as("right_key_containment"),
        col("n_left_rows"), col("left_rows_matched"),
        col("n_right_rows"), col("right_rows_matched"), col("max_fanout"))
  }

  /**
   * Mutual information between two categorical columns (nats), with
   * marginal entropies and the √-normalized NMI — the dependence audit
   * behind split/leakage decisions ("does `source` predict `label`?
   * then don't split by row") and feature triage, where
   * [[functionalDeps]] only catches the deterministic extreme. NULLs
   * count as a real level on both sides. One row:
   * `(n, h_a, h_b, mi, nmi)`; NMI = MI/√(H_a·H_b), NULL when either
   * entropy is 0 (a constant column carries no information to
   * normalize by).
   *
   * Scale shape: ONE map-side-combining reduce to |A|·|B| joint cells;
   * marginals re-aggregate the cell table. Each plogp term rounds to
   * 9 dp and accumulates in DECIMAL (order-free); divisions are single
   * fixed-shape ops rounded to 6 dp.
   */
  def mutualInformation(df: DataFrame, colA: String,
                        colB: String): DataFrame = {
    val cells = df
      .select(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val n = cells.agg(sum("c").as("n"))
    val ma = cells.groupBy("a").agg(sum("c").as("na"))
    val mb = cells.groupBy("b").agg(sum("c").as("nb"))
    val dec = "decimal(20,9)"
    def entropy(m: DataFrame, cnt: String) = m.crossJoin(n)
      .agg(sum(round(-(col(cnt).cast("double") / col("n")) *
        log(col(cnt).cast("double") / col("n")), 9).cast(dec)).as("h"))
    val ha = entropy(ma, "na").withColumnRenamed("h", "__ha")
    val hb = entropy(mb, "nb").withColumnRenamed("h", "__hb")
    // null-SAFE joins (<=>): the NULL level is a real row in `cells`
    // and in both marginals — an equi-join would silently drop its
    // joint terms while still counting it in n and the entropies
    val joint = cells
      .join(ma.withColumnRenamed("a", "__ka"), col("a") <=> col("__ka"))
      .join(mb.withColumnRenamed("b", "__kb"), col("b") <=> col("__kb"))
      .crossJoin(n)
      .agg(sum(round((col("c").cast("double") / col("n")) *
        log((col("c").cast("double") * col("n")) /
          (col("na").cast("double") * col("nb"))), 9).cast(dec))
        .as("__mi"))
    n.crossJoin(ha).crossJoin(hb).crossJoin(joint)
      .select(col("n"),
        round(col("__ha").cast("double"), 6).as("h_a"),
        round(col("__hb").cast("double"), 6).as("h_b"),
        round(col("__mi").cast("double"), 6).as("mi"),
        when(col("__ha") > 0 && col("__hb") > 0,
          round(col("__mi").cast("double") /
            sqrt(col("__ha").cast("double") * col("__hb").cast("double")), 6))
          .as("nmi"))
  }

  /**
   * Per-dimension embedding health audit: `(dim, n, mean, variance,
   * min_val, max_val)` for each coordinate (1-based). The two failure
   * modes this catches before any ANN/semantic-dedup run: DEAD
   * dimensions (variance ≈ 0 — wasted index bits, and a symptom of a
   * truncated or mis-exported model) and DOMINANT/offset dimensions
   * (|mean| ≫ 0 — anisotropy that makes raw cosine cluster everything
   * together; the "all embeddings look similar" bug). Read it next to
   * [[giniConcentration]]: a healthy space has near-zero means and
   * same-order variances across dims.
   *
   * Scale shape: one posexplode keyed by dim — the shuffle carries
   * (dim, partial-sum) cells with map-side combine, d cells total.
   * Determinism: values round to 9 dp, accumulate as DECIMAL (order-
   * free), the mean/E[x²] divisions are single double ops rounded to
   * 9 dp, variance = E[x²] − mean² rounded to 6.
   */
  def embeddingDimStats(df: DataFrame, vecCol: String): DataFrame = {
    val d = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "__x")))
      .select((col("pos") + 1).cast("int").as("dim"),
        round(col("__x"), 9).as("x"))
    val dec = "decimal(28,9)"
    d.groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("__s"),
        sum(round(col("x") * col("x"), 9).cast(dec)).as("__s2"),
        min(col("x")).as("min_val"),
        max(col("x")).as("max_val"))
      .select(col("dim"), col("n"),
        round(col("__s").cast("double") / col("n"), 9).as("__m"),
        round(col("__s2").cast("double") / col("n"), 9).as("__e2"),
        col("min_val"), col("max_val"))
      .select(col("dim"), col("n"),
        round(col("__m"), 6).as("mean"),
        round(col("__e2") - col("__m") * col("__m"), 6).as("variance"),
        col("min_val"), col("max_val"))
  }

  /**
   * Pairwise Pearson correlation audit over numeric columns:
   * `(col_a, col_b, n, corr)` for every unordered pair — the standard
   * profiling matrix ("is discount just a function of price?") that
   * flags redundant features and surprising couplings before they leak
   * into a model. Pairwise-complete semantics: each pair's moments use
   * only rows where BOTH columns are non-null.
   *
   * Determinism: inputs snap to DECIMAL(18,2) and all six moments per
   * pair (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT decimal sums (the
   * [[zscoreFlags]] recipe) — associative, partition-order
   * independent; the final Pearson arithmetic is a pure double
   * function of exact inputs (÷ and √ are IEEE-correctly-rounded).
   * `corr` is NULL when either side has no dispersion or n < 2.
   *
   * Scale shape: ONE map-side-combined full aggregate produces all
   * pairs' moments (k(k−1)/2 · 6 cells — a single 1-row frame for the
   * handful of columns an audit targets); the matrix then unpivots in
   * a pure projection. One corpus pass total, no joins, no shuffle
   * beyond the scalar reduce.
   */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def d(c: String) = col(c).cast("decimal(18,2)")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val both = d(a).isNotNull && d(b).isNotNull
      def s(e: Column, name: String) =
        sum(when(both, e)).as(s"__${name}_$k")
      Seq(count(when(both, lit(1))).as(s"__n_$k"),
        s(d(a), "sx"), s(d(b), "sy"), s(d(a) * d(b), "sxy"),
        s(d(a) * d(a), "sxx"), s(d(b) * d(b), "syy"))
    }
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), k) =>
      val n = col(s"__n_$k").cast("double")
      def g(p: String) = col(s"__${p}_$k").cast("double")
      val num = n * g("sxy") - g("sx") * g("sy")
      val den = sqrt(n * g("sxx") - g("sx") * g("sx")) *
        sqrt(n * g("syy") - g("sy") * g("sy"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$k").as("n"),
        when(den === 0.0 || n < 2.0, lit(null).cast("double"))
          .otherwise(round(num / den, 6)).as("corr"))
    }
    moments.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /**
   * Chi-square test of independence between two categorical columns,
   * with Cramér's V — the [[mutualInformation]] companion on the same
   * contingency table: MI answers "how many nats do they share", V
   * answers "how strong is the association on a [0, 1] scale" with the
   * classic Σ (O−E)²/E significance statistic behind it. One row:
   * `(n, dof, chi2, cramers_v)`. NULLs count as a real level on both
   * sides (window partitioning groups them — no sentinel, no drop).
   *
   * Scale shape: ONE corpus pass to the (a, b) cell counts (map-side
   * combined); marginals and the grand total come from windows over the
   * DOMAIN-sized cell frame — the corpus is never re-scanned and
   * nothing joins. Determinism: counts exact; each expected count is
   * pure double arithmetic on exact longs; the per-cell term rounds to
   * 9 dp and sums as DECIMAL; chi2 and V round to 6 dp.
   *
   * Note dof counts OBSERVED levels (empty rows/columns of the
   * theoretical domain never reach the cell frame — same convention as
   * the entropy/MI profiles).
   */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val all = w.partitionBy(lit(1))
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val byA = w.partitionBy("a")
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val byB = w.partitionBy("b")
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val cells = df
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
      .withColumn("ra", sum("o").over(byA))
      .withColumn("cb", sum("o").over(byB))
      .withColumn("t", sum("o").over(all))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("t").cast("double")
    val o = col("o").cast("double")
    // countDistinct skips NULL — sentinel the level so a NULL category
    // counts toward r/c like it does toward the cells (chr(0) prefix,
    // the house NULL-sentinel convention)
    def levels(c: Column) =
      countDistinct(coalesce(c, lit(0.toChar.toString + ".")))
    val minSide = least(levels(col("a")) - 1, levels(col("b")) - 1)
    cells
      .withColumn("term", round((o - e) * (o - e) / e, 9))
      .agg(
        max(col("t")).as("n"),
        ((levels(col("a")) - 1) * (levels(col("b")) - 1)).as("dof"),
        round(sum(col("term").cast("decimal(28,9)")).cast("double"), 6)
          .as("chi2"),
        // V is undefined when either variable has a single level
        when(minSide === 0, lit(null).cast("double"))
          .otherwise(round(sqrt(
            sum(col("term").cast("decimal(28,9)")).cast("double") /
              (max(col("t")).cast("double") * minSide.cast("double"))), 6))
          .as("cramers_v"))
  }

  /**
   * Spearman rank correlation between two numeric columns — Pearson on
   * average (mid) ranks, the monotone-association profile that survives
   * outliers and nonlinearity where [[correlationMatrix]]'s raw Pearson
   * lies ("does the quality score RANK documents like the compression
   * ratio does?"). One row: `(n, rho)`; rows with a NULL on either side
   * are excluded (complete-case, like pairwise-complete Pearson).
   *
   * Scale shape: ranks come from VALUE-LEVEL count tables — one
   * map-side-combined groupBy per column, an ordered window over each
   * DOMAIN-sized count frame (mid rank = prior-count + (ties+1)/2),
   * then two equi-joins keyed on the value to carry ranks back to the
   * corpus. The corpus itself never globally sorts (a per-row
   * `rank() OVER (ORDER BY x)` would be a single-partition corpus
   * window — the trap this shape avoids); at 100 TB the rank tables are
   * |domain|-sized and typically broadcast.
   *
   * Determinism: mid ranks are exact multiples of 0.5; all five moment
   * sums accumulate the exact DECIMAL(·,2) products (rank·rank has at
   * most .25 granularity), so partitioning cannot move a bit; the final
   * Pearson arithmetic is pure double on exact inputs, rounded to 6 dp.
   */
  def spearman(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("double").as("__a"),
        col(bCol).cast("double").as("__b"))
    val w = org.apache.spark.sql.expressions.Window
    def rankTable(c: String, out: String) = {
      base.groupBy(col(c).as("value")).agg(count(lit(1)).as("__c"))
        .withColumn("__prior",
          coalesce(sum("__c").over(w.partitionBy(lit(1)).orderBy("value")
            .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
        .select(col("value").as(s"__v$out"),
          (col("__prior").cast("double") +
            (col("__c").cast("double") + 1.0) / 2.0).as(out))
    }
    val ra = rankTable("__a", "__ra")
    val rb = rankTable("__b", "__rb")
    val ranked = base
      .join(ra, col("__a") === col("__v__ra")).drop("__v__ra")
      .join(rb, col("__b") === col("__v__rb")).drop("__v__rb")
    val dec = "decimal(38,2)"
    def dd(c: Column) = c.cast("decimal(20,1)")
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(dd(col("__ra")).cast(dec)).as("__sx"),
      sum(dd(col("__rb")).cast(dec)).as("__sy"),
      sum((dd(col("__ra")) * dd(col("__rb"))).cast(dec)).as("__sxy"),
      sum((dd(col("__ra")) * dd(col("__ra"))).cast(dec)).as("__sxx"),
      sum((dd(col("__rb")) * dd(col("__rb"))).cast(dec)).as("__syy"))
    val n = col("n").cast("double")
    def g(p: String) = col(s"__$p").cast("double")
    val num = n * g("sxy") - g("sx") * g("sy")
    val den = sqrt(n * g("sxx") - g("sx") * g("sx")) *
      sqrt(n * g("syy") - g("sy") * g("sy"))
    m.select(col("n"),
      when(den === 0.0 || n < 2.0, lit(null).cast("double"))
        .otherwise(round(num / den, 6)).as("rho"))
  }

  /**
   * Concentration of a categorical mix — Herfindahl–Hirschman index
   * `HHI = Σ (n_v/n)²` plus its reciprocal, the EFFECTIVE number of
   * categories (1/HHI = how many equally-sized sources this mixture
   * behaves like): the one-number diversity gauge for "is the corpus
   * really multi-source or 90% one crawl" next to [[columnEntropy]]'s
   * nat-denominated view. One row: `(n, n_values, hhi,
   * effective_values)`. NULL counts as a real level.
   *
   * Scale shape: one map-side-combined value count; the share terms
   * and the reduce run on the DOMAIN-sized count table. Determinism:
   * shares are exact int/int double divisions, each squared term
   * rounds to 9 dp and sums as DECIMAL; hhi and 1/hhi round to 6 dp.
   */
  def concentration(df: DataFrame, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val all = w.partitionBy(lit(1))
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val share = col("__c").cast("double") / col("__t").cast("double")
    df.groupBy(col(valueCol).as("value")).agg(count(lit(1)).as("__c"))
      .withColumn("__t", sum("__c").over(all))
      .withColumn("__s", round(share * share, 9))
      .agg(
        max(col("__t")).as("n"),
        count(lit(1)).as("n_values"),
        round(sum(col("__s").cast("decimal(20,9)")).cast("double"), 6)
          .as("hhi"),
        round(lit(1.0) /
          sum(col("__s").cast("decimal(20,9)")).cast("double"), 6)
          .as("effective_values"))
  }

  /**
   * Kendall's τ-b between two DISCRETE numeric columns — the
   * concordance twin of [[spearman]] (τ counts pair agreements, so it
   * is interpretable as P(concordant) − P(discordant) and more robust
   * to a few extreme ranks), with the tie-corrected τ-b denominator:
   * `τ_b = (C − D) / sqrt((n₀ − n₁)(n₀ − n₂))` where `n₀ = n(n−1)/2`
   * and `n₁`/`n₂` are the per-column tie-pair counts. One row:
   * `(n, concordant, discordant, tau_b)`; complete-case (NULL on
   * either side drops the row); NULL τ when a side is constant.
   *
   * EXACT arithmetic end to end: C, D and every tie term are integer
   * pair counts summed as DECIMAL; the only floating ops are the final
   * two sqrt's and one division, rounded to 6 dp — cross-engine exact
   * by construction.
   *
   * Scale shape & contract: the corpus reduces to the (a, b) CELL
   * table first (one map-side-combined pass); C/D come from a
   * θ-self-join of that cell table, so cost is |cells|² — this is a
   * DOMAIN-BOUNDED audit statistic for discrete/bucketed columns
   * (scores, grades, bin ids), the same bounded-domain contract as the
   * exact n-gram Jaccard audit. Bucket continuous columns first (or
   * use [[spearman]], which stays domain-linear).
   */
  def kendallTau(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("double").as("a"),
        col(bCol).cast("double").as("b"))
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("n"))
    val dec = "decimal(38,0)"
    // every product is cast to decimal BEFORE multiplying: counts are
    // corpus-scale, so LONG products (n1*n2, n*(n-1)) overflow past ~4.3e9
    // rows even when the cell domain stays small
    def halfPairs(c: Column): Column = {
      val t = c.cast(dec)
      // t*(t-1) is even, so the decimal /2 is exact; re-cast drops the .0
      ((t * (t - lit(1))) / lit(2)).cast(dec)
    }
    // ordered θ-join (a2 > a1) visits each unordered cell pair once
    val pairs = cells.select(col("a").as("a1"), col("b").as("b1"),
        col("n").as("n1"))
      .join(cells.select(col("a").as("a2"), col("b").as("b2"),
        col("n").as("n2")),
        col("a2") > col("a1") && col("b2") =!= col("b1"))
      .agg(
        coalesce(sum(when(col("b2") > col("b1"),
          col("n1").cast(dec) * col("n2").cast(dec))), lit(0).cast(dec))
          .as("__conc"),
        coalesce(sum(when(col("b2") < col("b1"),
          col("n1").cast(dec) * col("n2").cast(dec))), lit(0).cast(dec))
          .as("__disc"))
    def tiePairs(c: String, out: String) = cells
      .groupBy(c).agg(sum("n").as("__t"))
      .agg(coalesce(sum(halfPairs(col("__t"))), lit(0).cast(dec)).as(out))
    val totals = cells.agg(
      coalesce(sum("n"), lit(0L)).as("__n"))
      .select(col("__n"), halfPairs(col("__n")).as("__n0"))
    val j = totals.crossJoin(pairs)
      .crossJoin(tiePairs("a", "__n1")).crossJoin(tiePairs("b", "__n2"))
    val num = (col("__conc") - col("__disc")).cast("double")
    val den = sqrt((col("__n0") - col("__n1")).cast("double")) *
      sqrt((col("__n0") - col("__n2")).cast("double"))
    j.select(col("__n").as("n"),
      col("__conc").cast("long").as("concordant"),
      col("__disc").cast("long").as("discordant"),
      when(col("__n0") === col("__n1") || col("__n0") === col("__n2"),
        lit(null).cast("double"))
        .otherwise(round(num / den, 6)).as("tau_b"))
  }
}
