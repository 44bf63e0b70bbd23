package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel conversion over an event log: of the users who performed
 * step 1, how many went on to perform step 2 strictly after it, then
 * step 3 after that, … — the product-analytics staple (and, on a training
 * pipeline's telemetry, the "ingest → clean → dedup → shipped" yield
 * report).
 *
 * Semantics: a user converts step i at the EARLIEST event of type
 * `steps(i)` strictly after their step-(i−1) conversion time (min-time
 * matching). Earliest-next matching maximizes completion counts — if any
 * ordered assignment completes the funnel, the greedy earliest one does —
 * and makes the result deterministic under event-time ties across
 * engines: ties on min(ts) collapse to the same instant, so no
 * tie-breaking rule is ever needed.
 *
 * Scale shape: one pass per step over the events projected to
 * (user, ts, type) — each pass filters to ONE event type (predicate
 * pushes to the scan), joins on the user key against the (shrinking)
 * converted-user set, and min-aggregates with map-side combine. k steps =
 * k pushed-down scans + k user-key joins; no window over the full log, no
 * per-user event-array collect (the sequence-match-via-array alternative
 * materializes every user's full history in one row — skew bomb on hot
 * users).
 */
object Funnel {

  /**
   * Per-step conversion counts: `(step, step_name, n_users)` with step
   * numbered from 1; `n_users` is non-increasing by construction.
   * `windowSeconds` bounds the WHOLE funnel relative to the step-1 time
   * ("purchase within a day of first view") — the usual way conversion
   * is reported; None = unbounded.
   */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 windowSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    val first = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min("ts").as("t"))
      .withColumn("t1", col("t"))
    val inWindow = windowSeconds match {
      case Some(w) => col("ts") <= col("t1") + expr(s"INTERVAL $w SECONDS")
      case None    => lit(true)
    }
    val converted = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col("et") === step)
        .join(prev, "u")
        .filter(col("ts") > col("t") && inWindow)
        .groupBy("u", "t1").agg(min("ts").as("t"))
    }
    converted.zip(steps).zipWithIndex.map { case ((users, name), i) =>
      users.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ union _)
  }

  /**
   * The per-user conversion times for the FULL funnel — `(user, t_1 …
   * t_k)` for users who completed every step, for downstream latency
   * percentiles (`Profile.quantiles` on `t_k − t_1`).
   */
  def completions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    steps.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (None, (step, _)) =>
        Some(ev.filter(col("et") === step).groupBy("u").agg(min("ts").as("t_1")))
      case (Some(prev), (step, i)) =>
        Some(ev.filter(col("et") === step)
          .join(prev, "u")
          .filter(col("ts") > col(s"t_$i"))
          .groupBy((col("u") +: (1 to i).map(j => col(s"t_$j"))): _*)
          .agg(min("ts").as(s"t_${i + 1}")))
    }.get.withColumnRenamed("u", userCol)
  }

  /**
   * First-order Markov transition matrix over per-user event sequences:
   * `(from_event, to_event, n, p)` where n counts adjacent
   * (prev → next) pairs in each user's time-ordered stream and p is the
   * row-normalized transition probability. The behavioral fingerprint
   * next to [[conversion]]'s fixed-path view: unexpected transition
   * mass (error → retry loops, skipped steps) shows up without
   * declaring a funnel up front.
   *
   * `tieCol` totally orders same-timestamp events (an event id), so
   * the lag pairing — and therefore every count — is a pure function
   * of the data across engines.
   *
   * Scale shape: one user-keyed window pass (the same shuffle any
   * sessionization already pays), then a |types|²-cell aggregate; the
   * row normalization is a window over those cells, not the log.
   */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val cells = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_event"), col(typeCol).as("to_event"))
      .agg(count(lit(1)).as("n"))
    val byFrom = org.apache.spark.sql.expressions.Window
      .partitionBy("from_event")
    cells.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
  }

  /**
   * Frequent contiguous event subsequences: every length-`n` window of
   * each user's time-ordered stream, supported by the number of
   * DISTINCT users exhibiting it — [[transitions]] generalized past
   * bigrams ("view>click>buy happens for 400 users; view>click>error
   * for 80"). Output `(seq, n_users, n_occurrences, rank)` for the `k`
   * best-supported sequences (ties rank by seq string).
   *
   * Scale shape: one user-keyed window pass builds the n-grams via
   * `lead` (no self-join — the classic PrefixSpan blowup never
   * appears because contiguous n-grams are linear in the log), then a
   * map-side-combined (user, seq)-dedup + count, and the global top-k
   * plans as TakeOrderedAndProject. Sequence strings are bounded by
   * n·|type| bytes.
   */
  def frequentSequences(events: DataFrame, userCol: String, tsCol: String,
                        tieCol: String, typeCol: String, n: Int = 3,
                        k: Int = 20): DataFrame = {
    require(n >= 2 && n <= 16, s"n must be in [2, 16], got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__u").orderBy(col("__ts"), col("__tie"))
    // NULL types drop BEFORE pairing (their neighbors become adjacent):
    // a NULL inside concat_ws would silently shorten the string in Spark
    // but void the row in most SQL engines — neither is a sequence
    val withLeads = (1 until n).foldLeft(
      events.where(col(typeCol).isNotNull)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
          col(tieCol).as("__tie"), col(typeCol).cast("string").as("__t0"))) {
      case (acc, i) => acc.withColumn(s"__t$i", lead(col("__t0"), i).over(w))
    }
    val grams = withLeads
      .where(col(s"__t${n - 1}").isNotNull)
      .select(col("__u"),
        concat_ws(">", (0 until n).map(i => col(s"__t$i")): _*).as("seq"))
    val counted = grams
      .groupBy(col("__u"), col("seq")).agg(count(lit(1)).as("__c"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_users"), sum(col("__c")).as("n_occurrences"))
      .orderBy(col("n_users").desc, col("seq").asc)
      .limit(k)
    counted.withColumn("rank",
      // bounded-window: topk — re-ranks the limit(k) result
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_users").desc, col("seq").asc)).cast("long"))
  }

  /**
   * Top user paths: each user's first `maxSteps` events (by
   * (ts, tie)) joined into a `"a>b>c"` path string, counted across
   * users, ranked by frequency — "what do people actually do first?",
   * the product-analytics staple behind every Sankey. Output
   * `(path, steps, n, rank)` for the `k` most frequent paths
   * (ties rank by path string; rank is dense-free row_number).
   *
   * Scale shape: one user-keyed window pass truncates to ≤ maxSteps
   * rows per user, one groupBy collapses each user to a single path
   * row (sort_array inside the aggregate — no second shuffle), one
   * map-side-combined count by path, and the global top-k plans as
   * TakeOrderedAndProject (limit k), never a full sort. Path strings
   * are bounded by maxSteps · |type| bytes.
   */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, typeCol: String, maxSteps: Int = 5,
               k: Int = 20): DataFrame = {
    require(maxSteps >= 1 && maxSteps <= 64,
      s"maxSteps must be in [1, 64], got $maxSteps")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col("__ts"), col("__tie"))
    val perUser = events
      .select(col(userCol), col(tsCol).as("__ts"), col(tieCol).as("__tie"),
        col(typeCol).cast("string").as("__t"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxSteps)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col("__rn").as("r"), col("__t").as("t")))).as("__arr"))
      .select(
        array_join(transform(col("__arr"), x => x.getField("t")), ">")
          .as("path"),
        size(col("__arr")).as("steps"))
    val counted = perUser.groupBy(col("path"), col("steps"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
    counted.withColumn("rank",
      // bounded-window: topk — re-ranks the limit(k) result
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("path").asc)).cast("long"))
  }
}
