package graft.operators

import graft.plans.Checkpoints.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multi-touch conversion attribution over an event stream — "which
 * channel earns credit for each conversion?". A journey is one user's
 * touch events STRICTLY BEFORE their first conversion (users who never
 * convert contribute nothing; the conversion event itself is not a
 * touch); each journey distributes exactly one unit of credit across
 * its touches under the chosen model:
 *
 *  - `first` / `last`: all credit to the earliest / latest touch;
 *  - `linear`: 1/k to each of the k touches;
 *  - `position`: 40% first, 40% last, the remaining 20% split evenly
 *    across the middle (k=1 → 100%, k=2 → 50/50) — the standard
 *    U-shaped model;
 *  - `decay`: credit ∝ exp(−decayRate · days-before-conversion),
 *    renormalized per journey — recent touches weigh more.
 *
 * Scale shape: one shuffle by user (the journey key), two window
 * passes inside each user partition (first-conversion lookup, then
 * touch ranking), then a map-side-combined groupBy channel — journeys
 * never cross partitions and channels aggregate to a |channels|-sized
 * result. No self-join, no corpus-wide window.
 *
 * Determinism: ties on the timestamp break on `orderCol` (a unique
 * event id); per-touch credits snap to 9 dp and accumulate as DECIMAL;
 * the published credit rounds to 6 dp. The decay weights go through
 * the proven ln/exp 9-dp discipline (see [[Survival]]).
 */
object Attribution {

  /** See [[Experiment]]: division must be total under ANSI codegen. */
  private def sdiv(a: Column, b: Column): Column =
    a / when(b === 0.0, lit(1.0)).otherwise(b)

  private val dec = "decimal(28,9)"

  /**
   * Attribute conversions to channels. `tsCol` is an epoch-µs LONG
   * (route timestamps through `TimeFunctions.epochMicros` upstream),
   * `orderCol` a unique tie-break id, `convCol` a boolean conversion
   * flag. Returns `(channel, conversions, touches)` sorted nowhere —
   * order at the call site. `decayRate` is per DAY and only read by
   * the `decay` model.
   */
  def credit(df: DataFrame, userCol: String, tsCol: String,
             orderCol: String, channelCol: String, convCol: String,
             model: String, decayRate: Double = 0.1): DataFrame = {
    require(Set("first", "last", "linear", "position", "decay")(model),
      s"unknown attribution model: $model")
    val wUser = Window.partitionBy(col("__u"))
    val base = df.select(
      col(userCol).as("__u"), col(tsCol).cast("long").as("__t"),
      col(orderCol).cast("long").as("__id"),
      col(channelCol).cast("string").as("channel"),
      coalesce(col(convCol).cast("boolean"), lit(false)).as("__c"))
    // first conversion per user, (ts, id)-lexicographic
    val withConv = base
      .withColumn("__ct", min(when(col("__c"), col("__t"))).over(wUser))
      .withColumn("__cid",
        min(when(col("__c") && col("__t") === col("__ct"), col("__id")))
          .over(wUser))
    val touches = withConv.where(!col("__c") && col("__ct").isNotNull &&
      (col("__t") < col("__ct") ||
        (col("__t") === col("__ct") && col("__id") < col("__cid"))))
    val wOrd = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__id").asc)
    val ranked = touches
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__k", count(lit(1)).over(wUser))
    val k = col("__k").cast("double")
    val credit: Column = model match {
      case "first" => when(col("__rn") === 1, lit(1.0)).otherwise(lit(0.0))
      case "last" =>
        when(col("__rn") === col("__k"), lit(1.0)).otherwise(lit(0.0))
      case "linear" => round(sdiv(lit(1.0), k), 9)
      case "position" =>
        when(col("__k") === 1, lit(1.0))
          .when(col("__k") === 2, lit(0.5))
          .when(col("__rn") === 1 || col("__rn") === col("__k"), lit(0.4))
          .otherwise(round(sdiv(lit(0.2), k - lit(2.0)), 9))
      case "decay" =>
        // weight = exp(−rate · Δdays), Δdays on the exact µs delta
        lit(0.0) // placeholder, replaced below (needs a second window)
    }
    val credited =
      if (model != "decay") ranked.withColumn("__credit", credit)
      else {
        val w = round(exp(round(lit(-decayRate) *
          (col("__ct") - col("__t")).cast("double") /
          lit(86400000000.0), 9)), 9)
        ranked.withColumn("__w", w)
          .withColumn("__wsum",
            sum(col("__w").cast(dec)).over(wUser).cast("double"))
          .withColumn("__credit", round(sdiv(col("__w"), col("__wsum")), 9))
      }
    credited.groupBy(col("channel"))
      .agg(round(sum(col("__credit").cast(dec)).cast("double"), 6)
        .as("conversions"),
        count(lit(1)).as("touches"))
  }

  private val START = "__START__"
  private val CONV = "__CONV__"
  private val NULLS = "__NULL__"

  /**
   * Data-driven (Markov removal-effect) attribution: model journeys as
   * a first-order Markov chain over channels with absorbing CONV/NULL
   * states, estimate each channel's removal effect — how much total
   * conversion probability disappears when every transition through it
   * is severed — and distribute conversions proportionally
   * (Anderl et al. 2016's standard construction). Unlike the
   * heuristic [[credit]] models this uses ALL journeys: non-converting
   * paths end in NULL and pull transition probabilities down.
   *
   * Absorption probabilities come from `iterations` rounds of the
   * fixed-point p(s) ← c(s) + Σ T(s,s')·p(s') computed IN-PLAN on the
   * aggregated transition matrix: after the one journey shuffle (same
   * as [[credit]]) every table is (channels+1)·|S|²-sized — channel
   * counts, never corpus rows — so the iteration cost is independent
   * of data volume. Per-step products snap to 9 dp and group-sums
   * accumulate as DECIMAL, making the K-step value engine-exact
   * whether or not the fixed point has fully converged; geometric
   * convergence makes the default plenty below 6 dp for chains whose
   * transient mass decays (document/raise `iterations` otherwise).
   *
   * Output: `(channel, removal_effect, credit)`; `removal_effect` is
   * NULL when the full chain never converts.
   */
  def markovRemoval(df: DataFrame, userCol: String, tsCol: String,
                    orderCol: String, channelCol: String, convCol: String,
                    iterations: Int = 12): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    val wUser = Window.partitionBy(col("__u"))
    val base = df.select(
      col(userCol).as("__u"), col(tsCol).cast("long").as("__t"),
      col(orderCol).cast("long").as("__id"),
      col(channelCol).cast("string").as("channel"),
      coalesce(col(convCol).cast("boolean"), lit(false)).as("__c"))
    val withConv = base
      .withColumn("__ct", min(when(col("__c"), col("__t"))).over(wUser))
      .withColumn("__cid",
        min(when(col("__c") && col("__t") === col("__ct"), col("__id")))
          .over(wUser))
    // converting users: pre-conversion touches; non-converting: all
    val touches = withConv.where(!col("__c") &&
      (col("__ct").isNull || col("__t") < col("__ct") ||
        (col("__t") === col("__ct") && col("__id") < col("__cid"))))
    val wOrd = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__id").asc)
    val sq = touches
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__nxt", lead(col("channel"), 1).over(wOrd))
    val internal = sq.select(col("channel").as("__fs"),
      coalesce(col("__nxt"),
        when(col("__ct").isNotNull, lit(CONV)).otherwise(lit(NULLS)))
        .as("__ts"))
    val starts = sq.where(col("__rn") === 1)
      .select(lit(START).as("__fs"), col("channel").as("__ts"))
    val touchless = withConv
      .where(col("__c") && col("__t") === col("__ct") &&
        col("__id") === col("__cid"))
      .join(sq.select(col("__u")).distinct(), Seq("__u"), "left_anti")
      .select(lit(START).as("__fs"), lit(CONV).as("__ts"))
    // |S|²-row table, but its LINEAGE is the whole journey shuffle —
    // eager-checkpoint it so the K absorption rounds (and their
    // periodic state checkpoints) never re-execute the corpus pass;
    // left lazy, each round's materialization replayed the full
    // user-window pipeline (measured 41 s -> ~4 s at sf0.1)
    val trans = internal.unionAll(starts).unionAll(touchless)
      .groupBy(col("__fs"), col("__ts")).agg(count(lit(1)).as("__n"))
      .withColumn("__tot",
        sum(col("__n")).over(Window.partitionBy(col("__fs"))))
      .select(col("__fs"), col("__ts"),
        round(col("__n").cast("double") / col("__tot").cast("double"), 9)
          .as("__p"))
      .truncateLineage(eager = true)
    val rcs = trans.select(col("__fs").as("__rc"))
      .where(col("__rc") =!= START).distinct()
      .unionAll(trans.select(lit("__NONE__").as("__rc")).limit(1))
    // every removal-variant expansion broadcasts the |channels|-sized
    // side: BroadcastNestedLoopJoin, never a CartesianProduct shuffle
    val keyed = trans.crossJoin(broadcast(rcs))
      .where(col("__rc") === "__NONE__" ||
      (col("__fs") =!= col("__rc") && col("__ts") =!= col("__rc")))
    val constT = keyed.where(col("__ts") === CONV)
      .select(col("__rc"), col("__fs"), col("__p").as("__cc"))
    val dynT = keyed.where(col("__ts") =!= CONV && col("__ts") =!= NULLS)
      .select(col("__rc"), col("__fs"), col("__ts"), col("__p"))
    // state space = every transient source state minus the removed
    // channel — built from `trans`, NOT `keyed`: a removal that severs
    // ALL of a state's out-edges (e.g. every START path runs through
    // the removed channel) must keep the state with p = 0, not drop it
    val states = trans.select(col("__fs")).distinct()
      .crossJoin(broadcast(rcs))
      .where(col("__rc") === "__NONE__" || col("__fs") =!= col("__rc"))
    var p = states.withColumn("__pv", lit(0.0))
    for (i <- 1 to iterations) {
      val dyn = dynT
        .join(p.select(col("__rc").as("__rc2"), col("__fs").as("__st"),
            col("__pv")),
          col("__rc") === col("__rc2") && col("__ts") === col("__st"))
        .groupBy(col("__rc"), col("__fs"))
        .agg(sum(round(col("__p") * col("__pv"), 9).cast(dec)).as("__dyn"))
      p = states
        .join(constT, Seq("__rc", "__fs"), "left")
        .join(dyn, Seq("__rc", "__fs"), "left")
        .select(col("__rc"), col("__fs"),
          round(coalesce(col("__cc"), lit(0.0)) +
            coalesce(col("__dyn").cast("double"), lit(0.0)), 9).as("__pv"))
      // the state frame references itself through two joins per round —
      // flatten the plan so K stays cheap to (re)plan
      if (i % 4 == 0 && i != iterations) p = p.truncateLineage(true)
      graft.plans.IterationAudit.record("attribution.markovRemoval", p)
    }
    val fin = p.where(col("__fs") === START)
      .select(col("__rc"), col("__pv"))
    val pf = fin.where(col("__rc") === "__NONE__")
      .select(col("__pv").as("__pf"))
    val nConv = withConv.where(col("__ct").isNotNull)
      .agg(countDistinct(col("__u")).as("__nc"))
    val re = fin.where(col("__rc") =!= "__NONE__").crossJoin(broadcast(pf))
      .select(col("__rc").as("channel"),
        when(col("__pf") === 0.0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("__pv") /
            when(col("__pf") === 0.0, lit(1.0)).otherwise(col("__pf")), 9))
          .as("__re9"))
    val tre = re.agg(sum(col("__re9").cast(dec)).as("__tre"))
    re.crossJoin(broadcast(tre)).crossJoin(broadcast(nConv))
      .select(col("channel"),
        round(col("__re9"), 6).as("removal_effect"),
        when(col("__tre").isNull || col("__tre").cast("double") === 0.0,
          lit(null).cast("double"))
          .otherwise(round(col("__re9") / col("__tre").cast("double") *
            col("__nc").cast("double"), 6)).as("credit"))
  }
}
