package graft.operators

import graft.plans.Checkpoints.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Preference-pair assembly (DPO/RLHF data prep): per group of candidate
 * completions, pair the best-scoring against the worst-scoring example
 * to form `(chosen, rejected)` training pairs with a score margin.
 *
 * Determinism: ties on score break to the SMALLER id on both ends, via
 * struct-ordered `max`/`min` — `max(struct(score, -id))` picks highest
 * score then lowest id, `min(struct(score, id))` picks lowest score then
 * lowest id. No window, no sort of whole groups.
 *
 * Scale shape: `pairs` is a single aggregate on the group key (struct
 * buffers plan as SortAggregate, not hash — but the partial pass still
 * combines map-side), so the struct-max partials are constant-size and
 * network volume is |groups|, independent of candidates per group (a
 * skewed group costs nothing extra). `topBottomPairs` (rank-i-vs-rank-i, k
 * pairs per group) does need per-group order and uses two row_number
 * windows over the SAME partition key, which Catalyst plans as one
 * exchange + one sort pass each — acceptable because k-pair assembly is
 * inherently rank-based; the candidate set entering the window should
 * already be per-group bounded upstream (e.g. Sample.perKeyCap).
 */
object Preference {

  /**
   * One `(group, chosen_id, rejected_id, margin)` row per group: the
   * highest- vs lowest-scoring candidate. Groups where best == worst
   * (single candidate) or margin < `minMargin` are dropped — a pair
   * with no real preference signal is training noise.
   */
  def pairs(df: DataFrame, groupCol: String, idCol: String,
            scoreCol: String, minMargin: Double): DataFrame =
    df.select(col(groupCol).as("group"), col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("s"))
      .groupBy("group")
      .agg(max(struct(col("s").as("s"), (-col("id")).as("nid"))).as("best"),
        min(struct(col("s").as("s"), col("id").as("pid"))).as("worst"))
      .select(col("group"),
        (-col("best.nid")).as("chosen_id"),
        col("worst.pid").as("rejected_id"),
        round(col("best.s") - col("worst.s"), 6).as("margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)

  /**
   * Up to `k` pairs per group: rank-i from the top paired with rank-i
   * from the bottom (rank 1 = strongest contrast). A candidate never
   * pairs with itself and the two rank lists must not cross (top rank-i
   * must strictly outrank bottom rank-i's position), so a group with n
   * candidates yields floor(n/2)-capped-at-k pairs.
   */
  def topBottomPairs(df: DataFrame, groupCol: String, idCol: String,
                     scoreCol: String, k: Int, minMargin: Double): DataFrame = {
    val base = df.select(col(groupCol).as("group"),
      col(idCol).cast("long").as("id"), col(scoreCol).cast("double").as("s"))
    val wTop = Window.partitionBy("group").orderBy(col("s").desc, col("id").asc)
    val wBot = Window.partitionBy("group").orderBy(col("s").asc, col("id").asc)
    val ranked = base
      .withColumn("r_top", row_number().over(wTop).cast("long"))
      .withColumn("r_bot", row_number().over(wBot).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("group")))
    val top = ranked.filter(col("r_top") <= k && col("r_top") * 2 <= col("n"))
      .select(col("group"), col("r_top").as("rank"),
        col("id").as("chosen_id"), col("s").as("s_best"))
    val bot = ranked.filter(col("r_bot") <= k && col("r_bot") * 2 <= col("n"))
      .select(col("group"), col("r_bot").as("rank"),
        col("id").as("rejected_id"), col("s").as("s_worst"))
    top.join(bot, Seq("group", "rank"))
      .select(col("group"), col("rank"), col("chosen_id"), col("rejected_id"),
        round(col("s_best") - col("s_worst"), 6).as("margin"))
      .filter(col("margin") >= minMargin)
  }

  /**
   * Bradley–Terry strength estimation from raw pairwise outcomes — the
   * arena-leaderboard fit: given one `(winner, loser)` row per
   * comparison, estimate per-item strengths p with
   * P(i beats j) = pᵢ/(pᵢ+pⱼ), via Hunter's MM update
   * pᵢ ← wᵢ / Σⱼ nᵢⱼ/(pᵢ+pⱼ), renormalized to mean 1 each round.
   * Output: `(item, strength, games, wins)` — strength 6 dp.
   *
   * Scale shape: the comparison stream reduces ONCE to its unordered
   * pair-count table (|item-pairs| rows, map-side combined) which is
   * `localCheckpoint`ed so no MM round re-reads the corpus; every
   * iteration is then two broadcast joins of the |items|-row strength
   * frame against that table plus one item-keyed aggregate — nothing
   * corpus-sized moves after the first pass, and a skewed matchup
   * (one hot pair) is already a single count row. The strength frame
   * is `localCheckpoint`ed EVERY round: each MM step references the
   * previous strengths twice (once per join side), so an uncut lineage
   * unfolds O(2^k) in Catalyst's `DeduplicateRelations` (observed as a
   * StackOverflow at 25 rounds). The frame is |items| rows — i.e.
   * leaderboard-sized — so the per-round materialization is a fixed
   * tiny job, the same trade [[Centroids.kCenterGreedy]] makes but at
   * every step because of the double self-reference. Normalization is
   * a whole-frame window (not an agg + cross-join) for the same
   * reason: the agg form references the round's output twice.
   *
   * Determinism: every cross-item sum is a DECIMAL(38,9) sum of
   * 9-dp-rounded operands and every division rounds to 12 dp — the
   * [[Linkage.emEstimate]] recipe — so results are partition-order
   * independent and cross-engine exact. An item with zero wins (MM
   * sends it to exactly 0) clamps to 1e-6, keeping later rounds'
   * denominators finite. Standard BT caveat applies: strengths are
   * only jointly identified within a connected component of the
   * comparison graph; items never compared (directly or transitively)
   * are each normalized into the same mean-1 scale but not mutually
   * calibrated.
   */
  def bradleyTerry(df: DataFrame, winnerCol: String, loserCol: String,
                   iterations: Int = 20): DataFrame = {
    val raw = df.select(col(winnerCol).cast("long").as("__w"),
        col(loserCol).cast("long").as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // unordered pair counts: one corpus shuffle, then checkpointed
    val pairs = raw.select(
        least(col("__w"), col("__l")).as("i"),
        greatest(col("__w"), col("__l")).as("j"),
        (col("__w") < col("__l")).cast("long").as("__iw"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("__iw")).as("win_i"))
    bradleyTerryFromPairs(pairs, iterations = iterations)
  }

  /**
   * [[bradleyTerry]] over an ALREADY-aggregated unordered pair-count
   * table `(i, j, n, win_i)` with `i < j`, `n` total games between the
   * pair and `win_i` games item `i` won — the streaming entry point:
   * `StreamingPipeline.arenaPairCounts` maintains exactly this table
   * incrementally, and a `foreachBatch` hands it here per trigger so
   * live arena ratings cost items-sized work per update, never a
   * corpus replay. Arithmetic is identical to [[bradleyTerry]] (which
   * delegates), so batch and streaming fits agree bit-for-bit on the
   * same comparison set.
   */
  def bradleyTerryFromPairs(pairs: DataFrame, iCol: String = "i",
                            jCol: String = "j", nCol: String = "n",
                            winICol: String = "win_i",
                            iterations: Int = 20): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // win_i is DOUBLE so tie-aware callers ([[bradleyTerryTies]]) can
    // pass half-wins; 0/0.5/1 contributions are dyadic, so their sums
    // are binary-exact and partition-order independent without the
    // decimal fold
    val pc = pairs.select(col(iCol).cast("long").as("__i"),
        col(jCol).cast("long").as("__j"),
        col(nCol).cast("long").as("__n"),
        col(winICol).cast("double").as("__win_i"))
      .truncateLineage()
    val sides = pc.select(col("__i").as("__item"), col("__j").as("__opp"),
        col("__n"), col("__win_i").as("__wv"))
      .unionAll(pc.select(col("__j").as("__item"), col("__i").as("__opp"),
        col("__n"), (col("__n") - col("__win_i")).as("__wv")))
    val wins = sides.groupBy("__item").agg(
      sum(col("__wv")).cast("double").as("__wins"),
      sum(col("__n")).cast("long").as("__games"))
      .truncateLineage()
    def decSum(c: Column): Column =
      sum(round(c, 9).cast("decimal(38,9)")).cast("double")
    val all = Window.partitionBy(lit(1))
    val init = wins.select(col("__item"), lit(1.0).as("__p"))
    val pFinal = (1 to iterations).foldLeft(init) { (cur, _) =>
      val pi = cur.select(col("__item").as("__ik"), col("__p").as("__pi"))
      val pj = cur.select(col("__item").as("__jk"), col("__p").as("__pj"))
      val denom = sides
        .join(broadcast(pi), col("__item") === col("__ik"))
        .join(broadcast(pj), col("__opp") === col("__jk"))
        .groupBy("__item")
        .agg(decSum(col("__n") / (col("__pi") + col("__pj"))).as("__d"))
      denom
        .join(broadcast(wins.select(col("__item"), col("__wins"))), Seq("__item"))
        .select(col("__item"), round(col("__wins") / col("__d"), 12).as("__p0"))
        .select(col("__item"),
          greatest(round(col("__p0") * count(lit(1)).over(all) /
            sum(round(col("__p0"), 9).cast("decimal(38,9)")).over(all)
              .cast("double"), 12),
            lit(1e-6)).as("__p"))
        .truncateLineage()
    }
    pFinal.join(wins, Seq("__item"))
      .select(col("__item").as("item"), round(col("__p"), 6).as("strength"),
        col("__games").as("games"), round(col("__wins"), 2).as("wins"))
  }

  /**
   * Tie-aware Bradley–Terry, the arena convention: each comparison is
   * `(a, b, outcome)` with outcome = 1 (a wins), 0 (b wins), or 0.5
   * (tie); a tie credits half a win to each side and the plain BT MM
   * fit runs on the fractional win totals. Same scale shape and
   * determinism as [[bradleyTerry]] (half-win sums are binary-exact);
   * `wins` in the output is fractional (2 dp).
   */
  def bradleyTerryTies(df: DataFrame, aCol: String, bCol: String,
                       outcomeCol: String,
                       iterations: Int = 20): DataFrame = {
    val raw = df.select(col(aCol).cast("long").as("__a"),
        col(bCol).cast("long").as("__b"),
        col(outcomeCol).cast("double").as("__o"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__o").isNotNull && col("__a") =!= col("__b"))
    val pairs = raw.select(
        least(col("__a"), col("__b")).as("i"),
        greatest(col("__a"), col("__b")).as("j"),
        when(col("__a") < col("__b"), col("__o"))
          .otherwise(lit(1.0) - col("__o")).as("__oi"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("__oi")).as("win_i"))
    bradleyTerryFromPairs(pairs, iterations = iterations)
  }

  /**
   * Win-rate leaderboard over raw `(winner, loser)` outcomes:
   * `(item, games, wins, win_rate, rank)` — rank 1 = best, standard
   * `rank()` so win-rate ties share a rank. The naive companion to
   * [[bradleyTerry]] (win rate ignores opponent strength; BT doesn't).
   *
   * Scale shape: one item-keyed aggregate over the comparison stream
   * (each row explodes to its two participants pre-shuffle, map-side
   * combined), then a single-partition window over |items| rows — fine
   * because the aggregate output is leaderboard-sized by construction.
   */
  /**
   * [[leaderboard]] plus a Wilson score interval per item —
   * `(item, games, wins, win_rate, ci_lo, ci_hi, rank)` at z = 1.96
   * (95%): the interval an arena UI shades behind each win rate, and
   * the honest way to rank items with very different game counts
   * (ranking by `ci_lo` is the standard lower-confidence-bound rule;
   * rank here stays on win_rate for [[leaderboard]] parity — sort by
   * `ci_lo` downstream for the LCB board). Wilson bounds are
   * +,×,÷,√ only — √ is IEEE-correctly-rounded, so the oracle replays
   * them exactly (unlike exp/ln, which are libm-dependent).
   * Same scale shape as [[leaderboard]].
   */
  def leaderboardWilson(df: DataFrame, winnerCol: String, loserCol: String,
                        z: Double = 1.96): DataFrame = {
    val base = leaderboard(df, winnerCol, loserCol)
    val n = col("games").cast("double")
    val p = col("wins").cast("double") / n
    val z2 = lit(z * z)
    val center = (p + z2 / (lit(2.0) * n)) / (lit(1.0) + z2 / n)
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))) / (lit(1.0) + z2 / n)
    base.select(col("item"), col("games"), col("wins"), col("win_rate"),
      round(greatest(center - half, lit(0.0)), 6).as("ci_lo"),
      round(least(center + half, lit(1.0)), 6).as("ci_hi"),
      col("rank"))
  }

  def leaderboard(df: DataFrame, winnerCol: String, loserCol: String): DataFrame = {
    val raw = df.select(col(winnerCol).cast("long").as("__w"),
        col(loserCol).cast("long").as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    val perItem = raw
      .select(explode(array(
        struct(col("__w").as("item"), lit(1L).as("__v")),
        struct(col("__l").as("item"), lit(0L).as("__v")))).as("__e"))
      .select(col("__e.item"), col("__e.__v"))
      .groupBy("item")
      .agg(count(lit(1)).as("games"), sum(col("__v")).as("wins"))
      .withColumn("win_rate",
        round(col("wins").cast("double") / col("games"), 6))
    perItem.withColumn("rank",
      // bounded-window: key-domain — one row per competitor item, the declared unit of analysis
      rank().over(Window.orderBy(col("win_rate").desc)).cast("long"))
  }
}
