package graft.operators

import org.apache.spark.sql.DataFrame
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
}
