package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SFT corpus assembly: collapse per-turn conversation rows into one
 * chat-template training string per conversation — the step between a
 * raw interaction log and a supervised-fine-tuning dataset. The marker
 * format is ChatML-shaped (`<|im_start|>role\ncontent<|im_end|>\n`), the
 * de-facto-public template family; the markers are parameters of nothing
 * here because the oracle pins them, but swapping them is a one-line
 * template change.
 *
 * Determinism: turns order by an explicit BIGINT turn index (ties are a
 * data error; `array_sort` on the `(turn, role, content)` struct makes
 * even that case deterministic by full-struct ordering), so the rendered
 * string is identical under any partitioning.
 *
 * Scale shape: one hash aggregate keyed by conversation id — the only
 * shuffle, map-side combined on the collect_list partials. Rendering is
 * a codegen'd projection over the collected array; no window (a window
 * would sort whole partitions for what is a per-group fold). Truncation
 * slices the LAST k turns (the context-window-trimming direction — most
 * recent context survives) before rendering, so dropped turns never hit
 * the concat.
 */
object Sft {

  private def turnMarkup(t: Column): Column =
    concat(lit("<|im_start|>"), t.getField("role"), lit("\n"),
      t.getField("content"), lit("<|im_end|>\n"))

  /**
   * `(conv_id, n_turns, rendered)` — one row per conversation.
   *
   * @param maxTurns keep only the last `maxTurns` turns by turn order
   *                 (`Int.MaxValue` = keep all); `n_turns` reports the
   *                 KEPT count, so the output is self-describing.
   */
  def renderChatML(df: DataFrame, convCol: String, turnCol: String,
                   roleCol: String, contentCol: String,
                   maxTurns: Int = Int.MaxValue): DataFrame = {
    val turns = df.select(col(convCol).as("conv_id"),
      struct(col(turnCol).cast("long").as("turn"),
        col(roleCol).as("role"), col(contentCol).as("content")).as("t"))
    val all = turns.groupBy("conv_id")
      .agg(array_sort(collect_list(col("t"))).as("all"))
    val kept =
      if (maxTurns == Int.MaxValue) all.select(col("conv_id"), col("all").as("ts"))
      else all.select(col("conv_id"),
        // guard the short-conversation case: slice with a negative start
        // whose magnitude exceeds the array length is engine-edge
        // behavior we refuse to depend on
        when(size(col("all")) <= maxTurns, col("all"))
          .otherwise(slice(col("all"), -maxTurns, maxTurns)).as("ts"))
    kept.select(col("conv_id"),
      size(col("ts")).cast("long").as("n_turns"),
      array_join(transform(col("ts"), turnMarkup _), "").as("rendered"))
  }

  /**
   * Inverse of [[renderChatML]]: explode a rendered ChatML string back
   * into `(conv_id, turn, role, content)` rows, turn = 0-based position.
   * Content may contain newlines (role never does — it's the text before
   * the first newline of each segment; content is recovered by length
   * arithmetic, not a second regex). Assumes the markers are RESERVED —
   * content containing a literal `<|im_start|>` is malformed input, the
   * same contract real ChatML corpora rely on.
   *
   * Scale shape: pure codegen'd projection + one generator (posexplode);
   * no shuffle at all.
   */
  def parseChatML(df: DataFrame, convCol: String,
                  renderedCol: String): DataFrame = {
    // split leaves an empty element before the first marker — drop it
    val segs = expr(
      s"slice(split($renderedCol, '<\\\\|im_start\\\\|>'), 2, 2147483647)")
    val role = substring_index(col("seg"), "\n", 1)
    // seg = role + "\n" + content + "<|im_end|>\n"  →  strip both ends
    val content = col("seg").substr(length(role) + lit(2),
      length(col("seg")) - length(role) - lit(12))
    df.select(col(convCol).as("conv_id"), posexplode(segs).as(Seq("turn", "seg")))
      .select(col("conv_id"), col("turn").cast("long").as("turn"),
        role.as("role"), content.as("content"))
  }

  /**
   * Conversation-structure audit — the validity screen run before
   * rendering an SFT corpus: one row per conversation with
   * `(n_turns, n_user, n_assistant, total_chars, max_turn_chars,
   *   starts_with_user, alternates, ends_with_assistant, is_valid)`.
   * `alternates` = no two consecutive turns share a role;
   * `is_valid` = starts with user ∧ alternates ∧ ends with assistant —
   * the contract chat-template tokenizers assume (a corpus violating it
   * silently trains the model on malformed role sequences).
   *
   * Scale shape: one conversation-partitioned `lag` window (the
   * consecutive-role check) feeding one aggregate on the same key — a
   * single shuffle, no turn lists materialized. First/last roles come
   * from struct-ordered min/max (turn is the leading field), not a
   * second sort.
   */
  def conversationAudit(df: DataFrame, convCol: String, turnCol: String,
                        roleCol: String, contentCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("__t"))
    df.select(col(convCol).as("conv_id"), col(turnCol).cast("long").as("__t"),
        col(roleCol).as("__r"), length(col(contentCol)).cast("long").as("__len"))
      .withColumn("__same",
        when(lag(col("__r"), 1).over(w) === col("__r"), 1).otherwise(0))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        count(when(col("__r") === "user", 1)).as("n_user"),
        count(when(col("__r") === "assistant", 1)).as("n_assistant"),
        coalesce(sum("__len"), lit(0L)).as("total_chars"),
        max("__len").as("max_turn_chars"),
        (min(struct(col("__t"), col("__r"))).getField("__r") === "user")
          .as("starts_with_user"),
        (sum("__same") === 0).as("alternates"),
        (max(struct(col("__t"), col("__r"))).getField("__r") === "assistant")
          .as("ends_with_assistant"))
      .withColumn("is_valid",
        col("starts_with_user") && col("alternates") && col("ends_with_assistant"))
  }
}
