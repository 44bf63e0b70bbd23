package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class SftSpec extends SparkTestBase {

  private lazy val turns = df(
    "conv BIGINT, turn INT, role STRING, content STRING", Seq(
      Row(1L, 0, "user", "hi"),
      Row(1L, 1, "assistant", "hello"),
      Row(1L, 2, "user", "bye"),
      Row(2L, 0, "user", "solo")))

  test("renderChatML renders turns in order with ChatML markers") {
    val out = Sft.renderChatML(turns, "conv", "turn", "role", "content")
      .orderBy("conv_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(out(0).getString(2) ==
      "<|im_start|>user\nhi<|im_end|>\n" +
        "<|im_start|>assistant\nhello<|im_end|>\n" +
        "<|im_start|>user\nbye<|im_end|>\n")
    assert(out(1).getString(2) == "<|im_start|>user\nsolo<|im_end|>\n")
  }

  test("renderChatML truncation keeps the LAST maxTurns turns") {
    val out = Sft.renderChatML(turns, "conv", "turn", "role", "content",
        maxTurns = 2)
      .orderBy("conv_id").collect()
    // conv 1 drops turn 0; conv 2 (shorter than the cap) is untouched
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getString(2) ==
      "<|im_start|>assistant\nhello<|im_end|>\n" +
        "<|im_start|>user\nbye<|im_end|>\n")
    assert(out(1).getLong(1) == 1L)
    assert(out(1).getString(2) == "<|im_start|>user\nsolo<|im_end|>\n")
  }

  test("parseChatML inverts renderChatML, multiline content included") {
    val tricky = df("conv BIGINT, turn INT, role STRING, content STRING", Seq(
      Row(9L, 0, "user", "line one\nline two\n"),
      Row(9L, 1, "assistant", ""),               // empty content survives
      Row(9L, 2, "user", "plain")))
    val back = Sft.parseChatML(
        Sft.renderChatML(tricky, "conv", "turn", "role", "content"),
        "conv_id", "rendered")
      .orderBy("turn").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(back.toSeq == Seq((0L, "user", "line one\nline two\n"),
      (1L, "assistant", ""), (2L, "user", "plain")))
  }

  test("rendering is order-insensitive to input row order") {
    val shuffled = turns.orderBy(org.apache.spark.sql.functions.rand(7))
      .repartition(3)
    val a = Sft.renderChatML(turns, "conv", "turn", "role", "content")
      .orderBy("conv_id").collect().map(_.toSeq).toSeq
    val b = Sft.renderChatML(shuffled, "conv", "turn", "role", "content")
      .orderBy("conv_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("conversationAudit: valid, double-role, wrong-start, wrong-end shapes") {
    import org.apache.spark.sql.Row
    val t = df("conv BIGINT, turn INT, role STRING, content STRING", Seq(
      // conv 1: textbook u/a/u/a
      Row(1L, 0, "user", "hi"), Row(1L, 1, "assistant", "hello!"),
      Row(1L, 2, "user", "bye"), Row(1L, 3, "assistant", "bye"),
      // conv 2: double assistant turn
      Row(2L, 0, "user", "q"), Row(2L, 1, "assistant", "a1"),
      Row(2L, 2, "assistant", "a2"),
      // conv 3: starts with assistant
      Row(3L, 0, "assistant", "preamble"), Row(3L, 1, "user", "??"),
      // conv 4: alternates but ends on user
      Row(4L, 0, "user", "q"), Row(4L, 1, "assistant", "a"),
      Row(4L, 2, "user", "dangling")))
    val out = Sft.conversationAudit(t, "conv", "turn", "role", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = out(1L)
    assert(c1.getAs[Long]("n_turns") == 4L)
    assert(c1.getAs[Long]("n_user") == 2L && c1.getAs[Long]("n_assistant") == 2L)
    assert(c1.getAs[Long]("total_chars") == 2 + 6 + 3 + 3)
    assert(c1.getAs[Long]("max_turn_chars") == 6L)
    assert(c1.getAs[Boolean]("is_valid"))
    assert(!out(2L).getAs[Boolean]("alternates") && !out(2L).getAs[Boolean]("is_valid"))
    assert(out(2L).getAs[Boolean]("starts_with_user"))
    assert(!out(3L).getAs[Boolean]("starts_with_user") && !out(3L).getAs[Boolean]("is_valid"))
    assert(out(4L).getAs[Boolean]("alternates"))
    assert(!out(4L).getAs[Boolean]("ends_with_assistant") && !out(4L).getAs[Boolean]("is_valid"))
  }
}
