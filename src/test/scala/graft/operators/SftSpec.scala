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
}
