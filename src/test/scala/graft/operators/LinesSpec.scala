package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class LinesSpec extends SparkTestBase {

  // "FOOTER" is in 3/4 docs; "MENU" in 2; unique lines everywhere else.
  private lazy val docs = df("doc_id BIGINT, text STRING, lang STRING", Seq(
    Row(1L, "alpha\nFOOTER\nbravo", "en"),
    Row(2L, "FOOTER\ncharlie\nMENU", "en"),
    Row(3L, "MENU\nFOOTER\nFOOTER", "de"),
    Row(4L, "delta", "fr"),
    Row(5L, null, "fr")))

  test("dedupLinesWithinDoc keeps first occurrences in order, counts removals") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a\nb\na\nc\nb"),   // -> a,b,c (2 removed)
      Row(2L, "x\nx\nx"),         // -> x (2 removed)
      Row(3L, "solo"),            // unchanged
      Row(4L, null)))             // null -> "" (1 line, 0 removed)
    val out = Lines.dedupLinesWithinDoc(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ("a\nb\nc", 5L, 2L))
    assert(out(2L) == ("x", 3L, 2L))
    assert(out(3L) == ("solo", 1L, 0L))
    assert(out(4L) == ("", 1L, 0L))
  }

  test("duplicatedLines counts distinct docs, not occurrences") {
    // FOOTER occurs 4 times but in 3 docs; MENU in 2 docs.
    assertSameRows(
      Lines.duplicatedLines(docs, "doc_id", "text", 2),
      Seq(Seq("FOOTER", 3L)))
    assertSameRows(
      Lines.duplicatedLines(docs, "doc_id", "text", 1),
      Seq(Seq("FOOTER", 3L), Seq("MENU", 2L)))
  }

  test("dedupLines removes hot lines, keeps order, passes through columns") {
    val out = Lines.dedupLines(docs, "doc_id", "text", 2)
    assertSameRows(out.select("doc_id", "text", "lang"), Seq(
      Seq(1L, "alpha\nbravo", "en"),
      Seq(2L, "charlie\nMENU", "en"),
      Seq(3L, "MENU", "de"),
      Seq(4L, "delta", "fr"),
      Seq(5L, "", "fr")))
  }

  test("dedupLines: a document made entirely of boilerplate becomes empty, not dropped") {
    val out = Lines.dedupLines(docs, "doc_id", "text", 1)
    assert(out.count() == 5)
    assertSameRows(out.filter("doc_id = 3").select("text"), Seq(Seq("")))
  }

  test("removeLinesInline equals dedupLines given the discovered hot set, shuffle-free") {
    val hot = Lines.duplicatedLines(docs, "doc_id", "text", 2)
      .collect().map(_.getString(0)).toSeq
    val inline = Lines.removeLinesInline(docs, "text", hot)
    val joined = Lines.dedupLines(docs, "doc_id", "text", 2)
    assert(inline.select("doc_id", "text").collect().map(_.toSeq).toSet ==
      joined.select("doc_id", "text").collect().map(_.toSeq).toSet)
    // pure projection: streaming-safe, no Exchange in the plan
    assert(!inline.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
