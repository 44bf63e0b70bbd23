package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class SnapshotSpec extends SparkTestBase {

  private lazy val v1 = df("id BIGINT, text STRING", Seq(
    Row(1L, "same"), Row(2L, "old"), Row(3L, "gone"), Row(4L, null)))
  private lazy val v2 = df("id BIGINT, text STRING", Seq(
    Row(1L, "same"), Row(2L, "new"), Row(4L, null), Row(5L, "fresh")))

  test("diff classifies added/removed/changed/unchanged; NULL text is a real row") {
    assertSameRows(Snapshot.diff(v1, v2, "id", "text"), Seq(
      Seq(1L, "unchanged"),
      Seq(2L, "changed"),
      Seq(3L, "removed"),
      Seq(4L, "unchanged"),   // NULL == NULL via null-safe compare
      Seq(5L, "added")))
  }

  test("diffSummary rolls up counts and NULL→text flips count as changed") {
    val v2b = df("id BIGINT, text STRING", Seq(
      Row(1L, "same"), Row(2L, "new"), Row(4L, "now set"), Row(5L, "fresh")))
    assertSameRows(Snapshot.diffSummary(v1, v2b, "id", "text"), Seq(
      Seq("unchanged", 1L), Seq("changed", 2L), Seq("removed", 1L), Seq("added", 1L)))
  }
}
