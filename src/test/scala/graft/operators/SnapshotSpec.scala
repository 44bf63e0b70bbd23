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

  test("applyChanges merges upserts and deletes; diff∘apply reproduces v2") {
    val changes = df("id BIGINT, text STRING, op STRING", Seq(
      Row(2L, "new", "upsert"),     // replace
      Row(3L, null, "delete"),      // tombstone
      Row(5L, "fresh", "upsert")))  // insert
    assertSameRows(Snapshot.applyChanges(v1, changes, "id", "op"), Seq(
      Seq(1L, "same"), Seq(2L, "new"), Seq(4L, null), Seq(5L, "fresh")))
    // closing the loop: build the change batch FROM diff, apply, get v2
    val fromDiff = Snapshot.diff(v1, v2, "id", "text")
      .filter(org.apache.spark.sql.functions.col("status") !== "unchanged")
      .join(v2.withColumnRenamed("id", "vid"),
        org.apache.spark.sql.functions.col("id") ===
          org.apache.spark.sql.functions.col("vid"), "left")
      .selectExpr("id", "text",
        "CASE WHEN status = 'removed' THEN 'delete' ELSE 'upsert' END AS op")
    assertSameRows(Snapshot.applyChanges(v1, fromDiff, "id", "op"),
      v2.collect().map(_.toSeq))
  }

  test("applyChanges fails the job on an unknown op label") {
    val bad = df("id BIGINT, text STRING, op STRING", Seq(Row(2L, "x", "replace")))
    val e = intercept[Exception] {
      Snapshot.applyChanges(v1, bad, "id", "op").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")), e.getMessage)
  }

  test("scd2: no-op changes collapse, intervals chain half-open, NULL attrs participate") {
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val log = df("k STRING, ts TIMESTAMP, status STRING", Seq(
      Row("A", t(1), "a"), Row("A", t(2), "a"),  // no-op: must not split
      Row("A", t(3), "b"),
      Row("B", t(1), "x"),
      Row("C", t(1), null), Row("C", t(2), "v"))) // NULL is a real state
    val out = Snapshot.scd2(log, "k", "ts", Seq("status"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("A", "a", t(1), t(3), false),  // t2 no-op absorbed
      ("A", "b", t(3), null, true),
      ("B", "x", t(1), null, true),
      ("C", null, t(1), t(2), false), // NULL state closed by 'v'
      ("C", "v", t(2), null, true)))
  }
}
