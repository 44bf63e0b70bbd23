package graft.operators

import org.apache.spark.sql.Row
import graft.SparkTestBase

class ExpectSpec extends SparkTestBase {

  private lazy val t = df("id BIGINT, v DOUBLE, s STRING", Seq(
    Row(1L, 5.0, "ok"),
    Row(2L, -1.0, "ok"),       // range violation
    Row(null, 5.0, "bad!"),    // null id + regex violation
    Row(1L, null, "zz"),       // dup id + oneOf violation; null v passes range
    Row(3L, 50.0, null)))      // null s passes regex/oneOf

  test("validate fuses row-local rules into one report, NULL semantics pinned") {
    val out = Expect.validate(t, Seq(
        Expect.notNull("id"),
        Expect.inRange("v", 0, 50),
        Expect.matches("s", "^[a-z]+$"),
        Expect.oneOf("s", Seq("ok", "zz"))))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      "not_null(id)" -> (1L, false),
      "in_range(v,0.0,50.0)" -> (1L, false),
      "matches(s)" -> (1L, false),
      "one_of(s)" -> (1L, false)))
    // exactly one aggregate pass: a single scan feeds every rule
    val plan = Expect.validate(t, Seq(Expect.notNull("id"),
        Expect.inRange("v", 0, 50)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("quarantine annotates rows with their violated rules, in rule order") {
    val out = Expect.quarantine(t, Seq(
        Expect.notNull("id"), Expect.inRange("v", 0, 50)))
      .collect().map(r => r.getSeq[String](3).toList)
    assert(out.toList == List(
      Nil, List("in_range(v,0.0,50.0)"), List("not_null(id)"), Nil, Nil))
  }

  test("unique and referentialIntegrity count violations") {
    val u = Expect.unique(t, Seq("id")).head()
    // ids: 1,2,null,1,3 -> 4 distinct keys (null is a key), 1 extra row
    assert(u.getLong(1) == 5L && u.getLong(2) == 1L && !u.getBoolean(3))
    val parent = df("pk BIGINT", Seq(Row(1L), Row(2L)))
    val fk = Expect.referentialIntegrity(t, "id", parent, "pk").head()
    // non-null ids: 1,2,1,3 -> one orphan (3); nulls never violate
    assert(fk.getLong(2) == 1L && !fk.getBoolean(3))
  }
}
