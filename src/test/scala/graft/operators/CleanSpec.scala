package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CleanSpec extends SparkTestBase {

  private lazy val dirty = df("id BIGINT, s STRING, n BIGINT", Seq(
    Row(1L, "  hello   world ", 1L),
    Row(2L, "N/A", 2L),
    Row(3L, "  NULL ", 3L),
    Row(4L, "-", 4L),
    Row(5L, "ok", 5L),
    Row(6L, null, 6L)))

  test("cleanStrings: whitespace collapsed, junk spellings nulled, non-strings untouched") {
    val out = Clean.cleanStrings(dirty).orderBy("id").collect()
    assert(out(0).getString(1) == "hello world")
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
    assert(out(4).getString(1) == "ok")
    assert(out(5).isNullAt(1))
    assert(out.map(_.getLong(2)).toSeq == (1L to 6L))
  }

  test("normalizeNewlines: CRLF/CR → LF, trailing space stripped, blank runs capped") {
    val out = df("s STRING", Seq(
      Row("a\r\nb\rc\nd"),           // all three line-ending styles
      Row("x  \t\ny"),                // trailing whitespace before break
      Row("p\n\n\n\n\nq"),            // blank-line run → one blank line
      Row("keep\n\nparagraph")))      // a single blank line is preserved
      .select(Clean.normalizeNewlines(col("s"))).collect().map(_.getString(0))
    assert(out(0) == "a\nb\nc\nd")
    assert(out(1) == "x\ny")
    assert(out(2) == "p\n\nq")
    assert(out(3) == "keep\n\nparagraph")
  }

  test("tryCast: parseable values cast, junk becomes NULL (no ANSI throw)") {
    val out = df("v STRING", Seq(Row("12"), Row("12.5"), Row("x"), Row("")))
      .select(Clean.tryCast(col("v"), "double").as("d")).collect()
    assert(out(0).getDouble(0) == 12.0)
    assert(out(1).getDouble(0) == 12.5)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
  }
}
