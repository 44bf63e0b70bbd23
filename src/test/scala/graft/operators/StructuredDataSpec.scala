package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class StructuredDataSpec extends SparkTestBase {

  private lazy val payloads = df("id BIGINT, j STRING", Seq(
    Row(1L, """{"tool": "search", "args": {"q": "spark"}}"""),
    Row(2L, "plain prose, no json"),
    Row(3L, """{"tool": "calc""""),     // truncated → invalid
    Row(4L, "42"),                      // scalar IS a valid JSON document
    Row(5L, null)))

  test("jsonValidity flags parseable payloads, scalar documents included") {
    val v = StructuredData.jsonValidity(payloads, "id", "j")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> false))
  }

  test("extractFields pulls nested paths, NULL on malformed or missing") {
    val out = StructuredData.extractFields(payloads, "id", "j",
        Seq("tool" -> "$.tool", "query" -> "$.args.q"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (("search", "spark")))
    assert(out(2L) == ((null, null)))
    assert(out(3L) == ((null, null)))
    assert(out(4L) == ((null, null)))   // valid scalar, but no such path
  }
}
