package graft

import graft.model.CustomStage
import graft.pipeline.PipelineExecutor
import org.apache.spark.sql.Row

/** The native expressions must be reachable from SQL — which means a
  * CUSTOM stage (the reference's escape hatch) can run the training-data
  * primitives without any Scala. */
class GraftExtensionsSpec extends SparkTestBase {

  test("native functions resolve by SQL name with literal parameters") {
    val r = spark.sql(
      """SELECT
        |  native_cosine(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS cos,
        |  native_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  native_l2_distance(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS dist,
        |  size(minhash_sig(hashed_shingles('a b c d e', 3), 16)) AS sig_len,
        |  size(band_keys(array(1.0d, -2.0d, 0.5d), 4, 8)) AS n_bands,
        |  size(winnowed_fingerprints('one two three four five six', 2, 3)) AS n_fp,
        |  simhash64(hashed_tokens('hello world')) AS fp
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getInt(3) == 16)
    assert(r.getInt(4) == 4)
    assert(r.getInt(5) >= 1)
    assert(r.getLong(6) != 0L)
  }

  test("round-4 quality/shingle natives resolve by SQL name") {
    val r = spark.sql(
      """SELECT
        |  quality_metrics('the quick brown fox and the lazy dog').n_words AS nw,
        |  quality_metrics('the quick brown fox and the lazy dog').n_stopwords AS ns,
        |  repetition_metrics('go go go go', 2).top_count AS topc,
        |  gopher_keep('short text', 50, 100000) AS keep_short,
        |  string_shingles('a b c', 2) AS sh
        |""".stripMargin).head()
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) == 3)   // the, and, the
    assert(r.getLong(2) == 3L) // "go go" x3
    assert(!r.getBoolean(3))   // fails the word-count floor
    assert(r.getSeq[String](4) == Seq("a b", "b c"))
  }

  test("nfc_normalize resolves by SQL name and composes decomposed text") {
    val r = spark.sql(
      "SELECT nfc_normalize('e\u0301clair') AS t, nfc_normalize(NULL) AS n").head()
    assert(r.getString(0) == "\u00e9clair" && r.getString(0).length == 6)
    assert(r.isNullAt(1))
  }

  test("a CUSTOM stage can run a dedup primitive end-to-end in SQL") {
    val ex = new PipelineExecutor(spark)
    ex.register("docs_sql", df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog"),
      Row(2L, "the quick brown fox jumps over the lazy dog"),
      Row(3L, "completely different content here"))))
    val out = ex.run(Seq(CustomStage("s1", "pair identical docs via simhash",
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM docs_sql a JOIN docs_sql b " +
        "ON simhash64(hashed_tokens(a.text)) = simhash64(hashed_tokens(b.text)) " +
        "AND a.doc_id < b.doc_id")))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("composed expression functions resolve by SQL name") {
    val r = spark.sql(
      "SELECT u, t, p.latin AS lat FROM (SELECT " +
        "canonical_url('HTTPS://A.com:443/p?utm_source=m&x=1#f') AS u, " +
        "extract_html_text('<p>hi</p><script>x()</script>') AS t, " +
        "script_profile('ab 你好') AS p)").head()
    assert(r.getString(0) == "https://a.com/p?x=1")
    assert(r.getString(1) == "hi")
    assert(r.getDouble(2) == 0.4)
  }

  test("topk_pairs aggregates by SQL name with the heap's tie order") {
    val out = spark.sql(
      "SELECT g, topk_pairs(s, id, 2) AS top FROM VALUES " +
        "('a', 3.0, 10L), ('a', 3.0, 11L), ('a', 1.0, 12L), " +
        "('b', 5.0, 20L) AS t(g, s, id) " +
        "GROUP BY g ORDER BY g").collect()
    val a = out(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    // score ties keep the SMALLER id first — the window-parity order
    assert(a == Seq((3.0, 10L), (3.0, 11L)))
    val b = out(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(b == Seq((5.0, 20L)))
  }

  test("non-literal size parameters are rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(hashed_shingles('a b c', 3), doc_id) " +
        "FROM (SELECT 1 AS doc_id)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
