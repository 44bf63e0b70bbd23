package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions

class DsirSpec extends SparkTestBase {

  test("dsirBuckets emits unigram then adjacent-bigram bucket ids") {
    val d = df("text STRING", Seq(Row("ab cd ef"), Row("  "), Row("x")))
    val out = d.select(TextFunctions.dsirBuckets(col("text"), 4096).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(out(0).length == 5) // 3 unigrams + 2 bigrams
    assert(out(1).isEmpty)     // whitespace-only -> no features
    assert(out(2).length == 1)
    // unigram bucket = poly fold: 'x' = 120 -> 120 % 4096
    assert(out(2).head == 120)
    // bigram hashes the space-joined pair, not the concatenation
    val joined = d.sparkSession.sql(
      "SELECT dsir_buckets('ab cd', 4096)[2] AS b").head().getInt(0)
    def poly(s: String) =
      (s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 2000003L) % 4096).toInt
    assert(joined == poly("ab cd"))
    assert(joined != poly("abcd"))
  }

  test("gumbelTopK: weight dominates bounded noise, NULL weights never sampled") {
    val w = df("doc_id BIGINT, dsir_weight DOUBLE", Seq(
      Row(1L, 100.0), Row(2L, -100.0), Row(3L, null)))
    val top = Dsir.gumbelTopK(w, "doc_id", "dsir_weight", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // the Gumbel noise for u in ((0.5)/M, (M-0.5)/M) lies in ~(-2.7, 15),
    // so a 200-point weight gap can never flip; the NULL row sorts out
    assert(top == Seq(1L, 2L))
    // deterministic replay
    val again = Dsir.gumbelTopK(w, "doc_id", "dsir_weight", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(again.toSeq ==
      Dsir.gumbelTopK(w, "doc_id", "dsir_weight", k = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("importanceWeights favors target-like documents") {
    val docs = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "the quick brown fox", "en"),
      Row(2L, "the quick brown fox", "en"),
      Row(3L, "le renard brun rapide", "fr"),
      Row(4L, "the quick brown fox", "fr"), // raw doc that LOOKS like target
      Row(5L, "   ", "en")))                // no features
    val out = Dsir.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text",
        buckets = 512)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // target-distribution docs score higher than the off-target one
    assert(out(1L)._2.get > out(3L)._2.get)
    // weight depends only on text, not on membership labels
    assert(out(4L)._2.get == out(1L)._2.get)
    // featureless doc: 0 feats, NULL weight
    assert(out(5L) == (0L, None))
    // 4 tokens -> 4 unigrams + 3 bigrams
    assert(out(1L)._1 == 7L)
  }
}
