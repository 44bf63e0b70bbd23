package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class LmScoreSpec extends SparkTestBase {

  private lazy val train = df("text STRING", Seq(Row("a a b")))
  private lazy val docs = df("doc_id BIGINT, text STRING", Seq(
    Row(1L, "a b"), Row(2L, "z"), Row(3L, "")))

  test("unigramNll matches the hand-computed add-alpha model") {
    // c(a)=2 c(b)=1, T=3, V=2, alpha=0.5 → denom = 3 + 0.5*3 = 4.5
    val out = LmScore.unigramNll(train, "text", docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val denom = 4.5
    val nll1 = -(math.log(2.5 / denom) + math.log(1.5 / denom)) / 2
    val nll2 = -math.log(0.5 / denom)
    assert(out(0).getLong(1) == 2L && math.abs(out(0).getDouble(2) - nll1) < 1e-6)
    assert(out(1).getLong(1) == 1L && math.abs(out(1).getDouble(2) - nll2) < 1e-6)
    // empty doc: zero tokens, NULL score — present, not dropped
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
  }

  test("unseen tokens score strictly worse than seen ones") {
    val out = LmScore.unigramNll(train, "text", docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(1).getDouble(2) > out(0).getDouble(2))
  }

  test("knBigramNll matches the hand-computed interpolated KN model") {
    // train bigrams: (a,b)x2 (b,a)x2 (a,c)x1
    // ctx: a->(c1=3,n1fw=2) b->(c1=2,n1fw=1); cont: a,b,c all n1bw=1
    // nbig=3 distinct pairs, V=3, D=0.75
    val tr = df("text STRING", Seq(Row("a b a b a c")))
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b"),    // p(b|a) = (1.25 + 0.75*2*1/3)/3 = 1.75/3
      Row(2L, "x a"),    // unseen context x -> OOV floor 1/(V+1) = 0.25
      Row(3L, "z")))     // no bigrams -> NULL
    val out = LmScore.knBigramNll(tr, "text", d, "doc_id", "text")
      .orderBy("doc_id").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getLong(1) == 1L)
    assert(math.abs(out(0).getDouble(2) - r6(-math.log(1.75 / 3))) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - r6(-math.log(0.25))) < 1e-9)
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
  }

  test("mooreLewis: in-domain docs negative, off-domain positive, exact diff") {
    val target = df("text STRING", Seq(Row("a a b")))
    val general = df("text STRING", Seq(Row("a b z z")))
    val d2 = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a"), Row(2L, "z"), Row(3L, "")))
    val out = LmScore.mooreLewis(target, general, "text", d2,
        "doc_id", "text")
      .orderBy("doc_id").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // target: c(a)=2 T=3 V=2 → denom 4.5; general: c(a)=1,c(z)=2 T=4
    // V=3 → denom 6
    val dA = r6(r6(-math.log(2.5 / 4.5)) - r6(-math.log(1.5 / 6.0)))
    val dZ = r6(r6(-math.log(0.5 / 4.5)) - r6(-math.log(2.5 / 6.0)))
    assert(out(0).getDouble(2) == dA && dA < 0) // "a": in-domain
    assert(out(1).getDouble(2) == dZ && dZ > 0) // "z": off-domain
    assert(out(2).isNullAt(2))                  // empty doc
  }

  test("knTrigramNll matches the hand-computed recursion") {
    // train "a b c a b c a b d": trigram occurrences abc×2 bca×2 cab×2
    // abd×1; t23 types (b,c)(c,a)(a,b)(b,d) all ct23=1 → nbt=4, V=4
    val tr = df("text STRING", Seq(Row("a b c a b c a b d")))
    val d3 = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c"),   // full recursion, all levels seen
      Row(2L, "x a b"),   // unseen context (x,a) → floor 1/(V+1) = 0.2
      Row(3L, "a b")))    // < 3 tokens → NULL
    val out = LmScore.knTrigramNll(tr, "text", d3, "doc_id", "text")
      .orderBy("doc_id").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // p_cont(c)=1/4; p_mid(c|b)=(0.25+0.75·2·0.25)/2; p(c|ab)=
    // (1.25+0.75·2·p_mid)/3
    val pMid = (0.25 + 0.75 * 2 * 0.25) / 2.0
    val p1 = (1.25 + 0.75 * 2 * pMid) / 3.0
    assert(out(0).getLong(1) == 1L)
    assert(math.abs(out(0).getDouble(2) - r6(-math.log(p1))) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - r6(-math.log(0.2))) < 1e-9)
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
  }

  test("perplexityBuckets cuts per language, head = lowest nll, nulls last") {
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "a a b", "en"),   // pure training distribution -> head
      Row(2L, "a z", "en"),
      Row(3L, "z z z", "en"),   // all-unseen -> tail
      Row(4L, "", "en"),        // NULL nll -> sorts last (tail)
      Row(5L, "a a", "de")))    // own language partition
    val out = LmScore.perplexityBuckets(train, "text", d,
        "doc_id", "text", "lang", buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out(1L) == 1)       // best en doc in the head tier
    assert(out(4L) == 2)       // NULL nll lands in the last tier
    assert(out(5L) == 1)       // sole de doc: its own partition's head
    assert(out(3L) == 2)
  }
}
