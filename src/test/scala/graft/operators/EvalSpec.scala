package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("rankedRetrieval: recall/MRR/nDCG hand-computed; zero rows for missed queries") {
    // q1: gold {a,b,c}; results x,a,b → hits 2 at ranks 2,3
    // q2: gold {a}; results miss entirely
    // q3: in gold only — retriever returned nothing
    val results = Seq(
      (1L, "x", 1L), (1L, "a", 2L), (1L, "b", 3L),
      (2L, "y", 1L), (2L, "z", 2L)).toDF("query_id", "doc_id", "rank")
    val gold = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (3L, "a"))
      .toDF("query_id", "doc_id")
    val out = Eval.rankedRetrieval(results, gold, "query_id", "doc_id", "rank", k = 3)
      .orderBy("query_id").collect()

    assert(out.length == 3)
    val Row(q1, ng1, h1, rec1, mrr1, ndcg1) = out(0)
    assert((q1, ng1, h1) == (1L, 3L, 2L))
    assert(rec1 == 0.666667) // round(2/3, 6)
    assert(mrr1 == 0.5)      // first relevant at rank 2
    // dcg = round(1/log2(3),9) + round(1/log2(4),9); idcg = 1 + those terms
    val t3 = BigDecimal(1.0 / (math.log(3.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val dcg = (t3 + BigDecimal("0.5")).toDouble
    val idcg = (BigDecimal(1) + t3 + BigDecimal("0.5")).toDouble
    assert(math.abs(ndcg1.asInstanceOf[Double] -
      BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1) == Row(2L, 1L, 0L, 0.0, 0.0, 0.0))
    assert(out(2) == Row(3L, 1L, 0L, 0.0, 0.0, 0.0))
  }

  test("rankedRetrieval ignores results beyond k and duplicate gold rows") {
    val results = Seq((1L, "a", 5L)).toDF("query_id", "doc_id", "rank")
    val gold = Seq((1L, "a"), (1L, "a")).toDF("query_id", "doc_id")
    val hit = Eval.rankedRetrieval(results, gold, "query_id", "doc_id", "rank", k = 5)
      .collect()(0)
    assert(hit.getLong(1) == 1L && hit.getLong(2) == 1L) // dup collapsed, rank 5 counted
    val miss = Eval.rankedRetrieval(results, gold, "query_id", "doc_id", "rank", k = 4)
      .collect()(0)
    assert(miss.getLong(2) == 0L) // rank 5 > k=4 excluded
  }

  test("fleissKappa: hand-computed 3-rater example; short panels dropped") {
    // item A unanimous (P_A = 1), item B 1-vs-2 (P_B = 1/3):
    // P̄ = 2/3; p_yes = 4/6, p_no = 2/6 → P̄e = 5/9; κ = (1/9)/(4/9) = 0.25
    val ratings = Seq(
      ("A", "yes"), ("A", "yes"), ("A", "yes"),
      ("B", "yes"), ("B", "no"), ("B", "no"),
      ("C", "yes"), ("C", "yes")) // only 2 ratings → dropped
      .toDF("item", "label")
    val out = Eval.fleissKappa(ratings, "item", "label", nRaters = 3).collect()(0)
    assert(out.getLong(0) == 2L)
    assert(out.getDouble(1) == 0.666667)
    assert(out.getDouble(2) == 0.555556)
    assert(out.getDouble(3) == 0.25)

    val unanimous = Seq.fill(3)(("A", "x")) ++ Seq.fill(3)(("B", "x"))
    val const = Eval.fleissKappa(unanimous.toDF("item", "label"),
      "item", "label", nRaters = 3).collect()(0)
    assert(const.isNullAt(3)) // pe = 1 → undefined
  }

  test("krippendorffAlpha: hand-computed with missing ratings; degenerate cases") {
    // A (yes,yes): no disagreement; B (yes,no): term 2; C (yes): unpairable, drops
    // n=4, Do=2/4=0.5; n_yes=3, n_no=1 → De=(16−10)/12=0.5 → α = 0
    val r = Seq(("A", "yes"), ("A", "yes"), ("B", "yes"), ("B", "no"), ("C", "yes"))
    val out = Eval.krippendorffAlpha(r.toDF("item", "label"), "item", "label")
      .collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == 0.5 && out.getDouble(3) == 0.5)
    assert(out.getDouble(4) == 0.0)

    // perfect within-item agreement across distinct labels → α = 1
    val perfect = Seq(("A", "yes"), ("A", "yes"), ("B", "no"), ("B", "no"))
    val p = Eval.krippendorffAlpha(perfect.toDF("item", "label"), "item", "label")
      .collect()(0)
    assert(p.getDouble(2) == 0.0 && p.getDouble(4) == 1.0)

    // one label everywhere → De = 0 → α undefined
    val const = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
    val c = Eval.krippendorffAlpha(const.toDF("item", "label"), "item", "label")
      .collect()(0)
    assert(c.isNullAt(4))
  }

  test("cohenKappa matches the textbook example; constant raters → NULL κ") {
    // 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes: po=0.7, pe=0.5, κ=0.4
    val labels =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
        Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val out = Eval.cohenKappa(labels.toDF("a", "b"), "a", "b").collect()(0)
    assert(out == Row(50L, 35L, 0.7, 0.5, 0.4))

    val const = Eval.cohenKappa(
      Seq.fill(4)(("x", "x")).toDF("a", "b"), "a", "b").collect()(0)
    assert(const.getLong(0) == 4L && const.isNullAt(4)) // pe = 1 → undefined

    // NULL labels excluded
    val withNulls = Eval.cohenKappa(
      Seq(("x", "x"), (null, "x"), ("x", null)).toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(withNulls.getLong(0) == 1L)

    // disjoint label vocabularies: the marginal join is empty, so
    // p_e = 0 (not NULL) and κ = p_o = 0
    val disjoint = Eval.cohenKappa(
      Seq(("x", "p"), ("y", "q")).toDF("a", "b"), "a", "b").collect()(0)
    assert(disjoint.getDouble(3) == 0.0 && disjoint.getDouble(4) == 0.0)
  }

  test("classificationReport: per-class counts, NULL semantics for absent classes") {
    import spark.implicits._
    // gold: a,a,a,b,b,c ; pred: a,a,b,b,b,b -> c never predicted,
    // d predicted once but never gold
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "d")).toDF("gold", "pred")
    val out = Eval.classificationReport(d, "gold", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("support") == 3L && a.getAs[Long]("tp") == 2L &&
      a.getAs[Long]("fp") == 0L && a.getAs[Long]("fn") == 1L)
    assert(a.getAs[Double]("precision") == 1.0)
    assert(a.getAs[Double]("recall") == math.rint(2.0 / 3 * 1e6) / 1e6)
    val b = out("b")
    assert(b.getAs[Long]("tp") == 2L && b.getAs[Long]("fp") == 1L)
    // c: gold-only -> precision NULL (never predicted), recall 0
    val c = out("c")
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1")))
    // d: predicted-only -> support 0, recall NULL, precision 0
    val dd = out("d")
    assert(dd.getAs[Long]("support") == 0L && dd.getAs[Long]("fp") == 1L)
    assert(dd.isNullAt(dd.fieldIndex("recall")))
    assert(dd.getAs[Double]("precision") == 0.0)
    // f1 for a: harmonic mean of rounded precision/recall
    val p = 1.0; val r = 0.666667
    assert(a.getAs[Double]("f1") ==
      math.rint(2 * p * r / (p + r) * 1e6) / 1e6)
  }

  test("tokenF1: bag overlap with multiplicity, NULL denominators, exact match") {
    val in = Seq(
      (1L, "a b a c", "a a b d"),   // overlap min-counts: a:2, b:1 → 3
      (2L, " x  y ", "x y"),        // whitespace-normalized exact match
      (3L, "", "a"),                // empty pred: precision NULL, recall 0
      (4L, "", "")                  // both empty: all ratios NULL, EM 1
    ).toDF("id", "pred", "gold")
    val out = Eval.tokenF1(in, "id", "pred", "gold")
      .orderBy("id").collect()
    assert(out(0) == Row(1L, 4L, 4L, 3L, 0.75, 0.75, 0.75, 0))
    assert(out(1) == Row(2L, 2L, 2L, 2L, 1.0, 1.0, 1.0, 1))
    val r3 = out(2)
    assert(r3.getLong(1) == 0L && r3.getLong(3) == 0L)
    assert(r3.isNullAt(r3.fieldIndex("precision")))
    assert(r3.getAs[Double]("recall") == 0.0 && r3.getAs[Double]("f1") == 0.0)
    val r4 = out(3)
    assert(r4.isNullAt(r4.fieldIndex("precision")) &&
      r4.isNullAt(r4.fieldIndex("recall")) && r4.isNullAt(r4.fieldIndex("f1")))
    assert(r4.getAs[Int]("exact_match") == 1)
  }

  test("aucRoc: average ranks on ties, hand-computed; degenerate class -> NULL") {
    // sorted asc: 0.1(-) r1; {0.8(-), 0.8(+)} avg rank 2.5; 0.9(+) r4
    // AUC = (2.5 + 4 - 2·3/2) / (2·2) = 0.875
    val d = Seq((0.9, true), (0.8, false), (0.8, true), (0.1, false))
      .toDF("score", "label")
    val r = Eval.aucRoc(d, "score", "label").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("auc") == 0.875)
    // perfect separation -> 1.0; reversed -> 0.0
    val perfect = Seq((0.9, true), (0.1, false)).toDF("score", "label")
    assert(Eval.aucRoc(perfect, "score", "label").collect()(0)
      .getAs[Double]("auc") == 1.0)
    // one class only -> NULL
    val onecls = Seq((0.9, true), (0.1, true)).toDF("score", "label")
    assert(Eval.aucRoc(onecls, "score", "label").collect()(0).isNullAt(2))
  }

  test("calibrationBins: bin edges, clamping, ECE terms sum to the gap") {
    val d = Seq((0.05, false), (0.05, true), (0.95, true), (1.2, true))
      .toDF("score", "label")
    val out = Eval.calibrationBins(d, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getInt(0) == 0 && b0.getLong(1) == 2L)
    assert(b0.getAs[Double]("avg_score") == 0.05 &&
      b0.getAs[Double]("pos_rate") == 0.5)
    assert(b0.getAs[Double]("ece_term") == 0.225) // (2/4)·|0.05−0.5|
    val b9 = out(1)
    assert(b9.getInt(0) == 9 && b9.getLong(1) == 2L)
    assert(b9.getAs[Double]("avg_score") == 0.975) // 1.2 clamped to 1.0
    assert(b9.getAs[Double]("pos_rate") == 1.0)
    assert(b9.getAs[Double]("ece_term") == 0.0125)
  }

  test("rougeN: clipped bigram overlap; short texts get NULL ratios") {
    val in = Seq(
      (1L, "the cat sat", "the cat ran"),  // bigrams: {the cat, cat sat} vs {the cat, cat ran} -> 1
      (2L, "a", "a b c"),                  // pred too short for bigrams
      (3L, "a b a b", "a b a")             // pred {ab, ba, ab} vs gold {ab, ba}: clip ab at 1 -> 2
    ).toDF("id", "pred", "gold")
    val out = Eval.rougeN(in, "id", "pred", "gold", n = 2).orderBy("id").collect()
    assert(out(0) == Row(1L, 2L, 2L, 1L, 0.5, 0.5, 0.5))
    val r2 = out(1)
    assert(r2.getLong(1) == 0L && r2.isNullAt(r2.fieldIndex("precision")))
    assert(r2.getAs[Double]("recall") == 0.0)
    assert(out(2) == Row(3L, 3L, 2L, 2L, 0.666667, 1.0, 0.8))
  }

  test("rougeL: subsequence beats n-gram on reordering; plan is shuffle-free") {
    val in = Seq(
      (1L, "a x b y c", "a b c"),   // LCS 3: non-contiguous in-order match
      (2L, "c b a", "a b c"),       // reversal: LCS 1
      (3L, "same text here", "same text here")
    ).toDF("id", "pred", "gold")
    val out = Eval.rougeL(in, "id", "pred", "gold").orderBy("id").collect()
    assert(out(0) == Row(1L, 5L, 3L, 3L, 0.6, 1.0, 0.75))
    assert(out(1) == Row(2L, 3L, 3L, 1L, 0.333333, 0.333333, 0.333333))
    assert(out(2) == Row(3L, 3L, 3L, 3L, 1.0, 1.0, 1.0))
    // zero shuffles: a pure projection must have no Exchange in the plan
    val plan = Eval.rougeL(in, "id", "pred", "gold")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("corpusChrF: whitespace stripped, effective orders, beta=2 recall weighting") {
    // whitespace-insensitive: "a b c" ≡ "abc" after stripping → perfect
    val same = Seq((1L, "a b c", "abc")).toDF("id", "pred", "gold")
    val r1 = Eval.corpusChrF(same, "id", "pred", "gold", maxN = 2).collect()(0)
    assert(r1.getAs[Double]("chrf") == 1.0 && r1.getAs[Long]("pred_chars") == 3L)

    // unigram-only hand case: P = R = 2/3 → F_β = 2/3 for any β
    val uni = Seq((1L, "abc", "abd")).toDF("id", "pred", "gold")
    val r2 = Eval.corpusChrF(uni, "id", "pred", "gold", maxN = 1).collect()(0)
    assert(r2.getAs[Double]("precision") == 0.666667 &&
      r2.getAs[Double]("recall") == 0.666667 &&
      r2.getAs[Double]("chrf") == 0.666667)

    // order 3 has no mass on either side ("ab" / "ab") → skipped, not
    // zero-averaged: orders 1,2 are perfect so chrf stays 1.0
    val short0 = Seq((1L, "ab", "ab")).toDF("id", "pred", "gold")
    val r3 = Eval.corpusChrF(short0, "id", "pred", "gold", maxN = 3).collect()(0)
    assert(r3.getAs[Double]("chrf") == 1.0)

    // beta = 2 weights recall: pred "ab" vs gold "abcd" at maxN=1 —
    // P = 1, R = 1/2 → chrF2 = 5·(1/2)/(4+1/2) = 5/9
    val rec = Seq((1L, "ab", "abcd")).toDF("id", "pred", "gold")
    val r4 = Eval.corpusChrF(rec, "id", "pred", "gold", maxN = 1).collect()(0)
    assert(r4.getAs[Double]("chrf") ==
      BigDecimal(5.0 / 9.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("corpusBleu: pooled clipped precisions, brevity penalty, zero n-gram rule") {
    // identical pair → every p_n = 1, BP = 1, BLEU = 1
    val same = Seq((1L, "the cat sat on the mat", "the cat sat on the mat"))
      .toDF("id", "pred", "gold")
    val r1 = Eval.corpusBleu(same, "id", "pred", "gold").collect()(0)
    assert(r1.getAs[Double]("bleu") == 1.0 &&
      r1.getAs[Double]("brevity_penalty") == 1.0 &&
      r1.getAs[Double]("p_4") == 1.0)

    // short pred, perfect prefix: p1 = p2 = 1, BP = e^(1 - 4/2)
    val short0 = Seq((1L, "the cat", "the cat sat on")).toDF("id", "pred", "gold")
    val r2 = Eval.corpusBleu(short0, "id", "pred", "gold", maxN = 2).collect()(0)
    val bp = BigDecimal(math.exp(1.0 - 4.0 / 2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getAs[Double]("brevity_penalty") ==
      BigDecimal(bp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(r2.getAs[Double]("bleu") - bp) < 1e-6)

    // corpus pooling across rows: p1 = 5/6, p2 = 3/4 → BLEU ≈ √(p1·p2)
    val mix = Seq((1L, "a b c", "a b c"), (2L, "a b d", "a b x"))
      .toDF("id", "pred", "gold")
    val r3 = Eval.corpusBleu(mix, "id", "pred", "gold", maxN = 2).collect()(0)
    assert(r3.getAs[Double]("p_1") == 0.833333 && r3.getAs[Double]("p_2") == 0.75)
    assert(math.abs(r3.getAs[Double]("bleu") -
      math.sqrt(0.833333333 * 0.75)) < 1e-5)

    // any pooled p_n = 0 → unsmoothed BLEU is 0 (here: no 2-gram matches)
    val none = Seq((1L, "a b", "b a")).toDF("id", "pred", "gold")
    val r4 = Eval.corpusBleu(none, "id", "pred", "gold", maxN = 2).collect()(0)
    assert(r4.getAs[Double]("p_1") == 1.0 && r4.getAs[Double]("p_2") == 0.0 &&
      r4.getAs[Double]("bleu") == 0.0)
  }

  test("knnLabelNoise: neighborhood majority flags disagreeing labels; ties to smallest") {
    import spark.implicits._
    // q1's 3 neighbors vote B,B,A → majority B; own label A → suspect.
    // q2's 2 neighbors vote A,B (tie) → smallest label A; own A → clean.
    val topk = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
      .toDF("query_id", "vec_id")
    val labels = Seq((1L, "A"), (2L, "A"), (10L, "B"), (11L, "A"),
      (12L, "B")).toDF("id", "label")
    val out = Eval.knnLabelNoise(topk, "query_id", "vec_id",
        labels, "id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(6))))
      .toMap
    // q1 neighbors: 10=B, 11=A, 12=B → B majority 2/3
    assert(out(1L) == (("B", 3L, 2L, true)))
    // q2 neighbors: 10=B, 11=A → 1-1 tie → "A" (smallest), own A → clean
    assert(out(2L) == (("A", 2L, 1L, false)))
  }

  test("wordErrorRate: hand-computed word-level Levenshtein cases") {
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, hyp STRING, ref STRING", Seq(
      Row(1L, "the cat sat", "the cat sat down"),    // 1 insertion
      Row(2L, "a b a", "b a c"),                     // delete + substitute
      Row(3L, "x y z", "x y z"),                     // exact
      Row(4L, "completely different words", "alpha beta"), // 2 sub + 1 del
      Row(5L, "", "ref only"),                       // all insertions
      Row(6L, "hyp only words", "")))                // empty ref
    val out = Eval.wordErrorRate(d, "id", "hyp", "ref").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(out(1L) == ((4L, 3L, 1L, 0.25)))
    assert(out(2L) == ((3L, 3L, 2L, BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(3L) == ((3L, 3L, 0L, 0.0)))
    assert(out(4L) == ((2L, 3L, 3L, 1.5))) // WER can exceed 1
    assert(out(5L) == ((2L, 0L, 2L, 1.0)))
    // empty reference: edits = |hyp| insertions, WER undefined (NULL)
    assert(out(6L) == ((0L, 3L, 3L, -1.0)))
    // corpus pooling: Σedits / Σ|ref| over all six rows
    val pooled = Eval.corpusWer(d, "id", "hyp", "ref").collect()(0)
    assert(pooled.getLong(0) == 6L && pooled.getLong(1) == 14L)
    assert(pooled.getLong(2) == 11L)
    assert(pooled.getDouble(3) == BigDecimal(11.0 / 14)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("tokenErrorRate: caller-chosen granularity (chars reproduce kitten/sitting = 3)") {
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, h ARRAY<STRING>, r ARRAY<STRING>", Seq(
      Row(1L, "kitten".split("").toSeq, "sitting".split("").toSeq),
      Row(2L, Seq("multi", "char", "tokens"), Seq("multi", "chars", "tokens"))))
    val out = Eval.tokenErrorRate(d, "id", "h", "r").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 3L) // the classic example
    assert(out(2L) == 1L) // one substitution, whole-token equality
  }

  test("rbo: identical, swapped and disjoint top-2 rankings at p = 0.5") {
    import org.apache.spark.sql.Row
    def ranking(scores: (Long, Double)*) =
      df("item BIGINT, s DOUBLE", scores.map { case (i, v) => Row(i, v) })
    val a = ranking(1L -> 9.0, 2L -> 5.0)
    // identical: rbo@2 = (1-p)(p^0·1/1 + p^1·2/2) = 0.5·1.5 = 0.75
    val same = Eval.rbo(a, a, "item", "s", k = 2, p = 0.5).head()
    assert(same.getInt(0) == 2 && same.getDouble(1) == 0.5)
    assert(same.getAs[Double]("rbo") == 0.75)
    // swapped heads: d=1 overlap 0, d=2 overlap 2 -> 0.5·(0 + 0.5·1) = 0.25
    val b = ranking(1L -> 5.0, 2L -> 9.0)
    assert(Eval.rbo(a, b, "item", "s", k = 2, p = 0.5)
      .head().getAs[Double]("rbo") == 0.25)
    // disjoint item sets -> 0
    val c = ranking(7L -> 9.0, 8L -> 5.0)
    assert(Eval.rbo(a, c, "item", "s", k = 2, p = 0.5)
      .head().getAs[Double]("rbo") == 0.0)
    // p that is not a negative power of two is rejected
    assertThrows[IllegalArgumentException] {
      Eval.rbo(a, b, "item", "s", k = 2, p = 0.9)
    }
  }

  test("conformal: finite-sample order statistic, coverage, and the no-guarantee case") {
    val cal = df("s DOUBLE", (1 to 10).map(i => Row(i.toDouble)))
    val test = df("s DOUBLE", Seq(Row(5.0), Row(9.5), Row(10.0)))
    // alpha=0.2: rank = ceil(11*0.8) = 9 -> threshold = 9.0; 1 of 3 covered
    val r = Eval.conformal(cal, test, "s", alpha = 0.2).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 9L)
    assert(r.getDouble(2) == 9.0)
    assert(r.getLong(3) == 3L && r.getDouble(4) == 0.333333)
    // alpha too small for n: rank 11 > 10 -> NULL threshold and coverage
    val ng = Eval.conformal(cal, test, "s", alpha = 0.01).head()
    assert(ng.getLong(1) == 11L && ng.isNullAt(2) && ng.isNullAt(4))
  }

  test("conformal: empty calibration set still yields the one-row contract") {
    val cal = df("s DOUBLE", Seq.empty[Row])
    val test = df("s DOUBLE", Seq(Row(5.0), Row(9.5)))
    val out = Eval.conformal(cal, test, "s", alpha = 0.1).collect()
    assert(out.length == 1, s"expected one head row, got ${out.length}")
    val r = out.head
    // n_cal = 0, rank = ceil(1*0.9) = 1 > 0 -> NULL threshold/coverage,
    // but n_test still reports
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.isNullAt(2) && r.getLong(3) == 2L && r.isNullAt(4))
  }

  test("brierDecomposition: perfect scorer and pure-noise bin, identity holds") {
    // perfect: brier 0, rel 0; two pure bins split the base rate 0.5
    val perfect = df("s DOUBLE, y BOOLEAN", Seq(
      Row(1.0, true), Row(0.0, false)))
    val p = Eval.brierDecomposition(perfect, "s", "y").head()
    assert(p.getLong(0) == 2L)
    assert(p.getDouble(1) == 0.0)   // brier
    assert(p.getDouble(2) == 0.0)   // reliability
    assert(p.getDouble(3) == 0.25)  // resolution = base-rate variance
    assert(p.getDouble(4) == 0.25)  // uncertainty
    // one bin, 0.5 scores over a 50/50 outcome: calibrated but useless —
    // rel 0, res 0, brier = unc = 0.25 (identity exact: one constant bin)
    val noise = df("s DOUBLE, y BOOLEAN", Seq(
      Row(0.5, true), Row(0.5, false)))
    val q = Eval.brierDecomposition(noise, "s", "y").head()
    assert(q.getDouble(1) == 0.25 && q.getDouble(2) == 0.0 &&
      q.getDouble(3) == 0.0 && q.getDouble(4) == 0.25)
  }
}
