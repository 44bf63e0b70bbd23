package graft.functions

import graft.SparkTestBase
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {

  private def one(text: String) = df("text STRING", Seq(Row(text)))

  test("token count over whitespace") {
    val out = one("  the quick   brown fox ").select(TF.tokenCount(col("text")))
    assert(out.head().getInt(0) == 4)
  }

  test("word shingles of n=2; short docs yield one whole-doc shingle") {
    val out = one("a b c").select(TF.wordShingles(TF.tokens(col("text")), 2))
    assert(out.head().getSeq[String](0) == Seq("a b", "b c"))
    val short = one("a").select(TF.wordShingles(TF.tokens(col("text")), 3))
    assert(short.head().getSeq[String](0) == Seq("a"))
  }

  test("char shingles") {
    val out = one("abcd").select(TF.charShingles(col("text"), 3))
    assert(out.head().getSeq[String](0) == Seq("abc", "bcd"))
  }

  test("jaccard of hashed shingle sets: identical docs = 1.0, disjoint = 0.0") {
    val d = df("a STRING, b STRING", Seq(Row("x y z w", "x y z w"), Row("a b c d", "p q r s")))
    val out = d.select(TF.jaccard(
      TF.hashedShingleSet(col("a"), 2), TF.hashedShingleSet(col("b"), 2)))
    val vals = out.collect().map(_.getDouble(0)).toSeq
    assert(vals == Seq(1.0, 0.0))
  }

  test("langId picks the language with most stopword hits, und when none") {
    val d = df("text STRING", Seq(
      Row("the cat sat on the mat and it is happy"),
      Row("el perro y el gato en la casa es que"),
      Row("der hund und die katze ist nicht ein"),
      Row("xyzzy plugh")))
    val out = d.select(TF.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "de", "und"))
  }

  test("quality score stays in [0,1] and rewards diverse alnum text") {
    val d = df("text STRING", Seq(
      Row("The quick brown fox jumps over the lazy dog near the riverbank today"),
      Row("!!! ??? ### $$$"),
      Row("")))
    val scores = d.select(TF.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("content fingerprint is whitespace/case-insensitive") {
    val d = df("a STRING, b STRING",
      Seq(Row("Hello   World", "hello world"), Row("abc", "xyz")))
    val out = d.select(
      (TF.contentFingerprint(col("a")) === TF.contentFingerprint(col("b"))).as("same"))
    assert(out.collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("winnowed fingerprints are a subset of shingle hashes and non-empty") {
    val out = one("one two three four five six seven eight nine ten")
      .select(TF.winnowedFingerprints(col("text"), k = 3, w = 2).as("fp"),
        transform(TF.wordShingles(TF.tokens(col("text")), 3), s => xxhash64(s)).as("all"))
    val r = out.head()
    val fp = r.getSeq[Long](0).toSet
    val all = r.getSeq[Long](1).toSet
    assert(fp.nonEmpty && fp.subsetOf(all))
  }

  test("native string shingles are value-identical to the wordShingles HOF on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      TF.stringShingles(lower(col("text")), 2).as("native"),
      TF.wordShingles(TF.tokens(lower(col("text"))), 2).as("hof"),
      TF.stringShingles(col("text"), 5).as("native5"),
      TF.wordShingles(TF.tokens(col("text")), 5).as("hof5"))
    out.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](3))
    }
    // short-doc degenerate: fewer tokens than n → one whole-doc shingle
    val tiny = one("alpha beta").select(
      TF.stringShingles(col("text"), 5).as("n"),
      TF.wordShingles(TF.tokens(col("text")), 5).as("h"))
    val t = tiny.head()
    assert(t.getSeq[String](0) == t.getSeq[String](1) &&
      t.getSeq[String](0) == Seq("alpha beta"))
    // shingle hashes of the strings equal hashed_shingles (positional)
    import org.apache.spark.sql.graftshim.CatalystBridge
    val pin = one("one two three four five").select(
      transform(TF.stringShingles(col("text"), 3), s => xxhash64(s)).as("viaStr"),
      CatalystBridge.column(HashedShingles(
        CatalystBridge.expression(col("text")), 3, distinct = false)).as("direct"))
    val p = pin.head()
    assert(p.getSeq[Long](0) == p.getSeq[Long](1))
  }

  test("native winnowing is value-identical to the HOF formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      TF.winnowedFingerprints(col("text")).as("native"),
      TF.winnowedFingerprintsHof(col("text")).as("hof"),
      TF.winnowedFingerprints(col("text"), k = 2, w = 7).as("native_short"),
      TF.winnowedFingerprintsHof(col("text"), k = 2, w = 7).as("hof_short"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
    // degenerate: fewer shingles than the window → single global min
    val tiny = one("alpha beta").select(
      TF.winnowedFingerprints(col("text"), k = 5, w = 4).as("n"),
      TF.winnowedFingerprintsHof(col("text"), k = 5, w = 4).as("h"))
    val t = tiny.head()
    assert(t.getSeq[Long](0) == t.getSeq[Long](1) && t.getSeq[Long](0).length == 1)
  }

  test("nfc_normalize composes decomposed text; normalized input passes through") {
    val rows = Seq(
      "e\u0301clair",      // e + combining acute -> composed e-acute
      "caf\u00e9",          // already composed -- unchanged
      "A\u030a",            // A + combining ring -> composed Angstrom A
      "plain ascii").map(s => org.apache.spark.sql.Row(s))
    val d = df("text STRING", rows)
    val out = d.select(TF.nfcNormalize(col("text"))).collect().map(_.getString(0))
    assert(out(0) == "\u00e9clair" && out(0).length == 6)
    assert(out(1) == "caf\u00e9")
    assert(out(2) == "\u00c5" && out(2).length == 1)
    assert(out(3) == "plain ascii")
    // dedup consequence: canonically-equivalent spellings now hash together
    val pair = df("text STRING", Seq(
      org.apache.spark.sql.Row("re\u0301sume\u0301"),
      org.apache.spark.sql.Row("r\u00e9sum\u00e9")))
    assert(pair.select(TF.nfcNormalize(col("text"))).distinct().count() == 1L)
    // null flows through (UnaryExpression null-safety)
    val n = df("text STRING", Seq(org.apache.spark.sql.Row(null)))
    assert(n.select(TF.nfcNormalize(col("text"))).head().isNullAt(0))
  }

  test("scriptProfile: exact character-class fractions; empty and null are all-zero") {
    import org.apache.spark.sql.Row
    val d = df("text STRING", Seq(
      Row("abc 你好"),        // 3 latin, 1 space, 2 CJK of 6
      Row("При 12"),   // 3 cyrillic, 1 space, 2 digits of 6
      Row("١٢~"),           // 2 arabic-indic digits + 1 other of 3
      Row(""), Row(null)))
    val out = d.select(TF.scriptProfile(col("text")).as("p")).select("p.*").collect()
    def f(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(0) == f(3.0 / 6) && out(0).getDouble(3) == f(2.0 / 6)
      && out(0).getDouble(2) == f(1.0 / 6) && out(0).getDouble(6) == 0.0)
    assert(out(1).getDouble(4) == f(3.0 / 6) && out(1).getDouble(1) == f(2.0 / 6))
    assert(out(2).getDouble(5) == f(2.0 / 3) && out(2).getDouble(6) == f(1.0 / 3))
    assert(out(3).toSeq.forall(_ == 0.0) && out(4).toSeq.forall(_ == 0.0))
  }

  test("native scriptProfile is bit-identical to the seven-regex HOF formulation") {
    import org.apache.spark.sql.Row
    val d = df("text STRING", Seq(
      Row("abc 你好 Привет مرحبا 123 ~!@"),
      Row("😀 emoji is one 'other' codepoint"),  // astral char
      Row("tabs\tand\nnewlines\r"),
      Row(""), Row(null)))
    val native = d.select(TF.scriptProfile(col("text")).as("p")).select("p.*")
      .collect().map(_.toSeq).toSeq
    val hof = d.select(TF.scriptProfileHof(col("text")).as("p")).select("p.*")
      .collect().map(_.toSeq).toSeq
    assert(native == hof)
    // the astral char counts once (codepoints, not UTF-16 units)
    val emoji = native(1).map(_.asInstanceOf[Double])
    assert(math.abs(emoji.sum - 1.0) < 1e-5) // 7 independently-rounded fractions
  }

  test("Simpson diversity: 0 for single-symbol runs, rising with variety") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "aaaa"),            // one char class → char_div 0
      Row(2L, "abcd"),            // all distinct → 1 - 4/16 = 0.75
      Row(3L, "spam spam spam"),  // one token → token_div 0
      Row(4L, ""),                // empty → char_div 0 by definition
      Row(5L, "x y z")))          // 3 distinct tokens → 1 - 3/9
    val out = d.select(col("doc_id"),
        TF.charDiversity(col("text")).as("c"),
        TF.tokenDiversity(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 0.0)
    assert(out(2L)._1 == 0.75)
    assert(out(3L)._2 == 0.0)
    assert(out(4L)._1 == 0.0)
    assert(out(5L)._2 == 0.666667)
  }

  test("native Simpson diversity is value-identical to the HOF formulation") {
    val texts = Seq("aaaa", "abcd", "héllo wörld", "x 😀 x 😀 y",
      "  padded  ", "a\tb\nc", "", "singleton", "ab cd " * 40)
    val d = df("text STRING", texts.map(Row(_)))
    // the pre-native formulations, verbatim
    val hofChar = when(length(col("text")) === 0 || col("text").isNull, lit(0.0))
      .otherwise(TF.simpsonDiversity(
        transform(sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1)))))
    val hofTok = TF.simpsonDiversity(TF.tokens(col("text")))
    d.select(TF.charDiversity(col("text")).as("nc"), hofChar.as("hc"),
        TF.tokenDiversity(col("text")).as("nt"), hofTok.as("ht"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1), s"char: $r")
        assert(r.getDouble(2) == r.getDouble(3), s"token: $r")
      }
  }

  test("lcsLength: textbook cases, reference O(n·m) DP cross-check, null semantics") {
    def lcsRef(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length).toLong
    }
    val cases = Seq(
      ("a b c d e", "a b c d e"),       // identical -> 5
      ("a b c", "c b a"),               // reversal -> 1
      ("a x b y c", "a b c"),           // subsequence -> 3
      ("x y z", "p q r"),               // disjoint -> 0
      ("a a b a", "a b a a"),           // repeats
      ("", "a b"), ("a b", ""))         // empty sides -> 0
    val d = df("pred STRING, gold STRING", cases.map { case (p, g) => Row(p, g) })
    val out = d.select(TF.lcsLength(TF.tokens(col("pred")), TF.tokens(col("gold"))))
      .collect().map(_.getLong(0))
    // TF.tokens = split(trim, "\s+"): ""→[""] — mirror with the same raw split
    cases.zip(out).foreach { case ((p, g), got) =>
      val expected = lcsRef(p.trim.split("\\s+").toSeq, g.trim.split("\\s+").toSeq)
      assert(got == expected, s"($p | $g): got $got expected $expected")
    }
    // null array -> null result
    val nr = df("a ARRAY<STRING>, b ARRAY<STRING>", Seq(Row(null, Seq("x"))))
      .select(TF.lcsLength(col("a"), col("b"))).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("jaroWinkler matches DuckDB-probed reference values") {
    // every expected value read directly off DuckDB's
    // jaro_winkler_similarity (the gate oracle) — pins window math,
    // transposition halving, the 0.7 boost threshold, and the prefix cap
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // classic transposition
      ("dixon", "dicksonx", 0.8133333333333332),  // prefix boost applies
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("", "", 0.0),            // DuckDB: empty -> 0
      ("a", "b", 0.0),
      ("crate", "trace", 0.7333333333333334),     // window excludes ends
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),          // jaro <= 0.7: NO boost
      ("ab", "abcdefghij", 0.7866666666666667),   // boost over threshold
      ("aaaaa", "aaaaabbbbbbbbbbbbbbb", 0.85))    // prefix capped at 4
    val d = df("a STRING, b STRING", cases.map { case (a, b, _) => Row(a, b) })
    val got = d.select(TF.jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, exp), g) =>
      assert(math.abs(g - exp) < 1e-12, s"($a | $b): got $g expected $exp")
    }
  }
}
