package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class ProfileSpec extends SparkTestBase {

  private lazy val data = df("id BIGINT, name STRING, score DOUBLE", Seq(
    Row(1L, "a", 1.5), Row(2L, "b", null), Row(3L, null, 2.5),
    Row(4L, "a", 2.5), Row(5L, "c", 0.5)))

  test("exact profile: rows, nulls, distinct, range per column in one pass") {
    val p = Profile.profile(data, exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("name") == ((5L, 1L, 3L, "a", "c")))
    assert(p("score") == ((5L, 1L, 3L, "0.5", "2.5")))
  }

  test("approx profile keeps the same exact stats and a sane distinct estimate") {
    val p = Profile.profile(data).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id")._1 == 5L && p("id")._2 == 0L)
    // HLL at this cardinality is exact in practice; allow slack anyway
    assert(math.abs(p("id")._3 - 5L) <= 1)
    assert(math.abs(p("name")._3 - 3L) <= 1)
  }

  test("histogram: fixed-width bins, edge clamping, nulls dropped, empty bins absent") {
    val vals = df("x DOUBLE", Seq(
      Row(0.0), Row(2.4), Row(2.5), Row(9.99),     // interior values
      Row(10.0), Row(25.0),                         // at/above hi → last bucket
      Row(-3.0),                                    // below lo → first bucket
      Row(null)))                                   // dropped
    val h = Profile.histogram(vals, "x", lo = 0.0, hi = 10.0, nBins = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // w = 2.5: bucket 0 = [0, 2.5) ← {0.0, 2.4, -3.0}; bucket 1 ← {2.5};
    // bucket 3 ← {9.99, 10.0, 25.0}; bucket 2 is empty and absent
    assert(h == Map(
      0L -> ((0.0, 3L)),
      1L -> ((2.5, 1L)),
      3L -> ((7.5, 3L))))
  }

  test("quantiles: value at rank ceil(p*n), nulls dropped, ties deterministic") {
    val vals = df("k STRING, x BIGINT", Seq(
      Row("a", 10L), Row("a", 20L), Row("a", 30L), Row("a", 40L),
      Row("a", null),                       // ignored
      Row("b", 7L), Row("b", 7L), Row("b", 9L)))  // duplicate values
    val q = Profile.quantiles(vals, "k", "x", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // a: n=4 → p=0.5 rank 2 → 20; p=1.0 rank 4 → 40
    // b: n=3 → p=0.5 rank 2 → 7 (tie, same value either way); p=1.0 → 9
    assert(q == Map(
      ("a", 0.5) -> 20L, ("a", 1.0) -> 40L,
      ("b", 0.5) -> 7L, ("b", 1.0) -> 9L))
  }

  test("quantiles: double rounding in p*n cannot bump the rank (0.07 × 100)") {
    val rows = (1 to 100).map(i => Row("k", i.toLong))
    val vals = df("k STRING, x BIGINT", rows)
    // 0.07 * 100 = 7.000000000000001 in IEEE double; exact ceil is 7
    val q = Profile.quantiles(vals, "k", "x", Seq(0.07)).head()
    assert(q.getLong(2) == 7L, q.toString)
  }

  test("histogram drops NaN instead of counting it in bucket 0") {
    val vals = df("x DOUBLE", Seq(
      Row(1.0), Row(Double.NaN), Row(0.0 / 0.0), Row(6.0)))
    val h = Profile.histogram(vals, "x", lo = 0.0, hi = 10.0, nBins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h == Map(0L -> 1L, 1L -> 1L))
  }

  test("cardinalitySketch: exact column is truth, HLL verdict holds") {
    val vals = df("k STRING, v STRING",
      (1 to 40).map(i => Row("a", s"v${i % 25}")) ++ // 25 distinct
        (1 to 10).map(i => Row(null, s"u$i")))       // NULL key is a level
    val out = Profile.cardinalitySketch(vals, "k", "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet == Set((Some("a"), 25L, true), (None, 10L, true)))
  }

  test("quantileSketch: verdicts true and exact values match quantiles()") {
    val vals = df("k STRING, x BIGINT",
      (1 to 100).map(i => Row("a", i.toLong)) ++
        (1 to 10).map(i => Row(null, (i * 7).toLong)))
    val out = Profile.quantileSketch(vals, "k", "x", Seq(0.5, 0.9))
    assert(out.count() == 4) // 2 keys x 2 ps (NULL key survives the join)
    assert(out.collect().forall(_.getBoolean(3)), out.collect().mkString(","))
    val exact = Profile.quantiles(vals, "k", "x", Seq(0.5, 0.9))
    assert(out.select("k", "p", "value").exceptAll(exact).isEmpty)
  }

  test("topValues ranks by count with value tiebreak; NULL is a real value") {
    val vals = df("s STRING", (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++
      Seq.fill(2)(null) ++ Seq("z")).map(Row(_)))
    val out = Profile.topValues(vals, "s", k = 3)
      .orderBy("rank").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (Some("a"), 3L, 1L),   // tie with b broken by value asc
      (Some("b"), 3L, 2L),
      (None, 2L, 3L)))       // NULL counted, not dropped
  }

  test("winsorize: clips to exact per-key quantile band, NULLs pass through") {
    import org.apache.spark.sql.Row
    // key a: values 1..10 → p20 bound = value at rank 2 (=2), p80 at rank 8 (=8)
    val rows = (1 to 10).map(i => Row(i.toLong, "a", i.toDouble)) ++
      Seq(Row(11L, "a", null), Row(12L, "b", 5.0))
    val events = df("id BIGINT, k STRING, v DOUBLE", rows)
    val out = Profile.winsorize(events, "k", "v", pLo = 0.2, pHi = 0.8)
      .select("id", "value_clipped", "was_clipped")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, Some(2.0), true),   // below p20 → raised
      (2L, Some(2.0), false), (3L, Some(3.0), false), (4L, Some(4.0), false),
      (5L, Some(5.0), false), (6L, Some(6.0), false), (7L, Some(7.0), false),
      (8L, Some(8.0), false),
      (9L, Some(8.0), true), (10L, Some(8.0), true), // above p80 → lowered
      (11L, None, false),      // NULL passes through unclipped
      (12L, Some(5.0), false))) // singleton key: both bounds = the value
  }

  test("zscoreFlags: exact-moment z-scores, degenerate keys yield no outliers") {
    import org.apache.spark.sql.Row
    val events = df("id BIGINT, k STRING, v DOUBLE", Seq(
      // key a: values 1,1,1,1,9 → mean 2.6, var = (4·1.6² + 6.4²)/5 = 10.24, std 3.2
      Row(1L, "a", 1.0), Row(2L, "a", 1.0), Row(3L, "a", 1.0),
      Row(4L, "a", 1.0), Row(5L, "a", 9.0),
      Row(6L, "b", 5.0),               // singleton: std 0 → z NULL
      Row(7L, "c", 2.0), Row(8L, "c", 2.0))) // constant: std 0 → z NULL
    val out = Profile.zscoreFlags(events, "k", "v", threshold = 1.5)
      .select("id", "z", "is_outlier")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, Some(-0.5), false), (2L, Some(-0.5), false), (3L, Some(-0.5), false),
      (4L, Some(-0.5), false), (5L, Some(2.0), true),
      (6L, None, false), (7L, None, false), (8L, None, false)))
  }

  test("rankNormalize maps scores to [0,1] per key, ties sharing ranks") {
    val scores = df("id BIGINT, k STRING, v DOUBLE", Seq(
      Row(1L, "a", 10.0), Row(2L, "a", 20.0), Row(3L, "a", 20.0),
      Row(4L, "a", 30.0), Row(5L, "b", 7.0)))
    val out = Profile.rankNormalize(scores, "k", "id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // group a, n=4: rank(10)=1→0, rank(20)=2 (both)→1/3, rank(30)=4→1
    assert(out(1L) == 0.0)
    assert(out(2L) == out(3L) && out(2L) == 0.333333)
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)   // single-row group
  }

  test("heavyHitters: exactly the values with freq > n/k, exact counts") {
    // 100 rows: 'a'×40, 'b'×25, 'c'×20, then 15 singletons. k=5 →
    // threshold n/k = 20: a and b strictly exceed, c equals (excluded).
    val rows = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      (1 to 15).map(i => s"s$i")).map(Row(_))
    val d = df("v STRING", rows)
    val out = Profile.heavyHitters(d, "v", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 40L, "b" -> 25L))
  }

  test("heavyHitters: result is partitioning-independent and null-free") {
    val rows = (Seq.fill(9)("hot") ++ (1 to 30).map(i => s"cold$i") ++
      Seq.fill(3)(null: String)).map(Row(_))
    val d = df("v STRING", rows)
    // 39 non-null rows, k=4 → threshold 9.75: no value qualifies at 9…
    assert(Profile.heavyHitters(d, "v", k = 4).count() == 0L)
    // …but k=5 → threshold 7.8: 'hot' (9) qualifies under any repartition.
    for (p <- Seq(1, 3, 13)) {
      val out = Profile.heavyHitters(d.repartition(p), "v", k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(out.toSeq == Seq(("hot", 9L)), s"partitions=$p")
    }
  }

  test("giniConcentration: even shares 0, 2-group extreme 0.5, degenerate NULL") {
    def gini(rows: Seq[(String, Long)]) =
      Profile.giniConcentration(
        df("k STRING, w BIGINT", rows.map { case (k, w) =>
          org.apache.spark.sql.Row(k, w) }), "k", "w").collect()(0)
    val even = gini(Seq("a" -> 5L, "b" -> 5L))
    assert(even.getLong(0) == 2L && even.getDouble(2) == 0.0)
    val extreme = gini(Seq("a" -> 0L, "b" -> 10L))
    assert(extreme.getDouble(2) == 0.5) // max for n=2 is (n-1)/n · 1
    val quarters = gini(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 97L))
    assert(quarters.getDouble(2) > 0.7) // one dominant source
    assert(gini(Seq("a" -> 7L)).isNullAt(2))       // single group
    assert(gini(Seq("a" -> 0L, "b" -> 0L)).isNullAt(2)) // zero mass
  }

  test("giniConcentration: fractional weights accumulate exactly, not truncated") {
    def gini(rows: Seq[(String, Double)]) =
      Profile.giniConcentration(
        df("k STRING, w DOUBLE", rows.map { case (k, w) =>
          org.apache.spark.sql.Row(k, w) }), "k", "w").collect()(0)
    // long-cast truncation would make these (0, 0) → NULL; decimal path
    // sees (0.5, 0.5) → perfectly even → gini 0
    val even = gini(Seq("a" -> 0.5, "b" -> 0.5))
    assert(even.getLong(0) == 2L && even.getDouble(2) == 0.0)
    // 0.25 / 0.75 split matches the same split at integer scale
    val frac = gini(Seq("a" -> 0.25, "b" -> 0.75))
    val ints = Profile.giniConcentration(
      df("k STRING, w BIGINT", Seq(org.apache.spark.sql.Row("a", 25L),
        org.apache.spark.sql.Row("b", 75L))), "k", "w").collect()(0)
    assert(frac.getDouble(2) == ints.getDouble(2))
  }

  test("keyOverlap: counts, containments, row match rates, fanout") {
    import org.apache.spark.sql.Row
    val left = df("k BIGINT", Seq(
      Row(1L), Row(1L), Row(2L), Row(3L), Row(null))) // 3 keys, 4 non-null rows
    val right = df("k BIGINT", Seq(
      Row(2L), Row(2L), Row(2L), Row(4L)))            // 2 keys, 3+1 rows
    val r = Profile.keyOverlap(left, right, "k", "k").collect()(0)
    assert(r.getAs[Long]("n_left_keys") == 3L)
    assert(r.getAs[Long]("n_right_keys") == 2L)
    assert(r.getAs[Long]("n_shared_keys") == 1L)       // only key 2
    assert(r.getAs[Double]("key_jaccard") == 0.25)     // 1 / (3+2-1)
    assert(r.getAs[Double]("left_key_containment") == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("right_key_containment") == 0.5)
    assert(r.getAs[Long]("n_left_rows") == 4L)         // NULL excluded
    assert(r.getAs[Long]("left_rows_matched") == 1L)   // the single k=2 row
    assert(r.getAs[Long]("n_right_rows") == 4L)
    assert(r.getAs[Long]("right_rows_matched") == 3L)  // three k=2 rows
    assert(r.getAs[Long]("max_fanout") == 3L)          // 1 left x 3 right
  }

  test("benford: leading digits from decimal rendering, zero rows excluded") {
    import org.apache.spark.sql.Row
    val d = df("v DOUBLE", Seq(
      Row(123.4), Row(0.045), Row(-20.0), Row(0.0), Row(null),
      Row(1000000.0), Row(9.9), Row(2.5)))
    // decimal(18,2) renderings: 123.40, 0.05(!cast rounds), -20.00, 0.00,
    // 1000000.00, 9.90, 2.50 -> leading digits: 1,5(0.05),2,1,9,2; 0.00 excluded
    val out = Profile.benford(d, "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share")))).toMap
    assert(out.keySet == (1 to 9).map(_.toString).toSet)
    assert(out("1")._1 == 2L) // 123.40, 1000000.00
    assert(out("2")._1 == 2L) // -20.00, 2.50
    assert(out("5")._1 == 1L) // 0.045 -> 0.05
    assert(out("9")._1 == 1L)
    assert(out("3")._1 == 0L && out("3")._2 == 0.0)
    val total = out.values.map(_._1).sum
    assert(total == 6L)
    // expected shares follow log10(1+1/d)
    val p1 = Profile.benford(d, "v").collect()
      .find(_.getString(0) == "1").get.getAs[Double]("benford_p")
    assert(p1 == math.rint(math.log10(2.0) * 1e6) / 1e6)
  }

  test("madFlags: robust z immune to the outlier, degenerate MAD flags nothing") {
    import org.apache.spark.sql.Row
    val d = df("k STRING, id BIGINT, v DOUBLE", Seq(
      Row("a", 1L, 10.0), Row("a", 2L, 11.0), Row("a", 3L, 12.0),
      Row("a", 4L, 13.0), Row("a", 5L, 1000.0), // extreme outlier
      Row("b", 6L, 5.0), Row("b", 7L, 5.0), Row("b", 8L, 5.0))) // MAD 0
    val out = Profile.madFlags(d, "k", "v", threshold = 3.5)
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[Any]("rz")), r.getAs[Boolean]("is_outlier")))).toMap
    // key a: n=5 -> median = value at rank 3 = 12; devs = 2,1,0,1,988
    // -> MAD = 1; rz(1000) = 988/1.4826 ≈ 666 -> flagged
    assert(out(5L)._2)
    assert(!out(1L)._2 && !out(4L)._2)
    // a mean/σ z-score would NOT flag 1000 at 3.5σ here (σ ≈ 395 pulls
    // the threshold to ~1383); MAD does — that's the robustness claim
    // degenerate key b: MAD 0 -> NULL rz, not flagged
    assert(out(6L)._1.isEmpty && !out(6L)._2)
  }

  test("datasetCard: counts, token totals, dup mass in one row") {
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, text STRING, lang STRING, src STRING", Seq(
      Row(1L, "a b c", "en", "web"), Row(2L, "a b c", "en", "web"),
      Row(3L, "d e", "fr", "web"), Row(4L, "d e", "fr", "books"),
      Row(5L, "unique text", "en", "books")))
    val r = Profile.datasetCard(d, "id", "text", "lang", "src").collect()(0)
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("total_chars") == 5 + 5 + 3 + 3 + 11)
    assert(r.getAs[Long]("total_tokens") == 3 + 3 + 2 + 2 + 2)
    assert(r.getAs[Long]("dup_docs") == 2L) // one copy each of "a b c", "d e"
    assert(r.getAs[Double]("dup_doc_frac") == 0.4)
    assert(r.getAs[Double]("avg_doc_tokens") == 2.4)
  }

  test("columnEntropy: uniform, constant, and NULL-bearing columns") {
    import org.apache.spark.sql.Row
    val d = df("a STRING, b STRING, c STRING", Seq(
      Row("x", "k", "u"), Row("y", "k", "u"),
      Row("z", "k", null), Row("w", "k", null)))
    val out = Profile.columnEntropy(d, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((4L, 4L, 2.0)))  // uniform over 4 -> log2(4)
    assert(out("b") == ((4L, 1L, 0.0)))  // constant
    assert(out("c") == ((4L, 2L, 1.0)))  // 50/50 incl. the NULL group
  }

  test("functionalDeps: exact FD, violated FD, independence") {
    import org.apache.spark.sql.Row
    val d = df("city STRING, zip STRING, name STRING", Seq(
      Row("a", "1", "n1"), Row("a", "1", "n2"),
      Row("b", "2", "n1"), Row("b", "2", "n2"),
      Row("b", "3", "n3")))
    val out = Profile.functionalDeps(d,
      Seq(("zip", "city"), ("city", "zip"), ("name", "city")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // zip -> city holds exactly (each zip one city)
    assert(out(("zip", "city")) == ((5L, 3L, 0L, 1.0)))
    // city -> zip: city b splits 2/1 -> one violation
    assert(out(("city", "zip")) == ((5L, 2L, 1L, 0.8)))
    // name -> city: n1 and n2 each split 1/1 -> 2 violations
    assert(out(("name", "city")) == ((5L, 3L, 2L, 0.6)))
  }

  test("keyOverlap: disjoint key sets yield zero overlap, zero fanout") {
    import org.apache.spark.sql.Row
    val a = df("k BIGINT", Seq(Row(1L)))
    val b = df("k BIGINT", Seq(Row(2L)))
    val r = Profile.keyOverlap(a, b, "k", "k").collect()(0)
    assert(r.getAs[Long]("n_shared_keys") == 0L)
    assert(r.getAs[Double]("key_jaccard") == 0.0)
    assert(r.getAs[Long]("left_rows_matched") == 0L)
    assert(r.getAs[Long]("max_fanout") == 0L)
  }

  test("mutualInformation: MI = H under determinism, ~0 under independence, NULL NMI for constants") {
    import org.apache.spark.sql.Row
    // b = f(a), uniform over 2 levels: MI = H_a = H_b = ln 2, NMI = 1
    val det = df("a STRING, b STRING", Seq(
      Row("x", "1"), Row("x", "1"), Row("y", "2"), Row("y", "2")))
    val r1 = Profile.mutualInformation(det, "a", "b").collect()(0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("h_a") == ln2 && r1.getAs[Double]("mi") == ln2)
    assert(r1.getAs[Double]("nmi") == 1.0)
    // perfectly independent 2×2 -> MI 0
    val ind = df("a STRING, b STRING", Seq(
      Row("x", "1"), Row("x", "2"), Row("y", "1"), Row("y", "2")))
    val r2 = Profile.mutualInformation(ind, "a", "b").collect()(0)
    assert(r2.getAs[Double]("mi") == 0.0 && r2.getAs[Double]("nmi") == 0.0)
    // constant column: zero entropy -> NMI NULL, MI 0; NULL is a level
    val const = df("a STRING, b STRING", Seq(Row("x", null), Row("y", null)))
    val r3 = Profile.mutualInformation(const, "a", "b").collect()(0)
    assert(r3.getAs[Double]("h_b") == 0.0 && r3.getAs[Double]("mi") == 0.0)
    assert(r3.isNullAt(r3.fieldIndex("nmi")))
    // NULL as an INFORMATIVE level on both sides: b is NULL exactly when
    // a is NULL -> the joint must include the NULL cells (null-safe
    // joins), giving MI = H = ln 2, not the equi-join's silent 0
    val nullDet = df("a STRING, b STRING", Seq(
      Row("x", "1"), Row("x", "1"), Row(null, null), Row(null, null)))
    val r4 = Profile.mutualInformation(nullDet, "a", "b").collect()(0)
    assert(!r4.isNullAt(r4.fieldIndex("mi")))
    assert(r4.getAs[Double]("mi") == ln2 && r4.getAs[Double]("nmi") == 1.0)
    assert(r4.getAs[Double]("h_a") == ln2 && r4.getAs[Double]("h_b") == ln2)
  }

  test("correlationMatrix: perfect, inverse, constant, and null-pair cases") {
    val t = df("x DOUBLE, y DOUBLE, z DOUBLE, c DOUBLE, h DOUBLE", Seq(
      Row(1.0, 2.0, 8.0, 2.0, 1.0),
      Row(2.0, 4.0, 6.0, 2.0, null),
      Row(3.0, 6.0, 4.0, 2.0, 3.0),
      Row(4.0, 8.0, 2.0, 2.0, 4.0)))
    val out = Profile.correlationMatrix(t, Seq("x", "y", "z", "c", "h"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out.size == 10)
    assert(out(("x", "y")) == ((4L, Some(1.0))))   // y = 2x
    assert(out(("x", "z")) == ((4L, Some(-1.0))))  // z = 10 - 2x
    assert(out(("x", "c"))._2.isEmpty)             // constant → no dispersion
    // null in h drops ONLY that pair's row: n = 3, still perfectly linear
    assert(out(("x", "h")) == ((3L, Some(1.0))))
  }

  test("chiSquare: 2x2 hand value, Cramér's V, zero under independence") {
    import org.apache.spark.sql.Row
    // O = [[2,1],[1,2]]: all E = 1.5 -> chi2 = 4·(0.25/1.5) = 2/3
    val d = df("a STRING, b STRING", Seq(
      Row("x", "u"), Row("x", "u"), Row("x", "v"),
      Row("y", "u"), Row("y", "v"), Row("y", "v")))
    val r = Profile.chiSquare(d, "a", "b").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L)
    assert(r.getAs[Double]("chi2") == 0.666667)
    // V = sqrt((2/3) / (6·1)) = sqrt(1/9) = 1/3
    assert(r.getAs[Double]("cramers_v") == 0.333333)
    // perfectly independent table -> chi2 = 0
    val ind = df("a STRING, b STRING", Seq(
      Row("x", "u"), Row("x", "v"), Row("y", "u"), Row("y", "v")))
    assert(Profile.chiSquare(ind, "a", "b").head().getAs[Double]("chi2") == 0.0)
    // NULL counts as a real level (windows group it; no drop)
    val withNull = df("a STRING, b STRING", Seq(
      Row(null, "u"), Row(null, "u"), Row("y", "v")))
    val rn = Profile.chiSquare(withNull, "a", "b").head()
    assert(rn.getLong(0) == 3L)
  }

  test("spearman: monotone ±1, mid-rank ties, NULL rows excluded") {
    import org.apache.spark.sql.Row
    val up = df("a DOUBLE, b DOUBLE",
      Seq(Row(1.0, 10.0), Row(2.0, 20.0), Row(3.0, 90.0)))
    assert(Profile.spearman(up, "a", "b").head().getAs[Double]("rho") == 1.0)
    val down = df("a DOUBLE, b DOUBLE",
      Seq(Row(1.0, 90.0), Row(2.0, 20.0), Row(3.0, 10.0)))
    assert(Profile.spearman(down, "a", "b").head().getAs[Double]("rho") == -1.0)
    // ties in a -> mid ranks (1.5, 1.5, 3): rho = 1.5/sqrt(1.5·2)
    val ties = df("a DOUBLE, b DOUBLE",
      Seq(Row(1.0, 10.0), Row(1.0, 20.0), Row(2.0, 30.0)))
    assert(Profile.spearman(ties, "a", "b").head().getAs[Double]("rho")
      == 0.866025)
    // complete-case: the NULL row is excluded from n and the ranks
    val withNull = df("a DOUBLE, b DOUBLE",
      Seq(Row(1.0, 10.0), Row(2.0, 20.0), Row(null, 99.0), Row(3.0, 30.0)))
    val r = Profile.spearman(withNull, "a", "b").head()
    assert(r.getLong(0) == 3L && r.getAs[Double]("rho") == 1.0)
  }

  test("concentration: HHI and effective category count, NULL a real level") {
    import org.apache.spark.sql.Row
    val skew = df("s STRING", Seq(Row("x"), Row("x"), Row("x"), Row("y")))
    val r = Profile.concentration(skew, "s").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("hhi") == 0.625)        // .75² + .25²
    assert(r.getAs[Double]("effective_values") == 1.6)
    val uniform = df("s STRING", Seq(Row("a"), Row("b"), Row("c"), Row("d")))
    val u = Profile.concentration(uniform, "s").head()
    assert(u.getAs[Double]("hhi") == 0.25)
    assert(u.getAs[Double]("effective_values") == 4.0)
    // NULL is a level: (null, null, z) -> shares (2/3)² + (1/3)²
    val withNull = df("s STRING", Seq(Row(null), Row(null), Row("z")))
    val n = Profile.concentration(withNull, "s").head()
    assert(n.getLong(1) == 2L)
    val expect = BigDecimal(
      BigDecimal(2.0 / 3 * (2.0 / 3)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +
        BigDecimal(1.0 / 3 * (1.0 / 3)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(n.getAs[Double]("hhi") == expect)
  }

  test("kendallTau: monotone ±1, tie-corrected zero, constant-side NULL") {
    import org.apache.spark.sql.Row
    def d2(rows: (Double, Double)*) =
      df("a DOUBLE, b DOUBLE", rows.map { case (a, b) => Row(a, b) })
    val up = Profile.kendallTau(d2(1.0 -> 1.0, 2.0 -> 2.0, 3.0 -> 3.0), "a", "b")
      .head()
    assert(up.getLong(0) == 3L && up.getLong(1) == 3L && up.getLong(2) == 0L)
    assert(up.getAs[Double]("tau_b") == 1.0)
    val down = Profile.kendallTau(d2(1.0 -> 3.0, 2.0 -> 2.0, 3.0 -> 1.0), "a", "b")
      .head()
    assert(down.getAs[Double]("tau_b") == -1.0)
    // balanced 2x2 with one row per cell: C = D = 1, tied pairs drop
    // from both counts; n0=6, n1=n2=2 -> tau = 0
    val square = Profile.kendallTau(
      d2(1.0 -> 1.0, 1.0 -> 2.0, 2.0 -> 1.0, 2.0 -> 2.0), "a", "b").head()
    assert(square.getLong(1) == 1L && square.getLong(2) == 1L)
    assert(square.getAs[Double]("tau_b") == 0.0)
    // constant b -> all pairs tied in b -> denominator undefined
    assert(Profile.kendallTau(
      d2(1.0 -> 7.0, 2.0 -> 7.0, 3.0 -> 7.0), "a", "b").head().isNullAt(3))
  }
}
