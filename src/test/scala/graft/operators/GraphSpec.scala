package graft.operators

import org.apache.spark.sql.Row
import graft.SparkTestBase

class GraphSpec extends SparkTestBase {

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val e = df("src STRING, dst STRING",
      edges.map { case (a, b) => Row(a, b) })
    Graph.pageRank(e, "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("a symmetric 2-cycle is a fixed point at rank 1.0") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"), 4)
    assert(r == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("bidirectional star concentrates rank on the hub (1 iteration, exact)") {
    val leaves = Seq("x", "y", "z")
    val r = ranks(leaves.map(_ -> "hub") ++ leaves.map("hub" -> _), 1)
    // hub: 0.15 + 0.85 * (3 leaves x 1.0/1) ; leaf: 0.15 + 0.85 * round(1/3, 9)
    assert(r("hub") == 2.7)
    assert(leaves.forall(l => r(l) == 0.433333))
    assert(r("hub") > r("x"))
  }

  test("dangling sink keeps received mass; source decays to teleport") {
    val r = ranks(Seq("a" -> "b"), 2)
    assert(r("a") == 0.15)                       // nothing points at a
    assert(r("b") == 0.2775)                     // 0.15 + 0.85 * 0.15, 9-dp rounded
  }

  test("personalizedPageRank: teleport mass stays on the seed set") {
    // a -> b -> c chain, seed {a}, 2 iterations:
    // r1 = (a .15, b .85, c 0); r2 = (a .15, b .1275, c .7225)
    val e = df("src STRING, dst STRING",
      Seq(Row("a", "b"), Row("b", "c")))
    val seeds = df("node STRING", Seq(Row("a")))
    val r = Graph.personalizedPageRank(e, "src", "dst", seeds, "node",
      iterations = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 0.15, "b" -> 0.1275, "c" -> 0.7225))
  }

  test("pageRankWeighted: uniform weights equal plain pageRank; skew shifts mass") {
    val pairs = Seq("a" -> "b", "a" -> "c", "b" -> "a", "c" -> "a")
    val plain = ranks(pairs, 3)
    val ew = df("src STRING, dst STRING, w DOUBLE",
      pairs.map { case (s2, d2) => Row(s2, d2, 1.0) })
    val uniform = Graph.pageRankWeighted(ew, "src", "dst", "w", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(uniform == plain)
    // a -> b gets 3x the weight of a -> c: 1 iteration from rank 1.0
    // gives b = 0.15 + 0.85 * 0.75, c = 0.15 + 0.85 * 0.25
    val skew = df("src STRING, dst STRING, w DOUBLE", Seq(
      Row("a", "b", 3.0), Row("a", "c", 1.0)))
    val r = Graph.pageRankWeighted(skew, "src", "dst", "w", 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") == 0.7875 && r("c") == 0.3625 && r("a") == 0.15)
  }

  test("pageRankWeighted: duplicate edges add weight; non-positive drop") {
    // duplicated a->b row == single a->b with w 2
    val dup = df("src STRING, dst STRING, w DOUBLE", Seq(
      Row("a", "b", 1.0), Row("a", "b", 1.0), Row("a", "c", 2.0)))
    val merged = df("src STRING, dst STRING, w DOUBLE", Seq(
      Row("a", "b", 2.0), Row("a", "c", 2.0), Row("a", "z", -1.0)))
    val r1 = Graph.pageRankWeighted(dup, "src", "dst", "w", 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Graph.pageRankWeighted(merged, "src", "dst", "w", 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 == r2 && !r1.contains("z"))
  }

  test("linkPrediction: square graph — all three scores exact") {
    // a-b, a-c, d-b, d-c: (a,d) share {b,c}; (b,c) share {a,d};
    // adjacent pairs never appear
    val e = df("src STRING, dst STRING", Seq(
      Row("a", "b"), Row("a", "c"), Row("d", "b"), Row("d", "c")))
    val r = Graph.linkPrediction(e, "src", "dst")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    val aa2 = r6(2 * r9(1.0 / math.log(2.0)))
    assert(r == Map(("a", "d") -> ((2L, 1.0, aa2)),
      ("b", "c") -> ((2L, 1.0, aa2))))
  }

  test("linkPrediction: path endpoints score through the middle node") {
    // a-b-c: only (a,c), one shared neighbor of degree 2;
    // jaccard = |{b}| / |{b}| = 1 (both endpoints have degree 1)
    val e = df("src STRING, dst STRING", Seq(Row("a", "b"), Row("b", "c")))
    val r = Graph.linkPrediction(e, "src", "dst").collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "a" && r(0).getString(1) == "c")
    assert(r(0).getLong(2) == 1L && r(0).getDouble(3) == 1.0)
    assert(r(0).getDouble(4) == r6(r9(1.0 / math.log(2.0))))
  }

  test("linkPrediction: maxCenterDegree drops hub-mediated candidates") {
    // hub h touches a,b,c; chain a-b keeps (a,?) wedges alive elsewhere
    val e = df("src STRING, dst STRING", Seq(
      Row("h", "a"), Row("h", "b"), Row("h", "c"), Row("a", "x")))
    val all = Graph.linkPrediction(e, "src", "dst").collect()
    assert(all.length == 4)                      // (a,b),(a,c),(b,c) via h; (h,x) via a
    val capped = Graph.linkPrediction(e, "src", "dst",
      maxCenterDegree = Some(2))
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(capped == Set(("h", "x")))            // only the deg-2 center a survives
  }

  test("bfsDistance: exact hops within rounds; beyond stays unreached") {
    // path a-b-c-d-e, seed a, 2 rounds: a0 b1 c2; d,e unreached
    val e = df("src STRING, dst STRING", Seq(
      Row("a", "b"), Row("b", "c"), Row("c", "d"), Row("d", "e")))
    val seeds = df("node STRING", Seq(Row("a")))
    val r = Graph.bfsDistance(e, "src", "dst", seeds, "node", rounds = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("bfsDistance: multiple seeds take the min; ghost seeds ignored") {
    val e = df("src STRING, dst STRING", Seq(
      Row("a", "b"), Row("b", "c"), Row("c", "d")))
    val seeds = df("node STRING", Seq(Row("a"), Row("d"), Row("zz")))
    val r = Graph.bfsDistance(e, "src", "dst", seeds, "node", rounds = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
  }

  test("degreeAssortativity: star is perfectly disassortative") {
    val e = df("src STRING, dst STRING", Seq(
      Row("h", "a"), Row("h", "b"), Row("h", "c")))
    val r = Graph.degreeAssortativity(e, "src", "dst").head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -1.0)
  }

  test("degreeAssortativity: regular graph has zero variance -> NULL") {
    // 4-cycle: every node degree 2
    val e = df("src STRING, dst STRING", Seq(
      Row("a", "b"), Row("b", "c"), Row("c", "d"), Row("d", "a")))
    val r = Graph.degreeAssortativity(e, "src", "dst").head()
    assert(r.getLong(0) == 4L && r.isNullAt(1))
  }

  test("personalizedPageRank: unknown seeds are ignored; no seeds -> all 0") {
    val e = df("src STRING, dst STRING", Seq(Row("a", "b")))
    val ghost = df("node STRING", Seq(Row("zz")))
    val r = Graph.personalizedPageRank(e, "src", "dst", ghost, "node",
      iterations = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 0.0, "b" -> 0.0))
  }

  test("duplicate edges count once") {
    val once = ranks(Seq("a" -> "b", "b" -> "a"), 2)
    val dup = ranks(Seq("a" -> "b", "a" -> "b", "b" -> "a"), 2)
    assert(once == dup)
  }

  private def propagate(edges: Seq[(String, String)],
                        seeds: Seq[(String, String)],
                        iters: Int): Map[String, String] = {
    val e = df("src STRING, dst STRING", edges.map { case (a, b) => Row(a, b) })
    val s = df("node STRING, label STRING", seeds.map { case (n, l) => Row(n, l) })
    Graph.labelPropagation(e, "src", "dst", s, "node", "label", iters)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
  }

  test("labelPropagation: 2-hop chain needs 2 rounds; seeds clamp; ties go smallest") {
    // seed(a)=keep; chain a-b-c: b labels round 1, c round 2
    val chain = Seq("a" -> "b", "b" -> "c")
    val r1 = propagate(chain, Seq("a" -> "keep"), 1)
    assert(r1 == Map("a" -> "keep", "b" -> "keep", "c" -> null))
    val r2 = propagate(chain, Seq("a" -> "keep"), 2)
    assert(r2 == Map("a" -> "keep", "b" -> "keep", "c" -> "keep"))

    // x has one 'drop' and one 'keep' neighbor → tie → smallest label wins
    val tie = propagate(Seq("d" -> "x", "k" -> "x"),
      Seq("d" -> "drop", "k" -> "keep"), 3)
    assert(tie("x") == "drop")

    // a seeded node never relabels, even when outvoted by neighbors
    val clamp = propagate(Seq("k1" -> "s", "k2" -> "s", "s" -> "leaf"),
      Seq("s" -> "drop", "k1" -> "keep", "k2" -> "keep"), 2)
    assert(clamp("s") == "drop" && clamp("leaf") == "drop")
  }

  test("communities resist a bridge that connectedComponents merges through") {
    // two triangles joined by one bridge edge c-d: one component, but
    // LPA keeps the triangles in disjoint community label sets
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c",
      "d" -> "e", "e" -> "f", "d" -> "f", "c" -> "d")
    val e = df("src STRING, dst STRING", edges.map { case (x, y) => Row(x, y) })
    val out = Graph.communities(e, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val t1 = Set("a", "b", "c").map(out)
    val t2 = Set("d", "e", "f").map(out)
    assert(t1.intersect(t2).isEmpty, s"bridge fused communities: $out")

    // an isolated pair is its own community, labeled by its smaller member
    val pair = df("src STRING, dst STRING", Seq(Row("x", "y")))
    val p = Graph.communities(pair, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(p == Map("x" -> "x", "y" -> "y") || p.values.toSet.size <= 2)
  }

  test("modularity: perfect 2-community split scores 0.5; one blob scores 0") {
    val twoTri = Seq("a" -> "b", "b" -> "c", "a" -> "c",
      "d" -> "e", "e" -> "f", "d" -> "f")
    val e = df("src STRING, dst STRING", twoTri.map { case (x, y) => Row(x, y) })
    val good = df("node STRING, community STRING",
      Seq(Row("a", "t1"), Row("b", "t1"), Row("c", "t1"),
        Row("d", "t2"), Row("e", "t2"), Row("f", "t2")))
    val g = Graph.modularity(e, "src", "dst", good, "node", "community")
      .collect()(0)
    assert(g.getLong(0) == 6L && g.getLong(1) == 2L)
    assert(g.getDouble(2) == 0.5) // 2 × (3/6 − (6/12)²)

    val blob = df("node STRING, community STRING",
      Seq("a", "b", "c", "d", "e", "f").map(n => Row(n, "all")))
    val b = Graph.modularity(e, "src", "dst", blob, "node", "community")
      .collect()(0)
    assert(b.getDouble(2) == 0.0) // m_c/m = 1, (d_c/2m)² = 1
  }

  test("labelPropagation: majority beats minority; recompute is fresh each round") {
    // y: two 'keep' neighbors vs one 'drop' → keep
    val r = propagate(Seq("a" -> "y", "b" -> "y", "c" -> "y"),
      Seq("a" -> "keep", "b" -> "keep", "c" -> "drop"), 1)
    assert(r("y") == "keep")
  }

  test("triangles: 4-clique nodes have 3 triangles and clustering 1.0; pendant has 0") {
    val clique = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield a -> b
    val e = df("src STRING, dst STRING",
      (clique :+ ("d" -> "p")).map { case (x, y) => Row(x, y) })
    val t = Graph.triangles(e, "src", "dst").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(t("a") == ((3L, 3L, 1.0)))
    assert(t("b") == ((3L, 3L, 1.0)))
    assert(t("c") == ((3L, 3L, 1.0)))
    assert(t("d") == ((4L, 3L, 0.5)))   // 2*3/(4*3)
    assert(t("p") == ((1L, 0L, 0.0)))   // deg < 2 → clustering 0
  }

  test("triangles: direction and duplicate edges collapse; no self-loop triangles") {
    val e = df("src STRING, dst STRING", Seq(
      Row("a", "b"), Row("b", "a"), Row("a", "b"),
      Row("b", "c"), Row("c", "a"), Row("a", "a")))
    val t = Graph.triangles(e, "src", "dst").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("kCore: pendant chain peels, clique survives with in-core degrees") {
    // 4-clique + a tail d—e—f: at k=2 the tail unravels in 2 rounds
    val clique = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield a -> b
    val e = df("src STRING, dst STRING",
      (clique ++ Seq("d" -> "e", "e" -> "f")).map { case (x, y) => Row(x, y) })
    val core = Graph.kCore(e, "src", "dst", k = 2, rounds = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(core.keySet == Set("a", "b", "c", "d"))
    assert(core.values.forall { case (dg, conv) => dg == 3L && conv })
  }

  test("kCore: unconverged fixed rounds are flagged") {
    // path graph a-b-c-d-e at k=2 dominoes one node per round
    val e = df("src STRING, dst STRING",
      Seq(Row("a", "b"), Row("b", "c"), Row("c", "d"), Row("d", "e")))
    val r1 = Graph.kCore(e, "src", "dst", k = 2, rounds = 1).collect()
    assert(r1.nonEmpty && r1.forall(!_.getBoolean(2)))
    // enough rounds: the 2-core of a path is empty → zero rows
    val r4 = Graph.kCore(e, "src", "dst", k = 2, rounds = 4).collect()
    assert(r4.isEmpty)
  }

  test("hits: hand-iterated hubs/authorities with max normalization") {
    // 1→3, 2→3, 2→4: round 1 — a = (3:1, 4:0.5); h = (1:2/3, 2:1)
    // round 2 — a_raw(3)=1.666666667 → a=(3:1, 4:0.6); h=(1:0.625, 2:1)
    val e = df("src STRING, dst STRING",
      Seq(Row("1", "3"), Row("2", "3"), Row("2", "4")))
    val out = Graph.hits(e, "src", "dst", iterations = 2).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("1") == ((0.625, 0.0)))
    assert(out("2") == ((1.0, 0.0)))
    assert(out("3") == ((0.0, 1.0)))
    assert(out("4") == ((0.0, 0.6)))
    // one iteration for comparison: h(1) = (2/3 rounded), a(4) = 0.5
    val one = Graph.hits(e, "src", "dst", iterations = 1).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(one("1") == ((0.666667, 0.0)))
    assert(one("4") == ((0.0, 0.5)))
  }
}
