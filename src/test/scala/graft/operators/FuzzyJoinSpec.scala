package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {

  private lazy val names = df("id BIGINT, name STRING", Seq(
    Row(1L, "jonathan smith"),
    Row(2L, "jonathon smith"),   // ed 1 from #1
    Row(3L, "jonathan smyth"),   // ed 1 from #1, ed 2 from #2
    Row(4L, "maria garcia"),
    Row(5L, "mario garcia"),     // ed 1 from #4
    Row(6L, "completely different"),
    Row(7L, null)))

  test("editDistancePairs finds exactly the pairs within the bound") {
    val out = FuzzyJoin.editDistancePairs(names, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2), (4L, 5L, 1)))
  }

  test("matches the brute-force cross join on a randomized corpus") {
    // 60 strings over a 3-letter alphabet: dense edit-distance structure,
    // repeated grams (bag semantics), and ties — the filter must be
    // invisible in the result.
    val rows = (0 until 60).map { i =>
      val rng = new scala.util.Random(i * 7 + 1)
      val len = 3 + rng.nextInt(10)
      Row(i.toLong, (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
    }
    val corpus = df("id BIGINT, s STRING", rows)
    val fuzzy = FuzzyJoin.editDistancePairs(corpus, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = corpus.as("a").join(corpus.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fuzzy == brute,
      s"missed: ${brute -- fuzzy}; extra: ${fuzzy -- brute}")
  }

  test("short strings below the count-filter limit are not missed") {
    // At q=2, k=2 the count bound is vacuous for len <= 5 — these pairs
    // share zero 2-grams yet are within distance 2.
    val tiny = df("id BIGINT, s STRING", Seq(
      Row(1L, "ab"), Row(2L, "cd"),         // ed 2, no common gram
      Row(3L, "xyz"), Row(4L, "xyw"),       // ed 1
      Row(5L, "a"), Row(6L, "abc"),         // ed 2, short-long boundary
      Row(7L, "longishword")))
    val out = FuzzyJoin.editDistancePairs(tiny, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,5) ab/a=1, (1,6) ab/abc=1, (2,5) cd/a=2 are true pairs too.
    assert(out == Set((1L, 2L), (1L, 5L), (1L, 6L), (2L, 5L), (3L, 4L), (5L, 6L)))
  }

  test("editDistanceLookup links probe typos to the canonical table") {
    val ref = df("rid BIGINT, canonical STRING", Seq(
      Row(10L, "acme corporation"), Row(20L, "globex industries"),
      Row(30L, "initech")))
    val probes = df("pid BIGINT, raw STRING", Seq(
      Row(1L, "acme corpration"),    // deletion, ed 1 → 10
      Row(2L, "globex industry"),    // ed 3 → no match at k=2
      Row(3L, "intech"),             // ed 1 → 30
      Row(4L, "unrelated name")))
    val out = FuzzyJoin.editDistanceLookup(
        probes, "pid", "raw", ref, "rid", "canonical", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 10L, 1), (3L, 30L, 1)))
  }

  test("clone-prefixed corpus (hot grams) still matches brute force") {
    // Every name shares a long constant prefix — the shape that blows up
    // an all-grams co-occurrence index (hot grams join n×n). The Ed-Join
    // rarest-prefix index must stay correct here; rarity ordering keeps
    // the shared grams out of the index entirely.
    val rows = (1 to 800).map(i => Row(i.toLong, f"Supplier#$i%09d"))
    val corpus = df("id BIGINT, s STRING", rows)
    val fuzzy = FuzzyJoin.editDistancePairs(corpus, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = corpus.as("a").join(corpus.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fuzzy == brute,
      s"missed: ${(brute -- fuzzy).take(5)}; extra: ${(fuzzy -- brute).take(5)}")
  }

  test("candidate filter actually prunes: no cross join in the plan") {
    val plan = FuzzyJoin.editDistancePairs(names, "id", "name", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
