package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scalable edit-distance similarity join — the record-linkage primitive
 * (entity resolution across sources, typo-tolerant lookup against a
 * canonical table, near-identical title/name clustering). The reference
 * has no fuzzy matching at all; this is the string sibling of the
 * shingle/minhash document family in [[Dedup]].
 *
 * A naive formulation is the O(n·m) cross join with `levenshtein` — a
 * non-starter at scale. This implementation uses the classic q-gram
 * count-filter (Gravano et al., VLDB 2001): if edit distance
 * `ed(s,t) <= k`, then s and t share at least
 * `max(|G(s)|, |G(t)|) − k·q` positional q-grams (bag semantics), where
 * `|G(s)| = len(s) − q + 1`. So candidates come from an inverted
 * (gram, occurrence) index equi-join — the same id-only-pairs shuffle
 * discipline as [[Dedup.ngramJaccardPairs]] — with two cheap sound
 * prunes applied before the count check:
 *
 *  - length filter: `|len(s) − len(t)| <= k` (an edit changes length by
 *    at most 1), attached to index rows so it prunes BEFORE the
 *    pair-count aggregation;
 *  - bag semantics via per-(id, gram) occurrence numbers: joining on
 *    (gram, occ) makes the match count equal Σ_g min(cnt_s, cnt_t),
 *    the correct bag intersection (a set join would over-count repeats).
 *
 * Survivors are confirmed with the exact `levenshtein` built-in — the
 * filter affects performance only, never the result, which is why the
 * whole operator is brute-force-oracle-checkable.
 *
 * SHORT-STRING COMPLETENESS: when `len − q + 1 <= k·q` the count bound
 * is vacuous (zero shared grams suffice) and the index join would
 * silently MISS pairs. Strings that short (`len <= q·(k+1) − 1`; e.g.
 * 5 chars at q=2, k=2) are routed down a separate exact path: each
 * short string expands to its k+1 admissible candidate lengths and
 * equi-joins on exact length against the full corpus — an equi-join,
 * not a cross join, and the short side is a tiny fraction of any real
 * name/title corpus (documented load-bearing assumption; a corpus that
 * is MOSTLY ≤5-char strings wants a dedicated path).
 *
 * Scale shape: the index join shuffles (gram, occ, id, len) rows —
 * ~len bytes per row, never full strings; candidate pairs are id-only
 * until the single confirm join pulls each string once. Gram frequency
 * skew (shared prefixes like "Supplier#") concentrates candidates the
 * same way hot shingles do in [[Dedup]] — the confirm cost is bounded
 * by true-ish pairs, and AQE's skew-join split handles the index join's
 * hot gram partitions.
 */
object FuzzyJoin {

  /** Inverted positional-gram index: (gram, occ, id, len) — `occ`
    * disambiguates repeated grams within one string so the candidate
    * join counts bag intersection. Strings shorter than `q` produce no
    * grams (callers route them down the short path). */
  private def gramIndex(df: DataFrame, idCol: String, strCol: String,
                        q: Int): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
      .select(col("id"), col("len"), posexplode(expr(
        s"transform(sequence(1, greatest(len - ${q - 1}, 0)), i -> substring(s, i, $q))"))
        .as(Seq("pos", "gram")))
    // Occurrence number per (id, gram): row_number over pos. This window
    // partitions by (id, gram) — granular keys, no skew concern.
    grams.withColumn("occ",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
      .select("gram", "occ", "id", "len")
  }

  private def shortLimit(q: Int, k: Int): Int = q * (k + 1) - 1

  /**
   * All pairs `(id_a, id_b, dist)` with `id_a < id_b` and
   * `levenshtein <= maxDist` within one table. NULL strings never match
   * (SQL comparison semantics — documented, matches the brute-force
   * oracle where `levenshtein(NULL, …)` is NULL).
   */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 2, "q must be >= 2")
    val strs = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val lim = shortLimit(q, maxDist)
    val long = strs.filter(col("len") > lim)
    val short = strs.filter(col("len") <= lim)

    val idx = gramIndex(long, "id", "s", q)
    val candLong = idx.as("a").join(idx.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("a.len")).as("len_a"), first(col("b.len")).as("len_b"))
      // count filter: common >= max(|G(a)|,|G(b)|) − k·q
      .filter(col("common") >=
        greatest(col("len_a"), col("len_b")) - lit(q - 1) - lit(maxDist * q))
      .select("id_a", "id_b")

    // Short strings: expand to admissible partner lengths, equi-join on
    // exact length against EVERYTHING (long strings too — a 5-char typo
    // of a 6-char name crosses the boundary). a.id < b.id after the
    // union would double-count short-short pairs, so orient: short side
    // joins all, then dedup orientation by (least, greatest).
    val candShort = short
      .select(col("id"), col("len"),
        explode(expr(s"sequence(greatest(len - $maxDist, 0), len + $maxDist)"))
          .as("plen"))
      .join(strs.select(col("id").as("id2"), col("len").as("plen")),
        Seq("plen"))
      .filter(col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("id_a"),
        greatest(col("id"), col("id2")).as("id_b"))
      .distinct()

    val cand = candLong.union(candShort).distinct()
    confirm(cand, strs, maxDist)
  }

  /**
   * Typo-tolerant lookup: every `(probe_id, ref_id, dist)` with
   * `levenshtein(probe, ref) <= maxDist` between two tables — the
   * dirty-to-canonical linkage shape (probe = incoming records,
   * ref = master data). Same filter/confirm machinery as
   * [[editDistancePairs]]; no orientation dedup is needed because the
   * two sides are distinct relations.
   */
  def editDistanceLookup(probe: DataFrame, probeId: String, probeStr: String,
                         ref: DataFrame, refId: String, refStr: String,
                         maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 2, "q must be >= 2")
    val p = probe.select(col(probeId).as("id"), col(probeStr).as("s"))
      .filter(col("s").isNotNull).withColumn("len", length(col("s")))
    val r = ref.select(col(refId).as("id"), col(refStr).as("s"))
      .filter(col("s").isNotNull).withColumn("len", length(col("s")))
    val lim = shortLimit(q, maxDist)

    val pIdx = gramIndex(p.filter(col("len") > lim), "id", "s", q)
    val rIdx = gramIndex(r, "id", "s", q)
    val candLong = pIdx.as("a").join(rIdx.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("a.len")).as("len_a"), first(col("b.len")).as("len_b"))
      .filter(col("common") >=
        greatest(col("len_a"), col("len_b")) - lit(q - 1) - lit(maxDist * q))
      .select("id_a", "id_b")

    val candShort = p.filter(col("len") <= lim)
      .select(col("id"), explode(
        expr(s"sequence(greatest(len - $maxDist, 0), len + $maxDist)")).as("plen"))
      .join(r.select(col("id").as("id_b"), col("len").as("plen")), Seq("plen"))
      .select(col("id").as("id_a"), col("id_b"))

    val cand = candLong.union(candShort).distinct()
    cand
      .join(p.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(r.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a").as("probe_id"), col("id_b").as("ref_id"), col("dist"))
  }

  /** Confirm join: pull each candidate pair's strings once, keep pairs
    * whose EXACT edit distance is within bound. */
  private def confirm(cand: DataFrame, strs: DataFrame, maxDist: Int): DataFrame =
    cand
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
}
