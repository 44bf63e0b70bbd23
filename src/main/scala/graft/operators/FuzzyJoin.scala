package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable edit-distance similarity join — the record-linkage primitive
 * (entity resolution across sources, typo-tolerant lookup against a
 * canonical table, near-identical title/name clustering). The reference
 * has no fuzzy matching at all; this is the string sibling of the
 * shingle/minhash document family in [[Dedup]].
 *
 * A naive formulation is the O(n·m) cross join with `levenshtein` — a
 * non-starter at scale. Candidate generation here is PREFIX-FILTERED
 * q-grams (the Ed-Join scheme, Xiao et al., VLDB 2008): if
 * `ed(s,t) <= k` then s and t share at least
 * `max(|G(s)|,|G(t)|) − k·q` of their positional q-grams (bag
 * semantics, Gravano et al. 2001), and by the prefix-filter principle
 * any two bags with that much overlap must collide within their
 * `k·q + 1` FIRST grams under one global gram ordering. Ordering grams
 * by ascending corpus frequency makes those prefix grams each string's
 * RAREST — so the inverted index only ever contains k·q+1 low-frequency
 * entries per string, and a boilerplate-heavy corpus (every row sharing
 * a long common prefix, e.g. "Supplier#0000…") cannot blow the index
 * join up: the shared hot grams are exactly the ones the ordering
 * excludes. (A plain count-filter index — all grams, count ≥ threshold
 * — is Σf²-bounded on such corpora: measured 6+ minutes vs ~2s on 10k
 * clone-prefixed names; that formulation is retired.)
 *
 * Candidates then carry two sound prunes — the length filter
 * `|len(s) − len(t)| <= k` attached to index rows, and pair distinctness
 * — before the exact `levenshtein` confirm. The filter chain affects
 * performance only, never the result (any true pair survives every
 * step), which is why the whole operator is brute-force-oracle-checked.
 *
 * SHORT-STRING COMPLETENESS: when `|G(s)| = len − q + 1 <= k·q` the
 * overlap bound is vacuous (zero shared grams suffice) and NO gram
 * index can find such pairs. Strings that short (`len <= q·(k+1) − 1`,
 * e.g. 5 chars at q=2, k=2) route down an exact path: each expands to
 * its 2k+1 admissible partner lengths and equi-joins on exact length
 * against the full corpus — an equi-join, not a cross join, and the
 * short side is a tiny fraction of any real name/title corpus
 * (documented load-bearing assumption; a corpus that is MOSTLY
 * ≤5-char strings wants a dedicated path).
 *
 * Scale shape: the gram-frequency aggregation map-side combines; the
 * per-string rarest-gram ranking windows over ~len rows per string; the
 * index join shuffles (gram, occ, id, len) rows — ~len bytes, never
 * full strings; candidate pairs are id-only until the single confirm
 * join pulls each string once. Residual hot spots (two rare grams tied
 * at the same frequency across many strings) are AQE skew-join
 * territory, not a design quadratic.
 */
object FuzzyJoin {

  /** Inverted positional-gram index: (gram, occ, id, len) — `occ`
    * disambiguates repeated grams within one string so overlap counts
    * follow bag semantics. Strings shorter than `q` produce no grams
    * (callers route them down the short path). */
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
      row_number().over(Window.partitionBy(col("id"), col("gram"))
        .orderBy(col("pos"))))
      .select("gram", "occ", "id", "len")
  }

  /** Keep each string's `kq + 1` rarest (gram, occ) entries under the
    * global (corpus frequency, gram, occ) order — the Ed-Join prefix.
    * `freqOver` supplies the frequency table (must cover every gram of
    * `idx` — for two-table joins, build it over the UNION so both sides
    * rank under the SAME global order, or the prefix principle breaks). */
  private def rarestPrefix(idx: DataFrame, freqOver: DataFrame,
                           prefixLen: Int): DataFrame = {
    val freq = freqOver.groupBy("gram", "occ").agg(count(lit(1)).as("__f"))
    val wStr = Window.partitionBy(col("id"))
      .orderBy(col("__f").asc, col("gram").asc, col("occ").asc)
    idx.join(freq, Seq("gram", "occ"))
      .withColumn("__rk", row_number().over(wStr))
      .filter(col("__rk") <= prefixLen)
      .select("gram", "occ", "id", "len")
  }

  private def shortLimit(q: Int, k: Int): Int = q * (k + 1) - 1

  /**
   * All pairs `(id_a, id_b, dist)` with `id_a < id_b` and
   * `levenshtein <= maxDist` within one table. NULL strings never match
   * (SQL comparison semantics — matches the brute-force oracle where
   * `levenshtein(NULL, …)` is NULL).
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
    val pfx = rarestPrefix(idx, idx, maxDist * q + 1)
    val candLong = pfx.as("a").join(pfx.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

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
   * ref = master data). Both sides take their Ed-Join prefix under ONE
   * frequency order built over the union, so the prefix-collision
   * guarantee holds across tables; no orientation dedup is needed
   * because the two sides are distinct relations.
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
    val rIdx = gramIndex(r.filter(col("len") > lim), "id", "s", q)
    val union = pIdx.union(rIdx)
    val pPfx = rarestPrefix(pIdx, union, maxDist * q + 1)
    val rPfx = rarestPrefix(rIdx, union, maxDist * q + 1)
    val candLong = pPfx.as("a").join(rPfx.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // Short strings on EITHER side pair through the exact length path
    // (the gram prefix can't see them): short probes × all refs, plus
    // all probes × short refs, both as length equi-joins.
    val shortProbe = p.filter(col("len") <= lim)
      .select(col("id"), explode(
        expr(s"sequence(greatest(len - $maxDist, 0), len + $maxDist)")).as("plen"))
      .join(r.select(col("id").as("id_b"), col("len").as("plen")), Seq("plen"))
      .select(col("id").as("id_a"), col("id_b"))
    val shortRef = r.filter(col("len") <= lim)
      .select(col("id").as("id_b"), explode(
        expr(s"sequence(greatest(len - $maxDist, 0), len + $maxDist)")).as("plen"))
      .join(p.select(col("id").as("id_a"), col("len").as("plen")), Seq("plen"))
      .select(col("id_a"), col("id_b"))

    val cand = candLong.union(shortProbe).union(shortRef).distinct()
    cand
      .join(p.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(r.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0) // threshold variant: -1 = early-exited past bound
      .select(col("id_a").as("probe_id"), col("id_b").as("ref_id"), col("dist"))
  }

  /** Confirm join: pull each candidate pair's strings once, keep pairs
    * whose EXACT edit distance is within bound. */
  private def confirm(cand: DataFrame, strs: DataFrame, maxDist: Int): DataFrame =
    cand
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      // the threshold variant abandons a row's DP as soon as the running
      // minimum exceeds the bound — O(k·len) per pair instead of O(len²)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
}
