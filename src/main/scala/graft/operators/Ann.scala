package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column.
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact cosine against every vector. The probe
 *    side is broadcast, so the corpus never shuffles: one scan, local
 *    top-k per partition via window. The CORRECTNESS baseline; linear
 *    per probe, so only the small-probe-set regime scales.
 *  - [[lshTopK]] / [[cosineNearDupPairs]] — the 100 TB path: random-
 *    hyperplane signatures (sign-agreement probability p = 1 - angle/π)
 *    banded into `bands` keys of `bandBits` bits; vectors sharing any
 *    band bucket are candidates, then exact cosine confirms. Candidate
 *    generation shuffles only (band, key) pairs — corpus-linear.
 *
 * Band sizing (SCALING.md): recall at similarity s is
 * 1-(1-p^bandBits)^bands; accidental candidates per band ≈ N²/2^(bandBits+1)
 * for near-orthogonal corpora. bandBits is the pruning knob: 16-bit keys
 * give 65,536 buckets/band (the round-1 4-bit keys gave 16, which made
 * every pair a candidate — quadratic in disguise). Use wide keys + more
 * bands for the high-similarity near-dup regime; narrower keys only when
 * the probe side is small enough to bound the candidate volume.
 */
object Ann {

  /** id → one row per (band, key), via the native banded-signature pass. */
  private def banded(df: DataFrame, idCol: String, vecCol: String,
                     bands: Int, bandBits: Int): DataFrame =
    df.select(col(idCol),
      posexplode(VF.bandKeys(col(vecCol), bands, bandBits)).as(Seq("band", "key")))

  /** Exact top-k neighbours of each probe vector (probes broadcast). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     probes: DataFrame, probeIdCol: String, probeVecCol: String,
                     k: Int = 10): DataFrame = {
    val scored = corpus
      .join(broadcast(probes), col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
    topK(scored, k)
  }

  /**
   * LSH-bucketed approximate top-k: candidates share ≥1 signature band
   * with the probe; exact cosine ranks them.
   *
   * Candidate generation moves ONLY (query_id, id) pairs — the embedding
   * arrays are joined back after pair dedup, so a vector crosses the wire
   * once per unique candidate, not once per shared band.
   *
   * Default 16 bands × 8 bits: each probe draws ≈ bands·N/2^bandBits ≈
   * N/16 accidental candidates from a near-orthogonal corpus plus all
   * high-similarity neighbours w.h.p. — corpus-linear per probe with a
   * 16× prune. Raise bandBits as N grows (candidates scale 1/2^bandBits).
   *
   * `probeHamming = 1` enables multi-probe (Lv et al., VLDB'07): each
   * probe also queries every band key within Hamming distance 1 —
   * recall of a (bands × bandBits+?) config at the index size and
   * candidate profile of this one. The expansion is PROBE-side only
   * (×(bandBits+1) rows on the tiny side); the corpus index and its
   * shuffle volume are unchanged — the right trade when the index is
   * big and the query batch is small.
   */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, bands: Int = 16, bandBits: Int = 8,
              probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1, "probeHamming must be 0 or 1")
    val corpusB = banded(corpus, idCol, vecCol, bands, bandBits)
    val probesB0 = banded(probes, probeIdCol, probeVecCol, bands, bandBits)
    val probesB =
      if (probeHamming == 0) probesB0
      else probesB0
        .select(col(probeIdCol), col("band"), explode(array(
          col("key") +: (0 until bandBits).map(b =>
            col("key").bitwiseXOR(lit(1L << b))): _*)).as("key"))
    val cand = corpusB.join(broadcast(probesB),
        corpusB("band") === probesB("band") && corpusB("key") === probesB("key") &&
          col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand
      .join(broadcast(probes.select(col(probeIdCol).as("query_id"),
        col(probeVecCol).as("__qv"))), "query_id")
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v")), "vec_id")
      .select(col("query_id"), col("vec_id"),
        VF.cosine(col("__qv"), col("__v")).as("cosine"))
    topK(scored, k)
  }

  /**
   * Embedding-cosine near-dup pairs: banded LSH candidates + exact
   * cosine confirm at `threshold`.
   *
   * Same id-only discipline: the band self-join and pair dedup shuffle
   * 16-byte id pairs; vectors join back once per unique pair. (Carrying
   * the arrays through the candidate join turns megabytes of pair keys
   * into gigabytes of duplicated embeddings — measured as the difference
   * between 2s and minutes at sf0.1.)
   *
   * Default 8 bands × 16 bits targets the true near-dup regime
   * (cosine ≥ 0.9): recall ≈ 1-(1-p^16)^8 ≥ 0.99 at s ≥ 0.97 and
   * accidental pairs ≈ 8·N²/2^17 — a 16,000× prune vs all-pairs. This
   * operator is for near-DUPLICATES; low thresholds (< ~0.7) make any
   * LSH family degenerate toward all-pairs (p^bandBits → 0 recall or
   * 2^bandBits → no pruning) — use bruteForceTopK-style exact scoring
   * for those regimes instead.
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double = 0.9,
                         bands: Int = 8, bandBits: Int = 16): DataFrame = {
    val pairs = cosineCandidatePairs(df, idCol, vecCol, bands, bandBits)
    val vecs = df.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .withColumn("cosine", VF.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Candidate pairs only (pre-confirm) — exposed so specs can assert the
    * LSH prune factor: candidate count must be ≪ N²/2. */
  def cosineCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                           bands: Int = 8, bandBits: Int = 16): DataFrame = {
    val b = banded(df, idCol, vecCol, bands, bandBits)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * IVF (inverted-file) approximate top-k: a spherical k-means coarse
   * quantizer (cosine assignment over unit centroids) partitions the
   * corpus into `nCentroids` cells; each probe searches only its `nProbe`
   * nearest cells.
   *
   * Index build: the quantizer fits DRIVER-SIDE on a bounded collected
   * sample (`maxFitRows` — centroid quality needs a representative
   * sample, not the population), so build cost is independent of corpus
   * size: one footer-metadata row count plus ONE scan of the vector
   * column for the sample. Search: one corpus scan assigns cells via the
   * codegen'd [[graft.functions.NearestCells]] expression (the
   * unit-centroid matrix rides along as a task-local reference — no
   * normalization pass, no per-row allocation, no shuffle), then a
   * broadcast join on cell id touches only nProbe/nCentroids of the data
   * per probe.
   *
   * For repeated query batches, build the index ONCE with [[ivfIndex]]
   * (persisting `index.assigned` materializes the `__cell` assignment a
   * single time) and run each batch through [[ivfSearch]] — the
   * fit-sample scan and the cell assignment are then amortized across
   * every batch instead of repeated per query set.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, maxFitRows: Int = 20000): DataFrame =
    ivfSearch(ivfIndex(corpus, vecCol, nCentroids, seed, maxFitRows),
      idCol, vecCol, probes, probeIdCol, probeVecCol, k, nProbe)

  /**
   * A fitted IVF coarse quantizer: the unit centroid matrix plus the
   * corpus with its `__cell` assignment column. `assigned` is lazy like
   * any DataFrame — persist it to materialize the assignment once and
   * amortize it across query batches.
   */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the coarse quantizer and attach `__cell` to the corpus. */
  def ivfIndex(corpus: DataFrame, vecCol: String,
               nCentroids: Int = 16, seed: Long = 42L,
               maxFitRows: Int = 20000): IvfIndex = {
    // UNIFORM fit sample: limit() would take the first partitions only —
    // on a date/tenant-clustered table the centroids would all land in
    // one region of embedding space. Sizing the sample fraction needs a
    // row count, but NOT a vector-column scan: count() on the unprojected
    // relation is answered from parquet footer metadata. It counts null
    // vectors too, which only makes the fraction conservative (the
    // realized non-null sample shrinks below the 2× headroom, never
    // biases) — so the vector column is scanned exactly once, by the
    // sample read itself.
    val total = corpus.count()
    val vecs = corpus.select(col(vecCol)).where(col(vecCol).isNotNull)
    val sampled =
      if (total <= maxFitRows) vecs
      else vecs.sample(withReplacement = false,
        math.min(1.0, 2.0 * maxFitRows / total), seed).limit(maxFitRows)
    val sample = sampled.collect().map(_.getSeq[Double](0).toArray)
    val centroids = fitSphericalCentroids(sample, nCentroids, seed)
    IvfIndex(centroids,
      corpus.withColumn("__cell", VF.nearestCells(col(vecCol), centroids, 1)(0)))
  }

  /**
   * Persist a fitted [[IvfIndex]]: the centroid matrix as a small text
   * file (one comma-separated row per centroid — driver-side, tiny) and
   * the assigned corpus as parquet PARTITIONED BY `__cell`. The partition
   * layout is the on-disk inverted file: a probe batch touches only its
   * nProbe cells' directories (dynamic partition pruning on the cell
   * join), so repeated query batches never rescan the corpus.
   *
   * Uses the Hadoop FileSystem API for the centroid file, so the same
   * code addresses local disk, HDFS, or object stores.
   */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    index.assigned.write.mode("overwrite")
      .partitionBy("__cell").parquet(s"$path/assigned")
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(index.centroids.map(_.mkString(",")).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted [[IvfIndex]] (see [[saveIvfIndex]]). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    val centroids = text.split("\n").map(_.split(",").map(_.toDouble))
    IvfIndex(centroids, spark.read.parquet(s"$path/assigned"))
  }

  /** Search a fitted [[IvfIndex]] with one probe batch. */
  def ivfSearch(index: IvfIndex, idCol: String, vecCol: String,
                probes: DataFrame, probeIdCol: String, probeVecCol: String,
                k: Int = 10, nProbe: Int = 4): DataFrame = {
    val assigned = index.assigned
    val probeCells = probes
      .select(col(probeIdCol), col(probeVecCol),
        explode(VF.nearestCells(col(probeVecCol), index.centroids, nProbe)).as("__cell"))
    val cand = assigned.join(broadcast(probeCells),
        assigned("__cell") === probeCells("__cell") && col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
      .dropDuplicates("query_id", "vec_id")
    topK(cand, k)
  }

  /**
   * Seeded spherical k-means (k-means++ init, cosine assignment, mean +
   * renormalize update) over an in-memory sample. Deterministic for a
   * given (sample, k, seed). Empty cells keep their previous centroid.
   */
  private[operators] def fitSphericalCentroids(
      sample: Array[Array[Double]], k: Int, seed: Long,
      iters: Int = 15): Array[Array[Double]] = {
    require(sample.nonEmpty, "cannot fit centroids on an empty sample")
    val dim = sample(0).length
    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v.clone() else v.map(_ / n)
    }
    val unit = sample.map(normalize)
    val rnd = new scala.util.Random(seed)

    // k-means++ seeding on the unit sphere (distance = 1 - cosine).
    val centers = scala.collection.mutable.ArrayBuffer(unit(rnd.nextInt(unit.length)))
    while (centers.length < k) {
      val d2 = unit.map { v =>
        val best = centers.map(c => 1.0 - dotArr(v, c)).min
        best * best
      }
      val total = d2.sum
      val pick =
        if (total <= 0.0) rnd.nextInt(unit.length)
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < d2.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
          i
        }
      centers += unit(pick)
    }
    var cents = centers.toArray.map(_.clone())

    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      unit.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val d = dotArr(v, cents(c))
          if (d > bestDot) { best = c; bestDot = d }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))
      }
      iter += 1
    }
    cents
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /**
   * Mutual (reciprocal) top-k pairs — the stricter near-neighbor signal
   * used by cluster-pruning/SemDeDup-style curation: keep `(a, b)` only
   * when b is in a's top-k AND a is in b's top-k of the SAME ranked
   * self-retrieval table (one-directional top-k admits hubness
   * artifacts: a popular vector appears in everyone's list without
   * reciprocating). Input is any `(query_id, vec_id, cosine)` ranked
   * output over one id space (e.g. [[bruteForceTopK]] / [[lshTopK]]
   * probed with the corpus itself); output one row per unordered pair,
   * `id_a < id_b`, with both directed cosines (equal for exact scoring;
   * they can differ under approximate/truncated candidates — keeping
   * both makes the asymmetry visible instead of silently averaged).
   *
   * Scale shape: a self-join of two k·N-row projections on the flipped
   * pair key — never the vectors, never the corpus.
   */
  def mutualTopK(candidates: DataFrame, queryCol: String, docCol: String,
                 scoreCol: String): DataFrame = {
    val fwd = candidates.select(col(queryCol).as("__qa"),
      col(docCol).as("__da"), col(scoreCol).as("cosine_ab"))
    val rev = candidates.select(col(queryCol).as("__qb"),
      col(docCol).as("__db"), col(scoreCol).as("cosine_ba"))
    fwd.join(rev, col("__qa") === col("__db") && col("__da") === col("__qb"))
      .filter(col("__qa") < col("__da"))
      .select(col("__qa").as("id_a"), col("__da").as("id_b"),
        col("cosine_ab"), col("cosine_ba"))
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // rank as BIGINT: SQL row_number() is 64-bit, and the brute-force gate
    // is oracle-checked against DuckDB's — keep widths identical.
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }
}
