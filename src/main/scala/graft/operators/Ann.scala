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
   */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, bands: Int = 16, bandBits: Int = 8): DataFrame = {
    val corpusB = banded(corpus, idCol, vecCol, bands, bandBits)
    val probesB = banded(probes, probeIdCol, probeVecCol, bands, bandBits)
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
    val b = banded(df, idCol, vecCol, bands, bandBits)
    val pairs = b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .dropDuplicates("id_a", "id_b")
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
   * IVF (inverted-file) approximate top-k: a k-means coarse quantizer
   * over L2-normalized vectors (Euclidean on unit vectors ≡ cosine
   * ordering) partitions the corpus into `nCentroids` cells; each probe
   * searches only its `nProbe` nearest cells.
   *
   * The quantizer fits on a bounded SAMPLE of the corpus (`maxFitRows`,
   * cached for the iterative k-means passes — centroid quality needs a
   * representative sample, not the population), so index build cost is
   * independent of corpus size; the full corpus is scanned exactly once
   * to assign cells (materialize `assign` as a column to amortize across
   * query batches at 100 TB), and each probe touches nProbe/nCentroids
   * of the data via a broadcast join on cell id.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, maxFitRows: Int = 20000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val unit = normalized(corpus, vecCol)
    val feat = unit.withColumn("__f", array_to_vector(col("__unit")))
    val fitSet = feat.select("__f").limit(maxFitRows).cache()
    val model = try
      new KMeans().setK(nCentroids).setSeed(seed)
        .setFeaturesCol("__f").setPredictionCol("__cell")
        .fit(fitSet)
    finally fitSet.unpersist()
    val assigned = model.transform(feat)
      .select(col(idCol), col(vecCol), col("__cell"))

    // Probe → its nProbe nearest cells, via the (tiny) centroid table.
    val spark = corpus.sparkSession
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toIndexedSeq
        .map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("__cell", "__centroid")
    val probeCells = normalized(probes, probeVecCol).as("p")
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", VF.l2Distance(col("__unit"), col("__centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(probeIdCol).orderBy(col("__dist").asc, col("__cell").asc)))
      .filter(col("__r") <= nProbe)
      .select(col(probeIdCol), col(probeVecCol), col("__cell"))

    val cand = assigned.join(broadcast(probeCells),
        assigned("__cell") === probeCells("__cell") && col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
      .dropDuplicates("query_id", "vec_id")
    topK(cand, k)
  }

  private def normalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__norm", VF.l2Norm(col(vecCol)))
      .withColumn("__unit",
        when(col("__norm") === 0.0, col(vecCol))
          .otherwise(transform(col(vecCol), x => x / col("__norm"))))
      .drop("__norm")

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }
}
