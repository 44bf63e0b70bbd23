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
 *    hyperplane signatures (sign-agreement probability 1 - angle/π),
 *    banded into b chunks of nBits/b bits; vectors sharing any band
 *    bucket are candidates, then exact cosine confirms. Candidate
 *    generation shuffles only (band, bucket) keys — corpus-linear, with
 *    recall tunable via band count (more/narrower bands = higher recall,
 *    more candidates).
 */
object Ann {

  /** id + banded signature chunks: one row per (band, key). */
  private def banded(df: DataFrame, idCol: String, vecCol: String,
                     nBits: Int, bands: Int, extra: Seq[String]): DataFrame = {
    require(nBits % bands == 0, "nBits must be divisible by bands")
    val bandBits = nBits / bands
    val mask = (1L << bandBits) - 1
    df.withColumn("__sig", VF.hyperplaneSignature(col(vecCol), nBits))
      .select((idCol +: vecCol +: extra).map(col) :+ posexplode(array(
        (0 until bands).map(j =>
          shiftrightunsigned(col("__sig"), j * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "key")): _*)
  }

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
   */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, nBits: Int = 64, bands: Int = 16): DataFrame = {
    val corpusB = banded(corpus, idCol, vecCol, nBits, bands, Nil)
      .select(col(idCol), col("band"), col("key"))
    val probesB = banded(probes, probeIdCol, probeVecCol, nBits, bands, Nil)
      .select(col(probeIdCol), col("band"), col("key"))
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
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double = 0.9,
                         nBits: Int = 64, bands: Int = 16): DataFrame = {
    val b = banded(df, idCol, vecCol, nBits, bands, Nil)
      .select(col(idCol), col("band"), col("key"))
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

  /**
   * IVF (inverted-file) approximate top-k: a k-means coarse quantizer
   * over L2-normalized vectors (Euclidean on unit vectors ≡ cosine
   * ordering) partitions the corpus into `nCentroids` cells; each probe
   * searches only its `nProbe` nearest cells.
   *
   * Index build is an offline k-means fit (sampled); the search itself
   * is corpus-linear in the probed cells only: candidates come from a
   * broadcast semi-join on cell id — at 100 TB the corpus is scanned
   * once to assign cells (materialize `assign` as a column to amortize
   * across queries) and each probe touches nProbe/nCentroids of it.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val unit = normalized(corpus, vecCol)
    val feat = unit.withColumn("__f", array_to_vector(col("__unit")))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("__cell")
      .fit(feat.select("__f"))
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
