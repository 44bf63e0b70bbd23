package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
 * embedding space with a coarse k-means quantizer, then search for
 * near-duplicate pairs ONLY within each cluster — the cluster bound is
 * what keeps the pairwise step tractable at scale.
 *
 * Reuses [[Ann.ivfIndex]] (in-plan Lloyd spherical k-means fit +
 * codegen'd cell assignment) for the clustering step. The
 * within-cell candidate join shuffles (cell, id) pairs and the pairwise
 * cost is Σ |cell|² — with k cells of balanced size that is N²/k, and k
 * grows with N (SemDeDup's own scaling recipe), so each cell's quadratic
 * stays bounded. Embedding vectors join back once per unique candidate
 * pair, never through the candidate join itself.
 *
 * Policy: deterministic keep-smallest-id — a document is dropped iff some
 * smaller-id document in its cell is within `threshold` cosine. Unlike
 * random-keep, re-running never flips survivors.
 */
object SemDedup {

  /**
   * Within-cluster near-duplicate pairs (id_a < id_b, cosine ≥ threshold).
   * The audit surface; feed to [[Dedup.connectedComponents]] for cluster
   * labels or use [[dedup]] for the one-pass survivor set.
   */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.9, nCentroids: Int = 16,
                    seed: Long = 42L, lloydIter: Int = 2): DataFrame = {
    val index = Ann.ivfIndex(df.select(col(idCol), col(vecCol)), idCol, vecCol,
      nCentroids, seed, lloydIter)
    val cells = index.assigned.select(col(idCol).as("id"), col("__cell"))
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.__cell") === col("b.__cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val vecs = df.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .withColumn("cosine", VF.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Survivors: rows with no smaller-id semantic near-dup in their cell. */
  def dedup(df: DataFrame, idCol: String, vecCol: String,
            threshold: Double = 0.9, nCentroids: Int = 16,
            seed: Long = 42L, lloydIter: Int = 2): DataFrame = {
    val dropped = semanticPairs(df, idCol, vecCol, threshold, nCentroids,
      seed, lloydIter).select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }
}
