package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — flag (and drop) training documents that
 * share any word n-gram with a held-out evaluation set, the standard
 * n-gram-overlap decontamination of LLM training pipelines (GPT-3 paper
 * appendix C uses 13-grams; the knob is `n`).
 *
 * Scale shape: the eval set is SMALL (benchmarks are thousands of
 * documents, the corpus is the 100 TB side), so its distinct shingle set
 * is broadcast and the corpus-side check is a broadcast semi/anti join on
 * 8-byte shingle hashes inside the corpus scan — zero shuffle of corpus
 * data. Per-doc hit counts additionally need only a groupBy on doc id,
 * which AQE coalesces to the matched subset (typically a tiny fraction).
 *
 * Shingles are hashed (xxhash64) on both sides — set intersection over
 * 64-bit hashes equals string intersection up to ~2⁻⁶⁴-scale collisions.
 */
object Decontaminate {

  /** Distinct hashed n-gram shingles of the eval set, one column `sh`. */
  private def evalShingles(evalSet: DataFrame, textCol: String, n: Int): DataFrame =
    evalSet.select(explode(
      TextFunctions.hashedShingleSet(col(textCol), n)).as("sh")).distinct()

  /** Corpus-side shingle rows matched against the broadcast eval set —
    * the shared candidate derivation for both the audit and the filter. */
  private def matchedShingles(corpus: DataFrame, idCol: String, textCol: String,
                              evalSet: DataFrame, evalTextCol: String,
                              n: Int): DataFrame =
    corpus.select(col(idCol),
        explode(TextFunctions.hashedShingleSet(col(textCol), n)).as("sh"))
      .join(broadcast(evalShingles(evalSet, evalTextCol, n)), "sh")

  /**
   * Per-document contamination report: every corpus doc with the number
   * of distinct eval shingles it contains (`n_hits`, > 0 by construction
   * of the inner join) — the audit surface.
   */
  def contaminationHits(corpus: DataFrame, idCol: String, textCol: String,
                        evalSet: DataFrame, evalTextCol: String,
                        n: Int = 13): DataFrame =
    matchedShingles(corpus, idCol, textCol, evalSet, evalTextCol, n)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))

  /**
   * The clean corpus: documents sharing NO n-gram with the eval set.
   * Broadcast anti-join against the eval shingle set, evaluated inside
   * the corpus scan — rows explode per-partition, check, and only
   * surviving doc ids leave the stage.
   */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13): DataFrame = {
    val contaminatedIds =
      matchedShingles(corpus, idCol, textCol, evalSet, evalTextCol, n)
        .select(idCol).distinct()
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /**
   * SEMANTIC decontamination: corpus rows whose embedding is
   * near-identical (cosine ≥ `threshold`) to ANY eval example — catches
   * paraphrased/translated eval leakage that shingle overlap cannot see.
   * Output is the best eval match per contaminated corpus row:
   * `(idCol, eval_id, cosine)` (ties → smallest eval id).
   *
   * Scale shape: the eval set is the SMALL side by definition →
   * broadcast nested-loop with the codegen'd fused cosine, one pass over
   * the corpus (|corpus|×|eval| dot products, corpus never shuffles);
   * the per-row argmax is a map-side-combined struct-min. For an
   * unusually large eval set, band both sides with
   * [[Ann.cosineNearDupPairs]] on the union instead — that path trades
   * the exact scan for LSH recall.
   */
  def semanticOverlap(corpus: DataFrame, idCol: String, vecCol: String,
                      evalSet: DataFrame, evalIdCol: String,
                      evalVecCol: String, threshold: Double): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(evalSet.select(col(evalIdCol).as("__eid"),
        col(evalVecCol).as("__ev"))))
      .select(col(idCol), col("__eid"),
        round(VF.cosine(col("__v"), col("__ev")), 6).as("__cos"))
      .filter(col("__cos") >= threshold)
      .groupBy(idCol)
      .agg(min(struct((-col("__cos")).as("nc"), col("__eid").as("e"))).as("m"))
      .select(col(idCol), col("m.e").as("eval_id"),
        (-col("m.nc")).as("cosine"))
  }
}
