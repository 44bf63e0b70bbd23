package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Token-window document chunking — the embedding/RAG preprocessing step:
 * split each document into windows of at most `maxTokens` whitespace
 * tokens, consecutive windows overlapping by `overlap` tokens (so no
 * span longer than the window ever straddles a boundary unseen).
 *
 * Pure per-row expression work (sequence/transform/slice built-ins): the
 * explode multiplies rows by ≈ tokens/(maxTokens-overlap) but involves no
 * shuffle, and chunk counts are exact integer arithmetic — the whole
 * operator is oracle-checkable and runs at scan speed at 100 TB.
 */
object Chunk {

  /** (id, chunk_index, chunk) — one row per token window. Documents with
    * ≤ maxTokens tokens yield exactly one chunk (the whole document);
    * NULL-text rows are dropped (posexplode of a null chunk list — the
    * same contract as SQL UNNEST of NULL; run [[Clean.cleanStrings]] +
    * a null filter first if ids must be preserved). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val s = size(toks)
    // k = 1 if S <= max else ceil((S - max)/stride) + 1 — exact ints via
    // fixed-shape double floor (values far below 2^53)
    val k = when(s <= maxTokens, lit(1)).otherwise(
      floor(((s - maxTokens).cast("double") + lit(stride - 1)) / lit(stride))
        .cast("int") + 1)
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0), k - 1),
        i => array_join(slice(toks, i * stride + 1, lit(maxTokens)), " ")))
      .as(Seq("chunk_index", "chunk")))
  }
}
