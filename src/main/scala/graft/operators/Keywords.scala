package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-document keyword extraction — tf-idf-shaped term ranking with a
 * deliberately INTEGER ordering: terms rank by (term frequency DESC,
 * document frequency ASC, term ASC). That is the same preference order
 * tf·idf induces (frequent in the doc, rare in the corpus) but with no
 * floating-point score, so results are bit-stable across engines,
 * partitionings, and reruns — and DuckDB-oracle-checkable. A float
 * tf·ln(N/df) score is one projection away for consumers that want it;
 * the RANKING deliberately does not depend on it.
 *
 * Scale shape: explode → two hash aggregations (per-doc term counts,
 * corpus doc frequencies) → broadcast-joinable df side only if small;
 * otherwise a key-partitioned join on term, then one window top-k per
 * doc. Shuffles carry (doc_id, term, counts) — never documents.
 */
object Keywords {

  /**
   * Top-k terms per document. Terms are whitespace tokens of the trimmed
   * text, lowercased; single-char tokens are dropped (pure noise at
   * ranking time, and dropping them bounds the term universe).
   */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 1)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
  }
}
