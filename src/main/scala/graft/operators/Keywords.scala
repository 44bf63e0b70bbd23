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

  /**
   * "Fightin' Words" distinctive terms (Monroe, Colaresi & Quinn 2008):
   * what vocabulary separates one slice of the corpus from the rest —
   * the log-odds-ratio with a symmetric Dirichlet prior and its
   * z-score, the statistically honest version of "top terms per class"
   * (raw frequency ratios over-rank rare terms; the prior shrinks them,
   * the variance term discounts what little evidence they carry):
   *
   *   δ_w = ln((y_t+α)/(n_t+α₀−y_t−α)) − ln((y_r+α)/(n_r+α₀−y_r−α))
   *   z_w = δ_w / √(1/(y_t+α) + 1/(y_r+α)),  α₀ = α·|V|
   *
   * Top-k by z DESC (term ASC ties): the k terms most characteristic of
   * `targetClass`. Output `(rnk, term, n_target, n_rest, z)`.
   *
   * Scale shape: one explode → (term, class-side counts) reduce with
   * map-side combine; the three corpus scalars (n_t, n_r, |V|) ride a
   * 1-row broadcast; top-k plans as TakeOrderedAndProject. Float
   * discipline: each ln and the √ run on exact-integer-derived doubles,
   * δ rounds to 9 dp before the division, z to 6 dp.
   */
  def logOddsTerms(df: DataFrame, textCol: String, classCol: String,
                   targetClass: String, alpha: Double = 0.01,
                   k: Int = 20): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val toks = df.select(
      (col(classCol).cast("string") === targetClass).as("__t"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 1)
    val cells = toks.groupBy("term").agg(
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("n_target"),
      sum(when(col("__t"), lit(0L)).otherwise(lit(1L))).as("n_rest"))
    val tot = cells.agg(sum("n_target").as("__nt"), sum("n_rest").as("__nr"),
      count(lit(1)).as("__v"))
    val a = lit(alpha)
    val a0 = lit(alpha) * col("__v")
    def lodds(y: org.apache.spark.sql.Column,
              n: org.apache.spark.sql.Column) =
      log((y + a) / (n + a0 - y - a))
    val scored = cells.crossJoin(tot)
      .withColumn("__delta", round(
        lodds(col("n_target").cast("double"), col("__nt").cast("double")) -
          lodds(col("n_rest").cast("double"), col("__nr").cast("double")), 9))
      .withColumn("z", round(col("__delta") /
        sqrt(lit(1.0) / (col("n_target") + a) +
          lit(1.0) / (col("n_rest") + a)), 6))
    scored.orderBy(col("z").desc, col("term").asc).limit(k)
      .select(col("term"), col("n_target"), col("n_rest"), col("z"))
  }
}
