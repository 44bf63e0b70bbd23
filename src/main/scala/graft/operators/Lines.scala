package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-global line-level deduplication — the C4/RefinedWeb boilerplate
 * pass: a line that recurs across more than `maxDocs` distinct documents
 * (navigation chrome, cookie banners, "subscribe" calls-to-action) is
 * removed from EVERY document, and each document's remaining lines are
 * stitched back together in their original order.
 *
 * Scale shape (the 100 TB story):
 *   1. `posexplode(split(text, '\n'))` — one codegen'd scan, no shuffle.
 *   2. Hot-line detection aggregates DISTINCT (line, doc) then counts per
 *      line — the only shuffle that carries line text, and partial
 *      aggregation dedups (line, doc) pairs map-side first.
 *   3. The hot set is tiny by construction (Zipf: at threshold k there are
 *      at most total_lines/k hot lines, and real boilerplate sets are
 *      thousands of lines) — the removal LEFT ANTI joins on an 8-byte
 *      `xxhash64(line)` key and AQE broadcasts the hot side from runtime
 *      stats (unhinted: a pathological threshold degrades to a shuffled
 *      anti-join instead of a forced-broadcast OOM).
 *   4. Reassembly groups the surviving lines by document — the one
 *      unavoidable by-doc shuffle, carrying exactly the kept lines once.
 *
 * Reference scope: the reference has no corpus-global text operator (its
 * engine is per-stage SQL over one browser tab); this is part of the
 * training-data extension surface, like graft.operators.Dedup.
 */
object Lines {

  /** (doc_id, pos, line) — one row per physical line, `pos` 0-based. */
  private def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n", -1)).as(Seq("pos", "line")))

  /**
   * Lines occurring in more than `maxDocs` DISTINCT documents, with their
   * document frequency: `(line, n_docs)`. Repeats of a line inside one
   * document count once — boilerplate is a cross-document phenomenon.
   */
  def duplicatedLines(df: DataFrame, idCol: String, textCol: String,
                      maxDocs: Int): DataFrame =
    explodeLines(df, idCol, textCol)
      .select("line", "doc_id").distinct()
      .groupBy("line").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)

  /**
   * Remove every line that appears in more than `maxDocs` distinct
   * documents; rebuild each document's text from its surviving lines in
   * original order. Documents whose every line was boilerplate come back
   * as the empty string (they are candidates for a follow-up length
   * filter, not silent row loss). All non-text columns pass through.
   */
  /**
   * Join-free removal of a KNOWN boilerplate line set (e.g. the output of
   * [[duplicatedLines]] from a prior batch run): the list ships as a
   * literal array and each row answers for itself — a pure projection, so
   * it applies UNCHANGED to a Structured Streaming source, where the
   * corpus-global count of [[dedupLines]] is unbounded state. Right for
   * lists up to ~10k lines (≤ lines-per-doc × |list| compares per row);
   * the same inline-vs-join trade as Web.blockByDomainInline.
   */
  def removeLinesInline(df: DataFrame, textCol: String,
                        boilerplate: Seq[String]): DataFrame = {
    val bl = typedlit(boilerplate)
    df.withColumn(textCol,
      array_join(
        filter(split(coalesce(col(textCol), lit("")), "\n", -1),
          x => !array_contains(bl, x)),
        "\n"))
  }

  /**
   * WITHIN-document duplicate-line removal — the complement of the
   * corpus-global pass: a page that repeats its own nav block or a
   * scraper that doubled a paragraph dedups against ITSELF, keeping the
   * first occurrence of every line in original order. A pure projection
   * — no shuffle, no state — so it applies unchanged to a streaming
   * source and composes before [[dedupLines]] (intra-doc repeats would
   * otherwise never trip the distinct-document threshold). The
   * first-occurrence test is `array_position` per element — O(lines²)
   * compares per document, row-local; documents are line-bounded (a
   * megabyte blob wants a length cap upstream, same caveat as
   * TextFunctions.simpsonDiversity).
   *
   * Output: original columns with `textCol` rewritten, plus
   * `n_lines`/`n_removed` counters for the curation report.
   */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    df.withColumn("__lines", split(coalesce(col(textCol), lit("")), "\n", -1))
      .withColumn("__kept", expr(
        "filter(__lines, (x, i) -> array_position(__lines, x) == i + 1)"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_removed",
        (size(col("__lines")) - size(col("__kept"))).cast("long"))
      .withColumn(textCol, array_join(col("__kept"), "\n"))
      .drop("__lines", "__kept")

  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 maxDocs: Int): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    // 8-byte join key: the anti-join never carries hot line TEXT, only
    // hashes, and xxhash64 collisions (~2^-64 per pair) merely remove an
    // extra innocent line — same failure class as Dedup.exactDedup digests.
    // No broadcast HINT: the hot set is usually tiny and AQE broadcasts it
    // from runtime stats, but a pathological threshold must degrade to a
    // shuffled anti-join, not to a forced-broadcast driver OOM.
    val hot = duplicatedLines(df, idCol, textCol, maxDocs)
      .select(xxhash64(col("line")).as("line_h"))
    val kept = lines.withColumn("line_h", xxhash64(col("line")))
      .join(hot, Seq("line_h"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(concat_ws("\n",
        expr("transform(array_sort(collect_list(struct(pos, line))), s -> s.line)"))
        .as("__rebuilt"))
    df.withColumnRenamed(idCol, "doc_id")
      .drop(textCol)
      .join(rebuilt, Seq("doc_id"), "left")
      .withColumn(textCol, coalesce(col("__rebuilt"), lit("")))
      .drop("__rebuilt")
      .withColumnRenamed("doc_id", idCol)
  }
}
