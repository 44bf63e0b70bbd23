package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic data augmentation for denoising training objectives.
 *
 * [[spanCorrupt]] is the T5 span-corruption transform (Raffel et al.,
 * JMLR'20): mask contiguous token spans, emit the corrupted input with
 * one `<extra_id_K>` sentinel per masked span and the target that
 * reconstructs the spans behind their sentinels. Unlike T5's RNG-driven
 * sampler, masking here is CONTENT-DETERMINISTIC (md5 over
 * `seed:id:block` — the repo's Split/Sample hash discipline), so the
 * same corpus + seed always yields byte-identical training pairs: a
 * re-run of a 100 TB job reproduces, an incremental run doesn't
 * re-corrupt history differently, and the DuckDB oracle can replay the
 * exact construction. Spans are fixed-length blocks (`spanLen` tokens;
 * the doc tail may be shorter) dropped with probability `noiseDensity`
 * per block; ADJACENT dropped blocks merge into one span/sentinel,
 * matching T5's contiguous-span semantics.
 *
 * Scale shape: one posexplode keyed by (id, pos), two window passes
 * over each document's own tokens (partitioned by id — no global
 * window), and one ordered re-assembly via `array_sort(collect_list)`
 * (deterministic: structs sort by pos). The corpus shuffles once by id.
 */
object Augment {

  private def toks(c: Column): Column =
    filter(split(trim(coalesce(c, lit(""))), "\\s+"), t => t =!= "")

  /**
   * T5 span corruption. Output one row per input row:
   * `(id, input_text, target_text, n_tokens, n_dropped, n_spans)` —
   * `input_text` = kept tokens with one `<extra_id_K>` (K 0-based, in
   * document order) per masked span; `target_text` = each sentinel
   * followed by the tokens it hides (no trailing EOS sentinel — add
   * downstream if the trainer wants T5's closing `<extra_id_n>`).
   * Empty/whitespace documents pass through with empty texts.
   */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  noiseDensity: Double = 0.15, spanLen: Int = 3,
                  seed: String = "graft"): DataFrame = {
    require(noiseDensity >= 0.0 && noiseDensity <= 1.0,
      "noiseDensity must be in [0, 1]")
    require(spanLen >= 1, "spanLen must be >= 1")
    val base = df.select(col(idCol).as("id"), toks(col(textCol)).as("__t"))
    val tok = base
      .select(col("id"), posexplode(col("__t")).as(Seq("pos", "tok")))
      .withColumn("__blk", (col("pos") / spanLen).cast("long"))
      .withColumn("__drop",
        substring(md5(concat(lit(seed), lit(":"), col("id").cast("string"),
          lit(":"), col("__blk").cast("string"))), 1, 8) <
          lit(Split.thresholdHex(noiseDensity)))
    val w = Window.partitionBy("id").orderBy("pos")
    val flagged = tok
      .withColumn("__start",
        col("__drop") && !coalesce(lag(col("__drop"), 1).over(w), lit(false)))
      .withColumn("__run",
        sum(when(col("__start"), lit(1L)).otherwise(lit(0L))).over(w))
    val sentinel = concat(lit("<extra_id_"),
      (col("__run") - 1).cast("string"), lit(">"))
    val inputTok = when(!col("__drop"), col("tok"))
      .when(col("__start"), sentinel)
    val targetTok = when(col("__drop") && col("__start"),
        concat(sentinel, lit(" "), col("tok")))
      .when(col("__drop"), col("tok"))
    def joined(c: Column): Column =
      concat_ws(" ", transform(
        array_sort(collect_list(when(c.isNotNull,
          struct(col("pos"), c.as("s"))))),
        x => x.getField("s")))
    val built = flagged.groupBy("id").agg(
      joined(inputTok).as("input_text"),
      joined(targetTok).as("target_text"),
      sum(when(col("__drop"), lit(1L)).otherwise(lit(0L))).as("n_dropped"),
      max(col("__run")).as("n_spans"))
    base.select(col("id"),
        size(col("__t")).cast("long").as("n_tokens"))
      .join(built, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        col("n_tokens"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** Per-token md5 decision `(id, pos, tok, __hit)` over `seed:id:pos`
    * — the [[spanCorrupt]] hash discipline at token granularity,
    * shared by [[wordDropout]] and [[tokenMask]]. */
  private def tokenFlags(df: DataFrame, idCol: String, textCol: String,
                         rate: Double, seed: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    df.select(col(idCol).as("id"), toks(col(textCol)).as("__t"))
      .select(col("id"), size(col("__t")).cast("long").as("__n"),
        posexplode_outer(col("__t")).as(Seq("pos", "tok")))
      .withColumn("__hit",
        substring(md5(concat(lit(seed), lit(":"), col("id").cast("string"),
          lit(":"), col("pos").cast("string"))), 1, 8) <
          lit(Split.thresholdHex(rate)))
  }

  private def reassemble(flagged: DataFrame, outTok: Column,
                         hitName: String): DataFrame =
    flagged.groupBy("id").agg(
      concat_ws(" ", transform(
        array_sort(collect_list(when(outTok.isNotNull,
          struct(col("pos"), outTok.as("s"))))),
        x => x.getField("s"))).as("text_out"),
      max(col("__n")).as("n_tokens"),
      sum(when(col("__hit") && col("tok").isNotNull, lit(1L))
        .otherwise(lit(0L))).as(hitName))

  /**
   * Word dropout (deterministic): drop each whitespace token with
   * probability `rate`, decided by md5 over `seed:id:pos` — the same
   * content-deterministic discipline as [[spanCorrupt]], so re-runs
   * and the oracle reproduce byte-identically. Output
   * `(id, text_out, n_tokens, n_dropped)`; empty documents pass
   * through with empty text.
   *
   * Scale shape: one posexplode + one id-keyed re-assembly — a single
   * corpus shuffle, no windows (per-token decisions don't need
   * neighbor state, unlike span merging).
   */
  def wordDropout(df: DataFrame, idCol: String, textCol: String,
                  rate: Double = 0.1, seed: String = "graft"): DataFrame =
    reassemble(tokenFlags(df, idCol, textCol, rate, seed),
      when(!col("__hit"), col("tok")), "n_dropped")

  /**
   * Token masking (deterministic): replace each selected token with
   * `mask` instead of dropping it — the BERT-style corruption; same
   * hash discipline and shape as [[wordDropout]]. Output
   * `(id, text_out, n_tokens, n_masked)`.
   */
  def tokenMask(df: DataFrame, idCol: String, textCol: String,
                rate: Double = 0.15, mask: String = "<mask>",
                seed: String = "graft"): DataFrame =
    reassemble(tokenFlags(df, idCol, textCol, rate, seed),
      when(col("tok").isNotNull,
        when(col("__hit"), lit(mask)).otherwise(col("tok"))), "n_masked")
}
