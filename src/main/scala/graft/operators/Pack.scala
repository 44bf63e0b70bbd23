package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sequence packing — assign documents to fixed token-budget
 * packs (the batch-assembly step of LLM pretraining: concatenate docs
 * until ~`budget` tokens, start the next pack).
 *
 * Packing is inherently sequential (a running sum), so a single global
 * cumulative window would serialize the corpus through ONE partition —
 * the classic scale killer. This operator shards first (`doc_id %
 * shards`, engine-portable and reproducible) and packs WITHIN each shard:
 * every shard's window is an independent partition of the shuffle, so
 * parallelism = `shards` (size it to the cluster), and pack identity is
 * the deterministic pair (shard, pack).
 *
 * Offset packing rule (the deterministic, windowable formulation):
 * a document joins the pack whose `budget`-token window contains its
 * START offset in the shard's running concatenation — packs average
 * `budget` tokens, documents are never split or dropped, and boundary
 * documents overflow their pack rather than being truncated (chunk or
 * truncate upstream if exact caps are required).
 */
object Pack {

  /**
   * Adds (`shard`, `pack`) to each row. `tokenCol` is the document's
   * token count (see TextFunctions.tokenCount). Pack boundaries follow
   * cumulative token counts in ascending `idCol` order within the shard:
   * `pack = floor((cumsum - tokens) / budget)` — exact integer
   * arithmetic, so the assignment is oracle-checkable in SQL.
   */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards >= 1, "shards must be >= 1")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack",
        floor((col("__cum") - col(tokenCol)).cast("double") / lit(budget).cast("double")).cast("long"))
      .drop("__cum")
  }

  /**
   * The consumer half of packing: materialize each pack as ONE training
   * row — `(shard, pack, n_docs, n_tokens, text)` with member documents
   * concatenated in `idCol` order, separated by `sep` (defaults to the
   * end-of-text sentinel style "\n\n"). One aggregation keyed by the
   * (shard, pack) pair [[packByTokenBudget]] produced; the per-pack
   * collect is bounded by the token budget, so no group outgrows a task.
   */
  def assemble(df: DataFrame, idCol: String, tokenCol: String,
               textCol: String, budget: Long, shards: Int = 64,
               sep: String = "\n\n"): DataFrame =
    packByTokenBudget(df, idCol, tokenCol, budget, shards)
      .groupBy("shard", "pack")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        concat_ws(sep,
          expr(s"transform(array_sort(collect_list(struct($idCol, $textCol))), s -> s.$textCol)"))
          .as("text"))

  /**
   * Length-bucketed batching — the inference/eval counterpart of
   * [[packByTokenBudget]]: group rows into fixed-size batches of
   * SIMILAR length so each batch's pad-to-max waste is bounded by its
   * bucket cap, not the corpus maximum (the difference between ~5% and
   * ~500% padding on a long-tailed length distribution).
   *
   * `edges` are ascending bucket caps; a row lands in the smallest cap
   * ≥ its length (longer rows clamp into the top bucket — truncate
   * upstream if hard caps are required). Batch index = rank within
   * (bucket, shard) by ascending `idCol`, integer-divided by
   * `batchSize` — deterministic and oracle-checkable. Sharding keeps
   * the per-bucket window from serializing a huge bucket through one
   * partition, same discipline as [[packByTokenBudget]]; parallelism =
   * buckets × shards.
   *
   * Output = input + `bucket_cap`, `shard`, `batch`, `padding`
   * (cap − min(len, cap): the per-row pad cost at assembly time).
   */
  def lengthBuckets(df: DataFrame, idCol: String, lenCol: String,
                    edges: Seq[Long], batchSize: Int,
                    shards: Int = 64): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be ascending and distinct")
    require(batchSize >= 1, "batchSize must be >= 1")
    require(shards >= 1, "shards must be >= 1")
    val len = col(lenCol).cast("long")
    val cap = edges.dropRight(1).reverse.foldLeft(lit(edges.last)) {
      (acc, e) => when(len <= e, lit(e)).otherwise(acc)
    }
    val w = Window.partitionBy(col("bucket_cap"), col("shard"))
      .orderBy(col(idCol))
    df.withColumn("bucket_cap", cap.cast("long"))
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("batch",
        floor((row_number().over(w) - lit(1)) / lit(batchSize)).cast("long"))
      .withColumn("padding", col("bucket_cap") - least(len, col("bucket_cap")))
  }

  /**
   * Packing-efficiency report over [[packByTokenBudget]] output — the
   * numbers that decide whether the budget/shard choice is wasting
   * accelerator time. One row:
   * `(n_packs, n_docs, n_tokens, min_pack_tokens, max_pack_tokens,
   *   n_overflow_packs, pad_tokens, overflow_tokens, avg_pack_tokens,
   *   utilization)` — `pad_tokens` the mass a pad-to-budget assembler
   * would add (Σ max(0, budget − pack)), `overflow_tokens` the mass
   * past the budget in overflowing packs (boundary documents overflow
   * by contract), `utilization` = in-budget tokens / (n_packs·budget).
   *
   * Scale shape: one (shard, pack)-keyed aggregate (map-side combined;
   * key count = n_tokens/budget, not corpus rows) then a global 1-row
   * reduce. All sums are exact longs; the two ratios are single IEEE
   * divisions rounded to 6 dp — engine- and partitioning-portable.
   */
  def packStats(packed: DataFrame, tokenCol: String, budget: Long): DataFrame =
    packed
      .groupBy("shard", "pack")
      .agg(count(lit(1)).as("__docs"), sum(col(tokenCol)).as("__toks"))
      .agg(
        count(lit(1)).as("n_packs"),
        sum("__docs").as("n_docs"),
        sum("__toks").as("n_tokens"),
        min("__toks").as("min_pack_tokens"),
        max("__toks").as("max_pack_tokens"),
        count(when(col("__toks") > budget, 1)).as("n_overflow_packs"),
        sum(greatest(lit(budget) - col("__toks"), lit(0L))).as("pad_tokens"),
        sum(greatest(col("__toks") - lit(budget), lit(0L)))
          .as("overflow_tokens"))
      .select(col("n_packs"), col("n_docs"), col("n_tokens"),
        col("min_pack_tokens"), col("max_pack_tokens"),
        col("n_overflow_packs"), col("pad_tokens"), col("overflow_tokens"),
        round(col("n_tokens").cast("double") / col("n_packs"), 6)
          .as("avg_pack_tokens"),
        round((col("n_tokens") - col("overflow_tokens")).cast("double") /
          (col("n_packs") * lit(budget)), 6).as("utilization"))
}
