package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph scoring for corpus curation. Web-scale pipelines rank
 * domains by link authority (the CommonCrawl-derived corpora filter on
 * exactly this signal) — a PageRank over the host graph, joined back to
 * documents as a quality feature next to the content-local Gopher/C4
 * scores.
 *
 * Spark-native iterative shape (no graph library): ranks live in a
 * `(node, rank)` DataFrame; one iteration = join ranks to the edge list
 * on src, emit per-edge contributions, re-aggregate by dst. The edge
 * list — the big input — is partitioned ONCE on src and cached; each
 * iteration shuffles only the (node, rank) table, which is |V|-sized,
 * not |E|-sized. Lineage is truncated with localCheckpoint every
 * `checkpointEvery` rounds (same discipline as
 * [[Dedup.connectedComponents]]) so the plan stays flat at high
 * iteration counts.
 *
 * Determinism across engines (the repo's float policy): per-edge
 * contributions round to 9 dp and sum as DECIMAL(22,9) — an
 * order-independent reduction, immune to partitioning — then the rank
 * update `(1-d) + d·sum` rounds back to 9 dp. Published ranks round to
 * 6 dp. The teleport term is written `1 - damping` (never a folded
 * literal) so the oracle can reproduce the exact double.
 *
 * Semantics: per-node teleport of `1-d` (ranks sum to ≈|V|, the classic
 * "authority score" normalization, as in Spark's own examples); mass of
 * dangling nodes (no out-edges) is dropped rather than redistributed —
 * the standard simplification, stated here because it changes absolute
 * values (not relative order) versus the stochastic-matrix formulation.
 */
object Graph {

  /** Iterate PageRank over `edges(srcCol, dstCol)`; returns
    * `(node, rank)` for every node appearing on either side. Duplicate
    * edges are counted once (dedup'd up front). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .repartition(col("src"))
      .cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // edge list pre-joined with out-degree: reused every iteration
    val withDeg = e.join(outdeg, "src").cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().cache()

    val teleport = lit(1.0) - lit(damping)
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (i <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          round(col("rank") / col("__deg"), 9)
            .cast("decimal(22,9)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(teleport + lit(damping) *
            coalesce(col("__s").cast("double"), lit(0.0)), 9).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
