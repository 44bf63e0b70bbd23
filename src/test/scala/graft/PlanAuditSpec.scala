package graft

/**
 * Blanket physical-plan audit over EVERY gate at sf0.001 — the
 * scale-killer tripwires that per-operator specs assert locally, held
 * globally:
 *
 *  - No `CartesianProduct` anywhere. (1-row broadcast stat joins plan as
 *    BroadcastNestedLoopJoin — cheap by construction and allowed; an
 *    actual CartesianProduct means two big sides met without keys.)
 *  - Filter gates push their predicates into the parquet scan;
 *    projection gates prune the scan schema. (Spot-checked on
 *    representative gates — the property that keeps a 100 TB scan from
 *    reading 100 TB.)
 */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("no gate plan contains a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
        } catch {
          case e: Throwable =>
            Some(s"$name (planning failed: ${String.valueOf(e.getMessage).take(120)})")
        }
    }
    assert(offenders.isEmpty, s"offending gates: ${offenders.mkString(", ")}")
  }

  test("filter predicates reach the parquet scan") {
    val plan = SparkEntry.queries("q_filter_gt")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan)
  }

  test("projections prune the parquet read schema") {
    val plan = SparkEntry.queries("q_select")(spark, dir)
      .queryExecution.executedPlan.toString
    // lineitem has 16 columns; the gate projects a handful — the scan
    // must not read the untouched wide ones
    assert(!plan.contains("l_comment"), plan)
  }

  test("substring dedup: no self-join — one window over the digest shuffle") {
    val plan = SparkEntry.queries("q_dedup_substring")(spark, dir)
      .queryExecution.executedPlan.toString
    // the restructured shape: a windowed count + object agg reuse one
    // (h, h2) exchange; any SortMergeJoin would mean the 3×-lineage
    // self-join formulation crept back
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("rater agreement: the corpus reduces through partial aggregation") {
    // cohenKappa's only corpus-wide pass must be the (a, b)-cell count
    // with a map-side partial (HashAggregate partial → exchange of cell
    // rows, not document rows); everything after runs on the cells.
    val plan = SparkEntry.queries("q_rater_kappa")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial count")
      || plan.contains("Partial"), plan)
    assert(!plan.contains("SortMergeJoin"), plan) // cell-table joins broadcast
  }

  test("retrieval eval: gold/results joins broadcast, corpus never re-shuffles wide") {
    // both inputs are top-k-per-query; the metric joins must be
    // broadcast-hash, not a sort-merge over corpus-sized relations
    val plan = SparkEntry.queries("q_retrieval_eval")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("quantize: scale is materialized once, not inlined per element") {
    val plan = SparkEntry.queries("q_embed_quantize")(spark, dir)
      .queryExecution.executedPlan.toString
    // CollapseProject must NOT re-inline the array_max into the
    // per-element encode lambda (that would re-evaluate it d times per
    // vector: the O(d²) regression) — the FLOOR-encode projection line
    // must reference the materialized `scale` attr, not the aggregate
    val encodeLines = plan.linesIterator.filter(_.contains("FLOOR")).toSeq
    assert(encodeLines.nonEmpty && encodeLines.forall(!_.contains("array_max")),
      plan)
  }
}
