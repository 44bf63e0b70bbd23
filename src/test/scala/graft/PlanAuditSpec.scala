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
}
