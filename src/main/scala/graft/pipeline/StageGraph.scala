package graft.pipeline

import graft.model._
import scala.collection.mutable

/**
 * Stage-DAG metadata — the dependency graph the reference renders above
 * its flow canvas, exposed next to [[PipelineExecutor]]'s stage→table
 * map. Port of `buildStageGraph` (ref:ui/src/StageGraphFlow.tsx:46-108)
 * and the edge derivation (ref:ui/src/StageGraphFlow.tsx:651-757); the
 * ReactFlow handle/position/styling choices there are UI chrome and out
 * of engine scope (SURVEY §0) — what is ported is WHICH nodes connect.
 *
 * Reference semantics preserved exactly, including its quirks:
 *  - The table registry is built in two passes: every LOAD registers its
 *    table name FIRST (so a JOIN may list a LOAD that appears later in
 *    the stage array as an input), then stages resolve inputs in order.
 *  - A JOIN registers its output as `joined_<left>_<right>` DURING the
 *    second pass, so only LATER stages can reference it, and a repeated
 *    (left, right) pair rebinds the name for stages after it.
 *  - Only JOIN/UNION/FILTER/GROUP/SELECT/SORT resolve inputs; AGGREGATE
 *    and CUSTOM stages get NO input edges (the reference's switch simply
 *    has no case for them) — they fall back to the implicit chain edge.
 *  - An input table name that resolves to nothing contributes no edge
 *    (the reference's `if (input)` truthiness guard).
 *  - `level` = 1 + max(level of inputs at resolution time): a forward
 *    LOAD reference contributes level 0, like the reference's in-order
 *    mutation.
 *
 * Edge list (ref:ui/src/StageGraphFlow.tsx:651-757):
 *  - LOAD stages are never edge TARGETS (skipped outright).
 *  - A stage with resolved inputs gets one edge per input, id
 *    `<inputId>-<stageId>-<inputIndex>`.
 *  - A stage with NO resolved inputs chains from its immediate
 *    predecessor — unless that predecessor is a LOAD (edge id
 *    `<prevId>-<stageId>`); the reference checks only stages[i-1], so a
 *    LOAD directly above breaks the chain even when a non-LOAD sits at
 *    i-2. Preserved as-is.
 */
object StageGraph {

  /** One stage's graph metadata: resolved input stage ids (in the
    * reference's resolution order) and its topological level. */
  final case class StageNode(id: String, stageType: String,
                             inputs: Seq[String], level: Int)

  /** A directed dependency edge, id'd exactly like the reference. */
  final case class StageEdge(id: String, source: String, target: String)

  /** The node map in stage order (ref `buildStageGraph`). */
  def buildStageGraph(stages: Seq[Stage]): Seq[StageNode] = {
    val tableMap = mutable.Map.empty[String, String]
    stages.foreach {
      case l: LoadStage if l.tableName.nonEmpty =>
        tableMap(l.tableName) = l.id
      case _ => ()
    }
    val levels = mutable.Map.empty[String, Int]
    stages.map { stage =>
      val inputs: Seq[String] = stage match {
        case j: JoinStage =>
          val resolved =
            Seq(j.leftTable, j.rightTable).filter(_.nonEmpty)
              .flatMap(tableMap.get)
          if (j.leftTable.nonEmpty && j.rightTable.nonEmpty)
            tableMap(s"joined_${j.leftTable}_${j.rightTable}") = stage.id
          resolved
        case u: UnionStage =>
          u.tables.flatMap(tableMap.get)
        case s: FilterStage => s.table.toSeq.flatMap(tableMap.get)
        case s: GroupStage  => s.table.toSeq.flatMap(tableMap.get)
        case s: SelectStage => s.table.toSeq.flatMap(tableMap.get)
        case s: SortStage   => s.table.toSeq.flatMap(tableMap.get)
        // AGGREGATE / CUSTOM / LOAD: no case in the reference's switch
        case _ => Nil
      }
      val level =
        if (inputs.isEmpty) 0
        else inputs.map(levels.getOrElse(_, 0)).max + 1
      levels(stage.id) = level
      StageNode(stage.id, stage.stageType, inputs, level)
    }
  }

  /** The dependency edge list (ref edge derivation, handles elided). */
  def edges(stages: Seq[Stage]): Seq[StageEdge] = {
    val nodes = buildStageGraph(stages).map(n => n.id -> n).toMap
    stages.zipWithIndex.flatMap { case (stage, index) =>
      if (stage.stageType == "LOAD") Nil
      else {
        val inputs = nodes(stage.id).inputs
        if (inputs.nonEmpty)
          inputs.zipWithIndex.map { case (inputId, i) =>
            StageEdge(s"$inputId-${stage.id}-$i", inputId, stage.id)
          }
        else if (index > 0 && stages(index - 1).stageType != "LOAD")
          Seq(StageEdge(s"${stages(index - 1).id}-${stage.id}",
            stages(index - 1).id, stage.id))
        else Nil
      }
    }
  }
}
