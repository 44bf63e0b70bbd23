package graft.sql

import graft.model._

/**
 * Stage → natural-language prompt rendering, matching the reference's
 * generator (reference: ui/src/promptGenerator.ts:42-129). Validation is
 * structural only (the ADT already guarantees required fields; the one
 * extra reference rule is FILTER's table+non-empty-value requirement,
 * ui/src/promptGenerator.ts:17).
 */
object PromptGenerator {

  def validate(stage: Stage): Boolean = stage match {
    case f: FilterStage =>
      f.table.nonEmpty && f.conditions.nonEmpty &&
        f.conditions.forall(c => c.value != null && c.value != "")
    case l: LoadStage => l.tableName.nonEmpty || l.fileName.nonEmpty
    case _ => true // remaining invariants are enforced by the case classes
  }

  def fromStage(stage: Stage): String = {
    if (!validate(stage)) return ""
    stage match {
      case j: JoinStage =>
        s"Perform a ${j.joinType} JOIN between ${j.leftTable} and ${j.rightTable} " +
          s"on ${j.leftTable}.${j.leftKey} = ${j.rightTable}.${j.rightKey}"
      case u: UnionStage =>
        s"Perform ${u.unionType} on tables: ${u.tables.mkString(", ")}"
      case f: FilterStage =>
        val c = f.conditions.head
        s"Filter ${f.table.get} where ${c.column} ${c.operator} ${c.value}"
      case g: GroupStage =>
        val aggText =
          if (g.aggregations.isEmpty) ""
          else " with " + g.aggregations.map(a =>
            s"${a.function}(${a.column})${a.alias.map(al => s" as $al").getOrElse("")}")
            .mkString(", ")
        s"Group by ${g.groupBy.mkString(", ")}$aggText"
      case s: SelectStage => s"Select columns: ${s.columns.mkString(", ")}"
      case s: SortStage =>
        "Sort by " + s.orderBy.map(o => s"${o.column} ${o.direction}").mkString(", ")
      case c: CustomStage => s"Execute custom SQL: ${c.sql}"
      case l: LoadStage =>
        if (l.description.nonEmpty) l.description else s"Load ${l.fileName}"
    }
  }

  def fromStages(stages: Seq[Stage]): String = {
    val prompts = stages.map(fromStage).filter(_.nonEmpty)
    if (prompts.isEmpty) "" else prompts.mkString(". ") + "."
  }
}
