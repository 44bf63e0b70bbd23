package graft.sql

import graft.model._

/**
 * Fallback SQL → stage decompiler, behavior-matching the reference's
 * regex parser (reference: ui/src/sqlParser.ts:12-145). Used when a
 * planner returns SQL without an explicit stage list.
 *
 * Deliberately heuristic (as in the reference): it extracts AT MOST one
 * stage per operator kind, in the fixed order JOIN, GROUP, SORT, FILTER,
 * UNION, SELECT, and falls back to a single CUSTOM stage when nothing
 * matches. The stage list is explanatory metadata on this path — the SQL
 * itself is what executes (SURVEY §3.1).
 */
object SqlStageParser {

  private val JoinRe =
    """(?i)(?:LEFT|RIGHT|FULL\s+OUTER|INNER)?\s+JOIN\s+(\w+)\s+(\w+)\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""".r
  private val FromAliasRe = """(?i)FROM\s+(\w+)\s+(\w+)""".r
  private val FromRe = """(?i)FROM\s+(\w+)""".r
  // (The reference's `[^ORDER]+?` char-class is a regex bug that silently
  // drops GROUP stages whose columns contain o/r/d/e; we use a sane lazy
  // match — the stage list is explanatory metadata, better correct.)
  private val GroupByRe = """(?i)GROUP\s+BY\s+(.+?)(?:\s+ORDER\s+BY|\s*$)""".r
  private val SelectRe = """(?i)SELECT\s+(.+?)\s+FROM""".r
  private val AggRe = """(?i)(SUM|COUNT|AVG|MAX|MIN)\s*\(([^)]+)\)(?:\s+AS\s+(\w+))?""".r
  private val OrderByRe = """(?i)ORDER\s+BY\s+(\w+)\s+(ASC|DESC)""".r
  private val WhereRe =
    """(?i)WHERE\s+(\w+)\s*([=<>!]+|LIKE|IN|NOT\s+IN)\s*(.+?)(?:\s+GROUP|\s+ORDER|\s*$)""".r

  def parse(sql: String, explanation: String = ""): Seq[Stage] = {
    val upper = sql.toUpperCase
    var n = 0
    def id(): String = { n += 1; s"parsed_stage_$n" }
    val stages = Seq.newBuilder[Stage]

    // 1. JOIN — join type read from the whole statement, like the reference
    val groupByMatch = GroupByRe.findFirstMatchIn(sql)
    JoinRe.findFirstMatchIn(sql).foreach { m =>
      val joinType =
        if (upper.contains("LEFT JOIN")) "LEFT"
        else if (upper.contains("RIGHT JOIN")) "RIGHT"
        else if (upper.contains("FULL OUTER JOIN")) "FULL OUTER"
        else "INNER"
      val leftTable = FromAliasRe.findFirstMatchIn(sql).map(_.group(1)).getOrElse(m.group(3))
      stages += JoinStage(id(), s"$joinType join $leftTable with ${m.group(1)}",
        joinType, leftTable, m.group(1), m.group(4), m.group(6))
    }

    // 2. GROUP BY (+ aggregates scraped from the SELECT clause)
    groupByMatch.foreach { m =>
      val groupCols = m.group(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val aggs = SelectRe.findFirstMatchIn(sql).toSeq.flatMap { sm =>
        AggRe.findAllMatchIn(sm.group(1)).map(a =>
          Aggregation(a.group(1).toUpperCase, a.group(2).trim, Option(a.group(3)))).toSeq
      }
      stages += GroupStage(id(), s"Group by ${groupCols.mkString(", ")}", None,
        groupCols, if (aggs.nonEmpty) aggs else Seq(Aggregation("COUNT", "*", Some("count"))))
    }

    // 3. ORDER BY (single column + explicit direction only, as in the reference)
    OrderByRe.findFirstMatchIn(sql).foreach { m =>
      stages += SortStage(id(), s"Sort by ${m.group(1)} ${m.group(2)}", None,
        Seq(SortKey(m.group(1), m.group(2).toUpperCase)))
    }

    // 4. WHERE → single-condition FILTER
    WhereRe.findFirstMatchIn(sql).foreach { m =>
      val table = FromRe.findFirstMatchIn(sql).map(_.group(1))
      val op = m.group(2).replaceAll("\\s+", " ").trim.toUpperCase match {
        case o @ ("=" | "!=" | ">" | "<" | ">=" | "<=" | "LIKE" | "IN" | "NOT IN") => o
        case o => o
      }
      val value = m.group(3).trim.replaceAll("['\"]", "")
      stages += FilterStage(id(), s"Filter where ${m.group(1)} $op $value",
        table, Seq(FilterCondition(m.group(1), op, value)))
    }

    // 5. UNION — every FROM-clause table participates
    if (upper.contains("UNION")) {
      val tables = FromRe.findAllMatchIn(sql).map(_.group(1)).toSeq
      if (tables.size >= 2)
        stages += UnionStage(id(), s"Union ${tables.mkString(" and ")}",
          if (upper.contains("UNION ALL")) "UNION ALL" else "UNION", tables)
    }

    // 6. SELECT of specific columns (skipped when GROUP already captured it)
    if (!upper.contains("SELECT *") && groupByMatch.isEmpty) {
      SelectRe.findFirstMatchIn(sql).foreach { m =>
        val cols = m.group(1).split(',')
          .map(_.trim.split("(?i)\\s+AS\\s+")(0).trim).filter(_.nonEmpty).toSeq
        if (cols.nonEmpty)
          stages += SelectStage(id(), s"Select columns: ${cols.mkString(", ")}", None, cols)
      }
    }

    val out = stages.result()
    if (out.nonEmpty) out
    else Seq(CustomStage(id(),
      if (explanation.nonEmpty) explanation else "Custom SQL transformation", sql))
  }
}
