package graft.model

/**
 * The stage algebra: 9 declarative operator types with JSON-serializable
 * parameters, mirroring the reference's `TransformationStage`
 * (reference: ui/src/types.ts:7-63). Field names are preserved so the JSON
 * interchange format (ui/src/sampleStages.json, export at
 * ui/src/App.tsx:2046-2051) round-trips.
 *
 * Unlike the reference (a single bag-of-optional-fields interface), this is a
 * sealed ADT: each stage type carries exactly its own parameters and is
 * validated at construction/parse time per ui/src/promptGenerator.ts:6-37.
 */
sealed trait Stage {
  def id: String
  def description: String

  /** The reference's `type` discriminator, e.g. "JOIN". */
  def stageType: String = this match {
    case _: LoadStage      => "LOAD"
    case _: JoinStage      => "JOIN"
    case _: UnionStage     => "UNION"
    case _: FilterStage    => "FILTER"
    case _: GroupStage     => "GROUP"
    case _: SelectStage    => "SELECT"
    case _: SortStage      => "SORT"
    case _: AggregateStage => "AGGREGATE"
    case _: CustomStage    => "CUSTOM"
  }

  /** Explicit input table, when the stage names one (unary stages only). */
  def inputTable: Option[String] = this match {
    case s: FilterStage    => s.table
    case s: GroupStage     => s.table
    case s: SelectStage    => s.table
    case s: SortStage      => s.table
    case s: AggregateStage => s.table
    case _                 => None
  }
}

/** Join types accepted by the reference (ui/src/types.ts:3). */
object JoinType {
  val Inner = "INNER"
  val Left = "LEFT"
  val Right = "RIGHT"
  val FullOuter = "FULL OUTER"
  val all: Set[String] = Set(Inner, Left, Right, FullOuter)

  /** Map to Spark's join-type strings. */
  def toSpark(jt: String): String = jt.toUpperCase match {
    case Inner     => "inner"
    case Left      => "left"
    case Right     => "right"
    case FullOuter => "full_outer"
    case other     => throw new IllegalArgumentException(s"Unsupported join type: $other")
  }
}

/** Filter comparison operators (ui/src/types.ts:4). */
object FilterOperator {
  val all: Set[String] = Set("=", "!=", ">", "<", ">=", "<=", "LIKE", "IN", "NOT IN")
}

/** One predicate; `logic` is the connective to the PREVIOUS condition
  * (ignored on the first), defaulting to AND (ui/src/sqlGenerator.ts:48). */
final case class FilterCondition(
    column: String,
    operator: String,
    value: Any,
    logic: Option[String] = None)

/** `F(column) AS alias` aggregation spec (ui/src/types.ts:45-49). */
final case class Aggregation(function: String, column: String, alias: Option[String] = None)

/** `column ASC|DESC` sort spec (ui/src/types.ts:55-58). */
final case class SortKey(column: String, direction: String = "ASC")

/** Binds an uploaded file to a named table (executed at ingest;
  * skipped during pipeline re-execution, ui/src/App.tsx:681-682). */
final case class LoadStage(
    id: String,
    description: String,
    tableName: String,
    fileName: String) extends Stage

/** Binary equi-join (ui/src/sqlGenerator.ts:8-26). */
final case class JoinStage(
    id: String,
    description: String,
    joinType: String,
    leftTable: String,
    rightTable: String,
    leftKey: String,
    rightKey: String) extends Stage {
  require(JoinType.all.contains(joinType.toUpperCase), s"bad joinType: $joinType")
}

/** N-way union; "UNION" = distinct, "UNION ALL" = bag
  * (ui/src/sqlGenerator.ts:28-37). */
final case class UnionStage(
    id: String,
    description: String,
    unionType: String, // UNION | UNION ALL
    tables: Seq[String]) extends Stage {
  require(tables.size >= 2, "UNION stage requires at least 2 tables")
}

/** Row filter; either a single (column, operator, value) or a condition list
  * (ui/src/sqlGenerator.ts:39-62). */
final case class FilterStage(
    id: String,
    description: String,
    table: Option[String],
    conditions: Seq[FilterCondition]) extends Stage {
  require(conditions.nonEmpty, "FILTER stage requires column/operator/value or conditions")
}

/** Group-by + aggregates; group columns projected first
  * (ui/src/sqlGenerator.ts:64-81). */
final case class GroupStage(
    id: String,
    description: String,
    table: Option[String],
    groupBy: Seq[String],
    aggregations: Seq[Aggregation]) extends Stage {
  require(groupBy.nonEmpty, "GROUP stage requires groupBy array")
}

/** Projection; entries may be bare columns or SQL expressions
  * (ui/src/sqlGenerator.ts:83-90). */
final case class SelectStage(
    id: String,
    description: String,
    table: Option[String],
    columns: Seq[String]) extends Stage {
  require(columns.nonEmpty, "SELECT stage requires columns array")
}

/** Total multi-column sort (ui/src/sqlGenerator.ts:92-99). */
final case class SortStage(
    id: String,
    description: String,
    table: Option[String],
    orderBy: Seq[SortKey]) extends Stage {
  require(orderBy.nonEmpty, "SORT stage requires orderBy array")
}

/** Global (grand-total) aggregation, no GROUP BY
  * (ui/src/sqlGenerator.ts:108-119). */
final case class AggregateStage(
    id: String,
    description: String,
    table: Option[String],
    aggregations: Seq[Aggregation]) extends Stage {
  require(aggregations.nonEmpty, "AGGREGATE stage requires aggregations array")
}

/** Arbitrary SQL escape hatch, run verbatim via spark.sql
  * (ui/src/sqlGenerator.ts:101-106). */
final case class CustomStage(
    id: String,
    description: String,
    sql: String) extends Stage {
  require(sql.trim.nonEmpty, "CUSTOM stage requires sql string")
}
