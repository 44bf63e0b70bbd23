package graft.compile

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles a [[graft.model.Stage]] to a `DataFrame` — the Spark-native
 * equivalent of the reference's stage→SQL compiler
 * (reference: ui/src/sqlGenerator.ts:6-124).
 *
 * Where the reference emits a DuckDB SQL string per stage, we build a lazy
 * Catalyst logical plan: chains of stages fuse into one optimized plan
 * (predicate pushdown / column pruning / join selection come free), instead
 * of the reference's eager per-stage materialization.
 *
 * Observable-semantics notes (each verified against DuckDB 1.0):
 *  - Same-key JOIN emits `SELECT l.*, r.* EXCLUDE (k) ... USING (k)`
 *    (sqlGenerator.ts:21). In DuckDB `l.*` expands to the LEFT table's key,
 *    which is NULL for unmatched right rows of RIGHT/FULL joins — it does
 *    NOT coalesce. We therefore always join on an explicit condition and
 *    project the left key, rather than Spark's coalescing `Seq(key)` join.
 *  - FILTER with multiple conditions concatenates `<logic> col op val`
 *    left-to-right without parentheses (sqlGenerator.ts:47-51); DuckDB then
 *    parses that string with standard precedence (AND binds tighter than
 *    OR), so we fold AND-runs first, then OR the groups.
 *  - SORT: DuckDB's default null order is NULLS LAST for both directions;
 *    Spark's default for ASC is nulls-first, so we use explicit
 *    asc_nulls_last / desc_nulls_last.
 *  - UNION is positional and defaults to set semantics (distinct), matching
 *    SQL UNION (sqlGenerator.ts:32-35).
 */
object StageCompiler {

  /** Resolve a table name to a DataFrame. */
  type TableLookup = String => DataFrame

  def compile(
      spark: SparkSession,
      stage: Stage,
      lookup: TableLookup,
      defaultTable: => Option[DataFrame] = None): DataFrame = {

    def input(explicit: Option[String]): DataFrame =
      explicit.map(lookup).orElse(defaultTable).getOrElse(
        throw new IllegalArgumentException(
          s"stage ${stage.id} (${stage.stageType}) has no input table and no default"))

    stage match {
      case LoadStage(_, _, tableName, _) =>
        // LOAD binds at ingest time (ui/src/App.tsx:354-459); in a pipeline
        // re-execution it resolves to the already-registered table.
        lookup(tableName)

      case JoinStage(_, _, joinType, leftTable, rightTable, leftKey, rightKey) =>
        compileJoin(lookup(leftTable), lookup(rightTable), joinType, leftKey, rightKey)

      case UnionStage(_, _, unionType, tables) =>
        val dfs = tables.map(lookup)
        val arity = dfs.head.columns.length
        require(dfs.forall(_.columns.length == arity),
          s"UNION inputs must have the same column count (positional union)")
        val unioned = dfs.reduce(_ union _) // positional, like SQL UNION
        if (unionType.toUpperCase == "UNION ALL") unioned else unioned.distinct()

      case FilterStage(_, _, table, conditions) =>
        val df = input(table)
        df.filter(compilePredicate(df, conditions))

      case GroupStage(_, _, table, groupBy, aggregations) =>
        val df = input(table)
        // Group columns are always projected first (sqlGenerator.ts:69-76).
        val aggCols = aggregations.map(aggColumn)
        if (aggCols.isEmpty) df.groupBy(groupBy.map(col): _*).agg(first(lit(1)).as("__one"))
          .drop("__one") // bare GROUP BY with no aggs == distinct over group cols
        else df.groupBy(groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)

      case SelectStage(_, _, table, columns) =>
        // selectExpr: entries may be bare names or SQL expressions —
        // the reference passes them through verbatim (sqlGenerator.ts:87).
        input(table).selectExpr(columns: _*)

      case SortStage(_, _, table, orderBy) =>
        input(table).orderBy(orderBy.map(sortColumn): _*)

      case AggregateStage(_, _, table, aggregations) =>
        val aggCols = aggregations.map(aggColumn)
        input(table).agg(aggCols.head, aggCols.tail: _*)

      case CustomStage(_, _, sql) =>
        // Escape hatch, run over the registered temp views
        // (sqlGenerator.ts:101-106 → Spark SQL instead of DuckDB).
        spark.sql(rewriteDuckSql(sql))
    }
  }

  /**
   * DuckDB→SparkSQL dialect shim for CUSTOM stages. The only DuckDB-ism
   * the reference's own stage generator emits is `* EXCLUDE (cols)`
   * (sqlGenerator.ts:21); Spark spells it `* EXCEPT (cols)`. The rewrite
   * is quote-aware: text inside single-quoted string constants (with ''
   * escapes) and double-quoted identifiers is left untouched, so a
   * literal like `WHERE note = 'EXCLUDE (x)'` survives intact.
   */
  private[compile] def rewriteDuckSql(sql: String): String = {
    val out = new StringBuilder(sql.length)
    val upper = sql.toUpperCase
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => // string constant; '' is an escaped quote, stay inside
          val j = {
            var k = i + 1
            while (k < sql.length &&
                   !(sql.charAt(k) == '\'' &&
                     (k + 1 >= sql.length || sql.charAt(k + 1) != '\''))) {
              k += (if (sql.charAt(k) == '\'') 2 else 1)
            }
            math.min(k + 1, sql.length)
          }
          out.append(sql.substring(i, j)); i = j
        case '"' => // quoted identifier
          val close = sql.indexOf('"', i + 1)
          val j = if (close < 0) sql.length else close + 1
          out.append(sql.substring(i, j)); i = j
        case c if (c == 'E' || c == 'e') &&
            upper.startsWith("EXCLUDE", i) &&
            (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_') && {
              var k = i + 7
              while (k < sql.length && Character.isWhitespace(sql.charAt(k))) k += 1
              k < sql.length && sql.charAt(k) == '('
            } =>
          var k = i + 7
          while (k < sql.length && Character.isWhitespace(sql.charAt(k))) k += 1
          out.append("EXCEPT ("); i = k + 1
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Equi-join per ui/src/sqlGenerator.ts:8-26. */
  def compileJoin(left: DataFrame, right: DataFrame, joinType: String,
                  leftKey: String, rightKey: String): DataFrame = {
    val sparkJoinType = JoinType.toSpark(joinType)
    val l = left.alias("l")
    val r = right.alias("r")
    val joined = l.join(r, col(s"l.$leftKey") === col(s"r.$rightKey"), sparkJoinType)
    val outCols =
      if (leftKey == rightKey) {
        // `l.*, r.* EXCLUDE (k)`: key comes from the LEFT side (see scaladoc).
        left.columns.map(c => col(s"l.$c").as(c)) ++
          right.columns.filterNot(_ == rightKey).map(c => col(s"r.$c").as(c))
      } else {
        // `l.*, r.*`: both keys kept (sqlGenerator.ts:24).
        left.columns.map(c => col(s"l.$c").as(c)) ++
          right.columns.map(c => col(s"r.$c").as(c))
      }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /**
   * Fold a condition list into one Catalyst predicate with SQL precedence:
   * consecutive AND-linked conditions bind tighter; OR joins the groups.
   * (`cond.logic` is the connective to the previous condition, default AND —
   * ui/src/sqlGenerator.ts:47-51.)
   */
  def compilePredicate(df: DataFrame, conditions: Seq[FilterCondition]): Column = {
    require(conditions.nonEmpty)
    val orGroups = conditions.foldLeft(List.empty[List[FilterCondition]]) {
      case (acc, c) =>
        val connective = c.logic.map(_.toUpperCase).getOrElse("AND")
        if (acc.isEmpty || connective == "OR") List(c) :: acc
        else (c :: acc.head) :: acc.tail
    }.map(_.reverse).reverse
    orGroups
      .map(_.map(c => compileCondition(df, c)).reduce(_ && _))
      .reduce(_ || _)
  }

  /** One `col op value` predicate with DuckDB-compatible value coercion. */
  def compileCondition(df: DataFrame, c: FilterCondition): Column = {
    val column = col(c.column)
    val colType = df.schema.fields.find(_.name.equalsIgnoreCase(c.column)).map(_.dataType)
    c.operator.toUpperCase match {
      case "="      => column === literal(c.value, colType)
      case "!=" | "<>" => column =!= literal(c.value, colType)
      case ">"      => column > literal(c.value, colType)
      case "<"      => column < literal(c.value, colType)
      case ">="     => column >= literal(c.value, colType)
      case "<="     => column <= literal(c.value, colType)
      case "LIKE"   => column.like(String.valueOf(c.value))
      case "IN"     => column.isin(inList(c.value, colType): _*)
      case "NOT IN" => !column.isin(inList(c.value, colType): _*)
      case other    => throw new IllegalArgumentException(s"Unsupported filter operator: $other")
    }
  }

  /**
   * Literal with DuckDB-parity coercion: the LLM schema passes values as
   * strings (reference server/index.js:130) and DuckDB implicitly casts
   * `'100'` against a numeric/temporal column. Spark's string/numeric
   * comparison rules differ at the edges, so cast explicitly when the
   * column type is known (SURVEY §7.3).
   *
   * Pinned edge rules (probed against DuckDB, spec'd in
   * StageCompilerPropertySpec):
   *  - whitespace-padded (`' 42 '`), signed (`'+5'`), bare-point
   *    (`'.5'`, `'5.'`), scientific (`'1e2'`) and special (`'NaN'`,
   *    `'Infinity'`) numerics coerce identically in both engines;
   *  - fractional strings against INTEGRAL columns ROUND half away from
   *    zero in DuckDB (`'13.5'` matches 14, `'-13.5'` matches -14) —
   *    and for inequalities too (`id > '13.5'` means `id > 14`);
   *    Spark's bare string→integral cast truncates, so integral targets
   *    round at plan time in BigDecimal (exact — no double
   *    representation error at a .5 boundary, no ANSI runtime cast);
   *  - un-coercible strings (`''`, `'0x10'`) and out-of-range literals
   *    (`'1e999'` vs integral): DuckDB raises a conversion error and the
   *    reference surfaces a failed query; graft instead yields a NULL
   *    literal, so the predicate matches NOTHING — the deliberate
   *    lenient-planner divergence (an LLM-emitted junk value degrades to
   *    an empty result, not a pipeline abort).
   */
  private def literal(v: Any, colType: Option[DataType]): Column = (v, colType) match {
    case (s: String, Some(t @ (ByteType | ShortType | IntegerType | LongType))) =>
      roundedIntegral(s, t)
    case (s: String, Some(t: NumericType)) if isNumeric(s) => lit(s).cast(t)
    // un-coercible string vs numeric column: typed NULL literal — the
    // predicate matches nothing, and no ANSI runtime cast can throw
    case (_: String, Some(t: NumericType)) => lit(null).cast(t)
    case (s: String, Some(DateType))          => lit(s).cast(DateType)
    case (s: String, Some(TimestampType))     => lit(s).cast(TimestampType)
    // parquet ms-timestamps with isAdjustedToUTC=false read as NTZ in
    // Spark 4 — cast explicitly so the comparison stays a pushdown-able
    // typed predicate, not a string coercion.
    case (s: String, Some(TimestampNTZType))  => lit(s).cast(TimestampNTZType)
    case (other, _)                           => lit(other)
  }

  private def isNumeric(s: String): Boolean =
    s.nonEmpty && scala.util.Try(java.lang.Double.parseDouble(s)).isSuccess

  /** DuckDB-parity literal for an INTEGRAL column: round half away from
    * zero at PLAN TIME (the value is a constant — coercing in Scala
    * avoids any ANSI runtime cast), typed NULL when unparseable
    * ('NaN', '0x10', '') or out of the target's range ('1e999') — those
    * raise in DuckDB; here the predicate just matches nothing. */
  private def roundedIntegral(s: String, t: DataType): Column =
    scala.util.Try(BigDecimal(s.trim)).toOption
      .map(_.setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP))
      .filter { r =>
        t match {
          case ByteType    => r.isValidByte
          case ShortType   => r.isValidShort
          case IntegerType => r.isValidInt
          case _           => r.isValidLong
        }
      }
      .map(r => lit(r.toLong).cast(t))
      .getOrElse(lit(null).cast(t))

  /** IN/NOT IN list: a Seq value, or a string like `(1, 2, 3)` / `'a','b'`. */
  private def inList(v: Any, colType: Option[DataType]): Seq[Column] = {
    val raw: Seq[Any] = v match {
      case xs: Seq[_] => xs
      case s: String  => splitList(s)
      case other      => Seq(other)
    }
    raw.map(x => literal(x, colType))
  }

  /** Split `('a','b')` / `1, 2, 3` into unquoted items ('' unescaping). */
  private[compile] def splitList(s: String): Seq[String] = {
    val trimmed0 = s.trim
    val trimmed =
      if (trimmed0.startsWith("(") && trimmed0.endsWith(")"))
        trimmed0.substring(1, trimmed0.length - 1)
      else trimmed0
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < trimmed.length) {
      val ch = trimmed.charAt(i)
      if (inQuote) {
        if (ch == '\'') {
          if (i + 1 < trimmed.length && trimmed.charAt(i + 1) == '\'') { cur += '\''; i += 1 }
          else inQuote = false
        } else cur += ch
      } else ch match {
        case '\'' => inQuote = true
        case ','  => items += cur.result().trim; cur.clear()
        case c    => cur += c
      }
      i += 1
    }
    val last = cur.result().trim
    if (last.nonEmpty || items.nonEmpty) items += last
    items.toSeq.filter(_.nonEmpty)
  }

  /** `F(column) [AS alias]` via `expr` so any SparkSQL aggregate works —
    * the enumerated set is SUM/COUNT/AVG/MAX/MIN "etc."
    * (server/index.js:155, ui/src/sqlParser.ts:54). */
  def aggColumn(a: Aggregation): Column = {
    val fn = a.function.trim
    require(fn.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad aggregate function: $fn")
    // The column is passed through verbatim, like the reference's string
    // interpolation `${agg.function}(${agg.column})` (sqlGenerator.ts:70-73)
    // — it may be `*`, a bare name, or an expression.
    val e = expr(s"$fn(${a.column.trim})")
    a.alias.map(e.as).getOrElse(e)
  }

  /** DuckDB default null order is NULLS LAST for both directions. */
  private def sortColumn(k: SortKey): Column =
    if (k.direction.equalsIgnoreCase("DESC")) col(k.column).desc_nulls_last
    else col(k.column).asc_nulls_last
}
