package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality expectations — the validation harness every production
 * pipeline runs before (and after) transforming 100 TB: declare what
 * must hold, get one row per rule with violation counts. The
 * Great-Expectations/dbt-test shape, engine-native.
 *
 * Scale shape is the point of the design: every ROW-LOCAL rule
 * (null, range, regex, accepted values) compiles to a conditional sum
 * in ONE aggregate over ONE scan — adding a rule adds an expression,
 * not a pass. Only genuinely relational rules pay more: [[unique]] is
 * one map-side-combined distinct-count aggregation, and
 * [[referentialIntegrity]] one anti-join against the parent keys
 * (AQE broadcasts small parents). Reports are tiny (one row per rule) —
 * collect-safe by construction.
 */
object Expect {

  /** A row-local rule: `name` labels the report row, `violated` is a
    * boolean Column that is true where the expectation FAILS. */
  final case class Rule(name: String, violated: org.apache.spark.sql.Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", col(c).isNull)

  /** Inclusive range on a numeric column; NULLs do not violate (pair
    * with [[notNull]] to forbid them). */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c,$lo,$hi)",
      col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Full-match regex; NULLs do not violate. */
  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

  /** Accepted-value set; NULLs do not violate. */
  def oneOf(c: String, values: Seq[String]): Rule =
    Rule(s"one_of($c)", col(c).isNotNull && !col(c).isin(values: _*))

  /**
   * Evaluate all row-local rules in one fused pass:
   * `(rule, n_rows, n_violations, pass)`, one output row per rule in
   * rule order (report ordering is part of the contract).
   */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violated, 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v$i").as("n_violations"),
        (col(s"__v$i") === 0L).as("pass"))
    }
    one.select(explode(array(report: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"),
        col("r.n_violations"), col("r.pass"))
  }

  /**
   * Row-level quarantine routing: annotate every row with the names of
   * the row-local rules it violates (`violations` array, empty = clean)
   * — the split point of a validating pipeline: clean rows flow on,
   * dirty rows divert to a quarantine sink WITH the reason attached.
   * A pure projection (no aggregation, no state), so it applies
   * unchanged to a streaming source.
   */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val names = rules.map(r =>
      when(r.violated, lit(r.name)).otherwise(lit(null)))
    df.withColumn("violations",
      filter(array(names: _*), x => x.isNotNull))
  }

  /** Key-uniqueness report: violations = rows beyond the first per key
    * (n_rows − n_distinct_keys); NULL key components count as a key
    * value, matching SQL GROUP BY. One aggregation, no join. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_rows"),
        (sum("c") - count(lit(1))).as("n_violations"))
    n.select(lit(s"unique(${cols.mkString(",")})").as("rule"),
      col("n_rows").cast("long").as("n_rows"),
      col("n_violations").cast("long").as("n_violations"),
      (col("n_violations") === 0L).as("pass"))
  }

  /** Referential integrity: child rows whose `fk` value exists but has
    * no match in `parent.pk` (NULL fks do not violate — SQL FK
    * semantics). One anti-join against the distinct parent keys. */
  def referentialIntegrity(child: DataFrame, fk: String,
                           parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(orphans)
      .select(lit(s"fk($fk->$pk)").as("rule"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
