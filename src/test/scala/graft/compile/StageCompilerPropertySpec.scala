package graft.compile

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property-based parity: for randomly generated stages, the DataFrame
 * built by StageCompiler must equal the result of executing the SQL
 * string the reference's generator would emit (rendered per
 * ui/src/sqlGenerator.ts and run through spark.sql). This pins the
 * compiler to SQL semantics — including the no-parentheses AND/OR
 * precedence fold and NULLS LAST sort order.
 */
class StageCompilerPropertySpec extends SparkTestBase {

  /** Deterministic sampling from a Gen (no scalatest-plus bridge in the
    * offline cache): seed i → i-th reproducible case. */
  private def cases[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val table = {
    val rows = (0 until 200).map { i =>
      Row(
        i.toLong,
        if (i % 13 == 0) null else java.lang.Double.valueOf((i * 37 % 100) / 3.0),
        if (i % 11 == 0) null else s"name_${i % 7}",
        (i % 5).toString)
    }
    val d = df("id BIGINT, amount DOUBLE, name STRING, grp STRING", rows)
    d.createOrReplaceTempView("prop_t")
    d
  }

  private val lookup: StageCompiler.TableLookup = {
    case "prop_t" => table
    case other    => throw new NoSuchElementException(other)
  }

  private val numericCols = Seq("id", "amount")
  private val stringCols = Seq("name", "grp")

  private val genCondition: Gen[FilterCondition] = for {
    numeric <- Gen.oneOf(true, false)
    column <- Gen.oneOf(if (numeric) numericCols else stringCols)
    op <- if (numeric) Gen.oneOf("=", "!=", ">", "<", ">=", "<=", "IN", "NOT IN")
          else Gen.oneOf("=", "!=", "LIKE", "IN", "NOT IN")
    value <- op match {
      case "IN" | "NOT IN" =>
        if (numeric) Gen.oneOf("(1, 2, 3)", "(10, 41)")
        else Gen.oneOf("('name_1', 'name_3')", "('0', '2', '4')")
      case _ =>
        if (numeric) Gen.oneOf(
          Gen.choose(0, 60).map(_.toString),
          // SQL-renderable adversarial numeric forms. Fractional forms
          // only against the DOUBLE column: vs BIGINT DuckDB rounds the
          // literal (graft reproduces it), which this Spark-SQL render
          // proxy cannot express — that rule is pinned in the directed
          // test below instead. Quoted-only forms (' 42 ', 'NaN') ditto.
          if (column == "amount") Gen.oneOf("+5", ".5", "5.", "1e1", "30.5")
          else Gen.oneOf("+5", "1e1"))
        else Gen.oneOf("name_1", "name_3", "3", "%2%")
    }
    logic <- Gen.oneOf(Some("AND"), Some("OR"), None)
  } yield FilterCondition(column, op, value, logic)

  private def renderValue(c: FilterCondition): String =
    if (c.operator == "IN" || c.operator == "NOT IN") c.value.toString
    else if (numericCols.contains(c.column)) c.value.toString
    else s"'${c.value}'"

  /** Render exactly like ui/src/sqlGenerator.ts:47-51: left-to-right,
    * no parentheses; first condition's logic ignored. */
  private def renderWhere(conds: Seq[FilterCondition]): String =
    conds.zipWithIndex.map { case (c, i) =>
      val prefix = if (i == 0) "" else c.logic.getOrElse("AND") + " "
      s"$prefix${c.column} ${c.operator} ${renderValue(c)}"
    }.mkString(" ")

  test("FILTER: compiler matches reference-rendered SQL for random condition lists") {
    cases(Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genCondition)), 25)
      .filter(_.nonEmpty).foreach { conds =>
      {
        val stage = FilterStage("p", "", Some("prop_t"), conds)
        val viaCompiler = StageCompiler.compile(spark, stage, lookup)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val viaSql = spark.sql(s"SELECT * FROM prop_t WHERE ${renderWhere(conds)}")
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(viaCompiler.toSeq == viaSql.toSeq,
          s"mismatch for WHERE ${renderWhere(conds)}")
      }
    }
  }

  /**
   * Adversarial literal-coercion parity, pinned against live-probed
   * DuckDB semantics (see StageCompiler.literal's scaladoc for the rule
   * table). Expectations below were derived by running each predicate in
   * DuckDB 1.x on equivalent data; where DuckDB raises a conversion
   * error (un-coercible / out-of-range strings) graft's documented rule
   * is match-nothing, asserted here explicitly.
   */
  test("FILTER: adversarial value coercion follows the pinned DuckDB-parity rules") {
    val d = df("dv DOUBLE, k BIGINT", Seq(
      Row(0.0, 13L), Row(0.5, 14L), Row(1.0, -14L), Row(13.0, 42L),
      Row(14.0, 43L), Row(42.0, 0L), Row(100.0, 5L), Row(null, 1L)))
    d.createOrReplaceTempView("coerce_t")
    val clookup: StageCompiler.TableLookup = { case "coerce_t" => d }
    def count(colName: String, op: String, value: String): Long =
      StageCompiler.compile(spark,
        FilterStage("p", "", Some("coerce_t"),
          Seq(FilterCondition(colName, op, value))), clookup).count()

    // whitespace / sign / point / scientific forms agree with DuckDB
    assert(count("dv", ">", " 42 ") == 1)   // {100}
    assert(count("dv", ">", "42 ") == 1)
    assert(count("dv", ">", "+5") == 4)     // {13,14,42,100}
    assert(count("dv", ">", ".5") == 5)     // {1,13,14,42,100}
    assert(count("dv", ">=", "5.") == 4)    // {13,14,42,100}
    assert(count("dv", ">", "1e1") == 4)    // {13,14,42,100}
    // NaN sorts greatest in both engines; Infinity bounds everything
    assert(count("dv", ">", "NaN") == 0)
    assert(count("dv", "<", "Infinity") == 7)
    assert(count("dv", ">", "1e999") == 0)  // +inf as double; > inf empty
    // fractional strings vs BIGINT: DuckDB rounds half away from zero
    assert(count("k", "=", "13.5") == 1)    // → 14
    assert(count("k", "=", "13.4") == 1)    // → 13
    assert(count("k", "=", "-13.5") == 1)   // → -14
    assert(count("k", "=", "42.5") == 1)    // → 43
    assert(count("k", "=", "42") == 1)      // integral strings unchanged
    // ...and DuckDB rounds for INEQUALITIES too (probed: user_id >
    // '13.5' matches nothing when max is 14 — the literal becomes 14,
    // not a double 13.5)
    assert(count("k", ">", "13.5") == 2)    // k > 14 → {42,43}
    assert(count("k", ">=", "13.5") == 3)   // k ≥ 14 → {14,42,43}
    assert(count("k", "<", "0.5") == 2)     // k < 1 → {-14,0}
    assert(count("k", "<=", "0.5") == 3)    // k ≤ 1 → {-14,0,1}
    // un-coercible / out-of-range: DuckDB raises; graft matches nothing
    assert(count("dv", ">", "") == 0)
    assert(count("dv", ">", "0x10") == 0)
    assert(count("k", ">", "1e999") == 0)
  }

  private val genSortKeys: Gen[List[SortKey]] = for {
    n <- Gen.chooseNum(1, 3)
    cols <- Gen.pick(n, Seq("amount", "name", "grp"))
    dirs <- Gen.listOfN(n, Gen.oneOf("ASC", "DESC"))
  } yield cols.zip(dirs).map { case (c, d) => SortKey(c, d) }.toList :+ SortKey("id", "ASC")

  test("SORT: compiler matches SQL with explicit NULLS LAST (DuckDB default order)") {
    cases(genSortKeys, 15).foreach { keys =>
      val stage = SortStage("p", "", Some("prop_t"), keys)
      val viaCompiler = StageCompiler.compile(spark, stage, lookup)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      val orderBy = keys.map(k => s"${k.column} ${k.direction} NULLS LAST").mkString(", ")
      val viaSql = spark.sql(s"SELECT * FROM prop_t ORDER BY $orderBy")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(viaCompiler == viaSql, s"mismatch for ORDER BY $orderBy")
    }
  }

  private val genAggs: Gen[List[Aggregation]] = for {
    n <- Gen.chooseNum(1, 3)
    fns <- Gen.listOfN(n, Gen.oneOf("SUM", "COUNT", "AVG", "MIN", "MAX"))
  } yield fns.zipWithIndex.map { case (f, i) =>
    Aggregation(f, if (f == "COUNT") "*" else "amount", Some(s"a$i"))
  }

  test("GROUP: compiler matches SQL group-by with group columns first") {
    cases(Gen.someOf("grp", "name").suchThat(_.nonEmpty).flatMap(g =>
      genAggs.map(a => (g, a))), 15).foreach { case (groupCols, aggs) =>
      {
        val stage = GroupStage("p", "", Some("prop_t"), groupCols.toSeq, aggs)
        val viaCompiler = StageCompiler.compile(spark, stage, lookup)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val aggSql = aggs.map(a => s"${a.function}(${a.column}) AS ${a.alias.get}")
        val sql = s"SELECT ${(groupCols ++ aggSql).mkString(", ")} FROM prop_t " +
          s"GROUP BY ${groupCols.mkString(", ")}"
        val viaSql = spark.sql(sql)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(viaCompiler.toSeq == viaSql.toSeq, s"mismatch for $sql")
      }
    }
  }
}
