package graft.model

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: render ∘ parse = identity over arbitrary valid stages — pins
  * the flow-file interchange format (ui/src/App.tsx:2046-2051). */
class StageJsonPropertySpec extends AnyFunSuite {

  private def cases[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val genName: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(cs => "c" + cs.mkString))

  private val genValue: Gen[Any] = Gen.oneOf(
    genName.map(identity[Any]),
    Gen.chooseNum(-1000L, 1000L).map(identity[Any]),
    Gen.chooseNum(-10.0, 10.0).map(identity[Any]),
    Gen.listOfN(3, Gen.chooseNum(0L, 9L)).map(identity[Any]))

  private val genCondition: Gen[FilterCondition] = for {
    c <- genName
    op <- Gen.oneOf(FilterOperator.all.toSeq)
    v <- genValue
    l <- Gen.oneOf(Some("AND"), Some("OR"), None)
  } yield FilterCondition(c, op, v, l)

  private val genStage: Gen[Stage] = Gen.oneOf[Gen[Stage]](
    for { t <- genName; f <- genName } yield LoadStage("s", "d", t, f + ".csv"),
    for {
      jt <- Gen.oneOf("INNER", "LEFT", "RIGHT", "FULL OUTER")
      lt <- genName; rt <- genName; lk <- genName; rk <- genName
    } yield JoinStage("s", "d", jt, lt, rt, lk, rk),
    for {
      ut <- Gen.oneOf("UNION", "UNION ALL")
      ts <- Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, genName))
    } yield UnionStage("s", "d", ut, ts),
    for {
      t <- Gen.option(genName)
      n <- Gen.chooseNum(1, 4)
      cs <- Gen.listOfN(n, genCondition)
    } yield FilterStage("s", "d", t, normalizeFirstLogic(cs)),
    for {
      t <- Gen.option(genName)
      gs <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genName))
      as <- Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, genAgg))
    } yield GroupStage("s", "d", t, gs, as),
    for {
      t <- Gen.option(genName)
      cs <- Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genName))
    } yield SelectStage("s", "d", t, cs),
    for {
      t <- Gen.option(genName)
      ks <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n,
        for { c <- genName; d <- Gen.oneOf("ASC", "DESC") } yield SortKey(c, d)))
    } yield SortStage("s", "d", t, ks),
    for {
      t <- Gen.option(genName)
      as <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genAgg))
    } yield AggregateStage("s", "d", t, as),
    genName.map(q => CustomStage("s", "d", s"SELECT * FROM $q"))
  ).flatMap(identity)

  private val genAgg: Gen[Aggregation] = for {
    f <- Gen.oneOf("SUM", "COUNT", "AVG", "MIN", "MAX")
    c <- Gen.oneOf(genName, Gen.const("*"))
    a <- Gen.option(genName)
  } yield Aggregation(f, c, a)

  /** A single condition with no logic renders in the flat format, which
    * drops the (ignored) first-condition logic — normalize like the
    * reference, whose first condition's logic is never serialized. */
  private def normalizeFirstLogic(cs: List[FilterCondition]): List[FilterCondition] =
    cs match {
      case head :: tail if tail.isEmpty => head.copy(logic = None) :: Nil
      case other                        => other
    }

  test("render ∘ parse = identity over 200 random stage lists") {
    cases(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, genStage)), 200)
      .foreach { stages =>
        val json = StageJson.render(stages)
        val back = StageJson.parseStages(json)
        assert(normalizeValues(back) == normalizeValues(stages), s"\njson: $json")
      }
  }

  /** JSON numbers lose Scala's Int/Long/Double distinctions — compare
    * values through the same lens the executor sees (stringified). */
  private def normalizeValues(stages: Seq[Stage]): Seq[Stage] = stages.map {
    case f: FilterStage => f.copy(conditions = f.conditions.map { c =>
      c.copy(value = c.value match {
        case xs: Seq[_] => xs.map(String.valueOf).toList
        case other      => String.valueOf(other)
      })
    })
    case other => other
  }
}
