package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * JSON (de)serialization of the Stage ADT, compatible with the reference's
 * interchange format: `[{id, type, description, data}]`
 * (reference: ui/src/sampleStages.json, export at ui/src/App.tsx:2046-2051,
 * field layout ui/src/types.ts:7-63).
 *
 * Uses json4s (shipped with Spark) — hand-rolled extraction rather than
 * reflective case-class binding because `data` is a per-type union and
 * `value` may be string / number / array.
 */
object StageJson {

  def parseStages(json: String): Seq[Stage] =
    JsonMethods.parse(json) match {
      case JArray(items) => items.map(parseStage)
      case obj: JObject  => Seq(parseStage(obj))
      case other         => throw new IllegalArgumentException(s"expected array of stages, got $other")
    }

  def parseStage(jv: JValue): Stage = {
    val id = str(jv \ "id").getOrElse("")
    val tpe = str(jv \ "type").getOrElse(throw new IllegalArgumentException("stage missing 'type'"))
    val description = str(jv \ "description").getOrElse("")
    val data = jv \ "data"

    tpe.toUpperCase match {
      case "LOAD" =>
        LoadStage(id, description,
          tableName = str(data \ "tableName").getOrElse(""),
          fileName = str(data \ "fileName").getOrElse(""))
      case "JOIN" =>
        JoinStage(id, description,
          joinType = str(data \ "joinType").getOrElse(JoinType.Inner),
          leftTable = reqStr(data, "leftTable", "JOIN"),
          rightTable = reqStr(data, "rightTable", "JOIN"),
          leftKey = reqStr(data, "leftKey", "JOIN"),
          rightKey = reqStr(data, "rightKey", "JOIN"))
      case "UNION" =>
        UnionStage(id, description,
          unionType = str(data \ "unionType").getOrElse("UNION"),
          tables = strArray(data \ "tables"))
      case "FILTER" =>
        val conds = data \ "conditions" match {
          case JArray(cs) if cs.nonEmpty =>
            cs.map { c =>
              FilterCondition(
                column = reqStr(c, "column", "FILTER condition"),
                operator = reqStr(c, "operator", "FILTER condition"),
                value = anyValue(c \ "value"),
                logic = str(c \ "logic"))
            }
          case _ =>
            Seq(FilterCondition(
              column = reqStr(data, "column", "FILTER"),
              operator = reqStr(data, "operator", "FILTER"),
              value = anyValue(data \ "value")))
        }
        FilterStage(id, description, str(data \ "table"), conds)
      case "GROUP" =>
        GroupStage(id, description, str(data \ "table"),
          groupBy = strArray(data \ "groupBy"),
          aggregations = aggs(data \ "aggregations"))
      case "SELECT" =>
        SelectStage(id, description, str(data \ "table"), strArray(data \ "columns"))
      case "SORT" =>
        val keys = data \ "orderBy" match {
          case JArray(os) => os.map(o => SortKey(
            reqStr(o, "column", "SORT key"),
            str(o \ "direction").getOrElse("ASC")))
          case _ => Nil
        }
        SortStage(id, description, str(data \ "table"), keys)
      case "AGGREGATE" =>
        AggregateStage(id, description, str(data \ "table"), aggs(data \ "aggregations"))
      case "CUSTOM" =>
        CustomStage(id, description, reqStr(data, "sql", "CUSTOM"))
      case other =>
        throw new IllegalArgumentException(s"Unsupported stage type: $other")
    }
  }

  def render(stages: Seq[Stage]): String =
    JsonMethods.compact(JsonMethods.render(JArray(stages.map(toJson).toList)))

  def toJson(s: Stage): JObject = {
    val data: JObject = s match {
      case LoadStage(_, _, tn, fn) =>
        JObject("tableName" -> JString(tn), "fileName" -> JString(fn))
      case JoinStage(_, _, jt, lt, rt, lk, rk) =>
        JObject("joinType" -> JString(jt), "leftTable" -> JString(lt),
          "rightTable" -> JString(rt), "leftKey" -> JString(lk), "rightKey" -> JString(rk))
      case UnionStage(_, _, ut, ts) =>
        JObject("unionType" -> JString(ut), "tables" -> JArray(ts.map(JString(_)).toList))
      case FilterStage(_, _, t, conds) =>
        val base = t.map(v => List("table" -> (JString(v): JValue))).getOrElse(Nil)
        if (conds.size == 1 && conds.head.logic.isEmpty) {
          val c = conds.head
          JObject(base ++ List(
            "column" -> (JString(c.column): JValue),
            "operator" -> (JString(c.operator): JValue),
            "value" -> valueJson(c.value)): _*)
        } else {
          JObject(base ++ List("conditions" -> (JArray(conds.map { c =>
            JObject(List(
              "column" -> (JString(c.column): JValue),
              "operator" -> (JString(c.operator): JValue),
              "value" -> valueJson(c.value)) ++
              c.logic.map(l => "logic" -> (JString(l): JValue)).toList: _*)
          }.toList): JValue)): _*)
        }
      case GroupStage(_, _, t, gb, as) =>
        JObject(t.map(v => List("table" -> (JString(v): JValue))).getOrElse(Nil) ++ List(
          "groupBy" -> (JArray(gb.map(JString(_)).toList): JValue),
          "aggregations" -> (aggsJson(as): JValue)): _*)
      case SelectStage(_, _, t, cols) =>
        JObject(t.map(v => List("table" -> (JString(v): JValue))).getOrElse(Nil) :+
          ("columns" -> (JArray(cols.map(JString(_)).toList): JValue)): _*)
      case SortStage(_, _, t, ob) =>
        JObject(t.map(v => List("table" -> (JString(v): JValue))).getOrElse(Nil) :+
          ("orderBy" -> (JArray(ob.map(o => JObject(
            "column" -> JString(o.column), "direction" -> JString(o.direction))).toList): JValue)): _*)
      case AggregateStage(_, _, t, as) =>
        JObject(t.map(v => List("table" -> (JString(v): JValue))).getOrElse(Nil) :+
          ("aggregations" -> (aggsJson(as): JValue)): _*)
      case CustomStage(_, _, sql) =>
        JObject("sql" -> JString(sql))
    }
    JObject(
      "id" -> JString(s.id),
      "type" -> JString(s.stageType),
      "description" -> JString(s.description),
      "data" -> data)
  }

  private def aggsJson(as: Seq[Aggregation]): JArray =
    JArray(as.map { a =>
      JObject(List(
        "function" -> (JString(a.function): JValue),
        "column" -> (JString(a.column): JValue)) ++
        a.alias.map(al => "alias" -> (JString(al): JValue)).toList: _*)
    }.toList)

  private def aggs(jv: JValue): Seq[Aggregation] = jv match {
    case JArray(as) => as.map(a => Aggregation(
      reqStr(a, "function", "aggregation"),
      reqStr(a, "column", "aggregation"),
      str(a \ "alias")))
    case _ => Nil
  }

  private def str(jv: JValue): Option[String] = jv match {
    case JString(s)  => Some(s)
    case JInt(i)     => Some(i.toString)
    case JLong(l)    => Some(l.toString)
    case JDouble(d)  => Some(d.toString)
    case JBool(b)    => Some(b.toString)
    case _           => None
  }

  private def reqStr(data: JValue, field: String, ctx: String): String =
    str(data \ field).getOrElse(throw new IllegalArgumentException(s"$ctx requires '$field'"))

  private def strArray(jv: JValue): Seq[String] = jv match {
    case JArray(xs) => xs.flatMap(str)
    case _          => Nil
  }

  /** `value` is untyped in the reference schema — keep the JSON type. */
  private def anyValue(jv: JValue): Any = jv match {
    case JString(s)  => s
    case JInt(i)     => if (i.isValidLong) i.toLong else i.toString
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JArray(xs)  => xs.map(anyValue)
    case JNull       => null
    case JNothing    => null
    case other       => other.toString
  }

  private def valueJson(v: Any): JValue = v match {
    case null            => JNull
    case s: String       => JString(s)
    case i: Int          => JLong(i.toLong)
    case l: Long         => JLong(l)
    case d: Double       => JDouble(d)
    case f: Float        => JDouble(f.toDouble)
    case b: Boolean      => JBool(b)
    case xs: Seq[_]      => JArray(xs.map(valueJson).toList)
    case other           => JString(other.toString)
  }
}
