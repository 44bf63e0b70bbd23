package graft

/** Smoke: every declared query runs at sf0.001 and yields rows; every
  * oracle key refers to a declared query. */
class SparkEntrySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs and returns rows at sf0.001") {
      val out = fn(spark, sf)
      assert(out.count() > 0, s"$name returned 0 rows")
      // Float-determinism convention: DECIMAL is an accumulator type,
      // never an output type — decimal stringification ('123.4' vs
      // '123.40') is not canonical across engines, so any DecimalType
      // column is a latent oracle hash mismatch.
      val decimalCols = out.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
      }
      assert(decimalCols.isEmpty,
        s"$name emits DecimalType columns ${decimalCols.mkString(",")}; cast to DOUBLE")
    }
  }
}
