package graft.sources

import graft.SparkTestBase
import java.nio.file.Files

class IngestSpec extends SparkTestBase {

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("graft_ingest", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("primary CSV path infers schema like read_csv_auto") {
    val p = writeCsv("id,name,amount\n1,Alice,10.5\n2,Bob,20.0\n")
    val df = Ingest.csv(spark, p)
    assert(df.schema.map(_.dataType.typeName).toSeq == Seq("integer", "string", "double"))
    assert(df.count() == 2)
  }

  test("fallback path is all-string and capped at 10k rows") {
    val rows = (1 to 12000).map(i => s"$i,x$i").mkString("\n")
    val p = writeCsv("id,name\n" + rows)
    val df = Ingest.csvFallback(spark, p)
    assert(df.schema.forall(_.dataType.typeName == "string"))
    assert(df.count() == 10000)
  }

  test("loadCsvTable registers under the reference's table_<stem> name") {
    val p = writeCsv("a\n1\n")
    val dir = Files.createTempDirectory("graft")
    val renamed = dir.resolve("My Data-File.csv")
    Files.move(java.nio.file.Path.of(p), renamed)
    val (name, _) = Ingest.loadCsvTable(spark, renamed.toString)
    assert(name == "table_My_Data_File")
    assert(spark.sql(s"SELECT * FROM $name").count() == 1)
  }

  test("image payload: lowercased columns, VARCHAR default, NULL literals") {
    val df = Ingest.fromImagePayload(spark,
      Seq(Ingest.ImageColumn("Product_ID", "INTEGER"),
        Ingest.ImageColumn("Price", "DOUBLE"),
        Ingest.ImageColumn("Label")),
      Seq(Seq("1", "9.99", "widget"), Seq("2", "NULL", "gadget"), Seq("x", "1.0", null)))
    assert(df.columns.toSeq == Seq("product_id", "price", "label"))
    val rows = df.collect()
    assert(rows(1).isNullAt(1))          // literal "NULL" cell
    assert(rows(2).isNullAt(0))          // unparseable int → NULL
    assert(df.schema("product_id").dataType.typeName == "integer")
  }

  test("duck type names map to Spark types") {
    import org.apache.spark.sql.types._
    assert(Ingest.sparkType("VARCHAR") == StringType)
    assert(Ingest.sparkType("decimal(10,2)") == DecimalType(38, 18))
    assert(Ingest.sparkType("BIGINT") == LongType)
    assert(Ingest.sparkType("whatever") == StringType)
  }

  test("loadDir registers the testdata star schema") {
    val tables = Ingest.loadDir(spark, "/root/testdata/sf0.001")
    assert(tables.keySet.contains("lineitem"))
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 6000L)
  }
}
