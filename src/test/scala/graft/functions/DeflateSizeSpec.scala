package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DeflateSizeSpec extends SparkTestBase {
  import spark.implicits._

  private def sizes(texts: Seq[String]) =
    texts.toDF("t")
      .select(TextFunctions.deflateSize(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))

  test("repetitive text compresses far below prose; ratio ordering holds") {
    val Array(rep, prose) = sizes(Seq(
      "spam " * 200,
      "The quick brown fox jumps over the lazy dog near the riverbank " +
        "while seventeen disparate sentences meander through unrelated " +
        "topics of astronomy, cookery, and maritime law without repetition."))
    assert(rep < 40, s"1000 bytes of 'spam ' should deflate tiny, got $rep")
    assert(prose > rep * 3, "prose must not compress like pure repetition")
  }

  test("deterministic within a run; empty and null inputs") {
    val a = sizes(Seq("hello world, hello world, hello world"))
    val b = sizes(Seq("hello world, hello world, hello world"))
    assert(a.sameElements(b))
    assert(sizes(Seq(""))(0) >= 0) // empty input still emits a (tiny) stream
    val n = Seq[String](null).toDF("t")
      .select(TextFunctions.deflateSize(col("t")).as("n")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("self-repetition beats independent streams; raw deflate never blows up") {
    val docs = Seq(
      "a structurally varied paragraph with digits 0123456789 and mixed Case.",
      "x" * 64,
      scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(300).mkString)
    val df = docs.toDF("t").select(col("t"),
      TextFunctions.deflateSize(col("t")).as("one"),
      TextFunctions.deflateSize(repeat(col("t"), 4)).as("four"),
      octet_length(col("t")).cast("long").as("len"))
    df.collect().foreach { r =>
      assert(r.getLong(2) < 4 * r.getLong(1), s"repetition must compress: $r")
      assert(r.getLong(1) <= r.getLong(3) + 64, s"bounded by plain + slop: $r")
    }
  }
}
