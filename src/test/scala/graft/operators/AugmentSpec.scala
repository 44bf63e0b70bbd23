package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class AugmentSpec extends SparkTestBase {
  import spark.implicits._

  private def corrupt(texts: Seq[String], density: Double, spanLen: Int = 3) =
    Augment.spanCorrupt(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "id", "text", noiseDensity = density, spanLen = spanLen)

  /** Splice each target span back over its sentinel in the input. */
  private def reconstruct(input: String, target: String): String = {
    val spans = target.split("<extra_id_\\d+> ").filter(_.nonEmpty)
      .map(_.trim)
    var out = input
    spans.zipWithIndex.foreach { case (s, k) =>
      out = out.replace(s"<extra_id_$k>", s)
    }
    out
  }

  test("spanCorrupt: sentinel splice reconstructs the original text exactly") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "short doc", "", "   ")
    val out = corrupt(texts, density = 0.5, spanLen = 2)
      .orderBy("id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val r = out(i)
      val expected = t.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(reconstruct(r.getString(1), r.getString(2)) == expected,
        s"doc $i: ${r.getString(1)} | ${r.getString(2)}")
      // stats agree: dropped + kept-in-input tokens == n_tokens
      val sentinels = "<extra_id_\\d+>".r.findAllIn(r.getString(1)).size
      assert(r.getAs[Long]("n_spans") == sentinels)
    }
  }

  test("spanCorrupt: density 0 passes text through; density 1 masks everything as ONE span") {
    val t = "alpha beta gamma delta epsilon zeta"
    val none = corrupt(Seq(t), density = 0.0).collect()(0)
    assert(none.getString(1) == t && none.getString(2) == "" &&
      none.getAs[Long]("n_dropped") == 0L && none.getAs[Long]("n_spans") == 0L)
    val all = corrupt(Seq(t), density = 1.0).collect()(0)
    assert(all.getString(1) == "<extra_id_0>")
    assert(all.getString(2) == s"<extra_id_0> $t")
    assert(all.getAs[Long]("n_dropped") == 6L && all.getAs[Long]("n_spans") == 1L)
  }

  test("spanCorrupt is deterministic and seed-sensitive") {
    val texts = (0 until 30).map(i => s"tok$i " * 20)
    val a = corrupt(texts, density = 0.3).orderBy("id").collect().toSeq
    val b = corrupt(texts, density = 0.3).orderBy("id").collect().toSeq
    assert(a == b)
    val other = Augment.spanCorrupt(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "id", "text", noiseDensity = 0.3, seed = "other").orderBy("id").collect().toSeq
    assert(a != other) // a different seed moves the masks
  }

  test("wordDropout: rate bounds, order preserved, empty doc passes through") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta"), (2L, ""))
      .toDF("id", "text")
    val zero = Augment.wordDropout(d, "id", "text", rate = 0.0)
      .orderBy("id").collect()
    assert(zero(0).getString(1) == "alpha beta gamma delta epsilon zeta")
    assert(zero(0).getLong(2) == 6L && zero(0).getLong(3) == 0L)
    assert(zero(1).getString(1) == "" && zero(1).getLong(2) == 0L)
    val all = Augment.wordDropout(d, "id", "text", rate = 1.0)
      .orderBy("id").collect()
    assert(all(0).getString(1) == "" && all(0).getLong(3) == 6L)
    // kept tokens preserve document order at a middling rate
    val some = Augment.wordDropout(d, "id", "text", rate = 0.5)
      .orderBy("id").collect()(0).getString(1).split(" ").filter(_.nonEmpty)
    val orig = "alpha beta gamma delta epsilon zeta".split(" ")
    assert(some.toSeq == orig.filter(some.contains(_)).toSeq)
    // deterministic
    assert(Augment.wordDropout(d, "id", "text", rate = 0.5)
      .orderBy("id").collect()(0).getString(1).split(" ").toSeq ==
      some.toSeq)
  }

  test("tokenMask: masks exactly the dropout positions, keeps length") {
    import spark.implicits._
    val d = Seq((7L, "one two three four five six seven eight"))
      .toDF("id", "text")
    val dropped = Augment.wordDropout(d, "id", "text", rate = 0.4)
      .collect()(0)
    val masked = Augment.tokenMask(d, "id", "text", rate = 0.4)
      .collect()(0)
    val toks = masked.getString(1).split(" ")
    assert(toks.length == 8) // masking never changes token count
    assert(masked.getLong(3) == dropped.getLong(3)) // same hash decisions
    assert(toks.count(_ == "<mask>") == masked.getLong(3))
    // non-masked positions carry the original tokens
    val orig = "one two three four five six seven eight".split(" ")
    toks.zip(orig).foreach { case (m, o) =>
      assert(m == "<mask>" || m == o)
    }
  }
}
