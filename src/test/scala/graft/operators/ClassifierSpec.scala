package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {

  // perfectly separable two-vocabulary corpus: positives say "good",
  // negatives say "bad" (distinct hash buckets at 64)
  private lazy val corpus = df("id BIGINT, text STRING, y DOUBLE", Seq(
    Row(1L, "good stuff", 1.0), Row(2L, "good things", 1.0),
    Row(3L, "very good", 1.0), Row(4L, "bad stuff", 0.0),
    Row(5L, "bad things", 0.0), Row(6L, "very bad", 0.0)))

  test("fitLogistic separates a two-vocabulary corpus") {
    val w = Classifier.fitLogistic(corpus, "id", "text", "y",
      buckets = 64, iterations = 10, lr = 1.0)
    assert(w.count() == 65)
    val scored = Classifier.scoreLogistic(corpus, "id", "text", w, 64)
      .join(corpus.select(col("id"), col("y")), Seq("id"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // every positive must outscore every negative
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    assert(pos.min > neg.max, scored.toSeq.toString)
    // and the decision boundary at 0.5 classifies perfectly
    assert(pos.forall(_ > 0.5) && neg.forall(_ < 0.5))
  }

  test("bias alone handles an empty-feature document") {
    val skewed = df("id BIGINT, text STRING, y DOUBLE", Seq(
      Row(1L, "x", 1.0), Row(2L, "x", 1.0), Row(3L, "x", 1.0),
      Row(4L, "", 0.0)))
    val w = Classifier.fitLogistic(skewed, "id", "text", "y",
      buckets = 16, iterations = 5, lr = 1.0)
    val s = Classifier.scoreLogistic(skewed, "id", "text", w, 16)
      .orderBy("id").collect().map(_.getDouble(1))
    // doc 4 has no tokens: its score is σ̃(bias), which training must
    // have pushed below the x-docs' scores
    assert(s(3) < s(0))
  }

  test("fit is invariant to row order and partitioning") {
    val shuffled = corpus.orderBy(rand(7)).repartition(5)
    val a = Classifier.fitLogistic(corpus, "id", "text", "y",
        buckets = 32, iterations = 3, lr = 0.5)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Classifier.fitLogistic(shuffled, "id", "text", "y",
        buckets = 32, iterations = 3, lr = 0.5)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("grouped fit equals per-group global fits bit-for-bit") {
    val two = df("g STRING, id BIGINT, text STRING, y DOUBLE", Seq(
      Row("a", 1L, "good stuff", 1.0), Row("a", 2L, "bad junk", 0.0),
      Row("a", 3L, "good words", 1.0),
      Row("b", 4L, "fine prose", 1.0), Row("b", 5L, "noisy junk", 0.0)))
    val grouped = Classifier.fitLogisticGrouped(two, "g", "id", "text", "y",
        buckets = 32, iterations = 4, lr = 1.0)
      .orderBy("group", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for (g <- Seq("a", "b")) {
      val solo = Classifier.fitLogistic(
          two.filter(col("g") === g), "id", "text", "y",
          buckets = 32, iterations = 4, lr = 1.0)
        .orderBy("bucket").collect()
        .map(r => (g, r.getLong(0), r.getDouble(1)))
      assert(grouped.filter(_._1 == g).toSeq == solo.toSeq, s"group $g")
    }
  }

  test("grouped scoring equals per-group solo scoring") {
    val two = df("g STRING, id BIGINT, text STRING, y DOUBLE", Seq(
      Row("a", 1L, "good stuff", 1.0), Row("a", 2L, "bad junk", 0.0),
      Row("b", 3L, "fine prose", 1.0), Row("b", 4L, "noisy junk", 0.0),
      Row("c", 5L, "orphan doc", 1.0)))
    val w = Classifier.fitLogisticGrouped(
      two.filter(col("g") =!= "c"), "g", "id", "text", "y",
      buckets = 32, iterations = 3, lr = 1.0)
    val grouped = Classifier.scoreLogisticGrouped(two, "g", "id", "text",
        w, 32)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // group c has no model → dropped, not silently scored
    assert(grouped.map(_._1).toSet == Set("a", "b"))
    for (g <- Seq("a", "b")) {
      val solo = Classifier.scoreLogistic(
          two.filter(col("g") === g), "id", "text",
          w.filter(col("group") === g)
            .select(col("bucket"), col("weight")), 32)
        .orderBy("id").collect().map(r => (g, r.getLong(0), r.getDouble(1)))
      assert(grouped.filter(_._1 == g).toSeq == solo.toSeq, s"group $g")
    }
  }

  test("sigmoidAlg is the algebraic link with the right fixed points") {
    val out = spark.range(1).select(
      Classifier.sigmoidAlg(lit(0.0)).as("a"),
      Classifier.sigmoidAlg(lit(1.0)).as("b"),
      Classifier.sigmoidAlg(lit(-1.0)).as("c"),
      Classifier.sigmoidAlg(lit(99.0)).as("d")).head()
    assert(out.getDouble(0) == 0.5)
    assert(out.getDouble(1) == 0.75)
    assert(out.getDouble(2) == 0.25)
    assert(out.getDouble(3) > 0.99 && out.getDouble(3) < 1.0)
  }
}
