package graft.operators

import graft.plans.Checkpoints.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * In-plan trained text classifier — the fasttext-style quality-filter
 * loop (CCNet's "train a linear classifier on hashed bag-of-words,
 * score the corpus, keep the top") run entirely inside the engine: no
 * driver-side model, no external ML runtime, weights are a DataFrame.
 *
 * Model: a generalized linear classifier over hashed unigram+bigram
 * PRESENCE features ([[TextFunctions.dsirBuckets]] distinct buckets —
 * the same engine-portable polynomial hash the DSIR family gates pin
 * cross-engine) plus a bias, trained by full-batch gradient descent.
 * The link is the ALGEBRAIC sigmoid σ̃(z) = 0.5 + z/(2(1+|z|)) rather
 * than the logistic 1/(1+e^{−z}): same shape (monotone, bounded,
 * σ̃(0)=0.5) but built from +,×,÷,|·| only, so the DuckDB oracle
 * replays training bit-for-bit — exp() would put cross-engine libm
 * last-ulp drift inside an iterated fixpoint, exactly where it
 * compounds. Every cross-row sum is the DECIMAL(38,9) fold of
 * 9-dp-rounded operands and every division/update rounds to 12 dp
 * (the `Linkage.emEstimate` discipline), so results are
 * partition-order independent.
 *
 * Scale shape: the feature matrix `(id, bucket)` is built ONCE (one
 * corpus scan through the codegen'd hash, exploded distinct) and
 * `localCheckpoint`ed — the one corpus-sized materialization any
 * iterative trainer pays. Each GD step is then: broadcast-join the
 * (buckets+1)-row weight vector to the features, an id-keyed reduce
 * (per-doc margin), a bucket-keyed reduce (gradient, map-side
 * combined to ≤buckets+1 rows), and a weights-sized update — two
 * corpus shuffles per iteration, nothing quadratic, no driver
 * round-trip. The weight frame is checkpointed every iteration (it is
 * referenced by both reduces, the O(2^k)-lineage hazard
 * [[Preference.bradleyTerry]] documents).
 */
object Classifier {

  /** Distinct hashed presence features: `(id, b)` per document ×
    * bucket, b ∈ [0, buckets). Empty documents contribute no rows
    * (they still train/score through the bias via left joins). */
  def hashedPresence(df: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(
          TextFunctions.dsirBuckets(lower(col(textCol)), buckets))).as("b"))

  private def decSum(c: Column): Column =
    sum(round(c, 9).cast("decimal(38,9)")).cast("double")

  /**
   * Full-batch GD fit: returns the weight vector as `(bucket, weight)`
   * — `buckets + 1` rows, bucket −1 is the bias, all weights 6 dp.
   * `labelCol` must be 0/1 (cast to double). Gradient of the squared
   * error through the algebraic link is deliberately simplified to the
   * perceptron-style residual form `(σ̃(z) − y)·x` (the logistic-loss
   * gradient with the link swapped) — standard for a filter-grade
   * linear scorer, and exactly replayable.
   */
  def fitLogistic(df: DataFrame, idCol: String, textCol: String,
                  labelCol: String, buckets: Int = 4096,
                  iterations: Int = 5, lr: Double = 0.5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(buckets >= 1 && lr > 0, "buckets and lr must be positive")
    val spark = df.sparkSession
    val labels = df.select(col(idCol).cast("long").as("id"),
        col(labelCol).cast("double").as("y"))
      .truncateLineage()
    val feats = hashedPresence(
        df.select(col(idCol).cast("long").as("id"), col(textCol)),
        "id", textCol, buckets)
      .truncateLineage()
    val nDocs = broadcast(labels.agg(count(lit(1)).as("__n")))
    val init = spark.range(-1L, buckets.toLong)
      .select(col("id").cast("long").as("b"), lit(0.0).as("wt"))
      .truncateLineage()
    val wFinal = (1 to iterations).foldLeft(init: DataFrame) { (w, _) =>
      val margins = residuals(labels, feats, w, nDocs)
      val grads = feats.join(margins, Seq("id"))
        .groupBy("b")
        .agg(round(decSum(col("__r")) / first(col("__n")), 12).as("__g"))
      val biasGrad = margins
        .agg(round(decSum(col("__r")) / first(col("__n")), 12).as("__g"))
        .select(lit(-1L).as("b"), col("__g"))
      val allGrads = grads.unionAll(biasGrad)
      w.join(allGrads, Seq("b"), "left")
        .select(col("b"),
          round(col("wt") - lit(lr) * coalesce(col("__g"), lit(0.0)), 12)
            .as("wt"))
        .truncateLineage()
    }
    wFinal.select(col("b").as("bucket"), round(col("wt"), 6).as("weight"))
  }

  /**
   * Per-GROUP fit — one independent model per value of `groupCol`
   * (CCNet trains one quality filter per language), all trained in a
   * SINGLE plan: every join/reduce of the global fit just gains the
   * group as a leading key, so Spark trains the whole model family in
   * the same two shuffles per GD round a single model costs — no
   * per-group driver loop, no G× replan. Weight state is
   * `groups × (buckets+1)` rows (still model-sized; broadcast on the
   * feature join). Returns `(group, bucket, weight)`.
   *
   * Exactly equivalent to running [[fitLogistic]] on each group's
   * slice (ClassifierSpec proves bit-for-bit equality): groups never
   * interact — separate counts, gradients, biases.
   */
  def fitLogisticGrouped(df: DataFrame, groupCol: String, idCol: String,
                         textCol: String, labelCol: String,
                         buckets: Int = 4096, iterations: Int = 5,
                         lr: Double = 0.5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(buckets >= 1 && lr > 0, "buckets and lr must be positive")
    val spark = df.sparkSession
    val labels = df.select(col(groupCol).as("g"),
        col(idCol).cast("long").as("id"),
        col(labelCol).cast("double").as("y"))
      .truncateLineage()
    val feats = df.select(col(groupCol).as("g"),
        col(idCol).cast("long").as("id"),
        explode(array_distinct(
          TextFunctions.dsirBuckets(lower(col(textCol)), buckets))).as("b"))
      .truncateLineage()
    val nDocs = labels.groupBy("g").agg(count(lit(1)).as("__n"))
      .truncateLineage()
    val init = nDocs.select(col("g"))
      .crossJoin(spark.range(-1L, buckets.toLong)
        .select(col("id").cast("long").as("b")))
      .withColumn("wt", lit(0.0))
      .truncateLineage()
    val wFinal = (1 to iterations).foldLeft(init) { (w, _) =>
      val zSums = feats
        .join(broadcast(w.filter(col("b") >= 0)), Seq("g", "b"))
        .groupBy("g", "id").agg(decSum(col("wt")).as("__zs"))
      val bias = broadcast(w.filter(col("b") === -1)
        .select(col("g"), col("wt").as("__w0")))
      val margins = labels
        .join(zSums, Seq("g", "id"), "left")
        .join(bias, Seq("g"))
        .join(broadcast(nDocs), Seq("g"))
        .withColumn("__z",
          round(col("__w0") + coalesce(col("__zs"), lit(0.0)), 12))
        .select(col("g"), col("id"),
          round(sigmoidAlg(col("__z")) - col("y"), 9).as("__r"), col("__n"))
      val grads = feats.join(margins, Seq("g", "id"))
        .groupBy("g", "b")
        .agg(round(decSum(col("__r")) / first(col("__n")), 12).as("__g"))
      val biasGrad = margins.groupBy("g")
        .agg(round(decSum(col("__r")) / first(col("__n")), 12).as("__g"))
        .select(col("g"), lit(-1L).as("b"), col("__g"))
      w.join(grads.unionAll(biasGrad), Seq("g", "b"), "left")
        .select(col("g"), col("b"),
          round(col("wt") - lit(lr) * coalesce(col("__g"), lit(0.0)), 12)
            .as("wt"))
        .truncateLineage()
    }
    wFinal.select(col("g").as("group"), col("b").as("bucket"),
      round(col("wt"), 6).as("weight"))
  }

  /** Score each document with ITS group's model from a
    * [[fitLogisticGrouped]] weight frame `(group, bucket, weight)`:
    * `(group, id, score)` — the per-language serve path; the weights
    * join carries (group, bucket) keys, still model-sized/broadcast. A
    * document whose group has no model is dropped (inner join on the
    * bias row — the explicit contract, not a silent 0.5). */
  def scoreLogisticGrouped(df: DataFrame, groupCol: String, idCol: String,
                           textCol: String, weights: DataFrame,
                           buckets: Int): DataFrame = {
    val w = weights.select(col("group").as("g"), col("bucket").as("b"),
      col("weight").cast("double").as("wt"))
    val feats = df.select(col(groupCol).as("g"),
      col(idCol).cast("long").as("id"),
      explode(array_distinct(
        TextFunctions.dsirBuckets(lower(col(textCol)), buckets))).as("b"))
    val zSums = feats
      .join(broadcast(w.filter(col("b") >= 0)), Seq("g", "b"))
      .groupBy("g", "id").agg(decSum(col("wt")).as("__zs"))
    val bias = broadcast(w.filter(col("b") === -1)
      .select(col("g"), col("wt").as("__w0")))
    df.select(col(groupCol).as("g"), col(idCol).cast("long").as("id"))
      .join(bias, Seq("g"))
      .join(zSums, Seq("g", "id"), "left")
      .select(col("g").as("group"), col("id"),
        round(sigmoidAlg(
          round(col("__w0") + coalesce(col("__zs"), lit(0.0)), 12)), 6)
          .as("score"))
  }

  /** Per-doc residual frame `(id, __r, __n)`: __r = σ̃(z) − y at the
    * current weights, carried with the doc count for the gradient
    * divide. */
  private def residuals(labels: DataFrame, feats: DataFrame,
                        w: DataFrame, nDocs: DataFrame): DataFrame = {
    val zSums = feats
      .join(broadcast(w.filter(col("b") >= 0)), Seq("b"))
      .groupBy("id").agg(decSum(col("wt")).as("__zs"))
    val bias = broadcast(w.filter(col("b") === -1)
      .select(col("wt").as("__w0")))
    labels.join(zSums, Seq("id"), "left").crossJoin(bias)
      .crossJoin(nDocs)
      .withColumn("__z",
        round(col("__w0") + coalesce(col("__zs"), lit(0.0)), 12))
      .withColumn("__p", sigmoidAlg(col("__z")))
      .select(col("id"), round(col("__p") - col("y"), 9).as("__r"),
        col("__n"))
  }

  /** The algebraic sigmoid σ̃(z) = 0.5 + z/(2(1+|z|)), 12 dp. */
  def sigmoidAlg(z: Column): Column =
    round(lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z))), 12)

  /**
   * STREAM-legal scorer: the trained weights ship as a LITERAL array
   * (buckets ≤ a few thousand — the model is filter-grade by design),
   * so scoring is a pure per-row projection: no join, no shuffle, no
   * state — legal in any streaming mode and exactly the plan shape of
   * `Dsir.scoreWithWeights`. The per-row bucket sum accumulates in
   * DECIMAL(38,9) (exact, hence order-independent), so scores match
   * [[scoreLogistic]] bit-for-bit on the same weights
   * (ClassifierStreamCrossCheckSpec proves it over a MemoryStream).
   */
  def scoreInline(df: DataFrame, idCol: String, textCol: String,
                  bias: Double, weights: Map[Int, Double],
                  buckets: Int): DataFrame = {
    val warr = array((0 until buckets).map(b =>
      lit(weights.getOrElse(b, 0.0))): _*)
    val present = array_distinct(
      TextFunctions.dsirBuckets(lower(col(textCol)), buckets))
    // decimal(38,9) + decimal(38,9) widens to (38,8) under Spark's
    // precision rules — cast the merge result back so the accumulator
    // type stays fixed (exact either way: weights are 6 dp)
    val zs = aggregate(present,
      lit(BigDecimal(0)).cast("decimal(38,9)"),
      (acc, b) => (acc + round(element_at(warr, b + 1), 9)
        .cast("decimal(38,9)")).cast("decimal(38,9)"))
      .cast("double")
    df.select(col(idCol).cast("long").as("id"),
      round(sigmoidAlg(round(lit(bias) + zs, 12)), 6).as("score"))
  }

  /** Collect a [[fitLogistic]] weight frame into the `(bias, map)` pair
    * [[scoreInline]] wants — a documented (buckets+1)-row driver
    * round-trip, the model hand-off point between train and serve. */
  def collectWeights(weights: DataFrame): (Double, Map[Int, Double]) = {
    val rows = weights.collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    (rows.getOrElse(-1, 0.0), (rows - (-1)).map { case (k, v) => k -> v })
  }

  /**
   * Score documents with a trained weight vector: `(id, score)` with
   * score = σ̃(bias + Σ weights of present buckets), 6 dp — one
   * corpus scan + a broadcast join against the (buckets+1)-row model;
   * compose with a threshold filter (or `Sample.topFraction`) for the
   * CCNet-style keep-the-top curation step.
   */
  def scoreLogistic(df: DataFrame, idCol: String, textCol: String,
                    weights: DataFrame, buckets: Int): DataFrame = {
    val feats = hashedPresence(
      df.select(col(idCol).cast("long").as("id"), col(textCol)),
      "id", textCol, buckets)
    val w = weights.select(col("bucket").as("b"),
      col("weight").cast("double").as("wt"))
    val zSums = feats
      .join(broadcast(w.filter(col("b") >= 0)), Seq("b"))
      .groupBy("id").agg(decSum(col("wt")).as("__zs"))
    val bias = broadcast(w.filter(col("b") === -1)
      .select(col("wt").as("__w0")))
    df.select(col(idCol).cast("long").as("id"))
      .join(zSums, Seq("id"), "left").crossJoin(bias)
      .select(col("id"),
        round(sigmoidAlg(
          round(col("__w0") + coalesce(col("__zs"), lit(0.0)), 12)), 6)
          .as("score"))
  }
}
