package graft.operators

import graft.plans.Checkpoints.LineageOps
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-label embedding centroids and distance-to-centroid outlier
 * screening — the standard "is this example labeled right / is this
 * cluster coherent" pass over an embedded dataset: vectors far from
 * their own label's centroid are mislabels, boundary cases, or junk, and
 * ranking by that distance is the curation queue.
 *
 * Determinism at scale: the centroid mean is a per-dimension DECIMAL sum
 * (each component rounds to 9 dp first) — associative, so the result is
 * identical under any partitioning — divided once as DOUBLE; cosines
 * against the centroid use the same fused loop as the ANN operators and
 * round to 6 dp (SparkEntry float policy).
 *
 * Scale shape: posexplode multiplies rows by the dimension count, but
 * the (label, dim) aggregate map-side-combines to |labels|×dims partial
 * rows per partition — network volume is independent of corpus size.
 * Centroids are |labels|-sized, so the score join BROADCASTs; scoring is
 * then one codegen'd map pass, and outlier top-k is a per-label window
 * over (small) per-label candidate sets.
 */
object Centroids {

  /** `(label, centroid)` — per-dimension add-exact mean of each label's
    * vectors. All vectors must share one dimensionality. */
  def labelCentroids(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val ex = df.select(col(labelCol).as("label"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
    ex.groupBy("label", "pos")
      .agg((sum(round(col("x"), 9).cast("decimal(27,9)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("centroid"))
  }

  /** Chunk→parent mean pooling with unit renormalization — the
    * document-level embedding from chunk embeddings (chunk → embed →
    * pool, the standard long-document retrieval recipe; matryoshka-style
    * unit renorm so downstream cosine = dot). Mean is [[labelCentroids]]'
    * add-exact per-dimension decimal mean keyed by the parent id; the
    * L2 norm is the same sequential index-order fold as VF.l2Norm, so
    * the result is engine-reproducible. An all-zero pooled vector stays
    * zeros (no direction to normalize to). Output: `(parentCol,
    * pooled)`. Scale shape: identical to [[labelCentroids]] — network
    * volume |parents|×dims partials, independent of chunk count. */
  def meanPoolNormalized(df: DataFrame, parentCol: String,
                         vecCol: String): DataFrame = {
    val nrm = VF.l2Norm(col("centroid"))
    labelCentroids(df, vecCol, parentCol)
      .select(col("label").as(parentCol),
        when(nrm === lit(0.0), col("centroid"))
          .otherwise(transform(col("centroid"), x => x / nrm)).as("pooled"))
  }

  /** Each vector's cosine to its OWN label's centroid:
    * `(idCol, label, cosine)`, cosine rounded to 6 dp. */
  def cosineToCentroid(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String): DataFrame = {
    val cents = broadcast(labelCentroids(df, vecCol, labelCol))
    df.select(col(idCol), col(labelCol).as("label"), col(vecCol).as("__v"))
      .join(cents, "label")
      .select(col(idCol), col("label"),
        round(VF.cosine(col("__v"), col("centroid")), 6).as("cosine"))
  }

  /**
   * Embedding-space class-separation audit — are the labels actually
   * separable in this embedding? One row per label:
   * `(label, n, mean_self_cosine, nearest_label,
   *   nearest_centroid_cosine, margin)` — members' mean cosine to their
   * own centroid (cohesion), the most-confusable other label by
   * centroid-centroid cosine, and the cohesion−confusion margin. A
   * label whose margin ≤ 0 is not linearly separable at the centroid
   * level: expect label noise, or an embedding that doesn't encode the
   * distinction — the screen to run BEFORE training a classifier head
   * or trusting [[assignNearest]] relabeling.
   *
   * Determinism: member cosines are the 6-dp [[cosineToCentroid]]
   * values, their mean a DECIMAL(20,6) sum over exact 6-dp terms
   * divided once; the centroid matrix is |labels|² tiny with
   * (cosine DESC, label ASC) tie-breaks. Scale shape: one
   * [[labelCentroids]] pass + the broadcast self-cosine join (corpus
   * never shuffles) + a |labels|²-row nested loop.
   */
  def classSeparation(df: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val cohesion = cosineToCentroid(df, idCol, vecCol, labelCol)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum(col("cosine").cast("decimal(20,6)")).cast("double") /
          count(lit(1)), 6).as("mean_self_cosine"))
    val cents = labelCentroids(df, vecCol, labelCol)
    val confusion = cents.alias("a")
      .join(broadcast(cents.alias("b")), col("a.label") =!= col("b.label"))
      .select(col("a.label").as("label"), col("b.label").as("__other"),
        round(VF.cosine(col("a.centroid"), col("b.centroid")), 6).as("__c"))
      .groupBy("label")
      .agg(min(struct((-col("__c")).as("nc"), col("__other").as("l"))).as("m"))
      .select(col("label"), col("m.l").as("nearest_label"),
        (-col("m.nc")).as("nearest_centroid_cosine"))
    cohesion.join(confusion, Seq("label"), "left")
      .withColumn("margin",
        round(col("mean_self_cosine") - col("nearest_centroid_cosine"), 6))
  }

  /** Assign every vector to its NEAREST label centroid by cosine
    * (regardless of its own label) — `(idCol, cluster, cosine)`; ties
    * break to the smallest label, via struct-ordered min over
    * `(-cosine, label)` so the tie-break works for ANY ordered label
    * type (string labels included). This is the cluster-assignment /
    * relabeling pass: rows whose assigned cluster differs from their
    * label are confusable or mislabeled.
    *
    * Scale shape: centroids broadcast (|labels| rows), the cross join is
    * a codegen'd nested-loop over the broadcast side, and the argmax is
    * a struct-min aggregate (plans as SortAggregate — struct buffers
    * aren't hash-agg-supported — but the partial pass still collapses
    * each vector's |labels| candidate rows before the exchange, so the
    * shuffle carries one row per vector). */
  /**
   * Greedy k-center coreset selection (Gonzalez 1985; the diversity-
   * sampling backbone of active learning and "select the k most
   * spread-out examples" data curation): start from the smallest id,
   * then k−1 times pick the point FARTHEST (cosine distance) from
   * everything selected so far — a 2-approximation of the optimal
   * k-center cover. Output one row per center:
   * `(center_order, vec_id, min_dist)` where `min_dist` is the covering
   * radius the pick maximized (NULL for the seed); `min_dist` of center
   * k is an upper bound on how far any remaining point sits from the
   * coreset — the number you read to choose k.
   *
   * Fully IN-PLAN: each round is a 1-row `orderBy.limit(1)` subplan
   * broadcast into a `least(mind, dist)` update — no driver collect,
   * no RNG; distances round to 6 dp before every comparison (argmax
   * ties break on id), so the selection is engine-exact and the gate
   * unrolls round for round in SQL. Greedy selection is inherently
   * sequential and each round references the running state twice (via
   * the argmax subplan), so the logical plan would grow O(2^k) —
   * the loop localCheckpoints the state every 8 rounds (same lineage
   * discipline as [[lloyd]]/Graph), keeping large k plannable.
   */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
    // sentinel 2.0+ = "uncovered": cosine distance is bounded by 2
    var state = e.withColumn("__mind", lit(3.0))
    var out: DataFrame = null
    for (r <- 0 until k) {
      // the 1-row pick is referenced TWICE (output row + state update):
      // materialize it or the state plan doubles every round between
      // checkpoints (2^8 plan growth at the old %8 cadence)
      val chosen =
        (if (r == 0) state.orderBy(col("vec_id").asc).limit(1)
         else state.orderBy(col("__mind").desc, col("vec_id").asc).limit(1))
          .truncateLineage(eager = true)
      val row = chosen.select(lit(r).as("center_order"), col("vec_id"),
        (if (r == 0) lit(null).cast("double") else col("__mind"))
          .as("min_dist"))
      out = if (out == null) row else out.unionByName(row)
      state = state
        .join(broadcast(chosen.select(col("vec_id").as("__cid"),
          col("__v").as("__cv"))), col("vec_id") =!= col("__cid"))
        .withColumn("__mind", least(col("__mind"),
          round(lit(1.0) - VF.cosine(col("__v"), col("__cv")), 6)))
        .drop("__cid", "__cv")
      // the state plan references itself twice per round (argmax subplan
      // + update), so lineage doubles each pick — truncate it
      if (r % 8 == 7 && r != k - 1) state = state.truncateLineage(true)
      graft.plans.IterationAudit.record("centroids.kCenterGreedy", state)
    }
    out
  }

  def assignNearest(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String): DataFrame =
    assignToCentroids(df, idCol, vecCol, labelCentroids(df, vecCol, labelCol))

  /** Assign each vector to the nearest of an explicit `(label,
    * centroid)` set by 6-dp-rounded cosine (same argmax/tie-break
    * semantics as [[assignNearest]]; centroids broadcast). */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("label"),
        round(VF.cosine(col("__v"), col("centroid")), 6).as("c"))
      .groupBy(idCol)
      .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
      .select(col(idCol), col("m.l").as("cluster"),
        (-col("m.nc")).as("cosine"))

  /**
   * Simplified silhouette (centroid-based, Hruschka 2004) — the
   * clustering-quality audit that classic silhouette's O(n²) pairwise
   * distances can't deliver at corpus scale: per vector,
   * `s = (b − a) / max(a, b)` with `a` the cosine distance to its OWN
   * (nearest) centroid and `b` the distance to the nearest OTHER
   * centroid. s → 1 well-placed, s ≈ 0 boundary, s < 0 likely belongs
   * to the other cluster — the per-example companion to
   * [[classSeparation]]'s per-label margins, and the standard "is k
   * right / which examples straddle clusters" screen after [[lloyd]].
   * Output: `(idCol, cluster, a, b, silhouette)`; `b` and `s` are NULL
   * with a single centroid.
   *
   * Scale shape: centroids broadcast; the candidate scores collapse
   * per vector into ONE sorted |centroids|-length struct array (a
   * bounded collect_list — |centroids| is k, not corpus), so the
   * shuffle carries one row per vector. Determinism: cosines round to
   * 6 dp with (cosine DESC, label ASC) struct ordering — the
   * [[assignToCentroids]] tie-break — and a/b/s are fixed-shape double
   * forms of those 6-dp values.
   */
  def simplifiedSilhouette(df: DataFrame, idCol: String, vecCol: String,
                           cents: DataFrame): DataFrame = {
    val scored = df.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .select(col(idCol),
        struct((-round(VF.cosine(col("__v"), col("centroid")), 6)).as("nc"),
          col("label").as("l")).as("__s"))
    val top2 = scored.groupBy(idCol)
      .agg(sort_array(collect_list(col("__s"))).as("__arr"))
      .select(col(idCol),
        // get() (not getItem) — a single-centroid call has no second
        // element and ANSI faults an out-of-bounds index
        get(col("__arr"), lit(0)).getField("l").as("cluster"),
        round(lit(1.0) + get(col("__arr"), lit(0)).getField("nc"), 6).as("a"),
        round(lit(1.0) + get(col("__arr"), lit(1)).getField("nc"), 6).as("b"))
    val mx = greatest(col("a"), col("b"))
    top2.withColumn("silhouette",
      when(col("b").isNull, lit(null).cast("double"))
        .when(mx === 0.0, lit(0.0))
        .otherwise(round((col("b") - col("a")) /
          when(mx === 0.0, lit(1.0)).otherwise(mx), 6)))
  }

  /** [[simplifiedSilhouette]] against the label-derived centroids —
    * audit how well the LABELING clusters the embedding space. */
  def labelSilhouette(df: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame =
    simplifiedSilhouette(df, idCol, vecCol,
      labelCentroids(df, vecCol, labelCol))

  /**
   * Distributed Lloyd iterations (spherical k-means): assign → re-mean →
   * repeat, entirely in-plan — the 100 TB-scale FIT path, complementing
   * [[Ann.ivfIndex]]'s bounded-sample driver fit. Each iteration is one
   * broadcast-nested-loop assignment (centroids are k rows) plus one
   * per-dimension mean (posexplode + decimal sum — shuffles (cluster,
   * dim) partial sums, never vectors); intermediate centroids
   * localCheckpoint (k rows) so the plan stays flat. Cosine is
   * scale-invariant, so the un-renormalized mean IS the spherical
   * update. Deterministic end-to-end: 6-dp-rounded cosines with
   * label-ordered tie-breaks make every assignment — and therefore
   * every centroid — engine-exact, which is how an iterative
   * distributed fit can hash-match an unrolled SQL oracle.
   *
   * `seeds` is the `(label, centroid)` init (pick data vectors for
   * stability). A cluster that loses all members drops out (standard
   * Lloyd degeneracy — re-seed if k must stay fixed). Returns the
   * final `(idCol, cluster, cosine)` assignment.
   */
  def lloyd(df: DataFrame, idCol: String, vecCol: String,
            seeds: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    var cents = seeds
    var asg = assignToCentroids(df, idCol, vecCol, cents)
    for (_ <- 2 to iterations) {
      cents = labelCentroids(
        df.join(asg.select(col(idCol), col("cluster").as("label")), idCol),
        vecCol, "label").truncateLineage(true)
      asg = assignToCentroids(df, idCol, vecCol, cents)
      graft.plans.IterationAudit.record("centroids.lloyd", asg)
    }
    asg
  }

  /** The k vectors FARTHEST from their label centroid, per label —
    * `(label, rank, idCol, cosine)`, rank 1 = most suspicious. */
  def outliers(df: DataFrame, idCol: String, vecCol: String,
               labelCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("label")
      .orderBy(col("cosine").asc, col(idCol).asc)
    cosineToCentroid(df, idCol, vecCol, labelCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col(idCol), col("cosine"))
  }
}
