package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class CentroidsSpec extends SparkTestBase {

  private lazy val vecs = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
    Row(1L, "a", Seq(1.0, 0.0)),
    Row(2L, "a", Seq(0.0, 1.0)),
    Row(3L, "a", Seq(1.0, 1.0)),     // closest to centroid (0.5+1/3... )
    Row(4L, "b", Seq(-1.0, 0.0)),
    Row(5L, "b", Seq(-1.0, -0.02))))

  test("labelCentroids computes per-dimension means in order") {
    val cents = Centroids.labelCentroids(vecs, "v", "label")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(cents("a") == Seq(2.0 / 3, 2.0 / 3))
    assert(cents("b") == Seq(-1.0, -0.01))
  }

  test("outliers ranks the farthest-from-centroid vectors first") {
    // label a: centroid (2/3, 2/3); v3 is perfectly aligned (cos=1),
    // v1/v2 are symmetric at cos = 1/sqrt(2) — id tiebreak puts v1 first.
    val out = Centroids.outliers(vecs, "id", "v", "label", k = 2)
      .orderBy("label", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 4L), ("b", 2L, 5L)))
  }

  test("assignNearest assigns to the nearest centroid across labels") {
    // b's centroid is (-1, -0.01): v4/v5 stay with b, and a's members
    // all point into the positive quadrant so they stay with a — but a
    // vector near (-1, 0) added under label a must flip to cluster b.
    val flipped = vecs.union(df("id BIGINT, label STRING, v ARRAY<DOUBLE>",
      Seq(Row(6L, "a", Seq(-5.0, -0.05)))))
    val assigned = Centroids.assignNearest(flipped, "id", "v", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assigned(6L) == "b")
    assert(Seq(4L, 5L).forall(assigned(_) == "b"))
  }

  test("assignNearest tie-breaks to the smallest label") {
    // two identical centroids (one vector each) → every cosine ties
    val twol = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "b", Seq(1.0, 0.0)), Row(2L, "a", Seq(1.0, 0.0))))
    val assigned = Centroids.assignNearest(twol, "id", "v", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assigned == Map(1L -> "a", 2L -> "a"))
  }

  test("a vector equal to the centroid scores cosine 1.0") {
    val one = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "x", Seq(3.0, 4.0))))
    val c = Centroids.cosineToCentroid(one, "id", "v", "label").collect()
    assert(c(0).getDouble(2) == 1.0)
  }

  test("lloyd recovers two angular clusters from bad seeds and never degrades fit") {
    // two tight angular groups; seeds deliberately taken from ONE group
    val pts = df("id BIGINT, v ARRAY<DOUBLE>", Seq(
      Row(1L, Seq(1.0, 0.01)), Row(2L, Seq(1.0, -0.01)), Row(3L, Seq(0.99, 0.02)),
      Row(4L, Seq(0.01, 1.0)), Row(5L, Seq(-0.01, 1.0)), Row(6L, Seq(0.02, 0.99))))
    val seeds = df("label BIGINT, centroid ARRAY<DOUBLE>", Seq(
      Row(0L, Seq(1.0, 0.01)), Row(1L, Seq(0.01, 1.0))))
    def meanCos(iters: Int): Double =
      Centroids.lloyd(pts, "id", "v", seeds, iters)
        .agg(org.apache.spark.sql.functions.avg("cosine")).head().getDouble(0)
    val asg = Centroids.lloyd(pts, "id", "v", seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(asg(1), asg(2), asg(3)).size == 1)
    assert(Set(asg(4), asg(5), asg(6)).size == 1)
    assert(asg(1) != asg(4)) // the two groups separate
    assert(meanCos(3) >= meanCos(1) - 1e-9) // Lloyd monotonicity (rounded)
  }

  test("meanPoolNormalized: unit-norm mean per parent; zero vectors stay zeros") {
    val chunks = df("parent BIGINT, v ARRAY<DOUBLE>", Seq(
      Row(1L, Seq(1.0, 0.0)), Row(1L, Seq(0.0, 1.0)), // mean (.5,.5) → unit diag
      Row(2L, Seq(3.0, 4.0)),                         // singleton → (0.6, 0.8)
      Row(3L, Seq(0.0, 0.0)), Row(3L, Seq(0.0, 0.0)))) // zero mean stays zeros
    val out = Centroids.meanPoolNormalized(chunks, "parent", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val s = math.sqrt(0.5)
    assert(out(1).zip(Seq(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(out(2).zip(Seq(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(out(3) == Seq(0.0, 0.0))
  }

  test("classSeparation: cohesion, nearest rival, and margin sign") {
    // three tight clusters on distinct axes + one label overlapping 'a'
    val d = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "a", Seq(1.0, 0.0, 0.0)), Row(2L, "a", Seq(0.9, 0.1, 0.0)),
      Row(3L, "b", Seq(0.0, 1.0, 0.0)), Row(4L, "b", Seq(0.0, 0.9, 0.1)),
      Row(5L, "c", Seq(0.95, 0.05, 0.0)), // sits inside cluster a
      Row(6L, "d", Seq(0.0, 0.0, 1.0))))
    val out = Centroids.classSeparation(d, "id", "v", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    // a's nearest rival is the overlapping c, and the margin is small/neg
    assert(out("a").getAs[String]("nearest_label") == "c")
    assert(out("a").getAs[Double]("nearest_centroid_cosine") > 0.99)
    assert(out("a").getAs[Double]("margin") < 0.01)
    // d is orthogonal to everything: high cohesion, low confusion
    assert(out("d").getAs[Double]("mean_self_cosine") == 1.0)
    assert(out("d").getAs[Double]("nearest_centroid_cosine") < 0.2)
    assert(out("d").getAs[Double]("margin") > 0.8)
    assert(out("b").getAs[Long]("n") == 2L)
  }

  test("classSeparation: single label has NULL rival columns") {
    val d = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "only", Seq(1.0, 0.0)), Row(2L, "only", Seq(0.8, 0.2))))
    val r = Centroids.classSeparation(d, "id", "v", "label").collect()(0)
    assert(r.isNullAt(r.fieldIndex("nearest_label")))
    assert(r.isNullAt(r.fieldIndex("margin")))
  }

  test("kCenterGreedy: farthest-first on known geometry, radius non-increasing") {
    // id 1 = +x (seed: smallest id). Farthest by cosine distance is -x
    // (id 3, dist 2); then +y (id 2, dist 1 to both); near-duplicate of
    // the seed (id 4) is picked LAST — diversity before redundancy.
    val d = df("id BIGINT, v ARRAY<DOUBLE>", Seq(
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)),
      Row(3L, Seq(-1.0, 0.0)), Row(4L, Seq(0.999, 0.001))))
    val out = Centroids.kCenterGreedy(d, "id", "v", k = 4)
      .orderBy("center_order").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) == 2.0) // antipodal: 1 - (-1)
    assert(out(2).getDouble(2) == 1.0) // orthogonal
    val radii = out.drop(1).map(_.getDouble(2))
    assert(radii.sameElements(radii.sorted.reverse)) // covering radius shrinks
    assert(radii.last < 0.001)                       // near-dup adds ~nothing
  }

  test("labelSilhouette: well-placed, bounded range, and single-label cases") {
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "u", Seq(1.0, 0.0)),
      Row(2L, "u", Seq(1.0, 0.0)),
      Row(3L, "w", Seq(0.0, 1.0)),
      Row(4L, "w", Seq(0.7071067811865475, 0.7071067811865475))))
    val out = Centroids.labelSilhouette(d, "id", "v", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toMap
    // vec 1/2 sit ON the u centroid: a = 0, s = 1
    assert(out(1L)._1 == "u" && out(1L)._2 == 0.0 && out(1L)._4 == 1.0)
    assert(out(2L)._4 == 1.0)
    // every silhouette is in [-1, 1] and cluster is one of the labels
    assert(out.values.forall(t => t._4 >= -1.0 && t._4 <= 1.0))
    assert(out.values.forall(t => Set("u", "w").contains(t._1)))
    // single label -> no second centroid -> NULL b and s
    val single = df("id BIGINT, label STRING, v ARRAY<DOUBLE>", Seq(
      Row(1L, "u", Seq(1.0, 0.0)), Row(2L, "u", Seq(0.0, 1.0))))
    val r = Centroids.labelSilhouette(single, "id", "v", "label").head()
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("simplifiedSilhouette: exact tie between centroids gives s = 0") {
    import org.apache.spark.sql.Row
    val vecs = df("id BIGINT, v ARRAY<DOUBLE>",
      Seq(Row(9L, Seq(0.7071067811865475, 0.7071067811865475))))
    val cents = df("label STRING, centroid ARRAY<DOUBLE>",
      Seq(Row("p", Seq(1.0, 0.0)), Row("q", Seq(0.0, 1.0))))
    val r = Centroids.simplifiedSilhouette(vecs, "id", "v", cents).head()
    // cos to both = 0.707107 -> tie to smaller label, a = b, s = 0
    assert(r.getString(1) == "p")
    assert(r.getDouble(2) == r.getDouble(3))
    assert(r.getDouble(4) == 0.0)
  }
}
