package graft.operators

import org.apache.spark.sql.Row
import graft.SparkTestBase

class PcaSpec extends SparkTestBase {

  private def vecs(rows: Seq[Seq[Double]]) =
    df("v ARRAY<DOUBLE>", rows.map(r => Row(r)))

  test("covariance: hand-computed 2-D population covariance, upper triangle only") {
    val c = Pca.covariance(vecs(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0),
        Seq(5.0, 6.0))), "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // x=[1,3,5], y=[2,4,6]: var_x = var_y = cov_xy = 8/3
    assert(c.keySet == Set((1, 1), (1, 2), (2, 2)))
    assert(c.values.forall { case (n, cv) => n == 3L && cv == 2.666667 })
  }

  test("covariance: constant dimension has zero variance (and no -0.0)") {
    val c = Pca.covariance(vecs(Seq(Seq(5.0, 1.0), Seq(5.0, 2.0))), "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(c((1, 1)) == 0.0 && c((1, 2)) == 0.0)
    assert(1.0 / c((1, 1)) > 0, "-0.0 must be normalized to +0.0")
    assert(c((2, 2)) == 0.25)
  }

  test("topComponent: variance concentrated on one axis recovers that axis") {
    val out = Pca.topComponent(vecs(Seq(Seq(-3.0, 0.0), Seq(0.0, 0.0),
        Seq(3.0, 0.0))), "v", iterations = 3)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // cov = [[6,0],[0,0]] → loading (1, 0), eigenvalue 6
    assert(out(1) == ((1.0, 6.0)))
    assert(out(2)._1 == 0.0)
  }

  test("removeComponent: projection onto the axis is subtracted exactly") {
    val d = df("id INT, v ARRAY<DOUBLE>",
      Seq(Row(1, Seq(3.0, 4.0)), Row(2, Seq(-2.0, 5.0))))
    val out = Pca.removeComponent(d, "id", "v", Seq(1.0, 0.0))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(1) == Seq(0.0, 4.0))
    assert(out(2) == Seq(0.0, 5.0))
  }

  test("removeComponent: result is orthogonal to the removed unit direction") {
    val c = Seq(0.6, 0.8)
    val d = df("id INT, v ARRAY<DOUBLE>", Seq(Row(1, Seq(2.0, 7.0))))
    val out = Pca.removeComponent(d, "id", "v", c)
      .collect()(0).getSeq[Double](1)
    val dot = out.zip(c).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-5)
  }

  test("standardize: z-scores per dimension; dead dimension floors to 0 via eps") {
    val d = df("id INT, v ARRAY<DOUBLE>",
      Seq(Row(1, Seq(1.0, 10.0)), Row(2, Seq(3.0, 10.0))))
    val out = Pca.standardize(d, "id", "v")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // dim1: mu=2, sigma=1 → -1/+1; dim2 constant → (10-10)/eps = 0
    assert(out(1) == Seq(-1.0, 0.0))
    assert(out(2) == Seq(1.0, 0.0))
    assert(out.values.forall(v => 1.0 / v(1) > 0), "no -0.0 leaks")
  }

  test("topComponent: null vectors are ignored; eigenvalue constant across rows") {
    val d = df("v ARRAY<DOUBLE>", Seq(Row(Seq(1.0, 1.0)), Row(null),
      Row(Seq(-1.0, -1.0))))
    val out = Pca.topComponent(d, "v", iterations = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getDouble(2)).distinct.length == 1)
    // both dims load equally on the diagonal component
    val loads = out.map(r => math.abs(r.getDouble(1))).distinct
    assert(loads.length == 1)
  }
}
