package graft.functions

import graft.SparkTestBase
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkTestBase {

  private def vecs(rows: (Seq[Double], Seq[Double])*) =
    df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", rows.map(r => Row(r._1, r._2)))

  test("dot product and L2 norm") {
    val out = vecs((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .select(VF.dot(col("a"), col("b")), VF.l2Norm(col("a")))
    val r = out.head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine: parallel=1, orthogonal=0, zero-norm=0") {
    val out = vecs(
      (Seq(1.0, 0.0), Seq(2.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 5.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)))
      .select(VF.cosine(col("a"), col("b")))
    assert(out.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("l2 distance") {
    val out = vecs((Seq(1.0, 2.0), Seq(4.0, 6.0))).select(VF.l2Distance(col("a"), col("b")))
    assert(out.head().getDouble(0) == 5.0)
  }

  test("native dot/cosine/l2 are bit-identical to the interpreted HOF formulations") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0, 4.0), Seq(-4.0, 3.5, 0.0, 1.25)),
      (Seq(0.3, -0.7, 0.9, 1e-9), Seq(1e9, 2.0, -3.3, 0.5)),
      (Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0)),
      (Seq(1.0 / 3.0, 2.0 / 7.0, -5.0 / 11.0, 0.1), Seq(0.1, 0.2, 0.3, 0.4)))
    val out = vecs(rows: _*).select(
      VF.dot(col("a"), col("b")), VF.dotHof(col("a"), col("b")),
      VF.cosine(col("a"), col("b")), VF.cosineHof(col("a"), col("b")),
      VF.l2Distance(col("a"), col("b")), VF.l2DistanceHof(col("a"), col("b")))
    out.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
      assert(r.getDouble(4) == r.getDouble(5), "l2 mismatch")
    }
  }

  test("length-mismatched vectors: native returns NULL exactly like the HOF forms") {
    val out = vecs((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .select(VF.dot(col("a"), col("b")), VF.dotHof(col("a"), col("b")),
        VF.cosine(col("a"), col("b")),
        VF.l2Distance(col("a"), col("b")), VF.l2DistanceHof(col("a"), col("b")))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1), "dot must be NULL on drifted dims")
    assert(out.isNullAt(2), "cosine must be NULL on drifted dims")
    assert(out.isNullAt(3) && out.isNullAt(4), "l2 must be NULL on drifted dims")
  }

  test("band keys: shape, range, scale-invariance, and locality") {
    val d = df("v ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0, -3.0, 4.0)),
      Row(Seq(2.0, 4.0, -6.0, 8.0)),        // ×2: identical signs → same keys
      Row(Seq(-1.0, -2.0, 3.0, -4.0))))     // antipodal
    val keys = d.select(VF.bandKeys(col("v"), bands = 8, bandBits = 16))
      .collect().map(_.getSeq[Long](0))
    assert(keys.forall(_.length == 8))
    assert(keys.forall(_.forall(k => k >= 0 && k < (1L << 16))))
    assert(keys(0) == keys(1))              // positive scaling preserves all signs
    assert(keys(0).zip(keys(2)).count { case (a, b) => a == b } <= 2)
  }

  test("hyperplane signature is deterministic and respects cosine locality") {
    val d = df("v ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0, 3.0, 4.0)),
      Row(Seq(1.0, 2.0, 3.0, 4.0)),          // identical
      Row(Seq(1.01, 2.0, 3.0, 4.0)),         // near-identical
      Row(Seq(-1.0, -2.0, -3.0, -4.0))))     // antipodal
    val sigs = d.select(VF.hyperplaneSignature(col("v"), nBits = 32))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    // In 4 dims many ±1 hyperplanes have dot ≈ 0, so a small perturbation
    // may flip those borderline bits — bound loosely, not tightly.
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(2)) <= 10)
    // Antipodal flips every plane whose dot is nonzero (dot==0 planes give
    // bit 0 on both sides) — far from the near-identical hamming above.
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(3)) >= 20)
  }
}
