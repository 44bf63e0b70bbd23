package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class ExperimentSpec extends SparkTestBase {

  private def trials(rows: (String, Boolean)*) =
    df("v STRING, ok BOOLEAN", rows.map { case (v, ok) => Row(v, ok) })

  test("proportionZ: pooled z hand value, NULL success = failure, degenerate guards") {
    // A: 4/10, B: 2/8 -> pooled 6/18
    val d = trials(
      (Seq.fill(4)("A" -> true) ++ Seq.fill(6)("A" -> false) ++
        Seq.fill(2)("B" -> true) ++ Seq.fill(6)("B" -> false)): _*)
    val r = Experiment.proportionZ(d, "v", "ok", "A", "B").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L)
    assert(r.getAs[Double]("conv_a") == 0.4)
    assert(r.getAs[Double]("conv_b") == 0.25)
    assert(r.getAs[Double]("lift") == 0.15)
    val ph = 6.0 / 18.0
    val z = (0.4 - 0.25) / math.sqrt((ph * (1.0 - ph)) * (1.0 / 10 + 1.0 / 8))
    assert(r.getAs[Double]("z") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // NULL success counts as failure
    val withNull = df("v STRING, ok BOOLEAN",
      Seq(Row("A", true), Row("A", null), Row("B", true), Row("B", false)))
    val rn = Experiment.proportionZ(withNull, "v", "ok", "A", "B").head()
    assert(rn.getAs[Double]("conv_a") == 0.5)
    // degenerate pool (all success) -> z NULL, rates still reported
    val all = trials("A" -> true, "B" -> true)
    val ra = Experiment.proportionZ(all, "v", "ok", "A", "B").head()
    assert(ra.getAs[Double]("conv_a") == 1.0 && ra.isNullAt(5))
    // empty arm -> NULL everywhere that needs it
    val one = trials("A" -> true)
    val ro = Experiment.proportionZ(one, "v", "ok", "A", "B").head()
    assert(ro.getLong(1) == 0L && ro.isNullAt(3) && ro.isNullAt(4) && ro.isNullAt(5))
  }

  test("welchT: exact-binary hand case, NULL outcomes drop, tiny-arm guard") {
    // A = (1, 3): m=2, v=2; B = (2, 6): m=4, v=8
    // t = -2/sqrt(1+4) = -0.894427; df = 25/17 = 1.470588
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 2.0), Row("B", 6.0)))
    val r = Experiment.welchT(d, "v", "x", "A", "B").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("t") ==
      BigDecimal(-2.0 / math.sqrt(5.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("df") ==
      BigDecimal(25.0 / 17.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // NULL outcome drops from its arm only
    val withNull = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("A", null),
      Row("B", 2.0), Row("B", 6.0)))
    assert(Experiment.welchT(withNull, "v", "x", "A", "B")
      .head().getLong(0) == 2L)
    // single-value arm -> t/df NULL, means survive
    val tiny = df("v STRING, x DOUBLE",
      Seq(Row("A", 1.0), Row("B", 2.0), Row("B", 6.0)))
    val rt = Experiment.welchT(tiny, "v", "x", "A", "B").head()
    assert(rt.getAs[Double]("mean_a") == 1.0 && rt.isNullAt(4) && rt.isNullAt(5))
    // both arms constant -> zero variance -> NULL t
    val const = df("v STRING, x DOUBLE",
      Seq(Row("A", 5.0), Row("A", 5.0), Row("B", 5.0), Row("B", 5.0)))
    assert(Experiment.welchT(const, "v", "x", "A", "B").head().isNullAt(4))
  }
}
