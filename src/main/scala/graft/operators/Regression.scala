package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Grouped simple linear regression — the per-segment elasticity /
 * sensitivity readout ("how does quantity respond to discount, per
 * return-flag?") that turns a correlation audit ([[Profile]]'s Pearson)
 * into usable slope + intercept + fit quality.
 *
 * Scale shape: ONE map-side-combined pass reduces the corpus to
 * per-group OLS moments (n, Σx, Σy, Σxy, Σx², Σy²); the closed-form
 * solve is per-group scalar arithmetic on the reduced frame. No joins,
 * no windows, stream-legal as a snapshot aggregate.
 *
 * Determinism: inputs snap to 9 dp, moment sums accumulate as DECIMAL
 * (order-free), every derived double op is fixed-shape at 9 dp,
 * published at 6 dp.
 */
object Regression {

  private def sdiv(a: Column, b: Column): Column =
    a / when(b === 0.0, lit(1.0)).otherwise(b)

  /**
   * Per-group OLS of y on x. Output one row per group:
   * `(key, n, slope, intercept, r2)` where `slope = Sxy/Sxx`,
   * `intercept = ȳ − slope·x̄`, `r2 = Sxy²/(Sxx·Syy)` with
   * `Sxy = n·Σxy − Σx·Σy` etc. Rows where either variable is NULL drop
   * from their group; `slope`/`intercept` are NULL when n < 2 or x is
   * constant (Sxx = 0); `r2` additionally NULL when y is constant
   * (Syy = 0 — fit is exact but undefined as a variance ratio).
   */
  def olsByGroup(df: DataFrame, keyCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = round(col(xCol).cast("double"), 9)
    val y = round(col(yCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    val m = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(dec)).as("__sx"),
        sum(y.cast(dec)).as("__sy"),
        sum(round(x * y, 9).cast(dec)).as("__sxy"),
        sum(round(x * x, 9).cast(dec)).as("__sxx"),
        sum(round(y * y, 9).cast(dec)).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    // means first, then central moments — keeps magnitudes small so the
    // 9-dp snaps bite at the same digits in both engines
    val mx = round(sdiv(d("__sx"), n), 9)
    val my = round(sdiv(d("__sy"), n), 9)
    val sxy = round(round(sdiv(d("__sxy"), n), 9) - round(mx * my, 9), 9)
    val sxx = round(round(sdiv(d("__sxx"), n), 9) - round(mx * mx, 9), 9)
    val syy = round(round(sdiv(d("__syy"), n), 9) - round(my * my, 9), 9)
    val slope = round(sdiv(sxy, sxx), 9)
    val undef = col("n") < 2 || sxx === 0.0
    // publishes are exact 9-dp decimals -> 6-dp half-ties (~1/1000 per
    // cell) need the exact-decimal snap, not double rounding
    def pub6(c: Column) = round(c.cast(dec), 6).cast("double")
    m.select(col("key"), col("n"),
      when(undef, lit(null).cast("double"))
        .otherwise(pub6(slope)).as("slope"),
      when(undef, lit(null).cast("double"))
        .otherwise(pub6(round(my - round(slope * mx, 9), 9)))
        .as("intercept"),
      when(undef || syy === 0.0, lit(null).cast("double"))
        .otherwise(pub6(round(sdiv(round(sxy * sxy, 9),
          round(sxx * syy, 9)), 9))).as("r2"))
  }
}
