package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * RFM (recency / frequency / monetary) customer segmentation over a
 * transaction stream — the classic CRM scoring: how recently did each
 * customer buy, how often, and for how much, each mapped to a 1..B
 * bucket score (B = 5 quintiles by default, 5 = best) and concatenated
 * into a segment label ("555" = champions, "111" = lost).
 *
 * Scoring convention: bucket = ⌈rank_fraction · B⌉ over the EMPIRICAL
 * CDF of the metric (ascending), so every customer sharing a metric
 * value lands in the same bucket — tie-stable, engine-independent, and
 * identical to NTILE when values are distinct and N divides B. This is
 * deliberately NOT NTILE: NTILE splits ties across buckets by an
 * arbitrary ordering, which would force a per-customer tie-break
 * column into the oracle contract and make equal customers unequal.
 *
 * Scale shape: ONE map-side-combined corpus pass reduces transactions
 * to per-customer (last day, count, amount) rows; scoring then runs on
 * per-(metric, value) COUNTS — the [[Profile.quantiles]] compression —
 * so the only ordered windows see distinct metric values, not
 * customers, and the score maps join back by value. At a truly
 * continuous amount domain (distinct ≈ customers) the window degrades
 * to customer-sized; at that scale derive bucket BOUNDARIES from
 * [[Profile.quantileSketch]] instead — same trade the quantiles
 * operator documents.
 *
 * Determinism: counts and day arithmetic are exact; the monetary total
 * accumulates as DECIMAL(18,2) and publishes as a 2-dp double; the
 * bucket rank product snaps to 9 dp before ⌈·⌉ (the
 * [[Profile.quantiles]] guard against IEEE p·n landing a hair above
 * the exact product).
 */
object Rfm {

  /**
   * Score each customer. `tsCol` is any timestamp/date column
   * (recency = whole days from the customer's last transaction day to
   * the corpus-wide last day), `amountCol` a numeric spend. Output one
   * row per customer: `(customer, recency_days, frequency, monetary,
   * r, f, m, segment)`.
   */
  def scores(df: DataFrame, custCol: String, tsCol: String,
             amountCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2 && buckets <= 10,
      s"buckets must be in [2, 10], got $buckets")
    val perCust = df
      .where(col(tsCol).isNotNull)
      .groupBy(col(custCol).as("customer"))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).as("__amt"))
    val ref = perCust.agg(max(col("__last")).as("__ref"))
    val metrics = perCust.crossJoin(broadcast(ref))
      .select(col("customer"),
        datediff(col("__ref"), col("__last")).cast("long")
          .as("recency_days"),
        col("frequency"),
        // all-NULL amounts → 0.00, not NULL (a NULL metric would drop
        // the customer at the score-map equi-join)
        round(coalesce(col("__amt"), lit(0).cast("decimal(18,2)"))
          .cast("double"), 2).as("monetary"))

    // bucket = ceil(round(cum/N · B, 9)) over per-value counts;
    // ascending metric → bucket B = highest values
    def bucketMap(valueCol: String): DataFrame = {
      // bounded-window: integer-cells — 2-dp monetary / integer day+count cells, range-bounded
      val wCum = Window.orderBy(col("__v").asc)
      val wAll = Window.partitionBy()
      metrics.groupBy(col(valueCol).cast("double").as("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(wCum))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .select(col("__v"),
          ceil(round(col("__cum").cast("double") /
              col("__n").cast("double") * lit(buckets.toDouble), 9))
            .cast("int").as("__b"))
    }
    // recency: smaller = better → invert; frequency/monetary: larger =
    // better → the ascending bucket is already the score
    val rMap = bucketMap("recency_days")
      .select(col("__v").as("__rv"), (lit(buckets + 1) - col("__b")).as("r"))
    val fMap = bucketMap("frequency")
      .select(col("__v").as("__fv"), col("__b").as("f"))
    val mMap = bucketMap("monetary")
      .select(col("__v").as("__mv"), col("__b").as("m"))
    metrics
      .join(rMap, col("recency_days").cast("double") === col("__rv"))
      .join(fMap, col("frequency").cast("double") === col("__fv"))
      .join(mMap, col("monetary").cast("double") === col("__mv"))
      .select(col("customer"), col("recency_days"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
  }

  /**
   * Segment rollup: customers and spend share per RFM segment label —
   * the marketing-facing summary. `(segment, customers, monetary_sum,
   * monetary_share)`, share at 6 dp of the corpus total.
   */
  def segmentSummary(df: DataFrame, custCol: String, tsCol: String,
                     amountCol: String, buckets: Int = 5): DataFrame = {
    // bounded-window: fixed-fanout — share-of-total over the <=buckets^3 segment rollup
    val wAll = Window.partitionBy()
    scores(df, custCol, tsCol, amountCol, buckets)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("customers"),
        sum(col("monetary").cast("decimal(18,2)")).as("__s"))
      .withColumn("__tot", sum(col("__s")).over(wAll))
      .select(col("segment"), col("customers"),
        round(col("__s").cast("double"), 2).as("monetary_sum"),
        when(col("__tot").cast("double") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("__s").cast("double") /
            col("__tot").cast("double"), 6)).as("monetary_share"))
  }
}
