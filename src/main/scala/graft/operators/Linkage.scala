package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage, Fellegi–Sunter model (JASA 1969): each
 * candidate pair gets a log-likelihood-ratio score summed over field
 * comparisons — a field agreeing contributes log2(m/u), disagreeing
 * log2((1-m)/(1-u)), where m = P(agree | same entity) and
 * u = P(agree | different entities). Pairs above a threshold are links.
 *
 * This is the standard pre-neural entity-resolution scorer (Splink,
 * JedAI, Dedupe all implement it); it complements [[Dedup]]'s textual
 * near-dup family with STRUCTURED-record matching — customer files,
 * author lists, product catalogs — where similarity lives in field
 * agreement patterns, not token overlap.
 *
 * Candidate generation is explicit blocking: pairs are only formed
 * within equal block-key values (an equi-join — the single shuffle).
 * All-pairs comparison is never materialized; at 100 TB the block key
 * IS the scalability contract, same discipline as [[Dedup]]'s bands.
 * Field expressions are evaluated ONCE PER ROW in a pre-projection
 * (inside each side's scan), so the pair stage compares precomputed
 * values — b·k comparisons never re-run substr/normalization work.
 *
 * Determinism: the per-pair score is a fixed-order sum of literal
 * doubles (one CASE per field, left to right), so it is bit-identical
 * across engines given the same weight literals; no cross-row float
 * aggregation occurs. Scores are rounded to 6 dp on output.
 */
object Linkage {

  /** One field comparison: a SQL expression per side (over that side's
    * bare columns) plus the (m, u) probabilities. */
  final case class FieldSpec(exprA: String, exprB: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    def disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Pre-projection of one side: id, block key, and each field
    * expression as `__f<i>` — evaluated inside the side's own scan. */
  private def project(df: DataFrame, idCol: String, blockCol: String,
                      exprs: Seq[String]): DataFrame =
    df.select(col(idCol).as("__id") +: col(blockCol).as("__blk") +:
      exprs.zipWithIndex.map { case (e, i) => expr(e).as(s"__f$i") }: _*)

  /** The blocked pair stream with both sides' precomputed fields. */
  private def blockedPairs(left: DataFrame, right: DataFrame,
                           leftId: String, rightId: String,
                           leftBlock: String, rightBlock: String,
                           fields: Seq[FieldSpec],
                           selfPairs: Boolean): DataFrame = {
    require(fields.nonEmpty, "at least one field comparison")
    val a = project(left, leftId, leftBlock, fields.map(_.exprA)).alias("a")
    val b = project(right, rightId, rightBlock, fields.map(_.exprB)).alias("b")
    val guard = if (selfPairs) col("a.__id") < col("b.__id") else lit(true)
    a.join(b, col("a.__blk") === col("b.__blk") && guard)
  }

  private def agreeFlags(fields: Seq[FieldSpec]): Seq[Column] =
    fields.indices.map(i => col(s"a.__f$i") === col(s"b.__f$i"))

  /**
   * Scored candidate pairs of `left` × `right` within equal block keys:
   * `(id_a, id_b, n_agree, score)`, `score` the Fellegi–Sunter
   * log2-likelihood-ratio sum rounded to 6 dp. Self-linkage (dedup of
   * one table): pass the same frame twice with `selfPairs = true` and
   * the `id_a < id_b` guard keeps each unordered pair once.
   */
  def linkageScores(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String,
                    leftBlock: String, rightBlock: String,
                    fields: Seq[FieldSpec],
                    selfPairs: Boolean = false): DataFrame = {
    val flags = agreeFlags(fields)
    // fixed-order literal sum: CASE₁ + CASE₂ + … — engine-portable
    val score = fields.zip(flags).map { case (f, ok) =>
      when(ok, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    val nAgree = flags.map(ok => when(ok, 1).otherwise(0): Column).reduce(_ + _)
    blockedPairs(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        nAgree.cast("int").as("n_agree"),
        round(score, 6).as("score"))
  }

  /** Links only: scored pairs at or above `threshold`. The filter sits
    * directly on the join output, so Catalyst evaluates it inside the
    * join stage — sub-threshold pairs never leave the executor. */
  def linkageMatches(left: DataFrame, right: DataFrame,
                     leftId: String, rightId: String,
                     leftBlock: String, rightBlock: String,
                     fields: Seq[FieldSpec], threshold: Double,
                     selfPairs: Boolean = false): DataFrame =
    linkageScores(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs)
      .filter(col("score") >= threshold)

  /**
   * Weight-estimation surface — the empirical agreement rate of each
   * field over the blocked candidate pairs. Practitioners seed `u`
   * from this rate (candidate pairs are overwhelmingly non-matches)
   * and `m` near 1, then iterate (the EM step of Fellegi–Sunter).
   * One row per field index: `(field, n_pairs, n_agree, agree_rate)`.
   *
   * One join; the per-field flags unpivot via posexplode so the pair
   * stream is scanned once, not once per field.
   */
  def fieldAgreementRates(left: DataFrame, right: DataFrame,
                          leftId: String, rightId: String,
                          leftBlock: String, rightBlock: String,
                          fields: Seq[FieldSpec],
                          selfPairs: Boolean = false): DataFrame = {
    val flags = array(agreeFlags(fields).map(_.cast("int")): _*)
    blockedPairs(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs)
      .select(posexplode(flags).as(Seq("field", "agree")))
      .groupBy("field")
      .agg(count(lit(1)).as("n_pairs"), sum("agree").as("n_agree"))
      .withColumn("agree_rate",
        round(col("n_agree").cast("double") / col("n_pairs"), 6))
  }

  /**
   * Survivorship merge ("golden record"): collapse each linkage/dedup
   * cluster to ONE canonical row by per-field rules — the step after
   * [[linkageMatches]] (or [[Dedup.connectedComponents]]) that actually
   * produces the deduplicated master table. Rules, all deterministic:
   *
   *  - `longest`: longest non-null value wins; length ties break to the
   *    lexicographically GREATEST value (a pure struct-max, no window).
   *  - `mostFrequent`: the modal non-null value; count ties break to
   *    the SMALLEST value (matching the label-vote convention of
   *    [[Graph.labelPropagation]]).
   *  - `latest`: the value carried by the row with the greatest order
   *    column (version/timestamp); order ties break to the greatest
   *    value.
   *
   * Output: `(cluster, n_members, <field columns>)`, one row per
   * cluster; a field whose cluster values are all NULL stays NULL.
   *
   * Scale shape: longest/latest fold into ONE corpus aggregate
   * (struct-max per field — a single cluster-keyed shuffle); each
   * mostFrequent field adds one (cluster, value)-keyed count + a
   * per-cluster window over |distinct values| rows, joined back on the
   * |clusters|-sized result. No corpus self-joins, no collects.
   */
  def goldenRecord(df: DataFrame, clusterCol: String,
                   longest: Seq[String] = Nil,
                   mostFrequent: Seq[String] = Nil,
                   latest: Seq[(String, String)] = Nil): DataFrame = {
    val structMaxes =
      longest.map { c =>
        max(when(col(c).isNotNull,
          struct(length(col(c)).as("l"), col(c).as("v"))))
          .getField("v").as(c)
      } ++
      latest.map { case (c, ord) =>
        max(when(col(c).isNotNull,
          struct(col(ord).as("o"), col(c).as("v"))))
          .getField("v").as(c)
      }
    val base = df.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).as("n_members"), structMaxes: _*)
    mostFrequent.foldLeft(base) { (acc, c) =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(clusterCol).as("cluster"), col(c))
        .agg(count(lit(1)).as("__n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("__n").desc, col(c).asc)
      val mode = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("cluster"), col(c))
      acc.join(mode, Seq("cluster"), "left")
    }
  }
}
