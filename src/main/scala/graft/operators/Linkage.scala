package graft.operators

import graft.plans.Checkpoints.LineageOps
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

  /** The blocked pair stream with both sides' precomputed fields.
    *
    * `maxBlockSize` is the skew guard (the [[Dedup]] `maxShingleFreq`
    * discipline applied to blocks): pair volume is Σ_b |A_b|·|B_b|, so a
    * single low-cardinality or NULL-heavy block key value goes quadratic
    * unannounced. With the cap set, any block whose size EXCEEDS the cap
    * on either side is dropped from BOTH sides before the join — the hot
    * set is small by construction (few keys can exceed the cap), so AQE
    * broadcasts the anti-join; the under-cap complement never touches
    * the driver. Dropped blocks are exactly the ones a practitioner must
    * re-block on a finer key anyway ([[blockAudit]] names them). */
  private def blockedPairs(left: DataFrame, right: DataFrame,
                           leftId: String, rightId: String,
                           leftBlock: String, rightBlock: String,
                           fields: Seq[FieldSpec],
                           selfPairs: Boolean,
                           maxBlockSize: Option[Long]): DataFrame = {
    require(fields.nonEmpty, "at least one field comparison")
    val a0 = project(left, leftId, leftBlock, fields.map(_.exprA))
    val b0 = project(right, rightId, rightBlock, fields.map(_.exprB))
    def hotBlocks(side: DataFrame, cap: Long) =
      side.groupBy("__blk").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > cap).select("__blk")
    val (a1, b1) = maxBlockSize match {
      case Some(cap) =>
        require(cap >= 1, s"maxBlockSize must be >= 1, got $cap")
        val hot =
          if (selfPairs) hotBlocks(a0, cap)
          else hotBlocks(a0, cap).union(hotBlocks(b0, cap)).distinct()
        (a0.join(hot, Seq("__blk"), "left_anti"),
          b0.join(hot, Seq("__blk"), "left_anti"))
      case None => (a0, b0)
    }
    val a = a1.alias("a")
    val b = b1.alias("b")
    val guard = if (selfPairs) col("a.__id") < col("b.__id") else lit(true)
    a.join(b, col("a.__blk") === col("b.__blk") && guard)
  }

  /**
   * Block-size audit — run this BEFORE committing a block key: one row
   * per block value with both sides' sizes and the pair volume it will
   * generate, largest first: `(block, n_left, n_right, n_pairs)`.
   * Σ n_pairs is the exact join output size ([[linkageScores]] cost);
   * a handful of rows carrying most of the total is the skew signature
   * that says re-block or set `maxBlockSize`. Self-linkage counts each
   * unordered pair once (n·(n−1)/2).
   *
   * Scale shape: two count-aggregates (map-side combined) on the block
   * key and an outer join of the two |distinct blocks|-sized results —
   * the corpus shuffles 8-byte counts, never rows; no pair is formed.
   */
  def blockAudit(left: DataFrame, right: DataFrame,
                 leftBlock: String, rightBlock: String,
                 selfPairs: Boolean = false): DataFrame = {
    val a = left.groupBy(col(leftBlock).as("block"))
      .agg(count(lit(1)).as("n_left"))
    val b = right.groupBy(col(rightBlock).as("block"))
      .agg(count(lit(1)).as("n_right"))
    val joined = a.join(b, Seq("block"), "full_outer")
      .select(col("block"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
    val pairs =
      if (selfPairs) col("n_left") * (col("n_left") - 1) / lit(2)
      else col("n_left") * col("n_right")
    joined.withColumn("n_pairs", pairs.cast("long"))
      .orderBy(col("n_pairs").desc, col("block").asc)
  }

  private def agreeFlags(fields: Seq[FieldSpec]): Seq[Column] =
    fields.indices.map(i => col(s"a.__f$i") === col(s"b.__f$i"))

  /**
   * Scored candidate pairs of `left` × `right` within equal block keys:
   * `(id_a, id_b, n_agree, score)`, `score` the Fellegi–Sunter
   * log2-likelihood-ratio sum rounded to 6 dp. Self-linkage (dedup of
   * one table): pass the same frame twice with `selfPairs = true` and
   * the `id_a < id_b` guard keeps each unordered pair once.
   * `maxBlockSize` drops over-cap blocks entirely (see [[blockAudit]]).
   *
   * STREAM-legal with a streaming `left` and static `right` when
   * `maxBlockSize` is None (the cap needs an aggregate over the
   * stream): the blocked join is stream-static inner and scoring is a
   * pure projection — zero state, no watermark. That is the
   * incremental entity-resolution shape (score each arriving record
   * against the master file), cross-checked row-for-row vs batch in
   * StreamingLinkageCrossCheckSpec.
   */
  def linkageScores(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String,
                    leftBlock: String, rightBlock: String,
                    fields: Seq[FieldSpec],
                    selfPairs: Boolean = false,
                    maxBlockSize: Option[Long] = None): DataFrame = {
    val flags = agreeFlags(fields)
    // fixed-order literal sum: CASE₁ + CASE₂ + … — engine-portable
    val score = fields.zip(flags).map { case (f, ok) =>
      when(ok, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    val nAgree = flags.map(ok => when(ok, 1).otherwise(0): Column).reduce(_ + _)
    blockedPairs(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs, maxBlockSize)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        nAgree.cast("int").as("n_agree"),
        round(score, 6).as("score"))
  }

  /**
   * Multi-pass blocking — the standard recall repair for single-key
   * blocking (Splink's `blocking_rules_to_generate_predictions`,
   * Christen 2012 ch.4): a true match that disagrees on THE one block
   * key is an unrecoverable false negative, so production linkage
   * unions several independent blocking passes (brand, zip+name-prefix,
   * phone, …) and dedups candidate pairs before scoring. Each pass is
   * one `(leftBlockExpr, rightBlockExpr)` SQL-expression pair evaluated
   * inside the side's scan; NULL block values never pair (equi-join
   * semantics), and `maxBlockSize` applies per pass.
   *
   * Scale shape: per pass one blocked equi-join (same contract as
   * [[linkageScores]]); the passes union and dedup on (id_a, id_b) —
   * ONE extra shuffle on 2 ids, carrying the precomputed field values
   * so no re-join against the corpora is needed. Pair-dedup happens
   * BEFORE scoring, so a pair found by k passes scores once. Output is
   * identical to [[linkageScores]]: `(id_a, id_b, n_agree, score)`.
   */
  def linkageScoresMulti(left: DataFrame, right: DataFrame,
                         leftId: String, rightId: String,
                         blocks: Seq[(String, String)],
                         fields: Seq[FieldSpec],
                         selfPairs: Boolean = false,
                         maxBlockSize: Option[Long] = None): DataFrame = {
    require(blocks.nonEmpty, "at least one blocking pass")
    val perPass = blocks.map { case (lb, rb) =>
      blockedPairs(left.withColumn("__mblk", expr(lb)),
          right.withColumn("__mblk", expr(rb)),
          leftId, rightId, "__mblk", "__mblk",
          fields, selfPairs, maxBlockSize)
        .select(col("a.__id").as("__ida") +: col("b.__id").as("__idb") +:
          fields.indices.flatMap(i => Seq(col(s"a.__f$i").as(s"__fa$i"),
            col(s"b.__f$i").as(s"__fb$i"))): _*)
    }.reduce(_ unionAll _)
    // pair-dedup BEFORE scoring: every duplicate row for a pair carries
    // the identical precomputed field values, so keep-any is exact
    val pairs = perPass.dropDuplicates("__ida", "__idb")
    val flags = fields.indices.map(i => col(s"__fa$i") === col(s"__fb$i"))
    val score = fields.zip(flags).map { case (f, ok) =>
      when(ok, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    val nAgree = flags.map(ok => when(ok, 1).otherwise(0): Column).reduce(_ + _)
    pairs.select(col("__ida").as("id_a"), col("__idb").as("id_b"),
      nAgree.cast("int").as("n_agree"), round(score, 6).as("score"))
  }

  /** Per-pass [[blockAudit]] for a multi-pass blocking plan: one row per
    * (pass, block) with the pair volume that pass will generate —
    * `(pass, block, n_left, n_right, n_pairs)`, largest blocks first
    * within each pass. Block values cast to string so heterogeneous
    * pass keys (brand vs size) union cleanly. */
  def blockAuditMulti(left: DataFrame, right: DataFrame,
                      blocks: Seq[(String, String)],
                      selfPairs: Boolean = false): DataFrame = {
    require(blocks.nonEmpty, "at least one blocking pass")
    blocks.zipWithIndex.map { case ((lb, rb), i) =>
      blockAudit(left.withColumn("__mblk", expr(lb).cast("string")),
          right.withColumn("__mblk", expr(rb).cast("string")),
          "__mblk", "__mblk", selfPairs)
        .withColumn("pass", lit(i))
    }.reduce(_ unionAll _)
      .select(col("pass"), col("block"), col("n_left"), col("n_right"),
        col("n_pairs"))
      .orderBy(col("pass").asc, col("n_pairs").desc, col("block").asc)
  }

  /** Links only: scored pairs at or above `threshold`. The filter sits
    * directly on the join output, so Catalyst evaluates it inside the
    * join stage — sub-threshold pairs never leave the executor. */
  def linkageMatches(left: DataFrame, right: DataFrame,
                     leftId: String, rightId: String,
                     leftBlock: String, rightBlock: String,
                     fields: Seq[FieldSpec], threshold: Double,
                     selfPairs: Boolean = false,
                     maxBlockSize: Option[Long] = None): DataFrame =
    linkageScores(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs, maxBlockSize)
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
                          selfPairs: Boolean = false,
                          maxBlockSize: Option[Long] = None): DataFrame = {
    val flags = array(agreeFlags(fields).map(_.cast("int")): _*)
    blockedPairs(left, right, leftId, rightId, leftBlock, rightBlock,
      fields, selfPairs, maxBlockSize)
      .select(posexplode(flags).as(Seq("field", "agree")))
      .groupBy("field")
      .agg(count(lit(1)).as("n_pairs"), sum("agree").as("n_agree"))
      .withColumn("agree_rate",
        round(col("n_agree").cast("double") / col("n_pairs"), 6))
  }

  /**
   * EM re-estimation of the Fellegi–Sunter weights (Winkler 1988 —
   * the standard unsupervised fit): starting from the seed `(m, u)` in
   * `fields` and a prior match proportion `lambda`, each iteration
   * computes every pair's posterior match probability
   * p(γ) = λ·Π mᵢ^γᵢ(1−mᵢ)^(1−γᵢ) / (λ·Π… + (1−λ)·Π uᵢ^γᵢ(1−uᵢ)^(1−γᵢ))
   * and re-estimates mᵢ = Σp·γᵢ/Σp, uᵢ = Σ(1−p)·γᵢ/Σ(1−p),
   * λ = Σp/n — completing the loop [[fieldAgreementRates]] only seeds.
   * Output, one row per field index: `(field, m_est, u_est,
   * lambda_est)` (λ repeated per row), all rounded to 6 dp.
   *
   * Scale shape: the blocked pair stream reduces ONCE to its agreement-
   * pattern histogram — at most 2^k rows for k fields (map-side
   * combined), NULL comparisons folding to disagree exactly as
   * [[linkageScores]] scores them. Every EM iteration then runs on that
   * tiny table fully in-plan: a 1-row weights frame broadcast in, two
   * scalar aggregates broadcast back — the corpus is never re-read and
   * nothing data-sized touches the driver.
   *
   * Determinism: per-pattern posteriors are fixed-order products
   * (left fold seeded with λ) rounded to 12 dp, and every cross-pattern
   * sum is a DECIMAL(38,9) sum of 9-dp-rounded operands — iteration
   * results are order-independent and cross-engine exact. Updated
   * weights clamp to [1e-6, 1−1e-6] each round (the standard guard —
   * an exact 0/1 weight makes the log-likelihood ratio infinite and
   * freezes every later iteration).
   */
  def emEstimate(left: DataFrame, right: DataFrame,
                 leftId: String, rightId: String,
                 leftBlock: String, rightBlock: String,
                 fields: Seq[FieldSpec], lambda: Double = 0.1,
                 iterations: Int = 1,
                 selfPairs: Boolean = false,
                 maxBlockSize: Option[Long] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(lambda > 0 && lambda < 1, s"need 0 < lambda < 1, got $lambda")
    val patterns = blockedPairs(left, right, leftId, rightId,
        leftBlock, rightBlock, fields, selfPairs, maxBlockSize)
      .select(array(agreeFlags(fields)
        .map(f => coalesce(f.cast("int"), lit(0))): _*).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__c"))
      // ≤2^|fields| rows, but its subtree is the FULL blocked-pair join —
      // materialize once or every EM round re-embeds (and re-executes) it
      .truncateLineage(true)
    val init = left.sparkSession.range(1).select(
      lit(lambda).as("__lam"),
      array(fields.map(f => lit(f.m)): _*).as("__m"),
      array(fields.map(f => lit(f.u)): _*).as("__u"))
    def decSum(c: Column): Column =
      sum(round(c, 9).cast("decimal(38,9)")).cast("double")
    val wFinal = (1 to iterations).foldLeft(init) { (w, _) =>
      // posterior per agreement pattern: left-fold product seeded with
      // the class prior — fixed index order on both engines
      val pm = aggregate(
        zip_with(col("__g"), col("__m"),
          (g, m) => when(g === 1, m).otherwise(lit(1.0) - m)),
        col("__lam"), (acc, t) => acc * t)
      val pu = aggregate(
        zip_with(col("__g"), col("__u"),
          (g, u) => when(g === 1, u).otherwise(lit(1.0) - u)),
        lit(1.0) - col("__lam"), (acc, t) => acc * t)
      val scored = patterns.crossJoin(broadcast(w))
        .select(col("__g"), col("__c"),
          round(pm / (pm + pu), 12).as("__p"))
      val tot = scored.agg(
        sum(col("__c")).cast("double").as("__n"),
        decSum(col("__c") * col("__p")).as("__sp"))
      val perField = scored
        .select(col("__c"), col("__p"), posexplode(col("__g")).as(Seq("__f", "__gi")))
        .groupBy("__f").agg(
          decSum(col("__c") * col("__p") * col("__gi")).as("__spg"),
          decSum(col("__c") * (lit(1.0) - col("__p")) * col("__gi")).as("__sug"))
      def clamp(c: Column): Column =
        greatest(least(c, lit(1.0) - lit(1e-6)), lit(1e-6))
      val next = perField
        .agg(sort_array(collect_list(
          struct(col("__f"), col("__spg"), col("__sug")))).as("__pk"))
        .crossJoin(broadcast(tot))
        .select(
          clamp(round(col("__sp") / col("__n"), 12)).as("__lam"),
          transform(col("__pk"),
            e => clamp(round(e("__spg") / col("__sp"), 12))).as("__m"),
          transform(col("__pk"),
            e => clamp(round(e("__sug") / (col("__n") - col("__sp")), 12)))
            .as("__u"))
        // `tot` and `perField` BOTH re-embed the previous round's weights,
        // so an unmaterialized fold doubles the plan every round; the
        // frame is one row — checkpointing it is one trivial job
        .truncateLineage(eager = true)
      graft.plans.IterationAudit.record("linkage.weightFitEm", next)
      next
    }
    wFinal
      .select(col("__lam"),
        posexplode(arrays_zip(col("__m"), col("__u"))).as(Seq("__f", "__z")))
      .select(col("__f").as("field"),
        round(col("__z")("__m"), 6).as("m_est"),
        round(col("__z")("__u"), 6).as("u_est"),
        round(col("__lam"), 6).as("lambda_est"))
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
