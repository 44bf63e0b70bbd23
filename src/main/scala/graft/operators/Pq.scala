package graft.operators

import graft.plans.Checkpoints.LineageOps
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
 * billion-scale ANN compression tier above [[Quantize.int8]] /
 * [[Quantize.matryoshka]]: split each d-dim vector into `m` contiguous
 * subvectors, learn a k-centroid L2 codebook PER SUBSPACE, and store
 * each vector as its m byte-sized centroid codes. A 64-dim float64
 * embedding (512 B) becomes m=8 codes (8 B) — the corpus fits in memory
 * where raw vectors never would, and asymmetric-distance (ADC) search
 * scores a candidate with m table lookups instead of d multiplies.
 *
 * Scale shape, matching the repo's IVF discipline:
 *  - [[fit]] runs every Lloyd round fully IN-PLAN (broadcast k-row
 *    centroid frame + corpus crossJoin argmin, per-dim decimal means);
 *    only the final m·k centroid rows reach the driver — they must,
 *    being the literal matrix [[encode]]'s codegen'd expression needs.
 *  - [[encode]] is ONE corpus scan through the native
 *    [[graft.functions.NearestCellL2]] expression per subspace — no
 *    shuffle, no join; codes land as an `array<int>` column.
 *  - [[adcTopK]] broadcasts the probe batch WITH its per-probe lookup
 *    tables (m·k partial dots, built in-plan from the codebook literal);
 *    the code corpus is scanned once at O(m) per (probe, candidate) —
 *    never reading, let alone shuffling, a full vector.
 *
 * Determinism (oracle discipline): subspace distances are raw-double
 * sequential folds (engine-exact given the same order — no rounding
 * needed), argmins tie to the LOWEST code, per-dim means are
 * DECIMAL(38,9) sums of 9-dp-rounded operands divided once and rounded
 * to 9 dp, and published scores round to 6 dp.
 */
object Pq {

  /** Squared L2 distance as a fixed-order fold — bit-identical to the
    * oracle's list_reduce replay and to [[graft.functions.NativeVector
    * .nearestCellL2]]'s accumulation. */
  private def dist2(x: Column, c: Column): Column =
    aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, t) => acc + t)

  /** 1-based slice of subspace `s` (0-based) out of a d-dim vector. */
  private def sub(v: Column, s: Int, dsub: Int): Column =
    slice(v, s * dsub + 1, dsub)

  /**
   * Fit the per-subspace codebooks: `codebook(s)(j)` is subspace `s`'s
   * centroid `j` (codes are 0-based). Seeds are the `k` vectors with the
   * smallest ids (deterministic and SQL-mirrorable — pass a corpus whose
   * id order is meaningful, or pre-shuffle ids upstream like
   * [[Ann.ivfIndex]]'s hash seed when clustering quality matters more
   * than oracle replay); `iterations` = number of assign→re-mean rounds.
   * A cluster that loses all members keeps its previous centroid.
   */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          subspaces: Int, k: Int,
          iterations: Int = 2): Array[Array[Array[Double]]] = {
    require(subspaces >= 1 && k >= 1 && iterations >= 1,
      "subspaces, k, iterations must all be >= 1")
    val vecs = df
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = vecs.select(size(col("__v"))).head().getInt(0)
      require(d % subspaces == 0,
        s"vector dim $d not divisible by $subspaces subspaces")
      val dsub = d / subspaces
      (0 until subspaces).toArray.map { s =>
        val xs = vecs.select(col("__id"), sub(col("__v"), s, dsub).as("__x"))
        var cents = xs.orderBy(col("__id").asc).limit(k)
          .select(col("__x").as("__c"),
            // bounded-window: topk — codes the k-row seed slice (limit above)
            (row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("__id").asc)) - 1).as("__code"))
          .select(col("__code"), col("__c"))
        for (_ <- 1 to iterations) {
          val asg = xs.crossJoin(broadcast(cents))
            .select(col("__id"), col("__x"),
              col("__code"), dist2(col("__x"), col("__c")).as("__d2"))
            .groupBy("__id", "__x")
            .agg(min(struct(col("__d2"), col("__code"))).as("__m"))
            .select(col("__x"), col("__m")("__code").as("__code"))
          val means = asg
            .select(col("__code"), posexplode(col("__x")).as(Seq("__dim", "__xd")))
            .groupBy("__code", "__dim")
            .agg((sum(round(col("__xd"), 9).cast("decimal(38,9)"))
              .cast("double") / count(lit(1))).as("__mu"))
            .groupBy("__code")
            .agg(sort_array(collect_list(struct(col("__dim"), col("__mu"))))
              .as("__p"))
            .select(col("__code"),
              transform(col("__p"), e => round(e("__mu"), 9)).as("__cNew"))
          cents = cents.join(means, Seq("__code"), "left")
            .select(col("__code"),
              coalesce(col("__cNew"), col("__c")).as("__c"))
            .truncateLineage(true)
          graft.plans.IterationAudit.record("pq.fit", cents)
        }
        cents.orderBy("__code").collect()
          .map(_.getSeq[Double](1).toArray)
      }
    } finally { vecs.unpersist(); () }
  }

  /** Flatten a codebook for the native expression / literal plans. */
  private def flat(cb: Array[Array[Double]]): Array[Double] = cb.flatten

  /**
   * Encode the corpus: `(idCol, codes array<int>)`, `codes(s)` the
   * nearest centroid of subspace `s` by squared L2 (ties → lowest
   * code). One codegen'd scan; the codebook rides as a task-binary
   * reference, never a join.
   */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = codebook(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val codes = array(codebook.indices.map(s =>
      VF.nearestCellL2(sub(v, s, dsub), codebook(s))): _*)
    df.select(col(idCol), codes.as("codes"))
  }

  /**
   * Persist an encoded corpus: the codebook as a small text file (one
   * line per (subspace, code) centroid — m·k rows, driver-side tiny)
   * and the codes table as parquet. The codes ARE the index — reloading
   * costs a codes scan, never a vector scan; the codebook file is the
   * contract that makes old codes decodable forever (re-fitting
   * invalidates codes, exactly like IVF centroids). Hadoop FileSystem
   * API, so local disk / HDFS / object stores all work.
   */
  def savePqIndex(codes: DataFrame, codebook: Array[Array[Array[Double]]],
                  path: String): Unit = {
    val spark = codes.sparkSession
    codes.write.mode("overwrite").parquet(s"$path/codes")
    val p = new org.apache.hadoop.fs.Path(s"$path/codebook.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val text = codebook.zipWithIndex.flatMap { case (sc, s) =>
      sc.zipWithIndex.map { case (c, j) =>
        s"$s $j ${c.mkString(",")}" }
    }.mkString("\n")
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted PQ index: (codebook, codes). */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): (Array[Array[Array[Double]]], DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/codebook.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val rows = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").map { line =>
        val Array(s, j, c) = line.split(" ", 3)
        (s.toInt, j.toInt, c.split(",").map(_.toDouble))
      }
    val codebook = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, sc) =>
      sc.sortBy(_._2).map(_._3)
    }.toArray
    (codebook, spark.read.parquet(s"$path/codes"))
  }

  /** Codebook as a nested array literal: cb[s+1][j+1] = centroid. */
  private def codebookLit(codebook: Array[Array[Array[Double]]]): Column =
    array(codebook.map(sc =>
      array(sc.map(c => array(c.map(lit): _*)): _*)): _*)

  /**
   * Decode codes back to their reconstruction x̂ (concatenated
   * centroids) — the audit surface, not a search path.
   */
  def reconstruct(codes: DataFrame, idCol: String, codesCol: String,
                  codebook: Array[Array[Array[Double]]]): DataFrame = {
    val cb = codebookLit(codebook)
    val rec = flatten(zip_with(
      col(codesCol), sequence(lit(1), lit(codebook.length)),
      (code, s) => element_at(element_at(cb, s), code + 1)))
    codes.select(col(idCol), rec.as("v"))
  }

  /**
   * Corpus reconstruction-error report, one row: `(n, mean_err,
   * max_err)` (L2 distance between each vector and its reconstruction,
   * published at 6 dp) — the number that says whether (m, k) is enough
   * before anyone trusts ADC ranking.
   */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String,
                          codebook: Array[Array[Array[Double]]]): DataFrame = {
    val enc = encode(df, idCol, vecCol, codebook)
    val rec = reconstruct(enc, idCol, "codes", codebook)
    val joined = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .join(rec.withColumnRenamed("v", "__r"), idCol)
    val err = sqrt(dist2(col("__v"), col("__r")))
    joined.select(round(err, 9).as("__e"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__e").cast("decimal(38,9)")).cast("double") /
          count(lit(1)), 6).as("mean_err"),
        round(max(col("__e")), 6).as("max_err"))
  }

  /**
   * Asymmetric-distance top-k: probes (raw vectors) against the ENCODED
   * corpus. Each probe precomputes its m·k lookup table of partial dots
   * in-plan; a candidate's approximate dot is the m-term sum of
   * `lut(s)(code_s)` — reconstruction-dot ranking at O(m) per pair,
   * vectors touched only on the (tiny) probe side. Output
   * `(query_id, rank, vec_id, score)` with `score` = dot(q, x̂)
   * rounded to 6 dp; ranks tie to the lowest id, self-matches excluded.
   */
  def adcTopK(codes: DataFrame, idCol: String, codesCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              codebook: Array[Array[Array[Double]]], k: Int = 10): DataFrame =
    adcTopKOverCandidates(codes, idCol, codesCol, probes, probeIdCol,
      probeVecCol, codebook, k, joinOn = None)

  /**
   * ADC core with an optional candidate-bounding equi-key: with
   * `joinOn = Some(cell)` the probe side must already carry one row per
   * (probe, cell) and only code rows in a probed cell are scored — the
   * [[Ann.ivfPqSearch]] composition; with `None` every code row is a
   * candidate (brute-force ADC). Either way the probe side broadcasts
   * with its in-plan lookup tables and the code corpus never shuffles.
   */
  def adcTopKOverCandidates(codes: DataFrame, idCol: String,
                            codesCol: String, probes: DataFrame,
                            probeIdCol: String, probeVecCol: String,
                            codebook: Array[Array[Array[Double]]],
                            k: Int,
                            joinOn: Option[String],
                            baseCol: Option[String] = None): DataFrame = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    val cb = codebookLit(codebook)
    val qv = col(probeVecCol).cast("array<double>")
    val lut = transform(sequence(lit(1), lit(m)), s =>
      transform(element_at(cb, s), c =>
        aggregate(zip_with(slice(qv, (s - 1) * dsub + 1, lit(dsub)), c,
          (a, b) => a * b), lit(0.0), (acc, t) => acc + t)))
    val probed = probes.select(
      col(probeIdCol).as("query_id") +: lut.as("__lut") +:
        (joinOn.map(c => col(c).as("__pkey")).toSeq ++
          baseCol.map(c => col(c).as("__base")).toSeq): _*)
    val cond = joinOn match {
      case Some(c) => col(c) === col("__pkey") && col(idCol) =!= col("query_id")
      case None    => col(idCol) =!= col("query_id")
    }
    // the score fold seeds with the residual variant's per-(probe, cell)
    // base term when present — ((base + t1) + … left-assoc, oracle-exact)
    val score = aggregate(sequence(lit(1), lit(m)),
      baseCol.map(_ => col("__base")).getOrElse(lit(0.0)),
      (acc, s) => acc +
        element_at(element_at(col("__lut"), s),
          element_at(col(codesCol), s) + 1))
    val scored = codes.join(broadcast(probed), cond)
      .select(col("query_id"), col(idCol).as("vec_id"),
        score.as("__score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("__score"), 6).as("score"))
      .orderBy("query_id", "rank")
  }
}
