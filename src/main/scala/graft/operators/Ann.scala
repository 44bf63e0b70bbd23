package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column.
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact cosine against every vector. The probe
 *    side is broadcast, so the corpus never shuffles: one scan, local
 *    top-k per partition via window. The CORRECTNESS baseline; linear
 *    per probe, so only the small-probe-set regime scales.
 *  - [[lshTopK]] / [[cosineNearDupPairs]] — the 100 TB path: random-
 *    hyperplane signatures (sign-agreement probability p = 1 - angle/π)
 *    banded into `bands` keys of `bandBits` bits; vectors sharing any
 *    band bucket are candidates, then exact cosine confirms. Candidate
 *    generation shuffles only (band, key) pairs — corpus-linear.
 *
 * Band sizing (SCALING.md): recall at similarity s is
 * 1-(1-p^bandBits)^bands; accidental candidates per band ≈ N²/2^(bandBits+1)
 * for near-orthogonal corpora. bandBits is the pruning knob: 16-bit keys
 * give 65,536 buckets/band (the round-1 4-bit keys gave 16, which made
 * every pair a candidate — quadratic in disguise). Use wide keys + more
 * bands for the high-similarity near-dup regime; narrower keys only when
 * the probe side is small enough to bound the candidate volume.
 */
object Ann {

  /** Derived LSH band width for a corpus of `n` vectors:
    * ceil(log₂ n) clamped to [`floor`, `cap`]. Keeps the expected
    * accidental-candidate count per (probe, band) — N/2^bits — at O(1)
    * as the corpus grows, instead of letting a fixed width degenerate
    * toward all-pairs. The cap bounds key sparsity (beyond ~2^24
    * buckets/band, recall loss buys no additional real pruning on any
    * single-cluster corpus); the floor keeps tiny corpora from
    * degenerate handful-of-buckets keys. */
  def derivedBandBits(n: Long, floor: Int = 8, cap: Int = 24): Int = {
    val m = math.max(n, 2L)
    // ceil(log2 m): position of the highest set bit of (m - 1), + 1
    val lg = 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(cap, math.max(floor, lg))
  }

  /** id → one row per (band, key), via the native banded-signature pass. */
  private def banded(df: DataFrame, idCol: String, vecCol: String,
                     bands: Int, bandBits: Int): DataFrame =
    df.select(col(idCol),
      posexplode(VF.bandKeys(col(vecCol), bands, bandBits)).as(Seq("band", "key")))

  /** Exact top-k neighbours of each probe vector (probes broadcast). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     probes: DataFrame, probeIdCol: String, probeVecCol: String,
                     k: Int = 10): DataFrame = {
    val scored = corpus
      .join(broadcast(probes), col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
    topK(scored, k)
  }

  /**
   * LSH-bucketed approximate top-k: candidates share ≥1 signature band
   * with the probe; exact cosine ranks them.
   *
   * Candidate generation moves ONLY (query_id, id) pairs — the embedding
   * arrays are joined back after pair dedup, so a vector crosses the wire
   * once per unique candidate, not once per shared band.
   *
   * Default 16 bands × 8 bits: each probe draws ≈ bands·N/2^bandBits ≈
   * N/16 accidental candidates from a near-orthogonal corpus plus all
   * high-similarity neighbours w.h.p. — corpus-linear per probe with a
   * 16× prune. Raise bandBits as N grows (candidates scale 1/2^bandBits).
   *
   * `probeHamming = 1` enables multi-probe (Lv et al., VLDB'07): each
   * probe also queries every band key within Hamming distance 1 —
   * recall of a (bands × bandBits+?) config at the index size and
   * candidate profile of this one. The expansion is PROBE-side only
   * (×(bandBits+1) rows on the tiny side); the corpus index and its
   * shuffle volume are unchanged — the right trade when the index is
   * big and the query batch is small.
   *
   * `bandBits = 0` (the default) DERIVES the band width from the
   * corpus: ceil(log₂ N) clamped to [8, 24], via one count job.
   * Accidental candidates per probe scale bands·N/2^bandBits, so a
   * static width that was right at one N silently degenerates toward
   * all-pairs at 1000× the corpus (SCALING.md measured 395 s → 1 s
   * from exactly this mis-sizing); tracking log₂ N keeps the
   * candidate volume per probe roughly flat as the corpus grows.
   */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, bands: Int = 16, bandBits: Int = 0,
              probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1, "probeHamming must be 0 or 1")
    require(bandBits >= 0 && bandBits <= 32, "bandBits must be in [0, 32]")
    val bits =
      if (bandBits > 0) bandBits
      else derivedBandBits(corpus.count())
    val corpusB = banded(corpus, idCol, vecCol, bands, bits)
    val probesB0 = banded(probes, probeIdCol, probeVecCol, bands, bits)
    val probesB =
      if (probeHamming == 0) probesB0
      else probesB0
        .select(col(probeIdCol), col("band"), explode(array(
          col("key") +: (0 until bits).map(b =>
            col("key").bitwiseXOR(lit(1L << b))): _*)).as("key"))
    val cand = corpusB.join(broadcast(probesB),
        corpusB("band") === probesB("band") && corpusB("key") === probesB("key") &&
          col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand
      .join(broadcast(probes.select(col(probeIdCol).as("query_id"),
        col(probeVecCol).as("__qv"))), "query_id")
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v")), "vec_id")
      .select(col("query_id"), col("vec_id"),
        VF.cosine(col("__qv"), col("__v")).as("cosine"))
    topK(scored, k)
  }

  /**
   * Embedding-cosine near-dup pairs: banded LSH candidates + exact
   * cosine confirm at `threshold`.
   *
   * Same id-only discipline: the band self-join and pair dedup shuffle
   * 16-byte id pairs; vectors join back once per unique pair. (Carrying
   * the arrays through the candidate join turns megabytes of pair keys
   * into gigabytes of duplicated embeddings — measured as the difference
   * between 2s and minutes at sf0.1.)
   *
   * Default 8 bands × 16 bits targets the true near-dup regime
   * (cosine ≥ 0.9): recall ≈ 1-(1-p^16)^8 ≥ 0.99 at s ≥ 0.97 and
   * accidental pairs ≈ 8·N²/2^17 — a 16,000× prune vs all-pairs. This
   * operator is for near-DUPLICATES; low thresholds (< ~0.7) make any
   * LSH family degenerate toward all-pairs (p^bandBits → 0 recall or
   * 2^bandBits → no pruning) — use bruteForceTopK-style exact scoring
   * for those regimes instead.
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double = 0.9,
                         bands: Int = 8, bandBits: Int = 16): DataFrame = {
    val pairs = cosineCandidatePairs(df, idCol, vecCol, bands, bandBits)
    val vecs = df.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .withColumn("cosine", VF.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Candidate pairs only (pre-confirm) — exposed so specs can assert the
    * LSH prune factor: candidate count must be ≪ N²/2. */
  def cosineCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                           bands: Int = 8, bandBits: Int = 16): DataFrame = {
    val b = banded(df, idCol, vecCol, bands, bandBits)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * IVF (inverted-file) approximate top-k: a spherical k-means coarse
   * quantizer (cosine assignment over unit centroids) partitions the
   * corpus into `nCentroids` cells; each probe searches only its `nProbe`
   * nearest cells.
   *
   * Index build: the quantizer fits IN-PLAN via [[Centroids.lloyd]] —
   * a deterministic k-row seed followed by `lloydIter` distributed
   * assign→re-mean rounds whose shuffles carry (cluster, dim) decimal
   * partial sums, never vectors and never a corpus sample. The only
   * driver materialization is the k-row centroid table, which must live
   * on the driver regardless: it is the broadcast matrix inside the
   * codegen'd [[graft.functions.NearestCells]] assignment expression.
   * Search: one corpus scan assigns cells via that expression (the
   * unit-centroid matrix rides along as a task-local reference — no
   * normalization pass, no per-row allocation, no shuffle), then a
   * broadcast join on cell id touches only nProbe/nCentroids of the data
   * per probe.
   *
   * For repeated query batches, build the index ONCE with [[ivfIndex]]
   * (persisting `index.assigned` materializes the `__cell` assignment a
   * single time) and run each batch through [[ivfSearch]] — the fit
   * scans and the cell assignment are then amortized across every batch
   * instead of repeated per query set.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, probeIdCol: String, probeVecCol: String,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, lloydIter: Int = 2): DataFrame =
    ivfSearch(ivfIndex(corpus, idCol, vecCol, nCentroids, seed, lloydIter),
      idCol, vecCol, probes, probeIdCol, probeVecCol, k, nProbe)

  /**
   * A fitted IVF coarse quantizer: the unit centroid matrix plus the
   * corpus with its `__cell` assignment column. `assigned` is lazy like
   * any DataFrame — persist it to materialize the assignment once and
   * amortize it across query batches.
   */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /**
   * Fit the coarse quantizer IN-PLAN and attach `__cell` to the corpus.
   *
   * Seed: the `nCentroids` vectors with the smallest `xxhash64(id,
   * seed)` — a hash order is id-clustering-blind (a date/tenant-sorted
   * table still seeds from all regions of embedding space), and
   * `orderBy(...).limit(k)` plans as TakeOrderedAndProject (per-partition
   * top-k + driver merge of k·partitions rows), NOT a global sort
   * shuffle. Fit: `lloydIter` rounds of [[Centroids.lloyd]] — every
   * iteration one broadcast assignment scan plus one (cluster, dim)
   * partial-sum shuffle, all distributed. The sole driver
   * materialization is the final k-row centroid table, unavoidable by
   * design: the matrix must be broadcast into the codegen'd
   * [[graft.functions.NearestCells]] expression. Centroids are
   * unit-normalized on collection (k·dims flops) so the expression's dot
   * products are cosines. Deterministic for a given (corpus, k, seed):
   * hash seed order is total, and Lloyd's assign/re-mean rounds are
   * engine-exact (6-dp cosines, decimal sums).
   *
   * The projected (id, vector) frame is cached for the fit's repeated
   * scans and unpersisted before returning.
   */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int = 16, seed: Long = 42L,
               lloydIter: Int = 2): IvfIndex = {
    val vecs = corpus
      .select(col(idCol).as("__fid"), col(vecCol).as("__fv"))
      .where(col("__fv").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashOrd = Seq(xxhash64(col("__fid"), lit(seed)).asc, col("__fid").asc)
    // bounded-window: topk — ranks the nCentroids-row seed slice (limit below)
    val w = org.apache.spark.sql.expressions.Window.orderBy(hashOrd: _*)
    val seeds = vecs.orderBy(hashOrd: _*).limit(nCentroids)
      .withColumn("label", row_number().over(w).cast("long"))
      .select(col("label"), col("__fv").as("centroid"))
    val asg = Centroids.lloyd(vecs, "__fid", "__fv", seeds, lloydIter)
    val cents = Centroids.labelCentroids(
        vecs.join(asg.select(col("__fid"), col("cluster").as("label")), "__fid"),
        "__fv", "label")
      .orderBy("label")
      .collect() // k rows — the NearestCells broadcast matrix
      .map(_.getSeq[Double](1).toArray)
    vecs.unpersist()
    val centroids = cents.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    IvfIndex(centroids,
      corpus.withColumn("__cell", VF.nearestCells(col(vecCol), centroids, 1)(0)))
  }

  /**
   * Persist a fitted [[IvfIndex]]: the centroid matrix as a small text
   * file (one comma-separated row per centroid — driver-side, tiny) and
   * the assigned corpus as parquet PARTITIONED BY `__cell`. The partition
   * layout is the on-disk inverted file: a probe batch touches only its
   * nProbe cells' directories (dynamic partition pruning on the cell
   * join), so repeated query batches never rescan the corpus.
   *
   * Uses the Hadoop FileSystem API for the centroid file, so the same
   * code addresses local disk, HDFS, or object stores.
   */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    index.assigned.write.mode("overwrite")
      .partitionBy("__cell").parquet(s"$path/assigned")
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(index.centroids.map(_.mkString(",")).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /**
   * Incrementally grow a persisted IVF index: assign a new batch to the
   * EXISTING centroids (loaded from the centroid file — the quantizer
   * is frozen; that is what makes append cheap and deterministic) and
   * append its rows into the cell-partitioned layout. One batch scan,
   * no shuffle of the existing index, and new files land only in the
   * cells the batch actually touches — the daily-ingest maintenance
   * path that avoids rebuilding a 100 TB index for a 0.1% delta.
   * Re-fit (rebuild) when drift audits say the frozen centroids no
   * longer describe the data; search results after append are
   * identical to a fresh assignment of the union under the same
   * centroids (spec-asserted). The batch must carry the same id/vector
   * columns the index was built with.
   */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, batch: DataFrame,
                       vecCol: String): Unit = {
    val idx = loadIvfIndex(spark, path)
    batch
      .withColumn("__cell", VF.nearestCells(col(vecCol), idx.centroids, 1)(0))
      .write.mode("append").partitionBy("__cell")
      .parquet(s"$path/assigned")
  }

  /** Load a persisted [[IvfIndex]] (see [[saveIvfIndex]]). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    val centroids = text.split("\n").map(_.split(",").map(_.toDouble))
    IvfIndex(centroids, spark.read.parquet(s"$path/assigned"))
  }

  /**
   * STREAM-static IVF search: a static fitted index probed by an
   * unbounded probe stream — the similarity-search leg of a streaming
   * curation loop (dedup, DSIR scoring and WAP already stream; this
   * closes the gap). The cell-assignment expression is pure, so the
   * probe side is a stateless projection; the candidate join is
   * stream-static inner (NO state, no watermark); the result is the
   * scored candidate stream `(query_id, vec_id, cosine)` in append
   * mode. A probe's candidates are complete within its own micro-batch
   * (the static side never changes mid-query), so finalize ranks per
   * batch: `.writeStream.foreachBatch((b, _) => use(Ann.topK(b, k)))` —
   * per-query top-k is not an append-mode streaming aggregate, and per
   * micro-batch is exactly the semantics a static index justifies.
   * For a big on-disk index prefer `foreachBatch((b, _) =>
   * use(ivfSearch(index, …, probes = b, …)))` — the batch path
   * broadcasts the probe batch and dynamically prunes the
   * cell-partitioned scan, which micro-batch plans don't.
   */
  def ivfSearchStream(index: IvfIndex, idCol: String, vecCol: String,
                      probes: DataFrame, probeIdCol: String,
                      probeVecCol: String, nProbe: Int = 4): DataFrame = {
    val assigned = index.assigned
    val probeCells = probes
      .select(col(probeIdCol), col(probeVecCol),
        explode(VF.nearestCells(col(probeVecCol), index.centroids, nProbe))
          .as("__cell"))
    // no dropDuplicates: a corpus vector lives in exactly one cell and a
    // probe's nProbe cells are distinct, so a (query, vec) pair can only
    // arise once — the stream stays stateless
    assigned.join(probeCells,
        assigned("__cell") === probeCells("__cell") &&
          col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
  }

  /** Search a fitted [[IvfIndex]] with one probe batch. */
  def ivfSearch(index: IvfIndex, idCol: String, vecCol: String,
                probes: DataFrame, probeIdCol: String, probeVecCol: String,
                k: Int = 10, nProbe: Int = 4): DataFrame = {
    val assigned = index.assigned
    val probeCells = probes
      .select(col(probeIdCol), col(probeVecCol),
        explode(VF.nearestCells(col(probeVecCol), index.centroids, nProbe)).as("__cell"))
    val cand = assigned.join(broadcast(probeCells),
        assigned("__cell") === probeCells("__cell") && col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol).as("query_id"), col(idCol).as("vec_id"),
        VF.cosine(col(probeVecCol), col(vecCol)).as("cosine"))
      .dropDuplicates("query_id", "vec_id")
    topK(cand, k)
  }

  /**
   * Mutual (reciprocal) top-k pairs — the stricter near-neighbor signal
   * used by cluster-pruning/SemDeDup-style curation: keep `(a, b)` only
   * when b is in a's top-k AND a is in b's top-k of the SAME ranked
   * self-retrieval table (one-directional top-k admits hubness
   * artifacts: a popular vector appears in everyone's list without
   * reciprocating). Input is any `(query_id, vec_id, cosine)` ranked
   * output over one id space (e.g. [[bruteForceTopK]] / [[lshTopK]]
   * probed with the corpus itself); output one row per unordered pair,
   * `id_a < id_b`, with both directed cosines (equal for exact scoring;
   * they can differ under approximate/truncated candidates — keeping
   * both makes the asymmetry visible instead of silently averaged).
   *
   * Scale shape: a self-join of two k·N-row projections on the flipped
   * pair key — never the vectors, never the corpus.
   */
  def mutualTopK(candidates: DataFrame, queryCol: String, docCol: String,
                 scoreCol: String): DataFrame = {
    val fwd = candidates.select(col(queryCol).as("__qa"),
      col(docCol).as("__da"), col(scoreCol).as("cosine_ab"))
    val rev = candidates.select(col(queryCol).as("__qb"),
      col(docCol).as("__db"), col(scoreCol).as("cosine_ba"))
    fwd.join(rev, col("__qa") === col("__db") && col("__da") === col("__qb"))
      .filter(col("__qa") < col("__da"))
      .select(col("__qa").as("id_a"), col("__da").as("id_b"),
        col("cosine_ab"), col("cosine_ba"))
  }

  /**
   * Margin-based pair mining (Artetxe & Schwenk, ACL'19 — the LASER
   * bitext-mining criterion): absolute cosine is miscalibrated across
   * embedding-space density, so each candidate pair is scored by its
   * RATIO margin — cos(x,y) over the mean of both endpoints' top-k
   * neighborhoods, margin(x,y) = cos(x,y) / ((ā_x + ā_y)/2) — and each
   * source keeps only its best-margin target at `threshold`+ (the
   * paper's "forward max" strategy). Margin > 1 ⇔ y is closer to x than
   * x's/y's typical near neighbors — the signal that survives hubness.
   *
   * Inputs are two ALREADY-RANKED top-k tables `(queryCol, docCol,
   * scoreCol)` — `fwd` X→Y (its pairs are the candidates), `bwd` Y→X
   * (used only for the target-side neighborhood means), from any of
   * [[bruteForceTopK]] / [[lshTopK]] / [[ivfTopK]], so the mining cost
   * profile is whatever the retrieval tier cost — this pass adds only
   * k·N-row reductions. Output: `(src_id, tgt_id, cosine, margin)`.
   *
   * Float discipline: neighborhood means are exact DECIMAL sums of the
   * 6-dp cosines divided as double and rounded to 9 dp; the margin is a
   * single division rounded to 6 dp; best-per-source ties break on
   * target id. Scale shape: two map-side-combining averages over the
   * top-k tables, one broadcast-sized join per side, and a per-source
   * window over ≤k rows — the corpus vectors never move again.
   */
  def marginPairs(fwd: DataFrame, bwd: DataFrame, threshold: Double = 1.0,
                  queryCol: String = "query_id", docCol: String = "vec_id",
                  scoreCol: String = "cosine"): DataFrame = {
    // source-side neighborhood mean: a WINDOW over the rows already
    // co-partitioned by query — no join, no extra shuffle (plan-asserted
    // in PlanAuditSpec). Only the target-side mean, keyed by the OTHER
    // id space, needs a join — both sides k·N, the one legitimate
    // shuffle here (AQE broadcasts it when the query set is small).
    val wq = Window.partitionBy(queryCol)
    val ax = round(sum(col(scoreCol).cast("decimal(10,6)")).over(wq)
      .cast("double") / count(lit(1)).over(wq), 9)
    val ay = bwd.groupBy(col(queryCol).as("__ay_id"))
      .agg(round(sum(col(scoreCol).cast("decimal(10,6)")).cast("double") /
        count(lit(1)), 9).as("__ay"))
    val scored = fwd.withColumn("__ax", ax)
      .join(ay, col(docCol) === col("__ay_id"))
      .withColumn("margin", round(col(scoreCol) /
        ((col("__ax") + col("__ay")) / lit(2.0)), 6))
    val w = Window.partitionBy(queryCol)
      .orderBy(col("margin").desc, col(docCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("margin") >= threshold)
      .select(col(queryCol).as("src_id"), col(docCol).as("tgt_id"),
        col(scoreCol).as("cosine"), col("margin"))
  }

  /**
   * IVF-PQ index (the FAISS IVFFlat-PQ composition, non-residual
   * variant): the IVF coarse quantizer bounds WHICH vectors a probe
   * scores (nProbe/nCentroids of the corpus) and the PQ codes bound
   * WHAT a score costs (m table adds, no vector read) — together the
   * billion-vector memory/latency shape. `codes` carries
   * `(id, __cell, codes)`: 8-ish bytes of payload per corpus vector
   * instead of d doubles. The PQ codebook here encodes the RAW vectors,
   * not per-cell residuals — rankings are identical to [[Pq.adcTopK]]
   * restricted to the probed cells (the residual variant refines
   * per-cell precision at the cost of cell-dependent codes; compose
   * [[Pq.fit]] on `x − centroid` per cell if that trade is needed).
   */
  final case class IvfPqIndex(ivf: IvfIndex,
                              codebook: Array[Array[Array[Double]]],
                              codes: DataFrame,
                              residualCentroids: Option[Array[Array[Double]]] = None)

  /** Build both quantizers and encode the corpus once: the cell
    * assignment and the PQ codes land in ONE scan over the corpus
    * (both are literal-matrix codegen'd expressions — no join). */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nCentroids: Int = 16, subspaces: Int = 8, pqK: Int = 16,
                 seed: Long = 42L, lloydIter: Int = 2,
                 pqIter: Int = 2): IvfPqIndex = {
    val ivf = ivfIndex(corpus, idCol, vecCol, nCentroids, seed, lloydIter)
    val cb = Pq.fit(corpus, idCol, vecCol, subspaces, pqK, pqIter)
    val dsub = cb(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val codes = ivf.assigned.select(col(idCol), col("__cell"),
      array(cb.indices.map(s =>
        graft.functions.VectorFunctions.nearestCellL2(
          slice(v, s * dsub + 1, dsub), cb(s))): _*).as("codes"))
    IvfPqIndex(ivf, cb, codes)
  }

  /**
   * Search: probes explode to their nProbe cells, broadcast against the
   * code corpus on cell id, and candidates score via the PQ lookup
   * table — nProbe/nCentroids of the corpus touched, O(m) per pair,
   * no corpus vector ever read. With `nProbe = nCentroids` the result
   * equals [[Pq.adcTopK]] exactly (every cell probed) — the gate's
   * closed-form check that the cell tier loses nothing it shouldn't.
   */
  def ivfPqSearch(index: IvfPqIndex, idCol: String,
                  probes: DataFrame, probeIdCol: String,
                  probeVecCol: String,
                  k: Int = 10, nProbe: Int = 4): DataFrame =
    Pq.adcTopKOverCandidates(
      index.codes, idCol, "codes",
      probes.select(col(probeIdCol), col(probeVecCol),
        explode(VF.nearestCells(col(probeVecCol), index.ivf.centroids,
          nProbe)).as("__cell")),
      probeIdCol, probeVecCol, index.codebook, k,
      joinOn = Some("__cell"))

  /**
   * RESIDUAL IVF-PQ (IVFADC proper, Jégou et al. TPAMI'11 §III): the
   * PQ codebook quantizes `x − centroid(cell)` instead of `x`. Residual
   * magnitudes are much smaller than raw coordinates, so the same
   * (m, k) budget buys finer reconstruction — the trade is that codes
   * become cell-dependent, so a re-clustered index must re-encode.
   * One codebook serves every cell (the standard choice — per-cell
   * codebooks multiply the table memory by nCentroids for little gain).
   * The residual is a pure `zip_with` against the broadcast centroid
   * matrix, computed inside the same single corpus scan that assigns
   * cells and codes.
   *
   * The residual subtracts each cell's RAW per-dim mean (one extra
   * (cell, dim)-keyed decimal reduce; one more k-row driver matrix),
   * NOT the unit-normalized spherical centroid cell selection uses:
   * the unit vector points the right direction but sits at norm 1
   * while the data sits wherever its norms are, so subtracting it can
   * INFLATE residuals (measured: +10% reconstruction error on the
   * testdata embeddings). Centering on the true mean is what shrinks
   * them — an empty cell's mean falls back to zeros (raw coding).
   */
  def ivfPqResidualIndex(corpus: DataFrame, idCol: String, vecCol: String,
                         nCentroids: Int = 16, subspaces: Int = 8,
                         pqK: Int = 16, seed: Long = 42L,
                         lloydIter: Int = 2, pqIter: Int = 2): IvfPqIndex = {
    val ivf = ivfIndex(corpus, idCol, vecCol, nCentroids, seed, lloydIter)
    val d = ivf.centroids(0).length
    val meanRows = Centroids.labelCentroids(
        ivf.assigned.select(col("__cell").as("label"),
          col(vecCol).cast("array<double>").as("__v")),
        "__v", "label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val rawMeans = Array.tabulate(nCentroids)(i =>
      meanRows.getOrElse(i, Array.fill(d)(0.0)))
    val rawLit = array(rawMeans.map(c => array(c.map(lit): _*)): _*)
    val withRes = ivf.assigned.select(col(idCol), col("__cell"),
      zip_with(col(vecCol).cast("array<double>"),
        element_at(rawLit, col("__cell") + 1), (a, b) => a - b).as("__res"))
    val cb = Pq.fit(withRes, idCol, "__res", subspaces, pqK, pqIter)
    val dsub = cb(0)(0).length
    val codes = withRes.select(col(idCol), col("__cell"),
      array(cb.indices.map(s =>
        VF.nearestCellL2(slice(col("__res"), s * dsub + 1, dsub),
          cb(s))): _*).as("codes"))
    IvfPqIndex(ivf, cb, codes, Some(rawMeans))
  }

  /**
   * Search a residual index: a candidate's score is
   * dot(q, centroid(cell)) + Σ_s lut(s)(code_s) — the first term
   * computed once per (probe, cell) on the broadcast probe side, the
   * rest the usual m table adds. Still O(m) per pair, still no corpus
   * vector read.
   */
  def ivfPqResidualSearch(index: IvfPqIndex, idCol: String,
                          probes: DataFrame, probeIdCol: String,
                          probeVecCol: String,
                          k: Int = 10, nProbe: Int = 4): DataFrame = {
    val rawMeans = index.residualCentroids.getOrElse(throw
      new IllegalArgumentException(
        "ivfPqResidualSearch needs an index built by ivfPqResidualIndex"))
    val centLit = array(rawMeans.map(c => array(c.map(lit): _*)): _*)
    val qv = col(probeVecCol).cast("array<double>")
    val probeCells = probes
      .select(col(probeIdCol), col(probeVecCol),
        explode(VF.nearestCells(col(probeVecCol), index.ivf.centroids,
          nProbe)).as("__cell"))
      .withColumn("__base",
        aggregate(zip_with(qv, element_at(centLit, col("__cell") + 1),
          (a, b) => a * b), lit(0.0), (acc, t) => acc + t))
    Pq.adcTopKOverCandidates(index.codes, idCol, "codes", probeCells,
      probeIdCol, probeVecCol, index.codebook, k,
      joinOn = Some("__cell"), baseCol = Some("__base"))
  }

  /** Rank a scored candidate table `(query_id, vec_id, cosine)` to each
    * query's top k — also the per-micro-batch finalize step of
    * [[ivfSearchStream]] (inside `foreachBatch`). */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // rank as BIGINT: SQL row_number() is 64-bit, and the brute-force gate
    // is oracle-checked against DuckDB's — keep widths identical.
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }
}
