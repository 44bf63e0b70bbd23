package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/**
 * Dataset sink: hive-partitioned parquet writes — the output shape of a
 * curation pipeline (corpus partitioned by language/source/date, readable
 * with partition pruning by any engine).
 *
 * The scale hazards of a naive `df.write.partitionBy(...)` at 100 TB are
 * file-count explosions, not write throughput:
 *
 *  - without a prior repartition on the partition columns, EVERY task
 *    holding rows of a partition opens a file there → tasks × partitions
 *    small files (a 10k-task job over 100 languages = 1M files);
 *    [[writePartitioned]] repartitions on the partition columns first so
 *    each partition's rows converge on one task → one file per partition
 *    (plus `maxRecordsPerFile` splits);
 *  - a single hot partition (English…) then becomes one giant file AND
 *    one straggler task — `hotBuckets` spreads each partition over that
 *    many tasks/files while keeping the total file count bounded at
 *    partitions × hotBuckets;
 *  - `maxRecordsPerFile` caps file size inside a task (Spark rolls to a
 *    new file at the cap), bounding downstream reader task skew;
 *  - `sortWithin` sorts rows inside each file (run-length/locality for
 *    columnar encodings and range-readers) without any global sort.
 */
object Writer {

  def writePartitioned(df: DataFrame, path: String,
                       partitionBy: Seq[String],
                       sortWithin: Seq[String] = Nil,
                       maxRecordsPerFile: Long = 0L,
                       hotBuckets: Int = 1,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(hotBuckets >= 1, "hotBuckets must be >= 1")
    val repartitioned =
      if (partitionBy.isEmpty) df
      else if (hotBuckets == 1) df.repartition(partitionBy.map(col): _*)
      else {
        // spread each hive partition over hotBuckets tasks by salting the
        // repartition KEY only — the on-disk layout is unchanged, so the
        // salt needs no determinism (it picks a writer task, not content).
        // A row-content hash would reject unhashable column types (maps)
        // and send all copies of a duplicate row to ONE bucket, defeating
        // the spread on duplicate-heavy data. Explicit partition count:
        // AQE coalescing would merge the salted splits back into one task
        // (and one file) — user-numbered repartitions are exempt.
        import org.apache.spark.sql.functions.{lit, monotonically_increasing_id, pmod}
        val salted = df.withColumn("__spread",
          pmod(monotonically_increasing_id(), lit(hotBuckets.toLong)))
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        salted.repartition(n, (partitionBy :+ "__spread").map(col): _*).drop("__spread")
      }
    val sorted =
      if (sortWithin.isEmpty) repartitioned
      else repartitioned.sortWithinPartitions((partitionBy ++ sortWithin).map(col): _*)
    val writer0 = sorted.write.mode(mode)
    val writer =
      if (maxRecordsPerFile > 0L)
        writer0.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer0
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(path)
  }

  /**
   * Sharded JSONL export — the training-data handoff format (one JSON
   * object per line, newline-safe by escaping, readable by any loader).
   *
   * `shards` bounds the output file count explicitly (a round-robin
   * repartition, cheap and skew-free since no key is involved); 0 keeps
   * the input partitioning. Null fields are written explicitly
   * (`ignoreNullFields=false`) so a reader recovers the exact schema and
   * row content — the q_export_jsonl gate proves write→read round-trip
   * fidelity against the original parquet, including multi-line text.
   *
   * At 100 TB the knobs that matter are the same as [[writePartitioned]]:
   * file count (here `shards`) and per-file size; JSONL compresses ~5×
   * with the default codec, so pair with `option("compression","gzip")`
   * downstream if the consumer supports it — left uncompressed here
   * because splittability of plain text is the default consumers expect.
   */
  def jsonl(df: DataFrame, path: String, shards: Int = 0,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode(mode)
      .option("ignoreNullFields", "false")
      .json(path)
  }

  /**
   * Write-audit-publish: stage the batch, validate it, and only then
   * make it visible — the idempotent-publish pattern that keeps a
   * half-written or rule-violating batch from ever being read
   * downstream. A failed job (or failed audit) leaves the destination
   * EXACTLY as it was; a rerun republishes from scratch.
   *
   *  1. WRITE to a hidden sibling staging dir (unique per attempt, so
   *     concurrent attempts never collide);
   *  2. AUDIT the staged files with [[graft.operators.Expect]] row-local
   *     rules — re-reading what was actually written catches write-path
   *     corruption too, and costs one scan of the BATCH, not the base;
   *  3. PUBLISH by renaming staging onto the destination, with the
   *     audit report embedded as `_AUDIT.json`.
   *
   * Rename is atomic-and-O(1) on HDFS-like filesystems; on S3-like
   * stores it degrades to copy — there the staging dir should live
   * under the final prefix and a manifest commit (or a table format)
   * replaces the rename. The seam is this function either way.
   *
   * Returns the report rows `(rule, n_rows, n_violations, pass)`;
   * throws (and cleans staging, leaving the destination untouched) if
   * any rule fails.
   */
  def writeAuditPublish(df: DataFrame, path: String,
                        rules: Seq[graft.operators.Expect.Rule],
                        partitionBy: Seq[String] = Nil)
      : Seq[(String, Long, Long, Boolean)] = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(dest.getParent,
      s".${dest.getName}_staging_${java.util.UUID.randomUUID()}")
    try {
      val w = df.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(staging.toString)
      val report = graft.operators.Expect
        .validate(spark.read.parquet(staging.toString), rules)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
      val failed = report.filter(!_._4)
      if (failed.nonEmpty)
        throw new IllegalStateException("audit failed, not publishing: " +
          failed.map(f => s"${f._1} (${f._3} violations)").mkString(", "))
      val audit = report.map { case (rule, n, v, pass) =>
        s"""{"rule":"$rule","n_rows":$n,"n_violations":$v,"pass":$pass}"""
      }.mkString("[", ",", "]")
      val out = fs.create(new Path(staging, "_AUDIT.json"))
      try out.write(audit.getBytes("UTF-8")) finally out.close()
      if (fs.exists(dest)) fs.delete(dest, true)
      if (!fs.rename(staging, dest))
        throw new java.io.IOException(s"publish rename failed: $staging -> $dest")
      report
    } catch {
      case e: Throwable => fs.delete(staging, true); throw e
    }
  }

  /**
   * File-level statistics manifest of a written dataset: one row per
   * physical file — `(file, n_rows, <c>_min, <c>_max …)` — the
   * engine-side view of the parquet footer stats every reader prunes
   * by. Computed in ONE distributed scan keyed on `input_file_name()`
   * (never a per-file driver loop), so it costs a single pass at any
   * file count. Pair with [[graft.sources.Layout.clusterByZ]]: the
   * manifest of a z-clustered write shows every clustered column's
   * per-file ranges tight at once — the proof the layout job paid off,
   * and the input to a "which files does this predicate touch" check
   * (`Layout.pruneProbe` semantics against REAL files).
   */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String,
               cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit, max, min}
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /**
   * Small-files repair: rewrite a parquet directory into
   * `ceil(totalBytes / targetFileBytes)` files (size estimated from
   * the source listing — metadata only, no data through the driver).
   * With no `sortWithin`, a round-robin `repartition(n)` packs files
   * skew-free. With `sortWithin` (the cluster key), the rewrite goes
   * through `repartitionByRange` + in-partition sort instead — a
   * compaction must not silently destroy a clustered layout, and
   * range-repacking on the key RESTORES it (files regain disjoint key
   * ranges). Writes to `outPath`: compaction is a
   * write-audit-publish-shaped operation, and an in-place rewrite that
   * dies mid-job would eat the source; callers publish with a rename
   * (or [[writeAuditPublish]]).
   *
   * At 100 TB this is the maintenance job that keeps file counts sane:
   * streaming sinks and fine-grained partitions accrete kilobyte
   * files, and every downstream scan pays per-file open cost until a
   * compact pass runs.
   */
  /**
   * Targeted erasure (the GDPR/right-to-be-forgotten rewrite): delete
   * every row whose `keyCol` is in `subjects` by rewriting ONLY the
   * files whose footer-level [min, max] key range can contain a
   * subject — untouched files are carried over byte-identical. On a
   * key-clustered layout ([[compact]] with `sortWithin`, or
   * [[writeBucketed]]) an erasure batch touches a handful of files; a
   * naive `anti-join → full rewrite` rewrites 100 TB to delete
   * kilobytes.
   *
   * Mechanics: per-file (min, max, rows) from one scan (at real scale
   * pass a PERSISTED [[manifest]] instead — `stats` — so only file
   * pruning and the affected-file rewrite touch data at all); affected
   * = files whose range brackets ≥1 broadcast subject; those files are
   * re-read (an explicit file-list scan — nothing else is opened),
   * anti-joined, and rewritten into `outPath` alongside copies of the
   * untouched files. Output dir is fresh (write-audit-publish
   * discipline: an in-place rewrite that dies mid-job eats the
   * source); the untouched-file carry-over is a driver-side FS copy
   * loop — bounded by FILE COUNT, not data, and on object stores the
   * copy becomes a manifest re-reference.
   *
   * Returns `(n_files, n_files_rewritten, n_rows_deleted)`.
   */
  def targetedDelete(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String, keyCol: String,
                     subjects: DataFrame,
                     stats: Option[DataFrame] = None)
      : (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, count, lit, max => fmax, min => fmin, input_file_name, sum => fsum}
    import org.apache.hadoop.fs.{FileUtil, Path}
    val fileStats = stats.getOrElse {
      spark.read.parquet(inPath)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"),
          fmin(col(keyCol)).as(s"${keyCol}_min"),
          fmax(col(keyCol)).as(s"${keyCol}_max"))
    }
    val subj = subjects.select(col(subjects.columns.head).as("__s"))
      .distinct()
    val flagged = fileStats.join(broadcast(subj),
        col(s"${keyCol}_min") <= col("__s") &&
          col("__s") <= col(s"${keyCol}_max"), "left")
      .groupBy(col("file"), col("n_rows"))
      .agg(fmax(col("__s").isNotNull).as("__hit"))
    // file list is driver-side by necessity (it drives the FS plan) —
    // bounded by file count, the same scale class as any commit protocol
    val rows = flagged.collect()
    val affected = rows.filter(_.getAs[Boolean]("__hit"))
      .map(_.getAs[String]("file"))
    val untouched = rows.filterNot(_.getAs[Boolean]("__hit"))
      .map(_.getAs[String]("file"))
    val conf = spark.sessionState.newHadoopConf()
    val out = new Path(outPath)
    val fs = out.getFileSystem(conf)
    // The rewrite path reads affected leaf files directly (losing hive
    // partition columns) and the carry path would collide identical
    // basenames across partition dirs — so the operator is defined only
    // on flat / non-hive layouts. Detect `col=value` path segments under
    // inPath and fail fast rather than silently dropping rows.
    val inRootUri = fs.makeQualified(new Path(inPath)).toUri
    def relativeTo(root: java.net.URI, file: String): String = {
      val rel = root.relativize(
        fs.makeQualified(new Path(new java.net.URI(file))).toUri).getPath
      require(!rel.split('/').dropRight(1).exists(_.contains("=")),
        s"targetedDelete requires a flat (non-hive-partitioned) layout; " +
          s"found partition directory segment in '$rel' under $inPath")
      rel
    }
    val untouchedRel = untouched.map(f => f -> relativeTo(inRootUri, f))
    affected.foreach(f => relativeTo(inRootUri, f)) // validate before rewrite
    fs.mkdirs(out)
    var deleted = 0L
    if (affected.nonEmpty) {
      val before = rows.filter(_.getAs[Boolean]("__hit"))
        .map(_.getAs[Long]("n_rows")).sum
      val kept = spark.read.parquet(affected.toIndexedSeq: _*)
        .join(broadcast(subj), col(keyCol) === col("__s"), "left_anti")
      val keptPath = s"$outPath/rewritten"
      kept.write.mode(SaveMode.Overwrite).parquet(keptPath)
      val after = spark.read.parquet(keptPath).count()
      deleted = before - after
      // hoist the rewritten part-files up next to the carried files
      fs.listStatus(new Path(keptPath)).foreach { st =>
        if (st.getPath.getName.endsWith(".parquet"))
          fs.rename(st.getPath, new Path(out, st.getPath.getName))
      }
      fs.delete(new Path(keptPath), true)
    }
    untouchedRel.foreach { case (f, rel) =>
      val src = new Path(new java.net.URI(f))
      val dst = new Path(out, rel) // preserve layout: no basename collisions
      fs.mkdirs(dst.getParent)
      FileUtil.copy(fs, src, fs, dst, false, conf)
    }
    (rows.length.toLong, affected.length.toLong, deleted)
  }

  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long = 128L << 20,
              sortWithin: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val src = new Path(inPath)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes = {
      val it = fs.listFiles(src, true)
      var sum = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) sum += f.getLen
      }
      sum
    }
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val src0 = spark.read.parquet(inPath)
    val repacked =
      if (sortWithin.isEmpty) src0.repartition(nFiles)
      else src0.repartitionByRange(nFiles, sortWithin.map(col): _*)
        .sortWithinPartitions(sortWithin.map(col): _*)
    repacked.write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }
}
