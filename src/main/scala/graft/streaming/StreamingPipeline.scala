package graft.streaming

import graft.compile.StageCompiler
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming variant of the stage pipeline — an EXTENSION beyond
 * the reference (which is strictly batch, SURVEY §1.1/§2.7): the same
 * Stage ADT applied to an unbounded stream.
 *
 * Streamability per stage type:
 *  - FILTER / SELECT / CUSTOM(stateless SQL): map 1:1.
 *  - JOIN: stream-static joins supported (the static side is a lookup
 *    table, e.g. a dimension); stream-stream needs watermarks on both
 *    sides — out of scope for the stage algebra, but available as the
 *    standalone [[intervalJoinStream]] (bounded-state interval join).
 *  - GROUP / AGGREGATE: supported as windowed aggregations with a
 *    watermark (append mode) or running aggregates (update mode).
 *  - SORT / UNION-distinct: unbounded total sort / global dedup are not
 *    computable on an infinite stream in append mode — rejected up front
 *    with a clear error instead of failing deep inside Spark.
 */
object StreamingPipeline {

  /** Guard for stateful operators that bucket days as UTC epoch days
    * (closure arithmetic on `Timestamp.getTime`) while their batch
    * twins bucket with session-timezone `to_date`: the documented
    * digit-identical cross-check only holds under a UTC session, so a
    * non-UTC one is rejected loudly instead of silently shifting
    * near-midnight events across a day boundary. */
  private[graft] def requireUtcSession(
      spark: org.apache.spark.sql.SparkSession, op: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"$op buckets events into UTC epoch days but the session timezone " +
        s"is '$tz'; its batch twin uses session-timezone to_date, so " +
        "batch/stream parity requires spark.sql.session.timeZone=UTC " +
        "(GraftSession.builder pins it)")
  }

  def unsupported(stage: Stage): Option[String] = stage match {
    case _: SortStage => Some("SORT: total order over an unbounded stream is undefined; sort per micro-batch downstream instead")
    case u: UnionStage if u.unionType.toUpperCase != "UNION ALL" =>
      Some("UNION (distinct): global dedup over a stream needs a watermarked dropDuplicates")
    case _ => None
  }

  /** Fold stateless stages over a streaming DataFrame. */
  def applyStages(spark: SparkSession, stream: DataFrame, stages: Seq[Stage],
                  lookup: String => DataFrame = Map.empty): DataFrame =
    stages.foldLeft(stream) { (df, stage) =>
      unsupported(stage).foreach(msg =>
        throw new UnsupportedOperationException(s"stage ${stage.id}: $msg"))
      stage match {
        case FilterStage(_, _, _, conditions) =>
          df.filter(StageCompiler.compilePredicate(df, conditions))
        case SelectStage(_, _, _, columns) => df.selectExpr(columns: _*)
        case JoinStage(_, _, joinType, _, rightTable, leftKey, rightKey) =>
          // stream-static join; the static side resolves via lookup
          StageCompiler.compileJoin(df, lookup(rightTable), joinType, leftKey, rightKey)
        case UnionStage(_, _, _, tables) =>
          tables.map(lookup).foldLeft(df)(_ union _) // UNION ALL only (gated above)
        case other =>
          throw new UnsupportedOperationException(
            s"stage ${other.id} (${other.stageType}) is not streamable here")
      }
    }

  /**
   * Watermarked tumbling-window aggregation over an events-shaped stream —
   * the streaming analogue of a GROUP stage. Late rows beyond
   * `watermarkDelay` are dropped; in append mode a window emits once,
   * when the watermark passes its end.
   */
  def windowedAggregate(stream: DataFrame, tsCol: String, keyCol: String,
                        window: String = "1 hour",
                        watermarkDelay: String = "10 minutes",
                        aggregations: Seq[Aggregation] =
                          Seq(Aggregation("count", "*", Some("n")))): DataFrame = {
    val aggCols = aggregations.map(StageCompiler.aggColumn)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /**
   * Streaming exact dedup: watermarked dropDuplicates on a content key —
   * state is bounded by the watermark horizon (the 100 TB/day-safe way to
   * dedup a stream; unbounded-state dedup OOMs by design).
   */
  def dedupStream(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermarkDelay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /**
   * STREAM-STREAM interval join: points arriving on one stream matched
   * to time ranges arriving on another (`rangeStart <= pointTs <
   * rangeEnd`, plus optional key equality; output keeps the point
   * side's key copy, like the batch [[graft.operators.IntervalJoin]]).
   *
   * Spark can only run a stream-stream join with BOUNDED state, and the
   * bound must be readable from the join condition on the two
   * WATERMARKED columns — `pointTs ∈ [rangeStart, rangeStart +
   * maxRangeWidth]` is that bound (`maxRangeWidth` = the widest range
   * you'll ever emit; ranges wider than it are silently clipped out of
   * matches beyond the bound, so size it from the range source's
   * contract). Each side keeps `watermarkDelay` + `maxRangeWidth` of
   * state, evicted by the joint watermark — the forever-runnable shape.
   * The exact `pointTs < rangeEnd` refine rides along as an ordinary
   * predicate.
   */
  def intervalJoinStream(points: DataFrame, ranges: DataFrame,
                         pointTs: String, rangeStart: String,
                         rangeEnd: String, keys: Seq[String] = Nil,
                         maxRangeWidth: String = "1 day",
                         watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = points.withWatermark(pointTs, watermarkDelay)
    val r = ranges.withWatermark(rangeStart, watermarkDelay)
    val stateBound =
      p(pointTs) >= r(rangeStart) &&
        p(pointTs) <= r(rangeStart) + expr(s"INTERVAL $maxRangeWidth") &&
        p(pointTs) < r(rangeEnd)
    val cond = keys.map(k => p(k) === r(k))
      .foldLeft(stateBound)(_ && _)
    keys.map(r(_)).foldLeft(p.join(r, cond, "inner"))(_.drop(_))
  }

  /**
   * Streaming write-audit-publish sink body for `foreachBatch`: each
   * micro-batch lands in its own `basePath/batch_<id>` directory via
   * the batch [[graft.sources.Writer.writeAuditPublish]] — staged
   * write, Expect-rule audit over the STAGED files, `_AUDIT.json`,
   * atomic rename. A batch that fails its audit throws, which fails
   * the streaming query BEFORE anything becomes visible: downstream
   * readers only ever see fully-audited batch directories, and a
   * restart re-processes the failed batch from the checkpoint (the
   * rename is idempotent — re-publishing batch N replaces batch N).
   *
   * Usage: `stream.writeStream.foreachBatch(wapBatchSink(path, rules))
   * .option("checkpointLocation", …).start()`.
   */
  def wapBatchSink(basePath: String,
                   rules: Seq[graft.operators.Expect.Rule])
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    if (!batch.isEmpty) {
      graft.sources.Writer.writeAuditPublish(
        batch, s"$basePath/batch_$batchId", rules)
      ()
    }
  }

  /** Open session carried in state: event-time bounds + event count. */
  final case class SessionState(start: Long, end: Long, n: Long)

  /** A closed session, emitted when its gap expires. */
  final case class Session(key: String, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /**
   * Event-time sessionization — custom state via
   * `flatMapGroupsWithState` (the stage algebra's built-ins can't express
   * gap-based session windows): events for a key belong to one session
   * while consecutive gaps stay ≤ `gap`; a session closes (and is
   * emitted, append mode) when the event-time watermark passes its end +
   * gap. State per key is ONE open session (start, end, count) — bounded
   * by key cardinality, evicted by event-time timeout, so this runs
   * forever on an unbounded stream.
   */
  def sessionize(stream: DataFrame, tsCol: String, keyCol: String,
                 gap: String = "30 minutes",
                 watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMillis = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    require(gapMs.months == 0, "session gap must be a fixed duration")

    stream
      .select(col(keyCol).cast("string").as("key"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay) // after the cast — a projection re-keys the attribute and would drop the watermark tag
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            // merge this batch's event times (sorted — micro-batches are
            // unordered) into the open session, closing on gap violations
            val times = events.map(_._2.getTime).toArray.sorted
            var closed = List.empty[SessionState]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMillis =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= s
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.reverse.iterator.map(s => Session(key,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n))
          }
      }.toDF()
  }

  final case class RateState(n: Long)

  /** An admitted event (streaming rate limiter output). */
  final case class Admitted(key: String, ts: java.sql.Timestamp, tie: Long)

  /**
   * Streaming-legal per-key rate cap — the continuous-ingest counterpart
   * of `Sample.rateLimit` (whose `row_number` window is not streamable):
   * admit at most `maxPerWindow` events per (key, tumbling event-time
   * bucket). State per open (key, bucket) is ONE admitted-count —
   * bounded by keys × open buckets and evicted by event-time timeout
   * when the watermark passes the bucket end (no more admissible
   * events can exist past that point), so this runs forever.
   *
   * Parity caveat (inherent to streaming, stated honestly): within a
   * micro-batch events are event-time-sorted with a `tieCol` tiebreak,
   * so when a bucket's events arrive in one batch the admitted set
   * EQUALS the batch operator's; events split across batches are
   * admitted first-batch-first — a later batch cannot displace an
   * already-admitted event.
   */
  def rateLimit(stream: DataFrame, tsCol: String, keyCol: String,
                tieCol: String, windowSeconds: Long, maxPerWindow: Int,
                watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(windowSeconds > 0 && maxPerWindow >= 1, "bad rate-limit params")
    val spark = stream.sparkSession
    import spark.implicits._
    val bucketMillis = windowSeconds * 1000L

    stream
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"), col(tieCol).cast("long").as("tie"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(r => (r._1, r._2.getTime / bucketMillis))
      .flatMapGroupsWithState[RateState, Admitted](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (kb, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = events.toArray.sortBy(e => (e._2.getTime, e._3))
            val already = state.getOption.map(_.n).getOrElse(0L)
            val room = math.max(maxPerWindow - already, 0L).toInt
            val admitted = sorted.take(room)
            state.update(RateState(already + admitted.length))
            // evict once the watermark passes the bucket end: every
            // later event of this bucket would be watermark-late anyway
            state.setTimeoutTimestamp((kb._2 + 1) * bucketMillis)
            admitted.iterator.map(e => Admitted(e._1, e._2, e._3))
          }
      }.toDF()
  }

  final case class FunnelState(step: Int, times: List[Long])
  final case class FunnelCompletion(key: String,
                                    funnel_start: java.sql.Timestamp,
                                    funnel_end: java.sql.Timestamp,
                                    duration_ms: Long)

  /**
   * Streaming ordered-funnel tracking — the continuous version of
   * [[graft.operators.Funnel]]: per key, advance a step cursor on each
   * event that matches the NEXT step strictly after the previous step's
   * time (the same greedy earliest-next matching as the batch operator,
   * so the first streaming completion per key equals the batch
   * `Funnel.completions` row — cross-checked in the spec). On full
   * completion a row is emitted and the cursor resets, so repeat
   * conversions each count (the streaming-native semantic; batch reports
   * first-completions).
   *
   * State per key is one (step, prefix-times) cursor — bounded by steps
   * length × key cardinality. Events are event-time-sorted within each
   * micro-batch; an event later than the watermark that should have
   * advanced the cursor earlier is missed — the standard lateness trade,
   * same as [[sessionize]].
   */
  def funnel(stream: DataFrame, tsCol: String, keyCol: String,
             typeCol: String, steps: Seq[String],
             watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(typeCol).cast("string").as("et"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state) =>
          val evs = events.map(e => (e._2.getTime, e._3)).toArray.sortBy(_._1)
          var st = state.getOption.getOrElse(FunnelState(0, Nil))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelCompletion]
          evs.foreach { case (t, et) =>
            if (st.step < steps.length && et == steps(st.step) &&
              (st.times.isEmpty || t > st.times.head)) {
              st = FunnelState(st.step + 1, t :: st.times)
              if (st.step == steps.length) {
                val start = st.times.last
                out += FunnelCompletion(key, new java.sql.Timestamp(start),
                  new java.sql.Timestamp(t), t - start)
                st = FunnelState(0, Nil)
              }
            }
          }
          if (st.step == 0) state.remove() else state.update(st)
          out.iterator
      }.toDF()
  }

  final case class ConvState(lastTs: Long, turns: List[(Long, String, String)])
  final case class Conversation(conv_id: String, n_turns: Long, rendered: String)

  /**
   * Streaming SFT conversation assembly — the continuous counterpart of
   * [[graft.operators.Sft.renderChatML]]: turns buffer per conversation
   * id in state; when the event-time watermark passes the last turn's
   * time + `gap` (no further turns can legally arrive), the conversation
   * closes and emits ONE rendered ChatML string. Turn order is the
   * explicit turn index with the batch operator's full (turn, role,
   * content) tiebreak, and the markup is byte-identical to
   * `renderChatML` — parity cross-checked in the spec.
   *
   * State per open conversation is its turn list — bounded by open
   * conversations × turns and evicted by the event-time timeout, so this
   * runs forever on an unbounded stream. (A conversation longer than the
   * executor's memory share should be length-capped upstream; a chat
   * log's turn count is bounded by construction.)
   */
  def assembleConversations(stream: DataFrame, tsCol: String, convCol: String,
                            turnCol: String, roleCol: String, contentCol: String,
                            gap: String = "30 minutes",
                            watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, "conversation gap must be a fixed duration")
    val gapMillis = iv.days * 86400000L + iv.microseconds / 1000L

    stream
      .select(col(convCol).cast("string").as("conv"),
        col(tsCol).cast("timestamp").as("ts"),
        col(turnCol).cast("long").as("turn"),
        col(roleCol).cast("string").as("role"),
        col(contentCol).cast("string").as("content"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ConvState, Conversation](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (conv, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val ordered = s.turns.sortBy(identity)
            val rendered = ordered.map { case (_, role, content) =>
              s"<|im_start|>$role\n$content<|im_end|>\n"
            }.mkString
            Iterator(Conversation(conv, ordered.length.toLong, rendered))
          } else {
            val batch = rows.toList
            val lastTs = (state.getOption.map(_.lastTs).getOrElse(Long.MinValue) ::
              batch.map(_._2.getTime)).max
            val turns = state.getOption.map(_.turns).getOrElse(Nil) :::
              batch.map(r => (r._3, r._4, r._5))
            state.update(ConvState(lastTs, turns))
            state.setTimeoutTimestamp(lastTs + gapMillis)
            Iterator.empty
          }
      }.toDF()
  }

  /**
   * Running unordered pair-count table over a stream of
   * `(winner, loser)` comparison outcomes: `(i, j, n, win_i)` with
   * `i < j` — the sufficient statistic for Bradley–Terry, maintained
   * incrementally (update/complete mode running aggregate, state =
   * |item-pairs| rows, never the comparison history). Per trigger, a
   * `foreachBatch` hands the table to
   * `Preference.bradleyTerryFromPairs` for an items-sized MM refit —
   * live arena ratings without ever replaying the stream
   * (StreamingArenaCrossCheckSpec proves batch/stream agreement).
   */
  def arenaPairCounts(stream: DataFrame, winnerCol: String,
                      loserCol: String): DataFrame =
    stream.select(col(winnerCol).cast("long").as("__w"),
        col(loserCol).cast("long").as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
      .select(least(col("__w"), col("__l")).as("i"),
        greatest(col("__w"), col("__l")).as("j"),
        (col("__w") < col("__l")).cast("long").as("__iw"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("__iw")).as("win_i"))

  /**
   * Streaming win-rate leaderboard: per-item `(item, games, wins,
   * win_rate)` as a running aggregate (state = |items| rows). Rank is
   * deliberately absent — a global window over a streaming aggregate
   * isn't incrementally computable; consumers rank the items-sized
   * result per trigger (or in `foreachBatch`). Arithmetic matches
   * `Preference.leaderboard` minus rank.
   */
  def leaderboardStream(stream: DataFrame, winnerCol: String,
                        loserCol: String): DataFrame =
    stream.select(col(winnerCol).cast("long").as("__w"),
        col(loserCol).cast("long").as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
      .select(explode(array(
        struct(col("__w").as("item"), lit(1L).as("__v")),
        struct(col("__l").as("item"), lit(0L).as("__v")))).as("__e"))
      .select(col("__e.item"), col("__e.__v"))
      .groupBy("item")
      .agg(count(lit(1)).as("games"), sum(col("__v")).as("wins"))
      .withColumn("win_rate",
        round(col("wins").cast("double") / col("games"), 6))

  final case class PsiWindowState(counts: Map[String, Long])

  /** One closed monitoring window (streaming PSI output). */
  final case class PsiWindow(window_start: java.sql.Date, n: Long,
                             psi: Double)

  /**
   * Streaming PSI drift monitor — `Drift.psiWindowed`'s continuous
   * twin (cross-checked row-for-row in StreamingPsiCrossCheckSpec):
   * events bucket into the SAME epoch-aligned `windowDays` tumbles (a
   * pure function of the timestamp — no state needed to assign), a
   * per-window value histogram accumulates as GroupState (bounded by
   * open windows × value domain), and when the event-time watermark
   * passes a window's end the window closes and emits ONE
   * `(window_start, n, psi)` row against the STATIC reference
   * distribution (collected once — |domain| rows, the bounded-collect
   * class of the centroid matrices). NULL values drop, matching the
   * batch twin.
   *
   * The PSI arithmetic replays the batch operator digit-for-digit:
   * 9-dp ε-floored shares over the window ∪ reference domain, 9-dp
   * terms summed exactly (BigDecimal — the closure's stand-in for the
   * plan's DECIMAL(20,9) accumulator), 6-dp publish.
   *
   * REQUIRES a UTC session (asserted): windows bucket on UTC epoch
   * days (`getTime / 86400000`) because the event-time TIMEOUT must be
   * an absolute instant, while the batch twin buckets with
   * session-timezone `to_date` — the documented digit-identical
   * cross-check only holds when the session timezone is UTC (which
   * [[graft.GraftSession]] pins). A non-UTC session would silently
   * shift events near midnight into the neighboring window, so it is
   * rejected up front instead.
   */
  def psiStream(stream: DataFrame, tsCol: String, valueCol: String,
                reference: DataFrame, windowDays: Int = 7,
                watermarkDelay: String = "1 day",
                epsilon: Double = 1e-4): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(epsilon > 0, "epsilon must be positive")
    val spark = stream.sparkSession
    requireUtcSession(spark, "psiStream")
    import spark.implicits._
    val refRows = reference
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("n")).collect()
    val refTotal = refRows.map(_.getLong(1)).sum.toDouble
    val refP: Map[String, Double] =
      refRows.map(r => r.getString(0) -> r.getLong(1) / refTotal).toMap
    // valueOf (= Double.toString) semantics — what Spark's round() uses;
    // the exact-binary constructor would split on half-way cases
    def r9(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP)
    def psiOf(counts: Map[String, Long]): Double = {
      val total = counts.values.sum.toDouble
      val domain = counts.keySet ++ refP.keySet
      val sum = domain.foldLeft(java.math.BigDecimal.ZERO) { (acc, v) =>
        val pw = math.max(
          r9(counts.getOrElse(v, 0L) / total).doubleValue(), epsilon)
        val pb = math.max(r9(refP.getOrElse(v, 0.0)).doubleValue(), epsilon)
        acc.add(r9((pw - pb) * math.log(pw / pb)))
      }
      java.math.BigDecimal.valueOf(sum.doubleValue())
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val dayMs = 86400000L
    stream
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(java.sql.Timestamp, String)]
      // key computed INSIDE groupByKey (AppendColumns) — a .map here
      // would re-key the attributes and drop the watermark tag
      .groupByKey { case (ts, _) =>
        val epochDay = ts.getTime / dayMs
        epochDay - (epochDay % windowDays)
      }
      .flatMapGroupsWithState[PsiWindowState, PsiWindow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart, events, state) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            Iterator(PsiWindow(
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(winStart)),
              counts.values.sum, psiOf(counts)))
          } else {
            var counts = state.getOption.map(_.counts)
              .getOrElse(Map.empty[String, Long])
            events.foreach { case (_, v) =>
              counts = counts.updated(v, counts.getOrElse(v, 0L) + 1L)
            }
            state.update(PsiWindowState(counts))
            // close once the watermark passes the end of the window
            state.setTimeoutTimestamp((winStart + windowDays) * dayMs)
            Iterator.empty
          }
      }
      .toDF("window_start", "n", "psi")
  }

  /** Per-day cell inside an open rolling-correlation window: exact
    * DECIMAL sums carried as plain strings (the encoder-proof stand-in
    * for the plan's DECIMAL(28,9) accumulators). */
  final case class RollCell(n: Long, sx: String, sy: String)
  final case class RollCorrState(cells: Map[Long, RollCell])
  final case class RollCorrDay(day: java.sql.Date, x_mean: java.lang.Double,
                               y_mean: java.lang.Double,
                               corr: java.lang.Double)

  /**
   * Streaming rolling correlation —
   * [[graft.operators.Timeseries.rollingCorrelationEndKeyed]]'s
   * continuous twin (cross-checked row-for-row in
   * StreamingRollCorrCrossCheckSpec): every event replicates to the
   * `window` END-day groups its day participates in (a pure projection
   * — `explode(sequence(0, window-1))` before the watermark), each
   * end-day group accumulates per-day exact sums as GroupState
   * (bounded: ≤window day-cells per open window), and when the
   * event-time watermark passes the end day the window closes and
   * emits ONE `(day, x_mean, y_mean, corr)` row — only for OBSERVED
   * end days, the end-keyed batch contract.
   *
   * The arithmetic replays the batch plan digit-for-digit: inputs snap
   * to 9 dp in-plan before the closure, per-day sums accumulate as
   * exact BigDecimal, daily means round to 9 dp, moment sums of
   * 9-dp-rounded products accumulate exactly, and the correlation is
   * the same fixed-order double chain published at 6 dp.
   *
   * REQUIRES a UTC session (asserted) — same epoch-day/timeout-instant
   * contract as [[psiStream]].
   */
  def rollingCorrelationStream(stream: DataFrame, tsCol: String,
                               xCol: String, yCol: String, window: Int = 7,
                               watermarkDelay: String = "1 day"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(window >= 2, s"window must be >= 2, got $window")
    val spark = stream.sparkSession
    requireUtcSession(spark, "rollingCorrelationStream")
    import spark.implicits._
    val dayMs = 86400000L
    def r9(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP)
    def r9d(x: Double): Double = r9(x).doubleValue()
    def r6d(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    stream
      .select(col(tsCol).cast("timestamp").as("ts"),
        round(col(xCol).cast("double"), 9).as("x"),
        round(col(yCol).cast("double"), 9).as("y"),
        explode(sequence(lit(0), lit(window - 1))).as("off"))
      // ts.isNotNull matches the batch twin's filter (a null ts would
      // NPE at ts.getTime inside the groupByKey closure)
      .where(col("ts").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(java.sql.Timestamp, Double, Double, Int)]
      // key computed INSIDE groupByKey, as in psiStream: end day =
      // event's UTC epoch day + its replication offset
      .groupByKey { case (ts, _, _, off) => ts.getTime / dayMs + off }
      .flatMapGroupsWithState[RollCorrState, RollCorrDay](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (endDay, events, state) =>
          if (state.hasTimedOut) {
            val cells = state.get.cells
            state.remove()
            if (!cells.contains(endDay)) Iterator.empty
            else {
              // same fold as the end-keyed batch plan, over the same
              // present cells
              val present = (endDay - window + 1 to endDay)
                .flatMap(dd => cells.get(dd).map(dd -> _))
              val means = present.map { case (dd, c) =>
                val mx = r9d(new java.math.BigDecimal(c.sx)
                  .doubleValue() / c.n)
                val my = r9d(new java.math.BigDecimal(c.sy)
                  .doubleValue() / c.n)
                (dd, mx, my)
              }
              val k = means.size
              def sumExact(f: ((Long, Double, Double)) => Double): Double =
                means.foldLeft(java.math.BigDecimal.ZERO) { (acc, m) =>
                  acc.add(r9(f(m)))
                }.doubleValue()
              val sx = sumExact(_._2); val sy = sumExact(_._3)
              val sxx = sumExact(m => r9d(m._2 * m._2))
              val syy = sumExact(m => r9d(m._3 * m._3))
              val sxy = sumExact(m => r9d(m._2 * m._3))
              val n = k.toDouble
              val covn = r9d(sxy - r9d(sx * sy / n))
              val vxn = r9d(sxx - r9d(sx * sx / n))
              val vyn = r9d(syy - r9d(sy * sy / n))
              val corr: java.lang.Double =
                if (k < window || vxn <= 0.0 || vyn <= 0.0) null
                else r6d(covn / r9d(math.sqrt(vxn) * math.sqrt(vyn)))
              val (_, mxe, mye) = means.find(_._1 == endDay).get
              Iterator(RollCorrDay(
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(endDay)),
                r6d(mxe), r6d(mye), corr))
            }
          } else {
            var cells = state.getOption.map(_.cells)
              .getOrElse(Map.empty[Long, RollCell])
            events.foreach { case (ts, x, y, _) =>
              val dd = ts.getTime / dayMs
              val c = cells.getOrElse(dd, RollCell(0L, "0", "0"))
              cells = cells.updated(dd, RollCell(c.n + 1L,
                new java.math.BigDecimal(c.sx).add(r9(x)).toPlainString,
                new java.math.BigDecimal(c.sy).add(r9(y)).toPlainString))
            }
            state.update(RollCorrState(cells))
            // close once the watermark passes the end of the END day
            state.setTimeoutTimestamp((endDay + 1) * dayMs)
            Iterator.empty
          }
      }
      .toDF("day", "x_mean", "y_mean", "corr")
  }
}
