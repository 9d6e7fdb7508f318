package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.ops.CoreOps

/** Structured Streaming tier (SURVEY.md §2.G / §7.3 M5). The reference is
  * batch-only with an external daily cron; this module is the streaming
  * re-expression over the `events` table shape: watermarked event-time
  * windows computing the same weekly-stats aggregates, plus a stateful
  * per-user session operator, plus `foreachBatch` reuse of the batch
  * operator library.
  */
object EventsStreaming {

  /** `events` schema for file streams (FIXTURES.md §1, ts as proper
    * timestamp — streaming sources don't hit the nanos-parquet issue
    * because tests stage the data through this schema).
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventsSchema).parquet(dir)

  /** Watermarked tumbling event-time windows with the batch tier's
    * aggregate set. Approximations are forced by the streaming model, not
    * chosen: exact `count_distinct` is unsupported in streaming
    * aggregations (unbounded per-group state), so `approx_count_distinct`
    * at 1% rsd stands in; medians over unbounded streams need a mergeable
    * sketch (`percentile_approx`).
    *
    * `startTime` defaults to "4 days": tumbling windows align to the UTC
    * epoch, and 1970-01-01 is a Thursday — the offset shifts 7-day buckets
    * to Monday starts, matching the batch tier's `date_trunc('week')`
    * (CoreOps.weekStart) under the UTC session timezone this project pins
    * everywhere (build.sbt / Verify); a non-UTC deployment would need an
    * offset incorporating its zone. Spark requires startTime < window, so
    * callers passing a sub-4-day `window_` must also pass a suitable
    * `startTime` (e.g. "0 seconds"); Monday alignment only makes sense
    * for multiples of 7 days in the first place.
    */
  def windowedStats(events: DataFrame, window_ : String = "7 days",
                    watermark: String = "1 day",
                    startTime: String = "4 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, window_, startTime), col("event_type"))
      .agg(
        approx_count_distinct(col("event_id"), 0.01).as("transactions"),
        CoreOps.rnd(avg(col("value"))).as("value_mean"),
        CoreOps.rnd(percentile_approx(col("value"), lit(0.5), lit(10000)))
          .as("value_median"))

  /** Watermarked weekly distinct-user ESTIMATE via a mergeable HLL
    * sketch — the streaming face of the batch sketch tier
    * ([[graft.ops.SketchOps]]): exact `count_distinct` is impossible in a
    * stream (unbounded per-group state), but an HLL register array is
    * fixed-size (2^lgK bytes), mergeable across micro-batches, and its
    * estimate is deterministic for a given input SET — order-insensitive,
    * so the micro-batch arrival order cannot change the answer. This is
    * the 100 TB shape for "distinct users per window, continuously":
    * KB-scale state per window, append-mode emission when the watermark
    * closes the window.
    *
    * Window alignment matches [[windowedStats]]: 7-day tumbling windows
    * offset by `startTime` 4 days so buckets start Monday, agreeing with
    * the batch tier's `CoreOps.weekStart` under the pinned UTC session.
    */
  def weeklyDistinctSketch(events: DataFrame, watermark: String = "1 day",
                           lgK: Int = 12): DataFrame =
    events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(lgK))).as("users_est"))
      .select(col("window.start").as("week"), col("users_est"))

  /** Stream-static broadcast enrichment feeding a watermarked windowed
    * rollup — THE standard streaming enrich shape: a dimension table
    * (bounded, re-read per micro-batch) broadcast-joins onto the stream
    * BEFORE the stateful aggregation, so state is keyed by the enriched
    * category (|categories| ≤ |event types|), never the raw key, and no
    * shuffle of the stream side precedes the join. Inner join: an event
    * type absent from the dimension is unclassified traffic and drops —
    * pair with a coverage expectation on the dim when that must alarm.
    *
    * count/sum are exact in streaming aggregations (unlike distincts),
    * so the emitted windows grade EXACTLY against the batch oracle —
    * cent-quantized sums, the same week alignment as [[windowedStats]].
    */
  def enrichedWindowTotals(events: DataFrame, dim: DataFrame,
                           window_ : String = "7 days",
                           watermark: String = "1 day"): DataFrame =
    events
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(window(col("ts"), window_, window_, "4 days"),
        col("category"))
      .agg(count(lit(1)).as("events"),
        sum(CoreOps.moneyCents(col("value")).cast("long")).as("cents"))

  /** Event-time session windows: built-in merging session state, append
    * output after the watermark closes a session. Gap semantics match the
    * batch [[graft.ops.Sessionize]] operator EXCEPT exactly at the
    * boundary: `session_window` ranges are end-exclusive `[start,
    * last + gap)`, so an event arriving exactly `gap` after the previous
    * one opens a NEW session here, while the batch operator's strict
    * `delta > gap` test keeps it in the same session. An inherent
    * engine-semantics difference — documented rather than papered over.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        CoreOps.rnd(sum(col("value"))).as("total"))

  final case class UserSession(userId: Long, nEvents: Long, total: Double)

  /** Stateful per-user running session aggregate — the
    * `mapGroupsWithState` pattern for custom state the built-in windows
    * can't express. NoTimeout on purpose: declaring ProcessingTimeTimeout
    * without ever arming it makes the micro-batch engine trigger
    * continuous empty batches (each paying checkpoint I/O), which
    * live-locks `processAllAvailable`.
    */
  def userSessions(events: DataFrame): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // drop null keys/values before the primitive-tuple decode: the schema
    // declares both nullable, and one null row would kill the whole query
    // at the encoder — the batch analogs (Sessionize, sum/avg) skip nulls
    events.select(col("user_id"), col("value"))
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], st: GroupState[UserSession]) =>
          val prev = st.getOption.getOrElse(UserSession(uid, 0L, 0.0))
          val (n, tot) = rows.foldLeft((prev.nEvents, prev.total)) {
            case ((c, t), (_, v)) => (c + 1, t + v)
          }
          val next = UserSession(uid, n, tot)
          st.update(next)
          next
      }
  }

  final case class SessionState(start: Long, lastTs: Long, nEvents: Long,
                                total: Double)
  final case class ClosedSession(userId: Long, startTs: java.sql.Timestamp,
                                 endTs: java.sql.Timestamp, nEvents: Long,
                                 total: Double)

  /** Gap-closed sessions emitted only when FINAL —
    * `flatMapGroupsWithState` with an event-time timeout, the custom-state
    * pattern the built-in `session_window` cannot express (it emits
    * aggregates on the engine's schedule; this emits exactly one row per
    * finished session, which is what a downstream writer keyed on whole
    * sessions needs).
    *
    * A session is emitted only once the WATERMARK passes its end + gap —
    * not merely when a later event opens a gap inside one micro-batch:
    * until the watermark rules it out, a late event can still bridge that
    * gap, and an append-mode row is unretractable. So the state holds ALL
    * of a user's not-yet-final sessions (each a 4-field aggregate, never
    * raw events): incoming events enter as unit sessions, the list is
    * re-merged with the strict `delta > gap` split of the batch
    * [[graft.ops.Sessionize]] (a late bridging event CONCATENATES two held
    * sessions), finalized sessions flow out, and the timeout re-arms at
    * the earliest surviving end + gap. Null-value events still extend and
    * bridge sessions — only their value is skipped (sum semantics), like
    * the batch operator. State is bounded by sessions inside the
    * watermark horizon per active user, not by history.
    */
  def closedSessions(events: DataFrame, gapMs: Long = 1800000L,
                     watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         st: GroupState[List[SessionState]]) =>
          // One code path serves both deliveries (new data and timeout):
          // fold events into the held sessions, emit whatever the
          // watermark has made final, keep the rest.
          val incoming = rows
            .map(r => SessionState(r._2.getTime, r._2.getTime, 1L, r._3))
          val merged = (st.getOption.getOrElse(Nil) ++ incoming)
            .sortBy(s => (s.start, s.lastTs))
            .foldLeft(List.empty[SessionState]) { (acc, s) =>
              acc match {
                case h :: t if s.start - h.lastTs <= gapMs =>
                  SessionState(h.start, math.max(h.lastTs, s.lastTs),
                    h.nEvents + s.nEvents, h.total + s.total) :: t
                case _ => s :: acc
              }
            }.reverse
          // Late rows below the watermark never reach this function, so a
          // session whose end + gap the watermark passed can never gain
          // another member — emitting it now is exact, not approximate.
          val wm = st.getCurrentWatermarkMs()
          val (done, open) = merged.partition(_.lastTs + gapMs <= wm)
          if (open.nonEmpty) {
            st.update(open)
            // every open session has end + gap > wm by the partition above,
            // so this timestamp is always legal (strictly past the watermark)
            st.setTimeoutTimestamp(open.map(_.lastTs + gapMs).min)
          } else st.remove()
          done.iterator.map(s => ClosedSession(uid,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs),
            s.nEvents, s.total))
      }
  }

  final case class ZState(n: Long, mean: Double, m2: Double)
  final case class ScoredEvent(dim: String, eventId: Long,
                               ts: java.sql.Timestamp, value: Double,
                               z: Double, nSeen: Long)

  /** Streaming per-key z-score anomaly scoring — the streaming analog of
    * the batch [[graft.ops.Anomaly]] stage (reference etl_main.py:260-282),
    * via Welford running moments held in `mapGroupsWithState`-style state:
    * per key, (n, mean, M2) — THREE numbers, never the history — updated
    * per event, each event scored against the statistics of everything
    * seen up to and including it (what the batch z-score would report had
    * the stream ended there; the final event per key matches the batch
    * computation exactly, pinned by spec). ddof = 1 (`stddev_samp`) and
    * the std==0/n<2 → z=0 guard, both matching the batch operator.
    *
    * Within a micro-batch the group iterator's order is not guaranteed, so
    * events sort by (ts, id) before folding — deterministic replay per
    * batch; across batches order is arrival order, as any online scorer.
    * The sort MATERIALIZES each key's micro-batch slice on the executor
    * (`rows.toSeq`): the cross-batch STATE is three numbers, but a hot key
    * in a large micro-batch buffers that batch's rows in memory — size
    * triggers (maxFilesPerTrigger / maxBytesPerTrigger) bound it in
    * deployment. State is O(keys), unconditionally bounded — no watermark
    * needed for correctness (scores are append-only facts, never
    * retracted).
    */
  def runningZScores(events: DataFrame): Dataset[ScoredEvent] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
      // every guarded field is schema-nullable: a NULL event_id would kill
      // the query at the primitive-Long encoder, a NULL ts at .getTime —
      // same guards as userSessions/closedSessions
      .where(col("event_type").isNotNull && col("value").isNotNull
        && col("event_id").isNotNull && col("ts").isNotNull)
      .as[(String, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (dim: String, rows: Iterator[(String, Long, java.sql.Timestamp, Double)],
         st: GroupState[ZState]) =>
          var s = st.getOption.getOrElse(ZState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(r => (r._3.getTime, r._2)).map {
            case (_, id, ts, v) =>
              val n1 = s.n + 1
              val delta = v - s.mean
              val mean1 = s.mean + delta / n1
              val m21 = s.m2 + delta * (v - mean1)
              s = ZState(n1, mean1, m21)
              val std = if (n1 >= 2) math.sqrt(m21 / (n1 - 1)) else 0.0
              val z = if (std == 0.0) 0.0 else (v - mean1) / std
              ScoredEvent(dim, id, ts, v, z, n1)
          }
          st.update(s)
          out.iterator
      }
  }

  /** Stream-stream interval join: pair each event with same-user events of
    * another type within `within` AFTER it (e.g. click → purchase
    * attribution). Both sides carry watermarks and the join condition
    * bounds event time on both ends, so state is evictable — the canonical
    * Structured Streaming join shape that stays O(window) in state.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       within: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("event_type").as("r_type"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .drop("r_user")
  }

  /** LEFT OUTER stream-stream join — the "which events never converted"
    * readout the inner join cannot produce: matched pairs emit as they
    * join; an UNMATCHED left row emits with nulls only once the
    * watermark passes its join window's end (the state store can then
    * prove no match can still arrive). On a finite replay the no-data
    * micro-batch after the last file advances the watermark to
    * max(event ts) − delay, so the emitted null set is DETERMINISTIC:
    * exactly the left rows with no in-window match whose window closed
    * under the final watermark — the batch-replayable contract the
    * graded query's oracle recomputes. Left rows whose window is still
    * open at shutdown stay in state and emit nothing, exactly as a
    * production stream would hold them.
    */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame,
                           within: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("event_type").as("r_type"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"),
      "leftOuter")
      .drop("r_user")
  }

  /** Streaming exact dedup by content digest — the streaming analog of
    * [[graft.ops.Dedup.dropExact]]: first delivery of a payload wins,
    * re-deliveries and content duplicates are dropped.
    * `dropDuplicatesWithinWatermark` holds a digest in state only until
    * the watermark passes it, so state is bounded by the dedup horizon
    * (event-time window) instead of growing with the whole corpus —
    * exactly the trade a 100 TB ingest stream needs. Hashing first means
    * state stores a 32-char digest, never the payload.
    */
  def streamingDedup(stream: DataFrame, contentCol: String,
                     tsCol: String = "ts",
                     watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__digest", md5(col(contentCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** `foreachBatch` bridge: every micro-batch flows through a caller-given
    * batch transformation (reusing the batch operator library unchanged)
    * before the write.
    */
  def foreachBatchWriter(stream: DataFrame, transform: DataFrame => DataFrame)
                        (write: (DataFrame, Long) => Unit) =
    stream.writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, id: Long) => write(transform(batch), id) }
}
