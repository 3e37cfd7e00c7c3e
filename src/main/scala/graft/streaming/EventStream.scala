package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-streaming operators over the events stream table
  * (builder prompt: readStream → transforms → writeStream; watermarks +
  * windowed aggs; mapGroupsWithState for custom state).
  *
  * All transforms are expressed on an input DataFrame so the same logic runs
  * on a static frame (tests / backfill) and on readStream (production).
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  final case class SessionState(count: Long, total: Double, lastTs: Long)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                               session_end_ts: Long)

  /** 10-minute tumbling window aggregate with a 5-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** sliding-window per-user rate (5-minute window, 1-minute slide). */
  def slidingUserRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** sessionization via flatMapGroupsWithState: a session closes after
    * `gapMinutes` of EVENT-TIME inactivity. In streaming, the still-open
    * session is KEPT in state across microbatches and emitted only when a
    * later event opens a gap or the event-time timeout fires (watermark
    * passes lastTs + gap) — microbatch boundaries never fragment a session,
    * and the timeout is deterministic in event time rather than wall clock.
    * In batch (isStreaming == false) the function sees all events per user
    * at once and the trailing session closes at end of input (timeouts never
    * fire in batch execution).
    *
    * `latenessMinutes` is the watermark delay — the disorder budget ACROSS
    * keys. The 0 default is exact only for GLOBALLY event-time-ordered
    * arrival (the engine's ts-range-staged file replay): with 0, a key whose
    * events lag the global max event time has them dropped as late once
    * other keys advance the watermark (FlatMapGroupsWithStateExec filters
    * rows behind it), fragmenting or losing sessions. Production feeds with
    * cross-key disorder must set it to cover the ingest skew — state then
    * lives `lateness` longer, the standard completeness/state trade. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 latenessMinutes: Long = 0L): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", s"$latenessMinutes minutes")
      else events
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (streaming && state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events: close it
            val open = state.getOption
            state.remove()
            open.filter(_.count > 0)
              .map(c => UserSession(userId, c.count, c.total, c.lastTs)).iterator
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            val sessions = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var cur = state.getOption.getOrElse(SessionState(0, 0.0, Long.MinValue))
            evs.foreach { e =>
              val t = e.ts.getTime
              if (cur.count > 0 && t - cur.lastTs > gapMs) {
                sessions += UserSession(userId, cur.count, cur.total, cur.lastTs)
                cur = SessionState(0, 0.0, Long.MinValue)
              }
              cur = SessionState(cur.count + 1, cur.total + e.value, t)
            }
            if (cur.count > 0) {
              if (streaming) {
                state.update(cur) // stay open across microbatches
                // must stay above the current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                  math.max(cur.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
              } else {
                sessions += UserSession(userId, cur.count, cur.total, cur.lastTs)
                state.remove()
              }
            } else state.remove()
            sessions.iterator
          }
      }
  }

  final case class DedupState(lastEmitTs: Long)
  final case class EmittedEvent(user_id: Long, event_id: Long, ts: Timestamp)

  /** Streaming ingestion dedup with an event-time TTL: an event is emitted
    * iff no event of the same key was EMITTED within `ttl` before it — the
    * suppress-repeats-then-let-through-again semantics a continuous
    * training-data feed needs (a re-crawled page re-enters the corpus only
    * after the TTL, not on every fetch).
    *
    * State is ONE timestamp per key (the last emission), evicted by
    * event-time timeout once the watermark passes lastEmit + ttl. Eviction
    * is semantics-preserving, not merely pragmatic: any later event has
    * event time past the watermark ≥ lastEmit + ttl, so it would be emitted
    * whether or not the state row still existed. Bounded state = keys
    * active within one TTL window, the property that holds at a 100-TB/day
    * feed where all-time key cardinality does not fit anywhere.
    *
    * Deterministic given GLOBALLY ts-ordered arrival at the 0 default
    * lateness (batch sorts each group; a file stream staged in ts-range
    * order arrives that way) — per-key order alone is NOT enough at
    * lateness 0, because another key's events advance the watermark and a
    * lagging key's in-flight events would be filtered as late; feeds with
    * cross-key disorder set `latenessMinutes` to cover it. The chain is
    * the greedy emission chain per key ordered by (ts, event_id). All
    * arithmetic is in MICROSECONDS — the full precision of the timestamp
    * column — so arrival order (µs-ranged files) and the operator's sort
    * agree exactly, with no ms-truncation ties to break differently. Batch
    * execution (isStreaming == false) computes the identical chain in one
    * pass, so the same call serves backfill and the live stream. */
  def dedupWithinTtl(events: Dataset[Event], ttlMinutes: Long,
                     latenessMinutes: Long = 0L): Dataset[EmittedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlUs = ttlMinutes * 60000000L
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", s"$latenessMinutes minutes")
      else events
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[DedupState, EmittedEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[DedupState]) =>
          if (streaming && state.hasTimedOut) {
            state.remove() // watermark ≥ lastEmit + ttl: suppression expired
            Iterator.empty
          } else {
            val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var last = state.getOption.map(_.lastEmitTs)
            val out = scala.collection.mutable.ArrayBuffer.empty[EmittedEvent]
            evs.foreach { e =>
              val t = micros(e.ts)
              if (last.forall(l => t >= l + ttlUs)) {
                out += EmittedEvent(userId, e.event_id, e.ts)
                last = Some(t)
              }
            }
            if (streaming) last.foreach { l =>
              state.update(DedupState(l))
              // timeout is in ms and must stay above the current watermark
              // or Spark rejects it
              state.setTimeoutTimestamp(
                math.max((l + ttlUs) / 1000L + 1, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.iterator
          }
      }
  }

  /** epoch microseconds of a Timestamp (getTime is ms-truncated; the nanos
    * field carries the full sub-second precision). */
  /** STREAM-STREAM interval join (click attribution): every view matched
    * to the same user's clicks landing within `withinMinutes` AFTER it.
    * The time-range condition plus the two watermarks is what makes the
    * join's buffered state FINITE: Spark derives, per side, how long a row
    * can still find a partner (view state lives until the click watermark
    * passes view_ts + within; click state until the view watermark passes
    * click_ts) and evicts behind that — without watermarks a stream-stream
    * join buffers both streams forever. `watermarkMinutes` must cover the
    * ingest disorder: an INNER join then emits exactly the batch-join
    * result (late rows beyond it may be dropped — at-most-once on the
    * late tail, the standard trade; StreamingSpec pins stream ≡ batch).
    * Works identically on static frames (batch backfill), where watermarks
    * are no-ops. */
  def attributedClicks(views: DataFrame, clicks: DataFrame,
                       withinMinutes: Int, watermarkMinutes: Int = 60): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", s"$watermarkMinutes minutes")
    val c = clicks.select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", s"$watermarkMinutes minutes")
    v.join(c,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $withinMinutes MINUTES"))
      .drop("click_user")
  }

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** file-source streaming ingestion of events parquet into windowed counts;
    * returns the streaming DataFrame (caller attaches writeStream). */
  def streamFromDir(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    windowedCounts(stream)
  }
}
