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

  /** sessionization via mapGroupsWithState: a session closes after
    * `gapMinutes` of inactivity (processing-time timeout in streaming;
    * in batch the state function is fed all events per user at once). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          // batch semantics: split the ordered event stream into gap-based sessions
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
          if (cur.count > 0) sessions += UserSession(userId, cur.count, cur.total, cur.lastTs)
          state.update(SessionState(0, 0.0, Long.MinValue))
          sessions.iterator
      }
  }

  /** file-source streaming ingestion of events parquet into windowed counts;
    * returns the streaming DataFrame (caller attaches writeStream). */
  def streamFromDir(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    windowedCounts(stream)
  }
}
