package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The ODF reference is strictly batch (SURVEY.md §2.10) — its "streaming"
  * is repeated batch invocations over growing offset intervals. This module
  * is the genuine streaming counterpart a Spark-native engine adds on top:
  * the same transform functions run unchanged on batch DataFrames (unified
  * API) and on `readStream` sources with watermarks and state.
  *
  * Scale notes: windowed aggregations shuffle on (window, key) and keep
  * per-window state in the state store until the watermark passes; the
  * sessionization keeps one state row per active user with an idle timeout —
  * bounded state, the 100 TB-stream pattern.
  */
object EventPipelines {

  /** Tumbling 1-hour windows per event type; 1-hour watermark bounds state
    * and drops late events. Works on both batch and streaming frames. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("total_value"), col("approx_users"))

  /** Sliding windows: 1-hour window every 15 minutes. */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("w.end").as("bucket_end"), col("n"))

  // --- custom state: sessionization ---------------------------------------

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, nEvents: Long)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, nEvents: Long, durationSec: Long)

  /** Session gap: events from one user within 30 minutes of each other are
    * one session; a session is emitted when the user goes idle past the gap
    * (processing-time timeout in streaming). */
  val SessionGapMs: Long = 30 * 60 * 1000L

  def sessionizeFn(withTimeout: Boolean)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end),
        s.nEvents, (s.end - s.start) / 1000))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= SessionGapMs =>
            // min/max, not assignment: a LATE event from a later micro-batch
            // can carry t < s.end (or even t < s.start) — `end = t` would
            // REWIND the session and corrupt durationSec (r19 review). Late
            // events inside the gap horizon merge into the one tracked
            // session; bounds only ever widen.
            cur = Some(s.copy(start = math.min(s.start, t),
              end = math.max(s.end, t), nEvents = s.nEvents + 1))
          case Some(s) =>
            closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end),
              s.nEvents, (s.end - s.start) / 1000)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (withTimeout) state.setTimeoutDuration(SessionGapMs)
      }
      closed.reverseIterator
    }
  }

  /** Streaming sessionization via flatMapGroupsWithState.
    *
    * `withTimeout = true` (production): idle users' sessions are flushed by
    * a processing-time timeout — note the engine then schedules wake-up
    * micro-batches continuously, which is correct for a deployed stream but
    * makes deterministic testing impossible; tests use `withTimeout = false`
    * where sessions close only when a later event passes the gap. */
  def sessionize(events: Dataset[Event], withTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        sessionizeFn(withTimeout))
  }

  /** File-source streaming reader for an events-shaped directory (the
    * deployment path: new parquet files land, the query incrementally
    * processes them with exactly-once sink semantics). */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Streaming exact dedup: first occurrence of each key wins; duplicate
    * arrivals within the watermark horizon are dropped. State holds one row
    * per key seen and is evicted once the watermark passes the key's event
    * time — bounded state, the streaming twin of `Dedup.exact`. Works on
    * batch frames too (plain dropDuplicates semantics). */
  def dedupStream(events: DataFrame, key: String, tsCol: String = "ts",
      horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(key)

  /** Stream-stream interval join: each action pairs with the same user's
    * trigger events from the preceding `lookback`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so each
    * side's state store holds only rows inside its watermark horizon —
    * without the time bound Spark would have to buffer both streams forever
    * (and rejects the query in Append mode). The non-equi time predicate
    * rides ON TOP of the user_id equi-join: state lookup is hash-on-key,
    * then the interval check — not a cross of the buffers. */
  def correlateStreams(
      triggers: DataFrame,
      actions: DataFrame,
      lookback: String = "30 minutes"): DataFrame = {
    val t = triggers
      .selectExpr("user_id AS t_user", "ts AS t_ts", "event_id AS t_event")
      .withWatermark("t_ts", "1 hour")
    val a = actions
      .selectExpr("user_id AS a_user", "ts AS a_ts", "event_id AS a_event", "value")
      .withWatermark("a_ts", "1 hour")
    a.join(t,
      expr(s"""a_user = t_user AND
              |t_ts BETWEEN a_ts - INTERVAL $lookback AND a_ts""".stripMargin))
      .select(col("a_user").as("user_id"), col("t_event"), col("a_event"),
        col("t_ts"), col("a_ts"), col("value"))
  }
}
