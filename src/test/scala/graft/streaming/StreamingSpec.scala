package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming behavior: incremental windowed aggregation with watermark,
  * late-data drop, and stateful sessionization with timeout. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("hourlyStats over a MemoryStream: incremental windows, watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val events = input.toDF().toDF("ts", "event_type", "user_id", "value")

    val query = EventPipelines.hourlyStats(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()

    // batch 1: two events in hour 10, one in hour 11
    input.addData(
      (ts("2024-01-01T10:05:00Z"), "view", 1L, 1.0),
      (ts("2024-01-01T10:45:00Z"), "view", 2L, 2.0),
      (ts("2024-01-01T11:10:00Z"), "click", 1L, 5.0))
    query.processAllAvailable()
    // append mode: nothing emitted until the watermark passes hour 10
    // batch 2: advance event time past hour 11 + watermark(1h) → hour-10
    // window closes; also send a too-late hour-10 event that must be dropped
    input.addData((ts("2024-01-01T13:30:00Z"), "view", 3L, 1.0))
    query.processAllAvailable()
    input.addData((ts("2024-01-01T10:59:00Z"), "view", 9L, 99.0)) // late: watermark is 12:30
    query.processAllAvailable()
    input.addData((ts("2024-01-01T15:00:00Z"), "view", 3L, 1.0)) // closes hour 11 too
    query.processAllAvailable()

    val out = spark.table("hourly").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2)))
      .toSet
    query.stop()

    assert(out.contains(("2024-01-01T10:00:00Z", "view", 2L)), s"got $out") // late event NOT counted
    assert(out.contains(("2024-01-01T11:00:00Z", "click", 1L)), s"got $out")
  }

  test("sessionize: gap-based sessions close on timeout, state is bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[EventPipelines.Event]
    val sessions = EventPipelines.sessionize(input.toDS(), withTimeout = false)

    val query = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two bursts separated by > 30 min (second burst closes first session)
    input.addData(
      EventPipelines.Event(1L, ts("2024-01-01T10:00:00Z"), "view", 1.0),
      EventPipelines.Event(1L, ts("2024-01-01T10:10:00Z"), "click", 1.0))
    query.processAllAvailable()
    input.addData(
      EventPipelines.Event(1L, ts("2024-01-01T12:00:00Z"), "view", 1.0))
    query.processAllAvailable()

    val out = spark.table("sessions").as[EventPipelines.Session].collect()
    query.stop()

    assert(out.length == 1, s"got ${out.toSeq}")
    assert(out.head.user_id == 1L)
    assert(out.head.nEvents == 2L)
    assert(out.head.durationSec == 600L)
  }

  test("sessionize: a cross-batch late event widens the session, never rewinds it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[EventPipelines.Event]
    val sessions = EventPipelines.sessionize(input.toDS(), withTimeout = false)
    val query = sessions.writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()

    // batch 1 establishes [10:00, 10:20]; batch 2 delivers a LATE event at
    // 10:10 (t < state.end, within the gap) — pre-r19 the update wrote
    // end = t, REWINDING the session to [10:00, 10:10] and corrupting
    // durationSec; batch 3 closes it.
    input.addData(
      EventPipelines.Event(7L, ts("2024-01-01T10:00:00Z"), "view", 1.0),
      EventPipelines.Event(7L, ts("2024-01-01T10:20:00Z"), "click", 1.0))
    query.processAllAvailable()
    input.addData(
      EventPipelines.Event(7L, ts("2024-01-01T10:10:00Z"), "view", 1.0))
    query.processAllAvailable()
    input.addData(
      EventPipelines.Event(7L, ts("2024-01-01T12:00:00Z"), "view", 1.0))
    query.processAllAvailable()

    val out = spark.table("sessions_late").as[EventPipelines.Session].collect()
    query.stop()

    assert(out.length == 1, s"got ${out.toSeq}")
    assert(out.head.nEvents == 3L, s"late event must still count: ${out.head}")
    assert(out.head.durationSec == 1200L,
      s"session must stay [10:00, 10:20] after the late 10:10 event: ${out.head}")
  }

  test("file-source deployment path: readEventStream processes landed parquet incrementally") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("stream-src")
    val batch1 = spark.createDataFrame(Seq(
      (ts("2024-01-01T10:05:00Z"), "view", 1L, 1.0),
      (ts("2024-01-01T10:45:00Z"), "view", 2L, 2.0))).toDF("ts", "event_type", "user_id", "value")
    batch1.write.parquet(dir.resolve("b1").toString)

    val stream = EventPipelines.readEventStream(spark, s"$dir/*")
    assert(stream.isStreaming)
    val query = stream
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    query.processAllAvailable()
    assert(spark.table("filesrc").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("view", 2L)))

    // a new file lands → incrementally picked up
    val batch2 = spark.createDataFrame(Seq(
      (ts("2024-01-01T11:10:00Z"), "click", 1L, 5.0))).toDF("ts", "event_type", "user_id", "value")
    batch2.write.parquet(dir.resolve("b2").toString)
    query.processAllAvailable()
    query.stop()
    assert(spark.table("filesrc").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("view", 2L), ("click", 1L)))
  }

  test("dedupStream: duplicate keys within the watermark horizon are dropped, first wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "payload")

    val query = EventPipelines.dedupStream(events, "event_id")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()

    input.addData(
      (1L, ts("2024-01-01T10:00:00Z"), "first"),
      (2L, ts("2024-01-01T10:05:00Z"), "first"),
      (1L, ts("2024-01-01T10:10:00Z"), "dup-same-batch"))
    query.processAllAvailable()
    input.addData((2L, ts("2024-01-01T10:20:00Z"), "dup-next-batch"))
    query.processAllAvailable()
    input.addData((3L, ts("2024-01-01T10:30:00Z"), "first"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("dedup").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "first"), (2L, "first"), (3L, "first")),
      s"streaming dedup emitted: $out")
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val query = events.join(dim, Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()

    input.addData(
      (1L, ts("2024-01-01T10:00:00Z"), 5.0),
      (3L, ts("2024-01-01T10:01:00Z"), 7.0))
    query.processAllAvailable()
    input.addData((2L, ts("2024-01-01T10:02:00Z"), 9.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("enriched").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSet
    assert(out == Set((1L, Some("gold")), (3L, None), (2L, Some("silver"))))
  }

  test("stream-stream interval join: actions pair with in-window triggers only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trigIn = MemoryStream[(Long, Timestamp, Long)]
    val actIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val triggers = trigIn.toDF().toDF("user_id", "ts", "event_id")
    val actions = actIn.toDF().toDF("user_id", "ts", "event_id", "value")

    val query = EventPipelines.correlateStreams(triggers, actions, lookback = "30 minutes")
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()

    trigIn.addData(
      (1L, ts("2024-01-01T10:00:00Z"), 100L),  // in window of action 200
      (1L, ts("2024-01-01T09:00:00Z"), 101L),  // same user, outside 30-min lookback
      (2L, ts("2024-01-01T10:05:00Z"), 102L))  // other user — no action
    actIn.addData(
      (1L, ts("2024-01-01T10:20:00Z"), 200L, 7.0),
      (3L, ts("2024-01-01T10:20:00Z"), 201L, 8.0)) // user with no trigger
    query.processAllAvailable()
    // advance both watermarks so results flush in append mode
    trigIn.addData((9L, ts("2024-01-01T14:00:00Z"), 999L))
    actIn.addData((9L, ts("2024-01-01T14:00:00Z"), 998L, 0.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("correlated").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t_event"), r.getAs[Long]("a_event")))
      .toSet
    // exactly one pair: user 1's in-window trigger with its action; the
    // out-of-window trigger, the triggerless action, and the unmatched
    // trigger produce nothing (inner join)
    assert((out - ((9L, 999L, 998L))) == Set((1L, 100L, 200L)), s"got $out")
  }

  test("unified API: the same hourlyStats runs on a batch frame") {
    val batch = spark.createDataFrame(Seq(
      (ts("2024-01-01T10:05:00Z"), "view", 1L, 1.0),
      (ts("2024-01-01T10:45:00Z"), "view", 2L, 2.0),
      (ts("2024-01-01T11:10:00Z"), "click", 1L, 5.0))).toDF("ts", "event_type", "user_id", "value")
    val out = EventPipelines.hourlyStats(batch)
      .orderBy(col("bucket"), col("event_type")).collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("view", 2L), ("click", 1L)))
  }
}
