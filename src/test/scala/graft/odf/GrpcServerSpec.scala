package graft.odf

import java.nio.file.Files
import java.util.concurrent.{CompletableFuture, TimeUnit}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.datatype.jsr310.JavaTimeModule
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.odf.server.{FlatbuffersPayloadCodec, GrpcWire, OdfGrpcServer, PayloadCodecs}

/** Wire round-trip for the gRPC transport: a hand-rolled netty HTTP/2
  * (h2c prior-knowledge) client calls both methods against the reference's
  * request shapes — raw-query ingest and ledger transform — plus the
  * structured-error and transport-error paths, and unit checks of the
  * gRPC/protobuf byte layer. */
class GrpcServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  // --- byte-layer unit tests (no I/O) ---

  test("gRPC frame round-trip, including multi-message bodies") {
    val a = Array[Byte](1, 2, 3)
    val b = Array.fill[Byte](300)(7) // length needs two bytes
    val body = GrpcWire.frame(a) ++ GrpcWire.frame(b)
    val out = GrpcWire.unframe(body)
    assert(out.length == 2)
    assert(out(0).sameElements(a) && out(1).sameElements(b))
    assert(GrpcWire.unframe(Array.emptyByteArray).isEmpty)
  }

  test("protobuf envelope round-trip; unknown fields are skipped") {
    val payload = Array.tabulate[Byte](200)(_.toByte) // varint length > 0x7f
    val enc = GrpcWire.encodeEnvelope(payload)
    assert(GrpcWire.decodeEnvelope(enc).sameElements(payload))
    // prepend unknown field 2 (varint 5) and field 3 (LEN "xy")
    val withUnknown = Array[Byte](0x10, 5, 0x1a, 2, 'x', 'y') ++ enc
    assert(GrpcWire.decodeEnvelope(withUnknown).sameElements(payload))
    assert(GrpcWire.decodeEnvelope(Array.emptyByteArray).isEmpty)
  }

  // --- end-to-end over a real socket ---

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-grpc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val server: OdfGrpcServer = {
    val s = new OdfGrpcServer(new Engine(spark), port = 0)
    s.start()
    s
  }

  override def afterAll(): Unit = {
    server.stop()
    spark.stop()
  }

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .registerModule(new JavaTimeModule())

  /** One gRPC call over a fresh h2c connection; returns (grpc-status,
    * decoded response payloads). */
  private def call(method: String, payload: Array[Byte]): (Int, Seq[Array[Byte]]) =
    callFrames(method, Seq(payload))

  /** Same, with explicit control over how many message frames the request
    * body carries (unary methods must reject more than one). */
  private def callFrames(method: String, payloads: Seq[Array[Byte]]): (Int, Seq[Array[Byte]]) = {
    val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
    try {
      val done = new CompletableFuture[(Int, Array[Byte])]()
      val ch = new Bootstrap().group(group).channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[Channel] {
          override def initChannel(c: Channel): Unit = {
            c.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
            c.pipeline().addLast(new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
          }
        })
        .connect("127.0.0.1", server.boundPort).sync().channel()

      val streamHandler = new ChannelInboundHandlerAdapter {
        private val buf = Unpooled.compositeBuffer()
        private var status = -1
        override def channelRead(ctx: ChannelHandlerContext, msg: Any): Unit = msg match {
          case h: Http2HeadersFrame =>
            val s = h.headers.get("grpc-status")
            if (s != null) status = String.valueOf(s).toInt
            if (h.isEndStream) finish()
          case d: Http2DataFrame =>
            buf.addComponent(true, d.content.retain())
            d.release()
            if (d.isEndStream) finish()
          case other => io.netty.util.ReferenceCountUtil.release(other)
        }
        private def finish(): Unit = {
          val bytes = new Array[Byte](buf.readableBytes())
          buf.readBytes(bytes)
          buf.release()
          done.complete((status, bytes))
          ()
        }
      }

      val stream = new Http2StreamChannelBootstrap(ch).handler(streamHandler).open().sync().getNow
      val headers = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(method)
        .authority(s"127.0.0.1:${server.boundPort}")
        .set("content-type", "application/grpc")
        .set("te", "trailers")
      stream.write(new DefaultHttp2HeadersFrame(headers))
      val reqBody = payloads.map(p => GrpcWire.frame(GrpcWire.encodeEnvelope(p)))
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(reqBody), true))

      val (status, body) = done.get(180, TimeUnit.SECONDS)
      ch.close().sync()
      (status, GrpcWire.unframe(body).map(GrpcWire.decodeEnvelope))
    } finally { group.shutdownGracefully(); () }
  }

  private def jsonCall(method: String, request: AnyRef): (Int, String) = {
    val (status, msgs) = call(method, mapper.writeValueAsBytes(request))
    (status, msgs.headOption.map(new String(_, "UTF-8")).getOrElse(""))
  }

  test("ExecuteRawQuery round-trip: ingest query over a parquet input (grpc.rs:80-134)") {
    val dir = Files.createTempDirectory("graft-grpc-raw")
    val schema = StructType(Seq(
      StructField("city", StringType, nullable = false),
      StructField("population", LongType, nullable = false)))
    val rows = Seq(Row("vancouver", 675000L), Row("seattle", 733000L), Row("kyiv", 2884000L))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      dir.resolve("input.parquet").toString)

    val req = RawQueryRequest(
      inputDataPaths = Seq(dir.resolve("input.parquet").toString),
      queries = Seq(SqlQueryStep.output("select city, population from input where population > 700000")),
      outputDataPath = dir.resolve("out.parquet").toString)
    val (status, body) = jsonCall("/engine.Engine/ExecuteRawQuery", req)
    assert(status == 0, s"grpc-status $status, body: $body")
    assert(body == """{"success":{"numRecords":2}}""", body)
    assert(spark.read.parquet(dir.resolve("out.parquet").toString).count() == 2)
  }

  test("ExecuteTransform round-trip: ledger transform with system columns (grpc.rs:137-178)") {
    val dir = Files.createTempDirectory("graft-grpc-tx")
    val schema = StructType(Seq(
      StructField("offset", LongType, nullable = false),
      StructField("op", IntegerType, nullable = false),
      StructField("system_time", TimestampType, nullable = false),
      StructField("event_time", TimestampType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("population", LongType, nullable = false)))
    val st = java.sql.Timestamp.from(java.time.Instant.parse("2023-02-01T00:00:00Z"))
    val et = java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z"))
    val rows = Seq(
      Row(0L, 0, st, et, "vancouver", 675000L),
      Row(1L, 0, st, et, "seattle", 733000L))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      dir.resolve("input.parquet").toString)

    val req = TransformRequest(
      datasetId = "did:odf:test",
      datasetAlias = "test",
      systemTime = java.time.Instant.parse("2023-03-01T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        "select event_time, city, population + 100 as population from foo")),
      queryInputs = Seq(TransformRequestInput(
        datasetId = "did:odf:foo", datasetAlias = "foo", queryAlias = "foo",
        vocab = DatasetVocabulary(),
        offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Seq(dir.resolve("input.parquet").toString),
        schemaFile = dir.resolve("input.parquet").toString,
        explicitWatermarks = Nil)),
      nextOffset = 10,
      newDataPath = dir.resolve("out.parquet").toString)
    val (status, body) = jsonCall("/engine.Engine/ExecuteTransform", req)
    assert(status == 0, s"grpc-status $status, body: $body")
    assert(body == """{"success":{"newOffsetInterval":{"start":10,"end":11},"newWatermark":null}}""", body)
    val out = spark.read.parquet(dir.resolve("out.parquet").toString).orderBy("offset").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L))
    assert(out.map(_.getAs[Long]("population")).toSeq == Seq(675100L, 733100L))
  }

  test("structured engine error rides inside the response message, grpc-status stays 0") {
    val dir = Files.createTempDirectory("graft-grpc-err")
    val schema = StructType(Seq(StructField("city", StringType, nullable = false)))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row("kyiv")), 1), schema),
      dir.resolve("input.parquet").toString)
    val req = RawQueryRequest(
      inputDataPaths = Seq(dir.resolve("input.parquet").toString),
      queries = Seq(SqlQueryStep.output("select nope from input")),
      outputDataPath = dir.resolve("out.parquet").toString)
    val (status, body) = jsonCall("/engine.Engine/ExecuteRawQuery", req)
    assert(status == 0)
    assert(body.startsWith("""{"invalidQuery":"""), body)
  }

  test("transport errors: unknown method is UNIMPLEMENTED(12), undecodable request is INVALID_ARGUMENT(3)") {
    val (s1, _) = call("/engine.Engine/NoSuchMethod", Array[Byte](1))
    assert(s1 == 12)
    // framing/envelope decode fine but the payload isn't a valid request —
    // permanently bad, must NOT be reported as a retryable UNKNOWN
    val (s2, _) = call("/engine.Engine/ExecuteRawQuery", Array[Byte]('n', 'o', 'p', 'e'))
    assert(s2 == 3)
  }

  test("unary request with >1 message frame is rejected INVALID_ARGUMENT(3), not silently truncated") {
    val req = mapper.writeValueAsBytes(RawQueryRequest(
      inputDataPaths = Nil, queries = Nil, outputDataPath = "/tmp/never-written.parquet"))
    val (status, _) = callFrames("/engine.Engine/ExecuteRawQuery", Seq(req, req))
    assert(status == 3, s"two-frame unary body must be INVALID_ARGUMENT, got $status")
  }

  test("grpc-message is percent-encoded per the gRPC spec (space stays space, never '+')") {
    assert(GrpcWire.percentEncodeMessage("bad request: no such column") ==
      "bad request: no such column")
    assert(GrpcWire.percentEncodeMessage("100% broken\né") == "100%25 broken%0A%C3%A9")
  }

  // --- flatbuffers payload codec (engine.fbs; grpc.rs:84-86) ---

  test("soak: 60 sequential transforms through one server JVM — flat heap, no leaked state") {
    // The long-lived service property the r10 lifecycle fixes promise:
    // request sessions, codegen caches, and sink temp dirs must not
    // accumulate across requests. 60 full transform round-trips over one
    // socket-per-call h2c client; the first 5 warm JIT/codegen, then heap
    // is measured (GC-settled) around the remaining 55.
    val dir = Files.createTempDirectory("graft-grpc-soak")
    val schema = StructType(Seq(
      StructField("offset", LongType, nullable = false),
      StructField("op", IntegerType, nullable = false),
      StructField("system_time", TimestampType, nullable = false),
      StructField("event_time", TimestampType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("population", LongType, nullable = false)))
    val st = java.sql.Timestamp.from(java.time.Instant.parse("2023-02-01T00:00:00Z"))
    val et = java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z"))
    val rows = (0 until 50).map(i => Row(i.toLong, 0, st, et, s"city$i", 1000L + i))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      dir.resolve("input.parquet").toString)

    def runRound(round: Int): Unit = {
      val req = TransformRequest(
        datasetId = "did:odf:soak", datasetAlias = "soak",
        systemTime = java.time.Instant.parse("2023-03-01T00:00:00Z"),
        vocab = DatasetVocabulary(),
        queries = Seq(
          SqlQueryStep.named("s1",
            s"select event_time, city, population + $round as population from foo"),
          SqlQueryStep.output(s"select * from s1 where population % 7 != ${round % 7}")),
        queryInputs = Seq(TransformRequestInput(
          datasetId = "did:odf:foo", datasetAlias = "foo", queryAlias = "foo",
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(0, 49)),
          dataPaths = Seq(dir.resolve("input.parquet").toString),
          schemaFile = dir.resolve("input.parquet").toString,
          explicitWatermarks = Nil)),
        nextOffset = round.toLong * 100,
        newDataPath = dir.resolve(s"out$round.parquet").toString)
      val (status, body) = jsonCall("/engine.Engine/ExecuteTransform", req)
      assert(status == 0 && body.contains("\"success\""), s"round $round: $status $body")
      Files.delete(dir.resolve(s"out$round.parquet"))
    }

    def settledHeap(): Long = {
      (1 to 3).foreach { _ => System.gc(); Thread.sleep(100) }
      val rt = Runtime.getRuntime
      rt.totalMemory() - rt.freeMemory()
    }

    (0 until 5).foreach(runRound)
    val before = settledHeap()
    (5 until 60).foreach(runRound)
    val after = settledHeap()
    val growthMb = (after - before) / (1024.0 * 1024.0)
    info(f"heap after 5 warm rounds: ${before / 1048576}%d MB; after 60: " +
      f"${after / 1048576}%d MB (growth $growthMb%.1f MB over 55 rounds)")
    assert(growthMb < 256.0, f"heap grew $growthMb%.1f MB across 55 requests — leak?")

    // no cross-request state left behind: the ANN memo cache was never
    // touched by the engine path, no cached/checkpointed RDD blocks
    // survive, and the sink cleaned up every .tmp-spark staging dir
    assert(graft.queries.SimilarityQueries.exactTopKCacheSize == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked persistent RDDs: ${spark.sparkContext.getPersistentRDDs.keys}")
    val leftover = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains(".tmp-spark")).toSeq
    assert(leftover.isEmpty, s"sink staging dirs not cleaned: $leftover")
  }

  private def sampleTransformRequest(dir: java.nio.file.Path): TransformRequest =
    TransformRequest(
      datasetId = "did:odf:z4k88e8rxU8TCr6bE6HjmDL9LbPmLepAEuxx4FoPwRnHqzt33TG",
      datasetAlias = "my/dataset",
      systemTime = java.time.Instant.parse("2023-03-01T12:34:56.789012345Z"),
      vocab = DatasetVocabulary(eventTimeColumn = "etime"),
      queries = Seq(
        SqlQueryStep.named("step1", "select 1 as x"),
        SqlQueryStep.output("select * from step1")),
      queryInputs = Seq(TransformRequestInput(
        datasetId = "did:odf:input", datasetAlias = "in", queryAlias = "foo",
        vocab = DatasetVocabulary(),
        offsetInterval = Some(OffsetInterval(5, 17)),
        dataPaths = Seq(dir.resolve("a.parquet").toString, dir.resolve("b.parquet").toString),
        schemaFile = dir.resolve("a.parquet").toString,
        explicitWatermarks = Seq(Watermark(
          systemTime = java.time.Instant.parse("2023-02-01T00:00:00Z"),
          eventTime = java.time.Instant.parse("2023-01-15T06:30:00Z"))))),
      nextOffset = 42,
      newDataPath = dir.resolve("out.parquet").toString,
      prevCheckpointPath = None,
      newCheckpointPath = Some(dir.resolve("ckpt").toString))

  test("flatbuffers codec: TransformRequest round-trip preserves every field") {
    val req = sampleTransformRequest(java.nio.file.Paths.get("/tmp/fbx"))
    val bytes = FlatbuffersPayloadCodec.writeTransformRequest(req)
    assert(FlatbuffersPayloadCodec.readTransformRequest(bytes) == req)
    // absent optionals stay absent, present ones stay present
    val minimal = req.copy(newCheckpointPath = None, queryInputs = Nil, nextOffset = 0)
    assert(FlatbuffersPayloadCodec.readTransformRequest(
      FlatbuffersPayloadCodec.writeTransformRequest(minimal)) == minimal)
  }

  test("flatbuffers codec: RawQueryRequest + responses round-trip") {
    val raw = RawQueryRequest(
      inputDataPaths = Seq("/tmp/in1.parquet", "/tmp/in2.parquet"),
      queries = Seq(SqlQueryStep.output("select 1")),
      outputDataPath = "/tmp/out.parquet")
    assert(FlatbuffersPayloadCodec.readRawQueryRequest(
      FlatbuffersPayloadCodec.writeRawQueryRequest(raw)) == raw)

    val okTx = TransformResponseSuccess(
      newOffsetInterval = Some(OffsetInterval(10, 19)),
      newWatermark = Some(java.time.Instant.parse("2024-01-01T06:00:00Z")))
    assert(FlatbuffersPayloadCodec.readTransformResponse(
      FlatbuffersPayloadCodec.writeTransformResponse(Right(okTx))) == Right(okTx))
    val emptyTx = TransformResponseSuccess(None, None)
    assert(FlatbuffersPayloadCodec.readTransformResponse(
      FlatbuffersPayloadCodec.writeTransformResponse(Right(emptyTx))) == Right(emptyTx))
    assert(FlatbuffersPayloadCodec.readRawQueryResponse(
      FlatbuffersPayloadCodec.writeRawQueryResponse(
        Right(RawQueryResponseSuccess(2884)))) == Right(RawQueryResponseSuccess(2884)))
    val iq: Either[EngineError, RawQueryResponseSuccess] = Left(InvalidQuery("no such column"))
    assert(FlatbuffersPayloadCodec.readRawQueryResponse(
      FlatbuffersPayloadCodec.writeRawQueryResponse(iq)) == iq)
    val ie: Either[EngineError, TransformResponseSuccess] = Left(EngineInternalError("boom"))
    assert(FlatbuffersPayloadCodec.readTransformResponse(
      FlatbuffersPayloadCodec.writeTransformResponse(ie)) == ie)
  }

  /** Independent flatbuffer walker — shares NO code with the codec's reader,
    * so layout assertions below genuinely pin the written bytes. */
  private final class Walk(val bytes: Array[Byte]) {
    private val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rootPos: Int = bb.getInt(0)
    /** Byte offset (within table) of field `id`, 0 if absent. */
    def slot(tablePos: Int, id: Int): Int = {
      val vtPos = tablePos - bb.getInt(tablePos)
      val vtLen = bb.getShort(vtPos) & 0xffff
      val s = 4 + 2 * id
      if (s >= vtLen) 0 else bb.getShort(vtPos + s) & 0xffff
    }
    def u8(tablePos: Int, id: Int): Int = bb.get(tablePos + slot(tablePos, id)) & 0xff
    def i64(tablePos: Int, id: Int): Long = bb.getLong(tablePos + slot(tablePos, id))
    def table(tablePos: Int, id: Int): Int = {
      val f = tablePos + slot(tablePos, id); f + bb.getInt(f)
    }
    def structPos(tablePos: Int, id: Int): Int = tablePos + slot(tablePos, id)
    def str(tablePos: Int, id: Int): String = {
      val sPos = table(tablePos, id) // strings are [len:u32][bytes]
      val len = bb.getInt(sPos)
      new String(bytes, sPos + 4, len, "UTF-8")
    }
    def i32(pos: Int): Int = bb.getInt(pos)
    def u16(pos: Int): Int = bb.getShort(pos) & 0xffff
  }

  test("flatbuffers layout pin: response root union + Timestamp struct bytes (engine.fbs ids)") {
    val ok = TransformResponseSuccess(
      newOffsetInterval = Some(OffsetInterval(10, 19)),
      newWatermark = Some(java.time.Instant.parse("2024-03-05T06:07:08.000000009Z")))
    val w = new Walk(FlatbuffersPayloadCodec.writeTransformResponse(Right(ok)))
    assert(w.u8(w.rootPos, 0) == 4, "value_type must be Success = 4")
    val success = w.table(w.rootPos, 1)
    val interval = w.table(success, 0)
    assert(w.i64(interval, 0) == 10 && w.i64(interval, 1) == 19)
    // Timestamp struct is INLINE in the success table: 16 bytes,
    // year:i32 @0, ordinal:u16 @4, seconds_from_midnight:u32 @8, nano:u32 @12
    val ts = w.structPos(success, 1)
    assert(w.i32(ts) == 2024, "year")
    assert(w.u16(ts + 4) == 31 + 29 + 5, "ordinal day (2024 is a leap year)")
    assert(w.i32(ts + 8) == 6 * 3600 + 7 * 60 + 8, "seconds from midnight")
    assert(w.i32(ts + 12) == 9, "nanosecond")
  }

  test("flatbuffers layout pin: request field ids as vendored in engine.fbs") {
    val req = sampleTransformRequest(java.nio.file.Paths.get("/tmp/fbx"))
    val w = new Walk(FlatbuffersPayloadCodec.writeTransformRequest(req))
    assert(w.str(w.rootPos, 0) == req.datasetId, "id 0 = dataset_id")
    assert(w.str(w.rootPos, 1) == "my/dataset", "id 1 = dataset_alias")
    assert(w.i32(w.structPos(w.rootPos, 2)) == 2023, "id 2 = system_time (inline struct)")
    assert(w.str(w.table(w.rootPos, 3), 3) == "etime", "id 3 = vocab; vocab id 3 = event_time_column")
    assert(w.u8(w.rootPos, 4) == 1, "id 4 = transform_type (TransformSql = 1)")
    assert(w.str(w.table(w.rootPos, 5), 0) == "spark", "id 5 = transform; TransformSql id 0 = engine")
    assert(w.i64(w.rootPos, 7) == 42, "id 7 = next_offset")
    assert(w.slot(w.rootPos, 8) == 0, "id 8 = prev_checkpoint_path, absent → no vtable slot")
    assert(w.str(w.rootPos, 9).endsWith("/ckpt"), "id 9 = new_checkpoint_path")
    assert(w.str(w.rootPos, 10).endsWith("/out.parquet"), "id 10 = new_data_path")
  }

  test("flatbuffers layout pin: hand-built fixture bytes decode (reader direction)") {
    // RawQueryResponseRoot { value_type = Success(4), value = { num_records: 5 } },
    // laid out by hand — byte addresses chosen independently of the builder:
    //   0: root offset → 24;  8: root vtable [len 8 | size 9 | f0@8 | f1@4]
    //  24: root table [soffset 16 | value→+16 | value_type 4 | pad]
    //  36: success vtable [len 6 | size 12 | f0@4];  44: [soffset 8 | i64 5]
    val fix = Array[Byte](
      24, 0, 0, 0,
      0, 0, 0, 0,
      8, 0, 9, 0, 8, 0, 4, 0,
      0, 0, 0, 0, 0, 0, 0, 0,
      16, 0, 0, 0,
      16, 0, 0, 0,
      4, 0, 0, 0,
      6, 0, 12, 0, 4, 0,
      0, 0,
      8, 0, 0, 0,
      5, 0, 0, 0, 0, 0, 0, 0)
    assert(FlatbuffersPayloadCodec.readRawQueryResponse(fix) ==
      Right(RawQueryResponseSuccess(5)))
  }

  test("payload auto-detection: '{' = JSON, otherwise flatbuffers") {
    assert(PayloadCodecs.select("{\"a\":1}".getBytes("UTF-8")).name == "json")
    assert(PayloadCodecs.select("  \n\t{}".getBytes("UTF-8")).name == "json")
    val fb = FlatbuffersPayloadCodec.writeRawQueryRequest(
      RawQueryRequest(Nil, Seq(SqlQueryStep.output("select 1")), "/tmp/o"))
    assert(PayloadCodecs.select(fb).name == "flatbuffers")
  }

  test("ExecuteRawQuery speaks flatbuffers end-to-end (default codec path)") {
    val dir = Files.createTempDirectory("graft-grpc-fbraw")
    val schema = StructType(Seq(
      StructField("city", StringType, nullable = false),
      StructField("population", LongType, nullable = false)))
    val rows = Seq(Row("vancouver", 675000L), Row("seattle", 733000L), Row("kyiv", 2884000L))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      dir.resolve("input.parquet").toString)
    val req = RawQueryRequest(
      inputDataPaths = Seq(dir.resolve("input.parquet").toString),
      queries = Seq(SqlQueryStep.output("select city, population from input where population > 700000")),
      outputDataPath = dir.resolve("out.parquet").toString)
    val (status, msgs) = call("/engine.Engine/ExecuteRawQuery",
      FlatbuffersPayloadCodec.writeRawQueryRequest(req))
    assert(status == 0)
    assert(FlatbuffersPayloadCodec.readRawQueryResponse(msgs.head) ==
      Right(RawQueryResponseSuccess(2)))
    assert(spark.read.parquet(dir.resolve("out.parquet").toString).count() == 2)
  }

  test("ExecuteTransform speaks flatbuffers end-to-end (default codec path)") {
    val dir = Files.createTempDirectory("graft-grpc-fbtx")
    val schema = StructType(Seq(
      StructField("offset", LongType, nullable = false),
      StructField("op", IntegerType, nullable = false),
      StructField("system_time", TimestampType, nullable = false),
      StructField("event_time", TimestampType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("population", LongType, nullable = false)))
    val st = java.sql.Timestamp.from(java.time.Instant.parse("2023-02-01T00:00:00Z"))
    val et = java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z"))
    val rows = Seq(Row(0L, 0, st, et, "vancouver", 675000L), Row(1L, 0, st, et, "seattle", 733000L))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      dir.resolve("input.parquet").toString)
    val req = TransformRequest(
      datasetId = "did:odf:test",
      datasetAlias = "test",
      systemTime = java.time.Instant.parse("2023-03-01T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        "select event_time, city, population + 100 as population from foo")),
      queryInputs = Seq(TransformRequestInput(
        datasetId = "did:odf:foo", datasetAlias = "foo", queryAlias = "foo",
        vocab = DatasetVocabulary(),
        offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Seq(dir.resolve("input.parquet").toString),
        schemaFile = dir.resolve("input.parquet").toString,
        explicitWatermarks = Nil)),
      nextOffset = 10,
      newDataPath = dir.resolve("out.parquet").toString)
    val (status, msgs) = call("/engine.Engine/ExecuteTransform",
      FlatbuffersPayloadCodec.writeTransformRequest(req))
    assert(status == 0)
    assert(FlatbuffersPayloadCodec.readTransformResponse(msgs.head) ==
      Right(TransformResponseSuccess(Some(OffsetInterval(10, 11)), None)))
    val out = spark.read.parquet(dir.resolve("out.parquet").toString).orderBy("offset").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L))
  }

  test("flatbuffers structured error rides inside the response, grpc-status stays 0") {
    val dir = Files.createTempDirectory("graft-grpc-fberr")
    val schema = StructType(Seq(StructField("city", StringType, nullable = false)))
    ParquetSink.writeSingleFile(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row("kyiv")), 1), schema),
      dir.resolve("input.parquet").toString)
    val req = RawQueryRequest(
      inputDataPaths = Seq(dir.resolve("input.parquet").toString),
      queries = Seq(SqlQueryStep.output("select nope from input")),
      outputDataPath = dir.resolve("out.parquet").toString)
    val (status, msgs) = call("/engine.Engine/ExecuteRawQuery",
      FlatbuffersPayloadCodec.writeRawQueryRequest(req))
    assert(status == 0)
    val res = FlatbuffersPayloadCodec.readRawQueryResponse(msgs.head)
    assert(res.isLeft && res.swap.toOption.get.isInstanceOf[InvalidQuery], res)
  }
}
