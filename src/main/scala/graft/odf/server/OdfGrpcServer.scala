package graft.odf.server

import java.util.concurrent.Executors

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._
import org.apache.spark.sql.SparkSession

import graft.odf._

/** gRPC transport for the engine, matching the reference's wire surface
  * (/root/reference/src/grpc.rs, main.rs:20): HTTP/2 cleartext
  * (prior-knowledge, as gRPC mandates) on :2884, service `engine.Engine`,
  * unary-request / server-streaming-response methods `ExecuteRawQuery` and
  * `ExecuteTransform`, gRPC length-prefixed frames carrying the one-field
  * protobuf envelope, `grpc-status` in HTTP/2 trailers.
  *
  * Structured engine errors (InvalidQuery / EngineInternalError) travel
  * INSIDE the response message as the ODF response union — grpc-status
  * stays 0 — exactly like the reference (grpc.rs:98-123). Non-OK grpc-status
  * is reserved for transport-level failures (unknown method = 12
  * UNIMPLEMENTED, undecodable request = 3 INVALID_ARGUMENT, handler crash
  * = 2 UNKNOWN), mirroring tonic's behavior.
  *
  * Payload serialization is behind [[EnginePayloadCodec]]. The default is
  * per-request auto-detection ([[PayloadCodecs.AutoDetect]]): flatbuffers —
  * the format the reference speaks (grpc.rs:84-86) — with the JSON stand-in
  * still accepted; the response is written in whichever format the request
  * arrived in. Pass an explicit codec to pin one format.
  *
  * Built directly on netty's HTTP/2 codec (on Spark's classpath); no
  * grpc-java. Engine execution runs on a dedicated thread pool so Spark
  * jobs never block the event loop.
  */
class OdfGrpcServer(
    engine: Engine,
    port: Int = 2884,
    codec: EnginePayloadCodec = PayloadCodecs.AutoDetect) {

  /** Resolve the codec for one request's payload bytes. */
  private def codecFor(payload: Array[Byte]): EnginePayloadCodec = codec match {
    case PayloadCodecs.AutoDetect => PayloadCodecs.select(payload)
    case fixed => fixed
  }

  private val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
  private val workers = Executors.newCachedThreadPool()
  @volatile private var channel: Channel = _

  def start(): Unit = {
    val bootstrap = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit = {
          ch.pipeline().addLast(Http2FrameCodecBuilder.forServer().build())
          ch.pipeline().addLast(new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit =
              stream.pipeline().addLast(new GrpcStreamHandler)
          }))
        }
      })
    channel = bootstrap.bind(port).sync().channel()
  }

  def boundPort: Int =
    channel.localAddress().asInstanceOf[java.net.InetSocketAddress].getPort

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    workers.shutdown()
    group.shutdownGracefully().sync()
    ()
  }

  /** One instance per HTTP/2 stream (gRPC call): buffers DATA frames until
    * end-of-stream, dispatches on the request path, answers with
    * HEADERS + DATA + trailers. */
  private class GrpcStreamHandler extends ChannelInboundHandlerAdapter {
    private var path: String = ""
    private val body = Unpooled.compositeBuffer()

    override def channelRead(ctx: ChannelHandlerContext, msg: Any): Unit = msg match {
      case h: Http2HeadersFrame =>
        path = String.valueOf(h.headers.path)
        if (h.isEndStream) dispatch(ctx)
      case d: Http2DataFrame =>
        body.addComponent(true, d.content.retain())
        d.release()
        if (d.isEndStream) dispatch(ctx)
      case other =>
        io.netty.util.ReferenceCountUtil.release(other)
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      body.release()
      super.channelInactive(ctx)
    }

    private def dispatch(ctx: ChannelHandlerContext): Unit = {
      val bytes = new Array[Byte](body.readableBytes())
      body.readBytes(bytes)
      // Decoding (framing + envelope + request payload) happens here on the
      // event loop and maps to INVALID_ARGUMENT — a malformed request is
      // permanently bad and a client must not retry it. Only the deferred
      // engine execution goes to the worker pool, where a crash is UNKNOWN.
      val prepare: Option[Array[Byte] => () => Array[Byte]] = path match {
        case "/engine.Engine/ExecuteTransform" => Some { payload =>
          val c = codecFor(payload)
          val req = c.readTransformRequest(payload)
          () => c.writeTransformResponse(engine.executeTransform(req))
        }
        case "/engine.Engine/ExecuteRawQuery" => Some { payload =>
          val c = codecFor(payload)
          val req = c.readRawQueryRequest(payload)
          () => c.writeRawQueryResponse(engine.executeRawQuery(req))
        }
        case _ => None
      }
      prepare match {
        case None => respondStatus(ctx, 12, s"unknown method: $path")
        case Some(p) =>
          val job =
            try Right(p(GrpcWire.decodeEnvelope(GrpcWire.unframe(bytes) match {
              case Seq(one) => one
              case Seq() => throw new IllegalArgumentException("empty gRPC body")
              // unary-request methods: >1 frame is a client framing bug and
              // must fail loudly (tonic rejects it), not silently drop frames
              case many => throw new IllegalArgumentException(
                s"expected exactly 1 message frame for unary request, got ${many.size}")
            })))
            catch { case e: Exception => Left(e) }
          job match {
            case Left(e) => respondStatus(ctx, 3, s"bad request: ${e.getMessage}")
            case Right(run) =>
              workers.execute(() => {
                val out =
                  try Right(run())
                  catch { case e: Exception => Left(e) }
                ctx.channel.eventLoop.execute(() => out match {
                  case Right(msg) => respondMessage(ctx, msg)
                  case Left(e) => respondStatus(ctx, 2, String.valueOf(e.getMessage))
                })
              })
          }
      }
    }

    private def grpcHeaders(): Http2Headers =
      new DefaultHttp2Headers()
        .status("200")
        .set("content-type", "application/grpc")

    private def respondMessage(ctx: ChannelHandlerContext, msg: Array[Byte]): Unit = {
      val data: ByteBuf = Unpooled.wrappedBuffer(GrpcWire.frame(GrpcWire.encodeEnvelope(msg)))
      ctx.write(new DefaultHttp2HeadersFrame(grpcHeaders()))
      ctx.write(new DefaultHttp2DataFrame(data))
      val trailers = new DefaultHttp2Headers().set("grpc-status", "0")
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
      ()
    }

    private def respondStatus(ctx: ChannelHandlerContext, status: Int, message: String): Unit = {
      val headers = grpcHeaders()
        .set("grpc-status", status.toString)
        .set("grpc-message", GrpcWire.percentEncodeMessage(message))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true))
      ()
    }
  }
}

/** Server bootstrap mirroring the reference's main (main.rs:20): serve the
  * engine over gRPC on 0.0.0.0:2884 until killed. */
object OdfGrpcServer {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(2884)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-odf-grpc-server")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new OdfGrpcServer(new Engine(spark), port)
    srv.start()
    println(s"[odf-grpc-server] listening on :${srv.boundPort}")
    Thread.currentThread().join()
  }
}
