package graft.odf.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.datatype.jsr310.JavaTimeModule
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.odf._

/** Transport adapter over the in-process engine API: JSON over HTTP.
  *
  * The reference serves the same two endpoints over gRPC + flatbuffers on
  * port 2884 (/root/reference/src/main.rs:20, grpc.rs). gRPC codegen isn't
  * available in this offline build, so the adapter uses the JDK's built-in
  * HTTP server and Jackson (already on Spark's classpath) — the engine API
  * stays wire-shaped (SURVEY.md §7.6), and a flatbuffer/gRPC transport
  * would slot in beside this one without touching the engine.
  *
  *   POST /execute-transform   TransformRequest JSON → response JSON
  *   POST /execute-raw-query   RawQueryRequest JSON → response JSON
  *
  * Responses: `{"ok": {...}}` on success, `{"error": {"kind": ..,
  * "message": ..}}` for structured engine errors (InvalidQuery etc.).
  */
class OdfHttpServer(engine: Engine, port: Int = 2884) {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .registerModule(new JavaTimeModule())
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)

  /** The actually-bound port (use port=0 for an ephemeral one in tests). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle[Req, Resp](ex: HttpExchange, reqClass: Class[Req])(
      run: Req => Either[EngineError, Resp]): Unit = {
    if (ex.getRequestMethod != "POST") { respond(ex, 405, """{"error":{"kind":"MethodNotAllowed"}}"""); return }
    try {
      val req = mapper.readValue(ex.getRequestBody, reqClass)
      run(req) match {
        case Right(ok) =>
          respond(ex, 200, s"""{"ok":${mapper.writeValueAsString(ok)}}""")
        case Left(err) =>
          val kind = err.getClass.getSimpleName
          respond(ex, 400,
            s"""{"error":{"kind":${mapper.writeValueAsString(kind)},"message":${mapper.writeValueAsString(err.message)}}}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 400,
          s"""{"error":{"kind":"BadRequest","message":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}}""")
    }
  }

  server.createContext("/execute-transform", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      OdfHttpServer.this.handle(ex, classOf[TransformRequest])(engine.executeTransform)
  })
  server.createContext("/execute-raw-query", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      OdfHttpServer.this.handle(ex, classOf[RawQueryRequest])(engine.executeRawQuery)
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
}

/** Server bootstrap, mirroring the reference's main (main.rs:20): serve the
  * engine on 0.0.0.0:2884 until killed. */
object OdfHttpServer {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(2884)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-odf-server")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new OdfHttpServer(new Engine(spark), port)
    srv.start()
    println(s"[odf-server] listening on :${srv.boundPort}")
    Thread.currentThread().join()
  }
}
