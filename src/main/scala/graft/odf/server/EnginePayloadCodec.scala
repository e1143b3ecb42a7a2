package graft.odf.server

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.datatype.jsr310.JavaTimeModule
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.odf._

/** Serialization of the ODF engine-protocol message payloads that travel
  * inside the gRPC envelope's `flatbuffer` bytes field.
  *
  * The reference encodes these with the Open Data Fabric flatbuffers schema
  * (`FlatbuffersEngineProtocol`, grpc.rs:84-86). The default implementation
  * is [[FlatbuffersPayloadCodec]], written against the vendored schema at
  * `src/main/resources/odf/engine.fbs` (see its provenance header for what
  * is pinned vs reconstructed). [[JsonPayloadCodec]] remains as a
  * human-readable alternative — same DTO field names/shapes the HTTP
  * adapter uses — and the server auto-detects per request
  * ([[PayloadCodecs.AutoDetect]]), so both formats are always accepted.
  */
trait EnginePayloadCodec {
  def name: String
  def readTransformRequest(bytes: Array[Byte]): TransformRequest
  def writeTransformResponse(resp: Either[EngineError, TransformResponseSuccess]): Array[Byte]
  def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest
  def writeRawQueryResponse(resp: Either[EngineError, RawQueryResponseSuccess]): Array[Byte]
}

/** JSON stand-in payload codec (see trait scaladoc). Responses mirror the
  * ODF response union: `{"success": ...}` / `{"invalidQuery": ...}` /
  * `{"internalError": ...}`. */
object JsonPayloadCodec extends EnginePayloadCodec {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .registerModule(new JavaTimeModule())
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  override val name = "json"

  override def readTransformRequest(bytes: Array[Byte]): TransformRequest =
    mapper.readValue(bytes, classOf[TransformRequest])

  override def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest =
    mapper.readValue(bytes, classOf[RawQueryRequest])

  private def union(resp: Either[EngineError, AnyRef]): Array[Byte] = {
    val json = resp match {
      case Right(ok) => s"""{"success":${mapper.writeValueAsString(ok)}}"""
      case Left(InvalidQuery(m)) =>
        s"""{"invalidQuery":{"message":${mapper.writeValueAsString(m)}}}"""
      case Left(EngineInternalError(m)) =>
        s"""{"internalError":{"message":${mapper.writeValueAsString(m)},"backtrace":null}}"""
    }
    json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  override def writeTransformResponse(resp: Either[EngineError, TransformResponseSuccess]): Array[Byte] =
    union(resp)

  override def writeRawQueryResponse(resp: Either[EngineError, RawQueryResponseSuccess]): Array[Byte] =
    union(resp)
}
