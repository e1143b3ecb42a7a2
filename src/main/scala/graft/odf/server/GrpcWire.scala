package graft.odf.server

/** Byte-level helpers for the gRPC wire protocol as the reference engine
  * speaks it (/root/reference/src/grpc.rs:80-178):
  *
  *   - every request/response body is a sequence of gRPC length-prefixed
  *     message frames: `[compressed: u8][length: u32 BE][message bytes]`
  *     (we support the uncompressed flag only, like the reference);
  *   - each message is the tiny protobuf envelope from the ODF engine proto:
  *     one field, `bytes flatbuffer = 1` — hand-encoded here (tag 0x0A +
  *     varint length + bytes), no protobuf runtime needed.
  *
  * Pure functions over arrays, unit-tested in GrpcServerSpec.
  */
object GrpcWire {

  /** Wrap one message in a gRPC length-prefixed frame. */
  def frame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0 // uncompressed
    out(1) = (msg.length >>> 24).toByte
    out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte
    out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** Extract every message from a concatenation of gRPC frames. */
  def unframe(body: Array[Byte]): Seq[Array[Byte]] = {
    val msgs = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i < body.length) {
      require(i + 5 <= body.length, s"truncated gRPC frame header at offset $i")
      require(body(i) == 0, "compressed gRPC frames are not supported")
      val len = ((body(i + 1) & 0xff) << 24) | ((body(i + 2) & 0xff) << 16) |
        ((body(i + 3) & 0xff) << 8) | (body(i + 4) & 0xff)
      require(i + 5 + len <= body.length, s"truncated gRPC frame body at offset $i")
      msgs += java.util.Arrays.copyOfRange(body, i + 5, i + 5 + len)
      i += 5 + len
    }
    msgs.result()
  }

  /** Percent-encode a `grpc-message` header value per the gRPC HTTP/2 spec:
    * UTF-8 bytes in 0x20-0x24 / 0x26-0x7E travel literally (space stays a
    * space — never '+', which is form-urlencoding, not gRPC); '%' itself and
    * everything outside that range become %XX. */
  def percentEncodeMessage(message: String): String = {
    val sb = new StringBuilder(message.length)
    for (byte <- message.getBytes("UTF-8")) {
      val c = byte & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  /** Encode the ODF engine-proto envelope: `bytes flatbuffer = 1`. */
  def encodeEnvelope(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 6)
    out.write(0x0a) // field 1, wire type LEN
    var v = payload.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Decode the envelope, skipping unknown fields (forward-compatible, as
    * protobuf requires). Returns the `flatbuffer` field's bytes (empty if
    * the field is absent — proto3 default). */
  def decodeEnvelope(bytes: Array[Byte]): Array[Byte] = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        require(i < bytes.length, "truncated varint")
        val b = bytes(i); i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    var result = Array.emptyByteArray
    while (i < bytes.length) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 2 =>
          val len = varint().toInt
          require(i + len <= bytes.length, "truncated LEN field")
          if (field == 1) result = java.util.Arrays.copyOfRange(bytes, i, i + len)
          i += len
        case 0 => varint(); ()
        case 5 => i += 4
        case 1 => i += 8
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    result
  }
}
