package graft.odf.server

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, ZoneOffset}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.odf._

/** Cross-validation of the hand-built flatbuffers layout
  * (FlatbuffersPayloadCodec slot constants vs the engine.fbs id comments).
  *
  * The codec's byte fixtures in GrpcServerSpec pin layouts this repo itself
  * produced — a wrong slot id would round-trip green there. This suite adds
  * two independent checks:
  *
  *   1. randomized round-trip properties: every optional present/absent,
  *      empty vectors, default-valued scalars (omitted from the vtable),
  *      unicode strings, extreme timestamps — write → read == identity
  *      through the codec itself;
  *   2. [[RawFbReader]], a second decoder built ONLY on ByteBuffer
  *      arithmetic and the flatbuffers wire rules stated in engine.fbs
  *      (vtable slot `4+2·id`, 1-based union discriminants, 16-byte
  *      Timestamp struct) — no flatbuffers-java Table traversal shared
  *      with the codec. Any disagreement between the two readers over the
  *      codec's bytes fails the property.
  */
class FlatbuffersRoundTripProps extends Properties("FlatbuffersPayloadCodec") {

  // ============================================================ generators

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    // includes a surrogate-pair emoji (🙂 = U+1F642) to exercise 4-byte UTF-8
    Gen.listOf(Gen.oneOf("µ", "ß", "→", "字", "🙂", "a", " ")).map(_.mkString),
    Gen.const(""))

  private val genInstant: Gen[Instant] = for {
    // year ≈ -2000 … 9999 (schema: int32 year, may be negative)
    secs <- Gen.choose(-125281987200L, 253402300799L)
    nanos <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, 999999999L))
  } yield Instant.ofEpochSecond(secs, nanos)

  private val genVocab: Gen[DatasetVocabulary] = Gen.oneOf(
    Gen.const(DatasetVocabulary()),
    for {
      o <- genStr; op <- genStr; st <- genStr; et <- genStr
    } yield DatasetVocabulary(o, op, st, et))

  private val genInterval: Gen[OffsetInterval] = for {
    s <- Gen.oneOf(Gen.const(0L), Gen.choose(Long.MinValue, Long.MaxValue))
    e <- Gen.oneOf(Gen.const(0L), Gen.choose(Long.MinValue, Long.MaxValue))
  } yield OffsetInterval(s, e)

  private val genStep: Gen[SqlQueryStep] = for {
    alias <- Gen.option(genStr)
    query <- genStr
  } yield SqlQueryStep(alias, query)

  private val genWatermark: Gen[Watermark] = for {
    st <- genInstant; et <- genInstant
  } yield Watermark(st, et)

  private val genInput: Gen[TransformRequestInput] = for {
    id <- genStr; alias <- genStr; qAlias <- genStr; vocab <- genVocab
    ivl <- Gen.option(genInterval)
    paths <- Gen.listOfN(3, genStr).flatMap(l => Gen.choose(0, 3).map(l.take))
    schema <- genStr
    wms <- Gen.listOfN(2, genWatermark).flatMap(l => Gen.choose(0, 2).map(l.take))
  } yield TransformRequestInput(id, alias, qAlias, vocab, ivl, paths, schema, wms)

  private val genTransformRequest: Gen[TransformRequest] = for {
    id <- genStr; alias <- genStr; st <- genInstant; vocab <- genVocab
    steps <- Gen.listOfN(3, genStep).flatMap(l => Gen.choose(0, 3).map(l.take))
    inputs <- Gen.listOfN(2, genInput).flatMap(l => Gen.choose(0, 2).map(l.take))
    next <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, Long.MaxValue))
    data <- genStr
    prev <- Gen.option(genStr)
    ckpt <- Gen.option(genStr)
  } yield TransformRequest(id, alias, st, vocab, steps, inputs, next, data, prev, ckpt)

  private val genRawRequest: Gen[RawQueryRequest] = for {
    paths <- Gen.listOfN(3, genStr).flatMap(l => Gen.choose(0, 3).map(l.take))
    steps <- Gen.listOfN(2, genStep).flatMap(l => Gen.choose(0, 2).map(l.take))
    out <- genStr
  } yield RawQueryRequest(paths, steps, out)

  private val genEngineError: Gen[EngineError] = Gen.oneOf(
    genStr.map(InvalidQuery(_)), genStr.map(EngineInternalError(_)))

  private val genTransformResponse: Gen[Either[EngineError, TransformResponseSuccess]] =
    Gen.oneOf(
      genEngineError.map(Left(_)),
      (for {
        ivl <- Gen.option(genInterval)
        wm <- Gen.option(genInstant)
      } yield TransformResponseSuccess(ivl, wm)).map(Right(_)))

  private val genRawResponse: Gen[Either[EngineError, RawQueryResponseSuccess]] =
    Gen.oneOf(
      genEngineError.map(Left(_)),
      Gen.oneOf(Gen.const(0L), Gen.choose(0L, Long.MaxValue))
        .map(n => Right(RawQueryResponseSuccess(n))))

  // =========================================================== properties

  property("TransformRequest: codec round-trip ∧ independent-reader agreement") =
    forAll(genTransformRequest) { req =>
      val bytes = FlatbuffersPayloadCodec.writeTransformRequest(req)
      val codec = FlatbuffersPayloadCodec.readTransformRequest(bytes)
      val indep = RawFbReader.readTransformRequest(bytes)
      (codec == req) :| s"codec read-back mismatch: $codec" &&
        (indep == req) :| s"independent reader mismatch: $indep"
    }

  property("RawQueryRequest: codec round-trip ∧ independent-reader agreement") =
    forAll(genRawRequest) { req =>
      val bytes = FlatbuffersPayloadCodec.writeRawQueryRequest(req)
      val codec = FlatbuffersPayloadCodec.readRawQueryRequest(bytes)
      val indep = RawFbReader.readRawQueryRequest(bytes)
      (codec == req) :| s"codec read-back mismatch: $codec" &&
        (indep == req) :| s"independent reader mismatch: $indep"
    }

  property("TransformResponse: codec round-trip ∧ independent-reader agreement") =
    forAll(genTransformResponse) { resp =>
      val bytes = FlatbuffersPayloadCodec.writeTransformResponse(resp)
      val codec = FlatbuffersPayloadCodec.readTransformResponse(bytes)
      val indep = RawFbReader.readTransformResponse(bytes)
      (codec == resp) :| s"codec read-back mismatch: $codec" &&
        (indep == resp) :| s"independent reader mismatch: $indep"
    }

  property("RawQueryResponse: codec round-trip ∧ independent-reader agreement") =
    forAll(genRawResponse) { resp =>
      val bytes = FlatbuffersPayloadCodec.writeRawQueryResponse(resp)
      val codec = FlatbuffersPayloadCodec.readRawQueryResponse(bytes)
      val indep = RawFbReader.readRawQueryResponse(bytes)
      (codec == resp) :| s"codec read-back mismatch: $codec" &&
        (indep == resp) :| s"independent reader mismatch: $indep"
    }

  property("empty-string vs absent optional strings stay distinguishable") =
    Prop {
      val req = TransformRequest(
        "d", "a", Instant.parse("2024-01-01T00:00:00Z"), DatasetVocabulary(),
        Seq(SqlQueryStep(Some(""), "select 1")), Nil, 0L, "/out",
        prevCheckpointPath = Some(""), newCheckpointPath = None)
      val back = FlatbuffersPayloadCodec.readTransformRequest(
        FlatbuffersPayloadCodec.writeTransformRequest(req))
      back.queries.head.alias.contains("") &&
        back.prevCheckpointPath.contains("") && back.newCheckpointPath.isEmpty
    }
}

/** Test-only flatbuffers decoder written from the wire rules in engine.fbs —
  * plain absolute-index ByteBuffer reads, zero shared traversal code with
  * FlatbuffersPayloadCodec (which subclasses flatbuffers-java's Table).
  * Field ids are re-derived here from engine.fbs declaration order; if any
  * slot constant in the codec drifts from the schema, the two decoders
  * disagree and the properties above fail. */
private[server] object RawFbReader {

  /** Cursor over one table position. Wire rules used:
    *   - at `pos` sits an int32 soffset to the vtable (vtPos = pos - s);
    *   - vtable: uint16 vtable-size, uint16 table-size, then uint16 field
    *     offsets (relative to pos), one per slot, 0 = absent;
    *   - field id n is vtable entry at byte `4 + 2n`;
    *   - offset fields hold a uint32 relative pointer; strings are
    *     [len:uint32][bytes]; vectors are [len:uint32][elems];
    *   - structs are inline at the field position. */
  private final class T(bb: ByteBuffer, pos: Int) {
    private val vtPos = pos - bb.getInt(pos)
    private val vtSize = bb.getShort(vtPos) & 0xffff

    private def fieldPos(id: Int): Int = {
      val slot = 4 + 2 * id
      if (slot + 2 > vtSize) 0
      else {
        val rel = bb.getShort(vtPos + slot) & 0xffff
        if (rel == 0) 0 else pos + rel
      }
    }

    private def indirect(p: Int): Int = p + bb.getInt(p)

    private def strAt(p: Int): String = {
      val len = bb.getInt(p)
      val out = new Array[Byte](len)
      var i = 0
      while (i < len) { out(i) = bb.get(p + 4 + i); i += 1 }
      new String(out, StandardCharsets.UTF_8)
    }

    def str(id: Int): Option[String] =
      fieldPos(id) match { case 0 => None; case p => Some(strAt(indirect(p))) }
    def long(id: Int, default: Long): Long =
      fieldPos(id) match { case 0 => default; case p => bb.getLong(p) }
    def ubyte(id: Int, default: Int): Int =
      fieldPos(id) match { case 0 => default; case p => bb.get(p) & 0xff }
    def table(id: Int): Option[T] =
      fieldPos(id) match { case 0 => None; case p => Some(new T(bb, indirect(p))) }
    def structAt(id: Int): Option[Int] =
      fieldPos(id) match { case 0 => None; case p => Some(p) }
    def tableVec(id: Int): Seq[T] =
      fieldPos(id) match {
        case 0 => Nil
        case p =>
          val v = indirect(p)
          (0 until bb.getInt(v)).map(j => new T(bb, indirect(v + 4 + j * 4)))
      }
    def strVec(id: Int): Seq[String] =
      fieldPos(id) match {
        case 0 => Nil
        case p =>
          val v = indirect(p)
          (0 until bb.getInt(v)).map(j => strAt(indirect(v + 4 + j * 4)))
      }

    /** struct Timestamp: int32 year @0, uint16 ordinal @4, (2 pad),
      * uint32 seconds_from_midnight @8, uint32 nanosecond @12. */
    def timestampAt(p: Int): Instant =
      LocalDate.ofYearDay(bb.getInt(p), bb.getShort(p + 4) & 0xffff)
        .atStartOfDay(ZoneOffset.UTC)
        .plusSeconds((bb.getInt(p + 8) & 0xffffffffL))
        .plusNanos(bb.getInt(p + 12) & 0xffffffffL)
        .toInstant
  }

  private def root(bytes: Array[Byte]): T = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new T(bb, bb.getInt(0))
  }

  // field ids below re-derived from engine.fbs declaration order

  private def readVocab(t: Option[T]): DatasetVocabulary = t match {
    case None => DatasetVocabulary()
    case Some(v) =>
      val d = DatasetVocabulary()
      DatasetVocabulary(
        v.str(0).getOrElse(d.offsetColumn),
        v.str(1).getOrElse(d.operationTypeColumn),
        v.str(2).getOrElse(d.systemTimeColumn),
        v.str(3).getOrElse(d.eventTimeColumn))
  }

  private def readInterval(t: T): OffsetInterval =
    OffsetInterval(t.long(0, 0L), t.long(1, 0L))

  /** union Transform { TransformSql = 1 }; TransformSql.queries is id 3,
    * single-query shorthand id 2. */
  private def readSteps(variant: Int, t: Option[T]): Seq[SqlQueryStep] = {
    require(variant == 1, s"unexpected Transform discriminant $variant")
    val sql = t.getOrElse(sys.error("missing transform"))
    val steps = sql.tableVec(3).map(s =>
      SqlQueryStep(s.str(0), s.str(1).getOrElse(sys.error("missing query"))))
    if (steps.nonEmpty) steps
    else sql.str(2).map(SqlQueryStep.output).toSeq
  }

  def readTransformRequest(bytes: Array[Byte]): TransformRequest = {
    val t = root(bytes)
    TransformRequest(
      datasetId = t.str(0).orNull,
      datasetAlias = t.str(1).orNull,
      systemTime = t.structAt(2).map(t.timestampAt).getOrElse(sys.error("missing system_time")),
      vocab = readVocab(t.table(3)),
      queries = readSteps(t.ubyte(4, 0), t.table(5)),
      queryInputs = t.tableVec(6).map { in =>
        TransformRequestInput(
          datasetId = in.str(0).orNull,
          datasetAlias = in.str(1).orNull,
          queryAlias = in.str(2).orNull,
          vocab = readVocab(in.table(3)),
          offsetInterval = in.table(4).map(readInterval),
          dataPaths = in.strVec(5),
          schemaFile = in.str(6).orNull,
          explicitWatermarks = in.tableVec(7).map(w =>
            Watermark(
              systemTime = w.structAt(0).map(w.timestampAt).getOrElse(sys.error("missing wm system_time")),
              eventTime = w.structAt(1).map(w.timestampAt).getOrElse(sys.error("missing wm event_time")))),
        )
      },
      nextOffset = t.long(7, 0L),
      newDataPath = t.str(10).orNull,
      prevCheckpointPath = t.str(8),
      newCheckpointPath = t.str(9),
    )
  }

  def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest = {
    val t = root(bytes)
    RawQueryRequest(
      inputDataPaths = t.strVec(0),
      queries = readSteps(t.ubyte(1, 0), t.table(2)),
      outputDataPath = t.str(3).orNull)
  }

  /** Response roots: value union at ids 0 (type) + 1 (value); variants
    * Progress=1, InvalidQuery=2, InternalError=3, Success=4. */
  private def readResponse[A](bytes: Array[Byte], success: T => A): Either[EngineError, A] = {
    val t = root(bytes)
    val v = t.table(1).getOrElse(sys.error("missing union value"))
    t.ubyte(0, 0) match {
      case 2 => Left(InvalidQuery(v.str(0).getOrElse(sys.error("missing message"))))
      case 3 => Left(EngineInternalError(v.str(0).getOrElse(sys.error("missing message"))))
      case 4 => Right(success(v))
      case other => sys.error(s"unexpected response discriminant $other")
    }
  }

  def readTransformResponse(bytes: Array[Byte]): Either[EngineError, TransformResponseSuccess] =
    readResponse(bytes, v => TransformResponseSuccess(
      newOffsetInterval = v.table(0).map(readInterval),
      newWatermark = v.structAt(1).map(v.timestampAt)))

  def readRawQueryResponse(bytes: Array[Byte]): Either[EngineError, RawQueryResponseSuccess] =
    readResponse(bytes, v => RawQueryResponseSuccess(v.long(0, 0L)))
}
