package graft.odf.server

import java.nio.{ByteBuffer, ByteOrder}
import java.time.{Instant, LocalDate, ZoneOffset}

import com.google.flatbuffers.{FlatBufferBuilder, Table}

import graft.odf._

/** Flatbuffers payload codec for the ODF engine protocol, implementing the
  * vendored schema at `src/main/resources/odf/engine.fbs` (see that file's
  * provenance header — reconstructed offline from the public ODF spec; the
  * reference's wire serde is `FlatbuffersEngineProtocol`,
  * /root/reference/src/grpc.rs:14,84-86).
  *
  * Built directly on the flatbuffers-java runtime (on Spark's classpath):
  * `flatc` is unavailable here, so instead of generated accessors each
  * table's field ids are spelled out as named slot constants below, kept in
  * lockstep with the id comments in engine.fbs and pinned by byte-level
  * fixture tests in GrpcServerSpec. Both directions are implemented for
  * every message — the server needs read-request/write-response, and the
  * extra write-request/read-response half makes this object a complete
  * client-side codec (used by the round-trip tests, usable by a Scala
  * client).
  *
  * Layout rules relied on (standard flatbuffers):
  *   - field id n lives at vtable slot `4 + 2n`;
  *   - a union field takes two ids: `<name>_type` (ubyte) then `<name>`;
  *   - union discriminants are 1-based in declaration order, 0 = NONE;
  *   - absent optional fields are simply missing from the vtable;
  *   - scalars equal to their default are omitted (readers supply defaults).
  */
object FlatbuffersPayloadCodec extends EnginePayloadCodec {

  override val name = "flatbuffers"

  // ---- union discriminants (engine.fbs declaration order) ----
  private[server] val TransformSqlVariant: Byte = 1
  private[server] val VariantProgress: Byte = 1
  private[server] val VariantInvalidQuery: Byte = 2
  private[server] val VariantInternalError: Byte = 3
  private[server] val VariantSuccess: Byte = 4

  // ---- field ids (engine.fbs id comments) ----
  private object Req { // TransformRequest
    val DatasetId = 0; val DatasetAlias = 1; val SystemTime = 2; val Vocab = 3
    val TransformType = 4; val Transform = 5; val QueryInputs = 6
    val NextOffset = 7; val PrevCheckpointPath = 8; val NewCheckpointPath = 9
    val NewDataPath = 10; val NumFields = 11
  }
  private object In { // TransformRequestInput
    val DatasetId = 0; val DatasetAlias = 1; val QueryAlias = 2; val Vocab = 3
    val OffsetInterval = 4; val DataPaths = 5; val SchemaFile = 6
    val ExplicitWatermarks = 7; val NumFields = 8
  }
  private object Raw { // RawQueryRequest
    val InputDataPaths = 0; val TransformType = 1; val Transform = 2
    val OutputDataPath = 3; val NumFields = 4
  }
  private object Sql { // TransformSql
    val Engine = 0; val Version = 1; val Query = 2; val Queries = 3
    val TemporalTables = 4; val NumFields = 5
  }
  private object Step { val Alias = 0; val Query = 1; val NumFields = 2 }
  private object Vocab {
    val OffsetColumn = 0; val OperationTypeColumn = 1; val SystemTimeColumn = 2
    val EventTimeColumn = 3; val NumFields = 4
  }
  private object Interval { val Start = 0; val End = 1; val NumFields = 2 }
  private object Wm { val SystemTime = 0; val EventTime = 1; val NumFields = 2 }
  private object Root { val ValueType = 0; val Value = 1; val NumFields = 2 }
  private object TxOk { val NewOffsetInterval = 0; val NewWatermark = 1; val NumFields = 2 }
  private object RawOk { val NumRecords = 0; val NumFields = 1 }
  private object Err { val Message = 0; val Backtrace = 1; val NumFields = 2 }

  /** The compiled-in slot assignments, keyed by engine.fbs table name with
    * fields in slot order (unions expanded to their two slots,
    * `<name>_type` / `<name>`, per the layout rules pinned in engine.fbs).
    * FlatbuffersGoldenBytesSpec walks this map against a fresh parse of the
    * vendored schema TEXT, so an engine.fbs edit that reorders or renames
    * fields fails a spec immediately — even without regenerating the golden
    * bytes (r17, closing the carried wire-format item as far as offline
    * allows). Built from the same constants the codec reads/writes with, so
    * it cannot drift from the code. */
  private[server] val slotTables: Map[String, Seq[(String, Int)]] = Map(
    "TransformRequest" -> Seq(
      "dataset_id" -> Req.DatasetId, "dataset_alias" -> Req.DatasetAlias,
      "system_time" -> Req.SystemTime, "vocab" -> Req.Vocab,
      "transform_type" -> Req.TransformType, "transform" -> Req.Transform,
      "query_inputs" -> Req.QueryInputs, "next_offset" -> Req.NextOffset,
      "prev_checkpoint_path" -> Req.PrevCheckpointPath,
      "new_checkpoint_path" -> Req.NewCheckpointPath,
      "new_data_path" -> Req.NewDataPath),
    "TransformRequestInput" -> Seq(
      "dataset_id" -> In.DatasetId, "dataset_alias" -> In.DatasetAlias,
      "query_alias" -> In.QueryAlias, "vocab" -> In.Vocab,
      "offset_interval" -> In.OffsetInterval, "data_paths" -> In.DataPaths,
      "schema_file" -> In.SchemaFile,
      "explicit_watermarks" -> In.ExplicitWatermarks),
    "RawQueryRequest" -> Seq(
      "input_data_paths" -> Raw.InputDataPaths,
      "transform_type" -> Raw.TransformType, "transform" -> Raw.Transform,
      "output_data_path" -> Raw.OutputDataPath),
    "TransformSql" -> Seq(
      "engine" -> Sql.Engine, "version" -> Sql.Version, "query" -> Sql.Query,
      "queries" -> Sql.Queries, "temporal_tables" -> Sql.TemporalTables),
    "SqlQueryStep" -> Seq("alias" -> Step.Alias, "query" -> Step.Query),
    "DatasetVocabulary" -> Seq(
      "offset_column" -> Vocab.OffsetColumn,
      "operation_type_column" -> Vocab.OperationTypeColumn,
      "system_time_column" -> Vocab.SystemTimeColumn,
      "event_time_column" -> Vocab.EventTimeColumn),
    "OffsetInterval" -> Seq("start" -> Interval.Start, "end" -> Interval.End),
    "Watermark" -> Seq(
      "system_time" -> Wm.SystemTime, "event_time" -> Wm.EventTime),
    "TransformResponseRoot" -> Seq(
      "value_type" -> Root.ValueType, "value" -> Root.Value),
    "RawQueryResponseRoot" -> Seq(
      "value_type" -> Root.ValueType, "value" -> Root.Value),
    "TransformResponseSuccess" -> Seq(
      "new_offset_interval" -> TxOk.NewOffsetInterval,
      "new_watermark" -> TxOk.NewWatermark),
    "RawQueryResponseSuccess" -> Seq("num_records" -> RawOk.NumRecords),
    "TransformResponseInvalidQuery" -> Seq("message" -> Err.Message),
    "TransformResponseInternalError" -> Seq(
      "message" -> Err.Message, "backtrace" -> Err.Backtrace),
    "RawQueryResponseInvalidQuery" -> Seq("message" -> Err.Message),
    "RawQueryResponseInternalError" -> Seq(
      "message" -> Err.Message, "backtrace" -> Err.Backtrace))

  /** Union variant discriminants as compiled in (1-based declaration
    * order), keyed by union name — walked against engine.fbs alongside
    * [[slotTables]]. */
  private[server] val unionVariants: Map[String, Seq[(String, Byte)]] = Map(
    "Transform" -> Seq("TransformSql" -> TransformSqlVariant),
    "TransformResponse" -> Seq(
      "TransformResponseProgress" -> VariantProgress,
      "TransformResponseInvalidQuery" -> VariantInvalidQuery,
      "TransformResponseInternalError" -> VariantInternalError,
      "TransformResponseSuccess" -> VariantSuccess),
    "RawQueryResponse" -> Seq(
      "RawQueryResponseProgress" -> VariantProgress,
      "RawQueryResponseInvalidQuery" -> VariantInvalidQuery,
      "RawQueryResponseInternalError" -> VariantInternalError,
      "RawQueryResponseSuccess" -> VariantSuccess))

  // =========================================================== timestamps ==

  /** struct Timestamp: int32 year @0, uint16 ordinal @4, pad @6,
    * uint32 seconds_from_midnight @8, uint32 nanosecond @12 — 16 bytes,
    * 4-aligned. Struct fields are written back-to-front. */
  private def putTimestamp(b: FlatBufferBuilder, t: Instant): Int = {
    val odt = t.atOffset(ZoneOffset.UTC)
    b.prep(4, 16)
    b.putInt(odt.getNano)
    b.putInt(odt.toLocalTime.toSecondOfDay)
    b.pad(2)
    b.putShort(odt.getDayOfYear.toShort)
    b.putInt(odt.getYear)
    b.offset()
  }

  private def readTimestamp(bb: ByteBuffer, pos: Int): Instant = {
    val year = bb.getInt(pos)
    val ordinal = bb.getShort(pos + 4) & 0xffff
    val seconds = bb.getInt(pos + 8)
    val nano = bb.getInt(pos + 12)
    LocalDate.ofYearDay(year, ordinal).atStartOfDay(ZoneOffset.UTC)
      .plusSeconds(seconds.toLong).plusNanos(nano.toLong).toInstant
  }

  // ========================================================= table reader ==

  /** Minimal generated-code stand-in: one reusable cursor over any table.
    * flatbuffers-java's [[Table]] exposes the traversal primitives as
    * protected members; this subclass turns them into slot-addressed
    * accessors (field id, not byte offset). */
  private final class Fb extends Table {
    def at(pos: Int, buf: ByteBuffer): Fb = { __reset(pos, buf); this }
    def buf: ByteBuffer = bb
    private def o(field: Int): Int = __offset(4 + 2 * field)
    def str(field: Int): String = {
      val x = o(field); if (x == 0) null else __string(x + bb_pos)
    }
    def longAt(field: Int, default: Long): Long = {
      val x = o(field); if (x == 0) default else bb.getLong(x + bb_pos)
    }
    def byteAt(field: Int, default: Byte): Byte = {
      val x = o(field); if (x == 0) default else bb.get(x + bb_pos)
    }
    def structPos(field: Int): Int = {
      val x = o(field); if (x == 0) -1 else x + bb_pos
    }
    def child(field: Int): Fb = {
      val x = o(field)
      if (x == 0) null else new Fb().at(__indirect(x + bb_pos), bb)
    }
    def vecLen(field: Int): Int = {
      val x = o(field); if (x == 0) 0 else __vector_len(x)
    }
    def vecTable(field: Int, j: Int): Fb =
      new Fb().at(__indirect(__vector(o(field)) + j * 4), bb)
    def vecStr(field: Int, j: Int): String =
      __string(__vector(o(field)) + j * 4)
  }

  private def root(bytes: Array[Byte]): Fb = {
    require(bytes.length >= 8, s"flatbuffer too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pos = bb.getInt(0)
    require(pos >= 4 && pos < bytes.length, s"bad flatbuffer root offset $pos")
    new Fb().at(pos, bb)
  }

  private def required(s: String, what: String): String = {
    require(s != null, s"missing required field: $what")
    s
  }

  // ====================================================== shared builders ==

  private def putStringVector(b: FlatBufferBuilder, xs: Seq[String]): Int =
    b.createVectorOfTables(xs.map(x => b.createString(x)).toArray)

  private def putVocab(b: FlatBufferBuilder, v: DatasetVocabulary): Int = {
    val offs = Seq(v.offsetColumn, v.operationTypeColumn, v.systemTimeColumn,
      v.eventTimeColumn).map(b.createString(_))
    b.startTable(Vocab.NumFields)
    b.addOffset(Vocab.OffsetColumn, offs(0), 0)
    b.addOffset(Vocab.OperationTypeColumn, offs(1), 0)
    b.addOffset(Vocab.SystemTimeColumn, offs(2), 0)
    b.addOffset(Vocab.EventTimeColumn, offs(3), 0)
    b.endTable()
  }

  private def readVocab(t: Fb): DatasetVocabulary =
    if (t == null) DatasetVocabulary()
    else {
      val d = DatasetVocabulary()
      DatasetVocabulary(
        offsetColumn = Option(t.str(Vocab.OffsetColumn)).getOrElse(d.offsetColumn),
        operationTypeColumn = Option(t.str(Vocab.OperationTypeColumn)).getOrElse(d.operationTypeColumn),
        systemTimeColumn = Option(t.str(Vocab.SystemTimeColumn)).getOrElse(d.systemTimeColumn),
        eventTimeColumn = Option(t.str(Vocab.EventTimeColumn)).getOrElse(d.eventTimeColumn),
      )
    }

  private def putInterval(b: FlatBufferBuilder, i: OffsetInterval): Int = {
    b.startTable(Interval.NumFields)
    b.addLong(Interval.Start, i.start, 0L)
    b.addLong(Interval.End, i.end, 0L)
    b.endTable()
  }

  private def readInterval(t: Fb): OffsetInterval =
    OffsetInterval(t.longAt(Interval.Start, 0L), t.longAt(Interval.End, 0L))

  private def putTransform(b: FlatBufferBuilder, steps: Seq[SqlQueryStep]): Int = {
    val stepOffs = steps.map { s =>
      val aliasOff = s.alias.map(a => b.createString(a)).getOrElse(0)
      val queryOff = b.createString(s.query)
      b.startTable(Step.NumFields)
      if (aliasOff != 0) b.addOffset(Step.Alias, aliasOff, 0)
      b.addOffset(Step.Query, queryOff, 0)
      b.endTable()
    }.toArray
    val engineOff = b.createString("spark")
    val vecOff = b.createVectorOfTables(stepOffs)
    b.startTable(Sql.NumFields)
    b.addOffset(Sql.Engine, engineOff, 0)
    b.addOffset(Sql.Queries, vecOff, 0)
    b.endTable()
  }

  /** Accepts both spellings the DTO allows: a `queries` vector, or the
    * single-`query` shorthand (one unaliased output step). */
  private def readTransform(variant: Byte, t: Fb): Seq[SqlQueryStep] = {
    require(variant == TransformSqlVariant, s"unsupported Transform variant: $variant")
    require(t != null, "missing required field: transform")
    val n = t.vecLen(Sql.Queries)
    if (n > 0)
      (0 until n).map { j =>
        val s = t.vecTable(Sql.Queries, j)
        SqlQueryStep(Option(s.str(Step.Alias)), required(s.str(Step.Query), "SqlQueryStep.query"))
      }
    else Option(t.str(Sql.Query)).map(SqlQueryStep.output).toSeq
  }

  // ====================================================== request codecs ==

  override def readTransformRequest(bytes: Array[Byte]): TransformRequest = {
    val t = root(bytes)
    val stPos = t.structPos(Req.SystemTime)
    require(stPos >= 0, "missing required field: system_time")
    TransformRequest(
      datasetId = required(t.str(Req.DatasetId), "dataset_id"),
      datasetAlias = required(t.str(Req.DatasetAlias), "dataset_alias"),
      systemTime = readTimestamp(t.buf, stPos),
      vocab = readVocab(t.child(Req.Vocab)),
      queries = readTransform(t.byteAt(Req.TransformType, 0), t.child(Req.Transform)),
      queryInputs = (0 until t.vecLen(Req.QueryInputs)).map { j =>
        val in = t.vecTable(Req.QueryInputs, j)
        val ivl = in.child(In.OffsetInterval)
        TransformRequestInput(
          datasetId = required(in.str(In.DatasetId), "input.dataset_id"),
          datasetAlias = required(in.str(In.DatasetAlias), "input.dataset_alias"),
          queryAlias = required(in.str(In.QueryAlias), "input.query_alias"),
          vocab = readVocab(in.child(In.Vocab)),
          offsetInterval = Option(ivl).map(readInterval),
          dataPaths = (0 until in.vecLen(In.DataPaths)).map(in.vecStr(In.DataPaths, _)),
          schemaFile = required(in.str(In.SchemaFile), "input.schema_file"),
          explicitWatermarks = (0 until in.vecLen(In.ExplicitWatermarks)).map { k =>
            val w = in.vecTable(In.ExplicitWatermarks, k)
            Watermark(
              systemTime = readTimestamp(w.buf, w.structPos(Wm.SystemTime)),
              eventTime = readTimestamp(w.buf, w.structPos(Wm.EventTime)))
          },
        )
      },
      nextOffset = t.longAt(Req.NextOffset, 0L),
      newDataPath = required(t.str(Req.NewDataPath), "new_data_path"),
      prevCheckpointPath = Option(t.str(Req.PrevCheckpointPath)),
      newCheckpointPath = Option(t.str(Req.NewCheckpointPath)),
    )
  }

  /** Client-side half (used by round-trip tests / a Scala client). */
  def writeTransformRequest(req: TransformRequest): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val idOff = b.createString(req.datasetId)
    val aliasOff = b.createString(req.datasetAlias)
    val vocabOff = putVocab(b, req.vocab)
    val txOff = putTransform(b, req.queries)
    val inputOffs = req.queryInputs.map { in =>
      val inId = b.createString(in.datasetId)
      val inAlias = b.createString(in.datasetAlias)
      val inQueryAlias = b.createString(in.queryAlias)
      val inVocab = putVocab(b, in.vocab)
      val inIvl = in.offsetInterval.map(putInterval(b, _)).getOrElse(0)
      val inPaths = putStringVector(b, in.dataPaths)
      val inSchema = b.createString(in.schemaFile)
      val wmOffs = in.explicitWatermarks.map { w =>
        b.startTable(Wm.NumFields)
        b.addStruct(Wm.SystemTime, putTimestamp(b, w.systemTime), 0)
        b.addStruct(Wm.EventTime, putTimestamp(b, w.eventTime), 0)
        b.endTable()
      }.toArray
      val wmVec = b.createVectorOfTables(wmOffs)
      b.startTable(In.NumFields)
      b.addOffset(In.DatasetId, inId, 0)
      b.addOffset(In.DatasetAlias, inAlias, 0)
      b.addOffset(In.QueryAlias, inQueryAlias, 0)
      b.addOffset(In.Vocab, inVocab, 0)
      if (inIvl != 0) b.addOffset(In.OffsetInterval, inIvl, 0)
      b.addOffset(In.DataPaths, inPaths, 0)
      b.addOffset(In.SchemaFile, inSchema, 0)
      b.addOffset(In.ExplicitWatermarks, wmVec, 0)
      b.endTable()
    }.toArray
    val inputsVec = b.createVectorOfTables(inputOffs)
    val prevOff = req.prevCheckpointPath.map(b.createString(_)).getOrElse(0)
    val ckptOff = req.newCheckpointPath.map(b.createString(_)).getOrElse(0)
    val dataOff = b.createString(req.newDataPath)
    b.startTable(Req.NumFields)
    b.addOffset(Req.DatasetId, idOff, 0)
    b.addOffset(Req.DatasetAlias, aliasOff, 0)
    b.addStruct(Req.SystemTime, putTimestamp(b, req.systemTime), 0)
    b.addOffset(Req.Vocab, vocabOff, 0)
    b.addByte(Req.TransformType, TransformSqlVariant, 0)
    b.addOffset(Req.Transform, txOff, 0)
    b.addOffset(Req.QueryInputs, inputsVec, 0)
    b.addLong(Req.NextOffset, req.nextOffset, 0L)
    if (prevOff != 0) b.addOffset(Req.PrevCheckpointPath, prevOff, 0)
    if (ckptOff != 0) b.addOffset(Req.NewCheckpointPath, ckptOff, 0)
    b.addOffset(Req.NewDataPath, dataOff, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  override def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest = {
    val t = root(bytes)
    RawQueryRequest(
      inputDataPaths =
        (0 until t.vecLen(Raw.InputDataPaths)).map(t.vecStr(Raw.InputDataPaths, _)),
      queries = readTransform(t.byteAt(Raw.TransformType, 0), t.child(Raw.Transform)),
      outputDataPath = required(t.str(Raw.OutputDataPath), "output_data_path"),
    )
  }

  def writeRawQueryRequest(req: RawQueryRequest): Array[Byte] = {
    val b = new FlatBufferBuilder(512)
    val pathsVec = putStringVector(b, req.inputDataPaths)
    val txOff = putTransform(b, req.queries)
    val outOff = b.createString(req.outputDataPath)
    b.startTable(Raw.NumFields)
    b.addOffset(Raw.InputDataPaths, pathsVec, 0)
    b.addByte(Raw.TransformType, TransformSqlVariant, 0)
    b.addOffset(Raw.Transform, txOff, 0)
    b.addOffset(Raw.OutputDataPath, outOff, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  // ===================================================== response codecs ==

  /** Both response roots share the holder-table-around-a-union shape; the
    * error variants share {message, backtrace}. Only the Success payload
    * differs, so the union write is factored over a success thunk. */
  private def writeResponse(
      resp: Either[EngineError, FlatBufferBuilder => Int]): Array[Byte] = {
    val b = new FlatBufferBuilder(256)
    val (variant, valOff) = resp match {
      case Right(mkSuccess) => (VariantSuccess, mkSuccess(b))
      case Left(InvalidQuery(m)) =>
        val mOff = b.createString(m)
        b.startTable(Err.NumFields)
        b.addOffset(Err.Message, mOff, 0)
        (VariantInvalidQuery, b.endTable())
      case Left(EngineInternalError(m)) =>
        val mOff = b.createString(m)
        b.startTable(Err.NumFields)
        b.addOffset(Err.Message, mOff, 0)
        (VariantInternalError, b.endTable())
    }
    b.startTable(Root.NumFields)
    b.addByte(Root.ValueType, variant, 0)
    b.addOffset(Root.Value, valOff, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  private def readResponse[A](bytes: Array[Byte], readSuccess: Fb => A): Either[EngineError, A] = {
    val t = root(bytes)
    val value = t.child(Root.Value)
    require(value != null, "missing response union value")
    t.byteAt(Root.ValueType, 0) match {
      case VariantSuccess => Right(readSuccess(value))
      case VariantInvalidQuery =>
        Left(InvalidQuery(required(value.str(Err.Message), "message")))
      case VariantInternalError =>
        Left(EngineInternalError(required(value.str(Err.Message), "message")))
      case other => throw new IllegalArgumentException(s"unsupported response variant: $other")
    }
  }

  override def writeTransformResponse(
      resp: Either[EngineError, TransformResponseSuccess]): Array[Byte] =
    writeResponse(resp.map { ok => b =>
      val ivlOff = ok.newOffsetInterval.map(putInterval(b, _)).getOrElse(0)
      b.startTable(TxOk.NumFields)
      if (ivlOff != 0) b.addOffset(TxOk.NewOffsetInterval, ivlOff, 0)
      ok.newWatermark.foreach(w => b.addStruct(TxOk.NewWatermark, putTimestamp(b, w), 0))
      b.endTable()
    })

  def readTransformResponse(bytes: Array[Byte]): Either[EngineError, TransformResponseSuccess] =
    readResponse(bytes, { v =>
      val wmPos = v.structPos(TxOk.NewWatermark)
      TransformResponseSuccess(
        newOffsetInterval = Option(v.child(TxOk.NewOffsetInterval)).map(readInterval),
        newWatermark = if (wmPos < 0) None else Some(readTimestamp(v.buf, wmPos)))
    })

  override def writeRawQueryResponse(
      resp: Either[EngineError, RawQueryResponseSuccess]): Array[Byte] =
    writeResponse(resp.map { ok => b =>
      b.startTable(RawOk.NumFields)
      b.addLong(RawOk.NumRecords, ok.numRecords, 0L)
      b.endTable()
    })

  def readRawQueryResponse(bytes: Array[Byte]): Either[EngineError, RawQueryResponseSuccess] =
    readResponse(bytes, v => RawQueryResponseSuccess(v.longAt(RawOk.NumRecords, 0L)))
}

/** Per-request codec selection: flatbuffers is the default wire format (it
  * is what the reference speaks); the JSON stand-in stays available for
  * hand-written clients and older tests. A JSON payload's first
  * non-whitespace byte is `{` — a flatbuffer's first 4 bytes are a
  * little-endian root offset whose low byte can never land on 0x7b with the
  * builder's 4-byte-min alignment preceded by whitespace, so the sniff is
  * unambiguous in practice and the response is written in the same format
  * the request arrived in. */
object PayloadCodecs {
  def select(bytes: Array[Byte]): EnginePayloadCodec = {
    val first = bytes.iterator.filterNot(b => Character.isWhitespace(b.toChar)).take(1).toSeq
    if (first.headOption.contains('{'.toByte)) JsonPayloadCodec else FlatbuffersPayloadCodec
  }

  /** Sentinel: the server resolves this per request via [[select]]. */
  object AutoDetect extends EnginePayloadCodec {
    override val name = "auto"
    override def readTransformRequest(bytes: Array[Byte]): TransformRequest =
      select(bytes).readTransformRequest(bytes)
    override def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest =
      select(bytes).readRawQueryRequest(bytes)
    // Direct (non-server) use writes the default wire format.
    override def writeTransformResponse(resp: Either[EngineError, TransformResponseSuccess]): Array[Byte] =
      FlatbuffersPayloadCodec.writeTransformResponse(resp)
    override def writeRawQueryResponse(resp: Either[EngineError, RawQueryResponseSuccess]): Array[Byte] =
      FlatbuffersPayloadCodec.writeRawQueryResponse(resp)
  }
}
