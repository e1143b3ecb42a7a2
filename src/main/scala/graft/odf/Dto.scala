package graft.odf

import java.time.Instant

/** ODF engine request/response DTOs.
  *
  * Shapes mirror the Open Data Fabric engine contract as exercised by the
  * reference implementation (kamu-engine-datafusion) test harness — see
  * /root/reference/tests/tests/test_transform.rs:237-281 and
  * /root/reference/src/engine.rs:127-184 for field usage. Kept wire-shaped so
  * a gRPC/flatbuffer adapter can be layered on later without touching the
  * engine (SURVEY.md §7.6).
  */

/** Per-dataset names of the four system columns.
  * Defaults per /root/reference/tests/tests/test_regressions.rs:127-132. */
final case class DatasetVocabulary(
    offsetColumn: String = "offset",
    operationTypeColumn: String = "op",
    systemTimeColumn: String = "system_time",
    eventTimeColumn: String = "event_time",
)

/** Record operation type carried in the `op` column.
  * Values proven by golden output /root/reference/tests/tests/test_transform.rs:763-811. */
object OperationType {
  val Append: Int = 0
  val Retract: Int = 1
  val CorrectFrom: Int = 2
  val CorrectTo: Int = 3
}

/** Closed interval of ledger offsets `[start, end]`
  * (/root/reference/src/engine.rs:256-262). */
final case class OffsetInterval(start: Long, end: Long)

/** Explicit watermark attached to an input
  * (/root/reference/tests/tests/test_transform.rs:443-452). */
final case class Watermark(systemTime: Instant, eventTime: Instant)

/** One step of a multi-step SQL transform. `alias = None` marks the final
  * (output) step (/root/reference/src/engine.rs:139-147). */
final case class SqlQueryStep(alias: Option[String], query: String)

object SqlQueryStep {
  def output(query: String): SqlQueryStep = SqlQueryStep(None, query)
  def named(alias: String, query: String): SqlQueryStep = SqlQueryStep(Some(alias), query)
}

/** One input dataset slice for a transform
  * (/root/reference/src/engine.rs:186-271).
  *
  * Invariant (asserted by the reference at engine.rs:193-196): either
  * `dataPaths` is empty and `offsetInterval` is None (no new data — the
  * schema file is scanned and all rows filtered out), or both are present.
  */
final case class TransformRequestInput(
    datasetId: String,
    datasetAlias: String,
    queryAlias: String,
    vocab: DatasetVocabulary,
    offsetInterval: Option[OffsetInterval],
    dataPaths: Seq[String],
    schemaFile: String,
    explicitWatermarks: Seq[Watermark],
)

/** The main derive request (/root/reference/src/engine.rs:127-184). */
final case class TransformRequest(
    datasetId: String,
    datasetAlias: String,
    systemTime: Instant,
    vocab: DatasetVocabulary,
    /** Multi-step SQL; the unaliased step is the output. The reference's
      * `temporal_tables` DTO field is accepted but ignored (SURVEY §2.B). */
    queries: Seq[SqlQueryStep],
    queryInputs: Seq[TransformRequestInput],
    nextOffset: Long,
    /** Absolute path the single output parquet file must appear at. */
    newDataPath: String,
    /** Present in the wire DTO; never read by this engine (stateless —
      * /root/reference/src/engine.rs has no use of prev_checkpoint_path). */
    prevCheckpointPath: Option[String] = None,
    newCheckpointPath: Option[String] = None,
)

final case class TransformResponseSuccess(
    newOffsetInterval: Option[OffsetInterval],
    newWatermark: Option[Instant],
)

/** Ingest-preprocessing request (/root/reference/src/engine.rs:56-125). */
final case class RawQueryRequest(
    inputDataPaths: Seq[String],
    queries: Seq[SqlQueryStep],
    outputDataPath: String,
)

final case class RawQueryResponseSuccess(numRecords: Long)

/** Error ADT mirroring the reference's response variants
  * (/root/reference/src/grpc.rs error mapping). */
sealed trait EngineError extends Product with Serializable {
  def message: String
}
/** SQL failed to parse/analyze, or the result schema violates the ODF
  * contract (/root/reference/src/engine.rs:287-296, :375-476). */
final case class InvalidQuery(message: String) extends EngineError
final case class EngineInternalError(message: String) extends EngineError
