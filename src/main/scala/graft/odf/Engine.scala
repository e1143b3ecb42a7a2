package graft.odf

import org.apache.spark.sql.SparkSession

/** The ODF engine: orchestration of A1-A17 over Spark
  * (/root/reference/src/engine.rs:56-184).
  *
  * Primary API is in-process Scala, mirroring the reference test harness's
  * entry point (/root/reference/tests/tests/test_transform.rs:237-281); a
  * gRPC transport would be an adapter over this (SURVEY.md §7.6).
  *
  * Everything up to the sink is lazy Catalyst plan construction — the single
  * execution happens inside `ParquetSink.writeSingleFile`, matching the
  * reference's one-materialization lifecycle (SURVEY.md §3.1). Temp views are
  * inlined by Catalyst, so the engine's offset filters, the user's SQL steps,
  * the normalization casts, and the system-column projections all fuse into
  * one optimized plan with pushdown reaching the parquet scans.
  */
/** Offset-strategy default (r20): WindowedOffsets, because this engine's
  * only sink is the A14 single-file parquet writer, whose `coalesce(1)`
  * already drags the entire upstream stage (scan, filters, the user's SQL)
  * into ONE task in the write pass. Under that contract the windowed
  * numbering is strictly cheaper: the prefix-sum strategy pays a full
  * EXTRA distributed evaluation of the transform plan for its counting
  * pass (only payload projections prune — the scan, joins and filters all
  * re-run) and then single-tasks the whole pipeline in the write anyway,
  * while the windowed plan evaluates everything exactly once with the
  * identical dense, order-preserving offsets (PropertiesSpec pins the
  * equality). PrefixSumOffsets remains the right strategy for any future
  * multi-file sink — pass it explicitly then. */
class Engine(base: SparkSession, offsetStrategy: SystemColumns.OffsetStrategy = SystemColumns.WindowedOffsets) {

  OdfSessions.configureBase(base)

  /** Entry point 1 — the main derive path (engine.rs:127-184). */
  def executeTransform(request: TransformRequest): Either[EngineError, TransformResponseSuccess] = {
    val spark = OdfSessions.newRequestSession(base)
    try {
      request.queryInputs.foreach(Inputs.register(spark, _))
      for {
        raw <- Queries.buildOutput(spark, request.queries)
        normalized = Normalize.normalizeRawResult(raw, request.vocab)
        _ <- Validate.validateRawResult(normalized.schema, request.vocab)
        stamped = SystemColumns.withSystemColumns(
          normalized, request.vocab, request.systemTime, request.nextOffset, offsetStrategy)
        numRows = ParquetSink.writeSingleFile(stamped, request.newDataPath)
      } yield TransformResponseSuccess(
        newOffsetInterval = Watermarks.newOffsetInterval(request.nextOffset, numRows),
        newWatermark = Watermarks.computeNewWatermark(request.queryInputs),
      )
    } catch {
      case e: IllegalArgumentException => Left(InvalidQuery(e.getMessage))
      case e: Exception => Left(EngineInternalError(stringify(e)))
    }
  }

  /** Entry point 2 — ingest preprocessing (A17, engine.rs:56-125): the input
    * parquet files are registered as table `input` with no offset filtering;
    * after the view chain only normalization runs (default vocabulary) — no
    * validation, no system columns, no watermark. */
  def executeRawQuery(request: RawQueryRequest): Either[EngineError, RawQueryResponseSuccess] = {
    val spark = OdfSessions.newRequestSession(base)
    try {
      spark.read.parquet(request.inputDataPaths: _*).createOrReplaceTempView("input")
      for {
        raw <- Queries.buildOutput(spark, request.queries)
        normalized = Normalize.normalizeRawResult(raw, DatasetVocabulary())
        numRecords = ParquetSink.writeSingleFile(normalized, request.outputDataPath)
      } yield RawQueryResponseSuccess(numRecords)
    } catch {
      case e: Exception => Left(EngineInternalError(stringify(e)))
    }
  }

  private def stringify(e: Exception): String = {
    val m = e.getMessage
    if (m == null) e.getClass.getName else m
  }
}
