package graft.odf

import org.apache.spark.sql.types._

/** A9: result-schema validation (/root/reference/src/engine.rs:375-476).
  *
  * Pure function over the `StructType` — no execution. Error messages are
  * kept textually close to the reference's so tests can match on them.
  *
  * Checks, in reference order:
  *   1. result must not contain columns named like `offset`/`system_time`
  *      (engine.rs:379-392);
  *   2. an op column, if present, must be Int32 (engine.rs:394-413);
  *   3. an event-time column must exist (engine.rs:459-473) and be Date or
  *      UTC-adjusted Timestamp (engine.rs:415-457). Spark's `TimestampType`
  *      is always a UTC instant, so the reference's non-UTC-zone rejection
  *      (only `"+00:00"`/`"UTC"` accepted) is structurally satisfied;
  *      `TimestampNTZType` is the naive case and is rejected.
  */
object Validate {

  def validateRawResult(schema: StructType, vocab: DatasetVocabulary): Either[InvalidQuery, Unit] = {
    val systemColumns = Seq(vocab.offsetColumn, vocab.systemTimeColumn)
    for (systemColumn <- systemColumns) {
      if (schema.fieldNames.contains(systemColumn)) {
        return Left(InvalidQuery(
          "Transformed data contains a column that conflicts with the system column name, " +
            "you should either rename the data column or configure the dataset vocabulary " +
            s"to use a different name: $systemColumn"))
      }
    }

    schema.fields.find(_.name == vocab.operationTypeColumn).foreach { opCol =>
      opCol.dataType match {
        case IntegerType => ()
        case typ =>
          return Left(InvalidQuery(
            s"Operation type column '${vocab.operationTypeColumn}' should be Int32, " +
              s"but found: ${typ.simpleString}"))
      }
    }

    schema.fields.find(_.name == vocab.eventTimeColumn) match {
      case Some(eventTimeCol) =>
        eventTimeCol.dataType match {
          case DateType => Right(())
          case TimestampType => Right(())
          case TimestampNTZType =>
            Left(InvalidQuery(
              s"Event time column '${vocab.eventTimeColumn}' should be adjusted to UTC, " +
                "but local/naive timestamp found"))
          case typ =>
            Left(InvalidQuery(
              s"Event time column '${vocab.eventTimeColumn}' should be either Date or " +
                s"Timestamp, but found: ${typ.simpleString}"))
        }
      case None =>
        Left(InvalidQuery(
          s"Event time column ${vocab.eventTimeColumn} was not found amongst: " +
            schema.fieldNames.mkString(", ")))
    }
  }
}
