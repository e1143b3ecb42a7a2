package graft.odf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A7-A8: result normalization (/root/reference/src/engine.rs:329-373).
  *
  * The reference rewrites the result projection so that
  *   - every timestamp column (any unit, any zone, including naive) becomes
  *     `Timestamp(Millisecond, "UTC")` — Flink-compat rationale at
  *     engine.rs:326-328;
  *   - an op column arriving as a narrow int (`Int8/UInt8/Int16/UInt16/
  *     UInt32`) is widened to `Int32` (engine.rs:351-362).
  *
  * Spark mapping: `TimestampType` IS the instant (UTC-adjusted) timestamp —
  * unit is fixed at micros internally and becomes millis on the parquet wire
  * via `spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS` (set by
  * [[OdfSessions]]). So the only casts needed here are
  * `TimestampNTZType → TimestampType` (naive → UTC instant; the session zone
  * is pinned to UTC, so the naive value is reinterpreted as UTC, exactly like
  * DataFusion's cast) and the op-column int widening. The projection is a
  * no-op short-circuit when nothing needs changing, like the reference.
  *
  * The `UInt32 → Int32` leg of the reference's widening happens in
  * [[Inputs]], not here: Spark surfaces parquet UINT32 as LongType, which is
  * indistinguishable from a genuine Int64 once inside the plan — and a
  * computed Int64 op column must still be REJECTED (engine.rs:394-413). So
  * the input scan consults the parquet footer (where unsignedness is still
  * visible) and narrows there; by result time, LongType op = error.
  */
object Normalize {

  def normalizeRawResult(df: DataFrame, vocab: DatasetVocabulary): DataFrame = {
    var noop = true
    val select = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampNTZType =>
          noop = false
          col(quoted(f.name)).cast(TimestampType).as(f.name)
        case ByteType | ShortType if f.name == vocab.operationTypeColumn =>
          noop = false
          col(quoted(f.name)).cast(IntegerType).as(f.name)
        case _ => col(quoted(f.name))
      }
    }
    if (noop) df else df.select(select.toIndexedSeq: _*)
  }

  /** Column-name quoting so names with dots/backticks resolve verbatim. */
  private[odf] def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
