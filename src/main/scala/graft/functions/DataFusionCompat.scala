package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Name-compatibility layer for DataFusion scalar functions that Spark
  * either lacks or names differently. The reference delegates its whole SQL
  * surface to DataFusion (/root/reference/src/engine.rs — `ctx.sql` over
  * registered inputs), so a kamu transform written against that dialect may
  * call these by name; with this layer registered, such transforms run
  * unchanged on the Spark engine.
  *
  * Everything is an expression builder over Spark's native, codegen'd
  * expressions — no UDFs (SURVEY.md §4.3), same policy as [[JsonFunctions]].
  *
  * Semantics sources (DataFusion 51 scalar function docs):
  *   - `date_bin(interval, ts[, origin])`: floor `ts` into `interval`-wide
  *     bins anchored at `origin` (epoch default).
  *   - `to_timestamp_seconds/_millis/_micros(n)`: numeric epoch → timestamp
  *     (strings parse like a cast).
  *   - `regexp_match(str, re)`: first match as a 1-element list, NULL when
  *     no match (Postgres lineage — distinct from Spark's
  *     regexp_extract_all, which returns an empty list).
  *   - `strpos(str, substr)`: 1-based position, 0 when absent.
  *   - `to_hex(n)`: lowercase hex (Spark's `hex` is uppercase).
  *   - `array_has/array_element/array_to_string`: list-function aliases
  *     (1-based indexing, like Spark's element_at).
  */
object DataFusionCompat {

  /** Interval argument of date_bin as microseconds. DataFusion requires the
    * stride to be a concrete duration; month-bearing intervals are rejected
    * the same way it rejects them for sub-month binning. */
  private def intervalMicros(e: Expression): Long = {
    require(e.foldable, "date_bin stride must be a literal interval")
    e.eval() match {
      case micros: java.lang.Long => micros // DayTimeIntervalType payload
      case ci: CalendarInterval =>
        require(ci.months == 0, "date_bin stride with months is not supported")
        ci.days * 86400000000L + ci.microseconds
      case other =>
        throw new IllegalArgumentException(s"date_bin stride: unsupported $other")
    }
  }

  private def dateBin(args: Seq[Expression]): Expression = {
    val stride = Literal(intervalMicros(args(0)), LongType)
    val ts = UnixMicros(Cast(args(1), TimestampType))
    val origin = args.lift(2)
      .map(o => UnixMicros(Cast(o, TimestampType)))
      .getOrElse(Literal(0L, LongType))
    // bin start = ts - ((ts - origin) positive-mod stride): Pmod keeps
    // pre-origin timestamps in the bin to their LEFT (floor semantics),
    // matching DataFusion
    MicrosToTimestamp(Subtract(ts, Pmod(Subtract(ts, origin), stride)))
  }

  private def toTs(args: Seq[Expression], make: Expression => Expression): Expression = {
    val a = args.head
    a.dataType match {
      case _: StringType => Cast(a, TimestampType)
      case _: NumericType => make(Cast(a, LongType))
      case _ => Cast(a, TimestampType)
    }
  }

  private def regexpMatch(args: Seq[Expression]): Expression = {
    val Seq(str, re) = args.take(2)
    If(RLike(str, re),
      CreateArray(Seq(RegExpExtract(str, re, Literal(0)))),
      Literal.create(null, ArrayType(StringType)))
  }

  private[graft] def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // NOT "to_timestamp": Spark's builtin already has DataFusion's
    // semantics (strings parse, numerics are epoch seconds) plus the
    // 2-arg format form an override would break
    "date_bin" -> (args => dateBin(args)),
    "to_timestamp_seconds" -> (args => toTs(args, SecondsToTimestamp)),
    "to_timestamp_millis" -> (args => toTs(args, MillisToTimestamp)),
    "to_timestamp_micros" -> (args => toTs(args, MicrosToTimestamp)),
    "regexp_match" -> (args => regexpMatch(args)),
    "strpos" -> (args => StringInstr(args(0), args(1))),
    "to_hex" -> (args => Lower(Hex(args.head))),
    "array_has" -> (args => ArrayContains(args(0), args(1))),
    "array_element" -> (args => ElementAt(args(0), args(1))),
    "array_to_string" -> (args => ArrayJoin(args(0), args(1), None)),
  )

  /** Register all functions into the session's (temp) function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
