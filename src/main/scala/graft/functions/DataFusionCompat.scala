package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

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
  *   - crypto (`crypto_expressions`, reference Cargo.toml:21): `sha224/256/
  *     384/512` and `digest(x, algo)` return the BINARY digest (Postgres
  *     lineage); DataFusion's `md5` already matches Spark's (hex string).
  *   - encoding (`encoding_expressions`, Cargo.toml:22): `encode/decode
  *     (x, 'hex'|'base64')`; hex is lowercase, base64 is unpadded
  *     (DataFusion uses STANDARD_NO_PAD). Any other second argument falls
  *     through to Spark's charset encode/decode.
  *   - `log(x)` is **log10** in DataFusion (Postgres lineage); `log(b, x)`
  *     is log base b. Spark's `log(x)` is ln — so this override is applied
  *     only to ODF request sessions ([[register]]), never injected into a
  *     host session via GraftExtensions.
  *   - `trunc(x[, places])` truncates numerics toward zero; on dates it
  *     behaves like Spark's `trunc(date, fmt)` (type-dispatched at
  *     resolution via RuntimeReplaceable).
  *   - `arrow_cast(x, 'Int64')` / `arrow_typeof(x)`: Arrow-type-name cast /
  *     reflection, for the common type names a transform would use.
  *   - aggregate name aliases: `approx_distinct` (HLL++),
  *     `approx_median`, `approx_percentile_cont` (t-digest centroids arg
  *     accepted and ignored — Spark's accuracy knob has different units).
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

  /** `arrow_typeof(x)` — Arrow type name of the argument's type. Resolved
    * lazily (the builder sees unresolved children); foldable, so it
    * constant-folds to a literal before execution. */
  case class ArrowTypeOf(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def foldable: Boolean = true
    override def eval(input: InternalRow): Any =
      UTF8String.fromString(arrowName(child.dataType))
    override protected def withNewChildInternal(c: Expression): ArrowTypeOf = copy(child = c)
  }

  private def arrowName(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "Boolean"
    case _: StringType => "Utf8"
    case BinaryType => "Binary"
    case DateType => "Date32"
    case TimestampType => "Timestamp(Microsecond, Some(\"UTC\"))"
    case TimestampNTZType => "Timestamp(Microsecond, None)"
    case d: DecimalType => s"Decimal128(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"List(${arrowName(e)})"
    case NullType => "Null"
    case other => other.sql
  }

  /** Inverse of [[arrowName]] for the names a kamu transform would pass to
    * `arrow_cast`. Unknown names are a hard error, like DataFusion's. */
  private[functions] def arrowType(name: String): DataType = {
    val decimal = """Decimal(?:128|256)\((\d+)\s*,\s*(\d+)\)""".r
    val tsTz = """Timestamp\((\w+),\s*Some\(.*\)\)""".r
    val tsNtz = """Timestamp\((\w+),\s*None\)""".r
    name.trim match {
      case "Int8" => ByteType
      case "Int16" | "UInt8" => ShortType
      case "Int32" | "UInt16" => IntegerType
      case "Int64" | "UInt32" => LongType
      case "UInt64" => DecimalType(20, 0)
      case "Float32" => FloatType
      case "Float64" => DoubleType
      case "Boolean" => BooleanType
      case "Utf8" | "LargeUtf8" | "Utf8View" => StringType
      case "Binary" | "LargeBinary" | "BinaryView" => BinaryType
      case "Date32" | "Date64" => DateType
      case decimal(p, s) => DecimalType(p.toInt, s.toInt)
      case tsTz(_) => TimestampType
      case tsNtz(_) => TimestampNTZType
      case other =>
        throw new IllegalArgumentException(s"arrow_cast: unsupported Arrow type '$other'")
    }
  }

  private def litString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _: StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a string literal, got $other")
  }

  /** Binary digest via Spark's hex-string crypto builtins: Unhex(hex). */
  private def binDigest(hexExpr: Expression): Expression = Unhex(hexExpr)

  private def sha2Bin(x: Expression, bits: Int): Expression =
    binDigest(Sha2(Cast(x, BinaryType), Literal(bits)))

  private def digest(args: Seq[Expression]): Expression = {
    val x = Cast(args(0), BinaryType)
    litString(args(1), "digest").toLowerCase match {
      case "md5" => binDigest(Md5(x))
      case "sha1" => binDigest(Sha1(x))
      case "sha224" => sha2Bin(args(0), 224)
      case "sha256" => sha2Bin(args(0), 256)
      case "sha384" => sha2Bin(args(0), 384)
      case "sha512" => sha2Bin(args(0), 512)
      case other => throw new IllegalArgumentException(s"digest: unsupported algorithm '$other'")
    }
  }

  /** DataFusion `trunc`: numeric truncation toward zero with optional
    * decimal places — but Spark's `trunc` is date truncation, and the
    * argument type is unknown at builder time, so dispatch at resolution. */
  case class TruncCompat(children: Seq[Expression]) extends Expression with RuntimeReplaceable {
    override lazy val replacement: Expression = children.head.dataType match {
      case DateType | TimestampType | TimestampNTZType | _: StringType =>
        TruncDate(Cast(children.head, DateType), children(1))
      case _ =>
        val x = Cast(children.head, DoubleType)
        val scaled = children.lift(1) match {
          case None | Some(Literal(0, _)) => x
          case Some(p) => Multiply(x, Pow(Literal(10.0), Cast(p, DoubleType)))
        }
        // floor for positives, ceil for negatives = trunc toward zero;
        // Floor/Ceil of double yield LongType, cast back to double
        val t = Cast(If(GreaterThanOrEqual(scaled, Literal(0.0)),
          Floor(scaled), Ceil(scaled)), DoubleType)
        children.lift(1) match {
          case None | Some(Literal(0, _)) => t
          case Some(p) => Divide(t, Pow(Literal(10.0), Cast(p, DoubleType)))
        }
    }
    override def withNewChildrenInternal(c: IndexedSeq[Expression]): TruncCompat =
      copy(children = c)
  }

  private def encodeCompat(args: Seq[Expression]): Expression = args(1) match {
    case Literal(fmt: UTF8String, _: StringType) if fmt.toString.equalsIgnoreCase("hex") =>
      Lower(Hex(Cast(args(0), BinaryType)))
    case Literal(fmt: UTF8String, _: StringType) if fmt.toString.equalsIgnoreCase("base64") =>
      // DataFusion encodes with STANDARD_NO_PAD — strip Spark's padding
      RegExpReplace(Base64(Cast(args(0), BinaryType)), Literal("=+$"), Literal(""))
    case _ => Encode(args(0), args(1))
  }

  private def decodeCompat(args: Seq[Expression]): Expression = args(1) match {
    case Literal(fmt: UTF8String, _: StringType) if fmt.toString.equalsIgnoreCase("hex") =>
      Unhex(args(0))
    case Literal(fmt: UTF8String, _: StringType) if fmt.toString.equalsIgnoreCase("base64") =>
      UnBase64(args(0))
    case _ => StringDecode(args(0), args(1))
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
    // list_* aliases (DataFusion registers every array_* under list_* too)
    "list_element" -> (args => ElementAt(args(0), args(1))),
    "list_extract" -> (args => ElementAt(args(0), args(1))),
    "list_has" -> (args => ArrayContains(args(0), args(1))),
    "list_contains" -> (args => ArrayContains(args(0), args(1))),
    "list_to_string" -> (args => ArrayJoin(args(0), args(1), None)),
    "make_array" -> (args => CreateArray(args)),
    "make_list" -> (args => CreateArray(args)),
    "array_has_any" -> (args => ArraysOverlap(args(0), args(1))),
    // all of b's elements in a  ⇔  b \ a is empty
    "array_has_all" -> (args => EqualTo(Size(ArrayExcept(args(1), args(0))), Literal(0))),
    "array_length" -> (args => args.lift(1) match {
      case None | Some(Literal(1, _)) => Size(args.head)
      case Some(dim) => throw new IllegalArgumentException(
        s"array_length: only dimension 1 is supported (1-D arrays), got $dim")
    }),
    // crypto (reference enables crypto_expressions; binary digests)
    "sha224" -> (args => sha2Bin(args.head, 224)),
    "sha256" -> (args => sha2Bin(args.head, 256)),
    "sha384" -> (args => sha2Bin(args.head, 384)),
    "sha512" -> (args => sha2Bin(args.head, 512)),
    "digest" -> (args => digest(args)),
    // string/date/misc name aliases
    "starts_with" -> (args => StartsWith(args(0), args(1))),
    "ends_with" -> (args => EndsWith(args(0), args(1))),
    "substr_index" -> (args => SubstringIndex(args(0), args(1), args(2))),
    "datepart" -> (args => DatePart.parseExtractField(litString(args(0), "datepart"), args(1))),
    "datetrunc" -> (args => TruncTimestamp(args(0), args(1))),
    "to_unixtime" -> (args => UnixSeconds(Cast(args.head, TimestampType))),
    "today" -> (_ => CurrentDate()),
    "random" -> (_ => new Rand()),
    "arrow_typeof" -> (args => ArrowTypeOf(args.head)),
    "arrow_cast" -> (args => Cast(args(0), arrowType(litString(args(1), "arrow_cast")))),
    // aggregate name aliases
    "approx_distinct" -> (args => new HyperLogLogPlusPlus(args.head)),
    "approx_median" -> (args => new ApproximatePercentile(args.head, Literal(0.5))),
    "approx_percentile_cont" -> (args => new ApproximatePercentile(args(0), args(1))),
  )

  /** Names whose Spark builtin has DIFFERENT semantics than DataFusion's.
    * Only [[register]] (ODF request sessions — the DataFusion-dialect
    * surface) applies these; GraftExtensions never injects them, so a host
    * Spark session keeps Spark semantics for `log`/`trunc`/`encode`/
    * `decode`. */
  private[graft] def dialectOverrides: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "log" -> (args => if (args.size == 1) Log10(args.head) else Logarithm(args(0), args(1))),
    "trunc" -> (args => TruncCompat(args)),
    "encode" -> (args => encodeCompat(args)),
    "decode" -> (args => decodeCompat(args)),
  )

  /** Register the full DataFusion-dialect surface (aliases + semantic
    * overrides) into the session's (temp) function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    (builders ++ dialectOverrides).foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
