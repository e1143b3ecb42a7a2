package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  *
  * Known bounded deviation (pinned, not fixed): Spark's string→floating
  * CAST accepts Java float literal syntax — `'2d'`, `'1.5f'` suffixes and
  * hex floats via `java.lang.Double.parseDouble` — where DataFusion's
  * strict Rust parse (and DuckDB) yield NULL/error. CAST is parser syntax,
  * not a registry name, so overriding it would take a plan rule on every
  * request-session query for a syntax tail no realistic transform relies
  * on; the differential fuzzer documents it instead (ExprGen's SL type
  * keeps cast sources leaf-only).
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

  /** DataFusion's `array_element`/`list_extract` is TOTAL: 1-based,
    * negative counts from the end, and index 0 or out-of-bounds yields NULL
    * (DuckDB `list_extract` agrees — differential-fuzz verified). Spark's
    * `ElementAt` instead throws on index 0 unconditionally and on
    * out-of-bounds under ANSI, so the index is null-routed at 0 and
    * `failOnError` pinned off. (Registry builders are untyped, so a map
    * probed with literal key 0 through these dialect names would also get
    * NULL — DataFusion has no map element function, so nothing is lost.) */
  private def elementTotal(args: Seq[Expression]): Expression = {
    // Spark's ElementAt demands an INT index where DataFusion/DuckDB take
    // any integer: TRY-cast so a BIGINT beyond Int range null-routes (=
    // out-of-bounds) instead of failing analysis or overflowing
    val idx = Cast(args(1), IntegerType, None, EvalMode.TRY)
    val safeIdx = If(EqualTo(idx, Literal(0)), Literal(null), idx)
    ElementAt(args(0), safeIdx, None, failOnError = false)
  }

  private def regexpMatch(args: Seq[Expression]): Expression = {
    val Seq(str, re) = args.take(2)
    If(RLike(str, re),
      CreateArray(Seq(RegExpExtract(str, re, Literal(0)))),
      Literal.create(null, ArrayType(StringType)))
  }

  /** `arrow_typeof(x)` — Arrow type name of the argument's type. Resolved
    * lazily (the builder sees unresolved children); foldable, so it
    * normally constant-folds to a literal before execution. The doGenCode
    * (for folding-disabled paths) emits the precomputed name as a reference
    * object — the value depends only on the child's TYPE, so the child is
    * never evaluated and a null child still yields the type name, matching
    * the interpreted eval. */
  case class ArrowTypeOf(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def foldable: Boolean = true
    override def eval(input: InternalRow): Any =
      UTF8String.fromString(arrowName(child.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("arrowTypeName", eval(null), classOf[UTF8String].getName)
      ev.copy(code = code"", isNull = FalseLiteral, value = JavaCode.global(ref, StringType))
    }
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

  // ---------------------------------------------------------------------
  // DataFusion 51 scalar long tail (systematic sweep vs DataFusion's
  // scalar-function list; VERDICT r6 task #5)
  // ---------------------------------------------------------------------

  /** Translate a chrono strftime-style format (what DataFusion's `to_char`/
    * `date_format`/`to_date` accept — Rust `chrono` crate) into a Spark
    * datetime pattern. Literal runs are single-quoted (Spark treats bare
    * letters as pattern characters; chrono does not). Directives chrono
    * supports but Spark 3+ datetime patterns removed (week-of-year `%U/%V/
    * %W`, numeric weekday `%u/%w`, epoch `%s`) are a hard error, like an
    * unknown directive. */
  private[functions] def chronoToSparkPattern(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      out.append('\'').append(lit.toString.replace("'", "''")).append('\'')
      lit.clear()
    }
    def dir(p: String): Unit = { flushLit(); out.append(p) }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { lit.append(c); i += 1 }
      else if (i + 1 >= fmt.length)
        throw new IllegalArgumentException("chrono format: dangling '%'")
      else {
        // %.3f / %.6f / %.9f — fractional seconds with leading dot
        val frac = """^%\.([369])f""".r.findFirstMatchIn(fmt.substring(i))
        if (frac.isDefined) {
          dir("." + "S" * frac.get.group(1).toInt)
          i += 4
        } else {
          fmt.charAt(i + 1) match {
            case 'Y' => dir("yyyy")
            case 'y' => dir("yy")
            case 'm' => dir("MM")
            case 'b' | 'h' => dir("MMM")
            case 'B' => dir("MMMM")
            case 'd' => dir("dd")
            case 'e' => dir("d")
            case 'a' => dir("EEE")
            case 'A' => dir("EEEE")
            case 'j' => dir("DDD")
            case 'H' => dir("HH")
            case 'k' => dir("H")
            case 'I' => dir("hh")
            case 'l' => dir("h")
            case 'p' | 'P' => dir("a")
            case 'M' => dir("mm")
            case 'S' => dir("ss")
            case 'f' => dir("SSSSSSSSS")
            case 'q' => dir("Q")
            case 'G' =>
              // ISO week-year: Spark 3+ rejects week-based pattern letters
              // (Y/w/W) at runtime, so there is no working translation.
              throw new IllegalArgumentException(
                "chrono format: unsupported directive '%G'")
            case 'D' => dir("MM/dd/yy")
            case 'F' => dir("yyyy-MM-dd")
            case 'T' => dir("HH:mm:ss")
            case 'R' => dir("HH:mm")
            case 'z' => dir("xx")
            case 'Z' => dir("zzz")
            case '%' => lit.append('%')
            case 'n' => lit.append('\n')
            case 't' => lit.append('\t')
            case ':' if i + 2 < fmt.length && fmt.charAt(i + 2) == 'z' =>
              dir("xxx"); i += 1
            case other => throw new IllegalArgumentException(
              s"chrono format: unsupported directive '%$other'")
          }
          i += 2
        }
      }
    }
    flushLit()
    out.toString
  }

  private def litFormatHasPercent(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _: StringType) => s.toString.contains('%')
    case _ => false
  }

  private def chronoFormat(e: Expression, fn: String): Expression =
    Literal(UTF8String.fromString(chronoToSparkPattern(litString(e, fn))), StringType)

  /** `to_char(expr, fmt)` — chrono datetime formatting when the format is a
    * chrono pattern (contains `%`); otherwise Spark's numeric to_char. */
  private def toCharCompat(args: Seq[Expression]): Expression =
    if (litFormatHasPercent(args(1)))
      new DateFormatClass(Cast(args(0), TimestampType), chronoFormat(args(1), "to_char"))
    else ToCharacter(args(0), args(1))

  private def dateFormatCompat(args: Seq[Expression]): Expression =
    if (litFormatHasPercent(args(1)))
      new DateFormatClass(Cast(args(0), TimestampType), chronoFormat(args(1), "date_format"))
    else new DateFormatClass(args(0), args(1))

  /** DataFusion `to_date`/`to_timestamp` accept chrono formats; without one
    * they behave like Spark's (string parse / numeric epoch). DataFusion
    * tries each format in order; a builder sees literals, so only the first
    * format argument is honored. */
  private def toDateCompat(args: Seq[Expression]): Expression = args.size match {
    case 1 => new ParseToDate(args.head)
    case _ if litFormatHasPercent(args(1)) =>
      new ParseToDate(args(0), chronoFormat(args(1), "to_date"))
    case _ => new ParseToDate(args(0), args(1))
  }

  private def toTimestampCompat(args: Seq[Expression]): Expression = args.size match {
    case 1 => Cast(args.head, TimestampType)
    case _ if litFormatHasPercent(args(1)) =>
      new ParseToTimestamp(args(0), chronoFormat(args(1), "to_timestamp"))
    case _ => new ParseToTimestamp(args(0), args(1))
  }

  /** `date_part` with DataFusion's full unit list. Spark's builtin already
    * handles year…second (incl. Postgres 0-based `dow`); DataFusion/Postgres
    * additionally define `epoch` (seconds since epoch, fractional) and
    * `millisecond`/`microsecond`/`nanosecond` (seconds-within-minute scaled
    * — 00:01:30.25 → millisecond 30250). DuckDB agrees, so these are
    * oracle-checkable. */
  private def datePartCompat(args: Seq[Expression]): Expression = {
    val unit = litString(args(0), "date_part").toLowerCase
    val src = args(1)
    def secondsInMinute: Expression =
      Cast(DatePart.parseExtractField("SECOND", Cast(src, TimestampType)), DoubleType)
    unit match {
      case "epoch" =>
        Divide(Cast(UnixMicros(Cast(src, TimestampType)), DoubleType), Literal(1e6))
      case "millisecond" | "milliseconds" => Multiply(secondsInMinute, Literal(1e3))
      case "microsecond" | "microseconds" => Multiply(secondsInMinute, Literal(1e6))
      case "nanosecond" | "nanoseconds" => Multiply(secondsInMinute, Literal(1e9))
      // Postgres/DataFusion dow is 0-based at Sunday; Spark's DOW field is 1-based
      case "dow" => Subtract(DayOfWeek(Cast(src, DateType)), Literal(1))
      case _ => DatePart.parseExtractField(unit, src)
    }
  }

  /** Remove/replace FIRST occurrence (DataFusion `array_remove`/
    * `array_replace`; the `_all` variants map to Spark builtins). Built from
    * position + two slices — stays in codegen, no lambda. */
  private def removeFirst(a: Expression, e: Expression): Expression = {
    val pos = Cast(ArrayPosition(a, e), IntegerType)
    If(GreaterThan(pos, Literal(0)),
      Concat(Seq(
        Slice(a, Literal(1), Subtract(pos, Literal(1))),
        Slice(a, Add(pos, Literal(1)), Subtract(Size(a), pos)))),
      a)
  }

  private def replaceFirst(a: Expression, from: Expression, to: Expression): Expression = {
    val pos = Cast(ArrayPosition(a, from), IntegerType)
    If(GreaterThan(pos, Literal(0)),
      Concat(Seq(
        Slice(a, Literal(1), Subtract(pos, Literal(1))),
        CreateArray(Seq(to)),
        Slice(a, Add(pos, Literal(1)), Subtract(Size(a), pos)))),
      a)
  }

  private def replaceAll(a: Expression, from: Expression, to: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    ArrayTransform(a, LambdaFunction(If(EqualTo(x, from), to, x), Seq(x)))
  }

  /** DataFusion `array_slice(list, from, to)`: 1-based, both ends inclusive,
    * negative indexes count from the end. */
  private def arraySlice(args: Seq[Expression]): Expression = {
    require(args.size == 3, "array_slice: expected (array, from, to)")
    val a = args(0)
    val size = Size(a)
    def norm(e: Expression): Expression = {
      val i = Cast(e, IntegerType)
      If(LessThan(i, Literal(0)), Add(Add(size, i), Literal(1)), i)
    }
    val from = Greatest(Seq(norm(args(1)), Literal(1)))
    val to = Least(Seq(norm(args(2)), size))
    Slice(a, from, Greatest(Seq(Subtract(Add(to, Literal(1)), from), Literal(0))))
  }

  /** `array_resize(list, size, value)`: truncate or pad with `value`. */
  private def arrayResize(args: Seq[Expression]): Expression = {
    require(args.size == 3, "array_resize: expected (array, size, pad_value)")
    val a = args(0)
    val n = Cast(args(1), IntegerType)
    Concat(Seq(
      Slice(a, Literal(1), Least(Seq(n, Size(a)))),
      ArrayRepeat(args(2), Greatest(Seq(Subtract(n, Size(a)), Literal(0))))))
  }

  /** DataFusion `range(start, stop, step)` is end-EXCLUSIVE; Spark's
    * Sequence is inclusive. A sequence contains `stop` only as its last
    * element and never twice, so removing `stop` from the inclusive
    * sequence yields the exclusive range for either step sign. */
  private def rangeCompat(args: Seq[Expression]): Expression = args.size match {
    // Without an explicit step, DataFusion/Postgres return EMPTY when
    // start > stop; Spark's Sequence would auto-select step -1 and count
    // down. Sequence(x, x) minus x is an empty array of the right type.
    case 1 =>
      val stop = Cast(args(0), LongType)
      val zero = Literal(0L)
      If(GreaterThan(zero, stop),
        ArrayRemove(new Sequence(zero, zero), zero),
        ArrayRemove(new Sequence(zero, stop), stop))
    case 2 =>
      If(GreaterThan(args(0), args(1)),
        ArrayRemove(new Sequence(args(0), args(0)), args(0)),
        ArrayRemove(new Sequence(args(0), args(1)), args(1)))
    case _ => ArrayRemove(new Sequence(args(0), args(1), args(2)), args(1))
  }

  private def generateSeries(args: Seq[Expression]): Expression = args.size match {
    case 2 => new Sequence(args(0), args(1))
    case _ => new Sequence(args(0), args(1), args(2))
  }

  /** `string_to_array(str, delim[, null_string])`: split on a LITERAL
    * delimiter (Postgres lineage) — Spark's split takes a regex, so quote it
    * at build time. The 3-arg form maps elements equal to `null_string` to
    * NULL; a NULL `null_string` means no replacement (Postgres), which falls
    * out of EqualTo's null semantics below. */
  private def stringToArray(args: Seq[Expression]): Expression = {
    require(args.size == 2 || args.size == 3,
      s"string_to_array expects 2 or 3 arguments, got ${args.size}")
    val quoted = java.util.regex.Pattern.quote(litString(args(1), "string_to_array"))
    val split = new StringSplit(args(0), Literal(UTF8String.fromString(quoted), StringType))
    if (args.size == 2) split
    else {
      val x = UnresolvedNamedLambdaVariable(Seq("s2a_elem"))
      ArrayTransform(split,
        LambdaFunction(If(EqualTo(x, args(2)), Literal(null, StringType), x), Seq(x)))
    }
  }

  /** `array_ndims` — nesting depth from the (resolved) child type; foldable,
    * like [[ArrowTypeOf]], and codegen'd the same way: the depth is a
    * compile-time constant of the child's type, emitted as a long literal
    * with no child evaluation. */
  case class ArrayNDims(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def foldable: Boolean = true
    override def eval(input: InternalRow): Any = {
      @annotation.tailrec
      def depth(dt: DataType, acc: Long): Long = dt match {
        case ArrayType(e, _) => depth(e, acc + 1)
        case _ => acc
      }
      depth(child.dataType, 0L)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      ev.copy(code = code"", isNull = FalseLiteral,
        value = JavaCode.literal(s"${eval(null)}L", LongType))
    override protected def withNewChildInternal(c: Expression): ArrayNDims = copy(child = c)
  }

  /** Euclid on |a|,|b| — static forwarder makes this callable from codegen.
    * The |Long.MinValue| edge (its abs re-wraps negative) is tolerated
    * through the loop — Euclid converges to ±gcd with negative
    * intermediates (gcd(MinValue, 6) ends at x = −2; the answer is 2) —
    * so the loop result is normalized with a final abs. Only x ==
    * Long.MinValue itself is unrepresentable: that means the true gcd is
    * 2⁶³ (both inputs ∈ {Long.MinValue, 0}), where DataFusion raises its
    * signed-overflow error too (r18 ADVICE: the previous `x < 0` guard
    * also rejected the representable negative intermediates). */
  def gcdLong(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    if (x == Long.MinValue) throw new ArithmeticException("long overflow in gcd")
    math.abs(x)
  }

  /** DataFusion's lcm ERRORS on i64 overflow (DuckDB agrees: "lcm value
    * is out of range") where a plain Long multiply silently wraps — found
    * by the window fuzzer (nested lcm over 3037000499). multiplyExact
    * raises ArithmeticException, surfaced like any ANSI arithmetic
    * overflow; the |Long.MinValue| edge (its abs re-wraps) is guarded. */
  def lcmLong(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L
    else {
      val m = java.lang.Math.multiplyExact(a / gcdLong(a, b), b)
      if (m == Long.MinValue) throw new ArithmeticException("long overflow in lcm")
      math.abs(m)
    }

  /** `gcd`/`lcm` (DataFusion math functions Spark lacks) — native binary
    * expressions, codegen'd via the object's static forwarders. */
  case class GcdLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      gcdLong(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DataFusionCompat.gcdLong($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdLong =
      copy(left = l, right = r)
  }

  /** IEEE-754 atan2, unlike Spark's builtin which normalizes negative zero
    * (`math.atan2(left + 0.0, right + 0.0)` in Spark's Atan2): DataFusion
    * delegates to Rust's `f64::atan2`, so `atan2(-0.0, -0.0)` is −π there
    * and 0 in Spark. Found by the differential fuzzer (FuzzDifferentialSpec;
    * DuckDB agrees with IEEE). Dialect-override only — host sessions keep
    * Spark's builtin. */
  case class Atan2Ieee(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Math.atan2(a.asInstanceOf[Double], b.asInstanceOf[Double])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.atan2($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Atan2Ieee =
      copy(left = l, right = r)
  }

  /** Pearson correlation that yields NULL when either input has zero
    * variance, like DataFusion 51 (its accumulator divides only when both
    * stddevs are nonzero — correlation of a constant is undefined, NULL in
    * Postgres and DuckDB too). Spark's builtin `Corr` evaluates
    * `ck / sqrt(xMk * yMk)` with no variance guard, which under ANSI mode
    * (Spark 4's default) raises DIVIDE_BY_ZERO instead — found by the
    * aggregate differential fuzzer. Reuses Spark's PearsonCorrelation
    * co-moment buffers (n/ck/xMk/yMk); only the final divide changes:
    * `ck / sqrt(xMk) / sqrt(yMk)` mirrors DataFusion's `c / s1 / s2`
    * two-step shape (no xMk*yMk product to underflow), and the guard makes
    * each divisor nonzero so ANSI division cannot raise. NaN inputs flow
    * through as NaN in both engines (NaN compares false against 0). */
  case class CorrNullOnZeroVariance(x: Expression, y: Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.PearsonCorrelation(x, y, true) {
    override def prettyName: String = "corr"
    override val evaluateExpression: Expression = {
      val nullD = Literal.create(null, DoubleType)
      If(Or(EqualTo(n, Literal(0.0)),
            Or(EqualTo(xMk, Literal(0.0)), EqualTo(yMk, Literal(0.0)))),
        nullD,
        Divide(Divide(ck, Sqrt(xMk)), Sqrt(yMk)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : CorrNullOnZeroVariance = copy(x = l, y = r)
  }

  /** IEEE-754 pow, unlike `java.lang.Math.pow`, which returns NaN when
    * |base| == 1 and the exponent is NaN or ±Inf — IEEE (and Rust's
    * f64::powf behind DataFusion, and DuckDB's C pow) defines
    * pow(+1, anything) = 1 and pow(-1, ±Inf) = 1. Found by the aggregate
    * fuzzer (power(cos(0), NaN)). Every other case matches Java's pow. */
  case class PowIeee(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "power"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      powIeee(a.asInstanceOf[Double], b.asInstanceOf[Double])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DataFusionCompat.powIeee($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PowIeee =
      copy(left = l, right = r)
  }

  def powIeee(b: Double, e: Double): Double =
    if (b == 1.0) 1.0
    else if (b == -1.0 && java.lang.Double.isInfinite(e)) 1.0
    else java.lang.Math.pow(b, e)

  /** Rust-faithful `round(double)`: half away from zero AND sign-of-zero
    * preserving — `f64::round(-0.4)` is -0.0 in DataFusion (and DuckDB),
    * +0.0 out of Spark's BigDecimal-based Round; atan2 and division
    * downstream can observe the sign (differential-fuzzer find, same
    * family as [[Atan2Ieee]]). Values are otherwise identical, including
    * the 0.49999999999999994 edge (the fraction test is exact: for
    * |x| < 2^52, `abs(x) - floor(abs(x))` has no rounding error — unlike
    * the classic `floor(x + 0.5)`, whose ADD rounds that edge up). */
  case class RoundIeee(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[Double]
      val ab = java.lang.Math.abs(x)
      val r =
        if (ab >= 4.503599627370496e15) ab // >= 2^52: already integral (or Inf/NaN)
        else {
          val f = java.lang.Math.floor(ab)
          if (ab - f >= 0.5) f + 1.0 else f
        }
      java.lang.Math.copySign(r, x)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val a = ctx.freshName("ab")
        val f = ctx.freshName("fl")
        s"""
           |double $a = java.lang.Math.abs($c);
           |double $f = java.lang.Math.floor($a);
           |${ev.value} = java.lang.Math.copySign(
           |  ($a >= 4.503599627370496E15D) ? $a : (($a - $f >= 0.5D) ? $f + 1.0D : $f), $c);
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): RoundIeee =
      copy(child = c)
  }

  /** Type dispatch for the `round` override: only the 1-arg FLOAT/DOUBLE
    * form gets [[RoundIeee]]; everything else (ints, decimals, the 2-arg
    * scale form) falls through to Spark's Round, whose values already
    * match. (The 2-arg form's sign-of-zero corner — round(-1e-6, 2) is
    * -0.0 in Rust — is left with Spark semantics: replicating DataFusion's
    * multiply-round-divide there would diverge from decimal-correct
    * rounding on cases like round(0.285, 2).) */
  case class RoundCompat(children: Seq[Expression]) extends Expression with RuntimeReplaceable {
    override lazy val replacement: Expression = children match {
      case Seq(x) if x.dataType == DoubleType =>
        RoundIeee(x)
      // DataFusion's round(Float32) returns Float32 — cast the DOUBLE
      // intermediate back so the schema matches (values are exact: a
      // half-up-rounded float magnitude always round-trips via double)
      case Seq(x) if x.dataType == FloatType =>
        Cast(RoundIeee(Cast(x, DoubleType)), FloatType)
      case _ => Round(children.head, children.lift(1).getOrElse(Literal(0)))
    }
    override def withNewChildrenInternal(c: IndexedSeq[Expression]): RoundCompat =
      copy(children = c)
  }

  case class LcmLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      lcmLong(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DataFusionCompat.lcmLong($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): LcmLong =
      copy(left = l, right = r)
  }

  private[graft] def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // NOT "to_timestamp" here: for non-chrono calls Spark's builtin already
    // has DataFusion's semantics (strings parse, numerics are epoch
    // seconds); the chrono-format '%' dispatch lives in dialectOverrides
    // ("to_timestamp" -> toTimestampCompat) so only ODF sessions see it
    "date_bin" -> (args => dateBin(args)),
    "to_timestamp_seconds" -> (args => toTs(args, SecondsToTimestamp)),
    "to_timestamp_millis" -> (args => toTs(args, MillisToTimestamp)),
    "to_timestamp_micros" -> (args => toTs(args, MicrosToTimestamp)),
    "regexp_match" -> (args => regexpMatch(args)),
    "strpos" -> (args => StringInstr(args(0), args(1))),
    "to_hex" -> (args => Lower(Hex(args.head))),
    "array_has" -> (args => ArrayContains(args(0), args(1))),
    "array_element" -> (args => elementTotal(args)),
    "array_to_string" -> (args => ArrayJoin(args(0), args(1), None)),
    // list_* aliases (DataFusion registers every array_* under list_* too)
    "list_element" -> (args => elementTotal(args)),
    "list_extract" -> (args => elementTotal(args)),
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
    // array long tail — append/prepend/position/remove/replace/slice/pop/
    // resize and friends; every array_* is also registered under list_*,
    // mirroring DataFusion's alias table. Names Spark already has with
    // IDENTICAL semantics (array_append, array_distinct, array_max/min,
    // flatten, cardinality, ifnull/nvl/nvl2/nullif) are not re-registered;
    // names Spark has with DIFFERENT semantics (array_prepend argument
    // order, array_position NULL-on-miss, array_remove first-occurrence)
    // live in [[dialectOverrides]] so host sessions keep Spark behavior.
    "list_append" -> (args => Concat(Seq(args(0), CreateArray(Seq(args(1)))))),
    "array_push_back" -> (args => Concat(Seq(args(0), CreateArray(Seq(args(1)))))),
    // DataFusion argument order: (element, array)
    "list_prepend" -> (args => Concat(Seq(CreateArray(Seq(args(0))), args(1)))),
    "array_push_front" -> (args => Concat(Seq(CreateArray(Seq(args(0))), args(1)))),
    "array_concat" -> (args => Concat(args)),
    "list_concat" -> (args => Concat(args)),
    "list_cat" -> (args => Concat(args)),
    // NULL (not 0) when absent — DataFusion/Postgres lineage
    "list_position" -> (args => new NullIf(ArrayPosition(args(0), args(1)), Literal(0L))),
    "array_indexof" -> (args => new NullIf(ArrayPosition(args(0), args(1)), Literal(0L))),
    "list_indexof" -> (args => new NullIf(ArrayPosition(args(0), args(1)), Literal(0L))),
    "list_remove" -> (args => removeFirst(args(0), args(1))),
    "array_remove_all" -> (args => ArrayRemove(args(0), args(1))),
    "list_remove_all" -> (args => ArrayRemove(args(0), args(1))),
    "array_replace" -> (args => replaceFirst(args(0), args(1), args(2))),
    "list_replace" -> (args => replaceFirst(args(0), args(1), args(2))),
    "array_replace_all" -> (args => replaceAll(args(0), args(1), args(2))),
    "list_replace_all" -> (args => replaceAll(args(0), args(1), args(2))),
    "array_slice" -> (args => arraySlice(args)),
    "list_slice" -> (args => arraySlice(args)),
    "array_pop_back" -> (args =>
      Slice(args.head, Literal(1), Greatest(Seq(Subtract(Size(args.head), Literal(1)), Literal(0))))),
    "list_pop_back" -> (args =>
      Slice(args.head, Literal(1), Greatest(Seq(Subtract(Size(args.head), Literal(1)), Literal(0))))),
    "array_pop_front" -> (args =>
      Slice(args.head, Literal(2), Greatest(Seq(Subtract(Size(args.head), Literal(1)), Literal(0))))),
    "list_pop_front" -> (args =>
      Slice(args.head, Literal(2), Greatest(Seq(Subtract(Size(args.head), Literal(1)), Literal(0))))),
    "array_reverse" -> (args => Reverse(args.head)),
    "list_reverse" -> (args => Reverse(args.head)),
    "array_empty" -> (args => EqualTo(Size(args.head), Literal(0))),
    "list_empty" -> (args => EqualTo(Size(args.head), Literal(0))),
    "empty" -> (args => EqualTo(Size(args.head), Literal(0))),
    "array_ndims" -> (args => ArrayNDims(args.head)),
    "list_ndims" -> (args => ArrayNDims(args.head)),
    // 1-D dims only (nested arrays are rare in the dialect surface)
    "array_dims" -> (args => CreateArray(Seq(Cast(Size(args.head), LongType)))),
    "list_dims" -> (args => CreateArray(Seq(Cast(Size(args.head), LongType)))),
    "array_resize" -> (args => arrayResize(args)),
    "list_resize" -> (args => arrayResize(args)),
    "list_distinct" -> (args => ArrayDistinct(args.head)),
    "list_sort" -> (args => new SortArray(args.head)),
    "string_to_array" -> (args => stringToArray(args)),
    "string_to_list" -> (args => stringToArray(args)),
    "range" -> (args => rangeCompat(args)),
    "generate_series" -> (args => generateSeries(args)),
    // struct/math long tail
    "get_field" -> (args => UnresolvedExtractValue(args(0), args(1))),
    "gcd" -> (args => GcdLong(Cast(args(0), LongType), Cast(args(1), LongType))),
    "lcm" -> (args => LcmLong(Cast(args(0), LongType), Cast(args(1), LongType))),
    "iszero" -> (args => EqualTo(Cast(args.head, DoubleType), Literal(0.0))),
    // string/date/misc name aliases
    "starts_with" -> (args => StartsWith(args(0), args(1))),
    "ends_with" -> (args => EndsWith(args(0), args(1))),
    "substr_index" -> (args => SubstringIndex(args(0), args(1), args(2))),
    "datepart" -> (args => datePartCompat(args)),
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
    // Spark 4 natively registers array_agg/string_agg/listagg/median/mode/
    // bool_and/bit_and/regr_* (runtime-probe verified); these two are
    // genuinely absent from its registry.
    "unnest" -> (args => Explode(args.head)),
    "to_local_time" -> (args => Cast(args.head, TimestampNTZType)),
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
    // chrono-format datetime surface: dispatches on '%' in the format so
    // non-chrono calls keep Spark semantics (to_char numeric formatting,
    // date_format Spark patterns)
    "to_char" -> (args => toCharCompat(args)),
    "date_format" -> (args => dateFormatCompat(args)),
    "to_date" -> (args => toDateCompat(args)),
    "to_timestamp" -> (args => toTimestampCompat(args)),
    // superset of Spark's date_part: adds epoch/millisecond/microsecond/
    // nanosecond units (kept out of host sessions on principle). The
    // EXTRACT(f FROM s) syntax resolves through the registry's "extract"
    // entry with the same (field, source) argument order, so the override
    // extends that syntax too.
    "date_part" -> (args => datePartCompat(args)),
    "extract" -> (args => datePartCompat(args)),
    // Spark builtins with conflicting semantics (see builders comment):
    // argument order is (element, array) in DataFusion
    "array_prepend" -> (args => Concat(Seq(CreateArray(Seq(args(0))), args(1)))),
    // NULL (not 0) when the element is absent
    "array_position" -> (args => new NullIf(ArrayPosition(args(0), args(1)), Literal(0L))),
    // first occurrence only (Spark's array_remove removes all)
    "array_remove" -> (args => removeFirst(args(0), args(1))),
    // IEEE negative-zero handling (Spark's builtin normalizes -0.0 → +0.0)
    "atan2" -> (args => Atan2Ieee(Cast(args(0), DoubleType), Cast(args(1), DoubleType))),
    // NULL (not ANSI DIVIDE_BY_ZERO) on zero-variance input; the analyzer
    // wraps the bare AggregateFunction and inserts the double casts
    "corr" -> (args => CorrNullOnZeroVariance(args(0), args(1))),
    // sign-of-zero-preserving round for the 1-arg double form (Rust
    // f64::round); other shapes keep Spark's Round
    "round" -> (args => RoundCompat(args)),
    // IEEE pow(±1, NaN/Inf) = 1 (Java's Math.pow yields NaN there)
    "power" -> (args => PowIeee(Cast(args(0), DoubleType), Cast(args(1), DoubleType))),
    "pow" -> (args => PowIeee(Cast(args(0), DoubleType), Cast(args(1), DoubleType))),
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
