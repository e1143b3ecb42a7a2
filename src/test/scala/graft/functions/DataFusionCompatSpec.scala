package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DataFusion-dialect surface: name aliases (safe everywhere) and semantic
  * overrides (ODF request sessions only — `log`/`trunc`/`encode`/`decode`
  * mean different things in Spark). Expected values follow DataFusion 51
  * semantics (reference delegates all SQL to it: engine.rs `ctx.sql`). */
class DataFusionCompatSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dfcompat-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    DataFusionCompat.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def hexOf(sql: String): String =
    spark.sql(s"SELECT lower(hex($sql))").collect()(0).getString(0)

  test("crypto digests are binary with well-known values") {
    // NIST test vectors for 'abc'
    assert(hexOf("sha256('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(hexOf("sha224('abc')") ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(hexOf("sha512('abc')").startsWith("ddaf35a193617aba"))
    assert(hexOf("digest('abc', 'sha1')") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(hexOf("digest('abc', 'md5')") == "900150983cd24fb0d6963f7d28e17f72")
    // return type is BINARY (Postgres/DataFusion lineage), not hex string
    assert(spark.sql("SELECT sha256('abc')").schema.head.dataType.typeName == "binary")
  }

  test("encode/decode dispatch on hex|base64 and fall through to charsets") {
    val r = spark.sql(
      """SELECT encode('abc', 'hex') AS eh,
        |       encode('ab', 'base64') AS eb,
        |       CAST(decode(unhex('616263'), 'UTF-8') AS STRING) AS charset_ok,
        |       CAST(decode('616263', 'hex') AS STRING) AS dh,
        |       CAST(decode('YWI', 'base64') AS STRING) AS db""".stripMargin).collect()(0)
    assert(r.getString(0) == "616263")
    assert(r.getString(1) == "YWI", "DataFusion base64 is unpadded (STANDARD_NO_PAD)")
    assert(r.getString(2) == "abc")
    assert(r.getString(3) == "abc")
    assert(r.getString(4) == "ab")
  }

  test("log is log10 with one arg, log(base, x) with two (Postgres lineage)") {
    val r = spark.sql("SELECT log(100), log(2, 8), ln(exp(1.0))").collect()(0)
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("trunc dispatches: numeric truncation toward zero, date truncation preserved") {
    val r = spark.sql(
      """SELECT trunc(3.7), trunc(-3.7), trunc(3.14159, 2), trunc(-2.789, 1),
        |       trunc(CAST('2024-03-15' AS DATE), 'MM')""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == -3.0)
    assert(math.abs(r.getDouble(2) - 3.14) < 1e-12)
    assert(math.abs(r.getDouble(3) - -2.7) < 1e-12)
    assert(r.getDate(4).toString == "2024-03-01")
  }

  test("string/date aliases: starts_with, ends_with, substr_index, datepart, datetrunc, to_unixtime") {
    val r = spark.sql(
      """SELECT starts_with('hello', 'he'), ends_with('hello', 'lo'),
        |       substr_index('a.b.c', '.', 2),
        |       datepart('year', DATE '2024-03-05'),
        |       datetrunc('month', TIMESTAMP '2024-03-15 10:30:00'),
        |       to_unixtime(TIMESTAMP '1970-01-02 00:00:00')""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
    assert(r.getString(2) == "a.b")
    assert(r.getInt(3) == 2024)
    assert(r.getTimestamp(4).toInstant.toString == "2024-03-01T00:00:00Z")
    assert(r.getLong(5) == 86400L)
  }

  test("array/list aliases behave like DataFusion's") {
    val r = spark.sql(
      """SELECT array_length(make_array(1, 2, 3)),
        |       list_element(make_list('a', 'b'), 2),
        |       list_has(array(1, 2), 2),
        |       array_has_any(array(1, 2), array(2, 9)),
        |       array_has_all(array(1, 2, 3), array(1, 3)),
        |       array_has_all(array(1, 2), array(1, 9))""".stripMargin).collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "b")
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) && !r.getBoolean(5))
  }

  test("arrow_typeof / arrow_cast cover the common Arrow names") {
    val r = spark.sql(
      """SELECT arrow_typeof(1), arrow_typeof(CAST(1 AS BIGINT)), arrow_typeof('x'),
        |       arrow_typeof(CAST(1.5 AS DOUBLE)), arrow_typeof(DATE '2024-01-01'),
        |       arrow_cast('123', 'Int64'), arrow_cast(1, 'Float64'),
        |       arrow_cast('2024-01-01', 'Date32')""".stripMargin).collect()(0)
    assert(r.getString(0) == "Int32" && r.getString(1) == "Int64" && r.getString(2) == "Utf8")
    assert(r.getString(3) == "Float64" && r.getString(4) == "Date32")
    assert(r.getLong(5) == 123L)
    assert(r.getDouble(6) == 1.0)
    assert(r.getDate(7).toString == "2024-01-01")
    val e = intercept[Exception](spark.sql("SELECT arrow_cast(1, 'Dictionary(Int32, Utf8)')").collect())
    assert(e.getMessage.contains("unsupported Arrow type"))
  }

  test("unnest / to_local_time (absent from Spark 4's registry); array_agg is native") {
    spark.range(1, 4).createOrReplaceTempView("dfc_u")
    // array_agg needs no compat entry — Spark 4 registers it natively
    val agg = spark.sql("SELECT array_sort(array_agg(id)) FROM dfc_u").collect()(0)
    assert(agg.getSeq[Long](0) == Seq(1L, 2L, 3L))
    val un = spark.sql("SELECT unnest(make_array(10, 20, 30)) AS v").collect()
    assert(un.map(_.getInt(0)).toSeq == Seq(10, 20, 30), "unnest flattens to rows")
    val lt = spark.sql("SELECT to_local_time(TIMESTAMP '2024-03-15 14:30:00')")
    assert(lt.schema.head.dataType.typeName == "timestamp_ntz")
    assert(lt.collect()(0).get(0).toString == "2024-03-15T14:30")
  }

  test("aggregate aliases: approx_distinct, approx_median, approx_percentile_cont") {
    spark.range(1, 101).createOrReplaceTempView("dfc_n")
    val r = spark.sql(
      """SELECT approx_distinct(id % 7), approx_median(id),
        |       approx_percentile_cont(id, 0.25) FROM dfc_n""".stripMargin).collect()(0)
    assert(r.getLong(0) == 7L)
    assert(math.abs(r.getLong(1) - 50L) <= 1)
    assert(math.abs(r.getLong(2) - 25L) <= 1)
  }

  test("to_char / date_format / to_date translate chrono strftime formats") {
    val r = spark.sql(
      """SELECT to_char(TIMESTAMP '2024-03-15 14:30:45', '%Y-%m-%d %H:%M:%S'),
        |       to_char(DATE '2024-03-15', '%d/%m/%y'),
        |       to_char(TIMESTAMP '2024-03-15 14:30:45', 'day %e of %B, %A'),
        |       date_format(TIMESTAMP '2024-07-04 09:05:00', '%B %d at %I:%M %p'),
        |       to_date('15.03.2024', '%d.%m.%Y'),
        |       to_timestamp('2024-03-15 14:30:45', '%Y-%m-%d %H:%M:%S'),
        |       to_char(123456, '999,999')""".stripMargin).collect()(0)
    assert(r.getString(0) == "2024-03-15 14:30:45")
    assert(r.getString(1) == "15/03/24")
    assert(r.getString(2) == "day 15 of March, Friday")
    assert(r.getString(3) == "July 04 at 09:05 AM")
    assert(r.getDate(4).toString == "2024-03-15")
    assert(r.getTimestamp(5).toInstant.toString == "2024-03-15T14:30:45Z")
    // non-chrono format falls through to Spark's numeric to_char
    assert(r.getString(6) == "123,456")
    val e = intercept[Exception](
      spark.sql("SELECT to_char(DATE '2024-01-01', '%V')").collect())
    assert(e.getMessage.contains("unsupported directive"))
    // %G (ISO week-year) has no working Spark translation — Spark 3+
    // rejects week-based pattern letters at runtime, so it must fail at
    // translation time like the other week-based directives
    val g = intercept[Exception](
      spark.sql("SELECT to_char(DATE '2024-01-01', '%G')").collect())
    assert(g.getMessage.contains("unsupported directive"))
  }

  test("date_part covers DataFusion's extended unit list") {
    val r = spark.sql(
      """SELECT date_part('dow', DATE '2024-03-17'),
        |       date_part('doy', DATE '2024-03-17'),
        |       date_part('epoch', TIMESTAMP '2024-01-02 00:00:00'),
        |       date_part('millisecond', TIMESTAMP '2024-01-01 00:01:30.25'),
        |       date_part('microsecond', TIMESTAMP '2024-01-01 00:01:30.25'),
        |       date_part('year', DATE '2024-03-17')""".stripMargin).collect()(0)
    assert(r.getInt(0) == 0, "2024-03-17 is a Sunday; dow is 0-based at Sunday (Postgres)")
    assert(r.getInt(1) == 77)
    assert(r.getDouble(2) == 1704153600.0)
    assert(r.getDouble(3) == 30250.0, "millisecond is seconds-within-minute * 1000")
    assert(r.getDouble(4) == 30250000.0)
    assert(r.getInt(5) == 2024)
    // EXTRACT syntax rides the registry's "extract" entry → same units work
    val ex = spark.sql(
      "SELECT extract(EPOCH FROM TIMESTAMP '2024-01-02 00:00:00'), extract(YEAR FROM DATE '2024-03-17')").collect()(0)
    assert(ex.getDouble(0) == 1704153600.0)
    assert(ex.getInt(1) == 2024)
  }

  test("array long tail: append/prepend/position/remove/replace/slice/pop/resize") {
    val r = spark.sql(
      """SELECT list_append(array(1, 2), 3),
        |       array_prepend(0, array(1, 2)),
        |       array_concat(array(1), array(2), array(3)),
        |       array_position(array(10, 20, 30), 20),
        |       array_position(array(10, 20, 30), 99),
        |       array_remove(array(1, 2, 1, 3), 1),
        |       array_remove_all(array(1, 2, 1, 3), 1),
        |       array_replace(array(1, 2, 1), 1, 9),
        |       array_replace_all(array(1, 2, 1), 1, 9),
        |       array_slice(array(10, 20, 30, 40), 2, 3),
        |       array_slice(array(10, 20, 30, 40), -2, -1),
        |       array_pop_back(array(1, 2, 3)),
        |       array_pop_front(array(1, 2, 3)),
        |       array_resize(array(1, 2, 3), 5, 0),
        |       array_resize(array(1, 2, 3), 2, 0)""".stripMargin).collect()(0)
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getSeq[Int](1) == Seq(0, 1, 2))
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    assert(r.getLong(3) == 2L)
    assert(r.isNullAt(4), "array_position is NULL (not 0) on miss")
    assert(r.getSeq[Int](5) == Seq(2, 1, 3), "array_remove drops FIRST occurrence only")
    assert(r.getSeq[Int](6) == Seq(2, 3))
    assert(r.getSeq[Int](7) == Seq(9, 2, 1), "array_replace hits FIRST occurrence only")
    assert(r.getSeq[Int](8) == Seq(9, 2, 9))
    assert(r.getSeq[Int](9) == Seq(20, 30), "array_slice is 1-based, inclusive ends")
    assert(r.getSeq[Int](10) == Seq(30, 40), "negative indexes count from the end")
    assert(r.getSeq[Int](11) == Seq(1, 2))
    assert(r.getSeq[Int](12) == Seq(2, 3))
    assert(r.getSeq[Int](13) == Seq(1, 2, 3, 0, 0))
    assert(r.getSeq[Int](14) == Seq(1, 2))
  }

  test("array introspection, range/generate_series, string_to_array") {
    val r = spark.sql(
      """SELECT array_empty(array()), array_empty(array(1)),
        |       array_ndims(array(1, 2)), array_dims(array(1, 2, 3)),
        |       range(1, 5), range(5), range(0, 10, 3),
        |       generate_series(1, 5),
        |       string_to_array('a.b.c', '.'),
        |       array_reverse(array(1, 2, 3)),
        |       list_sort(array(3, 1, 2))""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getLong(2) == 1L)
    assert(r.getSeq[Long](3) == Seq(3L))
    assert(r.getSeq[Int](4) == Seq(1, 2, 3, 4), "range is end-exclusive")
    assert(r.getSeq[Long](5) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(r.getSeq[Int](6) == Seq(0, 3, 6, 9))
    assert(r.getSeq[Int](7) == Seq(1, 2, 3, 4, 5), "generate_series is inclusive")
    assert(r.getSeq[String](8) == Seq("a", "b", "c"), "literal (non-regex) delimiter")
    assert(r.getSeq[Int](9) == Seq(3, 2, 1))
    assert(r.getSeq[Int](10) == Seq(1, 2, 3))
  }

  test("range: empty on descending default-step (Postgres/DataFusion, not Spark countdown)") {
    val r = spark.sql(
      """SELECT range(5, 1), range(-3), range(1, 1), range(0),
        |       range(5, 1, -2)""".stripMargin).collect()(0)
    assert(r.getSeq[Int](0).isEmpty, "range(5,1) is empty, not 5..2 descending")
    assert(r.getSeq[Long](1).isEmpty, "range(-3) is empty, not 0..-2 descending")
    assert(r.getSeq[Int](2).isEmpty)
    assert(r.getSeq[Long](3).isEmpty)
    assert(r.getSeq[Int](4) == Seq(5, 3), "explicit negative step still counts down")
  }

  test("string_to_array: 3-arg null_string form; >3 args rejected") {
    val r = spark.sql(
      """SELECT string_to_array('a,NULL,c', ',', 'NULL'),
        |       string_to_array('a,b', ',', NULL)""".stripMargin).collect()(0)
    val withNull = r.getSeq[String](0)
    assert(withNull == Seq("a", null, "c"), "elements equal to null_string become NULL")
    assert(r.getSeq[String](1) == Seq("a", "b"), "NULL null_string means no replacement")
    val e = intercept[Exception](
      spark.sql("SELECT string_to_array('a', ',', 'x', 'y')").collect())
    assert(e.getMessage.contains("string_to_array"))
  }

  test("gcd/lcm/iszero/get_field") {
    val r = spark.sql(
      """SELECT gcd(12, 18), lcm(4, 6), gcd(-12, 18), gcd(0, 5), lcm(0, 5),
        |       iszero(0.0), iszero(1.5),
        |       get_field(named_struct('a', 7, 'b', 'x'), 'a')""".stripMargin).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 12L)
    assert(r.getLong(2) == 6L, "gcd on absolute values")
    assert(r.getLong(3) == 5L && r.getLong(4) == 0L)
    assert(r.getBoolean(5) && !r.getBoolean(6))
    assert(r.getInt(7) == 7)
    // |Long.MinValue| re-wraps negative through abs: a result that would be
    // 2^63 is unrepresentable and must raise, like DataFusion's
    // signed-overflow error — NOT return the negative wrap (r18 review;
    // the lcm fuzzer find's sibling edge). Euclid with negative
    // intermediates still converges for every other MinValue pairing.
    val gcdOverflow = intercept[Exception](
      spark.sql("SELECT gcd(-9223372036854775808, 0)").collect())
    assert(gcdOverflow.getMessage.contains("overflow"),
      s"gcd(Long.MinValue, 0) must raise, got: ${gcdOverflow.getMessage}")
    val gcdOk = spark.sql(
      "SELECT gcd(-9223372036854775808, 3), gcd(-9223372036854775808, 2)").collect()(0)
    assert(gcdOk.getLong(0) == 1L && gcdOk.getLong(1) == 2L,
      "MinValue gcd against ordinary values stays correct")
    // r18 ADVICE: these pairings converge with a NEGATIVE final x (-2, -2,
    // -32) — a representable gcd that the previous `x < 0` guard spuriously
    // rejected as overflow. Only x == Long.MinValue (gcd = 2^63) raises.
    val gcdNeg = spark.sql(
      """SELECT gcd(-9223372036854775808, 6), gcd(-9223372036854775808, 14),
        |       gcd(-9223372036854775808, 96)""".stripMargin).collect()(0)
    assert(gcdNeg.getLong(0) == 2L && gcdNeg.getLong(1) == 2L && gcdNeg.getLong(2) == 32L,
      "negative-converging Euclid results are normalized, not rejected")
    val gcdBoth = intercept[Exception](
      spark.sql("SELECT gcd(-9223372036854775808, -9223372036854775808)").collect())
    assert(gcdBoth.getMessage.contains("overflow"),
      "gcd(MinValue, MinValue) = 2^63 is unrepresentable and must raise")
  }

  test("list_extract/array_element are total like DataFusion, not throwing like ElementAt") {
    // differential-fuzzer find: Spark's ElementAt throws on index 0
    // unconditionally, throws out-of-bounds under ANSI, and refuses BIGINT
    // indices — DataFusion/DuckDB yield NULL at 0 / OOB, count negatives
    // from the end, and take any integer index
    val r = spark.sql(
      """SELECT list_extract(array(10L, 20L, 30L), 0),
        |       list_extract(array(10L, 20L, 30L), 99),
        |       list_extract(array(10L, 20L, 30L), -1),
        |       list_extract(array(10L, 20L, 30L), -99),
        |       array_element(array(10L, 20L, 30L), 2L),
        |       list_element(array(10L, 20L, 30L), 5000000000),
        |       list_extract(array(10L, 20L, 30L), CAST(NULL AS BIGINT))""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0), "index 0 → NULL")
    assert(r.isNullAt(1), "out-of-bounds → NULL")
    assert(r.getLong(2) == 30L, "negative counts from the end")
    assert(r.isNullAt(3), "negative out-of-bounds → NULL")
    assert(r.getLong(4) == 20L, "BIGINT index accepted")
    assert(r.isNullAt(5), "index beyond Int range → NULL, not a cast error")
    assert(r.isNullAt(6), "NULL index → NULL")
  }

  test("atan2 keeps IEEE negative-zero semantics (DataFusion), not Spark's +0.0 add") {
    // differential-fuzzer find: Spark's Atan2 computes atan2(x+0.0, y+0.0),
    // collapsing -0.0 to +0.0 — atan2(-0.0, -0.0) is −π per IEEE (and in
    // DataFusion's Rust f64::atan2 / DuckDB), 0.0 in stock Spark
    val r = spark.sql(
      "SELECT atan2(-0.0e0, -0.0e0), atan2(0.0e0, -0.0e0), atan2(0.0e0, 0.0e0), atan2(1, 2)")
      .collect()(0)
    assert(r.getDouble(0) == -math.Pi, "atan2(-0.0, -0.0) = -pi")
    assert(r.getDouble(1) == math.Pi, "atan2(+0.0, -0.0) = +pi")
    assert(r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(3) - math.atan2(1.0, 2.0)) < 1e-15,
      "integer args cast through (DataFusion atan2 is double-typed)")
    // interpreted eval agrees with the codegen'd path above
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = DataFusionCompat.Atan2Ieee(Literal(-0.0d), Literal(-0.0d))
      .eval(null).asInstanceOf[Double]
    assert(interp == -math.Pi)
  }

  test("corr is NULL on zero-variance input (DataFusion), not an ANSI error") {
    // aggregate-differential-fuzzer find: Spark's Corr evaluates
    // ck / sqrt(xMk * yMk) unguarded, so a constant column raises
    // DIVIDE_BY_ZERO under ANSI — DataFusion 51 / DuckDB / Postgres all
    // return NULL (correlation of a constant is undefined)
    val r = spark.sql(
      """SELECT corr(x, y),                              -- zero x-variance
        |       corr(y, y),                              -- ordinary value
        |       corr(CAST(x AS DOUBLE), CAST(NULL AS DOUBLE)) -- no pairs
        |FROM VALUES (1.0e0, 2.0e0), (1.0e0, 3.0e0), (1.0e0, 7.0e0) v(x, y)""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0), "constant input -> NULL, not DIVIDE_BY_ZERO")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12, "corr(y, y) = 1")
    assert(r.isNullAt(2), "no complete pairs -> NULL")
    // bigint inputs implicit-cast like the builtin
    val r2 = spark.sql(
      "SELECT corr(a, b) FROM VALUES (1L, 10L), (2L, 20L), (3L, 30L) v(a, b)")
      .collect()(0)
    assert(math.abs(r2.getDouble(0) - 1.0) < 1e-12)
  }

  test("power follows IEEE at |base| = 1 with NaN/Inf exponents, not Java's NaN") {
    // aggregate-fuzzer find (power(cos(0), NaN)): java.lang.Math.pow
    // returns NaN when |base| == 1 and the exponent is NaN/±Inf; IEEE —
    // and Rust's f64::powf behind DataFusion, and DuckDB — give 1.0
    val r = spark.sql(
      """SELECT power(1.0e0, CAST('NaN' AS DOUBLE)),
        |       power(1.0e0, CAST('Infinity' AS DOUBLE)),
        |       power(-1.0e0, CAST('-Infinity' AS DOUBLE)),
        |       power(-1.0e0, CAST('NaN' AS DOUBLE)),  -- NaN in IEEE too
        |       pow(2.0e0, 10.0e0),
        |       power(2, 10)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0, "pow(1, NaN) = 1")
    assert(r.getDouble(1) == 1.0, "pow(1, Inf) = 1")
    assert(r.getDouble(2) == 1.0, "pow(-1, -Inf) = 1")
    assert(r.getDouble(3).isNaN, "pow(-1, NaN) stays NaN")
    assert(r.getDouble(4) == 1024.0)
    assert(r.getDouble(5) == 1024.0, "integer args cast through")
  }

  test("round(double) keeps Rust f64::round semantics: sign of zero, half away, exact edge") {
    // differential-fuzzer find (round(-0.0) via atan2): Spark's BigDecimal
    // Round normalizes -0.0 → +0.0 where Rust/DataFusion/DuckDB preserve
    // the sign. Values are otherwise identical — including half-away-from-
    // zero and the 0.49999999999999994 edge the floor(x+0.5) idiom breaks.
    val r = spark.sql(
      """SELECT atan2(-0.0e0, round(-0.4e0)),  -- -pi iff round(-0.4) = -0.0
        |       atan2(-0.0e0, round(-0.0e0)),
        |       round(2.5e0), round(-2.5e0), round(0.5e0),
        |       round(0.49999999999999994e0),
        |       round(4.503599627370497e15),
        |       round(CAST('NaN' AS DOUBLE)),
        |       round(2L), round(2.345e0, 2)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == -math.Pi, "round(-0.4) must be -0.0")
    assert(r.getDouble(1) == -math.Pi, "round(-0.0) must stay -0.0")
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == -3.0 && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 0.0, "largest double < 0.5 rounds DOWN")
    assert(r.getDouble(6) == 4.503599627370497e15, ">= 2^52 passes through")
    assert(r.getDouble(7).isNaN)
    assert(r.getLong(8) == 2L, "non-double forms keep Spark Round")
    assert(math.abs(r.getDouble(9) - 2.35) < 1e-12, "2-arg form keeps Spark Round")
    // interpreted eval agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val i = DataFusionCompat.RoundIeee(Literal(-0.4d)).eval(null).asInstanceOf[Double]
    assert(i == 0.0 && 1.0 / i < 0, "interpreted round(-0.4) = -0.0")
  }

  test("JSON getters return SQL NULL for JSON null values, like DataFusion") {
    // JSON-differential-fuzzer find: Spark's GetJsonObject renders a null
    // ARRAY element as the string 'null' where datafusion-functions-json
    // (and DuckDB) yield SQL NULL; JsonFunctions folds it. The known
    // pinned corner: a JSON STRING "null" also folds (indistinguishable
    // in GetJsonObject's output).
    graft.functions.JsonFunctions.register(spark)
    val r = spark.sql(
      """SELECT json_get_str('{"a": [1, null, 3]}', 'a', 1),
        |       json_get_str('{"n": null}', 'n'),
        |       json_get_int('{"a": [1, null]}', 'a', 1),
        |       json_contains('{"n": null}', 'n'),
        |       json_get_str('{"a": [1, null, 3]}', 'a', 2)""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0), "null array element -> SQL NULL")
    assert(r.isNullAt(1), "null object value -> SQL NULL")
    assert(r.isNullAt(2), "typed getter of null -> SQL NULL")
    assert(r.getBoolean(3), "a key holding JSON null still EXISTS")
    assert(r.getString(4) == "3")
  }

  test("GraftExtensions injects aliases but NOT the semantic overrides") {
    // getOrCreate would hand back the compat-registered session above —
    // drop it so a FRESH session (with extensions applied) is built
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val host = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dfcompat-host")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = host.sql(
        """SELECT starts_with('ab', 'a'), log(100),
          |       array_position(array(1, 2), 9),
          |       array_remove(array(1, 2, 1), 1),
          |       gcd(12, 18)""".stripMargin).collect()(0)
      assert(r.getBoolean(0), "alias must resolve through extensions")
      assert(math.abs(r.getDouble(1) - math.log(100)) < 1e-12,
        "host session log must stay Spark-native (ln), not DataFusion log10")
      assert(r.getLong(2) == 0L,
        "host array_position must stay Spark-native (0 on miss, not NULL)")
      assert(r.getSeq[Int](3) == Seq(2),
        "host array_remove must stay Spark-native (removes ALL occurrences)")
      assert(r.getLong(4) == 6L, "non-colliding long-tail names DO inject (gcd)")
    } finally host.stop()
  }
}
