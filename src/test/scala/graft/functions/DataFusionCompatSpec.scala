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

  test("aggregate aliases: approx_distinct, approx_median, approx_percentile_cont") {
    spark.range(1, 101).createOrReplaceTempView("dfc_n")
    val r = spark.sql(
      """SELECT approx_distinct(id % 7), approx_median(id),
        |       approx_percentile_cont(id, 0.25) FROM dfc_n""".stripMargin).collect()(0)
    assert(r.getLong(0) == 7L)
    assert(math.abs(r.getLong(1) - 50L) <= 1)
    assert(math.abs(r.getLong(2) - 25L) <= 1)
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
      val r = host.sql("SELECT starts_with('ab', 'a'), log(100)").collect()(0)
      assert(r.getBoolean(0), "alias must resolve through extensions")
      assert(math.abs(r.getDouble(1) - math.log(100)) < 1e-12,
        "host session log must stay Spark-native (ln), not DataFusion log10")
    } finally host.stop()
  }
}
