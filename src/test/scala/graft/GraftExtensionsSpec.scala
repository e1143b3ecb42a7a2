package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a vanilla session configured
  * with GraftExtensions resolves every injected function by name. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject JSON + native hash functions into a fresh session") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT json_get_int('{"foo": 123}', 'foo') AS j,
          |       simhash_chunks(array('a','b','c')) AS sh,
          |       minhash_signature(array('a','b','c'), 4) AS mh""".stripMargin).collect()(0)
      assert(row.getLong(0) == 123L)
      assert(row.getSeq[Long](1).length == 4)
      assert(row.getSeq[Long](2).length == 4)
      // determinism across calls
      val again = spark.sql("SELECT minhash_signature(array('a','b','c'), 4) AS mh").collect()(0)
      assert(again.getSeq[Long](0) == row.getSeq[Long](2))

      // vector math expressions resolve through the extension too
      val vec = spark.sql(
        "SELECT l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n, " +
          "quantize_int8(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT))) AS q").collect()(0)
      assert(math.abs(vec.getDouble(0) - 5.0) < 1e-12)
      assert(vec.getSeq[Byte](1) == Seq[Byte](64, -127))

      // typed getters are TRY-cast: a type-mismatched value yields NULL even
      // under ANSI mode (Spark 4 default), matching datafusion-functions-json
      val tryRow = spark.sql(
        """SELECT json_get_int('{"a": "not-a-number"}', 'a') AS i,
          |       json_get_float('{"a": "x"}', 'a') AS f,
          |       json_get_bool('{"a": 17}', 'a') AS b""".stripMargin).collect()(0)
      assert(tryRow.isNullAt(0) && tryRow.isNullAt(1) && tryRow.isNullAt(2))

      // json_contains is key EXISTENCE: a key holding JSON null still exists;
      // a missing key (or missing parent) does not; array indices are bounds
      val cRow = spark.sql(
        """SELECT json_contains('{"a": null}', 'a') AS has_null_val,
          |       json_contains('{"a": 1}', 'b') AS missing_key,
          |       json_contains('{"a": {"b": 2}}', 'a', 'b') AS nested_hit,
          |       json_contains('{"a": 1}', 'x', 'b') AS missing_parent,
          |       json_contains('[10, 20]', 1) AS idx_in,
          |       json_contains('[10, 20]', 2) AS idx_out""".stripMargin).collect()(0)
      assert(cRow.getBoolean(0), "key with JSON null value must exist")
      assert(!cRow.getBoolean(1))
      assert(cRow.getBoolean(2))
      assert(!cRow.getBoolean(3))
      assert(cRow.getBoolean(4))
      assert(!cRow.getBoolean(5))

      // DataFusion-dialect compatibility names (DataFusionCompat)
      val dfc = spark.sql(
        """SELECT date_bin(INTERVAL '15' MINUTE, TIMESTAMP '2024-01-01 10:37:11') AS bin,
          |       date_bin(INTERVAL '1' DAY, TIMESTAMP '2024-01-03 07:00:00',
          |                TIMESTAMP '2024-01-01 12:00:00') AS bin_origin,
          |       to_timestamp_seconds(86400) AS ts_s,
          |       to_timestamp_millis(86400000) AS ts_ms,
          |       to_timestamp_micros(CAST(86400000000 AS BIGINT)) AS ts_us,
          |       regexp_match('abc123', '[0-9]+') AS m_hit,
          |       regexp_match('abcdef', '[0-9]+') AS m_miss,
          |       strpos('hello world', 'world') AS pos_hit,
          |       strpos('hello world', 'zzz') AS pos_miss,
          |       to_hex(255) AS hx,
          |       array_has(array(1, 2, 3), 2) AS has2,
          |       array_element(array('a', 'b'), 2) AS el2,
          |       array_to_string(array('x', 'y'), '-') AS joined""".stripMargin).collect()(0)
      assert(dfc.getTimestamp(0).toInstant.toString == "2024-01-01T10:30:00Z")
      assert(dfc.getTimestamp(1).toInstant.toString == "2024-01-02T12:00:00Z")
      assert(dfc.getTimestamp(2).toInstant.toString == "1970-01-02T00:00:00Z")
      assert(dfc.getTimestamp(3).toInstant.toString == "1970-01-02T00:00:00Z")
      assert(dfc.getTimestamp(4).toInstant.toString == "1970-01-02T00:00:00Z")
      assert(dfc.getSeq[String](5) == Seq("123"))
      assert(dfc.isNullAt(6), "regexp_match with no match must be NULL, not []")
      assert(dfc.getInt(7) == 7 && dfc.getInt(8) == 0)
      assert(dfc.getString(9) == "ff")
      assert(dfc.getBoolean(10))
      assert(dfc.getString(11) == "b")
      assert(dfc.getString(12) == "x-y")

      // COMPLETENESS: every native in NativeHashes.builders must resolve
      // through the extensions path — the hand-maintained injection list
      // had drifted five functions behind register() (r16 review); both
      // surfaces now share one builders list, and this pins it
      val missing = graft.functions.NativeHashes.builders.map(_._1).filterNot(n =>
        spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
      assert(missing.isEmpty, s"extensions path missing native functions: $missing")
      // and the previously-missing ones actually evaluate end-to-end
      val natives = spark.sql(
        """SELECT nearest_cells(array(CAST(1.0 AS FLOAT)),
          |         array(array(CAST(1.0 AS FLOAT)), array(CAST(-1.0 AS FLOAT))), 1) AS nc,
          |       bm25_idf(CAST(3 AS BIGINT), 10L) AS idf,
          |       hyperplane_bucket(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 2, 4) AS hb
          |""".stripMargin).collect()(0)
      assert(natives.getSeq[Int](0) == Seq(0))
      assert(natives.getDouble(1) == StrictMath.log((10 - 3 + 0.5) / (3 + 0.5) + 1.0))
      assert(!natives.isNullAt(2))
    } finally spark.stop()
  }
}
