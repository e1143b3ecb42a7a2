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
    } finally spark.stop()
  }
}
