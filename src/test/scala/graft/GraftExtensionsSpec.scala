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
    } finally spark.stop()
  }
}
