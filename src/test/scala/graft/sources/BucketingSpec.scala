package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The co-located-join guarantee: joining two tables bucketed+sorted on the
  * join key with the same bucket count plans NO shuffle exchange and NO
  * sort — the property that makes repeated large-fact joins affordable at
  * 100 TB. Asserted on the physical plan, not just on results. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft-warehouse")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse.toString)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    // since Spark 3.0 the planner ignores bucket sortBy metadata unless this
    // is on (SPARK-28595) — required for the Sort-elision half of the test
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("join of two same-key bucketed tables plans no Exchange and no Sort") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.table(spark, dir, "orders"), "orders_b",
      warehouse.resolve("orders_b").toString, "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.table(spark, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", warehouse.resolve("lineitem_b").toString, "o_orderkey", 8)

    val joined = Bucketing.read(spark, "orders_b")
      .join(Bucketing.read(spark, "lineitem_b"), "o_orderkey")
      .select(col("o_orderkey"), col("o_totalprice"), col("l_quantity"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // Sort elision needs one file per bucket (Spark only trusts sortBy
    // order then) — writeBucketed repartitions by the key to guarantee it.
    assert(!plan.contains("Sort ["),
      s"bucketed join re-sorts bucketed-sorted inputs:\n$plan")

    // and it is not just a plan curiosity — results match the plain join
    val expected = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(joined.count() == expected)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val agg = Bucketing.read(spark, "lineitem_b")
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed aggregation still shuffles:\n$plan")
    assert(agg.count() > 0)
  }
}
