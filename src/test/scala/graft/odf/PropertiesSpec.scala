package graft.odf

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property tests from SURVEY.md §5: A10 offset density (offsets are dense,
  * start at nextOffset, order-preserving, for any row count / partitioning /
  * strategy) and A15 watermark lattice (min-of-max, skip-empty, monotone).
  * Cases are sampled with a fixed seed (no scalatest-scalacheck bridge in
  * the offline dependency set). */
class PropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-odf-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val vocab: DatasetVocabulary = DatasetVocabulary()
  val t0: Instant = Instant.parse("2024-01-01T00:00:00Z")
  val rnd = new scala.util.Random(42)

  def offsetsOf(n: Int, parts: Int, next: Long, strategy: SystemColumns.OffsetStrategy): Seq[Long] = {
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until n).map(i => org.apache.spark.sql.Row(i.toLong)), math.max(parts, 1)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.LongType, false))))
      .withColumn("event_time", lit(java.sql.Timestamp.from(t0)))
    val stamped = SystemColumns.withSystemColumns(df, vocab, t0, next, strategy)
    stamped.select(col("offset"), col("payload")).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
  }

  test("A10 property: offsets dense from nextOffset, order-preserving (both strategies)") {
    val strategies = Seq(
      SystemColumns.WindowedOffsets, SystemColumns.ZipWithIndexOffsets,
      SystemColumns.PrefixSumOffsets)
    for (_ <- 1 to 6) {
      val n = rnd.nextInt(201)
      val parts = 1 + rnd.nextInt(6)
      val next = math.abs(rnd.nextLong() % 1000000L)
      for (strategy <- strategies) {
        val offs = offsetsOf(n, parts, next, strategy)
        assert(offs.sorted == (next until next + n), s"n=$n parts=$parts next=$next $strategy")
        // order-preserving: payload i (generated in partition order) ↔ offset order
        assert(offs == offs.sorted, s"not order-preserving: n=$n parts=$parts $strategy")
      }
    }
  }

  test("A10 plan: default strategy keeps the upstream scan parallel (no stage collapse)") {
    // Round-1 verdict: coalesce(1) in the windowed path dragged the whole
    // upstream stage into one task. The default (PrefixSumOffsets) must
    // number rows while leaving scan/filter stages at native parallelism.
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until 1000).map(i => org.apache.spark.sql.Row(i.toLong)), 8),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.LongType, false))))
      .withColumn("event_time", lit(java.sql.Timestamp.from(t0)))
    val stamped = SystemColumns.withSystemColumns(df, vocab, t0, 0L)
    assert(stamped.rdd.getNumPartitions == 8,
      s"default offset strategy collapsed parallelism: ${stamped.rdd.getNumPartitions} partition(s)")
    val windowed = SystemColumns.withSystemColumns(df, vocab, t0, 0L, SystemColumns.WindowedOffsets)
    assert(windowed.rdd.getNumPartitions == 1, "parity path is intentionally single-partition")
  }

  test("A15 property: watermark is min over inputs of max per input; empties skipped; monotone") {
    for (_ <- 1 to 100) {
      val inputsWms = List.fill(1 + rnd.nextInt(4))(
        List.fill(rnd.nextInt(4))(rnd.nextInt(100000).toLong))
      val inputs = inputsWms.map { wms =>
        TransformRequestInput("d", "d", "d", vocab, None, Nil, "s",
          wms.map(sec => Watermark(t0, t0.plusSeconds(sec))))
      }
      val result = Watermarks.computeNewWatermark(inputs)
      val expected = inputsWms.filter(_.nonEmpty).map(_.max) match {
        case Nil => None
        case maxes => Some(t0.plusSeconds(maxes.min))
      }
      assert(result == expected, s"wms=$inputsWms")
      // monotonicity: adding a later watermark to every input never lowers it
      if (result.isDefined) {
        val bumped = inputs.map(i => i.copy(explicitWatermarks =
          i.explicitWatermarks :+ Watermark(t0, t0.plusSeconds(200000L))))
        assert(!Watermarks.computeNewWatermark(bumped).get.isBefore(result.get))
      }
    }
  }
}
