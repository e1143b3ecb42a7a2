package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** CI seed ranges for [[StructuredContractChecks]] — the six structured
  * families (ANN, k-means labels, changelog, temporal joins, Z-order,
  * multimodal decode) that the text fuzzer's corpora don't reach: 720
  * fresh random corpora per run. The
  * generator + models live in the checks object; [[TextFuzz]]-style offline
  * sweeps can drive arbitrary ranges via the families map. */
class StructuredContractProps extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-structured-contract-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import StructuredContractChecks._

  test("ANN: brute force matches the exact model; IVF at probes=cells EQUALS it; LSH recall contracts hold") {
    for (seed <- 3000L until 3060L) checkAnn(spark, seed)
  }

  test("k-means: labels match the nearest_cells model; planted orthogonal clusters label exactly") {
    for (seed <- 3100L until 3160L) checkKmeans(spark, seed)
  }

  test("changelog snapshot + historyStats match the stepwise ledger replay") {
    for (seed <- 3200L until 3340L) checkChangelog(spark, seed)
  }

  test("asofBackward (both physical paths) + rangeOverlapJoin match two-pointer/pair models") {
    for (seed <- 3400L until 3540L) checkTemporal(spark, seed)
  }

  test("Z-order: zValue16 matches the per-bit interleave model; layout is lossless, sorted, range-disjoint") {
    for (seed <- 3600L until 3760L) checkZorder(spark, seed)
  }

  test("multimodal decode: planted PNG/WAV payloads featurize from their known pixels/samples; every hostile payload falls back, none kills the task") {
    for (seed <- 3800L until 3960L) checkMultimodal(spark, seed)
  }
}
