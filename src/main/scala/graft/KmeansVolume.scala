package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.sources.Tables

/** Volume smoke for the distributed Lloyd path (DedupVolume pattern):
  * 500k synthetic 64-dim vectors with 8 planted directional clusters, run
  * through kmeansFit (driver-sample seed + distributed refinement rounds
  * over the full corpus) and assignClusters. Prints per-stage wall times,
  * verifies the per-round driver traffic is exactly k×dims partial-sum
  * rows (the only thing the driver ever sees of the corpus), and checks
  * planted-cluster recovery purity.
  *
  * Also times the sketch-ONLY variants of the approx aggregates next to
  * their oracle-checkable dual exact+sketch query shapes, so BENCH's
  * q_approx_* rows (which deliberately compute both) don't stand in for
  * sketch cost — recorded in SCALE.md. */
object KmeansVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[kmeans-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 8 planted clusters: cluster c concentrates on dims [8c, 8c+8) with
    // deterministic per-row jitter — separable, not degenerate
    val corpus = spark.range(500000).select(
      col("id").as("vec_id"),
      (col("id") % 8).cast("int").as("planted"),
      transform(sequence(lit(0), lit(63)), d =>
        (when((d / 8).cast("int") === (col("id") % 8).cast("int"), lit(1.0))
          .otherwise(lit(0.0)) +
          sin(col("id") * 131 + d * 37) * 0.15).cast("float")).as("embedding"))
      .localCheckpoint()
    val n = time("build 500k corpus")(corpus.count())
    println(s"[kmeans-vol] corpus rows: $n")

    val cents = time("kmeansFit k=8, 3 distributed rounds")(
      VectorOps.kmeansFit(corpus, "embedding", k = 8, iters = 3))
    println(s"[kmeans-vol] per-round driver rows = k x dims = " +
      s"${cents.length} x ${cents(0).length} = ${cents.length * cents(0).length}")

    val assigned = VectorOps.assignClusters(corpus, cents, "embedding")
    val purity = time("assignClusters + purity agg")(
      assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          max(col("planted")).as("maxp"), min(col("planted")).as("minp"))
        .collect())
    val pure = purity.count(r => r.getAs[Int]("maxp") == r.getAs[Int]("minp"))
    println(s"[kmeans-vol] clusters: ${purity.length}, pure: $pure " +
      purity.sortBy(_.getAs[Int]("cluster"))
        .map(r => s"${r.getAs[Int]("cluster")}:${r.getAs[Long]("n")}").mkString(" "))

    // sketch-only vs dual exact+sketch approx aggregates (sf0.1 lineitem)
    val li = Tables.table(spark, "/root/testdata/sf0.1", "lineitem")
      .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
    for (i <- 1 to 3) {
      time(s"approx_distinct sketch-only run$i")(
        li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("approx"))
          .write.format("noop").mode("overwrite").save())
      time(s"approx_distinct dual (bench shape) run$i")(
        SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save())
      time(s"approx_percentile sketch-only run$i")(
        li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
          .write.format("noop").mode("overwrite").save())
      time(s"approx_percentile dual (bench shape) run$i")(
        SparkEntry.queries("q_approx_percentile")(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
