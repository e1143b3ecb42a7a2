package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Measurement hygiene (round-1 verdict): queries run in sorted-name order
  * (deterministic), and each gets one untimed warm pass before the timed
  * pass so the timed number is steady-state plan execution, not first-touch
  * parquet footer reads + codegen compilation. The JSON line is printed (and
  * flushed) before `spark.stop()` so no shutdown logging can interleave with
  * or truncate it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warmup so the first query doesn't absorb session startup
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // noop sink materializes every output column (count() would let
    // Catalyst prune the projections and under-report map-heavy queries)
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (warm) run(name, fn)
      // steady-state hygiene: don't charge this query for the previous
      // query's garbage (measured: a 600k-row sort reads 2.4s isolated but
      // 10s mid-sweep without this)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      run(name, fn)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    System.out.println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
