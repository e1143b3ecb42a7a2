package graft
import org.apache.spark.sql.SparkSession
object OneBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      println(f"[one] $name run$i: ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
