package graft
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway measurement scratchpad (optimization round). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    val dir = "/root/testdata/sf0.1"
    // warm: listing caches etc.
    spark.read.parquet(s"$dir/lineitem.parquet").schema
    Thread.sleep(500)
    def timed(label: String)(f: => Unit): Unit = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300)
      println(f"[scratch] $label: ${dt}%.1f ms, jobs=${jobs.get - j0}")
    }
    for (i <- 1 to 3) timed(s"read.parquet(lineitem) build #$i") {
      spark.read.parquet(s"$dir/lineitem.parquet")
    }
    val sch = spark.read.parquet(s"$dir/lineitem.parquet").schema
    for (i <- 1 to 3) timed(s"read.schema(...).parquet build #$i") {
      spark.read.schema(sch).parquet(s"$dir/lineitem.parquet")
    }
    for (i <- 1 to 3) timed(s"full table() call #$i") {
      graft.sources.Tables.table(spark, dir, "lineitem")
    }
    // cost of one trivial job for reference
    for (i <- 1 to 3) timed(s"trivial 1-task job #$i") {
      spark.range(0, 1, 1, 1).write.format("noop").mode("overwrite").save()
    }
    // a trivial 32-task job
    for (i <- 1 to 3) timed(s"trivial 32-task job #$i") {
      spark.range(0, 32, 1, 32).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
