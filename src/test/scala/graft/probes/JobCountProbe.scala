package graft
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement probe (r17 A/B attribution): run one SparkEntry query warm,
  * then print its JOB COUNT and summed executor task time — mechanism-level
  * metrics that don't jitter with machine phase the way wall time does. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- args) {
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save() // warm
      val jobs = new AtomicInteger(0)
      val tasks = new AtomicInteger(0)
      val taskMs = new AtomicLong(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener-bus drain: poll until the observed task count is stable
      // across FIVE consecutive 200 ms polls (1 s of quiet — covers bursty
      // event delivery that a single unchanged gap would declare drained
      // too early; r18 ADVICE) instead of a fixed sleep — on a loaded
      // machine late task-end events would undercount exactly the metrics
      // this probe exists to compare. Bounded at 15 s; the deadline check
      // runs AFTER the stability update so a count that settles on the
      // final poll exits cleanly instead of throwing.
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var stable = 0
      var prev = tasks.get
      while (stable < 5) {
        Thread.sleep(200)
        val cur = tasks.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        if (stable < 5 && System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"[probe] listener bus did not drain for $name (tasks=${tasks.get})")
      }
      println(f"[probe] $name jobs=${jobs.get} tasks=${tasks.get} " +
        f"taskTimeMs=${taskMs.get} wall=$wall%.2f")
      spark.sparkContext.removeSparkListener(l)
    }
    spark.stop()
  }
}
