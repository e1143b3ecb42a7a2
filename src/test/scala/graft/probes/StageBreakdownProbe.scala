package graft
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round probe: per-stage wall/taskTime/GC attribution for one
  * query, plus inter-job driver gaps — tells us whether a slow query is
  * task-compute-bound (optimize the stage) or driver/latency-bound
  * (optimize job count / planning). */
object StageBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- args) {
      // warm
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      case class St(var name: String = "", var submitted: Long = 0L, var completed: Long = 0L,
                    var taskMs: Long = 0L, var gcMs: Long = 0L, var tasks: Int = 0,
                    var inRows: Long = 0L, var shufReadRows: Long = 0L, var shufWriteRows: Long = 0L)
      val stages = new ConcurrentHashMap[Int, St]()
      val jobSpans = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, Long)]()
      val jobStartTs = new ConcurrentHashMap[Int, Long]()
      val l = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val st = stages.computeIfAbsent(si.stageId, _ => St())
          st.name = si.name.takeWhile(_ != '\n').take(60)
          st.submitted = si.submissionTime.getOrElse(0L)
          st.completed = si.completionTime.getOrElse(0L)
        }
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val st = stages.computeIfAbsent(t.stageId, _ => St())
          val m = t.taskMetrics
          if (m != null) {
            st.taskMs += m.executorRunTime; st.gcMs += m.jvmGCTime; st.tasks += 1
            st.inRows += m.inputMetrics.recordsRead
            st.shufReadRows += m.shuffleReadMetrics.recordsRead
            st.shufWriteRows += m.shuffleWriteMetrics.recordsWritten
          }
        }
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobStartTs.put(j.jobId, j.time)
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val s = jobStartTs.getOrDefault(j.jobId, j.time)
          jobSpans.add((j.jobId, s, j.time))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      val wall = System.currentTimeMillis() - t0
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(l)
      println(s"===== $name wall=${wall}ms =====")
      import scala.jdk.CollectionConverters._
      val spans = jobSpans.asScala.toSeq.sortBy(_._2)
      // driver gaps: time not covered by any job span
      var covered = 0L; var cursor = t0
      for ((_, s, e) <- spans) {
        val s2 = math.max(s, cursor)
        if (e > s2) { covered += e - s2; cursor = e } else cursor = math.max(cursor, e)
      }
      println(s"  jobs=${spans.size} jobCoveredMs=$covered driverGapMs=${wall - covered}")
      val byCost = stages.asScala.toSeq.sortBy(-_._2.taskMs)
      for ((id, st) <- byCost.take(12)) {
        val stWall = if (st.completed > st.submitted) st.completed - st.submitted else -1
        println(f"  stage $id%4d wall=$stWall%6dms taskMs=${st.taskMs}%7d gcMs=${st.gcMs}%5d tasks=${st.tasks}%4d " +
          f"in=${st.inRows}%9d sr=${st.shufReadRows}%9d sw=${st.shufWriteRows}%9d  ${st.name}%s")
      }
    }
    spark.stop()
  }
}
