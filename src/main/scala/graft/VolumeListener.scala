package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage shuffle-read accounting for the volume rehearsals: records
  * (max per-task records, total records, task count) per stage, used to
  * prove a stage never concentrated a hot key onto one task.
  *
  * The listener bus is async, so a fixed sleep after the action races
  * task-end delivery on a loaded machine — late events would leave the
  * map incomplete and a `maxOption`-style assertion could pass vacuously.
  * `drain()` instead polls until the observed task count is stable across
  * two consecutive polls AND the caller's floor on total observed shuffle
  * rows is met (proof the listener saw the real work, not an empty map),
  * failing loudly on timeout. */
final class StageShuffleListener extends SparkListener {
  val stageMax = new ConcurrentHashMap[Int, (Long, Long, Int)]()
  // per-stage (memoryBytesSpilled, diskBytesSpilled) sums: proof that a
  // spill-capable operator (SMJ group buffer, sort, aggregate) actually
  // exercised its spill path under a rehearsal's forced thresholds rather
  // than resident-buffering the hot group (SearchVolume shape 5)
  val stageSpill = new ConcurrentHashMap[Int, (Long, Long)]()

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      val r = m.shuffleReadMetrics.recordsRead
      stageMax.merge(t.stageId, (r, r, 1),
        (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3))
      if (m.memoryBytesSpilled > 0L || m.diskBytesSpilled > 0L)
        stageSpill.merge(t.stageId, (m.memoryBytesSpilled, m.diskBytesSpilled),
          (a, b) => (a._1 + b._1, a._2 + b._2))
    }
  }

  import scala.jdk.CollectionConverters._

  /** Stages sorted by descending total shuffle-read rows. */
  def stages: Seq[(Int, (Long, Long, Int))] = stageMax.asScala.toSeq.sortBy(-_._2._2)

  /** Max per-task shuffle-read rows across all observed stages. */
  def worstTaskRows: Long = stages.map(_._2._1).maxOption.getOrElse(0L)

  /** Total bytes written to DISK by spilling operators across all observed
    * stages (0 when nothing spilled). */
  def totalDiskSpillBytes: Long = stageSpill.asScala.values.map(_._2).sum

  /** Total in-memory bytes released by spills across all observed stages. */
  def totalMemorySpillBytes: Long = stageSpill.asScala.values.map(_._1).sum

  /** Wait for the async bus to deliver everything: poll until the total
    * observed task count is unchanged across FOUR consecutive polls (1 s
    * of quiet — a single unchanged 250 ms gap can declare victory during
    * a bursty-delivery lull, and the floors only protect TOTALS: a
    * straggler's in-flight task-end could undercount `worstTaskRows`,
    * letting an upper-bound assertion pass vacuously; the JobCountProbe
    * drain's r18 fix, applied here in r19) AND the caller's floors hold.
    * Pick the floor that fits the workload: `minTotalRows` for
    * window/join shuffles that move real rows, `minTasks` for
    * map-side-combined aggregations whose reducers legitimately read only
    * a handful of rows. Throws after `timeoutMs`. */
  def drain(minTotalRows: Long = 0L, minTasks: Long = 0L, timeoutMs: Long = 30000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prevTasks = -1L
    var stable = 0
    while (true) {
      val snap = stages
      val tasks = snap.map(_._2._3.toLong).sum
      val rows = snap.map(_._2._2).sum
      if (tasks == prevTasks) stable += 1 else stable = 0
      if (stable >= 3 && rows >= minTotalRows && tasks >= minTasks) return
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"listener bus did not drain: tasks=$tasks rows=$rows " +
            s"(need rows >= $minTotalRows, tasks >= $minTasks)")
      prevTasks = tasks
      Thread.sleep(250)
    }
  }
}

object StageShuffleListener {
  /** Install a fresh listener on the session. */
  def install(spark: SparkSession): StageShuffleListener = {
    val l = new StageShuffleListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
