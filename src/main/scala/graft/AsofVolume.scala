package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Adversarial skew rehearsal for the as-of join: ~500k left events where
  * ONE key owns 90% of the history (the degenerate sentinel-id /
  * null-bucketed-default shape). A per-key running-`last` window — the
  * pre-r10 formulation — would sort all ~450k hot-key rows in a single
  * task; the segmented default must spread them over
  * ~targetSegments tasks while producing the identical result.
  *
  * Success criteria:
  *   (a) segmented output == single-level output (exact row multiset);
  *   (b) no task in the segmented run reads anywhere near the hot key's
  *       full history (worst task ≪ 450k rows);
  *   (c) the single-level run DOES show the hot task (proves the listener
  *       measures what we claim and the rehearsal isn't vacuous). */
object AsofVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[asof-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 450k rows on key 0, 50k spread over keys 1..1000; timestamps dense
    // (many boundary ties at any segment grid). Right side: 10k price
    // points for the hot key + 5k across the tail, unique per (k, t).
    val left = spark.range(500000).select(
      when(col("id") < 450000, lit(0L)).otherwise(col("id") % 1000 + 1).as("k"),
      (col("id") * 7919L % 1000000L).as("t"),
      col("id").as("lid"))
    val right = spark.range(15000).select(
      when(col("id") < 10000, lit(0L)).otherwise(col("id") % 1000 + 1).as("k"),
      (col("id") * 104729L % 1000000L).as("rt"),
      (col("id") % 997).cast("double").as("price"))
      .groupBy("k", "rt").agg(max("price").as("price"))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // bit_xor: order-independent, no ANSI sum overflow; rows are unique
      // (lid is), so xor cancellation can't mask a diff
      val r = df.agg(
        count(lit(1)),
        bit_xor(xxhash64(col("k"), col("t"), col("lid"),
          coalesce(col("rt"), lit(-1L)),
          coalesce(col("price").cast("string"), lit("null"))))).head()
      (r.getLong(0), r.getLong(1))
    }

    // --- single-level (the pre-r10 shape): expect ONE ~460k-row task ---
    val single = StageShuffleListener.install(spark)
    val sumSingle = time("single-level (targetSegments=1), 500k rows, 90% one key")(
      checksum(TemporalJoins.asofBackward(left, right, "k", "t", "rt", targetSegments = 1)))
    single.drain(minTotalRows = 400000)
    spark.sparkContext.removeSparkListener(single)
    println(s"[asof-vol] single-level worst task rows: ${single.worstTaskRows}")

    // --- segmented default: same answer, spread tasks ---
    val seg = StageShuffleListener.install(spark)
    val sumSeg = time("segmented (default 128), 500k rows, 90% one key")(
      checksum(TemporalJoins.asofBackward(left, right, "k", "t", "rt", smallInputRows = 0L)))
    seg.drain(minTotalRows = 400000)
    spark.sparkContext.removeSparkListener(seg)
    for ((sid, (mx, sum, n)) <- seg.stages.take(6))
      println(s"[asof-vol] segmented stage $sid: maxTaskRows=$mx sumRows=$sum tasks=$n")
    println(s"[asof-vol] segmented worst task rows: ${seg.worstTaskRows}")

    assert(sumSeg == sumSingle, s"segmented answer drifted: $sumSeg vs $sumSingle")
    assert(single.worstTaskRows > 400000,
      s"rehearsal not adversarial: single-level hot task only ${single.worstTaskRows} rows")
    assert(seg.worstTaskRows < 50000,
      s"a task read a full hot key history: ${seg.worstTaskRows} rows")
    println(s"[asof-vol] OK: identical checksums $sumSeg; " +
      s"hot task ${single.worstTaskRows} -> ${seg.worstTaskRows} rows")
    spark.stop()
  }
}
