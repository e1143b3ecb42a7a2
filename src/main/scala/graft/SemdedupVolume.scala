package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Volume smoke for SemDeDup-style semantic dedup (DedupVolume pattern):
  * 100k synthetic 64-dim vectors spread over 64 planted directions
  * (cluster d concentrates on dim d, per-row jitter amplitude 0.5 keeps
  * natural same-direction cosines ≈ 0.5 — far from the 0.999 threshold),
  * plus 1000 half-scale copies of vec_id < 1000. Halving is exact in
  * float, so each copy's centroid scores are exactly half its original's
  * — identical argmax, guaranteed co-clustering — and the expected prune
  * set is EXACTLY the 1000 copies.
  *
  * Checks printed/asserted:
  *   (a) end-to-end wall time for semanticDedupLabels at k=64;
  *   (b) the prune set is exactly the planted copies, each mapped to its
  *       original (no natural pair crosses the threshold);
  *   (c) worst shuffle-task row count across the run (StageShuffleListener)
  *       — the within-cluster pair join distributes by cluster id, so no
  *       task should see more than ~one cluster's candidate block. */
object SemdedupVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[semdedup-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // keep the worst-task metric about the PLAN's row distribution:
      // at toy scale AQE would coalesce the small shuffles into one task
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = StageShuffleListener.install(spark)

    // hash-based jitter, independent per (id, dim) — a sinusoidal
    // jitter's phase shift between two rows is dim-independent, so rows
    // whose phase lands near a 2π multiple match on EVERY dim at once
    // (measured natural max cosine 0.99992 — over the threshold)
    val base = spark.range(100000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (when(d === (col("id") % 64).cast("int"), lit(8.0)).otherwise(lit(0.0))
          + pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 1000.0 - 0.5)
          .cast("float")).as("embedding"))
    val copies = base.filter(col("vec_id") < 1000)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    val corpus = base.unionAll(copies).localCheckpoint()
    println(s"[semdedup-vol] corpus rows: ${corpus.count()}")

    val labels = time("semanticDedupLabels k=64, threshold 0.999")(
      VectorOps.semanticDedupLabels(
        corpus, "vec_id", "embedding", k = 64, threshold = 0.999)
        .localCheckpoint())

    val pruned = labels.filter(col("vec_id") =!= col("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pruned.size == 1000, s"expected exactly the 1000 copies pruned, got ${pruned.size}")
    assert(pruned.forall { case (id, rep) => id == rep + 1000000 },
      "every pruned row must be a planted copy mapped to its original")
    println(s"[semdedup-vol] pruned exactly the 1000 planted copies, reps correct")

    listener.drain(minTotalRows = 1L)
    println(s"[semdedup-vol] worst shuffle task rows: ${listener.worstTaskRows}")
    spark.stop()
  }
}
